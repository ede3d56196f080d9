package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage 4 — triple materialization from canonicalized mentions.
  *
  * Predicates (deterministic extraction rules over the interleaved docs):
  *   instance_of     canonical entity → its dictionary kind
  *   mentioned_in    canonical entity → doc_id
  *   depicted_in     canonical entity → attached media_ref (interleaved media)
  *   co_occurs_with  consecutive linked mentions within a doc (decode order)
  *
  * Skew: co-occurrence and instance_of dedup group by entity keys — hot
  * entities ("the U.S." aliases) would pile into single reducers. Both aggs
  * run TWO-PHASE with an explicit salt (hash(doc_id) % SaltBuckets) before
  * the final combine (SURVEY.md §4 item 1); AQE skew-join is the backstop,
  * not the plan.
  */
object Triples {
  val SaltBuckets = 32

  /** distinct (a, pred, b) via salted two-phase aggregation: partial
    * per-salt distinct, then final distinct — the salt splits hot keys
    * across `SaltBuckets` reducers in phase 1 so no single task owns a hot
    * entity's full row set.
    */
  private def saltedDistinct(df: DataFrame, saltSrc: org.apache.spark.sql.Column): DataFrame = {
    val cols = df.columns.map(col)
    df.withColumn("salt", pmod(xxhash64(saltSrc), lit(SaltBuckets)))
      .groupBy((cols :+ col("salt")).toIndexedSeq: _*).agg(count(lit(1)).as("_c"))
      .groupBy(cols.toIndexedSeq: _*).agg(count(lit(1)).as("_c2"))
      .select(cols.toIndexedSeq: _*)
  }

  def fromCanonical(canon: DataFrame): DataFrame = {
    val base = canon.select(
      col("doc_id"), col("order"), col("canonical_id"),
      col("dict_kind"), col("media_ref"))

    val instanceOf = saltedDistinct(
      base.select(col("canonical_id").as("subj"), lit("instance_of").as("pred"),
        col("dict_kind").as("obj")),
      xxhash64(col("subj"), col("obj")))

    val mentionedIn = saltedDistinct(
      base.select(col("canonical_id").as("subj"), lit("mentioned_in").as("pred"),
        col("doc_id").as("obj")),
      col("obj"))

    val depictedIn = saltedDistinct(
      base.where(col("media_ref") =!= "")
        .select(col("canonical_id").as("subj"), lit("depicted_in").as("pred"),
          col("media_ref").as("obj")),
      col("obj"))

    // consecutive mentions in reference decode order within a doc; the
    // window shuffle is keyed by doc_id (uniform), not by entity (skewed)
    val w = Window.partitionBy("doc_id").orderBy(col("order"), col("canonical_id"))
    val coOccurs = saltedDistinct(
      base.withColumn("next_id", lead(col("canonical_id"), 1).over(w))
        .where(col("next_id").isNotNull && col("next_id") =!= col("canonical_id"))
        .select(col("canonical_id").as("subj"), lit("co_occurs_with").as("pred"),
          col("next_id").as("obj")),
      xxhash64(col("subj"), col("obj")))

    instanceOf.unionAll(mentionedIn).unionAll(depictedIn).unionAll(coOccurs)
  }

  /** Pipeline over an existing (ideally cached) docs Dataset + prebuilt
    * model: mentions → link → canonicalize → triples.
    */
  def pipelineFrom(docs: org.apache.spark.sql.Dataset[PyramidDoc],
                   model: Mentions.Model): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val mentions = Mentions.detect(docs, bc).toDF()
    val dict = AliasDict.build(docs)
    val linked = Link.link(mentions, dict)
    val canonMap = Canonical.connectedComponents(Canonical.edgesFromDict(dict))
    // fromCanonical fans out into four triple families; without a persist the
    // pyramid-inference subtree would be recomputed once PER FAMILY (the
    // exchanges differ, so Catalyst cannot reuse them). At cluster scale this
    // is the stage boundary you'd materialize to a staging table (KgRunner
    // does exactly that per bucket).
    val canon = Canonical.canonicalize(linked, canonMap)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    fromCanonical(canon)
  }

  /** Full pipeline: docs → mentions → link → canonicalize → triples. */
  def pipeline(spark: SparkSession, sfDir: String,
               cfg: graft.core.ModelConfig = graft.core.ModelConfig()): DataFrame = {
    val docs = DocGen.docs(spark, sfDir)
    pipelineFrom(docs, Mentions.buildModel(docs, cfg))
  }
}
