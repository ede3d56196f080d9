package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.ModelConfig
import graft.kg._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 inventory) to DataFrame
  * builders over the driver test tables in `sfDir`; `oracleSql` mirrors the
  * SQL-expressible ones for the DuckDB cross-check. Neural / non-relational
  * stages (kg_*) get rows-only checks and are verified exactly against the
  * sequential GoldRef re-derivation in `sbt test` instead.
  */
object SparkEntry {

  /** per-(session, sfDir) model cache so each kg_* query doesn't rebuild the
    * lexicon job
    */
  private val modelCache = scala.collection.concurrent.TrieMap.empty[String, Mentions.Model]
  private[graft] def model(spark: SparkSession, sfDir: String): Mentions.Model =
    modelCache.getOrElseUpdate(sfDir, Mentions.buildModel(DocGen.docs(spark, sfDir), ModelConfig()))

  /** Flagship: full KG-construction pipeline (docs → pyramid mentions → link
    * → canonicalize → triples) on sf0.001; driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    Triples.pipeline(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = kgQueries ++ relationalQueries ++ opsQueries

  /** KG pipeline stages (non-SQL-expressible: pyramid inference inside
    * mapPartitions) — rows-only driver checks; exact-equality coverage lives
    * in KgPipelineSpec.
    */
  private def kgQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kg_docs" -> ((s, dir) =>
      DocGen.docs(s, dir).toDF()
        .select(col("doc_id"), explode(col("spans")).as("s"))
        .select(col("doc_id"), col("s.kind"), col("s.text"), col("s.media_ref"), col("s.offset"))),
    "kg_mentions" -> ((s, dir) => {
      val bc = s.sparkContext.broadcast(model(s, dir))
      Mentions.detect(DocGen.docs(s, dir), bc).toDF()
    }),
    "kg_dict" -> ((s, dir) => AliasDict.build(DocGen.docs(s, dir))),
    "kg_linked" -> ((s, dir) => {
      val bc = s.sparkContext.broadcast(model(s, dir))
      val mentions = Mentions.detect(DocGen.docs(s, dir), bc).toDF()
      Link.link(mentions, AliasDict.build(DocGen.docs(s, dir)))
    }),
    "kg_canonical_map" -> ((s, dir) =>
      Canonical.connectedComponents(Canonical.edgesFromDict(AliasDict.build(DocGen.docs(s, dir))))),
    "kg_triples" -> ((s, dir) => Triples.pipeline(s, dir)),
  )

  /** Relational operator surface (scans, joins, aggs, windows, sorts, set
    * ops) over the TPC-H-ish tables — all DuckDB-oracle-checked.
    */
  private def relationalQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice")).cast("double").as("sum_base_price"),
          avg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
  )

  private def opsQueries: Map[String, (SparkSession, String) => DataFrame] = Map()

  /** DuckDB-equivalent SQL per oracle-checked query (same column names/order;
    * every computed column aliased identically on both sides).
    */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
        |CAST(sum(l_extendedprice) AS DOUBLE) AS sum_base_price,
        |avg(l_discount) AS avg_disc,
        |count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
