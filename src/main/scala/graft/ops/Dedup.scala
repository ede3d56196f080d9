package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table — exact, MinHash+LSH,
  * SimHash (banded), n-gram Jaccard. All pure `functions._` (codegen'd, no
  * UDFs) and all mirrored 1:1 by DuckDB oracle SQL in SparkEntry.
  *
  * Scale notes:
  *  - every variant is shuffle-bounded by (doc, shingle/band) exploded rows,
  *    never by O(n²) pairs; candidate pairs only materialize inside a bucket
  *    (LSH band / simhash byte / shared shingle with a DF cap);
  *  - the `MaxShingleDf` frequency cap kills the hot-shingle skew ("the the
  *    the") that would otherwise square inside the shingle join — same
  *    motivation as the salted aggregations in graft.kg.Triples.
  */
object Dedup {
  val ShingleLen = 3
  val MaxShingleDf = 100       // drop shingles appearing in more docs (skew cap)
  val JaccardThreshold = 0.5
  val MinhashBands = 4         // 4 bands × 2 rows = 8 minhash functions
  val SimhashBits = 32
  val SimhashMaxHamming = 2 // tight: the tiny synthetic vocab makes signatures cluster

  def docsDf(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  private def toks: Column = split(col("text"), "\\s+")

  /** exact dedup: hash-groupBy on the full text (map-side partial agg). */
  def exact(spark: SparkSession, sfDir: String): DataFrame =
    docsDf(spark, sfDir)
      .groupBy(md5(col("text")).as("fingerprint"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_docs"))

  /** distinct (doc_id, shingle) pairs, hot shingles capped. */
  def shingles(spark: SparkSession, sfDir: String): DataFrame = {
    val base = docsDf(spark, sfDir)
      .select(col("doc_id"), toks.as("t"))
      .where(size(col("t")) >= ShingleLen)
      .select(col("doc_id"), explode(
        transform(sequence(lit(0), size(col("t")) - ShingleLen), i =>
          array_join(slice(col("t"), i + 1, lit(ShingleLen)), " "))).as("shingle"))
      .distinct()
    val hot = base.groupBy("shingle").agg(count(lit(1)).as("df"))
      .where(col("df") > MaxShingleDf).select("shingle")
    base.join(hot, Seq("shingle"), "left_anti")
  }

  /** n-gram Jaccard near-dup pairs (doc_a < doc_b, J ≥ threshold). */
  def ngramJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = shingles(spark, sfDir).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"), "shingle")
      .where(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard", round(col("inter") / (col("na") + col("nb") - col("inter")), 6))
      .where(col("jaccard") >= JaccardThreshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** per-doc MinHash signature: mh_k = min(md5(k || ':' || shingle)). */
  def minhashSignatures(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = shingles(spark, sfDir)
    val aggs = (0 until 2 * MinhashBands).map(k =>
      min(md5(concat(lit(k.toString), lit(":"), col("shingle")))).as(s"mh$k"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash-LSH candidate pairs: docs sharing any band bucket
    * (band b = md5(mh_{2b} || mh_{2b+1})).
    */
  def minhashLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val sig = minhashSignatures(spark, sfDir)
    val bands = (0 until MinhashBands).map(b =>
      sig.select(col("doc_id"), lit(b).as("band"),
        md5(concat(col(s"mh${2 * b}"), col(s"mh${2 * b + 1}"))).as("bucket")))
    val all = bands.reduce(_ unionAll _)
    all.as("a").join(all.as("b"), Seq("band", "bucket"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** 32-bit SimHash per doc: bit i = sign of Σ_tokens (±1 by the high bit of
    * hex digit i of md5(token)); token multiplicity counts.
    */
  def simhash(spark: SparkSession, sfDir: String): DataFrame = {
    val exploded = docsDf(spark, sfDir)
      .select(col("doc_id"), explode(toks).as("tok"))
      .withColumn("h", md5(col("tok")))
    val bitSums = (0 until SimhashBits).map(i =>
      sum(when(substring(col("h"), i + 1, 1) >= "8", 1).otherwise(-1)).as(s"s$i"))
    val summed = exploded.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val hash = (0 until SimhashBits)
      .map(i => when(col(s"s$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce(_ + _)
    summed.select(col("doc_id"), hash.as("simhash"))
  }

  /** SimHash near-dup pairs via byte banding: candidates share a same-position
    * byte of the signature, then exact Hamming ≤ max.
    */
  def simhashPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val sig = simhash(spark, sfDir).cache()
    val bands = (0 until SimhashBits / 8).map(k =>
      sig.select(col("doc_id"), col("simhash"), lit(k).as("band"),
        shiftright(col("simhash"), 8 * k).bitwiseAND(lit(255L)).as("byte")))
      .reduce(_ unionAll _)
    bands.as("a").join(bands.as("b"), Seq("band", "byte"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= SimhashMaxHamming)
  }
}
