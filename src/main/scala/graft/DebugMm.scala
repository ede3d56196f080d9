package graft

import org.apache.spark.sql.SparkSession

/** TEMPORARY triage main (round-6 profiling) — times the dedup family's
  * internal stages with the noop sink; removed after the round.
  */
object DebugMm {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"DEBUG $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      spark.catalog.clearCache()
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (round <- 1 to 2) {
      println(s"--- round $round")
      t("docs scan")(noop(ops.Dedup.docsDf(spark, sfDir)))
      t("shingles")(noop(ops.Dedup.shingles(spark, sfDir)))
      t("minhash_sig")(noop(ops.Dedup.minhashSignatures(spark, sfDir)))
      t("minhash_lsh")(noop(ops.Dedup.minhashLsh(spark, sfDir)))
      t("clusters")(noop(ops.Dedup.clusters(spark, sfDir)))
      t("jaccard")(noop(ops.Dedup.ngramJaccard(spark, sfDir)))
      t("simhash")(noop(ops.Dedup.simhash(spark, sfDir)))
      t("decontam")(noop(ops.TextOps.decontam(spark, sfDir)))
      t("dict")(noop(kg.AliasDict.build(kg.DocGen.docs(spark, sfDir))))
    }
    spark.stop()
  }
}
