package graft

import org.apache.spark.sql.SparkSession
import graft.kg._

/** Dev utility: stage-by-stage wall times of the canonicalization path
  * (usage: runMain graft.ProfileMain [sfDir]).
  */
object ProfileMain {
  def t[T](name: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = t("docs")(DocGen.docs(spark, sfDir))
    t("ngrams count")(println("  ngrams=" + AliasDict.ngramsDf(docs).count()))
    t("ngrams distinct")(println("  distinct=" + AliasDict.ngramsDf(docs).distinct().count()))
    val dict = t("dict build (lazy)")(AliasDict.build(docs))
    t("dict force")(dict.write.format("noop").mode("overwrite").save())
    t("dict force 2")(dict.write.format("noop").mode("overwrite").save())
    val edges = t("edges (lazy)")(Canonical.edgesFromDict(dict))
    t("edges count")(println("  edges=" + edges.count()))
    t("cc")(println("  cc rows=" + Canonical.connectedComponents(edges).count()))
    t("cc again (warm)")(println("  cc rows=" + Canonical.connectedComponents(edges).count()))
    spark.stop()
  }
}
