package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel
import graft.core.ModelConfig
import graft.kg._

/** Dev utility: per-stage wall times of the full KG pipeline, isolated by
  * persisting each stage before timing the next
  * (usage: runMain graft.KgProfile [sfDir] [cpus] [amplify] [cfg] [partsFactor]).
  *
  * Used to attribute the serial (non-core-scaling) component of the
  * ScalingBench intercept: run at two cpu levels and diff the stage times.
  */
object KgProfile {
  def t[T](name: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[kgprofile] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).map(_.toInt).getOrElse(32)
    val amplify = args.lift(2).map(_.toInt).getOrElse(32)
    val cfg = if (args.lift(3).contains("genia")) ModelConfig.genia else ModelConfig()
    val partsFactor = args.lift(4).map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs0 = DocGen.amplifiedDocs(spark, sfDir, amplify)
    val docs = (if (partsFactor > 1) docs0.repartition(partsFactor * cpus) else docs0).cache()
    t("docs cache")(docs.count())
    val model = t("model build")(Mentions.buildModel(docs, cfg))

    for (rep <- 0 until 2) {
      println(s"[kgprofile] --- rep $rep (cpus=$cpus amplify=$amplify) ---")
      val bc = spark.sparkContext.broadcast(model)
      val mentions = Mentions.detect(docs, bc).toDF()
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("mentions")(force(mentions))
      val dict = AliasDict.build(docs).persist(StorageLevel.MEMORY_AND_DISK)
      t("dict")(force(dict))
      val linked = Link.link(mentions, dict).persist(StorageLevel.MEMORY_AND_DISK)
      t("link")(force(linked))
      val canonMap = t("cc (edges+components)") {
        val m = Canonical.connectedComponents(Canonical.edgesFromDict(dict))
          .persist(StorageLevel.MEMORY_AND_DISK)
        force(m); m
      }
      val canon = Canonical.canonicalize(linked, canonMap)
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("canonicalize")(force(canon))
      t("triples 4-family")(force(Triples.fromCanonical(canon)))
      Seq(mentions, dict, linked, canonMap, canon).foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
