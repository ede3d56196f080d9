package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TEMPORARY triage main for the mm_decode_png anomaly — not part of the
  * bench/oracle surface; removed after the round's profiling.
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
    val stage = graft.kg.KgStage.stage(spark, sfDir)
    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"DEBUG $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    val png = s"$stage/media_png.parquet"
    t("read+count")(spark.read.parquet(png).count())
    t("decode noop 1")(ops.Multimodal.decodePng(spark, png)
      .write.format("noop").mode("overwrite").save())
    t("decode noop 2")(ops.Multimodal.decodePng(spark, png)
      .write.format("noop").mode("overwrite").save())
    t("decode noop 3")(ops.Multimodal.decodePng(spark, png)
      .write.format("noop").mode("overwrite").save())
    // decode WITHOUT widen
    import spark.implicits._
    t("decode nowiden")(spark.read.parquet(png)
      .select(col("media_ref"), col("png")).as[ops.Multimodal.PngRow]
      .mapPartitions(_.map { r =>
        val d = ops.Multimodal.ImageCodec.decodePng(r.png)
        ops.Multimodal.PngDecoded(r.media_ref, d.width, d.height, d.pixel_md5)
      }).toDF().write.format("noop").mode("overwrite").save())
    // decode on driver directly
    t("decode driver-loop") {
      val rows = spark.read.parquet(png).select("media_ref", "png").collect()
      var n = 0
      rows.foreach { r =>
        val d = ops.Multimodal.ImageCodec.decodePng(r.getAs[Array[Byte]]("png"))
        n += d.width
      }
      println(s"  [driver] ${rows.length} decoded, checksum $n")
    }
    t("decode driver-loop 2") {
      val rows = spark.read.parquet(png).select("media_ref", "png").collect()
      var n = 0
      rows.foreach { r =>
        val d = ops.Multimodal.ImageCodec.decodePng(r.getAs[Array[Byte]]("png"))
        n += d.width
      }
      println(s"  [driver] ${rows.length} decoded, checksum $n")
    }
    spark.stop()
  }
}
