package graft

import org.apache.spark.sql.SparkSession
import graft.core._
import graft.kg.{DocGen, Mentions}

/** Dev utility: detection-density probe for variant-head bias calibration. */
object CalibMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = DocGen.docs(spark, sfDir)
    for (cfgName <- Seq("tiny", "default")) {
      val cfg = if (cfgName == "tiny") ModelConfig.tiny else ModelConfig()
      val model = Mentions.buildModel(docs, cfg)
      val toks = docs.orderBy("doc_id").limit(80).collect().toSeq
        .map(_.spans.filter(_.kind == "text").sortBy(_.offset).map(_.text)).filter(_.nonEmpty)
      for (bias <- Seq(-0.55f, -0.6f, -0.7f, -0.8f)) {
        val c2 = cfg.copy(remedyBias = bias)
        val vw = VariantWeights.build(Mentions.ModelSeed, c2, Mentions.Kinds.length)
        val vi = new PyramidVariantInference(new PyramidInference(model.weights, model.vocab), vw)
        var n = 0; var multiPos = 0; var positions = 0
        toks.foreach { t =>
          val spans = vi.detectMultiLabel(t, model.codec)
          n += spans.length
          positions += t.length
          multiPos += spans.groupBy(s => (s.startTok, s.lenTok))
            .count(_._2.map(_.kind).distinct.length > 1)
        }
        println(f"[calib] $cfgName%-8s mlBias=$bias%6.2f spans=$n multiPos=$multiPos over $positions tokens")
      }
    }
    spark.stop()
  }
}
