package graft

import graft.core._

/** Dev utility: multithreaded Pyramid-inference scaling microbenchmark — no
  * Spark, one independent PyramidInference per thread over its own sentence
  * set (usage: runMain graft.InferBenchMT [threads,threads,...] [reps]).
  *
  * Separates raw compute scalability (SMT / memory bandwidth / host noise)
  * from Spark-level effects (GC from row churn, scheduling, shuffle) when
  * attributing ScalingBench efficiency.
  */
object InferBenchMT {
  def main(args: Array[String]): Unit = {
    val levels = args.lift(0).getOrElse("1,8,32").split(",").map(_.trim.toInt)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cfg = ModelConfig()
    val lex = Array.tabulate(2000)(i => s"tok$i")
    val vocab = new WordVocab(lex)
    val w = PyramidWeights.build(42L, cfg, vocab.size, 8)
    val rnd = new java.util.Random(7)
    val sents = Array.tabulate(256) { _ =>
      Array.tabulate(8 + rnd.nextInt(40))(_ => lex(rnd.nextInt(lex.length)))
    }
    val nTok = sents.map(_.length.toLong).sum

    var base = 0.0
    for (threads <- levels) {
      var best = 0.0
      for (_ <- 0 until reps) {
        val t0 = System.nanoTime()
        val ts = Array.tabulate(threads) { _ =>
          new Thread(() => {
            val inf = new PyramidInference(w, vocab) // per-thread scratch
            var i = 0
            var sink = 0
            while (i < sents.length) {
              sink += inf.forward(sents(i)).layers.head.length
              i += 1
            }
            if (sink == -1) println("") // keep sink live
          })
        }
        ts.foreach(_.start()); ts.foreach(_.join())
        val sec = (System.nanoTime() - t0) / 1e9
        val thr = nTok * threads / sec
        if (thr > best) best = thr
      }
      if (threads == levels.head) base = best / threads
      println(f"[inferbenchmt] threads=$threads%-3d ${best}%12.0f tokens/s total, " +
        f"${best / threads}%8.0f /thread, per-thread efficiency ${best / threads / base}%.3f")
    }
  }
}
