package graft

import java.util.concurrent.atomic.AtomicLong
import graft.core._

/** Embarrassingly-parallel inference calibration: per-thread tokens/s of a
  * fixed seeded Pyramid workload at a given thread count — zero
  * synchronization, zero shared mutable state, so the N→4N per-thread ratio
  * is the MACHINE's parallel-compute ceiling (hypervisor steal, shared-cache
  * contention, turbo behavior), not the job's.
  *
  * ScalingBench runs this at both levels and reports raw wall-clock scaling
  * efficiency alongside the ceiling-normalized (software) efficiency: on a
  * real N-vs-4N-executor cluster the 4N level runs on 4× the MACHINES and
  * does not pay a single box's full-width penalty, so the normalized number
  * is the cluster-relevant one. Both are reported; neither is hidden.
  */
object InferCalib {
  private lazy val setup = {
    val cfg = ModelConfig()
    val lex = Array.tabulate(2000)(i => s"tok$i")
    val vocab = new WordVocab(lex)
    val w = PyramidWeights.build(42L, cfg, vocab.size, 8)
    val rnd = new java.util.Random(7)
    val sents = Array.tabulate(256) { _ =>
      Array.tabulate(8 + rnd.nextInt(40))(_ => lex(rnd.nextInt(lex.length)))
    }
    (w, vocab, sents)
  }

  private def burst(threads: Int, wallSec: Double): Double = {
    val (w, vocab, sents) = setup
    val deadline = System.nanoTime() + (wallSec * 1e9).toLong
    val tokens = new AtomicLong
    val ts = Array.tabulate(threads) { _ =>
      new Thread(() => {
        val inf = new PyramidInference(w, vocab) // per-thread scratch
        var tok = 0L
        var i = 0
        while (System.nanoTime() < deadline) {
          tok += inf.forward(sents(i % sents.length)).layers.head.length
          i += 1
        }
        tokens.addAndGet(tok)
      })
    }
    val t0 = System.nanoTime()
    ts.foreach(_.start()); ts.foreach(_.join())
    tokens.get / ((System.nanoTime() - t0) / 1e9) / threads
  }

  /** per-thread tokens/s at `threads` (2 s JIT warm-up burst, then measure) */
  def perThread(threads: Int, wallSec: Double = 8.0): Double = {
    burst(threads, 2.0)
    burst(threads, wallSec)
  }
}
