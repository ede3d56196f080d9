package graft.core

/** SplitMix64 — tiny, splittable, deterministic PRNG (public algorithm,
  * Steele et al. 2014). Weight init must be a pure function of (seed, name)
  * so "the reference model" is reproducible everywhere (SURVEY.md §7 step 2):
  * each matrix draws from its own stream keyed by a stable string, so adding
  * or reordering matrices never shifts another matrix's values.
  */
final class SplitMix64(seed0: Long) {
  private var state = seed0
  def nextLong(): Long = {
    state += 0x9e3779b97f4a7c15L
    var z = state
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  /** uniform in [0, 1) */
  def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
  /** uniform in [-a, a) */
  def nextUniform(a: Double): Float = ((nextDouble() * 2.0 - 1.0) * a).toFloat
}

object Rng {
  /** FNV-1a 64-bit over a string — stable stream key. */
  def streamKey(name: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < name.length) { h ^= name.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  def forStream(seed: Long, name: String): SplitMix64 =
    new SplitMix64(seed ^ streamKey(name))

  /** Xavier/Glorot-uniform matrix [rows × cols], row-major. */
  def xavier(seed: Long, name: String, rows: Int, cols: Int): Array[Float] = {
    val r = forStream(seed, name)
    val a = math.sqrt(6.0 / (rows + cols))
    val out = new Array[Float](rows * cols)
    var i = 0
    while (i < out.length) { out(i) = r.nextUniform(a); i += 1 }
    out
  }

  def zeros(n: Int): Array[Float] = new Array[Float](n)
  def ones(n: Int): Array[Float] = Array.fill(n)(1f)
}
