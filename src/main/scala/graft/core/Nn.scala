package graft.core

/** Minimal fp32 neural kernels (dense, LSTM, conv-k2, layernorm) used by the
  * Pyramid inference engine. Pure Scala, allocation-light, JIT-friendly —
  * these run inside `mapPartitions` on executors (SURVEY.md §4).
  *
  * Semantics mirror the torch modules the reference composes:
  * `nn.Linear`, `nn.LSTM` (gate order i,f,g,o), `nn.Conv1d(kernel_size=2)`,
  * `nn.LayerNorm(eps=1e-5)` — at inference (eval mode: dropout = identity).
  */
object Nn {

  @inline def sigmoid(x: Float): Float = (1.0 / (1.0 + math.exp(-x.toDouble))).toFloat
  @inline def tanhF(x: Float): Float = math.tanh(x.toDouble).toFloat

  /** y[o] = b[o] + Σ_i W[o*inDim + i] * x[xOff + i]; W row-major [outDim × inDim]. */
  def dense(w: Array[Float], b: Array[Float], inDim: Int, outDim: Int,
            x: Array[Float], xOff: Int, y: Array[Float], yOff: Int): Unit = {
    var o = 0
    while (o < outDim) {
      var acc = b(o)
      val wOff = o * inDim
      var i = 0
      while (i < inDim) { acc += w(wOff + i) * x(xOff + i); i += 1 }
      y(yOff + o) = acc
      o += 1
    }
  }

  /** LayerNorm over the last (feature) dim, torch defaults (eps=1e-5, affine). */
  def layerNorm(gamma: Array[Float], beta: Array[Float], dim: Int,
                x: Array[Float], xOff: Int, y: Array[Float], yOff: Int): Unit = {
    var mean = 0.0
    var i = 0
    while (i < dim) { mean += x(xOff + i); i += 1 }
    mean /= dim
    var variance = 0.0
    i = 0
    while (i < dim) { val d = x(xOff + i) - mean; variance += d * d; i += 1 }
    variance /= dim
    val inv = (1.0 / math.sqrt(variance + 1e-5)).toFloat
    i = 0
    while (i < dim) {
      y(yOff + i) = ((x(xOff + i) - mean).toFloat * inv) * gamma(i) + beta(i)
      i += 1
    }
  }
}

/** One direction of an LSTM: torch layout, gates (i, f, g, o) stacked in
  * wIh [4H × I], wHh [4H × H], bIh/bHh [4H].
  */
final class LstmCell(val inDim: Int, val hidden: Int,
                     val wIh: Array[Float], val wHh: Array[Float],
                     val bIh: Array[Float], val bHh: Array[Float]) extends Serializable {
  /** Runs the sequence x[t] (t = 0..len-1 over stride inDim starting xOff),
    * direction +1 or -1, writing h_t into out at (outOff + t*outStride + lane).
    * Scratch arrays (h, c, gates) must be sized hidden/hidden/4*hidden.
    */
  def run(x: Array[Float], xOff: Int, len: Int, reverse: Boolean,
          out: Array[Float], outOff: Int, outStride: Int, lane: Int,
          h: Array[Float], c: Array[Float], gates: Array[Float]): Unit = {
    java.util.Arrays.fill(h, 0f)
    java.util.Arrays.fill(c, 0f)
    val H = hidden
    var step = 0
    while (step < len) {
      val t = if (reverse) len - 1 - step else step
      val xo = xOff + t * inDim
      // gates = bIh + bHh + wIh·x_t + wHh·h
      var j = 0
      while (j < 4 * H) {
        var acc = bIh(j) + bHh(j)
        var i = 0
        val wi = j * inDim
        while (i < inDim) { acc += wIh(wi + i) * x(xo + i); i += 1 }
        var k = 0
        val wh = j * H
        while (k < H) { acc += wHh(wh + k) * h(k); k += 1 }
        gates(j) = acc
        j += 1
      }
      var k = 0
      while (k < H) {
        val ig = Nn.sigmoid(gates(k))
        val fg = Nn.sigmoid(gates(H + k))
        val gg = Nn.tanhF(gates(2 * H + k))
        val og = Nn.sigmoid(gates(3 * H + k))
        val cNew = fg * c(k) + ig * gg
        c(k) = cNew
        h(k) = og * Nn.tanhF(cNew)
        k += 1
      }
      val oo = outOff + t * outStride + lane
      System.arraycopy(h, 0, out, oo, H)
      step += 1
    }
  }
}

/** Bidirectional LSTM: output per position = [fwd_h(t) ++ bwd_h(t)], width 2H. */
final class BiLstm(val fwd: LstmCell, val bwd: LstmCell) extends Serializable {
  val inDim: Int = fwd.inDim
  val hidden: Int = fwd.hidden
  val outDim: Int = 2 * fwd.hidden
  def run(x: Array[Float], xOff: Int, len: Int,
          out: Array[Float], outOff: Int,
          h: Array[Float], c: Array[Float], gates: Array[Float]): Unit = {
    fwd.run(x, xOff, len, reverse = false, out, outOff, outDim, 0, h, c, gates)
    bwd.run(x, xOff, len, reverse = true, out, outOff, outDim, hidden, h, c, gates)
  }
}

/** Conv1d over time with kernel 2, stride 1 (reference pyramid CNN,
  * `modules/decoding/pyramid/__init__.py:21`): out[t] = W0·x[t] + W1·x[t+1] + b,
  * output length len-1. W stored as two row-major [outCh × inCh] taps.
  */
final class Conv2Tap(val inCh: Int, val outCh: Int,
                     val w0: Array[Float], val w1: Array[Float],
                     val b: Array[Float]) extends Serializable {
  def run(x: Array[Float], xOff: Int, len: Int, y: Array[Float], yOff: Int): Unit = {
    var t = 0
    while (t < len - 1) {
      val x0 = xOff + t * inCh
      val x1 = x0 + inCh
      val yo = yOff + t * outCh
      var o = 0
      while (o < outCh) {
        var acc = b(o)
        val w = o * inCh
        var i = 0
        while (i < inCh) { acc += w0(w + i) * x(x0 + i) + w1(w + i) * x(x1 + i); i += 1 }
        y(yo + o) = acc
        o += 1
      }
      t += 1
    }
  }
}
