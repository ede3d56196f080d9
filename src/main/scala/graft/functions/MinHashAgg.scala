package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (SURVEY.md §7 "metrics: optional custom
  * Aggregator[IN,BUF,OUT]"): the k-function minimum-hash signature of a
  * group of shingle hashes in ONE typed pass — the buffer is the running
  * minima vector, merged associatively across partitions (map-side partial
  * aggregation applies, same as any hash agg).
  *
  * This is the production-integer variant of `Dedup.minhashSignatures`,
  * which stays md5-based because the DuckDB oracle must recompute it; here
  * each hash function k is a splitmix64 finalizer over the xxhash64 shingle
  * hash, so a 128-function signature costs one typed pass instead of 128
  * aggregate columns of string md5s.
  */
final class MinHashAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {

  /** splitmix64 finalizer over (x ⊕ golden·(seed+1)) — cheap, well mixed */
  private def mix(seed: Int, x: Long): Long = {
    var z = x ^ (0x9e3779b97f4a7c15L * (seed + 1))
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  def reduce(b: Array[Long], a: Long): Array[Long] = {
    var i = 0
    while (i < k) {
      val h = mix(i, a)
      if (h < b(i)) b(i) = h
      i += 1
    }
    b
  }

  def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  def finish(r: Array[Long]): Array[Long] = r
  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
