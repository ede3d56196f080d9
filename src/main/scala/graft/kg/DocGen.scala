package graft.kg

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.core.{CharVocab, Rng, Tok}

/** Deterministic derivation of the interleaved text+media docs table from the
  * driver's `documents.parquet` (TESTDATA.md). No wall-clock, no randomness
  * outside the fixed seed: the same sfDir always yields the same table, so
  * golden re-derivation and the DuckDB oracle can both reconstruct it.
  *
  * Shape per FIXTURES.md §1: one `text` span per token (offset = position in
  * the interleaved sequence) with a deterministic `media` span inserted after
  * roughly 1 in `MediaEvery` tokens (media_ref = "m://<hash>", text = caption).
  * Text is sanitized into the reference char alphabet first (CharVocab
  * alphabet; out-of-alphabet → '¤', `utils/data.py:29` semantics).
  */
object DocGen {
  val MediaEvery = 17
  val Seed = 0x9e5cL

  def mediaRef(docId: String, tokenPos: Int): String =
    "m://" + java.lang.Long.toHexString(Rng.streamKey(s"$docId#m$tokenPos"))

  /** Pure per-document span assembly (shared by the Spark job and the
    * sequential golden re-derivation in GoldRef).
    */
  def assemble(docId: String, rawText: String): PyramidDoc = {
    val tokens = Tok.tokenize(CharVocab.sanitize(rawText))
    val spans = scala.collection.mutable.ArrayBuffer.empty[SpanRec]
    var off = 0
    var t = 0
    while (t < tokens.length) {
      spans += SpanRec("text", tokens(t), "", off)
      off += 1
      if (java.lang.Long.remainderUnsigned(Rng.streamKey(s"$docId#t$t") ^ Seed, MediaEvery) == 0L) {
        val ref = mediaRef(docId, t)
        spans += SpanRec("media", "caption_" + ref.substring(4, 10), ref, off)
        off += 1
      }
      t += 1
    }
    PyramidDoc(docId, spans.toArray)
  }

  def docIdOf(id: Long): String = f"d$id%09d"

  /** The docs table: narrow projection of documents.parquet → typed map.
    * Column pruning pushes (doc_id, text) into the parquet scan; the per-row
    * map is cheap and partition-preserving (no shuffle).
    */
  def docs(spark: SparkSession, sfDir: String): Dataset[PyramidDoc] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id".cast("long").as[Long], $"text".as[String])
      .map { case (id, text) => assemble(docIdOf(id), text) }
  }

  /** Deterministically amplified corpus for benchmarking: each base document
    * is replicated `factor` times under distinct doc_ids (media placement and
    * downstream hashes differ per replica since they key on doc_id). The
    * driver's `documents` table tops out at 5k rows, far below the mention
    * stage's appetite — this synthesizes the benchmark corpus from it with no
    * external data and no randomness (builder brief: synthesize the
    * input_hint table deterministically for benchmarks).
    */
  def amplifiedDocs(spark: SparkSession, sfDir: String, factor: Int): Dataset[PyramidDoc] = {
    // replica ids live in the id*1000+k space — a larger factor would collide
    // with the next base document's replicas
    require(factor >= 1 && factor <= 1000, s"amplify factor $factor outside [1, 1000]")
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id".cast("long").as[Long], $"text".as[String])
      .repartition(spark.sparkContext.defaultParallelism)
      .flatMap { case (id, text) =>
        (0 until factor).iterator.map(k => assemble(docIdOf(id * 1000L + k), text))
      }
  }
}
