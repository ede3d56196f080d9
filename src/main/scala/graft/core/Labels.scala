package graft.core

import scala.collection.mutable

/** A mention in token space: `[startTok, startTok + lenTok)`. */
final case class TokSpan(kind: String, startTok: Int, lenTok: Int)

/** Pyramid label codec — faithful re-derivation of the reference's
  * `PyramidLabelEncoder` / `SigmoidMultiLabelEncoder`
  * (`pyramid_nested_ner/vectorizers/labels/__init__.py:27-187`,
  * `.../labels/multi_label_encoder.py:17-134`).
  *
  * Deviations (documented in SURVEY.md §7 "hard parts"):
  *  - the single-label encoder's class dictionary is built from a Python
  *    set (nondeterministic order, `labels/__init__.py:28`); we standardize
  *    on the sorted order the multi-label variant uses
  *    (`multi_label_encoder.py:18`).
  *
  * Representation: per-layer class ids as `Array[Int]` (0 = no entity);
  * multi-hot bitmaps as `Long` masks (supports ≤ 32 entity kinds, plenty
  * for the 5-kind GENIA-style lexicon).
  */
final class LabelCodec(entityKinds: Seq[String]) extends Serializable {
  /** sorted distinct entity kinds = the class dictionary */
  val entities: Array[String] = entityKinds.distinct.sorted.toArray
  require(entities.length <= 32, s"LabelCodec supports ≤32 kinds, got ${entities.length}")
  val numClasses: Int = entities.length + 1 // 0 = None

  private val kindIdx: Map[String, Int] = entities.zipWithIndex.toMap

  /** single-label class id: 0 = no entity, 1 + sortedIndex otherwise */
  def classId(kind: String): Int = kindIdx(kind) + 1

  /** IOB2 bit positions in remedy bitmaps.
    * Single-label order (`labels/__init__.py:29`): [I-e1, B-e1, I-e2, B-e2, …]
    * Multi-label order (`multi_label_encoder.py:19-24`): [B-e1, I-e1, …]
    * We use the multi-label (B,I) layout for both internally: bit 2k = B-ek,
    * bit 2k+1 = I-ek. Only bit *positions* differ from the single-label
    * reference layout; the decode algebra is identical.
    */
  @inline def bBit(k: Int): Long = 1L << (2 * k)
  @inline def iBit(k: Int): Long = 1L << (2 * k + 1)

  // ---------------------------------------------------------------- encode

  /** Layer-l target for one row (`_entity_ngram_bitmap`,
    * `labels/__init__.py:77-90`): class id of the entity exactly spanning
    * each l-token ngram, else 0; first match in `spans` order wins (the
    * reference `break`s — one annotation per span).
    */
  def encodeLayerSingle(nTokens: Int, spans: Seq[TokSpan], order: Int): Array[Int] = {
    val n = nTokens - order + 1
    if (n <= 0) return Array.emptyIntArray
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val it = spans.iterator
      var done = false
      while (it.hasNext && !done) {
        val s = it.next()
        if (s.startTok == i && s.startTok + s.lenTok == i + order) {
          out(i) = classId(s.kind); done = true
        }
      }
      i += 1
    }
    out
  }

  /** Multi-label layer-l target (`multi_label_encoder.py:39-52`): bitmap of
    * ALL entities exactly spanning the ngram (no break). Bit k = entity k.
    */
  def encodeLayerMulti(nTokens: Int, spans: Seq[TokSpan], order: Int): Array[Long] = {
    val n = nTokens - order + 1
    if (n <= 0) return Array.emptyLongArray
    val out = new Array[Long](n)
    spans.foreach { s =>
      if (s.lenTok == order && s.startTok >= 0 && s.startTok < n)
        out(s.startTok) |= (1L << kindIdx(s.kind))
    }
    out
  }

  /** Remedy bitmap for ngrams of the given order (`_remedy_solution_bitmap`,
    * `labels/__init__.py:92-113`): for each ngram [i, i+order) and entity
    * [es, ee): if contained, B-kind when es == i else I-kind.
    */
  def encodeRemedy(nTokens: Int, spans: Seq[TokSpan], order: Int): Array[Long] = {
    val n = nTokens - order + 1
    if (n <= 0) return Array.emptyLongArray
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      spans.foreach { s =>
        val es = s.startTok; val ee = s.startTok + s.lenTok
        if (i >= es && i + order <= ee) {
          val k = kindIdx(s.kind)
          out(i) |= (if (es == i) bBit(k) else iBit(k))
        }
      }
      i += 1
    }
    out
  }

  /** Full `transform` for one row (`labels/__init__.py:31-68`): layers
    * 1..maxDepth (early stop on empty layer), remedy (order maxDepth+1) only
    * if all maxDepth layers are non-empty and itself non-empty.
    */
  def encodeSingle(nTokens: Int, spans: Seq[TokSpan], maxDepth: Int)
      : (IndexedSeq[Array[Int]], Option[Array[Long]]) = {
    val layers = mutable.ArrayBuffer.empty[Array[Int]]
    var l = 1
    var stop = false
    while (l <= maxDepth && !stop) {
      val y = encodeLayerSingle(nTokens, spans, l)
      if (y.nonEmpty) { layers += y; l += 1 } else stop = true
    }
    val remedy =
      if (layers.length == maxDepth) {
        val r = encodeRemedy(nTokens, spans, maxDepth + 1)
        if (r.nonEmpty) Some(r) else None
      } else None
    (layers.toIndexedSeq, remedy)
  }

  /** Multi-label `transform` (`multi_label_encoder.py:26-37` via the base
    * driver `labels/__init__.py:31-68`): same early-stop/remedy rules.
    */
  def encodeMulti(nTokens: Int, spans: Seq[TokSpan], maxDepth: Int)
      : (IndexedSeq[Array[Long]], Option[Array[Long]]) = {
    val layers = mutable.ArrayBuffer.empty[Array[Long]]
    var l = 1
    var stop = false
    while (l <= maxDepth && !stop) {
      if (nTokens - l + 1 > 0) { layers += encodeLayerMulti(nTokens, spans, l); l += 1 }
      else stop = true
    }
    val remedy =
      if (layers.length == maxDepth) {
        val r = encodeRemedy(nTokens, spans, maxDepth + 1)
        if (r.nonEmpty) Some(r) else None
      } else None
    (layers.toIndexedSeq, remedy)
  }

  // ---------------------------------------------------------------- decode

  /** Single-label layer inverse (`_inverse_layer_transform`,
    * `labels/__init__.py:182-187`): class ids → tags "B-kind" / "O".
    * We emit spans directly: position i with class c>0 → TokSpan(kind, i, order).
    */
  def decodeLayerSingle(classIds: Array[Int], order: Int, out: mutable.Buffer[TokSpan]): Unit = {
    var i = 0
    while (i < classIds.length) {
      val c = classIds(i)
      if (c > 0) out += TokSpan(entities(c - 1), i, order)
      i += 1
    }
  }

  /** Single-label remedy inverse (`inverse_remedy_transform`,
    * `labels/__init__.py:137-180`) for ONE sequence of remedy rows (each row
    * covers `baseOrder = maxDepth+1` tokens).
    *
    * Semantics reproduced exactly:
    *  - scan offsets ascending; for each entity kind (dictionary order) with a
    *    B bit: recover run length = 1 + consecutive following rows with the
    *    I bit of that kind (`_recover_span`, :139-143);
    *  - first annotation at a given (runLength, offset) wins a slot; a second,
    *    *different* one at the same slot discards BOTH (:155-166);
    *  - runs of length k decode to spans of token length maxDepth + k
    *    (SURVEY.md §3.1); result ordered by run length asc, then offset asc.
    */
  def decodeRemedySingle(remedy: Array[Long], maxDepth: Int, out: mutable.Buffer[TokSpan]): Unit = {
    if (remedy.isEmpty) return
    val n = remedy.length
    // slot maps: runLength -> offset -> kindIndex (or -2 = conflict-discarded)
    val slots = mutable.SortedMap.empty[Int, mutable.LinkedHashMap[Int, Int]]
    var offset = 0
    while (offset < n) {
      val row = remedy(offset)
      var k = 0
      while (k < entities.length) {
        if ((row & bBit(k)) != 0) {
          // _recover_span: length = 1 + count of consecutive I rows after offset
          var len = 1
          var j = offset + 1
          while (j < n && (remedy(j) & iBit(k)) != 0 && len < n - offset) { len += 1; j += 1 }
          val slot = slots.getOrElseUpdate(len, mutable.LinkedHashMap.empty)
          slot.get(offset) match {
            case None            => slot(offset) = k
            case Some(-2)        => () // already conflict-discarded
            case Some(prev)      => if (prev != k) slot(offset) = -2 // discard both
            // same kind twice cannot happen (one B bit per kind per row)
          }
        }
        k += 1
      }
      offset += 1
    }
    slots.foreach { case (runLen, slot) =>
      slot.toSeq.sortBy(_._1).foreach { case (off, k) =>
        if (k >= 0) out += TokSpan(entities(k), off, maxDepth + runLen)
      }
    }
  }

  /** Multi-label layer inverse (`multi_label_encoder.py:54-61`): every set
    * bit at position i is a mention of length `order`.
    */
  def decodeLayerMulti(bitmaps: Array[Long], order: Int, out: mutable.Buffer[TokSpan]): Unit = {
    var i = 0
    while (i < bitmaps.length) {
      var bits = bitmaps(i)
      while (bits != 0) {
        val k = java.lang.Long.numberOfTrailingZeros(bits)
        out += TokSpan(entities(k), i, order)
        bits &= bits - 1
      }
      i += 1
    }
  }

  /** Multi-label remedy inverse (`multi_label_encoder.py:63-134`): stateful
    * scan — B starts a span; I extends ALL open spans of that kind iff the
    * kind was active (B or valid I) on the previous row; a kind neither
    * begun nor continued flushes its open spans. Emission order matches the
    * reference `_decode_labels`: run length asc, then offset asc, then (for
    * slots holding several kinds) flush order.
    */
  def decodeRemedyMulti(remedy: Array[Long], maxDepth: Int, out: mutable.Buffer[TokSpan]): Unit = {
    if (remedy.isEmpty) return
    val n = remedy.length
    val C = entities.length
    // open spans per kind: (start, endExclusive)
    val current = Array.fill(C)(mutable.ArrayBuffer.empty[Array[Int]])
    // reference `sequence_entities` is a dict keyed by kind (insertion order =
    // first flush of that kind); decode iterates it kind-major
    // (`multi_label_encoder.py:108-117`). LinkedHashMap reproduces that.
    val finished = mutable.LinkedHashMap.empty[Int, mutable.ArrayBuffer[(Int, Int)]]
    def flush(k: Int): Unit = {
      val buf = finished.getOrElseUpdate(k, mutable.ArrayBuffer.empty)
      current(k).foreach(sp => buf += ((sp(0), sp(1))))
      current(k).clear()
    }
    var previous = 0L // bitmask of kinds active on previous row
    var offset = 0
    while (offset < n) {
      val row = remedy(offset)
      var begin = 0L
      var inside = 0L
      var k = 0
      while (k < C) {
        if ((row & bBit(k)) != 0) begin |= (1L << k)
        if ((row & iBit(k)) != 0 && (previous & (1L << k)) != 0) inside |= (1L << k)
        k += 1
      }
      k = 0
      while (k < C) {
        val m = 1L << k
        if ((begin & m) != 0) current(k) += Array(offset, offset + 1)
        if ((inside & m) != 0) current(k).foreach(sp => sp(1) = offset + 1)
        k += 1
      }
      previous = begin | inside
      k = 0
      while (k < C) {
        if ((previous & (1L << k)) == 0 && current(k).nonEmpty) flush(k)
        k += 1
      }
      offset += 1
    }
    var k = 0
    while (k < C) { if (current(k).nonEmpty) flush(k); k += 1 }
    // reference `_decode_labels`: run length asc, then offset asc; within a
    // (length, offset) slot, kind-major order per `sequence_entities` iteration
    val byLen = mutable.SortedMap.empty[Int, mutable.ArrayBuffer[(Int, Int, Int)]] // len -> (start, seq, kind)
    var seq = 0
    finished.foreach { case (kk, spans) =>
      spans.foreach { case (s, e) =>
        byLen.getOrElseUpdate(e - s, mutable.ArrayBuffer.empty) += ((s, seq, kk))
        seq += 1
      }
    }
    byLen.foreach { case (runLen, items) =>
      items.sortBy(t => (t._1, t._2)).foreach { case (s, _, kk) =>
        out += TokSpan(entities(kk), s, maxDepth + runLen)
      }
    }
  }

  /** Reference `parse` assembly (`model.py:153-166`): layer spans in layer
    * order (length 1..L, positions ascending), then remedy spans (run length
    * ascending). Returns spans in that exact enumeration order.
    */
  def decodeSingle(layers: IndexedSeq[Array[Int]], remedy: Option[Array[Long]], maxDepth: Int)
      : IndexedSeq[TokSpan] = {
    val out = mutable.ArrayBuffer.empty[TokSpan]
    var l = 0
    while (l < layers.length) { decodeLayerSingle(layers(l), l + 1, out); l += 1 }
    remedy.foreach(r => decodeRemedySingle(r, maxDepth, out))
    out.toIndexedSeq
  }

  def decodeMulti(layers: IndexedSeq[Array[Long]], remedy: Option[Array[Long]], maxDepth: Int)
      : IndexedSeq[TokSpan] = {
    val out = mutable.ArrayBuffer.empty[TokSpan]
    var l = 0
    while (l < layers.length) { decodeLayerMulti(layers(l), l + 1, out); l += 1 }
    remedy.foreach(r => decodeRemedyMulti(r, maxDepth, out))
    out.toIndexedSeq
  }
}
