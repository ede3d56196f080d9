package graft.kg

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._

/** Stage 1 — mention detection: `Dataset[PyramidDoc].mapPartitions(pyramid
  * inference)` → `Dataset[Mention]` (SURVEY.md §7 stage 1).
  *
  * Scale notes: the only cluster-wide state is one broadcast of (weights,
  * vocab, codec) — a few MB, fanned out once per executor. The transform is
  * partition-preserving (zero shuffle); per-task cost is pure fp32 compute,
  * so throughput scales linearly with cores until the parquet scan saturates.
  */
object Mentions {
  val Kinds: Seq[String] = Seq("DNA", "RNA", "protein", "cell_line", "cell_type")
  val ModelSeed = 42L
  /** attach a media span to a mention if one lies within this many
    * interleaved-sequence positions of the mention's span
    */
  val MediaWindow = 5

  /** Corpus word lexicon (M2, `data/dataset.py:70-71`): top-K distinct tokens
    * by frequency, deterministic tie-break on the token itself. Two-phase
    * hash agg (partial map-side combine) + TakeOrderedAndProject — no full
    * sort at scale.
    */
  def buildLexicon(docs: Dataset[PyramidDoc], topK: Int = 50000): Array[String] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(explode($"spans").as("s"))
      .where($"s.kind" === "text")
      .groupBy($"s.text".as("token")).agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"token".asc)
      .limit(topK)
      .select($"token").as[String]
      .collect()
  }

  /** Bundle broadcast to executors. */
  final case class Model(weights: PyramidWeights, vocab: WordVocab, codec: LabelCodec)
      extends Serializable

  def buildModel(docs: Dataset[PyramidDoc], cfg: ModelConfig): Model = {
    val lexicon = buildLexicon(docs)
    val vocab = new WordVocab(lexicon)
    Model(PyramidWeights.build(ModelSeed, cfg, vocab.size, Kinds.length), vocab, new LabelCodec(Kinds))
  }

  def mentionId(docId: String, s: TokSpan): String =
    "M" + java.lang.Long.toHexString(Rng.streamKey(s"$docId|${s.kind}|${s.startTok}|${s.lenTok}"))

  /** Pure per-document detection (shared with GoldRef's sequential
    * re-derivation): tokens = text spans in offset order; media attachment =
    * nearest media span within MediaWindow of the mention's interleaved span.
    */
  def detectDoc(doc: PyramidDoc, inf: PyramidInference, codec: LabelCodec): Seq[Mention] =
    detectDocWith(doc, toks => inf.detect(toks, codec))

  /** Same mention assembly with a pluggable span source — the variant
    * decoders (bidirectional / multi-label / contextual, SURVEY §2.4
    * N6/N8/N12/N18) slot in here.
    */
  def detectDocWith(doc: PyramidDoc, spansOf: Array[String] => IndexedSeq[TokSpan]): Seq[Mention] = {
    val textSpans = doc.spans.filter(_.kind == "text").sortBy(_.offset)
    val tokens = textSpans.map(_.text)
    if (tokens.isEmpty) return Nil
    val mediaOffsets = doc.spans.filter(_.kind == "media").map(s => (s.offset, s.media_ref))
    val spans = spansOf(tokens)
    spans.zipWithIndex.map { case (s, order) =>
      val (value, _, _) = Tok.charSpan(tokens, s.startTok, s.lenTok)
      // interleaved positions covered by the mention
      val lo = textSpans(s.startTok).offset
      val hi = textSpans(math.min(s.startTok + s.lenTok, textSpans.length) - 1).offset
      val media = mediaOffsets
        .filter { case (o, _) => o >= lo - MediaWindow && o <= hi + MediaWindow }
        .sortBy { case (o, r) => (math.max(lo - o, o - hi) max 0, r) }
        .headOption.map(_._2).getOrElse("")
      Mention(doc.doc_id, mentionId(doc.doc_id, s), s.kind, value, media, s.startTok, s.lenTok, order)
    }
  }

  /** The mapPartitions transform: one PyramidInference per task (scratch
    * buffers reused across the partition's documents), streaming iterator in,
    * streaming iterator out.
    *
    * The stage is CPU-bound, so parallelism = partition count. A 100 TB scan
    * has thousands of splits, but a small/compacted input can arrive as ONE
    * split and would serialize the whole corpus through one core — defend by
    * widening to the cluster's parallelism when the input is narrower.
    */
  def detect(docs: Dataset[PyramidDoc], bcModel: Broadcast[Model]): Dataset[Mention] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.core.SparkUtil.widen(docs).mapPartitions { it =>
      val m = bcModel.value
      val inf = new PyramidInference(m.weights, m.vocab)
      it.flatMap(doc => detectDoc(doc, inf, m.codec))
    }
  }

  /** Variant detection modes (N6 bidirectional single-label, N8/N18 sigmoid
    * multi-label) as the same zero-shuffle mapPartitions transform; the
    * variant weight bundle rides the same broadcast pattern.
    */
  def detectVariant(docs: Dataset[PyramidDoc], bcModel: Broadcast[Model],
                    bcVar: Broadcast[VariantWeights], mode: String): Dataset[Mention] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.core.SparkUtil.widen(docs).mapPartitions { it =>
      val m = bcModel.value
      val inf = new PyramidInference(m.weights, m.vocab)
      val vi = new PyramidVariantInference(inf, bcVar.value)
      val spansOf: Array[String] => IndexedSeq[TokSpan] = mode match {
        case "bidirectional" => toks => vi.detectBidirectional(toks, m.codec)
        case "multilabel"    => toks => vi.detectMultiLabel(toks, m.codec)
        case other           => throw new IllegalArgumentException(s"unknown variant mode $other")
      }
      it.flatMap(doc => detectDocWith(doc, spansOf))
    }
  }

  // ------------------------------------------------------------------ N14

  /** Deterministic stand-in for a precomputed LM embedding (contextual: keyed
    * on doc, position AND token) — the value set the stager writes to
    * lm_embeddings.parquet. A real pipeline replaces the STAGING with actual
    * LM output; the join-in below is unchanged.
    */
  def lmVec(docId: String, pos: Int, tok: String): Array[Float] =
    Array.tabulate(VariantWeights.LmDim) { j =>
      val u = java.lang.Long.remainderUnsigned(Rng.streamKey(s"lm#$docId#$pos#$tok#$j"), 2000001L)
      (u / 1000000.0 - 1.0).toFloat
    }

  final case class LmTok(pos: Int, emb: Array[Float])
  final case class LmDocRow(doc_id: String, spans: Array[SpanRec], lms: Array[LmTok])

  /** N14 stage-1 variant: detection with a PRECOMPUTED per-token LM embedding
    * table joined in. `lm` rows are (doc_id, pos int, emb array<float>[LmDim]),
    * `pos` indexing text tokens in offset order. One equi-join on doc_id
    * (the lm table arrives pre-grouped per doc by a map-side-combining
    * collect_list), then the same zero-shuffle mapPartitions transform; a doc
    * with no lm rows gets zero vectors (LM-absent semantics).
    */
  def detectLm(docs: Dataset[PyramidDoc], lm: DataFrame, bcModel: Broadcast[Model],
               bcVar: Broadcast[VariantWeights]): Dataset[Mention] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lmPerDoc = lm.groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("pos"), col("emb")))).as("lms"))
    val joined = docs.toDF().join(lmPerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("spans"), col("lms"))
      .as[LmDocRow]
    // unconditional widen (see detectSt): no .rdd partition probe on a join
    val wide = joined.repartition(spark.sparkContext.defaultParallelism)
    wide.mapPartitions { it =>
      val m = bcModel.value
      val inf = new PyramidInference(m.weights, m.vocab)
      val vi = new PyramidVariantInference(inf, bcVar.value)
      val dim = VariantWeights.LmDim
      it.flatMap { row =>
        val doc = PyramidDoc(row.doc_id, row.spans)
        val lms = if (row.lms == null) Array.empty[LmTok] else row.lms
        detectDocWith(doc, { toks =>
          val flat = new Array[Float](toks.length * dim)
          lms.foreach { t =>
            if (t.pos >= 0 && t.pos < toks.length)
              System.arraycopy(t.emb, 0, flat, t.pos * dim, dim)
          }
          vi.detectLm(toks, flat, m.codec)
        })
      }
    }
  }

  // ------------------------------------------------------------ N12 / N13

  /** Document-context grouping for the contextual decoder (N12, ref
    * `modules/decoding/multi_label.py:47-69`): documents are grouped into
    * articles of `CtxArticleDocs` consecutive ids (the same neighborhood the
    * wiki reader S3 models), and each document's context is the tail of its
    * predecessor plus the head of its successor, `CtxTokens` tokens each.
    */
  val CtxArticleDocs = 5
  val CtxTokens = 16

  def articleIdOf(docId: String): Long = docId.stripPrefix("d").toLong / CtxArticleDocs

  def textTokens(doc: PyramidDoc): Array[String] =
    doc.spans.filter(_.kind == "text").sortBy(_.offset).map(_.text)

  /** per-doc (pre, post) context windows within one article; `sorted` must be
    * the article's documents in doc_id order. Pure — shared by the
    * distributed group handler and the sequential gold staging.
    */
  def ctxWindows(sorted: IndexedSeq[PyramidDoc]): IndexedSeq[(PyramidDoc, Array[String], Array[String])] = {
    val toks = sorted.map(textTokens)
    sorted.indices.map { i =>
      val pre = if (i > 0) toks(i - 1).takeRight(CtxTokens) else Array.empty[String]
      val post = if (i + 1 < sorted.length) toks(i + 1).take(CtxTokens) else Array.empty[String]
      (sorted(i), pre, post)
    }
  }

  /** flatMapGroups handler as a Serializable class: broadcast handles are
    * serialized once; the inference engines are `@transient lazy` so each
    * TASK builds them once and reuses them across its groups (a per-group
    * allocation would churn the scratch buffers ~|articles| times).
    */
  private final class CtxGroupDetect(bcModel: Broadcast[Model], bcVar: Broadcast[VariantWeights])
      extends ((Long, Iterator[PyramidDoc]) => Iterator[Mention]) with Serializable {
    @transient private lazy val m = bcModel.value
    @transient private lazy val vi =
      new PyramidVariantInference(new PyramidInference(m.weights, m.vocab), bcVar.value)
    def apply(aid: Long, it: Iterator[PyramidDoc]): Iterator[Mention] = {
      val sorted = it.toIndexedSeq.sortBy(_.doc_id)
      ctxWindows(sorted).iterator.flatMap { case (d, pre, post) =>
        detectDocWith(d, toks => vi.detectContextual(toks, pre, post, m.codec))
      }
    }
  }

  /** N12 contextual detection: ONE shuffle keyed on article_id (uniform id
    * ranges — no skew; a hot key is impossible since an article is exactly
    * `CtxArticleDocs` docs), then per-group windowed inference. At 100 TB the
    * shuffle is the price of cross-document context; storing the corpus
    * bucketed by article range would remove it (the docs materialization in
    * KgRunner is the hook).
    */
  def detectContextual(docs: Dataset[PyramidDoc], bcModel: Broadcast[Model],
                       bcVar: Broadcast[VariantWeights]): Dataset[Mention] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(d => articleIdOf(d.doc_id))
      .flatMapGroups(new CtxGroupDetect(bcModel, bcVar))
  }

  // -------------------------------------------- N12 article-bucketed layout

  /** bucket count for the test-scale staged layout; at corpus scale pick
    * buckets so each bucket file stays a single parquet row group (≤
    * parquet.block.size), which is what keeps an article from straddling two
    * read splits
    */
  val CtxBuckets = 8

  /** `articleIdOf` as a Catalyst expression (doc_id is `d%09d`). */
  private def articleIdCol =
    floor(expr("cast(substring(doc_id, 2) as long)") / CtxArticleDocs)

  /** Materialize the docs table CLUSTERED BY ARTICLE: hash-repartitioned on
    * article_id (one output file per bucket) and sorted (article_id, doc_id)
    * within each file, so every article's documents are contiguous in exactly
    * one file. This is the storage layout that makes the N12 context shuffle
    * disappear: pay the exchange ONCE at materialization, then every
    * contextual-detection pass over the table is shuffle-free
    * ([[detectContextualBucketed]] — KgRunner's docs materialization is the
    * production hook for this write).
    */
  def writeArticleBucketed(docs: Dataset[PyramidDoc], path: String,
                           buckets: Int = CtxBuckets): Unit =
    docs.toDF()
      .withColumn("article_id", articleIdCol)
      .repartition(buckets, col("article_id"))
      .sortWithinPartitions("article_id", "doc_id")
      .drop("article_id")
      .write.mode("overwrite")
      // one row group per bucket file up to 512 MB: FileScan splits parquet
      // only at row-group boundaries, so this is what ENFORCES the
      // no-mid-article-split precondition of detectContextualBucketed
      // (size buckets so each file stays under this at corpus scale)
      .option("parquet.block.size", (512L * 1024 * 1024).toString)
      .parquet(path)

  /** N12 with ZERO shuffle over the article-bucketed layout: each task scans
    * its bucket file and groups CONSECUTIVE docs of the same article (the
    * write above guarantees contiguity + doc_id order), then runs the same
    * windowed inference as [[detectContextual]]. KgPipelineSpec pins row-set
    * equality with the shuffle path and asserts the plan contains no
    * Exchange.
    *
    * Correctness precondition (documented at the write): a bucket file must
    * not be split mid-article — guaranteed when each file is one parquet row
    * group (FileScan splits only at row-group boundaries).
    */
  def detectContextualBucketed(spark: SparkSession, path: String,
                               bcModel: Broadcast[Model],
                               bcVar: Broadcast[VariantWeights]): Dataset[Mention] = {
    import spark.implicits._
    spark.read.parquet(path).as[PyramidDoc].mapPartitions { it =>
      val m = bcModel.value
      val vi = new PyramidVariantInference(new PyramidInference(m.weights, m.vocab), bcVar.value)
      // runtime guard for the one-row-group precondition, enforced at EVERY
      // row transition, not just the partition head: Spark packs multiple
      // file chunks into one read partition (size-sorted bins), so a bucket
      // file split mid-article can land its second chunk AFTER another file's
      // rows — the partition then starts at a valid article boundary while a
      // split article's context windows silently truncate. Doc numbering is
      // contiguous from 0 and an article is the consecutive range
      // [a*CtxArticleDocs, ...), so inside one file rows either advance by
      // exactly 1 (same article, sortWithinPartitions order) or jump to an
      // article's FIRST doc; the same holds across a clean file boundary.
      // Therefore any non-contiguous jump landing mid-article — in either
      // direction, at any position — is precisely a mid-article file split
      // (or an unsorted layout); fail loudly with the remedy.
      var prevDocnum = Long.MinValue
      val guarded = it.map { d =>
        val docnum = d.doc_id.stripPrefix("d").toLong
        require(docnum == prevDocnum + 1 || docnum % CtxArticleDocs == 0,
          s"article-bucketed layout violated: non-contiguous jump to mid-article " +
            s"doc ${d.doc_id} (previous docnum $prevDocnum) — a bucket file was " +
            s"split across read tasks or written unsorted; rewrite with more " +
            s"buckets or a larger parquet.block.size (writeArticleBucketed)")
        prevDocnum = docnum
        d
      }
      val buf = guarded.buffered
      new Iterator[Seq[Mention]] {
        def hasNext: Boolean = buf.hasNext
        def next(): Seq[Mention] = {
          val aid = articleIdOf(buf.head.doc_id)
          val group = scala.collection.mutable.ArrayBuffer.empty[PyramidDoc]
          while (buf.hasNext && articleIdOf(buf.head.doc_id) == aid) group += buf.next()
          ctxWindows(group.toIndexedSeq).flatMap { case (d, pre, post) =>
            detectDocWith(d, toks => vi.detectContextual(toks, pre, post, m.codec))
          }
        }
      }.flatten
    }
  }

  /** Deterministic stand-in for a precomputed sentence-transformer document
    * embedding (N13 third encoder): keyed on doc_id only (a document-level
    * vector, unlike the per-token lmVec). `dim` = the variant ctxDim.
    */
  def stVec(docId: String, dim: Int): Array[Float] =
    Array.tabulate(dim) { j =>
      val u = java.lang.Long.remainderUnsigned(Rng.streamKey(s"st#$docId#$j"), 2000001L)
      (u / 1000000.0 - 1.0).toFloat
    }

  final case class StDocRow(doc_id: String, spans: Array[SpanRec], st: Array[Float])

  /** N13 with PRECOMPUTED context vectors: one equi-join on doc_id against
    * the staged per-document ST-vector table, then the zero-shuffle
    * mapPartitions transform; docs missing a vector run with the zero
    * context (the encoders' empty-context semantics).
    */
  def detectSt(docs: Dataset[PyramidDoc], st: DataFrame, bcModel: Broadcast[Model],
               bcVar: Broadcast[VariantWeights]): Dataset[Mention] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val joined = docs.toDF().join(st.select(col("doc_id"), col("emb").as("st")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("spans"), col("st"))
      .as[StDocRow]
    // unconditional widen: probing joined.rdd.getNumPartitions would force an
    // extra RDD planning of the join, and the pre-AQE count is unreliable
    // anyway; the context tables are slice-sized, so the repartition is cheap
    val wide = joined.repartition(spark.sparkContext.defaultParallelism)
    wide.mapPartitions { it =>
      val m = bcModel.value
      val inf = new PyramidInference(m.weights, m.vocab)
      val vi = new PyramidVariantInference(inf, bcVar.value)
      val dim = bcVar.value.ctxDim
      it.flatMap { row =>
        val doc = PyramidDoc(row.doc_id, row.spans)
        val ctx = if (row.st == null) new Array[Float](dim) else row.st
        detectDocWith(doc, toks => vi.detectWithContext(toks, ctx, m.codec))
      }
    }
  }

  /** Convenience: full stage-1 dataframe for SparkEntry.queries. */
  def mentionsDf(spark: SparkSession, sfDir: String, cfg: ModelConfig = ModelConfig()): DataFrame = {
    val docs = DocGen.docs(spark, sfDir)
    val model = buildModel(docs, cfg)
    val bc = spark.sparkContext.broadcast(model)
    detect(docs, bc).toDF()
  }
}
