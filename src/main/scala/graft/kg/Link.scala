package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage 2 — entity linking: mentions ⋈ broadcast(alias dictionary).
  *
  * Scale design: candidate selection happens on the DICTIONARY side before
  * the join — the dictionary is pre-aggregated to one row per alias carrying
  * its best candidate (max_by over (prior, entity_id), deterministic ties).
  * The big mention table then takes a single BROADCAST hash join and never
  * shuffles; a window over mention_id (the naive formulation) would shuffle
  * the full mention stream just to rank 1-2 candidates.
  */
object Link {

  /** alias → (best entity, kind, prior) — tiny, evaluated once, broadcast. */
  def bestCandidates(dict: DataFrame): DataFrame =
    dict.groupBy("alias").agg(
      max_by(
        struct(col("entity_id"), col("kind"), col("prior")),
        struct(col("prior"), col("entity_id"))).as("best"))
      .select(col("alias"), col("best.entity_id"), col("best.kind").as("dict_kind"),
        col("best.prior"))

  /** mentions (stage-1 output) → linked mentions. Inner join: unlinkable
    * mentions drop out here (NIL in KB terms).
    *
    * `useBroadcast = false` switches to a shuffle hash/sort-merge join for
    * KB-scale dictionaries (10⁸ aliases would OOM the driver broadcast) —
    * same escape hatch as Canonical.canonicalize.
    */
  /** dict rows above which the pre-aggregated candidate table stops being
    * broadcastable: ~100 B per alias row → ~100 MB at this threshold, the
    * upper edge of comfortable executor broadcast. A corpus-derived dict
    * stays far under it; a KB-scale dict (10^8 aliases) trips the shuffle
    * path automatically.
    */
  val BroadcastMaxAliases = 1000000L

  /** Size-guarded link: probes the dict row count (cheap — callers persist
    * the dict; an upper bound on distinct aliases) and picks broadcast vs
    * shuffle join from it, so the 100 TB configuration needs no hand flag.
    */
  def linkAuto(mentions: DataFrame, dict: DataFrame,
               maxBroadcastRows: Long = BroadcastMaxAliases): DataFrame =
    link(mentions, dict, useBroadcast = dict.count() <= maxBroadcastRows)

  def link(mentions: DataFrame, dict: DataFrame, useBroadcast: Boolean = true): DataFrame = {
    val best0 = bestCandidates(dict)
    val best = if (useBroadcast) broadcast(best0) else best0
    mentions
      .withColumn("norm_text", lower(col("text")))
      .join(best, col("norm_text") === col("alias"), "inner")
      .select(
        mentions("doc_id"), mentions("mention_id"), mentions("kind"),
        mentions("text"), mentions("media_ref"), mentions("start_tok"),
        mentions("len"), mentions("order"),
        col("entity_id"), col("dict_kind"), col("prior"))
  }
}
