package graft.kg

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Stage 0b — deterministic alias dictionary (FIXTURES.md §3).
  *
  * Real pipelines take this from a KB; the sandbox stand-in derives it from
  * the corpus: every distinct 1..3-token window whose md5 falls under a
  * selectivity threshold becomes a KB alias. ~`Ambig` of aliases carry TWO
  * entity ids (ambiguity → canonicalization edges); priors are md5-derived
  * fractions (deterministic tie-breaks).
  *
  * Built with plain relational ops so the DuckDB oracle can rebuild it:
  * posexplode ngram windows → two-phase distinct → md5 filter → id/kind/prior
  * projection. The result is small (≤ ~100k rows) → broadcast at link time.
  */
object AliasDict {
  /** fraction of distinct ngrams that are dictionary aliases */
  val Selectivity = 0.30
  /** fraction of aliases that are ambiguous (two candidate entities) */
  val Ambiguity = 0.15

  /** md5-derived uniform fraction in [0,1): first 6 hex chars / 16^6.
    * Same formula is expressible in DuckDB SQL for the oracle.
    */
  def mdFrac(col: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(col), 1, 6), 16, 10).cast("double") / lit(16777216.0)

  def kindOf(col: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val kinds = Mentions.Kinds
    val idx = pmod(conv(substring(md5(col), 7, 4), 16, 10).cast("int"), lit(kinds.length))
    kinds.zipWithIndex.foldLeft(lit(kinds.head)) { case (acc, (k, i)) =>
      when(idx === i, lit(k)).otherwise(acc)
    }
  }

  /** alias candidates = lowercased 1..3-token windows over each doc's text
    * tokens. Single pass, no shuffle: the sliding windows are enumerated with
    * array higher-order functions inside the scan projection (the relational
    * L1 analogue — posexplode + self-join on pos2 = pos1 + l - 1 would shuffle
    * twice for the same result).
    */
  def ngramsDf(docs: Dataset[PyramidDoc]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val arr = docs.select(
      filter($"spans", s => s("kind") === "text").getField("text").as("toks"))
    // guard each window length: sequence(a, b) with a > b yields a DESCENDING
    // range in Spark, not an empty one
    val windows = flatten(transform(lit(Array(1, 2, 3)), len =>
      when(size($"toks") >= len,
        transform(sequence(lit(0), size($"toks") - len), i =>
          lower(array_join(slice($"toks", i + 1, len), " "))))
        .otherwise(array().cast("array<string>"))))
    arr.select(explode(windows).as("alias")).where(length($"alias") > 0)
  }

  def build(docs: Dataset[PyramidDoc]): DataFrame = {
    import org.apache.spark.sql.Column
    val distinctAliases = ngramsDf(docs).distinct() // two-phase hash agg
      .where(mdFrac(col("alias")) < Selectivity)
    def entity(aliasCol: Column, salt: String): Column =
      concat(lit("E"), substring(md5(concat(aliasCol, lit(salt))), 1, 12))
    def rowOf(e: Column, k: Column, p: Column) =
      struct(e.as("entity_id"), k.as("kind"), p.as("prior"))
    val primary = rowOf(entity(col("alias"), ""), kindOf(col("alias")),
      mdFrac(concat(col("alias"), lit("#p"))) * 0.5 + 0.5)
    // ambiguous multi-token aliases also resolve to their HEAD token's entity
    // ("Barack Obama" vs "Obama"): gives canonicalization real multi-node
    // components (stars around hot head tokens — the CC skew case).
    // One projection + explode instead of a primary/secondary union — a union
    // of two filters over the same aggregate would compute the distinct TWICE
    // (no exchange reuse across the differing projections).
    val head = substring_index(col("alias"), " ", 1)
    val secondary = rowOf(entity(head, ""), kindOf(head),
      mdFrac(concat(col("alias"), lit("#q"))) * 0.5)
    val isAmbiguous =
      (mdFrac(concat(col("alias"), lit("#a"))) < Ambiguity) && col("alias").contains(" ")
    distinctAliases
      .select(col("alias"), explode(
        when(isAmbiguous, array(primary, secondary)).otherwise(array(primary))).as("r"))
      .select(col("alias"), col("r.entity_id"), col("r.kind"), col("r.prior"))
  }
}
