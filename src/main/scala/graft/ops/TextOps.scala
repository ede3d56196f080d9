package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline: language ID
  * (stopword-ratio heuristic), quality scoring, token counting (whitespace +
  * BPE-ish regex), document fingerprinting. All codegen'd `functions._`
  * expressions with 1:1 DuckDB oracle SQL.
  */
object TextOps {

  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "a", "for", "on", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "zu", "den", "von", "mit", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "de", "un", "une", "pour", "dans"),
    "es" -> Seq("el", "los", "las", "y", "es", "de", "un", "una", "para", "en"))
  val LangOrder: Seq[String] = Seq("en", "de", "fr", "es") // deterministic tie-break

  val BpeRegex = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  def docsDf(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  private def toks: Column = split(col("text"), "\\s+")

  private def stopRatio(lang: String): Column = {
    val list = Stopwords(lang).map(lit(_))
    round(size(filter(toks, t => t.isInCollection(Stopwords(lang)))).cast("double")
      / greatest(size(toks), lit(1)), 6)
  }

  /** n-gram/stopword heuristic language ID; ties resolved in LangOrder. */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = docsDf(spark, sfDir).select(
      (Seq(col("doc_id"), col("lang").as("tagged_lang")) ++
        LangOrder.map(l => stopRatio(l).as(s"score_$l"))): _*)
    val pred =
      when(col("score_en") >= col("score_de") && col("score_en") >= col("score_fr")
        && col("score_en") >= col("score_es"), "en")
        .when(col("score_de") >= col("score_fr") && col("score_de") >= col("score_es"), "de")
        .when(col("score_fr") >= col("score_es"), "fr")
        .otherwise("es")
    scored.withColumn("pred_lang", pred)
  }

  /** quality features + a composite score in [0,1]. The score combines the
    * RAW ratios (rounding only the output columns) so it matches an oracle
    * that recomputes the ratios inline.
    */
  def quality(spark: SparkSession, sfDir: String): DataFrame = {
    val nTok = size(toks)
    val avgTokLen =
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        greatest(nTok, lit(1))
    val punct =
      (length(col("text")) - length(regexp_replace(col("text"), "[^a-z0-9 ]", "")))
        .cast("double") / greatest(length(col("text")), lit(1))
    val stop = size(filter(toks, t => t.isInCollection(Stopwords("en"))))
      .cast("double") / greatest(nTok, lit(1))
    val lenScore = least(nTok.cast("double") / lit(100.0), lit(1.0))
    val score = lenScore * 0.4 + stop * 0.3 + (lit(1.0) - punct) * 0.3
    docsDf(spark, sfDir).select(col("doc_id"), nTok.as("n_tokens"),
      round(avgTokLen, 6).as("avg_tok_len"), round(punct, 6).as("punct_ratio"),
      round(stop, 6).as("stopword_ratio"), round(score, 6).as("quality_score"))
  }

  /** whitespace token count + BPE-ish subword count. */
  def tokenCounts(spark: SparkSession, sfDir: String): DataFrame =
    docsDf(spark, sfDir).select(
      col("doc_id"),
      size(toks).as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit(BpeRegex), lit(0))).as("bpe_tokens"))

  /** md5 content fingerprint + 60-bit numeric prefix (join-friendly key). */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    val norm = regexp_replace(trim(col("text")), "\\s+", " ")
    docsDf(spark, sfDir).select(
      col("doc_id"),
      md5(norm).as("fingerprint"),
      conv(substring(md5(norm), 1, 15), 16, 10).cast("long").as("fp60"))
  }
}
