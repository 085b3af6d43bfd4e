package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: language
  * identification, quality scoring, token counting, document fingerprinting.
  * All pure column expressions (whole-stage-codegen friendly, no UDFs), so
  * they scale to 100 TB as embarrassingly parallel map work with pushdown
  * intact. */
object TextAnalysis {

  /** Whitespace tokens (keeps empty tokens on double spaces, like a plain
    * split in any engine — callers filter if needed). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token estimate: alpha runs, digit runs, and individual
    * non-alnum marks each count as one token. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Tiny per-language stopword lists for the n-gram/stopword heuristic. */
  val StopwordsEn = Seq("the", "and", "of", "to", "in", "is", "it")
  val StopwordsEs = Seq("el", "la", "de", "en", "que", "y", "los")
  val StopwordsDe = Seq("der", "die", "das", "und", "ist", "von", "mit")

  private def stopwordHits(text: Column, words: Seq[String]): Column =
    aggregate(
      transform(tokens(lower(text)),
        t => when(t.isInCollection(words), lit(1)).otherwise(lit(0))),
      lit(0), (acc, x) => acc + x)

  /** Stopword-count language ID with deterministic tie-break en > es > de.
    * Returns one of "en"/"es"/"de"/"und" (undetermined when no hits). */
  def langId(text: Column): Column = {
    val en = stopwordHits(text, StopwordsEn)
    val es = stopwordHits(text, StopwordsEs)
    val de = stopwordHits(text, StopwordsDe)
    when(en === 0 && es === 0 && de === 0, lit("und"))
      .when(en >= es && en >= de, lit("en"))
      .when(es >= de, lit("es"))
      .otherwise(lit("de"))
  }

  /** Quality metrics: char length, token count, mean token length, stopword
    * ratio. Deterministic (exact int arithmetic + one rounded division). */
  def quality(df: DataFrame, textCol: String, outPrefix: String = "q_"): DataFrame = {
    val t = col(textCol)
    val nTok = tokenCount(t)
    df.withColumn(s"${outPrefix}chars", length(t))
      .withColumn(s"${outPrefix}tokens", nTok)
      .withColumn(s"${outPrefix}mean_tok_len",
        round((length(t) - (nTok - 1)).cast("double") / nTok, 4))
      .withColumn(s"${outPrefix}stop_ratio",
        round(stopwordHits(t, StopwordsEn).cast("double") / nTok, 4))
  }

  /** Normalized-content fingerprint: md5 over lowercased text with spaces
    * removed — catches whitespace/case-only near-duplicates exactly. */
  def fingerprint(text: Column): Column = md5(regexp_replace(lower(text), " ", ""))
}
