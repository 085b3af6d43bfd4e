package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline._

/** Empty / whitespace-only / single-char documents must flow through every
  * text-analysis operator — at corpus scale they are routine, and under
  * Spark 4's default ANSI mode a zero denominator or overflow THROWS the
  * whole job rather than producing a null. */
class EmptyDocSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, ""), (2L, " "), (3L, "\n\t  \n"), (4L, "a"),
    (5L, "normal text with several words here")).toDF("doc_id", "text")

  test("every text operator survives empty/whitespace/single-char docs") {
    docs.select(TextAnalysis.langId(col("text"))).collect()
    docs.select(TextAnalysis.tokenCount(col("text"))).collect()
    docs.select(TextAnalysis.regexTokenCount(col("text"))).collect()
    docs.select(TextAnalysis.fingerprint(col("text"))).collect()
    docs.select(TextAnalysis.redactPii(col("text"))).collect()
    docs.select(TextAnalysis.winnow(col("text"))).collect()
    TextAnalysis.quality(docs, "text").collect()
    TextAnalysis.repetition(docs, "text").collect()
    TextAnalysis.tokenEntropy(docs, "doc_id", "text").collect()
    TextAnalysis.unigramNll(docs, "doc_id", "text").collect()
    TextAnalysis.bigramNll(docs, "doc_id", "text").collect()
    TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text", 3).collect()
    TextAnalysis.slidingChunks(docs, "doc_id", "text", 32, 24).collect()
    TextAnalysis.lineRepetition(docs, "text").collect()
    TextAnalysis.charGramRepetition(docs, "text").collect()
    Dedup.minhashSignature(docs, "doc_id", "text", 8).collect()
    Dedup.simhash16(docs, "doc_id", "text").collect()
    Dedup.lineDedup(docs, "doc_id", "text").collect()
    Dedup.repeatedSpans(docs, "doc_id", "text").collect()
    Dedup.cdcChunks(docs, "doc_id", "text").collect()
  }
}
