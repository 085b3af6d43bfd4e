package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.metric.NativeHistograms

/** Bucket math for [[NativeHistograms.quantile]] — pure DataFrame rows, no
  * engine: standard exponential schemas, negative buckets, the zero-bucket
  * bound collapse, NHCB custom bounds, and the φ edge cases. */
class NativeHistogramsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val schema = StructType(Seq(
    StructField("series_key", StringType),
    StructField("ts_ms", LongType),
    StructField("count", DoubleType), StructField("sum", DoubleType),
    StructField("bucket_schema", IntegerType),
    StructField("zero_threshold", DoubleType),
    StructField("zero_count", DoubleType),
    StructField("pos_idx", ArrayType(IntegerType)),
    StructField("pos_cnt", ArrayType(DoubleType)),
    StructField("neg_idx", ArrayType(IntegerType)),
    StructField("neg_cnt", ArrayType(DoubleType)),
    StructField("custom_values", ArrayType(DoubleType))))

  private def df(rows: Row*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq), schema)

  private def q(rowsDf: org.apache.spark.sql.DataFrame,
      phis: Double*): Map[Double, Double] =
    NativeHistograms.quantile(rowsDf, phis.toSeq).collect()
      .map(r => r.getAs[Double]("phi") -> r.getAs[Double]("value")).toMap

  test("positive-only exponential buckets, linear within the bucket") {
    // schema 0 → base 2: zero [0,0.001]=2, (1,2]=3, (2,4]=5; count 10
    val rows = df(Row("s", 0L, 10.0, 21.0, 0, 0.001, 2.0,
      Seq(1, 2), Seq(3.0, 5.0), Seq.empty[Int], Seq.empty[Double],
      Seq.empty[Double]))
    val got = q(rows, 0.2, 0.5, 0.9, 1.0)
    assert(math.abs(got(0.2) - 0.001) < 1e-12) // rank 2 tops the zero bucket
    assert(math.abs(got(0.5) - 2.0) < 1e-12)
    assert(math.abs(got(0.9) - 3.6) < 1e-12)
    assert(math.abs(got(1.0) - 4.0) < 1e-12) // top bucket's upper bound
  }

  test("negative buckets walk most-negative-first; zero bucket bound " +
      "collapses on the empty side") {
    // schema 0: neg idx 1 → [-2,-1) cnt 4; zero [-0.5, 0] cnt 2 (upper
    // collapsed: no positive buckets); count 6
    val rows = df(Row("s", 0L, 6.0, -5.0, 0, 0.5, 2.0,
      Seq.empty[Int], Seq.empty[Double], Seq(1), Seq(4.0),
      Seq.empty[Double]))
    val got = q(rows, 0.5, 1.0)
    // rank 3: neg bucket [-2,-1) cum 4 ≥ 3 → -2 + 1·(3/4) = -1.25
    assert(math.abs(got(0.5) - (-1.25)) < 1e-12)
    // rank 6: zero bucket [-0.5, 0] → -0.5 + 0.5·(6-4)/2 = 0
    assert(math.abs(got(1.0) - 0.0) < 1e-12)
  }

  test("NHCB (schema -53): classic upper bounds from custom_values") {
    // bounds [1, 5, 10]: bucket0 (0,1]=2, bucket2 (5,10]=4; count 6
    val rows = df(Row("s", 0L, 6.0, 30.0, -53, 0.0, 0.0,
      Seq(0, 2), Seq(2.0, 4.0), Seq.empty[Int], Seq.empty[Double],
      Seq(1.0, 5.0, 10.0)))
    val got = q(rows, 0.25, 0.75)
    // rank 1.5 in (0,1]: 0 + 1·(1.5/2) = 0.75
    assert(math.abs(got(0.25) - 0.75) < 1e-12)
    // rank 4.5 in (5,10]: 5 + 5·(4.5-2)/4 = 8.125
    assert(math.abs(got(0.75) - 8.125) < 1e-12)
  }

  test("histogram_fraction: linear within-bucket overlap, zero-width " +
      "zero bucket, inverted/empty edge cases") {
    // schema 0: zero [0,0.001]=2, (1,2]=3, (2,4]=5; count 10
    val rows = df(Row("s", 0L, 10.0, 21.0, 0, 0.001, 2.0,
      Seq(1, 2), Seq(3.0, 5.0), Seq.empty[Int], Seq.empty[Double],
      Seq.empty[Double]))
    def f(lo: Double, hi: Double): Double =
      NativeHistograms.fraction(rows, lo, hi).collect().head
        .getAs[Double]("value")
    assert(math.abs(f(0.0, 2.0) - 0.5) < 1e-12) // zero + (1,2] = 5/10
    // (1.5,2)·3 + (2,3)/2·5 = 1.5 + 2.5 = 4 → 0.4
    assert(math.abs(f(1.5, 3.0) - 0.4) < 1e-12)
    assert(math.abs(f(-10.0, 10.0) - 1.0) < 1e-12) // everything
    assert(f(3.0, 1.0) == 0.0) // inverted bounds
    // zero-width zero bucket (zt=0) contributes fully when 0 ∈ [lo, hi]
    val zt0 = df(Row("s", 0L, 4.0, 6.0, 0, 0.0, 2.0,
      Seq(1), Seq(2.0), Seq.empty[Int], Seq.empty[Double],
      Seq.empty[Double]))
    assert(math.abs(NativeHistograms.fraction(zt0, -1.0, 0.5).collect().head
      .getAs[Double]("value") - 0.5) < 1e-12) // the 2 zero-obs of 4
    val empty = df(Row("s", 0L, 0.0, 0.0, 0, 0.0, 0.0,
      Seq.empty[Int], Seq.empty[Double], Seq.empty[Int], Seq.empty[Double],
      Seq.empty[Double]))
    assert(NativeHistograms.fraction(empty, 0.0, 1.0).collect().head
      .getAs[Double]("value").isNaN)
    // INFINITE bounds are the canonical CDF shape — a bare interpolated
    // Infinity token would parse as a column and fail analysis
    assert(math.abs(f(Double.NegativeInfinity, 2.0) - 0.5) < 1e-12)
    assert(math.abs(f(Double.NegativeInfinity, Double.PositiveInfinity)
      - 1.0) < 1e-12)
    assert(math.abs(f(2.0, Double.PositiveInfinity) - 0.5) < 1e-12)
    // an INFINITE-WIDTH bucket (NHCB with no custom bounds → (0, +Inf])
    // counts fully only when the bounds cover both its endpoints — a
    // naive (hi-lo)/(Inf) interpolation would be NaN for an Inf bound
    val nhcbInf = df(Row("s", 0L, 4.0, 9.0, -53, 0.0, 3.0,
      Seq(1), Seq(1.0), Seq.empty[Int], Seq.empty[Double],
      Seq.empty[Double])) // zero bucket 3 at 0; (0, Inf] = 1
    def fn(lo: Double, hi: Double): Double =
      NativeHistograms.fraction(nhcbInf, lo, hi).collect().head
        .getAs[Double]("value")
    assert(math.abs(fn(-1.0, Double.PositiveInfinity) - 1.0) < 1e-12)
    assert(math.abs(fn(-1.0, 100.0) - 0.75) < 1e-12) // Inf bucket excluded
  }

  test("histogram_stddev/stdvar: geometric midpoints for standard " +
      "schemas, ARITHMETIC midpoints for NHCB custom buckets") {
    // schema 0, buckets (1,2]=3 at sqrt(2), (2,4]=5 at sqrt(8), zero=2
    // at 0; count 10, sum chosen so mean = 1
    val std = df(Row("s", 0L, 10.0, 10.0, 0, 0.001, 2.0,
      Seq(1, 2), Seq(3.0, 5.0), Seq.empty[Int], Seq.empty[Double],
      Seq.empty[Double]))
    val expectedStd = (2.0 * 1.0 +
      3.0 * math.pow(math.sqrt(2.0) - 1.0, 2) +
      5.0 * math.pow(math.sqrt(8.0) - 1.0, 2)) / 10.0
    val gotStd = NativeHistograms.stdvar(std, stddev = false).collect()
      .head.getAs[Double]("value")
    assert(math.abs(gotStd - expectedStd) < 1e-12, s"$gotStd vs $expectedStd")
    // NHCB bounds [1, 10]: bucket0 (0,1] midpoint 0.5, bucket1 (1,10]
    // midpoint 5.5 — Prometheus's custom-bucket ARITHMETIC rule (the
    // geometric sqrt(10)≈3.16 would skew every OTLP fixed-bucket series)
    val nhcb = df(Row("s", 0L, 4.0, 12.0, -53, 0.0, 0.0,
      Seq(0, 1), Seq(2.0, 2.0), Seq.empty[Int], Seq.empty[Double],
      Seq(1.0, 10.0))) // mean = 3
    val expectedNhcb = (2.0 * math.pow(0.5 - 3.0, 2) +
      2.0 * math.pow(5.5 - 3.0, 2)) / 4.0
    val gotNhcb = NativeHistograms.stdvar(nhcb, stddev = false).collect()
      .head.getAs[Double]("value")
    assert(math.abs(gotNhcb - expectedNhcb) < 1e-12,
      s"$gotNhcb vs $expectedNhcb")
    // stddev = sqrt(stdvar)
    val gotDev = NativeHistograms.stdvar(nhcb, stddev = true).collect()
      .head.getAs[Double]("value")
    assert(math.abs(gotDev - math.sqrt(expectedNhcb)) < 1e-12)
    // a ZERO-observation histogram (count 0 — a series that exists but has
    // recorded nothing yet): the answer is NaN like histogram_quantile's
    // empty case, and the mean's sum/count must not trip ANSI
    // divide-by-zero on the way there
    val empty = df(Row("s", 0L, 0.0, 0.0, 0, 0.001, 0.0,
      Seq.empty[Int], Seq.empty[Double], Seq.empty[Int], Seq.empty[Double],
      Seq.empty[Double]))
    val gotEmpty = NativeHistograms.stdvar(empty, stddev = false).collect()
      .head.getAs[Double]("value")
    assert(gotEmpty.isNaN, s"zero-count stdvar: $gotEmpty")
  }

  test("increase: sparse absence arithmetic without a dense fill — a " +
      "bucket that disappears and reappears resets to 0 in between") {
    // ts1 idx1=5; ts2 idx1 ABSENT (drop→0, reset: +0); ts3 idx1=3 (+3);
    // idx2 appears first at ts2 (+4 — rise from implicit 0, the series
    // has an earlier sample), grows at ts3 (+2); zero stays 1 (+0)
    val rows = df(
      Row("s", 1000L, 6.0, 9.0, 0, 0.001, 1.0,
        Seq(1), Seq(5.0), Seq.empty[Int], Seq.empty[Double],
        Seq.empty[Double]),
      Row("s", 2000L, 5.0, 8.0, 0, 0.001, 1.0,
        Seq(2), Seq(4.0), Seq.empty[Int], Seq.empty[Double],
        Seq.empty[Double]),
      Row("s", 3000L, 10.0, 20.0, 0, 0.001, 1.0,
        Seq(1, 2), Seq(3.0, 6.0), Seq.empty[Int], Seq.empty[Double],
        Seq.empty[Double]))
    val inc = NativeHistograms.increase(rows).collect()
    assert(inc.length == 1)
    val r = inc.head
    assert(r.getAs[scala.collection.Seq[Int]]("pos_idx").toSeq == Seq(1, 2))
    assert(r.getAs[scala.collection.Seq[Double]]("pos_cnt").toSeq ==
      Seq(3.0, 6.0)) // idx1: 0+0+3; idx2: 4+2
    assert(r.getAs[Double]("zero_count") == 0.0)
    // count rides the STORED count field as its own reset-aware counter
    // (6 → 5 is a reset → +5; 5 → 10 → +5 = 10), NOT a bucket-mass
    // recompute (which would say 9 here): NaN observations increment
    // count without landing in any bucket, and the count field is the
    // only place their mass survives
    assert(r.getAs[Double]("count") == 10.0)
    // bucketized: ts1 (bucket 0) is the overall-first sample → 0; ts2 and
    // ts3 land in bucket 2000 (count +5 reset, then +5) with the ts1→ts2
    // delta chained ACROSS the bucket boundary, attributed to the later
    // sample's bucket
    val bucketed = NativeHistograms.increase(rows, Some(2000L)).collect()
      .map(r => r.getAs[Long]("bucket_ms") -> r.getAs[Double]("count")).toMap
    assert(bucketed == Map(0L -> 0.0, 2000L -> 10.0), bucketed.toString)
    // a NaN-only observation window: count grows 6 → 8 with NO bucket
    // change — the increase must report 2 observations, not 0
    val nanRows = df(
      Row("n", 1000L, 6.0, 9.0, 0, 0.001, 1.0,
        Seq(1), Seq(5.0), Seq.empty[Int], Seq.empty[Double],
        Seq.empty[Double]),
      Row("n", 2000L, 8.0, 9.0, 0, 0.001, 1.0,
        Seq(1), Seq(5.0), Seq.empty[Int], Seq.empty[Double],
        Seq.empty[Double]))
    assert(NativeHistograms.increase(nanRows).collect()
      .head.getAs[Double]("count") == 2.0)
  }

  test("sumHistograms: bucket-wise cross-series sum, widest zero " +
      "threshold, mixed schemas rejected") {
    import org.apache.spark.sql.functions.{col, lit}
    val rows = df(
      Row("s1", 1000L, 4.0, 5.0, 0, 0.001, 1.0,
        Seq(1), Seq(3.0), Seq.empty[Int], Seq.empty[Double],
        Seq.empty[Double]),
      Row("s2", 2000L, 5.0, 15.0, 0, 0.01, 0.0,
        Seq(2), Seq(5.0), Seq.empty[Int], Seq.empty[Double],
        Seq.empty[Double]))
      .withColumn("g", lit("a"))
    val summed = NativeHistograms.sumHistograms(rows, Seq("g")).collect()
    assert(summed.length == 1)
    val r = summed.head
    assert(r.getAs[Double]("count") == 9.0)
    assert(r.getAs[Double]("zero_count") == 1.0)
    assert(r.getAs[Double]("zero_threshold") == 0.01) // widest wins
    assert(r.getAs[scala.collection.Seq[Int]]("pos_idx").toSeq == Seq(1, 2))
    assert(r.getAs[scala.collection.Seq[Double]]("pos_cnt").toSeq ==
      Seq(3.0, 5.0))
    // quantile over the sum: rank 4.5 → (2,4]: 2 + 2·(4.5-4)/5 = 2.2
    val q = NativeHistograms.quantile(
      spark.createDataFrame(spark.sparkContext.parallelize(summed.toSeq),
        summed.head.schema), Seq(0.5)).collect().head.getAs[Double]("value")
    assert(math.abs(q - 2.2) < 1e-12)
    // mixed STANDARD schemas downscale to the coarsest present (round
    // 12): schema-3 bucket 2 covers (2^(1/8), 2^(2/8)] ⊆ schema-0
    // bucket 1 (1,2] — idx ((2-1) >> 3) + 1 = 1 — so the sum is exact
    val mixed = df(
      Row("s1", 1000L, 4.0, 5.0, 0, 0.0, 1.0,
        Seq(1), Seq(3.0), Seq.empty[Int], Seq.empty[Double],
        Seq.empty[Double]),
      Row("s2", 2000L, 5.0, 15.0, 3, 0.0, 0.0,
        Seq(2), Seq(5.0), Seq.empty[Int], Seq.empty[Double],
        Seq.empty[Double]))
      .withColumn("g", lit("a"))
    val conv = NativeHistograms.sumHistograms(mixed, Seq("g")).collect()
    assert(conv.length == 1)
    assert(conv.head.getAs[Int]("bucket_schema") == 0)
    assert(conv.head.getAs[scala.collection.Seq[Int]]("pos_idx").toSeq ==
      Seq(1))
    assert(conv.head.getAs[scala.collection.Seq[Double]]("pos_cnt").toSeq ==
      Seq(8.0))
    // NHCB: same schema (-53) but different custom bounds is meaningless
    val nhcbMixed = df(
      Row("s1", 1000L, 2.0, 1.0, -53, 0.0, 0.0,
        Seq(0), Seq(2.0), Seq.empty[Int], Seq.empty[Double],
        Seq(1.0, 5.0)),
      Row("s2", 2000L, 3.0, 6.0, -53, 0.0, 0.0,
        Seq(0), Seq(3.0), Seq.empty[Int], Seq.empty[Double],
        Seq(2.0, 4.0)))
      .withColumn("g", lit("a"))
    val e2 = intercept[Exception](
      NativeHistograms.sumHistograms(nhcbMixed, Seq("g")).collect())
    assert(e2.getMessage.contains("custom bucket bounds"), e2.getMessage)
  }

  test("schema conversion: a mid-window schema change downscales the " +
      "finer samples to the coarsest — adjacent pairs merge exactly, " +
      "asymmetric spans and negative indexes included; NHCB cannot mix " +
      "with standard schemas") {
    // ts1 at schema 0: (1,2],(2,4],(4,8],(8,16] = 1,2,3,4; ts2 at schema
    // -1 (base 4): (1,4]=13, (4,16]=17. Target -1: ts1 merges to
    // (1,4]=3, (4,16]=7 → increase 10 per bucket.
    val rows = df(
      Row("s", 1000L, 10.0, 9.0, 0, 0.0, 0.0,
        Seq(1, 2, 3, 4), Seq(1.0, 2.0, 3.0, 4.0),
        Seq.empty[Int], Seq.empty[Double], Seq.empty[Double]),
      Row("s", 2000L, 30.0, 60.0, -1, 0.0, 0.0,
        Seq(1, 2), Seq(13.0, 17.0),
        Seq.empty[Int], Seq.empty[Double], Seq.empty[Double]))
    val inc = NativeHistograms.increase(rows).collect()
    assert(inc.length == 1)
    val r = inc.head
    assert(r.getAs[Int]("bucket_schema") == -1)
    assert(r.getAs[scala.collection.Seq[Int]]("pos_idx").toSeq == Seq(1, 2))
    assert(r.getAs[scala.collection.Seq[Double]]("pos_cnt").toSeq ==
      Seq(10.0, 10.0))
    assert(r.getAs[Double]("count") == 20.0)
    // asymmetric spans + zero/negative indexes: schema 1 idx -1,0,1 →
    // schema 0 idx ((i-1)>>1)+1 = 0,0,1 (the -1/0 pair merges; 1 rides
    // alone) — across a sum group with one schema-0 series
    import org.apache.spark.sql.functions.lit
    val asym = df(
      Row("s1", 1000L, 7.0, 4.0, 1, 0.0, 0.0,
        Seq(-1, 0, 1), Seq(1.0, 2.0, 4.0),
        Seq.empty[Int], Seq.empty[Double], Seq.empty[Double]),
      Row("s2", 1000L, 5.0, 3.0, 0, 0.0, 0.0,
        Seq(0), Seq(5.0),
        Seq.empty[Int], Seq.empty[Double], Seq.empty[Double]))
      .withColumn("g", lit("a"))
    val s = NativeHistograms.sumHistograms(asym, Seq("g")).collect()
    assert(s.length == 1)
    assert(s.head.getAs[Int]("bucket_schema") == 0)
    assert(s.head.getAs[scala.collection.Seq[Int]]("pos_idx").toSeq ==
      Seq(0, 1))
    assert(s.head.getAs[scala.collection.Seq[Double]]("pos_cnt").toSeq ==
      Seq(8.0, 4.0)) // idx0: 1+2 merged + 5; idx1: 4
    // NHCB + standard: custom bounds are unrelated to the exponential
    // grid — no exact conversion, loud rejection
    val bad = df(
      Row("s", 1000L, 2.0, 1.0, -53, 0.0, 0.0,
        Seq(0), Seq(2.0), Seq.empty[Int], Seq.empty[Double],
        Seq(1.0, 5.0)),
      Row("s", 2000L, 3.0, 2.0, 0, 0.0, 0.0,
        Seq(1), Seq(3.0), Seq.empty[Int], Seq.empty[Double],
        Seq.empty[Double]))
    val e = intercept[Exception](NativeHistograms.increase(bad).collect())
    assert(e.getMessage.contains("NHCB"), e.getMessage)
  }

  test("φ edge cases: out-of-range → ±Inf, empty histogram → NaN") {
    val rows = df(Row("s", 0L, 10.0, 21.0, 0, 0.0, 0.0,
      Seq(1), Seq(10.0), Seq.empty[Int], Seq.empty[Double],
      Seq.empty[Double]))
    val got = q(rows, -0.1, 1.1)
    assert(got(-0.1).isNegInfinity)
    assert(got(1.1).isPosInfinity)
    val empty = df(Row("s", 0L, 0.0, 0.0, 0, 0.0, 0.0,
      Seq.empty[Int], Seq.empty[Double], Seq.empty[Int], Seq.empty[Double],
      Seq.empty[Double]))
    assert(q(empty, 0.5)(0.5).isNaN)
  }
}
