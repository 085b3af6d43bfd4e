package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Sharding

/** Shard assembly: the two-phase global prefix sum must equal the
  * single-partition window reference on any input/partitioning, and the
  * packing/split operators must honor their contracts. */
class ShardingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType)))

  private def df(rows: Seq[(Long, java.lang.Long)], parts: Int) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (i, v) => Row(i, v) }, parts), schema)

  test("running total == global window reference (randomized, any partitioning)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 1 + rnd.nextInt(200)
      val rows = (0 until n).map(i =>
        (i.toLong, java.lang.Long.valueOf(rnd.nextInt(50).toLong)))
      val shuffled = rnd.shuffle(rows)
      val in = df(shuffled, 1 + rnd.nextInt(7))
      val got = Sharding.withRunningTotal(in, Seq(col("id")), col("v"), "cum")
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val want = df(rows, 1)
        .withColumn("cum", sum("v").over(Window.orderBy("id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == want, s"trial $trial n=$n")
    }
  }

  test("running total survives a downstream coalesce(1)") {
    // Regression: coalesce merges parent partitions into one task, so
    // TaskContext-based partition ids would re-seed every partition with
    // offset 0 — the split index bound by mapPartitionsWithIndex must win.
    val rows = (0L until 300L).map(i => (i, java.lang.Long.valueOf(i % 17)))
    val in = df(scala.util.Random.shuffle(rows), 6)
    val got = Sharding.withRunningTotal(in, Seq(col("id")), col("v"), "cum")
      .coalesce(1).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    var acc = 0L
    val want = rows.map { case (i, v) => acc += v; i -> acc }.toMap
    assert(got == want)
  }

  test("running total treats null values as zero and keeps the row") {
    val in = df(Seq((1L, java.lang.Long.valueOf(5L)), (2L, null),
      (3L, java.lang.Long.valueOf(2L))), 3)
    val got = Sharding.withRunningTotal(in, Seq(col("id")), col("v"), "cum")
      .orderBy("id").collect().map(_.getLong(2)).toSeq
    assert(got == Seq(5L, 5L, 7L))
  }

  test("packByTokenBudget: shards fill to the watermark, crossing doc spills") {
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "a b c"),        // 3 tokens, before=0  -> shard 0
        Row(2L, "d e f g"),      // 4 tokens, before=3  -> shard 0 (crosses 5)
        Row(3L, "h"),            // before=7 -> shard 1
        Row(4L, "i j k l m n")), // 6 tokens, before=8 -> shard 1 (> budget alone)
        2),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val got = Sharding.packByTokenBudget(docs, "text", 5L, Seq(col("doc_id")))
      .select("doc_id", "n_tokens", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 3L, 0L), (2L, 4L, 0L), (3L, 1L, 1L), (4L, 6L, 1L)))
  }

  test("hashSplit is deterministic, total, and roughly 13/16 train") {
    val ids = spark.range(0, 2000).select(col("id"),
      Sharding.hashSplit(col("id")).as("split"))
    val counts = ids.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val"))
    assert(counts.values.sum == 2000L)
    val trainFrac = counts("train").toDouble / 2000
    assert(math.abs(trainFrac - 13.0 / 16) < 0.05, s"train fraction $trainFrac")
    // stable across evaluations
    assert(ids.collect().toSeq == ids.collect().toSeq)
  }

  test("hashSample keeps everything at fraction 1.0, nothing at 0.0") {
    // Regression: 1.0 used to format its threshold as the 5-char "10000",
    // which lexicographically drops ~94% of 4-char md5 prefixes.
    val ids = spark.range(0, 1000)
    assert(ids.filter(Sharding.hashSample(col("id"), 1.0)).count() == 1000L)
    assert(ids.filter(Sharding.hashSample(col("id"), 0.0)).count() == 0L)
    val mid = ids.filter(Sharding.hashSample(col("id"), 0.5)).count()
    assert(mid > 400 && mid < 600, s"0.5 kept $mid of 1000")
  }

  test("mixture schedule: exact permutation, rerun-stable, and equal " +
      "weights interleave head and tail groups 1:1 until the tail runs out") {
    import spark.implicits._
    val df = ((1 to 300).map(i => (i.toLong, "big")) ++
      (1 to 100).map(i => (i.toLong + 1000, "small"))).toDF("id", "g")
    // α=0 → uniform weights regardless of the 3:1 corpus skew
    val sched = Sharding.mixtureSchedule(df, "g", "id", alpha = 0.0)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(sched.map(_._3).sorted.toSeq == (0L until 400L))
    val rerun = Sharding.mixtureSchedule(df.repartition(7), "g", "id", alpha = 0.0)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rerun.sortBy(_._1).toSeq == sched.sortBy(_._1).toSeq)
    // WFQ guarantee: the first 200 positions hold the small group's entire
    // 100 docs (strict 1:1 interleave at equal weights)
    val first200 = sched.filter(_._3 < 200)
    assert(first200.count(_._2 == "small") == 100)
    // natural sampling (α=1) spreads the small group ~1 in 4
    val nat = Sharding.mixtureSchedule(df, "g", "id", alpha = 1.0)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    val smallIn100 = nat.count { case (g, p) => g == "small" && p < 100 }
    assert(smallIn100 >= 20 && smallIn100 <= 30, s"small in first 100: $smallIn100")
  }

  test("temperature weights: α=1 is natural sampling, α<1 boosts the tail, " +
      "weights always sum to 1") {
    import spark.implicits._
    val df = ((1 to 900).map(i => (i.toLong, "big")) ++
      (1 to 100).map(i => (i.toLong + 1000, "small"))).toDF("id", "g")
    def w(alpha: Double) = Sharding.temperatureWeights(df, "g", alpha)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3), r.getDouble(4))).toMap
    val nat = w(1.0)
    assert(math.abs(nat("big")._2 - 0.9) < 1e-6 && nat("big")._3 == 1.0)
    val t = w(0.5)
    assert(math.abs(t.values.map(_._2).sum - 1.0) < 1e-5)
    assert(t("small")._2 > 0.1 && t("small")._3 > 1.0,
      s"α=0.5 must upsample the tail: ${t("small")}")
    assert(t("big")._3 < 1.0, "α=0.5 must downsample the head")
  }

  test("weighted sample: deterministic, w-proportional across seeds, " +
      "non-positive weights excluded, plan is a take-ordered (no sort)") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    // 100 light (w=1) + 100 heavy (w=9) items; across 40 seeds the heavy
    // items must be drawn ~9x as often (binomial noise well inside 3x)
    val items: Seq[(Long, Long)] = ((0L until 100L).map(i => (i, 1L)) ++
      (100L until 200L).map(i => (i, 9L))).toList
    val df = items.toDF("id", "w")
    val sampled = (0 until 40).flatMap { s =>
      Sharding.weightedSample(df, "id", col("w"), k = 20, seed = s"s$s")
        .collect().map(_.getLong(0))
    }
    assert(sampled.size == 40 * 20)
    val heavyShare = sampled.count(_ >= 100).toDouble / sampled.size
    assert(heavyShare > 0.7 && heavyShare < 0.98, s"heavy share $heavyShare")
    // same seed -> identical sample; different seed -> different sample
    def draw(seed: String) = Sharding.weightedSample(df, "id", col("w"),
      k = 20, seed = seed).collect().map(_.getLong(0)).toSeq
    assert(draw("fixed") == draw("fixed"))
    assert(draw("a") != draw("b"))
    // zero/negative weights can never be drawn
    val withBad = df.withColumn("w2",
      org.apache.spark.sql.functions.when(col("id") < 150, lit(-1L) * col("w"))
        .otherwise(col("w")))
    val got = Sharding.weightedSample(withBad, "id", col("w2"), k = 60,
      seed = "x").collect().map(_.getLong(0))
    assert(got.length == 50 && got.forall(_ >= 150))
    // scale shape: TakeOrderedAndProject, not a global Sort + Limit
    val plan = Sharding.weightedSample(df, "id", col("w"), k = 20, seed = "p")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
