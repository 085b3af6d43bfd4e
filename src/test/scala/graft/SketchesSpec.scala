package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Sketches}

/** Semantics pins for the deterministic sketches (the sk1/sk2/bf1/d10
  * oracle rows check them against DuckDB end-to-end; these pin the
  * probabilistic GUARANTEES — bounds and mergeability — on controlled
  * inputs where the guarantee is checkable exactly). */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("HLL: estimate tracks exact distinct within the m=256 error bound") {
    // 1000 distinct keys, each duplicated a varying number of times —
    // duplicates must not move the estimate (max is idempotent).
    val keys = (1 to 1000).flatMap(i => Seq.fill(1 + i % 3)(s"key-$i"))
    val df = keys.toDF("k")
    val row = Sketches.hllDistinct(df, col("k")).collect().head
    val est = row.getAs[Double]("estimate")
    val exact = row.getAs[Long]("exact_distinct")
    assert(exact == 1000)
    // standard error for m=256 is 1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert(math.abs(est - exact) / exact < 0.20, s"estimate $est vs $exact")
  }

  test("HLL: registers merge by per-bucket max (sketch union = corpus union)") {
    val a = (1 to 400).map(i => s"k$i").toDF("k")
    val b = (200 to 600).map(i => s"k$i").toDF("k")
    val all = (1 to 600).map(i => s"k$i").toDF("k")
    val merged = Sketches.hllRegisters(a, col("k"))
      .union(Sketches.hllRegisters(b, col("k")))
      .groupBy("bucket").agg(max("max_rho").as("max_rho"))
    val direct = Sketches.hllRegisters(all, col("k"))
    assert(merged.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      direct.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("CMS: estimates never undercount, and are exact without collisions") {
    // Skewed frequencies over few keys: with w=32 cells and only 4 keys,
    // collisions are unlikely per row but the bound must hold regardless.
    val rows = (1 to 4).flatMap(i => Seq.fill(i * 10)(s"user-$i"))
    val df = rows.toDF("k")
    val cells = Sketches.cmsCells(df, col("k"))
    val probe = df.distinct()
    val est = Sketches.cmsEstimate(cells, probe, col("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS undercounted $k: ${est(k)} < $n")
    }
    // 4 keys into 4x32 cells: expect at least one hash row collision-free
    // for each key, making min exact.
    exact.foreach { case (k, n) => assert(est(k) == n) }
    // NEVER-inserted probe keys: each must appear in the output with the
    // true CMS answer (0 unless every one of its d cells collides) — an
    // inner join against the sparse non-zero cells would overshoot or
    // drop them entirely
    val ghosts = (1 to 20).map(i => s"ghost-$i").toDF("k")
    val gEst = Sketches.cmsEstimate(cells, ghosts, col("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gEst.size == 20, s"probe keys vanished: ${gEst.keys.toSeq.sorted}")
    // with 4 rows x 32 cells holding only 4 keys, a ghost with ALL 4 cells
    // colliding is (4/32)^4 ≈ 2e-5 — these 20 fixed ghosts all read 0
    assert(gEst.values.forall(_ == 0L), s"ghost estimates: $gEst")
  }

  test("Bloom: zero false negatives; probe agrees with direct recompute") {
    val members = (1 to 300).map(i => s"text-$i").toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
    val probeRows = (1 to 600).map(i => (i.toLong, s"text-$i"))
    val probe = probeRows.toDF("doc_id", "text")
    val filter = Sketches.bloomBuild(members, col("text"), numBits = 1024)
    val res = Sketches.bloomProbe(filter, probe, "doc_id", col("text"),
        numBits = 1024)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // no false negatives: every true member must report maybe
    (1 to 300).foreach(i => assert(res(i.toLong), s"false negative on $i"))
    // a deliberately small filter (1024 bits, 300*4 insertions) must show
    // SOME selectivity on the non-member half — all-true means the probe
    // is broken, not that the filter saturated
    val nonMemberHits = (301 to 600).count(i => res(i.toLong))
    assert(nonMemberHits < 300, "filter rejected nothing")
  }

  test("CMS: sketches merge by cell sum (union of corpora)") {
    import org.apache.spark.sql.functions.{sum => fsum}
    val a = (1 to 50).map(i => s"k${i % 7}").toDF("k")
    val b = (1 to 30).map(i => s"k${i % 5}").toDF("k")
    val merged = Sketches.cmsCells(a, col("k"))
      .union(Sketches.cmsCells(b, col("k")))
      .groupBy("row_id", "pos").agg(fsum("cnt").as("cnt"))
    val direct = Sketches.cmsCells(a.union(b), col("k"))
    assert(merged.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      direct.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("Bloom: filters merge by word OR (union of member sets)") {
    val a = (1 to 100).map(i => s"m$i").toDF("text")
    val b = (80 to 150).map(i => s"m$i").toDF("text")
    val merged = Sketches.bloomBuild(a, col("text"))
      .union(Sketches.bloomBuild(b, col("text")))
      .groupBy("word_idx").agg(bit_or(col("word")).as("word"))
    val direct = Sketches.bloomBuild(a.union(b), col("text"))
    assert(merged.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      direct.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("native SimhashSig equals the substr/IN SQL parity replay") {
    // The oracle-portable formula, composed from Spark built-ins exactly
    // as the DuckDB oracles spell it — the native expression must agree
    // bit for bit on every doc, including repeated tokens (instance
    // votes) and empty-token edge shapes.
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha alpha alpha beta"), // duplicate tokens weight votes
      (3L, "x"), (4L, ""), (5L, "a  b")) // empty + double-space tokens
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("sh_docs")
    val sqlForm = spark.sql("""
      WITH tok AS (SELECT doc_id, md5(t) AS h0, md5(concat('1', t)) AS h1
        FROM (SELECT doc_id, explode(split(text, ' ')) AS t FROM sh_docs)),
      votes AS (SELECT doc_id, b,
          sum(CASE WHEN substr(CASE WHEN b < 32 THEN h0 ELSE h1 END,
                               CAST(b % 32 AS INT) + 1, 1)
                   IN ('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END) AS v,
          count(*) AS n
        FROM tok LATERAL VIEW explode(sequence(0, 63)) AS b
        GROUP BY doc_id, b),
      sig AS (SELECT doc_id,
          sum(CASE WHEN v <= 0 THEN 0L
                   WHEN b = 63 THEN -9223372036854775808L
                   ELSE shiftleft(1L, CAST(b AS INT)) END) AS sh
        FROM votes GROUP BY doc_id)
      SELECT doc_id, CAST(sh AS BIGINT) AS sh FROM sig""")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = Dedup.simhash64(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == sqlForm)
    // 16-bit width = the low-lane formula on the single hash
    val n16 = Dedup.simhash16(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    n16.foreach { case (id, s) => assert((s & ~0xffffL) == 0L, s"$id: $s") }
  }

  test("PQ: identical vectors share codes; reconstruction recovers a " +
      "codebook-sized corpus exactly") {
    import graft.pipeline.Similarity
    // 4 distinct 16-dim vectors, each repeated: with codes >= distinct
    // subvectors per subspace, k-means centroids land ON the points and
    // the reconstruction is exact (up to float rounding of the centroid)
    val base = (0 until 4).map(g =>
      Array.tabulate(16)(i => (g * 16 + i).toFloat / 8f))
    val rows = (0 until 12).map(i => (i.toLong, base(i % 4)))
    val df = rows.toDF("vec_id", "embedding")
    val (encoded, books) = Similarity.pqIndex(df, "vec_id", "embedding",
      numSub = 2, subDim = 8, codes = 4)
    assert(books.length == 2 && books.forall(_.length == 4))
    val codes = encoded.collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getInt(3))).toMap
    // same vector -> same code pair; different vectors -> different codes
    (0 until 12).foreach(i => assert(codes(i.toLong) == codes((i % 4).toLong)))
    assert(codes.values.toSet.size == 4)
    // ADC top-k finds the exact duplicates first (pq_cos = 1.0)
    val top = Similarity.pqTopK(encoded, df.filter(col("vec_id") < 4),
        books, "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(top.nonEmpty)
    top.foreach { case (q, n, c) =>
      assert(n % 4 == q % 4, s"query $q top hit $n is not its duplicate")
      assert(c == 1.0, s"duplicate pq_cos $c != 1.0")
    }
  }

  test("grouped HLL: per-group estimates track each group's exact distinct " +
      "and the register state stays groups x 256 bounded") {
    val rows = (1 to 500).map(i => ("a", i.toLong)) ++
      (1 to 5000).map(i => ("a", (i % 500).toLong)) ++ // dups don't inflate
      (1 to 50).map(i => ("b", i.toLong))
    val df = rows.toDF("g", "k")
    val regs = Sketches.hllRegistersBy(df, col("g"), col("k"))
    assert(regs.count() <= 2 * 256)
    val est = Sketches.hllEstimateBy(regs)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(math.abs(est("a") - 500) / 500.0 < 0.2, s"a: ${est("a")}")
    assert(math.abs(est("b") - 50) / 50.0 < 0.2, s"b: ${est("b")}")
  }

  test("log-histogram quantiles: within the 2^-b relative error bound of " +
      "the exact quantile, and state stays registers-sized") {
    val xs = (1 to 5000).map(i => (i.toLong, i * 0.037 % 480 + 0.01))
    val df = xs.toDF("id", "v")
    val b = 6
    val hist = Sketches.logHistogram(df, col("v"), unit = 100, b = b)
    assert(hist.count() < 700, "state must be O(b·log(max/min)) buckets")
    val qs = Seq(0.5, 0.9, 0.99)
    val est = Sketches.histQuantiles(hist, qs, unit = 100)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sortedVs = xs.map(_._2).sorted
    qs.foreach { q =>
      val exact = sortedVs((q * sortedVs.size).ceil.toInt - 1)
      val rel = math.abs(est(q) - exact) / exact
      assert(rel <= math.pow(2, -b) + 0.01 / exact, // +1 grid cell for the
        s"q=$q est=${est(q)} exact=$exact rel=$rel")  // unit quantization
    }
  }

  test("log-histogram quantiles hold the error bound across distributions " +
      "(uniform, power-law, micro-valued) and random seeds") {
    val b = 6
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val dists: Seq[(String, () => Double)] = Seq(
        ("uniform", () => rnd.nextDouble() * 400 + 0.01),
        ("powerlaw", () => math.pow(rnd.nextDouble() + 1e-3, -1.5) / 100),
        ("micro", () => rnd.nextDouble() * 0.5 + 0.01))
      for ((name, gen) <- dists) {
        val xs = Seq.fill(2000)(gen())
        val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("id", "v")
        val est = Sketches.histQuantiles(
            Sketches.logHistogram(df, col("v"), unit = 100, b = b),
            Seq(0.5, 0.99), unit = 100)
          .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
        // compare against the exact quantile of the same unit-grid values
        val grid = xs.map(x => math.round(x * 100)).filter(_ > 0).sorted
        for (q <- Seq(0.5, 0.99)) {
          val exact = grid((q * grid.size).ceil.toInt - 1) / 100.0
          val rel = math.abs(est(q) - exact) / exact
          assert(rel <= math.pow(2, -b) + 1e-9,
            s"$name seed=$seed q=$q est=${est(q)} exact=$exact rel=$rel")
        }
      }
    }
  }

  test("log-histogram merges by per-bucket count sum (sketch union)") {
    import org.apache.spark.sql.functions.{sum => fsum}
    val a = (1 to 400).map(i => (i.toLong, i * 1.7 + 0.5)).toDF("id", "v")
    val c = (1 to 300).map(i => (i.toLong, i * 3.1 + 9.0)).toDF("id", "v")
    val merged = Sketches.logHistogram(a, col("v"))
      .unionAll(Sketches.logHistogram(c, col("v")))
      .groupBy("bucket_lo").agg(fsum("cnt").as("cnt"))
    val direct = Sketches.logHistogram(a.unionAll(c), col("v"))
    assert(merged.except(direct).isEmpty && direct.except(merged).isEmpty)
  }

  test("containment: short-in-long embedding scores 1.0 where jaccard dilutes") {
    val short = "abcdefghij"
    val long = short + "0123456789012345678901234567890123456789"
    val docs = Seq((1L, short), (2L, long)).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r = Dedup.ngramContainment(docs, pairs, "doc_id", "text", n = 3)
      .collect().head
    assert(r.getAs[Double]("contain_a") == 1.0) // every short gram in long
    assert(r.getAs[Double]("contain_b") < 0.5)
    assert(r.getAs[Double]("jaccard") < 0.5)
    // integer consistency: jaccard from the exact counts equals the
    // NgramJaccard expression on the same pair
    val j = docs.as("a").filter(col("doc_id") === 1)
      .crossJoin(docs.as("b").filter(col("doc_id") === 2))
      .select(graft.functions.DedupFunctions.ngramJaccard(
        col("a.text"), col("b.text"), 3).as("j"))
      .collect().head.getDouble(0)
    assert(math.abs(r.getAs[Double]("jaccard") - j) < 1e-4)
  }

  test("KMV: exact below capacity; estimate tracks distinct at capacity; " +
      "pair union/intersection estimates track exact set algebra") {
    // below capacity: the sketch IS the distinct set
    val small = (1 to 40).flatMap(i => Seq.fill(3)(s"u$i"))
      .map(k => ("g", k)).toDF("g", "k")
    val smallEst = Sketches.kmvEstimate(
      Sketches.kmvSketch(small, col("g"), col("k"))).collect().head
    assert(smallEst.getAs[Long]("n_hashes") == 40)
    assert(smallEst.getAs[Double]("est_distinct") == 40.0)
    // at capacity: (k-1)/u_k within the ~1/sqrt(k) relative error band
    val big = (1 to 2000).map(i => ("g", s"user-$i")).toDF("g", "k")
    val bigEst = Sketches.kmvEstimate(
      Sketches.kmvSketch(big, col("g"), col("k"))).collect().head
    val est = bigEst.getAs[Double]("est_distinct")
    assert(math.abs(est - 2000) / 2000 < 0.40, s"est $est vs 2000")
    // pairs: A = 1..1200, B = 601..1800 → |A∪B| = 1800, |A∩B| = 600
    val ab = ((1 to 1200).map(i => ("a", s"user-$i")) ++
      (601 to 1800).map(i => ("b", s"user-$i"))).toDF("g", "k")
    val pair = Sketches.kmvPairEstimates(
      Sketches.kmvSketch(ab, col("g"), col("k"))).collect().head
    val eu = pair.getAs[Double]("est_union")
    val ei = pair.getAs[Double]("est_intersect")
    assert(math.abs(eu - 1800) / 1800 < 0.40, s"union $eu vs 1800")
    assert(math.abs(ei - 600) / 600 < 0.60, s"intersect $ei vs 600")
    // disjoint sets: intersection estimate must be exactly zero (no shared
    // hashes can enter the union sketch)
    val disj = ((1 to 500).map(i => ("a", s"x$i")) ++
      (1 to 500).map(i => ("b", s"y$i"))).toDF("g", "k")
    val d = Sketches.kmvPairEstimates(
      Sketches.kmvSketch(disj, col("g"), col("k"))).collect().head
    assert(d.getAs[Double]("est_intersect") == 0.0)
  }

  test("KMV bottom-k partial aggregate: equals the distinct-then-rank " +
      "reference on skewed multi-group data; partial state bounded at k; " +
      "plan is one ObjectHashAggregate pair, no row_number exchange") {
    import org.apache.spark.sql.expressions.Window
    // skewed duplicates across groups and partitions (repartition(7) mixes
    // hash order so map-side partials see interleaved groups)
    val rnd = new scala.util.Random(42)
    val rows = (1 to 5000).map { _ =>
      (s"g${rnd.nextInt(5)}", s"key-${rnd.nextInt(300)}") }
    val df = rows.toDF("g", "k").repartition(7)
    val got = Sketches.kmvSketch(df, col("g"), col("k"), k = 64)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // reference build: global distinct then per-group rank (the r8 shape)
    val h = conv(substring(md5(col("k").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val ref = df.select(col("g").as("group"), h.as("h")).distinct()
      .withColumn("__rn__",
        row_number().over(Window.partitionBy(col("group")).orderBy(col("h"))))
      .filter(col("__rn__") <= 64)
      .groupBy("group").agg(sort_array(collect_list(col("h"))).as("hs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got == ref, s"bottom-k sets diverge: ${got.keySet} vs ${ref.keySet}")
    // aggregator semantics directly: reduce/merge keep ≤k distinct sorted
    val agg = new Sketches.KmvAggregator(8)
    val full = (1 to 100).foldLeft(agg.zero)((b, i) =>
      agg.reduce(agg.reduce(b, i * 37L % 61), i * 37L % 61)) // duplicates
    assert(full.hs.length == 8 && full.hs.sameElements(full.hs.sorted) &&
      full.hs.distinct.length == 8)
    assert(full.hs.toSeq == (1 to 100).map(i => i * 37L % 61)
      .distinct.sorted.take(8))
    // merge in either order agrees (commutativity the partial plan needs)
    val left = (1 to 50).foldLeft(agg.zero)((b, i) => agg.reduce(b, i * 97L % 89))
    val right = (1 to 50).foldLeft(agg.zero)((b, i) => agg.reduce(b, i * 13L % 71))
    assert(agg.merge(left, right).hs.sameElements(agg.merge(right, left).hs))
    assert(agg.merge(left, agg.zero).hs.sameElements(left.hs))
    // the plan aggregates with bounded partials: an ObjectHashAggregate
    // pair (partial + final) and NO window/row_number over the distinct set
    val plan = Sketches.kmvSketch(df, col("g"), col("k"), k = 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(600))
    assert(!plan.contains("Window"), plan.take(600))
  }
}
