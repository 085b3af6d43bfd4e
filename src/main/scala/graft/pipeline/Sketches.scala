package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic sketches for corpus-scale statistics, built DETERMINISTIC
  * and engine-portable: every hash is md5 hex (bit-identical in any engine),
  * every register update is an exact-integer or exact-power-of-two
  * operation, so a DuckDB oracle can replay the whole sketch and the final
  * estimates hash-match. (Spark's own `approx_count_distinct` / stat
  * `bloomFilter` use engine-private hashing and random seeds — fine in
  * production, unverifiable cross-engine; these are drop-in equivalents
  * with the same scale shape.)
  *
  * Scale shape, common to all three: the sketch state is O(registers) —
  * hundreds of rows — built by ONE map-side-combinable aggregation over the
  * corpus (partial max/count/bit_or collapses per-partition before the
  * shuffle; the exchange carries at most `numPartitions × registers` rows
  * regardless of input size), and probes join against a broadcast-sized
  * state. This is exactly how a 100 TB distinct-count or membership pass
  * should look: no corpus-sized state, no second scan.
  */
object Sketches {

  // ------------------------------------------------------------ HyperLogLog

  /** HyperLogLog registers over `key`: bucket = first byte of md5 (m=256
    * registers, b=8), rho = 1 + number of leading zero bits in the next 52
    * bits (13 hex chars — leading-zero count done in hex-char space so both
    * engines compute it with string ops, never float log2). Returns
    * (bucket, max_rho) for OCCUPIED buckets only — the merge-able sketch
    * state (union of corpora = max per bucket). */
  def hllRegisters(df: DataFrame, key: Column): DataFrame =
    // null keys have no hash: md5(null) is null, and a null (bucket, rho)
    // row would count as an occupied register in hllEstimate while its
    // null rho drops out of the power sum — estimate biased high
    df.filter(key.isNotNull)
      .select(hllBucket(key).as("bucket"), hllRho(key).as("rho"))
      .groupBy("bucket").agg(max("rho").as("max_rho"))

  /** Grouped HLL registers: an independent register set per value of
    * `group` — the "distinct users per dimension" pass. Still ONE
    * map-side-combinable aggregation; state is `groups × 256` rows, so a
    * 100 TB corpus with a bounded dimension keys a registers-sized shuffle,
    * never a distinct-sized one. */
  def hllRegistersBy(df: DataFrame, group: Column, key: Column): DataFrame =
    df.filter(key.isNotNull) // see hllRegisters
      .select(group.as("group"), hllBucket(key).as("bucket"),
        hllRho(key).as("rho"))
      .groupBy("group", "bucket").agg(max("rho").as("max_rho"))

  private def hllBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 2), 16, 10).cast("long")

  private def hllRho(key: Column): Column = {
    val sub = substring(md5(key.cast("string")), 3, 13) // 52 bits after bucket
    val lz = length(regexp_extract(sub, "^0*", 0))
    val firstNz = substr(sub, (lz + 1).cast("int"), lit(1))
    // leading-zero BITS inside the first non-zero hex digit
    val nzBits = when(firstNz === "1", 3)
      .when(firstNz.isin("2", "3"), 2)
      .when(firstNz.isin("4", "5", "6", "7"), 1)
      .otherwise(0)
    when(lz === 13, lit(53)).otherwise(lz * 4 + nzBits + 1).cast("long")
  }

  /** The standard HLL estimate (Flajolet et al. 2007) from a register
    * frame: raw = α·m² / Σ 2^-M_j (absent buckets contribute 2⁰ = 1),
    * with the small-range linear-counting correction when raw ≤ 2.5m and
    * empty buckets exist. One row: (n_buckets_used, n_empty, estimate).
    * All terms are exact powers of two (order-independent float sum) and
    * the only libm call is one `ln` — cross-engine-stable under round(3). */
  def hllEstimate(registers: DataFrame, m: Int = 256): DataFrame = {
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    registers.agg(
        count(lit(1)).as("n_used"),
        sum(pow(lit(2.0), -col("max_rho"))).as("__s__"))
      .select(col("n_used"),
        (lit(m.toLong) - col("n_used")).as("n_empty"),
        (col("__s__") + (lit(m) - col("n_used"))).as("__sum__"))
      .select(col("n_used"), col("n_empty"),
        (lit(alpha * m.toDouble * m) / col("__sum__")).as("__raw__"))
      .select(col("n_used"), col("n_empty"),
        // an EMPTY registers frame makes sum() null, which would ripple a
        // null estimate out of both when-branches — the correct answer is
        // the linear-counting value m·ln(m/m) = 0
        round(coalesce(
          when(col("__raw__") <= 2.5 * m && col("n_empty") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("n_empty")))
            .otherwise(col("__raw__")),
          lit(0.0)), 3).as("estimate"))
  }

  /** Per-group HLL estimates from a [[hllRegistersBy]] frame — the same
    * Flajolet formula, one output row per group, all arithmetic on the
    * registers frame. */
  def hllEstimateBy(registers: DataFrame, m: Int = 256): DataFrame = {
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    registers.groupBy("group")
      .agg(count(lit(1)).as("n_used"),
        sum(pow(lit(2.0), -col("max_rho"))).as("__s__"))
      .select(col("group"), col("n_used"),
        (lit(m.toLong) - col("n_used")).as("n_empty"),
        (col("__s__") + (lit(m) - col("n_used"))).as("__sum__"))
      .select(col("group"), col("n_used"), col("n_empty"),
        (lit(alpha * m.toDouble * m) / col("__sum__")).as("__raw__"))
      .select(col("group"), col("n_used"), col("n_empty"),
        round(when(col("__raw__") <= 2.5 * m && col("n_empty") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("n_empty")))
          .otherwise(col("__raw__")), 3).as("estimate"))
  }

  /** Distinct-count estimate of `key` in one query: the HLL estimate row
    * joined (scalar cross of two 1-row frames) with the exact count for
    * accuracy inspection. */
  def hllDistinct(df: DataFrame, key: Column, m: Int = 256): DataFrame = {
    val est = hllEstimate(hllRegisters(df, key), m)
    val exact = df.agg(count_distinct(key).as("exact_distinct"))
    est.crossJoin(exact)
  }

  // ------------------------------------------------------- Count-min sketch

  /** Count-min sketch cells over `key` (one increment per input ROW):
    * depth rows of width cells; row i hashes the key to
    * `md5(i || '|' || key)` and increments cell (i, first-byte % width).
    * Returns (row_id, pos, cnt) — the sketch, d×w counters total, built by
    * one map-side-combinable aggregation. */
  /** The ONE cell-position hash build and probe must share (an edit to a
    * drifted copy would silently break every estimate): row i of the
    * sketch addresses cell `md5(i || '|' || key)[0] % width`. */
  private def cmsPositions(key: Column, depth: Int, width: Int): Column =
    array((0 until depth).map { i =>
      struct(lit(i).cast("long").as("row_id"),
        (conv(substring(md5(concat_ws("|", lit(i), key.cast("string"))),
          1, 2), 16, 10).cast("long") % width).as("pos"))
    }: _*)

  def cmsCells(df: DataFrame, key: Column, depth: Int = 4,
      width: Int = 32): DataFrame = {
    require(width <= 256, "width > 256 needs more than one hash byte")
    require(256 % width == 0,
      s"width must divide 256 (got $width): the cell index is a uniform " +
        "byte % width, and a non-divisor biases low cells (3/256 vs " +
        "2/256 per cell at width 100), inflating estimates past the CMS bound")
    df.select(explode(cmsPositions(key, depth, width)).as("c"))
      .select(col("c.row_id"), col("c.pos"))
      .groupBy("row_id", "pos").agg(count(lit(1)).as("cnt"))
  }

  /** Point-query every distinct key of `probe` against a count-min sketch:
    * estimate = min over rows of the key's cell — never under the true
    * count, over only on collision. Output (key, cms_est) exact integers.
    * The cells frame is d×w rows, broadcast into the probe join — a LEFT
    * join: cells at zero are simply absent from the sparse frame, and an
    * empty cell means the CMS answer for that row is 0 (an inner join
    * would skip zero cells, overshooting never-inserted probe keys or
    * dropping them entirely — the exact mistake [[bloomProbe]]'s
    * coalesce-to-0 already avoids). */
  def cmsEstimate(cells: DataFrame, probe: DataFrame, key: Column,
      depth: Int = 4, width: Int = 32): DataFrame =
    probe.select(key.cast("string").as("probe_key"),
        explode(cmsPositions(key, depth, width)).as("c"))
      .select(col("probe_key"), col("c.row_id"), col("c.pos"))
      .join(broadcast(cells), Seq("row_id", "pos"), "left")
      .groupBy("probe_key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))

  // ----------------------------------------------------------- Bloom filter

  /** Bloom filter over the `key` values of `members`, packed into
    * `numBits/32` BIGINT words of 32 used bits each (32, not 64: a shift
    * into bit 63 overflows signed-BIGINT `<<` in some engines — 31 is the
    * highest shift every engine computes identically): k hash functions,
    * hash i = 16 bits of `md5(i || '|' || key)` mod numBits. Returns
    * (word_idx, word) for NON-ZERO words — built by one bit_or
    * aggregation, broadcastable state (numBits/32 rows ≪ member count). */
  def bloomBuild(members: DataFrame, key: Column, numBits: Int = 8192,
      k: Int = 4): DataFrame = {
    require(numBits % 32 == 0 && numBits <= 65536, s"bad numBits $numBits")
    require(65536 % numBits == 0,
      s"numBits must divide 65536 (got $numBits): positions come from a " +
        "uniform 16-bit hash % numBits, and a non-divisor biases low bits, " +
        "raising the false-positive rate past the documented bound")
    members.select(explode(bloomPositions(key, numBits, k)).as("pos"))
      .select((col("pos") / 32).cast("long").as("word_idx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").as("bit"))
      .groupBy("word_idx").agg(bit_or(col("bit")).as("word"))
  }

  /** Probe every row of `probe` against a built filter: `maybe_member` is
    * true iff ALL k bits are set — no false negatives, false positives at
    * the classic (1-e^(-kn/m))^k rate. The filter joins broadcast; the
    * probe side streams. */
  def bloomProbe(filter: DataFrame, probe: DataFrame, idCol: String,
      key: Column, numBits: Int = 8192, k: Int = 4): DataFrame =
    probe.select(col(idCol), explode(bloomPositions(key, numBits, k)).as("pos"))
      .select(col(idCol), (col("pos") / 32).cast("long").as("word_idx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").as("bit"))
      .join(broadcast(filter), Seq("word_idx"), "left")
      .select(col(idCol),
        (coalesce(col("word"), lit(0L)).bitwiseAND(col("bit")) =!= 0L)
          .as("bit_set"))
      .groupBy(col(idCol)).agg(bool_and(col("bit_set")).as("maybe_member"))

  private def bloomPositions(key: Column, numBits: Int, k: Int): Column =
    array((0 until k).map { i =>
      conv(substring(md5(concat_ws("|", lit(i), key.cast("string"))),
        1, 4), 16, 10).cast("long") % numBits
    }: _*)

  // ----------------------------------------- Log-bucket quantile histogram

  /** DDSketch/HDR-histogram-style quantile sketch (Masson et al. 2019;
    * reference analog: the per-chunk value summaries its compaction keeps —
    * this is the mergeable corpus-wide generalization): positive values are
    * quantized to an integer grid (`round(x·unit)`), then bucketed by
    * zeroing all but the top `b+1` significant bits — an EXACT integer
    * transform (`bin`/shift, no libm), so buckets are bit-identical in any
    * engine, unlike a float `ln(x)/ln(γ)` bucketer whose ceil can disagree
    * at boundaries. Bucket width ≤ 2^-b of its lower bound, so any quantile
    * read from the histogram has relative error ≤ 2^-b (b=6 → <1.6%).
    *
    * Returns (bucket_lo, cnt): the sketch state, one row per OCCUPIED
    * bucket — O(b·log(max/min)) rows regardless of input size, built by one
    * map-side-combinable count. Sketches merge by summing cnt per bucket_lo
    * (union of corpora = one more groupBy), which is how a 100 TB
    * percentile pass stays one scan + a registers-sized shuffle. */
  def logHistogram(df: DataFrame, value: Column, unit: Int = 100,
      b: Int = 6): DataFrame = {
    val v = round(value * unit, 0).cast("long")
    df.filter(v > 0)
      .select(v.as("__v__"),
        greatest(length(bin(v)) - 1 - b, lit(0)).cast("int").as("__s__"))
      // functions.shiftright only accepts a literal shift — the SQL form
      // takes a column.
      .selectExpr("shiftleft(shiftright(__v__, __s__), __s__) AS bucket_lo")
      .groupBy("bucket_lo").agg(count(lit(1)).as("cnt"))
  }

  /** Grouped [[logHistogram]]: an independent histogram per `group` value —
    * state `groups × buckets`, still one map-side-combinable count. */
  def logHistogramBy(df: DataFrame, group: Column, value: Column,
      unit: Int = 100, b: Int = 6): DataFrame = {
    val v = round(value * unit, 0).cast("long")
    df.filter(v > 0)
      .select(group.as("group"), v.as("__v__"),
        greatest(length(bin(v)) - 1 - b, lit(0)).cast("int").as("__s__"))
      .selectExpr("group",
        "shiftleft(shiftright(__v__, __s__), __s__) AS bucket_lo")
      .groupBy("group", "bucket_lo").agg(count(lit(1)).as("cnt"))
  }

  /** Per-group quantile read-out from a [[logHistogramBy]] state: the
    * [[histQuantiles]] logic with every window partitioned by the group —
    * still registers-sized work. Output (group, q, est, n). */
  def histQuantilesBy(hist: DataFrame, qs: Seq[Double], unit: Int = 100)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byGroup = Window.partitionBy("group")
    val cum = hist.select(col("group"), col("bucket_lo"), col("cnt"),
      sum("cnt").over(byGroup.orderBy("bucket_lo")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cum"),
      sum("cnt").over(byGroup).as("n"))
    cum.select(col("group"), col("bucket_lo"), col("cum"), col("n"),
        explode(array(qs.map(lit(_)): _*)).as("q"))
      .filter(col("cum") >= ceil(col("q") * col("n")))
      .groupBy("group", "q")
      .agg(min("bucket_lo").as("__lo__"), max("n").as("n"))
      .select(col("group"), col("q"),
        round(col("__lo__") / lit(unit.toDouble), 4).as("est"), col("n"))
  }

  /** Quantile read-out from a [[logHistogram]] state: for each q, the lower
    * bound of the first bucket whose cumulative count reaches ceil(q·n),
    * mapped back to value scale. Runs entirely on the registers frame
    * (hundreds of rows); the qs list is a literal cross join. Output
    * (q, est, n) — est within 2^-b relative error of the true quantile of
    * the unit-grid values, exact integers until the final division. */
  def histQuantiles(hist: DataFrame, qs: Seq[Double], unit: Int = 100)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Both windows are single-partition by design: they run over the
    // REGISTERS frame (hundreds of rows), never the corpus. One explode
    // attaches every q to every bucket row, so all quantiles read out of
    // one histogram pass — the corpus is scanned exactly once.
    val cum = hist.select(col("bucket_lo"), col("cnt"),
      sum("cnt").over(Window.orderBy("bucket_lo")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cum"),
      sum("cnt").over(Window.orderBy(lit(1))
        .rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)).as("n"))
    cum.select(col("bucket_lo"), col("cum"), col("n"),
        explode(array(qs.map(lit(_)): _*)).as("q"))
      .filter(col("cum") >= ceil(col("q") * col("n")))
      .groupBy("q").agg(min("bucket_lo").as("__lo__"), max("n").as("n"))
      .select(col("q"), round(col("__lo__") / lit(unit.toDouble), 4).as("est"),
        col("n"))
  }

  // ------------------------------------------- KMV (bottom-k) distinct sketch

  /** The hash space of [[kmvSketch]]: 15 md5 hex chars = 60 bits, exactly
    * representable and bit-identical in any engine. */
  private val Kmv2Pow60: Double = 1152921504606846976.0 // 2^60

  /** K-minimum-values (bottom-k / KMV) sketch per group: the `k` smallest
    * DISTINCT md5-derived 60-bit element hashes, ascending (Beyer et al.
    * 2007, "On synopses for distinct-value estimation under multiset
    * operations"). Distinct estimate: `(k-1) / (u_k / 2^60)` where `u_k`
    * is the largest kept hash; a group with fewer than `k` distinct hashes
    * keeps them ALL and its count is exact. Unlike HLL registers, KMV
    * sketches SET-COMBINE: the bottom-k of two merged sketches is the
    * union's sketch, and the fraction of it present in both inputs
    * estimates Jaccard — yielding intersection estimates HLL fundamentally
    * cannot provide ([[kmvPairEstimates]]).
    *
    * Scale shape: state is groups × k longs (broadcast-sized), and the
    * build is ONE aggregation whose PARTIAL state is already bounded at k:
    * [[KmvAggregator]] (a typed `Aggregator` → `ScalaAggregator`, a
    * TypedImperativeAggregate under ObjectHashAggregate) keeps a sorted
    * distinct bottom-k array per (group, partition) map-side, so the
    * exchange carries at most `partitions × groups × k` longs regardless
    * of input size — the same map-side-combinable shape as the HLL/CMS
    * registers, holding past 10⁸ distinct keys per group where the
    * previous distinct-then-rank build's exchange grew with the distinct
    * cardinality. */
  def kmvSketch(df: DataFrame, group: Column, key: Column,
      k: Int = 64): DataFrame = {
    val h = conv(substring(md5(key.cast("string")), 1, 15), 16, 10)
      .cast("long")
    val bottomK = udaf(new KmvAggregator(k),
      org.apache.spark.sql.Encoders.scalaLong)
    // null keys hash to null, which the primitive-Long aggregator input
    // would decode as 0 — the smallest possible hash, a phantom minimum
    // that permanently occupies the bottom-k and skews every estimate
    df.filter(key.isNotNull)
      .select(group.as("group"), h.as("h"))
      .groupBy("group").agg(bottomK(col("h")).as("hs"))
  }

  /** Bounded bottom-k buffer: `hs` is ascending, distinct, length ≤ k. */
  case class KmvBuf(hs: Array[Long])

  /** Bottom-k-distinct partial aggregate behind [[kmvSketch]]: reduce
    * inserts a hash only when it is new AND beats the current k-th
    * smallest (O(log k) probe, O(k) copy on accept — rare once the buffer
    * saturates); merge is a deduplicating two-pointer merge capped at k.
    * Commutative + associative with the identity `zero`, so partial
    * buffers combine in any order — the TypedImperativeAggregate contract
    * that makes the map-side combine sound. */
  final class KmvAggregator(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Long, KmvBuf, Array[Long]] {
    require(k > 0, s"k must be positive, got $k")
    def zero: KmvBuf = KmvBuf(Array.emptyLongArray)
    def reduce(b: KmvBuf, h: Long): KmvBuf = {
      val a = b.hs
      if (a.length == k && h >= a(k - 1)) b
      else {
        val i = java.util.Arrays.binarySearch(a, h)
        if (i >= 0) b // already present
        else {
          val ins = -i - 1
          val n = math.min(a.length + 1, k)
          val out = new Array[Long](n)
          System.arraycopy(a, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(a, ins, out, ins + 1, n - ins - 1)
          KmvBuf(out)
        }
      }
    }
    def merge(x: KmvBuf, y: KmvBuf): KmvBuf = {
      val a = x.hs; val b = y.hs
      if (a.isEmpty) y
      else if (b.isEmpty) x
      else {
        val out = new Array[Long](math.min(a.length + b.length, k))
        var i = 0; var j = 0; var n = 0
        while (n < out.length && (i < a.length || j < b.length)) {
          val v =
            if (j >= b.length || (i < a.length && a(i) <= b(j))) {
              val v = a(i); if (j < b.length && b(j) == v) j += 1
              i += 1; v
            } else { val v = b(j); j += 1; v }
          out(n) = v; n += 1
        }
        KmvBuf(if (n == out.length) out else java.util.Arrays.copyOf(out, n))
      }
    }
    def finish(b: KmvBuf): Array[Long] = b.hs
    def bufferEncoder: org.apache.spark.sql.Encoder[KmvBuf] =
      org.apache.spark.sql.Encoders.product[KmvBuf]
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Per-group distinct estimate from a [[kmvSketch]]: exact below `k`,
    * `(k-1)·2^60 / u_k` at capacity. */
  def kmvEstimate(sketch: DataFrame, k: Int = 64): DataFrame =
    sketch.select(col("group"),
      size(col("hs")).cast("long").as("n_hashes"),
      when(size(col("hs")) < k, size(col("hs")).cast("double"))
        .otherwise(lit((k - 1) * Kmv2Pow60) /
          element_at(col("hs"), k).cast("double")).as("est_distinct"))

  /** Pairwise union/intersection estimates across every group pair of a
    * [[kmvSketch]] frame: the union sketch is the bottom-k of the merged
    * hash lists, `est_union` applies the KMV estimator to it, and
    * `est_intersect = ρ·est_union` with ρ = the fraction of the union
    * sketch present in BOTH inputs (the Jaccard estimator). The pair join
    * is over the GROUPS frame (sketch rows, broadcast-sized) — all-pairs
    * on purpose and never on the corpus. */
  def kmvPairEstimates(sketch: DataFrame, k: Int = 64): DataFrame = {
    val a = sketch.select(col("group").as("group_a"), col("hs").as("ha"))
    val b = sketch.select(col("group").as("group_b"), col("hs").as("hb"))
    a.join(b, col("group_a") < col("group_b"))
      .withColumn("hu", slice(sort_array(array_union(col("ha"), col("hb"))),
        1, k))
      .withColumn("un", size(col("hu")))
      .withColumn("x", size(filter(col("hu"), e =>
        array_contains(col("ha"), e) && array_contains(col("hb"), e))))
      .select(col("group_a"), col("group_b"),
        when(col("un") < k, col("un").cast("double"))
          .otherwise(lit((k - 1) * Kmv2Pow60) /
            element_at(col("hu"), k).cast("double")).as("est_union"),
        (col("x").cast("double") / col("un").cast("double") *
          when(col("un") < k, col("un").cast("double"))
            .otherwise(lit((k - 1) * Kmv2Pow60) /
              element_at(col("hu"), k).cast("double"))).as("est_intersect"))
  }
}
