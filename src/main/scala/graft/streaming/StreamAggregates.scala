package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.metric.Sample

/** Streaming query surface over the ingest stream — the continuous-query
  * layer the reference lacks (SURVEY §2.9: its "streaming" is ingest only),
  * expressed with Structured Streaming's native tools:
  *
  *  - [[chunked30m]]: watermarked 30-min windowed chunk building (the RFC's
  *    chunk batching, done in-flight instead of at compaction);
  *  - [[promqlWindowed]]: watermarked per-(metric,window) sum/min/max/count —
  *    the PromQL pushdown aggregate set as a live query;
  *  - [[liveLastValue]]: per-series latest sample via mapGroupsWithState —
  *    custom keyed state for instant-vector serving.
  *
  * Late-data policy: watermark bounds state only for the STREAMING views;
  * the storage sink remains unwatermarked (late rows land as new SSTs and
  * merge-on-read repairs queries, matching the reference, SURVEY T4).
  */
object StreamAggregates {

  /** Sample stream keyed with event-time timestamp column `ts_ts` and the
    * canonical series key (name + sorted labels, same shape as
    * MetricEngine.seriesKeyCol — chunks are PER SERIES, not per metric:
    * grouping by name alone would interleave all series of a metric). */
  private def withEventTime(samples: Dataset[Sample]): DataFrame =
    samples.toDF()
      .withColumn("ts_ts", timestamp_millis(col("timestamp")))
      .withColumn("series_key",
        graft.metric.MetricEngine.seriesKeyColumn(col("name"), col("labels")))

  /** Watermarked 30-minute chunk builder (append mode): one row per
    * (series, window) holding the time-sorted chunk built so far. */
  def chunked30m(samples: Dataset[Sample], watermark: String = "10 minutes"): DataFrame =
    withEventTime(samples)
      .withWatermark("ts_ts", watermark)
      .groupBy(col("name"), col("series_key"), window(col("ts_ts"), "30 minutes"))
      .agg(
        sort_array(collect_list(struct(col("timestamp").as("ts"), col("value"))))
          .as("chunk"),
        count(lit(1)).as("n_samples"))
      .select(col("name"), col("series_key"),
        unix_millis(col("window.start")).as("chunk_start"),
        col("chunk"), col("n_samples"))

  /** Watermarked PromQL-style windowed aggregates per metric. */
  def promqlWindowed(samples: Dataset[Sample], windowLen: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    withEventTime(samples)
      .withWatermark("ts_ts", watermark)
      .groupBy(col("name"), window(col("ts_ts"), windowLen))
      .agg(sum("value").as("sum_v"), min("value").as("min_v"),
        max("value").as("max_v"), count(lit(1)).as("n"))
      .select(col("name"), unix_millis(col("window.start")).as("window_start"),
        col("sum_v"), col("min_v"), col("max_v"), col("n"))

  /** PromQL text as a continuous query: `agg by (labels) (metric{matchers})`
    * parsed with [[graft.promql.PromQLParser]] and planned as a watermarked
    * tumbling-window aggregation over the ingest stream — the same
    * epoch-aligned window semantics as the batch evaluator
    * (PromQLContext), so a streaming result and a later storage-side
    * replay of the same text agree on dense data.
    *
    * The step is PromQL-side (`stepMs`), the watermark bounds state. Label
    * matchers evaluate against the sample's label map (`element_at`), with
    * the same anchored-regex semantics as the batch path.
    *
    * Range functions (`rate`/...) are not evaluated through THIS text
    * surface: [[streamingRate]] serves them as the chained
    * transformWithState → windowed-sum pair; other non-decomposable
    * shapes replay against storage at read time (the reference's model —
    * its streaming layer is ingest-only, SURVEY §2.9). Fail loudly toward
    * those paths.
    */
  def promqlStream(samples: Dataset[Sample], promql: String, stepMs: Long,
      watermark: String = "10 minutes"): DataFrame = {
    import graft.metric.MetricAgg
    import graft.promql._
    PromQLParser.parse(promql) match {
      case Agg(_, _, Selector(_, _, off), _) if off != 0L =>
        throw new IllegalArgumentException(
          "streaming PromQL cannot evaluate 'offset' (no look-back over the " +
            "stream) - replay the query against storage instead")
      case Agg(_, _, _, true) =>
        throw new IllegalArgumentException(
          "streaming PromQL supports 'by' grouping only - 'without' needs " +
            "the full label-key universe, which an unbounded stream cannot know")
      // agg-over-*_over_time with step == window and a DECOMPOSABLE pair
      // (agg of the window aggregate == one flat aggregate over the window:
      // sum∘sum, min∘min, max∘max, sum∘count) collapses to a single
      // stateful aggregation — the only shape one watermarked operator can
      // express. Non-decomposable pairs (avg∘avg, last, rate) need chained
      // stateful operators; those replay against storage.
      case Agg(op, by, RangeFn(fn, Selector(metric, matchers, 0L), win), false)
          if win == stepMs &&
            ((op, fn) match {
              case (MetricAgg.Sum, RangeF.SumOverTime) => true
              case (MetricAgg.Min, RangeF.MinOverTime) => true
              case (MetricAgg.Max, RangeF.MaxOverTime) => true
              case (MetricAgg.Sum, RangeF.CountOverTime) => true
              case _ => false
            }) =>
        val flat = (op, fn) match {
          case (_, RangeF.CountOverTime) => count(lit(1)).cast("double")
          case (MetricAgg.Sum, _) => sum(col("value"))
          case (MetricAgg.Min, _) => min(col("value"))
          case (_, _) => max(col("value"))
        }
        aggStream(metric, matchers, by, flat, stepMs, watermark, samples)
      case Agg(op, by, Selector(metric, matchers, _), _) =>
        val agg = op match {
          case MetricAgg.Sum => sum(col("value"))
          case MetricAgg.Min => min(col("value"))
          case MetricAgg.Max => max(col("value"))
          case MetricAgg.Avg => avg(col("value"))
          case MetricAgg.Count => count(lit(1)).cast("double")
          case MetricAgg.Stddev => stddev_pop(col("value"))
          case MetricAgg.Stdvar => var_pop(col("value"))
          case MetricAgg.Group => max(lit(1.0))
        }
        aggStream(metric, matchers, by, agg, stepMs, watermark, samples)
      case other => throw new IllegalArgumentException(
        s"streaming PromQL supports agg-over-selector shapes (plus " +
          s"decomposable agg-over-*_over_time at step == window), got: $other " +
          "(rate/increase/delta are storage-read queries - see PromQLContext)")
    }
  }

  /** One watermarked tumbling aggregation: matcher-filtered samples grouped
    * by the coalesced by-labels and the step window. `metric == ""` (bare
    * `{...}` selector) spans every metric; `__name__` matchers and
    * groupings address the stream's name column, matching the batch tiers. */
  private def aggStream(metric: String, matchers: Seq[graft.promql.LabelMatcher],
      by: Seq[String], agg: org.apache.spark.sql.Column, stepMs: Long,
      watermark: String, samples: Dataset[Sample]): DataFrame = {
    import graft.promql.PromQLContext
    var rows = withEventTime(samples)
    if (metric.nonEmpty) rows = rows.filter(col("name") === metric)
    matchers.foreach { m =>
      val c = if (m.label == "__name__") col("name")
        else element_at(col("labels"), m.label)
      rows = rows.filter(PromQLContext.matcherPredicate(c, m))
    }
    // absent label -> "" (Prometheus semantics), matching the batch
    // evaluators (PromQLContext/MetricEngine): raw element_at is null for
    // a series missing the grouped label, which would split a null group
    // off from the "" group and break streaming-vs-replay agreement.
    val byCols = by.sorted.map(l =>
      if (l == "__name__") col("name").as(l)
      else coalesce(element_at(col("labels"), l), lit("")).as(l))
    rows.withWatermark("ts_ts", watermark)
      .groupBy(byCols :+ window(col("ts_ts"), s"$stepMs milliseconds").as("w"): _*)
      .agg(agg.as("value"))
      // qcol, not col: by-labels can be UTF-8 names (round 15 — quoted
      // grouping syntax reaches this executor too) and bare col() would
      // parse a dotted label as struct access
      .select(by.sorted.map(graft.storage.TimeMergeStorage.qcol) ++
        Seq(unix_millis(col("w.start")).as("bucket_ms"), col("value")): _*)
  }

  /** Per-series reset-aware delta row emitted by [[streamingRate]]'s first
    * stateful operator; `ts_ts` is the declared event-time column that lets
    * the downstream windowed aggregation chain off it. */
  final case class SeriesDelta(name: String, uid: String,
      ts_ts: java.sql.Timestamp, delta: Double)

  /** Operator 1 of the chained pair: per-series last-(ts,value) state via
    * the transformWithState API, emitting one reset-aware delta per sample
    * that has a predecessor (counter reset → the new value itself, the
    * PromQL `increase` convention shared with
    * [[graft.functions.Rate.resetAwareDelta]]). Rows are sorted by ts
    * within each batch; a cross-batch regression (sample older than the
    * stored state) is dropped — the feed contract is per-series monotonic
    * arrival, and truly late data is repaired by the storage replay path
    * (T4 policy), not the live view. */
  private class ResetDeltaProcessor(byLabel: String)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        (String, String), Sample, SeriesDelta] {
    @transient private var last:
      org.apache.spark.sql.streaming.ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      last = getHandle.getValueState[(Long, Double)]("last",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: (String, String),
        rows: Iterator[Sample],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[SeriesDelta] = {
      val sorted = rows.toArray.sortBy(_.timestamp)
      // every row in the group is the same series, so the by-label value
      // is constant — read it from any row
      val labelValue = sorted.headOption
        .map(_.labels.getOrElse(byLabel, "")).getOrElse("")
      val out = Array.newBuilder[SeriesDelta]
      var prev: Option[(Long, Double)] =
        if (last.exists()) Option(last.get()) else None
      sorted.foreach { s =>
        prev match {
          case Some((pts, pv)) if s.timestamp >= pts =>
            val d = if (s.value >= pv) s.value - pv else s.value
            out += SeriesDelta(key._1, labelValue,
              new java.sql.Timestamp(s.timestamp), d)
            prev = Some((s.timestamp, s.value))
          case Some(_) => // behind state: dropped (monotonic feed contract)
          case None => prev = Some((s.timestamp, s.value))
        }
      }
      prev.foreach(last.update)
      out.result().iterator
    }
  }

  /** Streaming PromQL rate — the chained-stateful-operator shape the batch
    * evaluator refers rates to storage for: per-series reset-aware deltas
    * (keyed transformWithState state, operator 1) feed an event-time
    * windowed sum (operator 2), chained through the declared `ts_ts`
    * output event-time column. Emits one append-mode row per
    * (label value, step window) with the window's `increase` (sum of
    * deltas) and per-second `rate`, exactly Prometheus' increase/rate over
    * tumbling windows.
    *
    * Needs the RocksDB state store provider (the transformWithState
    * requirement); [[streamingRate]] sets it on the session. At 100 TB the
    * state is one (ts, value) pair per live series — the same cardinality
    * bound as [[liveLastValue]]. */
  def streamingRate(samples: Dataset[Sample], metric: String, byLabel: String,
      stepMs: Long, watermark: String = "0 seconds"): DataFrame = {
    val spark = samples.sparkSession
    // transformWithState requires the RocksDB provider. The setting is
    // SESSION-GLOBAL (Spark has no per-query provider option), so only the
    // default HDFS-backed provider is upgraded; a session that explicitly
    // chose some other provider must opt in itself — silently clobbering
    // it would break restores of that session's other stateful queries.
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val rocks =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val current = spark.conf.getOption(providerKey)
    if (!current.contains(rocks)) {
      require(current.forall(_.endsWith("HDFSBackedStateStoreProvider")),
        s"streamingRate needs the RocksDB state store provider but the " +
          s"session pins $providerKey=${current.get}; set it to RocksDB " +
          "yourself if that is intended")
      spark.conf.set(providerKey, rocks)
    }
    implicit val outEnc: org.apache.spark.sql.Encoder[SeriesDelta] =
      Encoders.product[SeriesDelta]
    implicit val keyEnc: org.apache.spark.sql.Encoder[(String, String)] =
      Encoders.tuple(Encoders.STRING, Encoders.STRING)
    implicit val sampleEnc: org.apache.spark.sql.Encoder[Sample] =
      Encoders.product[Sample]
    val filtered = samples.toDF()
      .withColumn("ts_ts", timestamp_millis(col("timestamp")))
      .withWatermark("ts_ts", watermark)
      .filter(col("name") === metric)
      .as[Sample]
    // State keys by the FULL canonical series key: keying by the label
    // VALUE alone would interleave distinct series sharing that value into
    // one pseudo-counter, and every alternation across their unrelated
    // levels would read as a reset (garbage increases). The by-label value
    // rides along in the emitted delta for the second operator's grouping
    // (per-series increase, THEN sum by label — the Prometheus
    // sum by (l) (increase(...)) decomposition).
    val deltas = filtered
      .groupByKey(s => (s.name, graft.metric.MetricEngine.labelsKey(s.labels)))
      .transformWithState(new ResetDeltaProcessor(byLabel), "ts_ts",
        OutputMode.Append())
    deltas.toDF()
      .groupBy(col("uid"), window(col("ts_ts"), s"$stepMs milliseconds").as("w"))
      .agg(sum(col("delta")).as("increase"))
      .select(col("uid"), unix_millis(col("w.start")).as("bucket_ms"),
        col("increase"),
        (col("increase") / lit(stepMs / 1000.0)).as("rate"))
  }

  /** Gap-based session windows over any event frame — Structured
    * Streaming's `session_window` under a watermark, one count per
    * (key, session). Append mode: a session emits once the watermark
    * passes its end (last event + gap); closed sessions are evicted from
    * the store, so state is bounded by (keys × open sessions) — the shape
    * that holds at 100 TB, independent of event count. Output: key +
    * `session_start`/`session_end` (epoch ms; end = last event + gap) +
    * `n_events`. */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      gap: String = "30 minutes", watermark: String = "0 seconds"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        unix_millis(col("session_window.start")).as("session_start"),
        unix_millis(col("session_window.end")).as("session_end"),
        col("n_events"))

  /** Per-series live last value: (name, sorted labels) -> newest sample.
    * Keyed state via mapGroupsWithState — emits the current latest on every
    * trigger that touches the series (update mode). */
  case class SeriesLast(name: String, seriesKey: String, ts: Long, value: Double)

  def liveLastValue(samples: Dataset[Sample]): Dataset[SeriesLast] = {
    implicit val enc = Encoders.product[SeriesLast]
    implicit val tupleEnc = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    samples
      // canonical control-character key: the ','/'=' join this replaced
      // let {a:"1,b=2"} and {a:"1",b:"2"} collide into one state entry
      // (exactly the collision MetricEngine.seriesKeyCol documents)
      .groupByKey(s => (s.name, graft.metric.MetricEngine.labelsKey(s.labels)))
      .mapGroupsWithState[SeriesLast, SeriesLast](GroupStateTimeout.NoTimeout) {
        (key: (String, String), batch: Iterator[Sample], state: GroupState[SeriesLast]) =>
          // last-write-wins with ARRIVAL-ORDER ties (>=): a correction sample
          // at an existing timestamp replaces the old value, matching the
          // storage path's seq-based Overwrite semantics.
          val init = state.getOption.map(s => (s.ts, s.value))
          val newest = batch.foldLeft(init) {
            case (acc, s) if acc.forall(s.timestamp >= _._1) =>
              Some((s.timestamp, s.value))
            case (acc, _) => acc
          }.get
          val out = SeriesLast(key._1, key._2, newest._1, newest._2)
          state.update(out)
          out
      }
  }
}
