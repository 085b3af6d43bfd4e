package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.functions.{col, floor, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

import graft.storage._

/** `graft` as a first-class Spark SQL data source (DataSource V1): the
  * time-merge store behind `spark.read.format("graft")`,
  * `df.write.format("graft")`, and `CREATE TABLE t USING graft` — the API
  * edge a Spark user expects from a table format, built on the manifest's
  * persisted table descriptor (the table knows its own schema/pks/segment
  * duration; readers pass nothing but the root).
  *
  * Read path ([[GraftRelation]]): column pruning and filter pushdown reach
  * [[TimeMergeStorage.scan]] — time-range conjuncts on the descriptor's
  * timestamp column become manifest file pruning BEFORE any task launches,
  * the remaining simple predicates prune zone-mapped SSTs and push into the
  * parquet scans through Catalyst, and merge-on-read dedup runs the same
  * native [[graft.plans.MergeDedupExec]] as the programmatic API.
  *
  * Write path: `SaveMode.Append` splits the batch per segment (the
  * reference's cross-segment write check, storage.rs:307-316, is per-SST —
  * the SQL edge does the splitting a caller of the raw API does by hand)
  * and commits one sorted SST per touched segment — or N pk-hash-bucketed
  * SSTs with `option("buckets", n)`, the 100 TB layout. `Overwrite` is
  * rejected: an LSM table overwrites by WRITING (last-write-wins merge),
  * never by truncation.
  *
  * Options: `root` (or `path`); create-time only: `numPrimaryKeys`,
  * `segmentMs`, `timestampColumn`, `updateMode` (`overwrite`|`append`),
  * `buckets` (write parallelism).
  */
class DefaultSource extends RelationProvider with CreatableRelationProvider
    with DataSourceRegister with StreamSinkProvider {

  override def shortName(): String = "graft"

  private def rootOf(parameters: Map[String, String]): String =
    DefaultSource.rootOf(parameters)

  /** `df.writeStream.format("graft")` — the table as a Structured
    * Streaming sink. Micro-batches commit through the SAME append path as
    * batch saves (create-from-options on first batch, schema evolution,
    * per-segment splitting, optional bucketed layout). Batch re-delivery
    * after a restart is absorbed by a (queryId, batchId) high-water mark
    * persisted next to the manifest ([[GraftSink]]).
    *
    * Output modes: `Append` always; `Update`/`Complete` only onto
    * last-write-wins (Overwrite-mode) tables, where re-emitted aggregate
    * rows are upserts by primary key — the merge-on-read analog of a
    * mutable sink. An Append-MODE table under Update output would
    * concatenate every re-emission, so it is rejected. */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    require(partitionColumns.isEmpty,
      "the graft sink does not take partitionBy: layout is the table's " +
        "segment/bucket structure (segmentMs, buckets options)")
    new GraftSink(sqlContext.sparkSession, parameters, outputMode)
  }

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    require(!(parameters.contains("asOf") && parameters.contains("excludeTombstones")),
      "asOf and excludeTombstones cannot combine: a historical view " +
        "pre-dates later tombstones, so the filter would be misleading")
    GraftRelation(sqlContext,
      TimeMergeStorage.open(sqlContext.sparkSession, rootOf(parameters)),
      asOf = parameters.get("asOf").map(_.toLong),
      tombstoneCol = parameters.get("excludeTombstones"))
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    // descriptor-only existence probe: constructing a Manifest replays the
    // whole snapshot+delta log (and mkdirs the manifest dir as a side
    // effect) just to ask isDefined
    val exists = Manifest.readSchemaJson(root,
      spark.sessionState.newHadoopConf()).isDefined
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        sys.error(s"graft table already exists at $root (mode ErrorIfExists)")
      case SaveMode.Ignore if exists =>
        return GraftRelation(sqlContext, TimeMergeStorage.open(spark, root))
      case SaveMode.Overwrite =>
        sys.error("graft is a merge-on-read (LSM) table: overwrite by " +
          "WRITING newer versions (last-write-wins), not by truncation; " +
          "use SaveMode.Append")
      case _ => ()
    }
    GraftRelation(sqlContext,
      DefaultSource.appendBatch(spark, parameters, data))
  }
}

object DefaultSource {

  /** Backtick-quote a raw column name for the Column API — `col("a.b")`
    * re-parses the dot as struct access. Delegates to the engine-wide
    * [[graft.storage.TimeMergeStorage.qcol]]. */
  private[sources] def qcol(name: String): Column =
    graft.storage.TimeMergeStorage.qcol(name)

  private[sources] def rootOf(parameters: Map[String, String]): String =
    parameters.get("root").orElse(parameters.get("path")).getOrElse(
      sys.error("the graft source needs a 'root' (or 'path') option"))

  /** The shared append path behind `SaveMode.Append` saves AND streaming
    * sink micro-batches: resolve-or-create the store from options, evolve
    * the schema for widened frames, align/null-fill the batch, split per
    * segment, commit one (or `buckets`) sorted SSTs per touched segment.
    * (The sink validates output-mode/table-mode inline in addBatch, where
    * it caches the resolved store across triggers.) */
  private[sources] def appendBatch(
      spark: org.apache.spark.sql.SparkSession,
      parameters: Map[String, String], data: DataFrame): TimeMergeStorage = {
    val store = resolveStore(spark, parameters, data)
    appendTo(store, parameters, data)
    store
  }

  /** Resolve-or-create the store a batch writes into: open + widen for
    * extra columns (append-nullable evolution), or create from options.
    * Split from [[appendBatch]] so the streaming sink can CACHE the
    * resolved store across micro-batches — each open loads the manifest,
    * O(SST count) driver work a months-running stream would otherwise pay
    * on every trigger. */
  private[sources] def resolveStore(
      spark: org.apache.spark.sql.SparkSession,
      parameters: Map[String, String], data: DataFrame): TimeMergeStorage = {
    val root = rootOf(parameters)
    val exists = Manifest.readSchemaJson(root,
      spark.sessionState.newHadoopConf()).isDefined
    val store =
      if (exists) {
        // schema evolution on the SQL edge: appending a frame with EXTRA
        // columns widens the table (append-nullable-values, the one
        // no-rewrite evolution) instead of silently dropping them; the
        // store constructor validates the evolution and persists the new
        // descriptor. Illegal shapes (retyped/renamed columns) fail there.
        val base = TimeMergeStorage.open(spark, root)
        val extra = data.schema.fields
          .filterNot(f => base.schema.userSchema.fieldNames.contains(f.name))
        // Spark's analyzer is case-INsensitive by default, but this match
        // is exact: a batch column differing only in case ("Value" vs the
        // table's "value") would otherwise "widen" the schema, null-fill
        // the original column, and leave a table unreadable under the
        // default resolver (ambiguous columns). Reject it loudly.
        extra.map(_.name).find(n =>
            base.schema.userSchema.fieldNames.exists(_.equalsIgnoreCase(n)))
          .foreach(n => sys.error(
            s"append batch column '$n' differs only in CASE from an " +
              "existing table column — rename it; case-colliding columns " +
              "would make the table unreadable under Spark's default " +
              "case-insensitive resolver"))
        if (extra.isEmpty) base
        else new TimeMergeStorage(spark, root,
          StorageSchema(
            StructType(base.schema.userSchema.fields ++ extra.map(_.copy(nullable = true))),
            base.schema.numPrimaryKeys, base.schema.updateMode),
          base.segmentMs, timestampColumn = base.timestampColumn)
      } else {
        val npk = parameters.getOrElse("numPrimaryKeys", sys.error(
          "creating a graft table needs 'numPrimaryKeys' (leading columns " +
            "forming the sort/merge key)")).toInt
        val segMs = parameters.getOrElse("segmentMs", sys.error(
          "creating a graft table needs 'segmentMs' (segment duration)")).toLong
        val um = parameters.get("updateMode").map {
          case "append" => UpdateMode.Append
          case "overwrite" => UpdateMode.Overwrite
          case o => sys.error(s"unknown updateMode '$o' (overwrite|append)")
        }.getOrElse(UpdateMode.Overwrite)
        new TimeMergeStorage(spark, root,
          StorageSchema(StructType(data.schema.fields), npk, um), segMs,
          timestampColumn = parameters.get("timestampColumn"))
      }
    store
  }

  /** Commit one aligned batch into an ALREADY-RESOLVED store — split out so
    * [[GraftRelation.insert]] can write through the relation's own store
    * instance (whose in-memory manifest must see the new SSTs: re-opening
    * a fresh store would leave the SQL view reading a stale file list). */
  private[sources] def appendTo(store: TimeMergeStorage,
      parameters: Map[String, String], data: DataFrame): Unit = {
    // align the batch to the table: reorder by name, null-fill ABSENT
    // nullable value columns (the complement of append-column widening —
    // an old producer keeps writing after the table evolved); primary
    // keys and the timestamp column must be present. Names quote (qcol):
    // a dotted table column must not re-parse as struct access.
    val aligned = data.select(store.schema.userSchema.fields.map { f =>
      if (data.columns.contains(f.name)) qcol(f.name)
      else {
        require(f.nullable && !store.schema.primaryKeys.contains(f.name) &&
            !store.timestampColumn.contains(f.name),
          s"append batch is missing required column ${f.name}")
        lit(null).cast(f.dataType).as(f.name)
      }
    }.toIndexedSeq: _*)
    val buckets = effectiveBuckets(store, parameters)
    def commit(df: DataFrame, range: TimeRange): Unit =
      if (buckets > 1) store.writeBucketed(df, range, buckets)
      else store.write(df, range)
    store.timestampColumn match {
      case Some(ts) =>
        // per-segment commit loop — bounded by the batch's time SPAN (a
        // day's batch touches 1-2 segments), not its row count. A null
        // timestamp has no segment: reject it loudly here (Row.getLong
        // would NPE, and the row would otherwise silently miss every
        // segment's range filter). The batch PERSISTS across the probe +
        // per-segment filters: a micro-batch whose lineage re-reads the
        // source would otherwise re-execute once per touched segment.
        val cached = aligned.persist()
        try {
          val segRows = cached
            .select(TimeMergeStorage.segmentIdColumn(qcol(ts),
              store.segmentMs).as("__seg__"))
            .distinct().collect()
          require(!segRows.exists(_.isNullAt(0)),
            s"append batch contains null $ts values — a row without a " +
              "timestamp has no segment; filter or default them before writing")
          val segs = segRows.map(_.getLong(0)).sorted
          segs.foreach { seg =>
            val lo = seg * store.segmentMs
            commit(cached.filter(qcol(ts) >= lit(lo) &&
              qcol(ts) < lit(lo + store.segmentMs)),
              TimeRange(lo, lo + store.segmentMs))
          }
        } finally cached.unpersist()
      case None =>
        // no timestamp column: the whole table lives in segment 0
        commit(aligned, TimeRange(0L, store.segmentMs))
    }
  }

  /** The table's pk-hash bucket count. Bucket layout is a TABLE property
    * ("a pk always hashes to the same bucket" is what makes
    * per-(segment, bucket) compaction complete), so the first bucketed
    * write PERSISTS it under manifest/buckets.txt and later writers must
    * agree; INSERTs and optionless appends read it back. The fallback for
    * pre-marker roots infers max(observed bucket)+1 — best effort only
    * (an empty top bucket writes no file and under-counts), which is why
    * the marker exists. */
  private[sources] def effectiveBuckets(store: TimeMergeStorage,
      parameters: Map[String, String]): Int = {
    val markerPath = store.storeFs.path("manifest", "buckets.txt")
    val persisted =
      if (!store.storeFs.exists(markerPath)) None
      else store.storeFs.readLines(markerPath).headOption
        .map(_.trim.toInt).filter(_ > 0)
    val declared = parameters.get("buckets").map(_.toInt)
    (declared, persisted) match {
      case (Some(d), Some(p)) =>
        require(d == p, s"buckets=$d conflicts with the table's persisted " +
          s"bucket layout ($p): the pk-hash layout is physical and cannot " +
          "change without a rewrite")
        d
      case (Some(d), None) =>
        if (d > 1) {
          // Exclusive create (round 15, advisor): two concurrent FIRST
          // bucketed writers with different counts both saw no marker; a
          // plain write is last-writer-wins and the loser's SSTs land
          // under a conflicting pk-hash layout — the exact mixed-layout
          // state the require() above guards against. create(overwrite =
          // false) refuses an existing marker (atomic on HDFS; a narrow
          // check-then-create on local/object stores, where rename(2)
          // OVERWRITES and offers no stronger primitive), so at most one
          // writer plants the layout. The unconditional re-read below is
          // the portable backstop: a writer whose declared count lost the
          // race fails here, BEFORE committing any SST.
          store.storeFs.mkdirs(store.storeFs.path("manifest"))
          try {
            val out = store.storeFs.fs.create(markerPath, false)
            try out.write((d.toString + "\n")
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            finally out.close()
          } catch {
            case _: java.io.IOException => () // lost the race — verified below
          }
          val won = store.storeFs.readLines(markerPath).headOption
            .map(_.trim.toInt).filter(_ > 0)
          require(won.contains(d),
            s"buckets=$d lost the first-writer race to a concurrent " +
              s"writer's persisted layout (${won.getOrElse("?")}): the " +
              "pk-hash layout is physical and cannot change without a " +
              "rewrite")
        }
        d
      case (None, Some(p)) => p
      case (None, None) =>
        store.manifest.allSsts().map(_.bucket).filter(_ >= 0)
          .reduceOption(_ max _).map(_ + 1).getOrElse(1)
    }
  }
}

/** DSv1 streaming sink for the `graft` table format. Each micro-batch is
  * re-materialized ([[org.apache.spark.sql.GraftShims.materializeBatch]])
  * and committed through [[DefaultSource.appendBatch]] — the identical
  * create/evolve/align/per-segment path batch saves use, so a table built
  * by a stream is indistinguishable from one built by batch appends.
  *
  * Exactly-once bookkeeping: Structured Streaming re-delivers the last
  * uncommitted batch after a restart, so the sink persists a
  * `(queryId, batchId)` high-water mark in `<root>/manifest/sink-commit.txt`
  * AFTER each commit and skips any `batchId` at or below it for the same
  * queryId (queryId survives restarts from the same checkpoint; a NEW
  * checkpoint gets a new queryId and naturally starts fresh). The mark is
  * written after the data commit, so a crash between the two re-appends
  * one batch: harmless on Overwrite tables (identical versions merge
  * away), at-least-once on Append(-mode) tables — the same boundary the
  * in-process `MetricStreamIngest` foreachBatch path documents, and the
  * reference's remote-write ingest shares (no cross-request txn).
  *
  * Single-writer discipline: the store's manifest already requires one
  * writer per root (reference: single merger task) — one streaming query
  * per table root is the supported shape, so one mark file suffices. */
final class GraftSink(
    spark: org.apache.spark.sql.SparkSession,
    parameters: Map[String, String],
    outputMode: org.apache.spark.sql.streaming.OutputMode)
    extends org.apache.spark.sql.execution.streaming.Sink {
  import org.apache.spark.sql.streaming.OutputMode

  private val root = DefaultSource.rootOf(parameters)
  private val sfs = StoreFs(root, spark.sessionState.newHadoopConf())
  private def markPath = sfs.path("manifest", "sink-commit.txt")

  // `compactEvery` = N: run one compaction pass after every N committed
  // batches (option, default off). A long-running stream commits one SST
  // per micro-batch per touched segment; without periodic compaction the
  // file count grows without bound and scans slow down. Driver-side and
  // in-line with the commit loop — the same single-writer discipline the
  // manifest requires (a concurrent external compactor would race it).
  private val compactEvery = parameters.get("compactEvery").map(_.toInt)
  require(compactEvery.forall(_ > 0), "compactEvery must be positive")
  private var sinceCompaction = 0

  // The resolved store, cached across micro-batches: re-resolving per
  // trigger re-loads the manifest — O(SST count) driver work that a
  // months-running stream at 10⁵–10⁶ SSTs pays as a multi-second stall
  // per batch. Safe to pin because the manifest is single-writer (one
  // streaming query per root) and every write/compaction goes through
  // THIS instance's in-memory manifest. Invalidated only for the one
  // reason re-resolution exists: a batch carrying columns the cached
  // schema lacks (append-nullable widening re-opens + evolves the
  // descriptor); narrower batches null-fill inside appendTo as usual.
  private var cachedStore: Option[TimeMergeStorage] = None
  // The compactor too: it owns the grace-deferred delete queue
  // (deleteGraceMs), so a per-pass instance would abandon parked deletes
  // to vacuum every tick; one long-lived instance drains them on later
  // passes. Rebuilt with the store on schema evolution.
  private var cachedCompactor: Option[graft.storage.Compactor] = None

  /** The cached store when it can absorb `batch` (every batch column
    * already in the table schema), else a fresh resolution (first batch,
    * or a widening batch — the evolution path persists the new
    * descriptor). */
  private def storeFor(batch: DataFrame): TimeMergeStorage = {
    val store = cachedStore
      .filter(s => batch.schema.fieldNames.forall(
        s.schema.userSchema.fieldNames.contains))
      .getOrElse(DefaultSource.resolveStore(spark, parameters, batch))
    cachedStore = Some(store)
    store
  }

  /** Parsed high-water mark, or None when the file is absent OR torn
    * (writeLines overwrites in place, so a crash mid-write can leave a
    * truncated line). A malformed mark degrades to "nothing committed" —
    * at worst one batch re-appends, the documented at-least-once boundary
    * — instead of poisoning every restart with a parse exception. */
  private def lastCommitted(): Option[(String, Long)] =
    if (!sfs.exists(markPath)) None
    else scala.util.Try {
      sfs.readLines(markPath).headOption.flatMap { l =>
        val i = l.lastIndexOf(' ')
        if (i <= 0) None
        else l.substring(i + 1).toLongOption.map(b => (l.substring(0, i), b))
      }
    }.toOption.flatten

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // set by StreamExecution for the duration of the query; stable across
    // restarts from one checkpoint (persisted in checkpoint metadata)
    val queryId = Option(
      spark.sparkContext.getLocalProperty("sql.streaming.queryId"))
      .getOrElse("no-query-id")
    if (lastCommitted().exists { case (q, b) => q == queryId && batchId <= b })
      return // re-delivered after restart: already committed
    val batch = org.apache.spark.sql.GraftShims.materializeBatch(data)
    if (batch.isEmpty) { // empty trigger: no SST, but advance the mark
      sfs.mkdirs(sfs.path("manifest"))
      sfs.writeLines(markPath, Seq(s"$queryId $batchId"))
      return
    }
    val store = storeFor(batch)
    require(outputMode == OutputMode.Append() ||
        store.schema.updateMode == UpdateMode.Overwrite,
      s"output mode $outputMode re-emits rows per trigger and needs a " +
        "last-write-wins (Overwrite-mode) table to upsert into; this " +
        "table is Append-mode (concatenating merge)")
    DefaultSource.appendTo(store, parameters, batch)
    sfs.mkdirs(sfs.path("manifest"))
    sfs.writeLines(markPath, Seq(s"$queryId $batchId"))
    compactEvery.foreach { n =>
      sinceCompaction += 1
      if (sinceCompaction >= n) {
        sinceCompaction = 0
        // the CACHED store: a mid-stream schema evolution already
        // invalidated it above (the widening batch re-resolved with the
        // evolved descriptor), so compaction always sees the current
        // schema without paying a manifest re-open per pass.
        // `ttlMs` = streaming retention: segments whose whole time range
        // is older than now - ttl are deleted wholesale by these same
        // passes (the reference's TTL expiry, applied at the SQL edge).
        // deleteGraceMs: without it inline compaction physically deletes
        // its inputs immediately and a concurrent reader of the same root
        // hits FAILED_READ_FILE mid-query — the exact read-while-compact
        // race CompactionConfig documents; serving deployments set it
        // above their longest query
        val cfg = graft.storage.CompactionConfig(
          ttlMs = parameters.get("ttlMs").map(_.toLong),
          deleteGraceMs = parameters.get("deleteGraceMs")
            .map(_.toLong).getOrElse(0L))
        val compactor = cachedCompactor
          .filter(_.storage eq store)
          .getOrElse {
            val c = new graft.storage.Compactor(store, cfg)
            cachedCompactor = Some(c)
            c
          }
        // drain: a backlog of micro-batch SSTs can need several passes
        var rounds = 0
        while (compactor.runOnce() && rounds < 8) rounds += 1
      }
    }
  }
}

/** The scan-side relation: DSv1 `PrunedFilteredScan` delegating to
  * [[TimeMergeStorage.scan]]. `needConversion = false` + `toRdd` keeps the
  * merged scan INSIDE Tungsten (no Row materialization between the store's
  * plan and the caller's).
  *
  * `asOf` = time travel ([[TimeMergeStorage.scanAsOf]]): the table as of
  * that write sequence — `OPTIONS (root '…', asOf '123')`.
  * `tombstoneCol` = delete-marker filtering
  * ([[TimeMergeStorage.scanWithoutDeleted]]) —
  * `OPTIONS (root '…', excludeTombstones 'deleted')`. */
final case class GraftRelation(sqlContext: SQLContext,
    store: TimeMergeStorage,
    asOf: Option[Long] = None,
    tombstoneCol: Option[String] = None)
    extends BaseRelation with PrunedFilteredScan with InsertableRelation {

  override def schema: StructType = store.schema.userSchema

  override def needConversion: Boolean = false

  /** SQL `INSERT INTO <view>` lands through the same per-segment append
    * path as `df.write.format("graft")`. `INSERT OVERWRITE` is rejected
    * for the same reason SaveMode.Overwrite is: an LSM table overwrites by
    * WRITING newer versions, never by truncation. Historical (`asOf`) and
    * tombstone-filtered views are read-only — inserting "into" a pinned
    * past or a filtered projection would be misleading. */
  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    require(!overwrite, "graft is a merge-on-read (LSM) table: overwrite " +
      "by WRITING newer versions (last-write-wins), not by truncation; " +
      "use plain INSERT INTO")
    require(asOf.isEmpty && tombstoneCol.isEmpty,
      "asOf / excludeTombstones views are read-only; insert through a " +
        "plain view of the table root")
    // INSERT INTO binds columns BY POSITION against this relation's
    // schema; restore the table's column names, then commit through THIS
    // relation's store so its in-memory manifest sees the new SSTs
    // immediately (a fresh open would leave this view reading stale files).
    // Bucket layout is a write-time option, not part of the descriptor —
    // infer it from the manifest so INSERTs into a bucketed table keep the
    // pk-hash layout (an unbucketed SST would never merge with its
    // bucket-mates under per-(segment, bucket) compaction).
    val named = data.toDF(store.schema.userSchema.fieldNames.toIndexedSeq: _*)
    // bucket layout comes from the persisted marker (or, pre-marker, the
    // best-effort manifest inference) inside appendTo — never re-derived
    // here where an empty top bucket would under-count it
    DefaultSource.appendTo(store, Map.empty, named)
  }

  /** Filters the store evaluates itself (everything translatable — pushed
    * into the scan as Column predicates, where they prune zone-mapped SSTs
    * and reach the parquet readers). Untranslatable shapes are returned so
    * Spark re-evaluates them above the scan. */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters.filterNot(f => translate(f).isDefined)

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val preds = filters.flatMap(translate)
    // Time-range FILE pruning only when the timestamp column is a primary
    // key: all versions of a pk then share their timestamp, so dropping a
    // file by range can never hide a newer version from the merge. A
    // value-column timestamp still filters exactly — post-merge, inside
    // the scan (TimeMergeStorage.scanWith's predicate classification).
    val range = store.timestampColumn
      .filter(store.schema.primaryKeys.contains)
      .map(ts => timeRangeOf(ts, filters))
      .getOrElse(Some(TimeRange(Long.MinValue, Long.MaxValue)))
    range match {
      case None => // provably empty time range: no scan at all
        sqlContext.sparkSession.sparkContext.emptyRDD[Row]
      case Some(r) =>
        val req = ScanRequest(range = r,
          predicates = preds.toIndexedSeq,
          projection = Some(requiredColumns.toIndexedSeq))
        val df = (asOf, tombstoneCol) match {
          case (Some(seq), _) => store.scanAsOf(seq, req)
          case (_, Some(tc)) => store.scanWithoutDeleted(tc, req)
          case _ => store.scan(req)
        }
        // needConversion=false contract: hand back the InternalRow RDD
        df.queryExecution.toRdd.asInstanceOf[RDD[Row]]
    }
  }

  /** Time-range conjuncts on the descriptor's timestamp column → manifest
    * file pruning (the one pushdown parquet cannot do for us: it happens
    * before any task is scheduled). Conservative: only top-level
    * conjuncts; everything else leaves the range unbounded. None =
    * provably empty (contradictory conjuncts, or a bound that cannot be
    * represented as a half-open range without overflow — e.g.
    * `ts = Long.MaxValue`, whose exclusive end would wrap). */
  private def timeRangeOf(ts: String, filters: Array[Filter]): Option[TimeRange] = {
    // inclusive bounds; converted to the store's half-open range at the end
    var lo = Long.MinValue
    var hi = Long.MaxValue
    var empty = false
    def num(v: Any): Option[Long] = v match {
      case l: Long => Some(l)
      case i: Int => Some(i.toLong)
      case _ => None
    }
    filters.foreach {
      case GreaterThan(`ts`, v) => num(v).foreach { n =>
        if (n == Long.MaxValue) empty = true // ts > MAX: nothing qualifies
        else lo = math.max(lo, n + 1)
      }
      case GreaterThanOrEqual(`ts`, v) => num(v).foreach(n => lo = math.max(lo, n))
      case LessThan(`ts`, v) => num(v).foreach { n =>
        if (n == Long.MinValue) empty = true // ts < MIN: nothing qualifies
        else hi = math.min(hi, n - 1)
      }
      case LessThanOrEqual(`ts`, v) => num(v).foreach(n => hi = math.min(hi, n))
      case EqualTo(`ts`, v) => num(v).foreach { n =>
        lo = math.max(lo, n); hi = math.min(hi, n)
      }
      case _ => ()
    }
    if (empty || lo > hi) None // contradictory conjuncts: provably empty
    else if (lo == Long.MaxValue)
      // [MAX, MAX] has no half-open representation; fall back to an
      // unbounded range — the translated predicate still filters exactly
      Some(TimeRange(Long.MinValue, Long.MaxValue))
    else Some(TimeRange(lo,
      if (hi == Long.MaxValue) Long.MaxValue else hi + 1))
  }

  /** sources.Filter → Column, for the shapes the scan can evaluate.
    * Attribute names QUOTE ([[DefaultSource.qcol]]): Spark hands filters
    * the raw column name, and bare col("a.b") re-parses the dot as struct
    * access — a pushed predicate on a dotted column would mis-resolve
    * (silently wrong rows when a struct field shadows the name) even
    * though unhandledFilters declared it handled. */
  private def translate(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(DefaultSource.qcol(a) === lit(v))
    case EqualNullSafe(a, v) => Some(DefaultSource.qcol(a) <=> lit(v))
    case GreaterThan(a, v) => Some(DefaultSource.qcol(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(DefaultSource.qcol(a) >= lit(v))
    case LessThan(a, v) => Some(DefaultSource.qcol(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(DefaultSource.qcol(a) <= lit(v))
    case In(a, vs) => Some(DefaultSource.qcol(a).isInCollection(vs.toSeq))
    case IsNull(a) => Some(DefaultSource.qcol(a).isNull)
    case IsNotNull(a) => Some(DefaultSource.qcol(a).isNotNull)
    case StringStartsWith(a, v) => Some(DefaultSource.qcol(a).startsWith(v))
    case StringEndsWith(a, v) => Some(DefaultSource.qcol(a).endsWith(v))
    case StringContains(a, v) => Some(DefaultSource.qcol(a).contains(v))
    case Not(child) => translate(child).map(!_)
    case And(l, r) =>
      for (lc <- translate(l); rc <- translate(r)) yield lc && rc
    case Or(l, r) =>
      for (lc <- translate(l); rc <- translate(r)) yield lc || rc
    case _ => None
  }
}
