package graft.storage

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}

/** Half-open time range [start, end) over epoch-millis, mirroring the
  * reference's TimeRange (columnar_storage/src/types.rs:45-133). */
final case class TimeRange(start: Long, end: Long) {
  require(start < end, s"empty TimeRange [$start,$end)")
  def overlaps(o: TimeRange): Boolean = start < o.end && end > o.start // types.rs:125-127
  def merge(o: TimeRange): TimeRange = TimeRange(math.min(start, o.start), math.max(end, o.end))
}

object TimeRange {
  /** Segment id of a timestamp: floor-divide toward negative infinity
    * (types.rs:82-86 truncate_by). */
  def truncate(ts: Long, segmentMs: Long): Long = Math.floorDiv(ts, segmentMs) * segmentMs
}

/** Immutable sorted parquet file + metadata
  * (reference columnar_storage/src/sst.rs:48-160). `id` doubles as the write
  * sequence `__seq__` (storage.rs:205-206). */
final case class SstFile(
    id: Long,
    path: String,
    numRows: Long,
    sizeBytes: Long,
    timeRange: TimeRange,
    compacting: Boolean = false,
    /** Zone-map stats: column → (min, max), each Long | Double | String |
      * Boolean, lifted from the parquet footer at write time and consulted
      * by [[ZoneMaps]] for file-level pruning. Empty on legacy manifest
      * lines and for columns without usable footer statistics. */
    stats: Map[String, (Any, Any)] = Map.empty,
    /** Pk-hash bucket this file belongs to
      * ([[TimeMergeStorage.writeBucketed]]'s partition index), or -1 for
      * unbucketed files. A pk always hashes to the same bucket, so
      * per-(segment, bucket) compaction is complete — no cross-bucket
      * merge is ever needed, which keeps one compaction task's input
      * bounded by a bucket, not a segment, at 100 TB. */
    bucket: Int = -1,
    /** Oldest `__seq__` this file's rows can carry, or -1 for "the file's
      * own id" (every raw SST stamps its rows with its id). A compaction
      * OUTPUT keeps its inputs' oldest seq under a NEW (larger) id, so id
      * order stops being content order once outputs coexist with newer raw
      * files — the Append picker must sort by THIS to keep its
      * seq-contiguous-prefix invariant (see Picker). Persisted in the
      * manifest; absent on legacy lines (→ -1 → id, correct for every
      * file written before outputs carried the field). */
    seqFloor: Long = -1L) {
  /** File is entirely expired under `ttlMs` as of `nowMs` (sst.rs:109-114). */
  def isExpired(nowMs: Long, ttlMs: Option[Long]): Boolean =
    ttlMs.exists(ttl => timeRange.end < nowMs - ttl)

  /** The content-seq ordering key: `seqFloor` when recorded, else the id. */
  def contentSeqFloor: Long = if (seqFloor >= 0L) seqFloor else id
}

/** Snapshot + delta log of SST adds/deletes, kept as JSON-lines files under
  * `<root>/manifest/` with an in-memory cache, background-mergeable into a
  * snapshot once deltas accumulate (reference columnar_storage/src/manifest/mod.rs:67-334).
  *
  * All I/O goes through the Hadoop `FileSystem` API ([[StoreFs]]), so the
  * root may be any supported URI — `file:`, `hdfs:`, `s3a:`, … — matching
  * the reference's object-store manifest (manifest/mod.rs:67-177 over
  * object_store paths). The commit scheme is object-store-safe: every
  * commit-critical file is WRITE-ONCE under a fresh sequence-numbered name
  * (`delta-<seq>.jsonl`, `snapshot-<seq>.jsonl`) — no atomic-replace rename
  * anywhere. Load picks the newest snapshot and replays only deltas with a
  * HIGHER seq; a crash at any point between "write new snapshot" and "delete
  * merged deltas/old snapshots" leaves stale files that are ignored (their
  * seq is ≤ the snapshot's) and swept by the next merge.
  *
  * Single-writer: in Spark the driver is the only manifest writer, which
  * gives the same serialization guarantee as the reference's RwLock + single
  * merger task (manifest/mod.rs:67-177). At 100 TB scale (~10^6 files) the
  * listing stays out of query-path driver memory hot loops: `findSsts` is an
  * O(n) scan of a compact case-class vector (~100 MB for 10^6 entries), and
  * the snapshot file is parquet-convertible for DataFrame-side pruning if it
  * outgrows that.
  */
final class Manifest(root: String, mergeThreshold: Int = 50,
    hardThreshold: Int = 90, conf: Configuration = new Configuration()) {
  private val log = org.slf4j.LoggerFactory.getLogger(classOf[Manifest])
  private val sfs = StoreFs(root, conf)
  private val dir: HPath = sfs.path("manifest")
  sfs.mkdirs(dir)
  private val files = mutable.LinkedHashMap.empty[Long, SstFile]
  private var deltaCount = 0
  // Replay-order counter: strictly greater than every delta ever written
  // under this root (wall clocks and nanoTime may go backwards on restart;
  // a persisted max guarantees ordering across sessions).
  private var deltaSeq = 0L
  // Seq of the newest merged snapshot (0 = none/legacy); deltas at or below
  // it are already incorporated and must not replay.
  private var snapshotSeq = 0L
  // When each path was last UNREFERENCED (a "del" record applied) — the
  // staleness clock vacuum needs: an SST file's modification time is its
  // CREATION time, so a month-old file unreferenced a minute ago would
  // look ancient and lose its delete-grace window. In-process deletes
  // stamp the wall clock; deltas replayed on load stamp the delta FILE's
  // mtime (= when the unreference was committed), surviving restarts.
  // Bounded: pruned opportunistically past UnrefAtCap (vacuum also clears
  // entries it deletes).
  private val unrefAt = mutable.Map.empty[String, Long]
  private val UnrefAtCap = 65536
  load()

  /** When `path` was last unreferenced, if known — max over everything
    * observed this process (see `unrefAt`). */
  def unreferencedAtMs(path: String): Option[Long] =
    synchronized(unrefAt.get(path))

  /** Forget a path's unreference time (its physical file is gone). */
  def clearUnreferencedAt(path: String): Unit =
    synchronized { unrefAt.remove(path); () }

  private def noteUnreferenced(path: String, atMs: Long): Unit = {
    unrefAt(path) = math.max(unrefAt.getOrElse(path, 0L), atMs)
    if (unrefAt.size > UnrefAtCap) {
      // drop the oldest half — entries this old are past any sane grace
      val cutoff = unrefAt.values.toSeq.sorted.apply(unrefAt.size / 2)
      unrefAt.filterInPlace((_, t) => t > cutoff)
    }
  }

  /** Largest SST id ever recorded — lets id allocation stay monotonic across
    * restarts (the reference's "mustn't go backwards" invariant, sst.rs:35-46). */
  def maxSstId: Long = synchronized {
    if (files.isEmpty) 0L else files.keys.max
  }

  private def seqOf(p: HPath, prefix: String): Long =
    p.getName.stripPrefix(prefix).stripSuffix(".jsonl").toLong

  private def listDeltas(): Seq[HPath] =
    sfs.list(dir).filter(_.getName.startsWith("delta-"))
      .sortBy(_.getName)

  private def listSnapshots(): Seq[HPath] =
    sfs.list(dir)
      .filter(p => p.getName.startsWith("snapshot-") && p.getName.endsWith(".jsonl"))
      .sortBy(p => seqOf(p, "snapshot-"))

  private def schemaSeqOf(p: HPath): Long =
    p.getName.stripPrefix("schema-").stripSuffix(".json").toLong

  private def listSchemaFiles(): Seq[HPath] =
    sfs.list(dir)
      .filter(p => p.getName.startsWith("schema-") && p.getName.endsWith(".json"))
      .sortBy(schemaSeqOf)

  /** Newest persisted table-schema descriptor (see
    * [[StorageSchema.toJson]]), or None on a pre-schema-aware (legacy)
    * root. The storage constructor uses this to REJECT an incompatible
    * reopen instead of silently reading old SSTs as null/corrupt data. */
  def storedSchemaJson: Option[String] = synchronized {
    listSchemaFiles().lastOption.map(p => sfs.readLines(p).mkString("\n"))
  }

  /** Persist a (new or evolved) schema descriptor — write-once under a
    * fresh sequence-numbered name, same crash-safety scheme as deltas;
    * older descriptors are swept by [[mergeSnapshot]]. */
  def writeSchemaJson(json: String): Unit = synchronized {
    val next = listSchemaFiles().lastOption.map(schemaSeqOf).getOrElse(0L) + 1
    sfs.writeLines(dir.suffix(f"/schema-$next%020d.json"), Seq(json))
  }

  // JSON string escape/unescape for the path field: SST paths are engine-
  // generated today, but a root directory containing a quote (legal on every
  // POSIX filesystem) would otherwise corrupt the line — both the quoted
  // string itself and the field regexes behind it (an embedded
  // `"numRows":…` in a path would shadow the real field).
  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def unesc(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => b += '\n'; i += 2
          case 'r' => b += '\r'; i += 2
          case 't' => b += '\t'; i += 2
          case 'u' => b += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case o   => b += o; i += 2 // \" and \\ (and any future passthrough)
        }
      } else { b += c; i += 1 }
    }
    b.toString
  }

  private def fmtStat(v: Any): String = v match {
    case s: String => "\"" + esc(s) + "\""
    case o => o.toString // Long, Double, Boolean render as JSON scalars
  }

  private def fmt(f: SstFile, op: String): String = {
    val stats =
      if (f.stats.isEmpty) ""
      else f.stats.toSeq.sortBy(_._1).map { case (c, (mn, mx)) =>
        s""""${esc(c)}":[${fmtStat(mn)},${fmtStat(mx)}]"""
      }.mkString(""","stats":{""", ",", "}")
    val bucket = if (f.bucket >= 0) s""","bucket":${f.bucket}""" else ""
    val seqFloor = if (f.seqFloor >= 0L) s""","seqFloor":${f.seqFloor}""" else ""
    s"""{"op":"$op","id":${f.id},"path":"${esc(f.path)}","numRows":${f.numRows},"sizeBytes":${f.sizeBytes},"start":${f.timeRange.start},"end":${f.timeRange.end}$bucket$seqFloor$stats}"""
  }

  // Scan to the first UNESCAPED closing quote (the old `[^"]*` regex
  // stopped at an escaped one).
  private def strField(line: String, k: String): String = {
    val key = s""""$k":""""
    val i = line.indexOf(key)
    if (i < 0) sys.error(s"bad manifest line: $line")
    var j = i + key.length
    val b = new StringBuilder
    while (j < line.length && line.charAt(j) != '"') {
      if (line.charAt(j) == '\\' && j + 1 < line.length) {
        b.append(line.charAt(j)).append(line.charAt(j + 1)); j += 2
      } else { b.append(line.charAt(j)); j += 1 }
    }
    unesc(b.toString)
  }

  private def parse(line: String): (String, SstFile) = {
    import Manifest.numPatterns
    def num(k: String): Long = numPatterns(k).findFirstMatchIn(line)
      .getOrElse(sys.error(s"bad manifest line: $line")).group(1).toLong
    // optional field: absent on legacy lines and unbucketed files
    def numOpt(k: String, dflt: Long): Long =
      numPatterns(k).findFirstMatchIn(line)
        .map(_.group(1).toLong).getOrElse(dflt)
    def str(k: String): String = strField(line, k)
    (str("op"), SstFile(num("id"), str("path"), num("numRows"),
      num("sizeBytes"), TimeRange(num("start"), num("end")),
      stats = parseStats(line), bucket = numOpt("bucket", -1L).toInt,
      seqFloor = numOpt("seqFloor", -1L)))
  }

  /** Parse the optional `"stats":{...}` object — a hand-rolled scanner like
    * `str` above (no JSON library dependency). The literal key text cannot
    * appear inside the path field: quotes there are escaped. Absent → empty
    * (legacy lines prune on time only). */
  private def parseStats(line: String): Map[String, (Any, Any)] = {
    val key = "\"stats\":{"
    val i = line.indexOf(key)
    if (i < 0) return Map.empty
    var j = i + key.length
    val out = Map.newBuilder[String, (Any, Any)]
    def parseString(): String = { // j at the opening quote
      j += 1
      val b = new StringBuilder
      while (line.charAt(j) != '"') {
        if (line.charAt(j) == '\\') {
          b.append(line.charAt(j)).append(line.charAt(j + 1)); j += 2
        } else { b.append(line.charAt(j)); j += 1 }
      }
      j += 1
      unesc(b.toString)
    }
    def parseScalar(): Any =
      if (line.charAt(j) == '"') parseString()
      else {
        val start = j
        while (",]}".indexOf(line.charAt(j).toInt) < 0) j += 1
        val tok = line.substring(start, j)
        if (tok == "true" || tok == "false") tok.toBoolean
        else if (tok.matches("-?\\d+")) tok.toLong
        else tok.toDouble
      }
    while (line.charAt(j) != '}') {
      val c = parseString() // column key
      j += 2                // ':' '['
      val mn = parseScalar()
      j += 1                // ','
      val mx = parseScalar()
      j += 1                // ']'
      out += c -> ((mn, mx))
      if (line.charAt(j) == ',') j += 1
    }
    out.result()
  }

  private def apply(p: HPath): Unit = {
    // the delta file's mtime is when its unreferences were committed —
    // the restart-surviving stamp for vacuum's staleness clock
    lazy val committedAt =
      try sfs.fs.getFileStatus(p).getModificationTime
      catch { case scala.util.control.NonFatal(_) => System.currentTimeMillis() }
    for (line <- sfs.readLines(p) if line.nonEmpty) {
      // "unref" tombstones (snapshot-persisted unreference stamps) carry
      // only path + at — branch before the full SstFile parse
      if (line.contains(""""op":"unref"""")) {
        val at = Manifest.numPatterns("at").findFirstMatchIn(line)
          .map(_.group(1).toLong).getOrElse(committedAt)
        noteUnreferenced(strField(line, "path"), at)
      } else {
        val (op, f) = parse(line)
        if (op == "add") files(f.id) = f
        else { files.remove(f.id); noteUnreferenced(f.path, committedAt) }
      }
    }
  }

  private def load(): Unit = synchronized {
    val snaps = listSnapshots()
    val legacy = sfs.path("manifest", "snapshot.jsonl") // pre-seq format
    snaps.lastOption match {
      case Some(snap) => snapshotSeq = seqOf(snap, "snapshot-"); apply(snap)
      case None if sfs.exists(legacy) => apply(legacy)
      case None => ()
    }
    val live = listDeltas().filter(p => seqOf(p, "delta-") > snapshotSeq)
    live.foreach(apply)
    deltaCount = live.size
    deltaSeq = (listDeltas().map(seqOf(_, "delta-")) :+ snapshotSeq).max
  }

  private def writeDelta(lines: Seq[String]): Unit = {
    deltaSeq += 1
    sfs.writeLines(dir.suffix(f"/delta-$deltaSeq%020d.jsonl"), lines)
    deltaCount += 1
    // Soft threshold: merge, best-effort. A failed merge must not fail the
    // write (the reference merges on a background task, manifest/mod.rs:
    // 184-196); the backlog instead pushes back at the hard limit below.
    if (deltaCount >= mergeThreshold)
      try mergeSnapshot()
      catch {
        case scala.util.control.NonFatal(e) =>
          // Surface a stalled merger long before writes start erroring at
          // the hard limit ~40 deltas later.
          log.warn(s"manifest snapshot merge failed at $deltaCount deltas " +
            s"(soft threshold $mergeThreshold); writes push back at " +
            s"$hardThreshold", e)
      }
  }

  /** Atomic add of new SSTs + delete of replaced ones — one delta file, the
    * reference's single manifest update (manifest/mod.rs:120-157).
    *
    * Errors out when the delta backlog reaches `hardThreshold` (soft 50 /
    * hard 90, reference manifest/mod.rs:248-256, config.rs:150-152): without
    * this, a stalled snapshot merge under sustained ingest lets delta files
    * grow without bound — the write path must push back, not degrade. */
  def update(adds: Seq[SstFile], deleteIds: Seq[Long] = Nil): Unit = synchronized {
    if (deltaCount >= hardThreshold) {
      // Self-heal first (the reference schedules a Hard merge before
      // erroring, manifest/mod.rs:248-256): a transient merge failure at
      // the soft threshold must not become permanent write rejection.
      try mergeSnapshot()
      catch { case scala.util.control.NonFatal(e) =>
        log.warn(s"hard-threshold recovery merge failed at $deltaCount deltas", e)
      }
      if (deltaCount >= hardThreshold)
        throw new IllegalStateException(
          s"manifest delta backlog ($deltaCount) reached the hard limit " +
            s"($hardThreshold): snapshot merge is stalled; rejecting write")
    }
    val deleting = deleteIds.flatMap(id => files.get(id))
    val delLines = deleting.map(fmt(_, "del"))
    val now = System.currentTimeMillis()
    deleting.foreach(f => noteUnreferenced(f.path, now))
    // Mutate the cache BEFORE writing the delta: writeDelta may trigger a
    // snapshot merge, which serializes the cache and drops the delta files.
    adds.foreach(f => files(f.id) = f)
    deleteIds.foreach(files.remove)
    writeDelta(adds.map(fmt(_, "add")) ++ delLines)
  }

  def addFile(f: SstFile): Unit = update(Seq(f))

  /** SSTs overlapping the query range — file-level partition pruning before
    * any I/O (manifest/mod.rs:165-172 find_ssts). */
  def findSsts(range: TimeRange): Seq[SstFile] = synchronized {
    files.values.filter(_.timeRange.overlaps(range)).toSeq
  }

  def allSsts(): Seq[SstFile] = synchronized(files.values.toSeq)

  def markCompacting(ids: Seq[Long], flag: Boolean): Unit = synchronized {
    ids.foreach(id => files.get(id).foreach(f => files(id) = f.copy(compacting = flag)))
  }

  /** Merge deltas into a new WRITE-ONCE numbered snapshot, then sweep the
    * incorporated deltas and older snapshots (manifest/mod.rs:184-334).
    * Content lands under `snapshot.tmp` first and reaches its final
    * seq-numbered name by rename-to-fresh-target, so a torn write can never
    * be mistaken for a valid snapshot. */
  /** The documented >10^6-files scale path made concrete: persist the
    * current entry set as a PARQUET table next to the JSONL snapshot, so
    * file-level planning can run as a DataFrame filter (distributed,
    * pushdown-pruned) instead of a driver-side scan of the in-memory
    * vector once the file count outgrows driver comfort. Columns: the
    * pruning keys (`id`, `path`, `start`, `end`, `bucket`, `compacting`,
    * `num_rows`, `size_bytes`) plus `jsonl`, the entry's full manifest
    * line — lossless, so a DataFrame-planned subset can be parsed back
    * into [[SstFile]]s (stats included) without touching the JSONL
    * snapshot. Write-once seq-named like every other commit file.
    * Returns the written directory. */
  def writeParquetSnapshot(spark: org.apache.spark.sql.SparkSession): String = {
    // Snapshot the entry set UNDER the lock; run the (seconds-long at 10^6
    // entries) distributed parquet write OUTSIDE it — holding the monitor
    // across a Spark job would stall every concurrent commit and read
    // (update/findSsts/mergeSnapshot all serialize on this lock).
    val (rows, outPath) = synchronized {
      (files.values.toSeq.map(f => (f.id, f.path,
        f.timeRange.start, f.timeRange.end, f.bucket, f.compacting,
        f.numRows, f.sizeBytes, fmt(f, "add"))),
        dir.suffix(f"/parquet-snapshot-$deltaSeq%020d"))
    }
    // Write-once: a repeat call at the same deltaSeq must not rewrite a
    // directory a reader may be consuming (mode("overwrite") deletes it
    // first). The existing snapshot holds the identical entry set — reuse.
    if (sfs.exists(outPath)) return outPath.toString
    spark.createDataFrame(rows).toDF("id", "path", "start", "end",
        "bucket", "compacting", "num_rows", "size_bytes", "jsonl")
      .write.mode("errorifexists").parquet(outPath.toString)
    outPath.toString
  }

  /** Parse one `jsonl` column value from [[writeParquetSnapshot]] back
    * into its [[SstFile]] (the driver-side tail of a DataFrame-planned
    * prune: filter distributed, parse only the survivors). */
  def parseSnapshotLine(line: String): SstFile = parse(line)._2

  def mergeSnapshot(): Unit = synchronized {
    if (deltaSeq > snapshotSeq) {
      val tmp = dir.suffix("/snapshot.tmp")
      // Persist the unreference stamps as "unref" tombstones (round 15,
      // advisor): merging drops the 'del' deltas, so without these a
      // restart right after a merge would lose vacuum's staleness clock
      // and anchor on file mtime — an SST unreferenced just before the
      // restart could be swept INSIDE its delete-grace window. Bounded by
      // UnrefAtCap; entries for paths vacuum already deleted were cleared.
      val unrefLines = unrefAt.toSeq.sortBy(_._1).map { case (path, at) =>
        s"""{"op":"unref","path":"${esc(path)}","at":$at}"""
      }
      sfs.writeLines(tmp, files.values.map(fmt(_, "add")).toSeq ++ unrefLines)
      sfs.rename(tmp, dir.suffix(f"/snapshot-$deltaSeq%020d.jsonl"))
      snapshotSeq = deltaSeq
    }
    // Best-effort sweep: anything at or below the new snapshot is dead.
    listDeltas().filter(p => seqOf(p, "delta-") <= snapshotSeq)
      .foreach(p => sfs.delete(p))
    listSnapshots().filter(p => seqOf(p, "snapshot-") < snapshotSeq)
      .foreach(p => sfs.delete(p))
    val legacy = sfs.path("manifest", "snapshot.jsonl")
    if (snapshotSeq > 0 && sfs.exists(legacy)) sfs.delete(legacy)
    listSchemaFiles().dropRight(1).foreach(p => sfs.delete(p))
    deltaCount = 0
  }
}

object Manifest {
  /** Newest schema descriptor under `root/manifest` WITHOUT constructing a
    * Manifest (whose load() reads the snapshot and replays every delta) —
    * [[graft.storage.TimeMergeStorage.open]] needs only the descriptor to
    * build the storage, whose own Manifest then pays the one full load.
    * The previous shape replayed the whole manifest twice per attach:
    * at 10^6 entries that is an extra ~100 MB snapshot read and delta
    * replay per open, doubling attach latency and object-store I/O. */
  def readSchemaJson(root: String,
      conf: org.apache.hadoop.conf.Configuration): Option[String] = {
    val sfs = StoreFs(root, conf)
    val dir = sfs.path("manifest")
    if (!sfs.exists(dir)) None
    else sfs.list(dir)
      .filter(p => p.getName.startsWith("schema-") && p.getName.endsWith(".json"))
      .sortBy(p => p.getName.stripPrefix("schema-").stripSuffix(".json").toLong)
      .lastOption
      .map(p => sfs.readLines(p).mkString("\n"))
  }

  // Field patterns compiled ONCE (companion, so they exist before the
  // constructor's load() replay runs) — parse() executes per manifest line,
  // and a 10^6-entry snapshot load compiling ~7 fresh
  // java.util.regex.Patterns per line would spend seconds on regex
  // compilation alone.
  private val numPatterns: Map[String, scala.util.matching.Regex] =
    Seq("id", "numRows", "sizeBytes", "start", "end", "bucket", "seqFloor",
      "at").map(k => k -> (s""""$k":(-?\\d+)""").r).toMap
}
