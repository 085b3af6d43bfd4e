package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.storage._

/** Storage-engine rehearsal at 10^7 rows (reproducible source of the
  * SCALE.md storage table): bucketed multi-segment ingest, merged scan,
  * one-exchange sorted scan, manifest time pruning, zone-map pk pruning,
  * and per-bucket compaction — wall times printed for each.
  * Run: `sbt "runMain graft.tools.StoreRehearsal [numRows] [buckets]"`. */
object StoreRehearsal {
  def main(args: Array[String]): Unit = {
    val numRows = args.headOption.map(_.toLong).getOrElse(10_000_000L)
    val buckets = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = graft.GraftSession.create(32)

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[store] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val segMs = 3600_000L
    val nSegs = 5
    val schema = StructType(Seq(
      StructField("pk", LongType), StructField("ts", LongType),
      StructField("v", DoubleType)))
    val store = new TimeMergeStorage(spark,
      java.nio.file.Files.createTempDirectory("graft-store-rehearsal").toString,
      StorageSchema(schema, numPrimaryKeys = 1), segMs,
      timestampColumn = Some("ts"))

    // numRows over nSegs segments; 10% of pks written twice (overwrites)
    val perSeg = numRows / nSegs
    timed(s"bucketed ingest $numRows rows / $nSegs segments x $buckets buckets") {
      (0 until nSegs).foreach { s =>
        val base = spark.range(perSeg).select(
          (col("id") + s * perSeg).as("pk"),
          (lit(s * segMs) + pmod(col("id"), lit(segMs))).as("ts"),
          rand(42 + s).as("v"))
        store.writeBucketed(base, TimeRange(s * segMs, (s + 1) * segMs), buckets)
      }
      // overwrite generation: every 10th pk of segment 0 rewritten
      val over = spark.range(perSeg / 10).select(
        (col("id") * 10).as("pk"),
        pmod(col("id"), lit(segMs)).as("ts"),
        lit(-1.0).as("v"))
      store.writeBucketed(over, TimeRange(0, segMs), buckets)
    }
    println(s"[store] SSTs=${store.manifest.allSsts().size}")

    val merged = timed("merged scan count (native MergeDedupExec)")(
      store.scan().count())
    require(merged == numRows, s"merge lost rows: $merged")
    val wins = timed("overwrite winners check")(
      store.scan(ScanRequest(predicates = Seq(col("v") === -1.0))).count())
    require(wins == perSeg / 10, s"last-write-wins broken: $wins")
    timed("sorted scan (merge + global order, one exchange)")(
      store.scanSorted().count())
    timed(s"time-pruned scan (1/$nSegs segments)")(
      store.scan(ScanRequest(range = TimeRange(2 * segMs, 3 * segMs))).count())
    val zPlanned = store.plannedSsts(ScanRequest(
      predicates = Seq(col("pk") >= lit(perSeg * 2), col("pk") < lit(perSeg * 2 + 1000))))
    println(s"[store] zone-map pk probe plans ${zPlanned.size}/" +
      s"${store.manifest.allSsts().size} files")
    timed("per-bucket compaction to quiescence") {
      val c = new Compactor(store, CompactionConfig(inputSstMinNum = 2,
        newSstMaxSize = 8L << 30))
      var n = 0
      while (c.runOnce() && n < 200) n += 1
      println(s"[store] compaction passes=$n SSTs=${store.manifest.allSsts().size}")
    }
    val after = timed("post-compaction merged count")(store.scan().count())
    require(after == numRows, s"compaction lost rows: $after")
    println("[store] OK")
    spark.stop()
  }
}
