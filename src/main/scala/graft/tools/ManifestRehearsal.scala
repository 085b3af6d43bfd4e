package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.storage._

/** Manifest-at-10^6-entries rehearsal — converts SCALE.md's last
  * design-argument-only claim into measured evidence. Builds a real
  * file-backed manifest with `entries` synthetic SST records (1000 files
  * per hour-long segment, zone-map pk stats on each), then measures the
  * numbers that matter at 100 TB file counts:
  *
  *  - build + snapshot-merge wall time (the background merger's cost),
  *  - COLD load (fresh `Manifest` → full snapshot replay into memory) and
  *    the in-memory footprint delta,
  *  - `findSsts` time-range prune latency (the per-query driver cost),
  *  - `plannedSsts` with a pk zone-map bound on top of the range,
  *  - the PARQUET-snapshot fallback ([[Manifest.writeParquetSnapshot]]):
  *    write cost, then a DataFrame-side range prune whose surviving rows
  *    parse back into the same file set the driver-side prune planned —
  *    the documented escape hatch for counts past driver comfort,
  *    exercised end-to-end.
  *
  * Run: `sbt "runMain graft.tools.ManifestRehearsal [entries]"`
  */
object ManifestRehearsal {
  def main(args: Array[String]): Unit = {
    val entries = args.headOption.map(_.toInt).getOrElse(1000000)
    val perSegment = 1000
    val segMs = 3600000L
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = Files.createTempDirectory("graft-manifest-rehearsal").toString
    // a real store so plannedSsts runs through the production path
    val store = new TimeMergeStorage(spark, root,
      StorageSchema(StructType(Seq(
        StructField("pk", LongType), StructField("ts", LongType),
        StructField("v", DoubleType))), 2, UpdateMode.Overwrite),
      segMs, timestampColumn = Some("ts"))
    val m = store.manifest

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // ---- build: `entries` records, 1000 per segment, pk-ranged stats
    val (_, tBuild) = timed {
      (0 until entries).grouped(50000).foreach { g =>
        m.update(g.toSeq.map { i =>
          val seg = i / perSegment
          val lo = seg * segMs + (i % perSegment) * (segMs / perSegment)
          SstFile(i + 1L, s"$root/data/sst_$i.parquet",
            numRows = 10000, sizeBytes = 64L << 20,
            timeRange = TimeRange(lo, lo + segMs / perSegment),
            stats = Map("pk" -> (i.toLong * 1000L, i.toLong * 1000L + 999L)))
        })
      }
      m.mergeSnapshot()
    }
    println(f"[manifest] build+merge of $entries entries: $tBuild%.1f s")

    // ---- cold load (the restart cost) + memory footprint
    System.gc()
    val rt = Runtime.getRuntime
    val memBefore = rt.totalMemory() - rt.freeMemory()
    val (m2, tLoad) = timed(new Manifest(root,
      conf = spark.sessionState.newHadoopConf()))
    System.gc()
    val memAfter = rt.totalMemory() - rt.freeMemory()
    println(f"[manifest] cold load: $tLoad%.2f s, entries=${m2.allSsts().size}, " +
      f"approx heap delta=${(memAfter - memBefore) / 1e6}%.0f MB")

    // ---- driver-side prunes (median of 5)
    val seg = entries / perSegment / 2 // a middle segment
    val range = TimeRange(seg * segMs, (seg + 1) * segMs)
    def median5(body: => Int): (Int, Double) = {
      val runs = (1 to 5).map(_ => timed(body))
      (runs.head._1, runs.map(_._2).sorted.apply(2))
    }
    val (nRange, tRange) = median5(m2.findSsts(range).size)
    println(f"[manifest] findSsts(1 segment): $nRange files in $tRange%.3f s")
    val probePk = (seg.toLong * perSegment + 500L) * 1000L + 5L
    val (nZone, tZone) = median5(store.plannedSsts(ScanRequest(range = range,
      predicates = Seq(col("pk") === probePk))).size)
    println(f"[manifest] plannedSsts(range + pk zone bound): " +
      f"$nZone files in $tZone%.3f s")

    // ---- parquet-snapshot fallback: DataFrame-side prune, same answer
    val (pq, tWrite) = timed(m2.writeParquetSnapshot(spark))
    val ((planned, tDf), _) = timed {
      timed {
        spark.read.parquet(pq)
          .where(col("start") < lit(range.end) && col("end") > lit(range.start))
          .select("jsonl").collect()
          .map(r => m2.parseSnapshotLine(r.getString(0)))
      }
    }
    println(f"[manifest] parquet snapshot: write $tWrite%.1f s, " +
      f"DataFrame range prune ${planned.length} files in $tDf%.2f s")
    val driverSet = m2.findSsts(range).map(_.path).toSet
    require(planned.map(_.path).toSet == driverSet,
      s"fallback prune diverges: ${planned.length} vs ${driverSet.size}")
    // parsed entries keep their zone stats (lossless jsonl round-trip)
    require(planned.forall(_.stats.contains("pk")), "stats lost in round-trip")
    println(s"[manifest] fallback prune == driver prune (${driverSet.size} files), " +
      "stats survive the round-trip")
    spark.stop()
  }
}
