package graft.tools

import org.apache.spark.sql.functions._

import graft.storage._

/** Zone-map pruning probe: builds a store of many sequential-pk SSTs (the
  * natural shape of an append-mostly ingest: each batch covers a narrow,
  * advancing key range), then measures planning-time file pruning and the
  * end-to-end scan cost with vs without the zone maps for a narrow
  * pk-range query. */
object ZoneProbe {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(100)
    val rowsPerFile = args.lift(1).map(_.toInt).getOrElse(20000)
    val spark = graft.GraftSession.create()
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("pk", LongType),
      StructField("payload", StringType)))
    val store = new TimeMergeStorage(spark,
      java.nio.file.Files.createTempDirectory("graft-zoneprobe").toString,
      StorageSchema(schema, numPrimaryKeys = 1), segmentMs = 1L << 40)
    val t0 = System.nanoTime()
    (0 until nFiles).foreach { i =>
      val base = i.toLong * rowsPerFile
      store.write(spark.range(base, base + rowsPerFile)
        .select(col("id").as("pk"),
          concat(lit("payload-"), col("id")).as("payload")),
        TimeRange(1, 2))
    }
    println(f"[zone] wrote $nFiles files x $rowsPerFile rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val lo = nFiles / 2L * rowsPerFile
    val pred = col("pk") >= lo && col("pk") < lo + rowsPerFile
    val req = ScanRequest(predicates = Seq(pred))
    val planned = store.plannedSsts(req)
    println(s"[zone] planning: ${planned.size} of $nFiles files survive the pk range")
    def timed(what: String)(f: => Long): Unit = {
      val s0 = System.nanoTime()
      val n = f
      println(f"[zone] $what%-28s rows=$n ${(System.nanoTime() - s0) / 1e9}%6.2f s")
    }
    // Same read path both sides (bare filtered read, no merge) — the delta
    // is exactly what planning-time file pruning saves: task scheduling +
    // file open + footer decode for files no row of which can match.
    def read(files: Seq[SstFile]) = spark.read
      .schema(store.schema.fullSchema).parquet(files.map(_.path): _*)
      .filter(pred)
    timed("read PRUNED file list")(read(planned).count())
    timed("read ALL files")(read(store.manifest.allSsts()).count())
    spark.stop()
  }
}
