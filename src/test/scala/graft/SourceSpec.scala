package graft

import java.nio.file.Files

import org.apache.spark.sql.{Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage._

/** The `graft` SQL data source: create/append through
  * `df.write.format("graft")`, read through `spark.read.format("graft")`
  * and `CREATE TEMPORARY VIEW ... USING graft`, with pushdown reaching the
  * store (file pruning before task launch) and merge-on-read semantics
  * identical to the programmatic API. */
class SourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val schema = StructType(Seq(
    StructField("pk", IntegerType), StructField("tms", LongType),
    StructField("v", LongType)))

  private def df(rows: Seq[(Int, Long, Long)]) =
    spark.createDataFrame(spark.sparkContext.parallelize(
      rows.map(r => Row(r._1, r._2, r._3)), 2), schema)

  private def tmpRoot() = Files.createTempDirectory("graft-source").toString

  test("write format(graft) creates the table from options; read format " +
      "attaches with zero config; SQL view + pushdown + merge semantics") {
    val root = tmpRoot()
    // create: 2 segments' worth of rows through the SQL write edge
    df(Seq((1, 100L, 10L), (2, 150L, 20L), (3, 1100L, 30L)))
      .write.format("graft")
      .option("root", root).option("numPrimaryKeys", "1")
      .option("segmentMs", "1000").option("timestampColumn", "tms")
      .mode(SaveMode.ErrorIfExists).save()
    // append an overwrite of pk=1 (newer __seq__ must win on read)
    df(Seq((1, 120L, 11L))).write.format("graft")
      .option("root", root).mode(SaveMode.Append).save()

    // the store on disk: per-segment SSTs, descriptor persisted
    val store = TimeMergeStorage.open(spark, root)
    assert(store.segmentMs == 1000L && store.timestampColumn.contains("tms"))
    assert(store.manifest.allSsts().size == 3) // seg0, seg1, seg0-append

    // zero-config read, merge-on-read result
    val got = spark.read.format("graft").option("root", root).load()
      .orderBy("pk").collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(got.toSeq == Seq((1, 11L), (2, 20L), (3, 30L)))

    // SQL: CREATE TEMPORARY VIEW ... USING graft (short name via
    // DataSourceRegister), aggregate over it
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW src_t USING graft OPTIONS (root '$root')")
    assert(spark.sql("SELECT sum(v) FROM src_t").collect()(0).getLong(0) == 61L)
    assert(spark.sql("SELECT count(*) FROM src_t").collect()(0).getLong(0) == 3L)

    // filter pushdown is visible in the plan (DSv1 PushedFilters) and the
    // time-range conjunct prunes manifest files BEFORE any task launches
    val q = spark.read.format("graft").option("root", root).load()
      .filter(col("tms") >= 1000L && col("pk") > 0)
    assert(q.collect().map(_.getInt(0)).toSeq == Seq(3))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"),
      s"no pushdown in plan:\n$plan")
    assert(store.plannedSsts(ScanRequest(range = TimeRange(1000L, Long.MaxValue)))
      .size == 1) // 2 of 3 files pruned by the manifest

    // projection pruning: a single-column read returns just that column
    val one = spark.read.format("graft").option("root", root).load().select("v")
    assert(one.columns.toSeq == Seq("v"))
    assert(one.collect().map(_.getLong(0)).sorted.toSeq == Seq(11L, 20L, 30L))
  }

  test("source guards: overwrite rejected, ErrorIfExists respected, " +
      "Ignore no-ops, missing options explain themselves") {
    val root = tmpRoot()
    val d = df(Seq((1, 10L, 1L)))
    intercept[RuntimeException](d.write.format("graft")
      .option("root", root).mode(SaveMode.Overwrite).save())
    // create without numPrimaryKeys → clear error
    val e = intercept[RuntimeException](d.write.format("graft")
      .option("root", root).option("segmentMs", "1000")
      .mode(SaveMode.Append).save())
    assert(e.getMessage.contains("numPrimaryKeys"))
    d.write.format("graft").option("root", root)
      .option("numPrimaryKeys", "1").option("segmentMs", "1000")
      .option("timestampColumn", "tms").mode(SaveMode.Append).save()
    intercept[RuntimeException](d.write.format("graft")
      .option("root", root).mode(SaveMode.ErrorIfExists).save())
    d.write.format("graft").option("root", root)
      .mode(SaveMode.Ignore).save() // no-op, no error
    assert(spark.read.format("graft").option("root", root).load().count() == 1)
    // reading a non-table root explains itself
    val e2 = intercept[RuntimeException](
      spark.read.format("graft").option("root", tmpRoot()).load())
    assert(e2.getMessage.contains("descriptor"))
    // a null timestamp has no segment: rejected with a clear message,
    // never an NPE or a silently dropped row
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(9, null, 9L)), 1), schema)
    val e3 = intercept[Exception](withNull.write.format("graft")
      .option("root", root).mode(SaveMode.Append).save())
    assert(e3.getMessage.contains("null tms"), s"got: ${e3.getMessage}")
    // unrepresentable / contradictory time bounds neither crash nor
    // mis-prune: equality at Long.MaxValue and an empty conjunct range
    val t = spark.read.format("graft").option("root", root).load()
    assert(t.filter(col("tms") === Long.MaxValue).count() == 0)
    assert(t.filter(col("tms") > Long.MaxValue).count() == 0)
    assert(t.filter(col("tms") >= 100L && col("tms") < 50L).count() == 0)
    assert(t.filter(col("tms") >= 10L && col("tms") <= 10L).count() == 1)
  }

  test("appending a widened frame evolves the table schema; old rows read " +
      "null for the new column; illegal evolution still rejected") {
    val root = tmpRoot()
    df(Seq((1, 100L, 10L), (2, 150L, 20L))).write.format("graft")
      .option("root", root).option("numPrimaryKeys", "1")
      .option("segmentMs", "1000").option("timestampColumn", "tms")
      .mode(SaveMode.Append).save()
    // append with an extra column → table widens (descriptor updated)
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(3, 200L, 30L, "new")), 1),
      StructType(schema.fields :+ StructField("tag", StringType)))
      .write.format("graft").option("root", root)
      .mode(SaveMode.Append).save()
    val got = spark.read.format("graft").option("root", root).load()
      .orderBy("pk").collect()
      .map(r => (r.getInt(0), r.getLong(2), if (r.isNullAt(3)) null else r.getString(3)))
    assert(got.toSeq == Seq((1, 10L, null), (2, 20L, null), (3, 30L, "new")))
    assert(TimeMergeStorage.open(spark, root).schema.userSchema.fieldNames
      .last == "tag")
    // the complement: an old producer (no tag column) keeps appending —
    // absent nullable value columns null-fill
    df(Seq((4, 300L, 40L))).write.format("graft").option("root", root)
      .mode(SaveMode.Append).save()
    assert(spark.read.format("graft").option("root", root).load()
      .filter(col("pk") === 4).collect().map(_.isNullAt(3)).toSeq == Seq(true))
    // a RETYPED column is an illegal evolution, not a widen
    val bad = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(4, 300L, "oops")), 1),
      StructType(Seq(StructField("pk", IntegerType),
        StructField("tms", LongType), StructField("v", StringType))))
    val e = intercept[Exception](bad.write.format("graft")
      .option("root", root).mode(SaveMode.Append).save())
    assert(e.getMessage.contains("write batch column v"),
      s"wrong failure: ${e.getMessage}")
  }

  test("time travel and tombstone filtering through SQL options") {
    val root = tmpRoot()
    val tsSchema = StructType(Seq(
      StructField("pk", IntegerType), StructField("tms", LongType),
      StructField("v", LongType), StructField("deleted", BooleanType)))
    def w(rows: Seq[(Int, Long, Long, Boolean)]) = spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => Row(r._1, r._2, r._3, r._4)), 1), tsSchema)
      .write.format("graft").option("root", root)
      .option("numPrimaryKeys", "1").option("segmentMs", "1000")
      .option("timestampColumn", "tms").mode(SaveMode.Append).save()
    w(Seq((1, 10L, 10L, false), (2, 20L, 20L, false)))
    val gen1 = TimeMergeStorage.open(spark, root).manifest.maxSstId
    w(Seq((1, 30L, 11L, false), (3, 40L, 30L, false))) // overwrite + insert
    w(Seq((2, 50L, 0L, true)))                          // delete pk 2

    val current = spark.read.format("graft").option("root", root).load()
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(current == Map(1 -> 11L, 2 -> 0L, 3 -> 30L))
    // asOf the first write: later overwrite/insert/delete invisible
    val asOf = spark.read.format("graft").option("root", root)
      .option("asOf", gen1.toString).load()
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(asOf == Map(1 -> 10L, 2 -> 20L))
    // tombstone-filtered view drops the deleted pk; works from SQL too
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW src_live USING graft " +
      s"OPTIONS (root '$root', excludeTombstones 'deleted')")
    assert(spark.sql("SELECT pk FROM src_live ORDER BY pk").collect()
      .map(_.getInt(0)).toSeq == Seq(1, 3))
    // the two options are mutually exclusive by design
    intercept[Exception](spark.read.format("graft").option("root", root)
      .option("asOf", "1").option("excludeTombstones", "deleted").load())
  }

  test("SQL filters on value columns see MERGED rows only: stale versions " +
      "and deleted pks never resurrect through pushdown") {
    val root = tmpRoot()
    // pk=1 written v=3, then overwritten v=5; tms is a VALUE column here
    df(Seq((1, 100L, 3L), (2, 200L, 30L))).write.format("graft")
      .option("root", root).option("numPrimaryKeys", "1")
      .option("segmentMs", "1000").option("timestampColumn", "tms")
      .mode(SaveMode.Append).save()
    df(Seq((1, 120L, 5L))).write.format("graft")
      .option("root", root).mode(SaveMode.Append).save()
    val t = spark.read.format("graft").option("root", root).load()
    // the filter matches only the SHADOWED version → zero rows, not the
    // stale row (unhandledFilters declares these handled, so Spark will
    // not re-filter above the scan — the scan itself must be post-merge)
    assert(t.filter(col("v") === 3L).count() == 0)
    assert(t.filter(col("v") === 5L).collect().map(_.getInt(0)).toSeq == Seq(1))
    // value-column timestamp: a range filter matching only the old version
    // of pk=1 must NOT resurrect it (file pruning is gated on ts ∈ pks)
    assert(t.filter(col("tms") < 110L).count() == 0)
    assert(t.filter(col("tms") >= 110L).collect()
      .map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
    // deleted pk stays deleted even when the filter matches only its
    // pre-delete version
    val root2 = tmpRoot()
    val tsSchema = StructType(Seq(
      StructField("pk", IntegerType), StructField("tms", LongType),
      StructField("v", LongType), StructField("deleted", BooleanType)))
    def w2(rows: Seq[(Int, Long, Long, Boolean)]) = spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => Row(r._1, r._2, r._3, r._4)), 1), tsSchema)
      .write.format("graft").option("root", root2)
      .option("numPrimaryKeys", "1").option("segmentMs", "1000")
      .option("timestampColumn", "tms").mode(SaveMode.Append).save()
    w2(Seq((1, 10L, 10L, false)))
    w2(Seq((1, 20L, 0L, true))) // tombstone pk 1
    val live = spark.read.format("graft").option("root", root2)
      .option("excludeTombstones", "deleted").load()
    assert(live.count() == 0)
    assert(live.filter(col("v") === 10L).count() == 0,
      "filter on the pre-delete version resurrected a tombstoned pk")
  }

  test("writeStream.format(graft): micro-batches commit as SSTs, restarts " +
      "resume from the checkpoint, batch re-delivery is skipped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpRoot()
    val ckpt = tmpRoot()
    val mem = MemoryStream[(Int, Long, Long)]
    def start() = mem.toDF().toDF("pk", "tms", "v")
      .writeStream.format("graft")
      .option("root", root).option("numPrimaryKeys", "1")
      .option("segmentMs", "1000").option("timestampColumn", "tms")
      .option("checkpointLocation", ckpt)
      .start()
    val q = start()
    mem.addData((1, 100L, 10L), (2, 150L, 20L))
    q.processAllAvailable()
    mem.addData((1, 120L, 11L)) // overwrite pk 1 in a later micro-batch
    q.processAllAvailable()
    q.stop()
    def readBack() = spark.read.format("graft").option("root", root).load()
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(readBack() == Map(1 -> 11L, 2 -> 20L))
    // the high-water mark advanced with the last batch
    val store = TimeMergeStorage.open(spark, root)
    assert(store.exists(root + "/manifest/sink-commit.txt"))
    val before = store.manifest.allSsts().size
    // restart from the SAME checkpoint: stream resumes, new data commits,
    // nothing is double-applied
    val q2 = start()
    mem.addData((3, 200L, 30L))
    q2.processAllAvailable()
    q2.stop()
    assert(readBack() == Map(1 -> 11L, 2 -> 20L, 3 -> 30L))
    assert(TimeMergeStorage.open(spark, root).manifest.allSsts().size == before + 1)
  }

  test("SQL INSERT INTO a graft view appends through the table path; " +
      "OVERWRITE and read-only views reject") {
    val root = tmpRoot()
    df(Seq((1, 100L, 10L), (2, 150L, 20L))).write.format("graft")
      .option("root", root).option("numPrimaryKeys", "1")
      .option("segmentMs", "1000").option("timestampColumn", "tms")
      .mode(SaveMode.Append).save()
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW ins_t USING graft OPTIONS (root '$root')")
    // plain insert: new pk + an overwrite of pk 1 (newer __seq__ wins)
    spark.sql("INSERT INTO ins_t VALUES (3, 200L, 30L), (1, 120L, 11L)")
    val got = spark.sql("SELECT pk, v FROM ins_t ORDER BY pk").collect()
      .map(r => r.getInt(0) -> r.getLong(2 - 1)).toMap
    assert(got == Map(1 -> 11L, 2 -> 20L, 3 -> 30L))
    // INSERT OVERWRITE is the truncation shape: rejected
    intercept[Exception](
      spark.sql("INSERT OVERWRITE TABLE ins_t VALUES (9, 900L, 90L)"))
    // read-only views reject inserts
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW ins_hist USING graft " +
      s"OPTIONS (root '$root', asOf '1')")
    intercept[Exception](
      spark.sql("INSERT INTO ins_hist VALUES (9, 900L, 90L)"))
    // INSERT into a BUCKETED table keeps the pk-hash layout (bucket ids
    // inferred from the manifest, never bucket=-1 strays)
    val broot = tmpRoot()
    df((1 to 50).map(i => (i, 100L, i.toLong))).write.format("graft")
      .option("root", broot).option("numPrimaryKeys", "1")
      .option("segmentMs", "1000").option("timestampColumn", "tms")
      .option("buckets", "4").mode(SaveMode.Append).save()
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW ins_b USING graft OPTIONS (root '$broot')")
    spark.sql("INSERT INTO ins_b VALUES (99, 150L, 990L)")
    val store = TimeMergeStorage.open(spark, broot)
    assert(store.manifest.allSsts().forall(_.bucket >= 0),
      "INSERT broke the bucketed layout")
    assert(spark.sql("SELECT v FROM ins_b WHERE pk = 99").collect()
      .map(_.getLong(0)).toSeq == Seq(990L))
  }

  test("sink compactEvery bounds the SST count of a long-running stream " +
      "and preserves merge results") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpRoot()
    val mem = MemoryStream[(Int, Long, Long)]
    val q = mem.toDF().toDF("pk", "tms", "v")
      .writeStream.format("graft")
      .option("root", root).option("numPrimaryKeys", "1")
      .option("segmentMs", "1000000").option("timestampColumn", "tms")
      .option("compactEvery", "3")
      .option("checkpointLocation", tmpRoot())
      .start()
    try {
      // 9 micro-batches into one segment: 9 SSTs without compaction;
      // compactEvery=3 keeps draining them (default picker min is 5 input
      // files, so passes fire once enough accumulate)
      (1 to 9).foreach { i =>
        mem.addData((i, 100L + i, i.toLong), (1, 200L + i, 100L + i))
        q.processAllAvailable()
      }
    } finally q.stop()
    val store = TimeMergeStorage.open(spark, root)
    assert(store.manifest.allSsts().size < 9,
      s"compaction never fired: ${store.manifest.allSsts().size} SSTs")
    val got = spark.read.format("graft").option("root", root).load()
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    // pk=1 repeatedly overwritten: newest write (batch 9) wins
    assert(got(1) == 109L)
    assert((2 to 9).forall(i => got(i) == i.toLong))
  }

  test("sink ttlMs drops whole expired segments through the in-line " +
      "compaction passes (streaming retention)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpRoot()
    val now = System.currentTimeMillis()
    val mem = MemoryStream[(Int, Long, Long)]
    val q = mem.toDF().toDF("pk", "tms", "v")
      .writeStream.format("graft")
      .option("root", root).option("numPrimaryKeys", "1")
      .option("segmentMs", "3600000").option("timestampColumn", "tms")
      .option("compactEvery", "1").option("ttlMs", (24L * 3600000L).toString)
      .option("checkpointLocation", tmpRoot())
      .start()
    try {
      // batch 1: ancient rows (10 days old — far past the 1-day TTL)
      mem.addData((1, now - 10L * 86400000L, 10L))
      q.processAllAvailable()
      // batch 2: fresh rows; its compaction pass expires the old segment
      mem.addData((2, now, 20L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.format("graft").option("root", root).load()
      .collect().map(_.getInt(0)).toSet
    assert(got == Set(2), s"expired segment survived: $got")
  }

  test("graft sink in update mode upserts re-emitted aggregate rows into a " +
      "last-write-wins table; append-mode tables reject update output") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpRoot()
    val mem = MemoryStream[Int]
    val q = mem.toDF().toDF("k").groupBy("k")
      .agg(count(lit(1)).as("n"))
      .writeStream.format("graft").outputMode("update")
      .option("root", root).option("numPrimaryKeys", "1")
      .option("segmentMs", "1000")
      .option("checkpointLocation", tmpRoot())
      .start()
    mem.addData(1, 1, 2)
    q.processAllAvailable()
    mem.addData(1) // k=1 re-emitted with n=3; k=2 unchanged, not re-emitted
    q.processAllAvailable()
    q.stop()
    val got = spark.read.format("graft").option("root", root).load()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(1 -> 3L, 2 -> 1L))

    // an Append-MODE table would concatenate re-emissions: rejected
    val root2 = tmpRoot()
    df(Seq((1, 10L, 1L))).write.format("graft")
      .option("root", root2).option("numPrimaryKeys", "1")
      .option("segmentMs", "1000").option("updateMode", "append")
      .mode(SaveMode.Append).save()
    val mem2 = MemoryStream[Int]
    val bad = mem2.toDF().toDF("pk").groupBy("pk")
      .agg(max(lit(1L)).as("tms"), count(lit(1)).as("v"))
      .writeStream.format("graft").outputMode("update")
      .option("root", root2)
      .option("checkpointLocation", tmpRoot())
      .start()
    mem2.addData(7)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      bad.processAllAvailable()
    }
    assert(e.getMessage.contains("Append-mode") ||
      Option(e.getCause).exists(_.getMessage.contains("Append-mode")))
    bad.stop()
  }

  test("bucketed SQL writes produce the 100 TB layout and read back merged") {
    val root = tmpRoot()
    val rows = (1 to 200).map(i => (i, (i % 3) * 1000L, i.toLong))
    df(rows).write.format("graft")
      .option("root", root).option("numPrimaryKeys", "1")
      .option("segmentMs", "1000").option("timestampColumn", "tms")
      .option("buckets", "4").mode(SaveMode.Append).save()
    val store = TimeMergeStorage.open(spark, root)
    assert(store.manifest.allSsts().forall(_.bucket >= 0))
    assert(spark.read.format("graft").option("root", root).load().count() == 200)
  }

  test("bucket layout is a persisted TABLE property: optionless appends " +
      "keep it even when the top bucket was empty; a conflicting buckets " +
      "option rejects") {
    val root = tmpRoot()
    // one row: only ONE of the 4 buckets gets a file — the old
    // max(observed)+1 inference would silently re-hash later appends
    df(Seq((1, 100L, 10L))).write.format("graft")
      .option("root", root).option("numPrimaryKeys", "1")
      .option("segmentMs", "1000").option("timestampColumn", "tms")
      .option("buckets", "4").mode(SaveMode.Append).save()
    val store = TimeMergeStorage.open(spark, root)
    assert(store.storeFs.readLines(
      store.storeFs.path("manifest", "buckets.txt")) == Seq("4"))
    // optionless append keeps the 4-bucket layout
    df(Seq((2, 110L, 20L))).write.format("graft")
      .option("root", root).mode(SaveMode.Append).save()
    // a conflicting layout is physical — rejected, never silently mixed
    val e = intercept[Exception] {
      df(Seq((3, 120L, 30L))).write.format("graft")
        .option("root", root).option("buckets", "2")
        .mode(SaveMode.Append).save()
    }
    assert(e.getMessage.contains("persisted bucket layout"), e.getMessage)
  }

  test("a batch column differing only in CASE from a table column is " +
      "rejected, not silently widened into an unreadable table") {
    val root = tmpRoot()
    df(Seq((1, 100L, 10L))).write.format("graft")
      .option("root", root).option("numPrimaryKeys", "1")
      .option("segmentMs", "1000").option("timestampColumn", "tms")
      .mode(SaveMode.Append).save()
    val cased = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(2, 110L, 20L)), 1),
      StructType(Seq(StructField("pk", IntegerType),
        StructField("tms", LongType), StructField("V", LongType))))
    val e = intercept[Exception] {
      cased.write.format("graft").option("root", root)
        .mode(SaveMode.Append).save()
    }
    assert(e.getMessage.contains("differs only in CASE"), e.getMessage)
  }

  test("pushed filters on a DOTTED column name resolve the column, not a " +
      "struct path") {
    val root = tmpRoot()
    val dotted = StructType(Seq(StructField("pk", IntegerType),
      StructField("tms", LongType), StructField("a.b", LongType)))
    spark.createDataFrame(spark.sparkContext.parallelize(
        Seq(Row(1, 100L, 5L), Row(2, 110L, 7L)), 1), dotted)
      .write.format("graft")
      .option("root", root).option("numPrimaryKeys", "1")
      .option("segmentMs", "1000").option("timestampColumn", "tms")
      .mode(SaveMode.Append).save()
    val got = spark.read.format("graft").option("root", root).load()
      .filter(col("`a.b`") === 7L).collect()
    assert(got.map(_.getInt(0)).toSeq == Seq(2), got.mkString(";"))
  }
}
