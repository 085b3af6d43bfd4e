package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.storage._

/** Cross-JVM reopen drive: run once to seed, run again (new JVM) to overwrite
  * the same pk — last-write-wins must survive the restart (id monotonicity).
  * Run: `sbt "runMain graft.tools.ReopenCheck /tmp/somedir"` twice. */
object ReopenCheck {
  def main(args: Array[String]): Unit = {
    val root = args.head
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val schema = StructType(Seq(
      StructField("pk", IntegerType), StructField("value", LongType)))
    val store = new TimeMergeStorage(spark, root, StorageSchema(schema, 1), 1000L)
    val gen = store.manifest.allSsts().size
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1, (gen + 1).toLong)), 1), schema)
    store.write(df, TimeRange(0, 1000))
    val ids = store.manifest.allSsts().map(_.id).sorted
    val got = store.scan().collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    println(s"[reopen] generation=${gen + 1} ids=$ids scan=$got monotonic=${ids == ids.sorted && ids.distinct.size == ids.size}")
    assert(got == Seq((1, (gen + 1).toLong)), s"stale value won: $got")
    println("[reopen] OK — newest generation wins")
    spark.stop()
  }
}
