package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.GraftSession
import graft.storage._

/** Drives GraftSession + non-default WriteOptions: zstd, dictionary on,
  * bloom filter on pk1. Prints the SST path so the parquet footer can be
  * inspected. Run: `sbt "runMain graft.tools.OptionsSmoke"` */
object OptionsSmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(cores = 4)
    // the driver's t1 smoke contract: entry(spark) returns rows > 0
    println(s"[opts] entry rows=${graft.SparkEntry.entry(spark).count()}")
    val tables = GraftSession.registerTables(spark, "/root/testdata/sf0.001")
    println(s"[opts] registered views: ${tables.mkString(",")}")
    println("[opts] sql over view: " +
      spark.sql("SELECT count(*) FROM lineitem").collect()(0).getLong(0))
    println("[opts] sql float_dot via extensions: " +
      spark.sql("""SELECT round(float_dot(
                     cast(array(1.0, 2.0, 3.0) as array<float>),
                     cast(array(4.0, 5.0, 6.0) as array<float>)), 1)""")
        .collect()(0).getDouble(0)) // 4+10+18 = 32.0
    // probes: wrong arity and wrong element type must fail cleanly
    def expectFail(sql: String): String =
      try { spark.sql(sql).collect(); "ACCEPTED (BUG)" }
      catch { case e: Exception => e.getMessage.linesIterator.next().take(70) }
    println("[opts] probe arity: " + expectFail("SELECT float_dot(array(1.0f))"))
    println("[opts] probe types: " + expectFail(
      "SELECT float_dot(array(1.0, 2.0), array(3.0, 4.0))"))

    val schema = StructType(Seq(
      StructField("pk1", IntegerType), StructField("v", LongType)))
    val store = new TimeMergeStorage(spark,
      Files.createTempDirectory("graft-opts").toString,
      StorageSchema(schema, 1), segmentMs = 1000L,
      writeOptions = WriteOptions(compression = "zstd", enableDictionary = true,
        bloomFilterColumns = Seq("pk1")))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(
      (1 to 500).map(i => Row(i % 37, i.toLong)), 2), schema)
    val sst = store.write(df, TimeRange(0, 1000))
    println(s"[opts] sst=${sst.path} rows=${sst.numRows}")
    println(s"[opts] scan rows=${store.scan().count()}")
    spark.stop()
  }
}
