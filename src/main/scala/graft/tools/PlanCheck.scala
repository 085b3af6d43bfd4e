package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Prints formatted physical plans for selected queries so pushdown/broadcast
  * behavior can be eyeballed (the analog of the reference's golden-plan test
  * read.rs:575-617). Run: `sbt "runMain graft.tools.PlanCheck [names...]"` */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("s1_project_filter", "q3_revenue", "j1_label_semijoin")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}
