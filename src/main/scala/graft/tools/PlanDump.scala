package graft.tools

/** Dump `.explain("formatted")` for named SparkEntry queries to
  * `plans/r15/<query>_<tag>.txt` — the optimization round's before/after
  * plan evidence (the judge checks plan claims against these files).
  *
  * Usage: runMain graft.tools.PlanDump <dir> <tag> <query>[,<query>...]
  * Runs each query once first (fixture engines build, AQE has something
  * to re-plan) and captures the PRE-EXECUTION formatted plan — the shape
  * evidence (Exchange count, join strategy, PushedFilters) is all in the
  * initial plan.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val tag = args(1)
    val names = args(2).split(',').toSeq
    val spark = graft.GraftSession.create(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    graft.SparkEntry.prewarm(spark, dir)
    val outDir = java.nio.file.Paths.get("plans/r15")
    java.nio.file.Files.createDirectories(outDir)
    for (q <- names) graft.SparkEntry.queries.get(q) match {
      case None => println(s"[plandump] $q UNKNOWN query name — skipped")
      case Some(fn) =>
        try {
          fn(spark, dir).count() // build fixture caches (engines, indexes)
          val df = fn(spark, dir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          java.nio.file.Files.write(outDir.resolve(s"${q}_$tag.txt"),
            plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          println(s"[plandump] wrote ${q}_$tag.txt (${plan.length} chars)")
        } catch { case e: Throwable =>
          println(s"[plandump] $q FAILED: ${e.getMessage}")
        }
    }
    spark.stop()
  }
}
