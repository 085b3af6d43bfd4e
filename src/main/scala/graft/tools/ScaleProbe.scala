package graft.tools

/** Scaling probe: time named SparkEntry queries against one or more data
  * dirs (e.g. an sf dir and its `SparkEntry.synthesizeScaled` 10× copy)
  * and print per-(query, dir) wall seconds — the dev-loop companion to
  * Bench's sf1 lane for triaging a super-linear `sf1_scaling` entry in
  * isolation, without the full suite around it.
  *
  * Usage: runMain graft.tools.ScaleProbe <dir>[,<dir>...] <query>[,...]
  * Each query gets one untimed warmup per dir (builds the per-dir fixture
  * caches — IVF index, engine stores — exactly like Bench's protocol).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirs = args(0).split(',').toSeq
    val names = args(1).split(',').toSeq
    val spark = graft.GraftSession.create(32)
    for (dir <- dirs; q <- names) {
      val fn = graft.SparkEntry.queries(q)
      try fn(spark, dir).count()
      catch { case e: Throwable =>
        println(s"[probe] $q $dir warmup FAILED: ${e.getMessage}") }
      val t0 = System.nanoTime()
      // guard the timed run too: one failing (dir, query) combo must not
      // abort the remaining combos (or skip spark.stop())
      try {
        val n = fn(spark, dir).count()
        println(f"[probe] $q $dir rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
      } catch { case e: Throwable =>
        println(s"[probe] $q $dir FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
