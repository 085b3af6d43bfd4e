package graft.tools

/** Scaling probe: time named SparkEntry queries against one or more data
  * dirs (e.g. an sf dir and its `SparkEntry.synthesizeScaled` 10× copy)
  * and print per-(query, dir) wall seconds — the dev-loop companion to
  * Bench's sf1 lane for triaging a super-linear `sf1_scaling` entry in
  * isolation, without the full suite around it.
  *
  * Usage: runMain graft.tools.ScaleProbe <dir>[,<dir>...] <query>[,...]
  * A dir spec `scaled10x:<srcDir>` synthesizes (or reuses — the marker
  * fingerprint decides) the bench lane's 10× corpus for that source and
  * probes against it. Each dir gets one SparkEntry.prewarm plus one
  * untimed warmup per query (builds the per-dir fixture caches — IVF
  * index, engine stores — exactly like Bench's protocol).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirSpecs = args(0).split(',').toSeq
    val names = args(1).split(',').toSeq
    val spark = graft.GraftSession.create(32)
    // scaled10x: specs resolve through the ONE shared definition so the
    // probe measures exactly the corpus the bench lane uses; one bad spec
    // (missing source dir) must not abort the remaining specs or skip
    // spark.stop(), same contract as the per-combo guards below
    val dirs = dirSpecs.flatMap { d =>
      try Some(graft.SparkEntry.resolveScaledSpec(spark, d))
      catch { case e: Throwable =>
        println(s"[probe] dir spec $d FAILED to resolve: ${e.getMessage}")
        None
      }
    }
    dirs.foreach(d =>
      try graft.SparkEntry.prewarm(spark, d)
      catch { case e: Throwable =>
        println(s"[probe] prewarm $d FAILED: ${e.getMessage}") })
    for (dir <- dirs; q <- names) {
      // a renamed/unknown query name must not abort the remaining combos
      // (or skip spark.stop()) — same guard as the failing-run arms below
      graft.SparkEntry.queries.get(q) match {
        case None => println(s"[probe] $q UNKNOWN query name — skipped")
        case Some(fn) =>
          try fn(spark, dir).count()
          catch { case e: Throwable =>
            println(s"[probe] $q $dir warmup FAILED: ${e.getMessage}") }
          val t0 = System.nanoTime()
          // guard the timed run too: one failing (dir, query) combo must
          // not abort the remaining combos (or skip spark.stop())
          try {
            val n = fn(spark, dir).count()
            println(f"[probe] $q $dir rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
          } catch { case e: Throwable =>
            println(s"[probe] $q $dir FAILED: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
