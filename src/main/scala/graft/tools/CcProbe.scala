package graft.tools

import org.apache.spark.sql.functions._

/** Clustering-stage probe (optimization rounds): over the c2 composite's
  * real candidate-pair graph, time `boundedTwoHopClosure(passes) +
  * duplicateClusters(compressPaths)` for several (passes, compress)
  * combinations — the closure pass count trades one cheap edge-set action
  * against whole connected-components rounds (each round is 2-3
  * query-stage jobs plus a driver sync), so the right default is an
  * empirical question. Also asserts every variant produces the SAME
  * cluster assignment (components are exactly preserved by closure;
  * compression accelerates the same fixpoint).
  *
  * Usage: runMain graft.tools.CcProbe <dir>
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.create(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val pairs = graft.pipeline.Similarity.lshNearDupPairs(
        emb, "vec_id", "embedding", dim = 64, threshold = 0.3, bits = -1)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint() // pin the pair graph so variants time ONLY clustering
    println(s"[ccprobe] pairs=${pairs.count()}")
    val variants = Seq((1, false), (2, false), (3, false), (4, false),
      (2, true), (3, true))
    var reference: Map[Long, Long] = null
    for ((passes, compress) <- variants) {
      def run() = graft.pipeline.Dedup.duplicateClusters(
        graft.pipeline.Dedup.boundedTwoHopClosure(pairs, passes = passes),
        compressPaths = compress)
      try {
        run().count() // warm
        val t0 = System.nanoTime()
        val n = run().count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[ccprobe] passes=$passes compress=$compress " +
          f"time=$secs%.2f s rows=$n")
        val got = run().collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        if (reference == null) reference = got
        else if (got != reference)
          println(s"[ccprobe] passes=$passes compress=$compress " +
            "CLUSTERS DIFFER from the first variant — NOT result-safe")
      } catch { case e: Throwable =>
        println(s"[ccprobe] passes=$passes compress=$compress FAILED: $e")
      }
    }
    spark.stop()
  }
}
