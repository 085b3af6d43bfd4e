package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge frames — the curation-side graph
  * pass (PageRank-style centrality over a document-similarity graph is a
  * standard data-selection signal; the duplicate-cluster components in
  * [[Dedup.duplicateClusters]] are the other iterative graph op here).
  */
object Graphs {

  /** Fixed-point integer PageRank: ranks carry `unit` micro-rank units
    * (10^12 default) and every operation is exact integer arithmetic —
    * `contribution = rank * dampingPct div 100 div outdeg` with floor
    * division — so the result is bit-identical in any engine (the reason
    * large-scale PageRank implementations run fixed-point: float summation
    * order is nondeterministic across partitionings). Division remainders
    * (< outdeg micro-units per edge) and dangling-node mass leak out of
    * the system; with unit = 10^12 the drift is ~10^-10 relative — noise
    * for ranking purposes, and identically computed everywhere.
    *
    * Runs a FIXED iteration count (deterministic output, no float
    * convergence test). Scale shape per iteration: one src-keyed join to
    * ship ranks onto edges, one dst-keyed aggregation — both shuffles on
    * natural graph keys; ranks/nodes stay distributed (never collected).
    * Unlike [[Dedup.duplicateClusters]] there is NO per-round action (no
    * convergence test to run), so iterations stay LAZY — the whole
    * fixed-depth join tree executes as one job — with a lineage-cutting
    * localCheckpoint only every `checkpointEvery` rounds (deep plans OOM
    * the driver on plan strings alone; measured on the e12 query: eager
    * per-round checkpoints 5.0 s vs one lazy plan 1.6 s at 5 iterations). */
  def pageRank(edges: DataFrame, iterations: Int = 5, dampingPct: Int = 85,
      unit: Long = 1000000000000L, checkpointEvery: Int = 8): DataFrame = {
    require(iterations >= 1 && dampingPct >= 1 && dampingPct <= 99)
    require(checkpointEvery >= 1,
      "checkpointEvery must be >= 1 (use a value above `iterations` to " +
        "never checkpoint)")
    // Materialize the edge plan ONCE before anything derives from it:
    // nodes (union+distinct reads it twice) and the degree join (twice
    // more) otherwise recompute a possibly-expensive upstream plan — an
    // IVF-blocked kNN graph fed here ran ~3x before this checkpoint.
    val ed = edges.select(col("src"), col("dst")).localCheckpoint()
    val nodes = ed.select(col("src").as("id"))
      .union(ed.select(col("dst").as("id"))).distinct()
      .localCheckpoint() // eager: computed once, both uses below share it
    val e = ed.join(
        ed.groupBy("src").agg(count(lit(1)).as("__deg__")), "src")
      .select(col("src"), col("dst"), col("__deg__"))
      .localCheckpoint() // eager: re-read (not recomputed) every iteration
    val teleport = unit * (100 - dampingPct) / 100
    var ranks = nodes.withColumn("rank", lit(unit))
    for (i <- 1 to iterations) {
      val inflow = e.join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"),
          // the multiply widens through DECIMAL: a hub whose rank exceeds
          // ~1.1e17 micro-units (a ~10^5-spoke star after one iteration)
          // would overflow `rank * pct` in long — ANSI mode throws, and
          // non-ANSI silently corrupts ranks. Floor-division semantics are
          // unchanged, so results are bit-identical where long sufficed.
          // (Total mass is ~n_nodes * unit; pick `unit` so that stays
          // under 2^63 — the per-dst SUM is still a long.)
          expr(s"CAST(rank AS DECIMAL(38,0)) * $dampingPct div 100 div __deg__")
            .as("__c__"))
        .groupBy("id").agg(sum("__c__").as("__in__"))
      ranks = nodes.join(inflow, Seq("id"), "left")
        .select(col("id"),
          (lit(teleport) + coalesce(col("__in__"), lit(0L))).as("rank"))
      if (i % checkpointEvery == 0 && i < iterations)
        ranks = ranks.localCheckpoint()
    }
    ranks
  }
}
