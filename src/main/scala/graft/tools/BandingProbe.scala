package graft.tools

import org.apache.spark.sql.functions._

/** Candidate-volume probe for the two SimHash banding schemes: computes
  * Σ_buckets C(m, 2) — the exact number of candidate pairs each scheme's
  * equi-join would emit — WITHOUT running the join (one aggregation over
  * the exploded key frame), so the simple-vs-combination crossover can be
  * measured at corpus sizes where actually running the simple join is the
  * very blow-up being demonstrated.
  *
  * Usage: runMain graft.tools.BandingProbe <spec>[,<spec>...] where spec is
  * a documents dir (signatures computed from real text) or `synth:N`
  * (N uniform-random 64-bit signatures via xxhash64(id) — the pure
  * random-collision regime, zero true near-dups, measurable at millions
  * of rows). Per spec prints, for d8's shape (maxDist=7, the 8×8-bit
  * simple scheme is the only complete one) and the maxDist=3 pair of
  * schemes (simple 4×16-bit vs combination C(8,5)=56×40-bit), the
  * candidate count and its per-doc ratio — a ratio growing linearly in n
  * means the scheme has gone quadratic.
  */
object BandingProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create(32)
    for (spec <- args(0).split(',').toSeq) {
      val sig =
        (if (spec.startsWith("synth:"))
          spark.range(spec.stripPrefix("synth:").toLong)
            .select(col("id").as("doc_id"),
              xxhash64(col("id")).as("simhash64"))
        else graft.pipeline.Dedup.simhash64(
          spark.read.parquet(s"$spec/documents.parquet"), "doc_id", "text"))
        .localCheckpoint()
      val n = sig.count()
      val den = math.max(n, 1L).toDouble // guard per-doc ratios at n=0
      // coalesce: sum() over an EMPTY key frame is NULL (synth:0 / an
      // empty documents dir) — print 0 volume instead of an NPE
      def volume(keys: org.apache.spark.sql.DataFrame): Long =
        keys.groupBy("band", "key").count()
          .agg(coalesce(sum(col("count") * (col("count") - 1)), lit(0L)))
          .head.getLong(0) / 2
      val d8 = volume(graft.pipeline.Dedup.simpleBandKeys(
        sig, "doc_id", "simhash64", bits = 64, maxDist = 7, bands = 8))
      val s3 = volume(graft.pipeline.Dedup.simpleBandKeys(
        sig, "doc_id", "simhash64", bits = 64, maxDist = 3, bands = 4))
      val c3 = volume(graft.pipeline.Dedup.comboBandKeys(
        sig, "doc_id", "simhash64", bits = 64, maxDist = 3, blocks = 8))
      println(f"[banding] $spec n=$n d8_simple8x8=$d8 (${d8 / den}%.1f/doc) " +
        f"dist3_simple4x16=$s3 (${s3 / den}%.1f/doc) " +
        f"dist3_combo56x40=$c3 (${c3 / den}%.1f/doc)")
    }
    spark.stop()
  }
}
