package graft.tools

import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Dev drive: per-stage wall times of the c3 MinHash-dedup composite at an
  * arbitrary SF dir — `runMain graft.tools.PipeProbe <sfDir>`. Used to keep
  * the composite's stages individually accountable (candidate generation vs
  * Jaccard verification vs connected components). */
object PipeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.create()
    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $what%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val cand = timed("lsh candidates") {
      val c = Dedup.lshCandidatePairs(
        Dedup.minhashSignature(docs, "doc_id", "text", 8), "doc_id",
        numHashes = 8, bandSize = 2, maxBucket = 16).localCheckpoint()
      println(s"[probe]   candidates = ${c.count()}")
      c
    }
    val verified = timed("jaccard verify") {
      val v = Dedup.ngramJaccard(docs, cand, "doc_id", "text", n = 3)
        .filter(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b")).localCheckpoint()
      println(s"[probe]   verified = ${v.count()}")
      v
    }
    val closed = timed("two-hop closure") {
      val c = Dedup.boundedTwoHopClosure(verified).localCheckpoint()
      println(s"[probe]   closed = ${c.count()}")
      c
    }
    timed("connected components") {
      println(s"[probe]   rows = ${Dedup.duplicateClusters(closed).count()}")
    }
    spark.stop()
  }
}
