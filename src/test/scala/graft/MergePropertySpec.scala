package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.storage._

/** Property tests for merge semantics (SURVEY §5: last-write-wins ≡ max-seq;
  * append concat ordered by seq regardless of arrival order). Uses raw
  * ScalaCheck generators with fixed seeds (scalatestplus bridge is not in
  * the offline dependency cache). */
class MergePropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val schema = StructType(Seq(
    StructField("pk", IntegerType), StructField("v", StringType),
    StructField("__seq__", LongType)))

  private val rowsGen: Gen[List[(Int, String, Long)]] = for {
    n <- Gen.choose(1, 30)
    rows <- Gen.listOfN(n, for {
      pk <- Gen.choose(0, 5)
      v <- Gen.alphaStr.map(_.take(3))
    } yield (pk, v))
  } yield rows.zipWithIndex.map { case ((pk, v), i) => (pk, v, i.toLong) }

  private def sample(i: Long): List[(Int, String, Long)] =
    rowsGen.apply(Gen.Parameters.default, Seed(i)).get

  private def df(rows: List[(Int, String, Long)], shuffleSeed: Long) = {
    val shuffled = new scala.util.Random(shuffleSeed).shuffle(rows)
    spark.createDataFrame(
      spark.sparkContext.parallelize(shuffled.map(r => Row(r._1, r._2, r._3)), 3), schema)
  }

  test("Overwrite merge == max-seq row per key, independent of arrival order") {
    for (i <- 0L until 8L) {
      val rows = sample(i)
      val got = MergeOps.dedupMerge(df(rows, i * 31), Seq("pk"), Seq("v"), UpdateMode.Overwrite)
        .collect().map(r => (r.getInt(0), r.getString(1))).toMap
      val want = rows.groupBy(_._1).map { case (pk, g) => pk -> g.maxBy(_._3)._2 }
      assert(got == want, s"case $i: $rows")
    }
  }

  test("Append merge drops null chunks; all-null group merges to null") {
    val rowsGenN: Gen[List[(Int, Option[String], Long)]] = for {
      n <- Gen.choose(1, 30)
      rows <- Gen.listOfN(n, for {
        pk <- Gen.choose(0, 5)
        v <- Gen.option(Gen.alphaStr.map(_.take(3)))
      } yield (pk, v))
    } yield rows.zipWithIndex.map { case ((pk, v), i) => (pk, v, i.toLong) }
    for (i <- 0L until 8L) {
      val rows = rowsGenN.apply(Gen.Parameters.default, Seed(i * 101 + 7)).get
      val shuffled = new scala.util.Random(i).shuffle(rows)
      val in = spark.createDataFrame(
        spark.sparkContext.parallelize(
          shuffled.map(r => Row(r._1, r._2.orNull, r._3)), 3), schema)
      val got = MergeOps.dedupMerge(in, Seq("pk"), Seq("v"), UpdateMode.Append)
        .collect().map(r => (r.getInt(0), Option(r.getString(1)))).toMap
      val want = rows.groupBy(_._1).map { case (pk, g) =>
        val parts = g.sortBy(_._3).flatMap(_._2)
        pk -> (if (parts.isEmpty) None else Some(parts.mkString))
      }
      assert(got == want, s"case $i: $rows")
    }
  }

  test("Append merge == seq-ordered concat per key, independent of arrival order") {
    for (i <- 0L until 8L) {
      val rows = sample(i)
      val got = MergeOps.dedupMerge(df(rows, i * 17), Seq("pk"), Seq("v"), UpdateMode.Append)
        .collect().map(r => (r.getInt(0), r.getString(1))).toMap
      val want = rows.groupBy(_._1).map { case (pk, g) =>
        pk -> g.sortBy(_._3).map(_._2).mkString
      }
      assert(got == want, s"case $i: $rows")
    }
  }
}
