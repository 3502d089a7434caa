package graft

import graft.ops.{HashMode, Similarity}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-6 optimization of the pairwise-scoring hot path: the native
  * loop expression [[graft.plans.VecDotExpr]] (now behind Similarity.dot/norm
  * and lshBucket) must be BIT-IDENTICAL to the aggregate(zip_with(...))
  * higher-order-function formulation it replaced — same left-fold addition
  * order, same null semantics — on dense vectors, ragged lengths, null
  * elements, empties, and float/double element types. The DuckDB oracles
  * (Similarity.dotSql's list_reduce fold) replay the SAME sequence, so HOF
  * equivalence here is oracle equivalence.
  */
class VecDotSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def hofDot(a: Column, b: Column): Column = {
    def asD(v: Column) = transform(v, x => x.cast("double"))
    aggregate(zip_with(asD(a), asD(b), (x, y) => x * y), lit(0.0), (s, x) => s + x)
  }

  private def bits(d: java.lang.Double): Option[Long] =
    Option(d).map(x => java.lang.Double.doubleToRawLongBits(x))

  test("vec_dot == HOF fold bit-exactly on random float vectors (incl. 64-dim)") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 500).map { i =>
      val n = Seq(1, 3, 64, 65)(i % 4)
      (i.toLong, Array.fill(n)((rnd.nextGaussian() * 10).toFloat),
        Array.fill(n)((rnd.nextGaussian() * 1e-3).toFloat))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select($"id", Similarity.dot($"a", $"b").as("d"),
        Similarity.norm($"a").as("na"))
      .as[(Long, java.lang.Double, java.lang.Double)].collect()
    val exp = df.select($"id", hofDot($"a", $"b").as("d"),
        sqrt(hofDot($"a", $"a")).as("na"))
      .as[(Long, java.lang.Double, java.lang.Double)].collect()
    got.zip(exp).foreach { case ((i1, d1, n1), (i2, d2, n2)) =>
      assert(i1 == i2)
      assert(bits(d1) == bits(d2), s"dot id=$i1: $d1 != $d2")
      assert(bits(n1) == bits(n2), s"norm id=$i1: $n1 != $n2")
    }
  }

  test("vec_dot edge cases match HOF: ragged lengths, null elements, empty, nulls") {
    val df = Seq(
      (1L, Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Float](3.0f)), // ragged
      (2L, Array[java.lang.Float](1.0f, null), Array[java.lang.Float](3.0f, 4.0f)), // null elem
      (3L, Array.empty[java.lang.Float], Array.empty[java.lang.Float]), // empty == 0.0
      (4L, null, Array[java.lang.Float](1.0f)), // null array
      (5L, Array[java.lang.Float](2.0f, 3.0f), Array[java.lang.Float](4.0f, 5.0f))
    ).toDF("id", "a", "b")
    val got = df.select($"id", Similarity.dot($"a", $"b").as("d"))
      .as[(Long, Option[Double])].collect().toMap
    val exp = df.select($"id", hofDot($"a", $"b").as("d"))
      .as[(Long, Option[Double])].collect().toMap
    assert(got == exp, s"got=$got exp=$exp")
    assert(got(1L).isEmpty && got(2L).isEmpty && got(4L).isEmpty)
    assert(got(3L).contains(0.0) && got(5L).contains(23.0))
  }

  test("vec_dot handles array<double> x array<double> and mixed float/double") {
    val df = Seq((1L, Array(0.1, 0.2, 0.3), Array(1.5f, -2.5f, 3.5f)))
      .toDF("id", "a", "b")
    val got = df.select(Similarity.dot($"a", $"b").as("d"))
      .as[java.lang.Double].head()
    val exp = df.select(hofDot($"a", $"b").as("d"))
      .as[java.lang.Double].head()
    assert(bits(got) == bits(exp))
  }

  test("lshBucket (vec_dot form) matches the HOF formulation bucket-for-bucket") {
    val rnd = new scala.util.Random(7)
    val vecs = (1 to 200).map(i =>
      (i.toLong, Array.fill(64)((rnd.nextGaussian()).toFloat))).toDF("id", "v")
    for (mode <- Seq(HashMode.XxHash, HashMode.PortableMd5)) {
      // the HOF twin of lshBucket, with the same literal plane weights
      val hofBits = (0 until 4).map { p =>
        val w = (0 until 64).map(d => Similarity.planeWeight(d, p, mode)).toArray
        val d = aggregate(zip_with(transform($"v", x => x.cast("double")), lit(w),
          (x, y) => x * y), lit(0.0), (s, x) => s + x)
        when(d >= 0, shiftleft(lit(1L), p).cast("long")).otherwise(lit(0L))
      }.reduce((a: Column, b: Column) => a + b)
      val got = vecs.select($"id", Similarity.lshBucket($"v", 64, 4, mode).as("bk"))
        .as[(Long, Long)].collect().toMap
      val exp = vecs.select($"id", hofBits.as("bk")).as[(Long, Long)].collect().toMap
      assert(got == exp, s"mode=$mode")
    }
  }
}
