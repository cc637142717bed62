package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Udx
import graft.plans.FloatVecDot
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** ScalaCheck properties over the pure kernels (SURVEY.md §5.2.3). */
class PropsSpec extends AnyFunSuite {

  /** Deterministic sampling bridge (no scalatestplus in the offline cache). */
  private val seed0 = org.scalacheck.rng.Seed(42L)
  private def forAll[A](g: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    Iterator.iterate(seed0)(_.next).take(n).foreach { seed =>
      g.apply(org.scalacheck.Gen.Parameters.default, seed).foreach(f)
    }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  private val geoidGen: Gen[String] =
    Gen.chooseNum(0L, 99999999999L).map(k => f"$k%011d")

  test("geoidParent: parents are prefixes and nest (state ⊂ county ⊂ geoid)") {
    forAll(geoidGen) { g =>
      val st = Udx.geoidParent(g, "state")
      val co = Udx.geoidParent(g, "county")
      assert(st.length == 2 && co.length == 5)
      assert(co.startsWith(st) && g.startsWith(co))
      assert(Udx.geoidParent(g, "other") == g)
    }
    assert(Udx.geoidParent(null, "state") == null)
  }

  private val vecGen: Gen[Array[Float]] =
    Gen.listOfN(16, Gen.chooseNum(-10.0f, 10.0f)).map(_.toArray)

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    val lit = (v: Array[Float]) =>
      Literal(ArrayData.toArrayData(v), ArrayType(FloatType))
    FloatVecDot(lit(a), lit(b)).eval(null).asInstanceOf[Double]
  }

  test("FloatVecDot: commutative, matches reference fold, self-dot >= 0") {
    forAll(vecGen, vecGen) { (a, b) =>
      val ref = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y.toDouble
      }
      assert(dot(a, b) == ref, "interpreted eval must equal sequential fold")
      assert(dot(a, b) == dot(b, a))
      assert(dot(a, a) >= 0.0)
    }
  }

  test("FloatVecDot: length mismatch uses common prefix") {
    assert(dot(Array(1f, 2f, 3f), Array(2f, 3f)) == 8.0)
  }

  test("UDAF decimal mirror matches Spark's double->decimal cast semantics") {
    val agg = new Udx.WeightedRateAgg
    forAll(Gen.chooseNum(-1e6, 1e6)) { (x: Double) =>
      val viaAgg = agg.reduce(agg.zero, (x, 1.0))._1
      val expected = new java.math.BigDecimal(java.lang.Double.toString(x))
        .setScale(6, java.math.RoundingMode.HALF_UP)
      assert(viaAgg.compareTo(expected) == 0)
    }
  }
}
