package graft

import graft.operators.GraftOps._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.Prop.forAll
import org.scalacheck.Properties

/** ScalaCheck properties over the operator algebra (SURVEY §5):
  * invariants that must hold for ANY input, not just the fixture. Kept
  * to small generated frames — each property trip is a Spark job. */
object GraftPropsSpec extends Properties("graft.ops") {

  private lazy val spark = TestSpark.session

  private val rowsGen: Gen[List[(Long, Double)]] =
    Gen.choose(0, 15).flatMap(n => Gen.listOfN(n, Gen.zip(
      Gen.choose(-100L, 100L), Gen.choose(-1e6, 1e6))))

  private def df(rows: List[(Long, Double)]) = {
    Graft.fromValues(spark, Seq("k", "v"),
      rows.map { case (k, v) => Seq[Any](k, v) })
  }

  property("concat_rows count is additive") = forAll(rowsGen, rowsGen) { (a, b) =>
    df(a).concatRows(df(b)).count() == (a.size + b.size).toLong
  }

  property("dropna never grows the frame") = forAll(rowsGen) { a =>
    val d = df(a).addColumn("maybe", when(col("k") % 2 === 0, col("v")))
    d.dropNa().count() <= d.count()
  }

  property("fillna leaves no nulls in the filled column") = forAll(rowsGen) { a =>
    val d = df(a).addColumn("maybe", when(col("k") % 2 === 0, col("v")))
      .fillNa("maybe", -1.0)
    d.filterRows(col("maybe").isNull).count() == 0L
  }

  property("filter is idempotent") = forAll(rowsGen) { a =>
    val p = col("v") > 0
    df(a).filterRows(p).filterRows(p).count() == df(a).filterRows(p).count()
  }

  property("head(n) returns min(n, rows)") = forAll(rowsGen) { a =>
    df(a).headRows(5, Seq(col("k"), col("v"))).count() ==
      math.min(5, a.size).toLong
  }

  property("sum matches local fold within fp tolerance") = forAll(rowsGen) { a =>
    val got = df(a).sumCol("v").collect()(0).getDouble(0)
    val want = a.map(_._2).sum
    math.abs(got - want) <= 1e-6 * math.max(1.0, math.abs(want))
  }
}
