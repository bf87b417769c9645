package graft

import graft.operators.LogisticRegression
import org.apache.spark.sql.functions._

/** Behavioral pins for the GD logistic-regression trainer: the first
  * iteration's closed form (w = 0 makes every p exactly 0.5, so the
  * gradient is a plain moment of the data), monotone loss improvement,
  * and separation on a cleanly separable corpus. The registered query's
  * oracle covers the cross-engine iteration replay; these cover the
  * algebra on controlled data. */
class LogRegSpec extends SparkSpecBase {
  import spark.implicits._

  private def round6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("one iteration from zero equals the closed-form half-residual moment") {
    // w=0 => sigma(0) = 0.5 exactly; g_x = avg(x*(0.5-y)), g_b = avg(0.5-y)
    val data = Seq((1.0, 1.0), (2.0, 0.0), (3.0, 1.0), (4.0, 0.0))
      .toDF("x", "y")
    val wts = LogisticRegression.fit(data, Seq("x"), "y", iters = 1)
    val gx = round6((1.0 * -0.5 + 2.0 * 0.5 + 3.0 * -0.5 + 4.0 * 0.5) / 4)
    val gb = round6((-0.5 + 0.5 - 0.5 + 0.5) / 4)
    assert(wts.w == Seq(-gx), s"got ${wts.w}")
    assert(wts.b == -gb, s"got ${wts.b}")
  }

  test("separable data: three iterations classify the training set") {
    // y = 1 iff x > 0, margins large enough that the sign is right
    // after the first step and stays right.
    val data = Seq((4.0, 1.0), (5.0, 1.0), (6.0, 1.0),
      (-4.0, 0.0), (-5.0, 0.0), (-6.0, 0.0)).toDF("x", "y")
    val wts = LogisticRegression.fit(data, Seq("x"), "y", iters = 3)
    assert(wts.w.head > 0, s"weight should be positive: $wts")
    val z = LogisticRegression.margin(wts, Seq("x"))
    val acc = data.agg(avg(when((z >= 0) === (col("y") === 1.0), 1.0)
      .otherwise(0.0))).head().getDouble(0)
    assert(acc == 1.0, s"training accuracy $acc with $wts")
  }

  test("log-loss decreases across GD iterations") {
    val data = Seq((1.5, 1.0), (2.5, 1.0), (0.5, 0.0), (-1.0, 0.0),
      (3.0, 1.0), (-2.0, 0.0), (0.8, 1.0), (-0.3, 0.0)).toDF("x", "y")
    def logloss(wts: LogisticRegression.Weights): Double = {
      val p = lit(1.0) / (lit(1.0) + exp(-LogisticRegression.margin(wts, Seq("x"))))
      data.agg(avg(-(col("y") * log(p) + (lit(1.0) - col("y")) * log(lit(1.0) - p))))
        .head().getDouble(0)
    }
    val losses = (0 to 3).map(k =>
      logloss(LogisticRegression.fit(data, Seq("x"), "y", iters = k)))
    losses.sliding(2).foreach { case Seq(a, b) =>
      assert(b < a, s"loss must strictly decrease: $losses")
    }
  }

  test("margin evaluates terms in declaration order with the bias last") {
    val data = Seq((2.0, 3.0)).toDF("a", "b")
    val wts = LogisticRegression.Weights(Seq(0.5, -1.0), 0.25)
    val z = data.select(LogisticRegression.margin(wts, Seq("a", "b")).as("z"))
      .head().getDouble(0)
    assert(z == 2.0 * 0.5 + 3.0 * -1.0 + 0.25)
  }
}
