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

  private val fracGen: Gen[(Double, Double)] =
    Gen.zip(Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0))
      .map { case (x, y) => (math.min(x, y), math.max(x, y)) }

  property("hash samples nest: fraction f1 <= f2 => sample(f1) is a subset of sample(f2)") =
    forAll(fracGen) { case (f1, f2) =>
      val d = spark.range(0, 500).toDF("id")
      val s1 = graft.operators.Sampling.hashSample(d, col("id"), f1)
        .collect().map(_.getLong(0)).toSet
      val s2 = graft.operators.Sampling.hashSample(d, col("id"), f2)
        .collect().map(_.getLong(0)).toSet
      s1.subsetOf(s2)
    }

  // Distributed rank/prefix-sum algebra: for ANY rows and ANY partition
  // count, the two-pass constructions must equal their single-partition
  // window formulations exactly (the whole point of the operators is
  // that partition-boundary placement is unobservable).
  private val rankRowsGen: Gen[(List[(Long, Long)], Int)] =
    Gen.zip(
      Gen.choose(0, 40).flatMap(n => Gen.listOfN(n,
        Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 60L)))),
      Gen.choose(1, 9))

  property("globalRowNumber equals the sequential rank at any partition count") =
    forAll(rankRowsGen) { case (rows, parts) =>
      import spark.implicits._
      // (g, x) pairs may collide: rank on the full tuple via a distinct
      // synthetic id so the order is total
      val d = rows.zipWithIndex.map { case ((g, x), i) => (g, x, i.toLong) }
        .toDF("g", "x", "id")
      val want = d.orderBy($"x", $"id").collect()
        .map(r => (r.getLong(2))).zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
      val got = graft.operators.Ranks.globalRowNumber(d, Seq($"x", $"id"), "rk", parts)
        .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
      got == want
    }

  property("groupRowNumber equals the per-group window rank at any partition count") =
    forAll(rankRowsGen) { case (rows, parts) =>
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val d = rows.zipWithIndex.map { case ((g, x), i) => (g, x, i.toLong) }
        .toDF("g", "x", "id")
      val want = d.withColumn("rk", row_number().over(
          Window.partitionBy($"g").orderBy($"x", $"id")).cast("long"))
        .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
      val got = graft.operators.Ranks
        .groupRowNumber(d, Seq("g"), Seq($"x", $"id"), "rk", parts)
        .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
      got == want
    }

  property("groupRunningSum equals the per-group exclusive window sum at any partition count") =
    forAll(rankRowsGen) { case (rows, parts) =>
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val d = rows.zipWithIndex.map { case ((g, w), i) => (g, w, i.toLong) }
        .toDF("g", "w", "id")
      val win = Window.partitionBy($"g").orderBy($"id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val want = d.withColumn("cum", coalesce(sum($"w").over(win), lit(0L)))
        .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
      val got = graft.operators.Ranks
        .groupRunningSum(d, Seq("g"), Seq($"id"), $"w", "cum", parts)
        .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
      got == want
    }

  property("connected components is idempotent: CC of the label graph is the label graph") =
    forAll(Gen.listOfN(10, Gen.zip(Gen.choose(0L, 20L), Gen.choose(0L, 20L)))) { edges =>
      import spark.implicits._
      val e = edges.toDF("i", "j")
      val once = graft.operators.ConnectedComponents.connectedComponents(e, "i", "j")
      val twice = graft.operators.ConnectedComponents
        .connectedComponents(once.toDF("i", "j"), "i", "j")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val onceMap = once.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      // every node now maps straight to its cluster id; clusters map to themselves
      onceMap.forall { case (n, c) => twice(n) == c && twice.get(c).forall(_ == c) }
    }

  // random corpora over a 4-token alphabet: duplicate spans are common,
  // so keep-first actually fires; the invariants must hold regardless.
  private val corpusGen: Gen[List[String]] =
    Gen.choose(1, 6).flatMap(nDocs => Gen.listOfN(nDocs,
      Gen.choose(0, 12).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("aa", "bb", "cc", "dd")).map(_.mkString(" ")))))

  property("rewriteDupSpans conserves tokens: kept + n*dropped == input") =
    forAll(corpusGen) { texts =>
      import spark.implicits._
      val n = 3
      val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.operators.Dedup.rewriteDupSpans(d, "doc_id", "text", n)
        .collect().map(r => r.getLong(0) ->
          (r.getAs[Long]("n_dropped"), r.getAs[String]("kept_text"))).toMap
      texts.zipWithIndex.forall { case (t, i) =>
        val inToks = t.trim.split("\\s+").filter(_.nonEmpty).length
        val (dropped, kept) = got(i.toLong)
        val keptToks = kept.split(" ").count(_.nonEmpty)
        keptToks + n * dropped == inToks
      }
    }

  property("rewriteDupSpans keeps every distinct span at least once") =
    forAll(corpusGen) { texts =>
      import spark.implicits._
      val n = 3
      def spans(toks: Array[String]): Seq[String] =
        (0 until toks.length / n).map(i => toks.slice(i * n, i * n + n).mkString(" "))
      val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val keptTexts = graft.operators.Dedup.rewriteDupSpans(d, "doc_id", "text", n)
        .collect().map(r => r.getAs[String]("kept_text"))
      val inSpans = texts.flatMap(t =>
        spans(t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty))).toSet
      // every distinct input span's text survives SOMEWHERE in the kept
      // corpus (as a substring: reassembly may shift chunk boundaries)
      val keptBlob = keptTexts.mkString(" | ")
      inSpans.forall(s => keptBlob.contains(s))
    }
}
