package graft

import graft.operators.{ConnectedComponents, Sampling}
import org.apache.spark.sql.functions._

/** Semantics of the round-3 curation operators: connected components
  * (transitive closure over pair lists) and deterministic hash
  * sampling. */
class CurationOpsSpec extends SparkSpecBase {
  import spark.implicits._

  // localFinishEdges = 0 pins these contracts to the DISTRIBUTED loop;
  // the local union-find endgame is covered by its own equivalence test
  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents
      .connectedComponents(edges.toDF("i", "j"), "i", "j", localFinishEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("connected components collapses a chain the pair list never closes") {
    // a~b, b~c, c~d: (a,d) is not a pair but all four are one cluster
    assert(cc(Seq((1L, 2L), (2L, 3L), (3L, 4L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("connected components keeps disjoint clusters apart") {
    assert(cc(Seq((1L, 2L), (5L, 6L), (6L, 7L), (9L, 9L))) ==
      Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L, 7L -> 5L, 9L -> 9L))
  }

  test("connected components handles a long path within maxIter rounds") {
    // path 0-1-2-...-9: diameter 9, propagation needs ~9 rounds
    val path = (0L until 9L).map(i => (i, i + 1))
    val got = cc(path)
    assert(got == (0L to 9L).map(_ -> 0L).toMap)
  }

  test("connected components labels with the min id regardless of edge direction") {
    assert(cc(Seq((7L, 3L), (3L, 5L))) == Map(3L -> 3L, 5L -> 3L, 7L -> 3L))
  }

  test("CC writes durable (reliable-checkpoint) snapshots, not just executor-local blocks") {
    // diameter-9 path: the loop crosses the ReliableEvery cadence
    // multiple times, so periodic reliable checkpoints MUST have fired.
    // localCheckpoint blocks live only on executors (no lineage, no
    // storage) — durable RDD snapshot files in the checkpoint dir are
    // the artifact proving a lost executor would NOT kill the loop: the
    // state is recomputable from the last on-disk snapshot.
    val path = (0L until 9L).map(i => (i, i + 1))
    assert(cc(path) == (0L to 9L).map(_ -> 0L).toMap)
    val dir = spark.sparkContext.getCheckpointDir
    assert(dir.isDefined, "reliable checkpointing must provision a checkpoint dir")
    val local = new java.io.File(new java.net.URI(
      if (dir.get.contains(":/")) dir.get else "file:" + dir.get).getPath)
    val snapshots = Option(local.listFiles()).getOrElse(Array.empty)
    assert(snapshots.nonEmpty, s"expected durable RDD snapshots under $local")
  }

  private def ccStar(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents
      .connectedComponentsStar(edges.toDF("i", "j"), "i", "j", localFinishEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star-contraction CC equals propagation CC on chains, cliques and self-loops") {
    val cases = Seq(
      Seq((1L, 2L), (2L, 3L), (3L, 4L)),
      Seq((1L, 2L), (5L, 6L), (6L, 7L), (9L, 9L)),
      (0L until 9L).map(i => (i, i + 1)),                       // path, diameter 9
      Seq((10L, 11L), (11L, 12L), (12L, 10L), (20L, 21L)))     // cycle + pair
    cases.foreach { edges =>
      assert(ccStar(edges) == cc(edges), s"divergence on $edges")
    }
  }

  test("star-contraction CC equals propagation CC on a fixed-seed random graph") {
    val rnd = new scala.util.Random(1234)
    val edges = Seq.fill(150)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    assert(ccStar(edges) == cc(edges))
  }

  test("local union-find endgame equals the distributed loop, in both algorithms") {
    val rnd = new scala.util.Random(77)
    val edges = Seq.fill(300)((rnd.nextInt(400).toLong, rnd.nextInt(400).toLong))
    def run(f: Long => Map[Long, Long]) = (f(0L), f(Long.MaxValue)) // distributed vs local
    val (distProp, localProp) = run(t => ConnectedComponents
      .connectedComponents(edges.toDF("i", "j"), "i", "j", localFinishEdges = t)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    assert(localProp == distProp, "propagation: local endgame diverged")
    val (distStar, localStar) = run(t => ConnectedComponents
      .connectedComponentsStar(edges.toDF("i", "j"), "i", "j", localFinishEdges = t)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    assert(localStar == distStar, "star: local endgame diverged")
    assert(localStar == localProp)
  }

  test("star-contraction switches to the local endgame once rounds contract the edge set") {
    // threshold between the seed size and the contracted size: round 1
    // runs distributed, the shrunken remnant finishes locally
    val path = (0L until 40L).map(i => (i, i + 1))
    val got = ConnectedComponents
      .connectedComponentsStar(path.toDF("i", "j"), "i", "j", localFinishEdges = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 40L).map(_ -> 0L).toMap)
  }

  test("hash sample is deterministic, key-stable and near the asked fraction") {
    val df = spark.range(0, 20000).select(col("id"))
    val a = Sampling.hashSample(df, col("id"), 0.1).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(df, col("id"), 0.1).collect().map(_.getLong(0)).toSet
    assert(a == b, "same key set must sample identically")
    // binomial(20000, ~0.1): 4 sigma ~ 170
    assert(math.abs(a.size - 2000) < 200, s"got ${a.size} of ~2000")
    // growing the fraction only ADDS rows (nested samples)
    val wider = Sampling.hashSample(df, col("id"), 0.2).collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(wider))
  }

  test("hash sample keeps membership when the table grows") {
    val small = spark.range(0, 1000).select(col("id"))
    val big = spark.range(0, 2000).select(col("id"))
    val s = Sampling.hashSample(small, col("id"), 0.15).collect().map(_.getLong(0)).toSet
    val g = Sampling.hashSample(big, col("id"), 0.15).collect().map(_.getLong(0)).toSet
    assert(s == g.filter(_ < 1000), "adding rows must not change prior membership")
  }

  test("stratified hash sample applies per-stratum fractions and stays key-stable") {
    val df = spark.range(0, 20000)
      .select(col("id"), when(pmod(col("id"), lit(2)) === 0, "a").otherwise("b").as("s"))
    val got = Sampling.stratifiedHashSample(df, col("id"), col("s"),
      Map("a" -> 0.1), default = 0.5)
    val byStratum = got.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byStratum("a") - 1000L) < 150, byStratum.toString)  // 10% of 10000
    assert(math.abs(byStratum("b") - 5000L) < 300, byStratum.toString)  // 50% of 10000
    // per-key membership identical to the flat sampler at the same fraction
    val flat = Sampling.hashSample(df.filter(col("s") === "a"), col("id"), 0.1)
      .collect().map(_.getLong(0)).toSet
    val strat = got.filter(col("s") === "a").collect().map(_.getLong(0)).toSet
    assert(flat == strat)
  }

  test("splitByHash partitions every row into exactly one split at ~the asked weights") {
    val df = spark.range(0, 30000).select(col("id"))
    val split = Sampling.splitByHash(df, col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 30000L) // total partition, nothing dropped
    assert(math.abs(counts("train") - 24000L) < 500, counts.toString)
    assert(math.abs(counts("val") - 3000L) < 300, counts.toString)
    assert(math.abs(counts("test") - 3000L) < 300, counts.toString)
    // key-stability: same assignment on re-evaluation
    val again = Sampling.splitByHash(df, col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(graft.operators.Display.dfEqual(split, again))
  }

  test("hash sample edge fractions: 0 keeps nothing, 1 keeps everything") {
    val df = spark.range(0, 100).select(col("id"))
    assert(Sampling.hashSample(df, col("id"), 0.0).count() == 0)
    assert(Sampling.hashSample(df, col("id"), 1.0).count() == 100)
  }

  test("foldByHash assigns stable folds covering [0, k) at ~uniform mass") {
    val df = spark.range(0, 20000).select(col("id"))
    val folds = Sampling.foldByHash(df, col("id"), 5)
      .groupBy("fold").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(folds.keySet == Set(0, 1, 2, 3, 4))
    folds.values.foreach(n => assert(math.abs(n - 4000.0) < 300, s"fold sizes $folds"))
    // key-stable: same fold for id=7 regardless of table contents
    val one = Sampling.foldByHash(spark.range(7, 8).select(col("id")), col("id"), 5)
      .collect()(0).getInt(1)
    val again = Sampling.foldByHash(df, col("id"), 5)
      .filter(col("id") === 7).collect()(0).getInt(1)
    assert(one == again)
  }

  test("takeWhileBudget's distributed prefix sum equals a sequential scan") {
    val rnd = new scala.util.Random(5)
    val rows = (0L until 5000L).map(i => (i, 1L + rnd.nextInt(100)))
    val df = rows.toDF("id", "w").repartition(16) // scrambled input partitioning
    val got = Sampling.takeWhileBudget(df, Seq(col("id").asc), col("w"),
        budget = 50000L, partitions = 8)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2)))
    // sequential reference: exclusive cumsum in id order
    var cum = 0L
    val want = rows.sortBy(_._1).iterator.map { case (id, w) =>
      val before = cum; cum += w; (id, before)
    }.takeWhile(_._2 < 50000L).toSeq
    assert(got.toSeq == want, s"got ${got.length} rows, want ${want.length}")
    assert(want.length > 100 && want.length < 5000) // the budget genuinely truncates
  }

  test("profile_sketch emits exact NDVs and in-bound sketch booleans") {
    val dir = "/root/testdata/sf0.001"
    val li = Tables(spark, dir, "lineitem")
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("ndv_o"),
        countDistinct(col("l_partkey")).as("ndv_p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = SparkEntry.queries("profile_sketch")(spark, dir).collect()
    assert(got.length == exact.size)
    got.foreach { r =>
      val (ndvO, ndvP) = exact(r.getString(0))
      // the exact payload the DuckDB oracle recomputes
      assert(r.getLong(1) == ndvO && r.getLong(2) == ndvP)
      // the bound booleans — if a sketch regresses past its published
      // error bound this flips false and the hash gate catches it
      (3 to 6).foreach(i => assert(r.getBoolean(i), s"bound column $i false: $r"))
    }
  }

  test("boilerplate_ngrams surfaces the planted phrases with exact doc counts") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables(spark, dir, "documents")
    val nMod3 = docs.filter(col("doc_id") % 3 === 0).count()
    val nMod7 = docs.filter(col("doc_id") % 7 === 1 && col("doc_id") % 3 =!= 0).count()
    val got = SparkEntry.queries("boilerplate_ngrams")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the grams fully inside each planted sentence carry its doc class
    assert(got("subscribe to our newsletter for") == nMod3)
    assert(got("to our newsletter for updates") == nMod3)
    assert(got("rights reserved terms of service") == nMod7)
    assert(got.size <= 20)
  }

  test("lang_id confusion matrix covers every document exactly once") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables(spark, dir, "documents")
    val langs = docs.select("lang").distinct().collect().map(_.getString(0)).toSet
    val m = SparkEntry.queries("lang_id")(spark, dir).collect()
    // every doc hits >= 1 profile trigram (shared vocabulary), so the
    // matrix cells partition the corpus; predictions stay in-vocabulary
    assert(m.map(_.getLong(2)).sum == docs.count())
    assert(m.forall(r => langs(r.getString(0)) && langs(r.getString(1))))
  }

  test("term_drift KL is non-negative and novelty stays a proper fraction") {
    val dir = "/root/testdata/sf0.001"
    val kl = SparkEntry.queries("term_drift")(spark, dir).collect()
    assert(kl.nonEmpty && kl.forall(_.getDouble(2) >= 0.0)) // Gibbs: KL(p||q) >= 0
    val nov = SparkEntry.queries("novelty_score")(spark, dir).collect()
    assert(nov.nonEmpty && nov.forall { r =>
      val v = r.getDouble(2); v >= 0.0 && v <= 1.0
    })
    val pmi = SparkEntry.queries("pmi_bigrams")(spark, dir).collect()
    assert(pmi.length <= 20 && pmi.forall(_.getLong(2) >= 10L))
  }

  test("dsir_select ranks target-vocabulary docs above off-domain docs") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("dsir_select")(spark, dir).collect()
    assert(rows.nonEmpty && rows.forall(_.getString(1) != "src0"),
      "selection pool must exclude the target source")
    // scores arrive sorted desc with a doc_id tiebreak
    val scores = rows.map(r => (r.getDouble(3), r.getLong(0)))
    scores.sliding(2).foreach { case Array((s1, d1), (s2, d2)) =>
      assert(s1 > s2 || (s1 == s2 && d1 < d2), s"order broken at $d1/$d2")
    case _ => ()
    }
    // a synthetic pool doc written in the target's own vocabulary must
    // outscore every real pool doc: splice it in and re-rank
    import spark.implicits._
    val docs = Tables(spark, dir, "documents")
    val tgtText = docs.filter(col("source") === "src0")
      .orderBy(col("doc_id")).select(col("text")).head().getString(0)
    val spiked = docs.unionByName(
      Seq((999999L, tgtText, "en", "src1", tgtText.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_dsir").toString
    try {
      // reuse the registered query by materializing the spiked corpus
      // as a documents table in a scratch sf dir
      spiked.write.parquet(s"$tmp/documents.parquet")
      val sel = SparkEntry.queries("dsir_select")(spark, tmp).collect()
      val spikeRow = sel.find(_.getLong(0) == 999999L)
      // a verbatim target doc need not rank FIRST (a pool doc
      // concentrating a few very-high-ratio tokens can beat a typical
      // target doc's mean), but it must be selected and target-leaning
      assert(spikeRow.isDefined, "verbatim-target doc must be selected")
      assert(spikeRow.get.getDouble(3) > 0.0,
        s"target-vocabulary doc must score positive, got ${spikeRow.get.getDouble(3)}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }
}
