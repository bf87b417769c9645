package graft

import graft.operators.{FuzzyJoin, Intervals, PageRank, Triangles}
import org.apache.spark.sql.functions._

/** Semantics of the round-6 analytic operators: fixed-point PageRank,
  * interval merge/coverage, and the deletion-neighborhood fuzzy join
  * (whose blocking must be EXACT — same pairs as brute force). */
class AnalyticsOpsSpec extends SparkSpecBase {
  import spark.implicits._

  // --- PageRank ----------------------------------------------------

  /** Sequential reference implementation of the identical fixed-point
    * arithmetic, for hand-verifiable cross-checks. */
  private def prRef(edges: Seq[(String, String)], iters: Int): Map[String, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val deg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = nodes.size.toLong
    val base = (15L * (PageRank.Scale / n)) / 100L
    var rank = nodes.map(_ -> PageRank.Scale / n).toMap
    for (_ <- 1 to iters) {
      val sums = e.groupBy(_._2).map { case (dst, in) =>
        dst -> in.map { case (src, _) => rank(src) / deg(src) }.sum
      }
      rank = nodes.map(v => v -> (base + (85L * sums.getOrElse(v, 0L)) / 100L)).toMap
    }
    rank
  }

  private def prSpark(edges: Seq[(String, String)], iters: Int): Map[String, Long] =
    PageRank.ranks(edges.toDF("src", "dst"), iters).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Force the fully distributed path (localFinishEdges = 0), like the
    * CC equivalence specs do for their local endgame. */
  private def prSparkDistributed(edges: Seq[(String, String)], iters: Int): Map[String, Long] =
    PageRank.ranks(edges.toDF("src", "dst"), iters, localFinishEdges = 0L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("pagerank matches the sequential fixed-point reference on a cycle") {
    // symmetric triangle: all nodes equal by symmetry, rank conserved
    val e = Seq("a" -> "b", "b" -> "c", "c" -> "a", "b" -> "a", "c" -> "b", "a" -> "c")
    val got = prSpark(e, 5)
    assert(got == prRef(e, 5))
    assert(got.values.toSet.size == 1, "symmetric graph must give equal ranks")
  }

  test("pagerank concentrates rank on the hub of a star") {
    // spokes all point at the hub; hub points back at one spoke
    val e = Seq("s1" -> "hub", "s2" -> "hub", "s3" -> "hub", "hub" -> "s1")
    val got = prSpark(e, 5)
    assert(got == prRef(e, 5))
    assert(got("hub") > got("s2") && got("s1") > got("s2"))
  }

  test("pagerank handles dangling nodes (sinks keep mass out of circulation)") {
    val e = Seq("a" -> "b", "c" -> "b") // b has no out-edges
    val got = prSpark(e, 3)
    assert(got == prRef(e, 3))
    assert(got("b") > got("a") && got("a") == got("c"))
  }

  test("pagerank local endgame is bit-equal to the distributed path") {
    // the local path takes over below the edge threshold; both must
    // produce the identical fixed-point integers (and match the ref)
    val e = Seq("s1" -> "hub", "s2" -> "hub", "s3" -> "hub", "hub" -> "s1",
      "a" -> "b", "b" -> "c", "c" -> "a")
    val local = prSpark(e, 5)            // default threshold -> local
    val dist = prSparkDistributed(e, 5)  // forced distributed
    assert(local == dist, s"local $local != distributed $dist")
    assert(local == prRef(e, 5))
  }

  test("assumeDistinct equals the deduping path on an already-distinct edge set") {
    val e = Seq("s1" -> "hub", "s2" -> "hub", "s3" -> "hub", "hub" -> "s1",
      "a" -> "b", "b" -> "c", "c" -> "a")
    val safe = prSpark(e, 4)
    val skip = PageRank.ranks(e.toDF("src", "dst"), 4, assumeDistinct = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(skip == safe)
    // forced distributed with the skip, too
    val skipDist = PageRank.ranks(e.toDF("src", "dst"), 4,
      localFinishEdges = 0L, assumeDistinct = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(skipDist == safe)
  }

  test("withRanks releases every RDD it persisted (no cache leak)") {
    val e = Seq("a" -> "b", "b" -> "c", "c" -> "a")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val got = PageRank.withRanks(e.toDF("src", "dst"), 3)(
      _.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    assert(got == prRef(e, 3)) // same answer as the lazy variant
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"withRanks left RDDs persisted: ${after -- before}")
  }

  // --- interval union ----------------------------------------------

  private def cov(spans: Seq[(String, Long, Long)]): Map[String, (Long, Long)] =
    Intervals.coverage(spans.toDF("k", "s", "e"), col("k"), col("s"), col("e"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("interval coverage merges overlaps, keeps gaps, and joins touching spans") {
    val got = cov(Seq(
      ("u", 0L, 10L), ("u", 5L, 15L),   // overlap -> [0,15)
      ("u", 15L, 20L),                  // touching -> extends to [0,20)
      ("u", 30L, 40L),                  // gap -> second span
      ("v", 0L, 100L), ("v", 10L, 20L)  // nested -> absorbed
    ))
    assert(got == Map("u" -> ((2L, 30L)), "v" -> ((1L, 100L))))
  }

  test("interval merge emits the exact merged span bounds") {
    val spans = Intervals.mergeSpans(
      Seq(("u", 0L, 10L), ("u", 5L, 15L), ("u", 30L, 40L)).toDF("k", "s", "e"),
      col("k"), col("s"), col("e"))
      .orderBy("span_start").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(spans.toSeq == Seq((0L, 15L), (30L, 40L)))
  }

  test("interval coverage with duplicate identical spans is deterministic") {
    val got = cov(Seq(("u", 0L, 10L), ("u", 0L, 10L), ("u", 0L, 10L)))
    assert(got == Map("u" -> ((1L, 10L))))
  }

  test("interval overlapJoin finds exactly the brute-force overlap pairs") {
    // spans crafted to cross bin boundaries, nest, touch, and miss
    val left = Seq((1L, "u", 0L, 100L), (2L, "u", 250L, 260L), (3L, "v", 0L, 50L),
      (4L, "u", 990L, 1010L)).toDF("lid", "lk", "ls", "le")
    val right = Seq((11L, "u", 50L, 150L), (12L, "u", 100L, 200L), (13L, "u", 255L, 256L),
      (14L, "v", 50L, 60L), (15L, "u", 1000L, 1001L)).toDF("rid", "rk", "rs", "re")
    for (bin <- Seq(7L, 100L, 1000L)) {
      val got = Intervals.overlapJoin(left, "lk", "ls", "le", right, "rk", "rs", "re", bin)
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = left.crossJoin(right)
        .filter(col("lk") === col("rk") && col("ls") < col("re") && col("rs") < col("le"))
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"bin=$bin")
      // touching spans ([0,50) vs [50,60)) are NOT overlaps; boundary
      // crossers ([990,1010) vs [1000,1001)) are
      assert(!got.contains((3L, 14L)) && got.contains((4L, 15L)), s"bin=$bin")
    }
  }

  test("interval overlapJoin survives inverted spans (e << s) without exploding") {
    // an inverted span used to drive sequence(s div bin, (e-1) div bin)
    // through a huge descending range — one bad row OOMing the job. The
    // half-open contract says [s,e) with e <= s is empty: the row must
    // be dropped, everything else joined as before.
    val left = Seq((1L, "u", 0L, 100L), (2L, "u", 5_000_000_000L, 10L))
      .toDF("lid", "lk", "ls", "le")
    val right = Seq((11L, "u", 50L, 150L), (12L, "u", 60L, 60L)) // empty right span too
      .toDF("rid", "rk", "rs", "re")
    val got = Intervals.overlapJoin(left, "lk", "ls", "le", right, "rk", "rs", "re", 7L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 11L)), got.toString)
  }

  // --- fuzzy join --------------------------------------------------

  test("deletion neighborhood of 'abc' at d=2 is exactly the 0/1/2-deletion set") {
    val got = spark.range(1).select(FuzzyJoin.neighborhood(lit("abc"), 2).as("v"))
      .collect()(0).getSeq[String](0).toSet
    assert(got == Set("abc", "ab", "ac", "bc", "a", "b", "c"))
  }

  test("fuzzy join finds exactly the brute-force pair set (exact blocking)") {
    val names = Seq("kitten", "sitten", "sittin", "sitting", "mitten",
      "bitten", "kitchen", "a", "", "ab", "ba", "widget", "gadget")
    val l = names.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("lid", "lname")
    val r = names.zipWithIndex.map { case (n, i) => (i.toLong + 100, n) }.toDF("rid", "rname")
    for (d <- 0 to 2) {
      val got = FuzzyJoin.join(l, col("lname"), r, col("rname"), d)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val want = l.crossJoin(r)
        .filter(levenshtein(col("lname"), col("rname")) <= d)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got == want, s"d=$d: blocking missed or invented pairs")
    }
  }

  test("fuzzy join reports the verified edit distance") {
    val l = Seq((1L, "kitten")).toDF("lid", "lname")
    val r = Seq((2L, "sitten"), (3L, "sittin"), (4L, "kitten")).toDF("rid", "rname")
    val got = FuzzyJoin.join(l, col("lname"), r, col("rname"), 2)
      .select("rid", "edit_dist").collect().map(x => (x.getLong(0), x.getInt(1))).toMap
    assert(got == Map(2L -> 1, 3L -> 2, 4L -> 0))
  }

  test("fuzzy join preserves duplicate-row multiplicity like the brute force") {
    // identical rows are distinct entities (two customers can share a
    // name); the join must emit one pair per ROW pair, matching the
    // cross-join reference, not collapse them with a whole-row distinct
    val l = Seq("kitten", "kitten", "mitten").toDF("lname")
    val r = Seq("sitten", "sitten").toDF("rname")
    val got = FuzzyJoin.join(l, col("lname"), r, col("rname"), 1)
      .groupBy("lname", "rname").count()
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    val want = l.crossJoin(r)
      .filter(levenshtein(col("lname"), col("rname")) <= 1)
      .groupBy("lname", "rname").count()
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(got == want, s"got $got want $want")
    assert(got(("kitten", "sitten")) == 4L) // 2 left rows x 2 right rows
  }

  // --- Triangles ---------------------------------------------------

  private def triRef(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    for {
      Seq(a, b, c) <- nodes.combinations(3)
      if es((a, b)) && es((b, c)) && es((a, c))
      v <- Seq(a, b, c)
    } counts(v) += 1L
    counts.toMap
  }

  test("triangle counts: clique, chain, and brute-force on a random graph") {
    def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
      Triangles.perNodeCounts(edges.toDF("i", "j"), "i", "j")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // K4: 4 triangles; every node is in exactly 3
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    assert(run(k4) == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    // chain a-b-c-d: no triangles at all
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
    // random graph vs brute force (fixed seed)
    val rnd = new scala.util.Random(42)
    val rand = (for (_ <- 1 to 60) yield {
      val a = rnd.nextInt(12).toLong; val b = rnd.nextInt(12).toLong
      (math.min(a, b), math.max(a, b))
    }).filter(e => e._1 != e._2).distinct
    assert(run(rand) == triRef(rand))
  }

  test("triangle input hygiene: non-canonical rows are dropped, not double-counted") {
    // the same triangle fed with one inverted edge (3,2): the filter
    // drops the bad row; the remaining canonical edges no longer close
    val got = Triangles.perNodeCounts(
      Seq((1L, 2L), (3L, 2L), (1L, 3L)).toDF("i", "j"), "i", "j")
      .collect()
    assert(got.isEmpty)
  }

  // --- k-core --------------------------------------------------------

  /** Both directions of every undirected edge (the repo convention). */
  private def undirected(pairs: Seq[(String, String)]) =
    (pairs ++ pairs.map(_.swap)).toDF("src", "dst")

  test("kCore peels a pendant chain through CASCADING rounds, keeps the clique") {
    // 4-clique (every node deg 3) with a 4-node tail hanging off node a:
    // at k=2 the tail peels one node per round (leaf first — genuine
    // multi-round cascade), the clique survives intact
    val clique = for {
      x <- Seq("a", "b", "c", "d"); y <- Seq("a", "b", "c", "d") if x < y
    } yield (x, y)
    val tail = Seq(("a", "t1"), ("t1", "t2"), ("t2", "t3"))
    val got = graft.operators.KCore
      .kCore(undirected(clique ++ tail), "src", "dst", k = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L), got.toString)
  }

  test("kCore of a pure chain at k=2 is empty (everything peels)") {
    val chain = Seq(("1", "2"), ("2", "3"), ("3", "4"), ("4", "5"))
    val got = graft.operators.KCore
      .kCore(undirected(chain), "src", "dst", k = 2).collect()
    assert(got.isEmpty, got.mkString(","))
  }

  test("kCore at k=1 keeps every non-isolated node with its full degree") {
    val edges = Seq(("x", "y"), ("y", "z"))
    val got = graft.operators.KCore
      .kCore(undirected(edges), "src", "dst", k = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("x" -> 1L, "y" -> 2L, "z" -> 1L), got.toString)
  }

  test("kCoreBipartite == kCore on the both-directions edge list (random bipartite graphs)") {
    // the half-row-mass specialization must be output-identical to the
    // general peel at several k on graphs with genuine peel cascades
    val rnd = new scala.util.Random(21)
    val pairs = (for (_ <- 1 to 400) yield
      (s"s${rnd.nextInt(25)}", s"c${rnd.nextInt(40)}")).distinct
    for (k <- Seq(1, 2, 4, 8)) {
      val viaPairs = graft.operators.KCore
        .kCoreBipartite(pairs.toDF("a", "b"), "a", "b", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val viaEdges = graft.operators.KCore
        .kCore(undirected(pairs), "src", "dst", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(viaPairs == viaEdges, s"k=$k: ${viaPairs.size} vs ${viaEdges.size}")
    }
  }

  test("kCore throws loudly when maxIter is exhausted before the fixpoint") {
    // a 6-node pendant chain at k=2 needs > 2 rounds to fully peel
    val chain = Seq(("1", "2"), ("2", "3"), ("3", "4"), ("4", "5"), ("5", "6"))
    val e = intercept[IllegalStateException] {
      graft.operators.KCore.kCore(undirected(chain), "src", "dst", k = 2, maxIter = 2)
    }
    assert(e.getMessage.contains("not a k-core"), e.getMessage)
  }
}
