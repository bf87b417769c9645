package graft

import graft.operators.BpeTrainer
import org.apache.spark.sql.functions._

/** BPE merge learning pinned against a sequential reference
  * implementation of the same greedy algorithm (exact counts +
  * lexicographic tie-break make the merge sequence fully
  * deterministic, so the distributed run must reproduce it merge for
  * merge). */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  /** Sequential BPE with the identical merge rule (left-to-right greedy
    * fold) and tie-break (count desc, then pair lexicographic). */
  private def ref(words: Map[String, Long], n: Int): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      words.map { case (w, f) => w.split("").filter(_.nonEmpty).toVector -> f }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to n) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.isEmpty) return out.toSeq
      val ((a, b), c) = counts.minBy { case ((x, y), cnt) => (-cnt, x, y) }
      out += ((a, b, c))
      vocab = vocab.groupMapReduce { case (syms, _) =>
        syms.foldLeft(Vector.empty[String]) { (acc, s) =>
          if (acc.nonEmpty && acc.last == a && s == b) acc.init :+ (a + b)
          else acc :+ s
        }
      }(_._2)(_ + _)
    }
    out.toSeq
  }

  private val classic: Map[String, Long] =
    Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  private def wfDf(words: Map[String, Long]) =
    words.toSeq.toDF("word", "freq")

  test("distributed merges equal the sequential reference on the classic corpus") {
    // force the distributed rounds (localFinishWords = 0) — the default
    // takes the local endgame at this vocabulary size
    val got = BpeTrainer.learnMerges(wfDf(classic), 8, localFinishWords = 0L)
      .map(m => (m.a, m.b, m.count))
    assert(got == ref(classic, 8))
    // spot-check the first merge is the expected (e,s) with weight 9
    // (newest x6 + widest x3), per the published worked example
    assert(got.head == (("e", "s", 9L)))
  }

  test("local endgame merges are bit-equal to the distributed rounds") {
    val local = BpeTrainer.learnMerges(wfDf(classic), 8)
      .map(m => (m.a, m.b, m.count))
    val dist = BpeTrainer.learnMerges(wfDf(classic), 8, localFinishWords = 0L)
      .map(m => (m.a, m.b, m.count))
    assert(local == dist, s"local $local != distributed $dist")
    assert(local == ref(classic, 8))
  }

  test("symbols with quotes and backslashes merge correctly (no SQL splicing)") {
    // the public API takes any (word, freq) frame — words outside
    // [a-z]+ must learn/apply exactly like the sequential reference,
    // not mis-parse (the fold is built from Column lambdas, so the
    // learned symbols never enter SQL text)
    val words = Map("don't" -> 4L, "it's" -> 3L, """a\'b""" -> 2L)
    val n = 5
    val got = BpeTrainer.learnMerges(wfDf(words), n).map(m => (m.a, m.b, m.count))
    assert(got == ref(words, n), got.toString)
    val spelled = BpeTrainer.applyMerges(wfDf(words), BpeTrainer.learnMerges(wfDf(words), n))
      .select(col("word"), concat_ws("", col("syms")).as("joined")).collect()
    spelled.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("merging repeated symbols is left-to-right greedy (aaa -> [aa, a])") {
    val words = Map("aaa" -> 1L)
    val merges = BpeTrainer.learnMerges(wfDf(words), 1)
    assert(merges.map(m => (m.a, m.b, m.count)) == Seq(("a", "a", 2L)))
    val toks = BpeTrainer.applyMerges(wfDf(words), merges)
      .select(col("syms")).as[Seq[String]].collect().head
    assert(toks == Seq("aa", "a"))
  }

  test("applyMerges preserves reconstruction: concatenated symbols spell the word") {
    val merges = BpeTrainer.learnMerges(wfDf(classic), 6)
    val bad = BpeTrainer.applyMerges(wfDf(classic), merges)
      .filter(concat_ws("", col("syms")) =!= col("word"))
    assert(bad.isEmpty, bad.collect().mkString(","))
  }

  test("applyMerges with a fixed table matches ordered greedy replacement") {
    // the bpe_encode oracle replays merges as ordered non-overlapping
    // single-char-placeholder replacements; pin the Column fold to that
    // semantic on the order-sensitive words (`another` must spend its
    // `e` on `the`, not `er`; `thththe` must greedy-merge L2R)
    val merges = Seq(
      BpeTrainer.Merge(1, "t", "h", 0), BpeTrainer.Merge(2, "th", "e", 0),
      BpeTrainer.Merge(3, "a", "n", 0), BpeTrainer.Merge(4, "an", "d", 0),
      BpeTrainer.Merge(5, "i", "n", 0), BpeTrainer.Merge(6, "e", "r", 0),
      BpeTrainer.Merge(7, "o", "u", 0), BpeTrainer.Merge(8, "r", "e", 0))
    val words = Map("there" -> 1L, "another" -> 1L, "thththe" -> 1L,
      "mountain" -> 1L, "and" -> 1L, "a" -> 1L)
    val got = BpeTrainer.applyMerges(wfDf(words), merges)
      .select(col("word"), array_join(col("syms"), " "))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("there") == "the re")
    assert(got("another") == "an o the r")
    assert(got("thththe") == "th th the")
    assert(got("mountain") == "m ou n t a in")
    assert(got("and") == "and")
    assert(got("a") == "a")
  }

  test("learning stops early when no pair remains") {
    // single-char words have no adjacent pairs at all
    val merges = BpeTrainer.learnMerges(wfDf(Map("a" -> 3L, "b" -> 2L)), 5)
    assert(merges.isEmpty)
  }

  test("wordFreq lowercases, splits on non-letters and weights by occurrence") {
    val docs = Seq("The cat, the CAT!", "cat").toDF("text")
    val got = BpeTrainer.wordFreq(docs, col("text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("the" -> 2L, "cat" -> 3L))
  }
}
