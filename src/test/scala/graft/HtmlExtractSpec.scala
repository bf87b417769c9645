package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{HtmlExpressions, HtmlText}

/** Contract tests for the jusText-style HTML block extractor: tag
  * tokenization over real-world malformation, raw-text elements,
  * drop-subtree nesting, entity decoding, block segmentation and the
  * link-density filter. */
class HtmlExtractSpec extends SparkSpecBase {
  import spark.implicits._

  test("basic page: blocks in order, boilerplate and raw-text content gone") {
    val html = "<html><head><title>T</title><style>p{x:1}</style>" +
      "<script>var a = 1 < 2 && \"</div>\";</script></head>" +
      "<body><nav><a href='/'>Home</a></nav><h1>Head line</h1>" +
      "<p>Body text here</p><footer>foot</footer></body></html>"
    assert(HtmlText.blocks(html) == Seq("T", "Head line", "Body text here"))
  }

  test("nesting: nested divs segment blocks; nested drop tags count depth") {
    val html = "<div>a<div>b<div>c</div>d</div>e</div>"
    assert(HtmlText.blocks(html) == Seq("a", "b", "c", "d", "e"))
    // a nav inside a nav: inner close must NOT resurrect text
    val nested = "<p>keep1</p><nav>x<nav>y</nav>z</nav><p>keep2</p>"
    assert(HtmlText.blocks(nested) == Seq("keep1", "keep2"))
    // aside inside div: surrounding text survives, aside content dies
    assert(HtmlText.blocks("<div>pre <aside>ad</aside>post</div>") == Seq("pre post"))
  }

  test("entities: named, numeric decimal, numeric hex, unknown stays literal") {
    assert(HtmlText.blocks("<p>a &amp; b &lt;c&gt; &quot;d&quot; &apos;e&apos;</p>") ==
      Seq("a & b <c> \"d\" 'e'"))
    assert(HtmlText.blocks("<p>x&#65;y &#x42;z</p>") == Seq("xAy Bz"))
    assert(HtmlText.blocks("<p>n&nbsp;b</p>") == Seq("n b"))
    assert(HtmlText.blocks("<p>&copy; &unknown; &noend</p>") ==
      Seq("&copy; &unknown; &noend"))
    // numeric references above U+10FFFF are invalid code points —
    // real crawled HTML contains them; they must stay literal, not
    // crash the expression (Character.toChars would throw)
    assert(HtmlText.blocks("<p>a&#9999999;b &#x110000;c &#1114111;d</p>") ==
      Seq("a&#9999999;b &#x110000;c " + new String(Character.toChars(0x10FFFF)) + "d"))
  }

  test("malformed input: bare <, quoted > in attributes, unclosed tags, stray close") {
    // '<' not followed by a letter is literal text
    assert(HtmlText.blocks("<p>1 < 2 and x <= y</p>") == Seq("1 < 2 and x <= y"))
    // a quoted '>' inside an attribute does not end the tag
    assert(HtmlText.blocks("<div data-x=\"a>b\">ok</div>") == Seq("ok"))
    // unclosed block tag: text still flushes at EOF
    assert(HtmlText.blocks("<p>no close") == Seq("no close"))
    // stray close tags are ignored, depth never goes negative
    assert(HtmlText.blocks("</div></nav><p>alive</p>") == Seq("alive"))
    // unclosed raw-text element swallows the rest (documented)
    assert(HtmlText.blocks("<p>seen</p><script>var x;") == Seq("seen"))
    // comment without terminator swallows the rest (documented)
    assert(HtmlText.blocks("<p>seen</p><!-- open") == Seq("seen"))
  }

  test("link density: link-heavy blocks drop, text-heavy blocks keep their links") {
    // 6 link chars of 7 -> dropped
    assert(HtmlText.blocks("<div><a>one</a> <a>two</a> x</div>") == Seq.empty)
    // links embedded in prose survive (density well under 0.5)
    assert(HtmlText.blocks("<p>read the <a>manual</a> before filing a report</p>") ==
      Seq("read the manual before filing a report"))
    // exactly at the boundary: density must EXCEED 0.5 to drop
    assert(HtmlText.blocks("<p><a>ab</a>cd</p>") == Seq("abcd"))
  }

  test("whitespace: runs collapse, blocks trim, empty blocks vanish") {
    assert(HtmlText.blocks("<p>  a \n\t b  </p><p>   </p><p></p><div>c</div>") ==
      Seq("a b", "c"))
  }

  test("expression: html_blocks over a DataFrame column") {
    val out = Seq(
      (1L, "<p>alpha</p><nav>menu</nav><p>beta</p>"),
      (2L, "<script>s</script><h2>only</h2>"))
      .toDF("id", "html")
      .select(col("id"), HtmlExpressions.htmlBlocks(col("html")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("alpha", "beta"))
    assert(out(2L) == Seq("only"))
  }

  test("html_block_dedup keeps each block text once corpus-wide, first (doc, pos) wins") {
    val rows = SparkEntry.queries("html_block_dedup")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byDoc = rows.map(r => r._1 -> r).toMap
    val minDoc = rows.map(_._1).min
    // every doc has its 4 extracted blocks; the globally-first doc
    // keeps all of them (every block is its own first occurrence)
    assert(rows.forall(_._2 == 4L))
    assert(byDoc(minDoc)._3 == 4L, byDoc(minDoc).toString)
    // the shared boilerplate block survives ONLY in the first doc
    val tailKeepers = rows.filter(_._4.contains("Tail <end>")).map(_._1)
    assert(tailKeepers.toSeq == Seq(minDoc), tailKeepers.mkString(","))
    // unique per-doc blocks always survive: every doc keeps its title
    rows.foreach { case (id, _, _, text) =>
      assert(text.startsWith(s"Doc $id"), s"doc $id lost its unique title block")
    }
    // and the kept counts reconcile with a global distinct-block census
    val allBlocks = SparkEntry.queries("html_extract")(spark, "/root/testdata/sf0.001")
      .collect().map(_.getString(2))
    assert(rows.map(_._3).sum == allBlocks.distinct.length)
  }

  test("registered html_extract emits exactly the oracle's closed-form blocks") {
    val rows = SparkEntry.queries("html_extract")(spark, "/root/testdata/sf0.001")
      .collect()
    val byDoc = rows.groupBy(_.getLong(0))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(byDoc.keySet == docs.keySet)
    byDoc.foreach { case (id, rs) =>
      val blocks = rs.sortBy(_.getInt(1)).map(_.getString(2)).toSeq
      val w = docs(id)
      assert(blocks == Seq(
        s"Doc $id",
        w.take(3).mkString(" "),
        w.take(20).mkString(" ") + " & more!",
        "Tail <end>"), s"doc $id")
    }
  }
}
