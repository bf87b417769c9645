package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** jusText-style HTML block-text extraction (Pomikálek 2011's
  * block-segmentation idea, reduced to deterministic rules) — the real
  * front stage of a web-corpus pipeline, where the regex `text_clean`
  * is only right for tags-in-prose. Built on a hand-rolled TOLERANT
  * tokenizer (real HTML is not XML: unclosed tags, bare `<` in text,
  * attributes holding `>` — the JDK's strict XML stack rejects all of
  * it), all plain JDK string work, offline by construction.
  *
  * Contract (every rule deterministic so a closed-form fixture's
  * expected output is computable in plain SQL):
  *
  *  - `<!-- -->` comments, `<!...>` doctypes and `<?...?>` processing
  *    instructions are skipped; a `<` not followed by a letter, `/`,
  *    `!` or `?` is literal text;
  *  - attribute values may contain quoted `>`;
  *  - `<script>`/`<style>` are RAW-TEXT elements: content is skipped
  *    verbatim to the matching case-insensitive close tag (a `<` inside
  *    them never opens a tag);
  *  - subtrees under boilerplate tags (script, style, noscript, nav,
  *    header, footer, aside, template, svg) are dropped, nesting
  *    counted; an unclosed drop tag drops the rest of the document;
  *  - block-level tags (p, div, h1-h6, li, br, title, td, ...) open
  *    and close BLOCKS; block text is whitespace-normalized (runs
  *    collapsed to one space, trimmed) and empty blocks vanish;
  *  - entities decode at append time: the 6 core named entities
  *    (amp, lt, gt, quot, apos, nbsp→space) plus numeric `&#NN;` /
  *    `&#xHH;`; anything else stays literal;
  *  - LINK DENSITY: characters appended inside `<a>` count separately
  *    (non-whitespace chars, counted raw, before normalization); a
  *    block whose link share exceeds 0.5 is dropped — the menu/footer
  *    filter for nav-like blocks that survive the tag rules.
  */
object HtmlText {

  val DropTags: Set[String] = Set("script", "style", "noscript", "nav",
    "header", "footer", "aside", "template", "svg")

  val RawTextTags: Set[String] = Set("script", "style")

  val BlockTags: Set[String] = Set("html", "head", "body", "title", "p",
    "div", "section", "article", "main", "h1", "h2", "h3", "h4", "h5",
    "h6", "ul", "ol", "li", "table", "thead", "tbody", "tr", "td", "th",
    "br", "hr", "blockquote", "pre", "form")

  val MaxLinkDensity: Double = 0.5

  private val Entities = Map("amp" -> "&", "lt" -> "<", "gt" -> ">",
    "quot" -> "\"", "apos" -> "'", "nbsp" -> " ")

  /** Decode the entity starting at `i` (html(i) == '&'). Returns
    * (decoded text, next index); an unrecognized or unterminated
    * entity yields a literal "&" advancing one char. */
  private def decodeEntity(html: String, i: Int): (String, Int) = {
    val semi = html.indexOf(';', i + 1)
    if (semi < 0 || semi > i + 10) ("&", i + 1)
    else {
      val body = html.substring(i + 1, semi)
      if (body.startsWith("#x") || body.startsWith("#X")) {
        val hex = body.drop(2)
        if (hex.nonEmpty && hex.forall(c => Character.digit(c, 16) >= 0) &&
            Character.isValidCodePoint(Integer.parseInt(hex, 16)))
          (new String(Character.toChars(Integer.parseInt(hex, 16))), semi + 1)
        else ("&", i + 1)
      } else if (body.startsWith("#")) {
        val dec = body.drop(1)
        if (dec.nonEmpty && dec.forall(_.isDigit) && dec.length <= 7 &&
            Character.isValidCodePoint(dec.toInt))
          (new String(Character.toChars(dec.toInt)), semi + 1)
        else ("&", i + 1)
      } else Entities.get(body.toLowerCase) match {
        case Some(s) => (s, semi + 1)
        case None    => ("&", i + 1)
      }
    }
  }

  private def indexOfIgnoreCase(hay: String, needle: String, from: Int): Int = {
    var i = math.max(from, 0)
    val last = hay.length - needle.length
    while (i <= last) {
      if (hay.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  /** Extract block texts per the contract above. */
  def blocks(html: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder
    var curLink = 0 // non-ws chars appended while inside >= 1 <a>
    var curText = 0 // non-ws chars appended
    var aDepth = 0
    var dropDepth = 0
    val n = html.length

    def appendText(s: String): Unit = if (dropDepth == 0) {
      cur.append(s)
      var k = 0
      while (k < s.length) {
        if (!Character.isWhitespace(s.charAt(k))) {
          curText += 1
          if (aDepth > 0) curLink += 1
        }
        k += 1
      }
    }

    def flush(): Unit = {
      val (link, tot) = (curLink, curText)
      curLink = 0; curText = 0
      val norm = cur.toString.trim.replaceAll("\\s+", " ")
      cur.setLength(0)
      if (norm.nonEmpty && !(tot > 0 && link.toDouble / tot > MaxLinkDensity))
        out += norm
    }

    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = html.charAt(i + 1)
        if (c1 == '!') {
          if (html.startsWith("<!--", i)) {
            val e = html.indexOf("-->", i + 4)
            i = if (e < 0) n else e + 3
          } else {
            val e = html.indexOf('>', i)
            i = if (e < 0) n else e + 1
          }
        } else if (c1 == '?') {
          val e = html.indexOf('>', i)
          i = if (e < 0) n else e + 1
        } else if (c1 == '/' || c1.isLetter) {
          val closing = c1 == '/'
          var j = i + (if (closing) 2 else 1)
          val nameStart = j
          while (j < n && html.charAt(j).isLetterOrDigit) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          var selfClose = false
          var done = false
          while (j < n && !done) {
            val ch = html.charAt(j)
            if (ch == '"' || ch == '\'') {
              val e = html.indexOf(ch, j + 1)
              j = if (e < 0) n else e + 1
            } else if (ch == '>') {
              selfClose = j > i && html.charAt(j - 1) == '/'
              j += 1; done = true
            } else j += 1
          }
          i = j
          if (name.nonEmpty) {
            if (BlockTags(name)) flush()
            if (!closing && RawTextTags(name) && !selfClose) {
              val e = indexOfIgnoreCase(html, "</" + name, i)
              if (e < 0) i = n
              else {
                val gt = html.indexOf('>', e)
                i = if (gt < 0) n else gt + 1
              }
            } else if (DropTags(name)) {
              if (!closing && !selfClose) dropDepth += 1
              else if (closing && dropDepth > 0) dropDepth -= 1
            } else if (name == "a") {
              if (!closing && !selfClose) aDepth += 1
              else if (closing && aDepth > 0) aDepth -= 1
            }
          }
        } else {
          appendText("<")
          i += 1
        }
      } else if (c == '&') {
        val (decoded, next) = decodeEntity(html, i)
        appendText(decoded)
        i = next
      } else {
        appendText(String.valueOf(c))
        i += 1
      }
    }
    flush()
    out.toSeq
  }
}

/** [[HtmlText.blocks]] as a native expression: string → array of block
  * texts, one compiled pass per row (CodegenFallback — the parser is
  * plain compiled JVM code; generated-source inlining would buy
  * nothing over the method call). */
case class HtmlBlocksExpr(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "html_blocks"

  override def nullSafeEval(input: Any): Any = {
    val bs = HtmlText.blocks(input.asInstanceOf[UTF8String].toString)
    new GenericArrayData(bs.map(UTF8String.fromString).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlBlocksExpr =
    copy(child = newChild)
}

object HtmlExpressions {
  /** Block texts extracted from an HTML column. */
  def htmlBlocks(html: Column): Column =
    ExpressionUtils.column(HtmlBlocksExpr(ExpressionUtils.expression(html)))
}
