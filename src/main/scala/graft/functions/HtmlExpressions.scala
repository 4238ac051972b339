package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for [[HtmlStrip]] — the HTML-to-text step of a web
  * corpus pipeline, hand-rolled because the naive regex formulation is
  * WRONG on exactly the inputs that matter: `<script>if (a<b) {}`
  * contains a bare `<` inside code, and a `<[^>]*>` regex either
  * truncates the script or leaks half of it into the "text".
  *
  * Semantics (single forward scan, O(n), zero allocation beyond the
  * output builder):
  *   - `<!-- ... -->` comments are dropped whole;
  *   - OPENING `<script ...>` / `<style ...>` drop their whole block
  *     INCLUDING contents (case-insensitive close-tag search — code/CSS
  *     is not text); a STRAY `</script>` with no opener just drops like
  *     any other tag;
  *   - every other `<...>` tag is dropped, with the closing `>` found
  *     QUOTE-AWARE (a `>` inside `title="a>b"` is attribute data, not
  *     the tag close);
  *   - entities decode: `&amp; &lt; &gt; &quot; &apos;`, decimal
  *     `&#NN;` and hex `&#xNN;` (code points through the supplementary
  *     planes); a bare `&` that opens no valid entity stays literal —
  *     real text is full of them, and refusing would quarantine half
  *     the web;
  *   - STRICT on structural malformation: an unterminated tag, comment,
  *     or script/style block returns null (quarantine-drop, the
  *     [[graft.ext.Multimodal]] decoder discipline) — guessing where a
  *     truncated tag "ended" silently corrupts the text.
  */
object HtmlOps {

  def strip(in: UTF8String): UTF8String = {
    if (in == null) return null
    val s = in.toString
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.regionMatches(i, "<!--", 0, 4)) {
          val end = s.indexOf("-->", i + 4)
          if (end < 0) return null // unterminated comment
          i = end + 3
        } else {
          // quote-aware close search: the first '>' may sit INSIDE a
          // quoted attribute value (title="a>b", inline handlers with
          // =>) — taking it as the tag close leaks attribute remnants
          // into the text, the exact first-'>' flaw of the regex form
          val close = findTagClose(s, i + 1)
          if (close < 0) return null // unterminated tag or quote
          // only an OPENING <script>/<style> starts a raw-text block: a
          // STRAY close tag (common in real web HTML) must just drop,
          // not hunt for a matching close and null/truncate the doc
          val isClose = i + 1 < n && s.charAt(i + 1) == '/'
          val name = tagName(s, i + 1, close)
          if (!isClose && (name == "script" || name == "style")) {
            val endTag = indexOfIgnoreCase(s, "</" + name, close + 1)
            if (endTag < 0) return null // unterminated raw-text block
            val endClose = s.indexOf('>', endTag)
            if (endClose < 0) return null
            i = endClose + 1
          } else i = close + 1
        }
      } else if (c == '&') {
        val (cp, next) = entity(s, i)
        if (next > i) { out.appendCodePoint(cp); i = next }
        else { out.append('&'); i += 1 } // bare ampersand: literal
      } else { out.append(c); i += 1 }
    }
    UTF8String.fromString(out.toString)
  }

  /** Index of the tag-closing '>' starting after '<', skipping over
    * single- and double-quoted attribute values; −1 when the tag (or a
    * quote) never closes. */
  private def findTagClose(s: String, from: Int): Int = {
    var j = from
    val n = s.length
    while (j < n) {
      val c = s.charAt(j)
      if (c == '>') return j
      if (c == '"' || c == '\'') {
        val end = s.indexOf(c, j + 1)
        if (end < 0) return -1 // unterminated quote
        j = end + 1
      } else j += 1
    }
    -1
  }

  /** Lower-cased element name starting at `from` (after '<'), stopping
    * at whitespace, '/', or the tag close. */
  private def tagName(s: String, from: Int, close: Int): String = {
    var j = from
    if (j < close && s.charAt(j) == '/') j += 1
    val start = j
    while (j < close && Character.isLetter(s.charAt(j))) j += 1
    s.substring(start, j).toLowerCase(java.util.Locale.ROOT)
  }

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    var i = from
    val limit = s.length - needle.length
    while (i <= limit) {
      if (s.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  /** Numeric character reference, post-validated: surrogate code points
    * (D800–DFFF) are not characters — the HTML spec maps them to U+FFFD,
    * and appending a lone surrogate would turn into '?' mojibake inside
    * UTF8String's encoder. A NUL reference (`&#0;`) is the spec's other
    * invalid-codepoint class and maps to U+FFFD the same way — falling
    * back to literal '&#0;' text would treat the two classes
    * inconsistently. */
  private def numericCp(cp: Long, after: Int, fallback: Int): (Int, Int) =
    if ((cp >= 0xD800 && cp <= 0xDFFF) || cp == 0L) (0xFFFD, after)
    else if (cp > 0 && cp <= Character.MAX_CODE_POINT) (cp.toInt, after)
    else (0, fallback)

  /** Decode the entity starting at `i` ('&'); returns (codePoint,
    * indexAfter) or (_, i) when no valid entity starts here. */
  private def entity(s: String, i: Int): (Int, Int) = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 12) return (0, i)
    val body = s.substring(i + 1, semi)
    body match {
      case "amp"  => ('&'.toInt, semi + 1)
      case "lt"   => ('<'.toInt, semi + 1)
      case "gt"   => ('>'.toInt, semi + 1)
      case "quot" => ('"'.toInt, semi + 1)
      case "apos" => ('\''.toInt, semi + 1)
      case _ if body.startsWith("#x") || body.startsWith("#X") =>
        val hex = body.substring(2)
        if (hex.nonEmpty && hex.forall(ch => Character.digit(ch, 16) >= 0)) {
          val cp = java.lang.Long.parseLong(hex, 16)
          numericCp(cp, semi + 1, i)
        } else (0, i)
      case _ if body.startsWith("#") =>
        val dec = body.substring(1)
        if (dec.nonEmpty && dec.forall(_.isDigit) && dec.length <= 8)
          numericCp(dec.toLong, semi + 1, i)
        else (0, i)
      case _ => (0, i)
    }
  }
}

/** Codegen'd HTML-to-text strip ([[HtmlOps.strip]] semantics); null on
  * structurally malformed input — filter the nulls as the quarantine
  * split, the same shape as the media decoders. */
case class HtmlStrip(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"html_strip needs a string, got ${t.simpleString}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true // malformed input -> null

  override def nullSafeEval(input: Any): Any =
    HtmlOps.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.HtmlOps.strip($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): HtmlStrip =
    copy(child = newChild)
}

object HtmlFunctions {
  def html_strip(text: Column): Column =
    GraftBridge.column(HtmlStrip(GraftBridge.expression(text)))
}
