package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `pdf_text(binary)` — best-effort PDF text extraction as a native
  * expression, the T14 leg the reference runs through pypdf's
  * `page.extract_text()` (study_scraper/fulltext.py:81-92). Pure JVM:
  * FlateDecode streams inflate via `java.util.zip.Inflater`; content
  * streams are tokenized for the PDF text operators.
  *
  * Scope — a real extractor for the COMMON case, honest about the rest:
  *  - stream objects found by `stream`/`endstream` scan; `/FlateDecode`
  *    (zlib) and unfiltered streams decode, any other `/Filter` (DCT,
  *    LZW, CCITT — image codecs) is skipped, as pypdf skips non-text
  *    XObjects;
  *  - inside BT…ET blocks, `Tj`, `'`, `"` show the pending literal/hex
  *    string and `TJ` shows each string element of its array (kerning
  *    numbers ignored — pypdf's pre-layout behavior); `Td`/`TD`/`T*`
  *    and `ET` emit a line break;
  *  - literal strings honor the full escape set (\n \r \t \b \f \( \)
  *    \\ \ooo, backslash-EOL continuation) and nested parens; hex
  *    strings decode pairwise with odd-digit zero padding;
  *  - bytes map to text via Latin-1 — exact for ASCII/WinAnsi simple
  *    fonts, best-effort for symbolic/CID fonts (where pypdf without
  *    embedded CMaps degrades the same way);
  *  - any malformed segment (bad zlib data, unterminated stream) is
  *    skipped, never thrown — the reference's per-page try/except.
  * Non-PDF input (no %PDF- magic) and NULL yield "".
  */
case class PdfText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "pdf_text"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a binary argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(b: Any): Any =
    UTF8String.fromString(PdfText.extract(b.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.PdfText.extract($c))")

  override protected def withNewChildInternal(newChild: Expression): PdfText =
    copy(child = newChild)
}

object PdfText {

  private val Stream = "stream".getBytes("ISO-8859-1")
  private val EndStream = "endstream".getBytes("ISO-8859-1")

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  def extract(pdf: Array[Byte]): String = {
    if (pdf == null || pdf.length < 5 ||
      pdf(0) != '%' || pdf(1) != 'P' || pdf(2) != 'D' || pdf(3) != 'F' || pdf(4) != '-')
      return ""
    val parts = new StringBuilder
    var i = 0
    var scanning = true
    while (scanning) {
      val s = indexOf(pdf, Stream, i)
      if (s < 0) scanning = false
      else {
        var d = s + Stream.length
        if (d < pdf.length && pdf(d) == '\r') d += 1
        if (d < pdf.length && pdf(d) == '\n') d += 1
        val e = indexOf(pdf, EndStream, d)
        if (e < 0) scanning = false
        else {
          var de = e
          if (de > d && pdf(de - 1) == '\n') de -= 1
          if (de > d && pdf(de - 1) == '\r') de -= 1
          // the stream dictionary sits immediately before the keyword;
          // 600 bytes comfortably covers /Length /Filter /DecodeParms —
          // but cut at this object's own "obj" keyword so a PREVIOUS
          // object's /Filter can never bleed into the sniff
          val windowStart = math.max(0, s - 600)
          val window = new String(pdf, windowStart, s - windowStart, "ISO-8859-1")
          val objAt = window.lastIndexOf("obj")
          val dict = if (objAt >= 0) window.substring(objAt) else window
          val raw = java.util.Arrays.copyOfRange(pdf, d, de)
          val data =
            if (dict.contains("/FlateDecode")) inflate(raw)
            else if (dict.contains("/Filter")) null // unsupported codec → skip
            else raw
          if (data != null) {
            val txt = contentText(data)
            if (txt.nonEmpty) {
              if (parts.nonEmpty) parts.append('\n')
              parts.append(txt)
            }
          }
          i = e + EndStream.length
        }
      }
    }
    parts.result().trim
  }

  private def inflate(in: Array[Byte]): Array[Byte] =
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(in)
      val out = new java.io.ByteArrayOutputStream(math.max(64, in.length * 4))
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && inf.needsDictionary()) throw new java.util.zip.DataFormatException("dict")
      }
      inf.end()
      out.toByteArray
    } catch { case _: Exception => null }

  /** Tokenize a decoded content stream for the text-showing operators. */
  private def contentText(data: Array[Byte]): String = {
    val n = data.length
    val sb = new StringBuilder
    val pending = new StringBuilder
    var inText = false
    var i = 0
    def isDelim(c: Char): Boolean =
      c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
        c == '{' || c == '}' || c == '/' || c == '%' ||
        c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' || c == 0.toChar
    while (i < n) {
      val c = (data(i) & 0xff).toChar
      if (c == '(') {
        // literal string with nesting + escapes
        i += 1
        var depth = 1
        while (i < n && depth > 0) {
          val ch = (data(i) & 0xff).toChar
          if (ch == '\\' && i + 1 < n) {
            val esc = (data(i + 1) & 0xff).toChar
            esc match {
              case 'n' => pending.append('\n'); i += 2
              case 'r' => pending.append('\r'); i += 2
              case 't' => pending.append('\t'); i += 2
              case 'b' => pending.append('\b'); i += 2
              case 'f' => pending.append('\f'); i += 2
              case '\r' => i += 2; if (i < n && data(i) == '\n') i += 1 // line continuation
              case '\n' => i += 2
              case d if d >= '0' && d <= '7' =>
                var v = 0; var k = 0; i += 1
                while (k < 3 && i < n && data(i) >= '0' && data(i) <= '7') {
                  v = v * 8 + (data(i) - '0'); i += 1; k += 1
                }
                pending.append((v & 0xff).toChar)
              case other => pending.append(other); i += 2 // \( \) \\ and any other
            }
          } else {
            if (ch == '(') depth += 1
            else if (ch == ')') depth -= 1
            if (depth > 0) pending.append(ch)
            i += 1
          }
        }
      } else if (c == '<' && i + 1 < n && (data(i + 1) & 0xff).toChar == '<') {
        i += 2 // dictionary open — not a string
      } else if (c == '<') {
        // hex string
        i += 1
        var hi = -1
        while (i < n && (data(i) & 0xff).toChar != '>') {
          val ch = (data(i) & 0xff).toChar
          val v = Character.digit(ch, 16)
          if (v >= 0) {
            if (hi < 0) hi = v
            else { pending.append(((hi << 4) | v).toChar); hi = -1 }
          }
          i += 1
        }
        if (hi >= 0) pending.append((hi << 4).toChar) // odd digit → pad 0
        i += 1
      } else if (c == '%') {
        while (i < n && data(i) != '\n' && data(i) != '\r') i += 1
      } else if (c == '/') {
        i += 1
        while (i < n && !isDelim((data(i) & 0xff).toChar)) i += 1
      } else if (!isDelim(c) && !((c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.')) {
        // operator token
        val start = i
        while (i < n && !isDelim((data(i) & 0xff).toChar)) i += 1
        val op = new String(data, start, i - start, "ISO-8859-1")
        op match {
          case "BT" => inText = true; pending.setLength(0)
          case "ET" =>
            if (inText) sb.append('\n')
            inText = false; pending.setLength(0)
          case "Tj" | "'" | "\"" | "TJ" =>
            if (inText) sb.append(pending)
            pending.setLength(0)
          case "Td" | "TD" | "T*" =>
            if (inText) sb.append('\n')
            pending.setLength(0)
          case _ => pending.setLength(0)
        }
      } else {
        // number, array bracket, or whitespace — strings in a TJ array
        // accumulate across these into `pending`
        i += 1
      }
    }
    // collapse runs of blank lines the Td-per-line convention produces
    sb.result().replaceAll("\n{2,}", "\n").trim
  }
}
