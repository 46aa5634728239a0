package graft

import graft.functions.PdfText
import org.apache.spark.sql.functions._

/** T14's PDF leg (study_scraper/fulltext.py:81-92) against PDFs crafted
  * in-test: raw and FlateDecode content streams, TJ kerning arrays, the
  * literal-string escape set, hex strings, multi-stream page joins, and
  * the best-effort skips (unsupported filters, corrupt zlib, non-PDF). */
class PdfTextSpec extends SparkSpec {

  private def latin1(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Assemble a minimal one-object-per-stream PDF around content streams. */
  private def pdf(streams: (Array[Byte], Option[String])*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(latin1("%PDF-1.4\n"))
    streams.zipWithIndex.foreach { case ((data, filter), idx) =>
      val f = filter.map(n => s" /Filter /$n").getOrElse("")
      out.write(latin1(s"${idx + 1} 0 obj\n<< /Length ${data.length}$f >>\nstream\n"))
      out.write(data)
      out.write(latin1("\nendstream\nendobj\n"))
    }
    out.write(latin1("trailer\n<< /Size 9 >>\n%%EOF\n"))
    out.toByteArray
  }

  test("raw content stream: Tj text with Td line breaks") {
    val content = latin1("BT /F1 12 Tf 72 700 Td (Hello World) Tj 0 -14 Td (Line two) Tj ET")
    assert(PdfText.extract(pdf((content, None))) == "Hello World\nLine two")
  }

  test("FlateDecode stream inflates and extracts identically") {
    val content = latin1("BT (Compressed payload) Tj ET")
    val doc = pdf((deflate(content), Some("FlateDecode")))
    assert(PdfText.extract(doc) == "Compressed payload")
  }

  test("TJ arrays concatenate string elements, ignoring kerning numbers") {
    val content = latin1("BT [(Hel) -20 (lo) 4 ( wor) -1.5 (ld)] TJ ET")
    assert(PdfText.extract(pdf((content, None))) == "Hello world")
  }

  test("literal-string escapes: parens, backslash, octal, control, continuation") {
    val content = latin1("BT (a\\(b\\)c\\\\d \\101\\102 x\\ty z\\\nw) Tj ET")
    assert(PdfText.extract(pdf((content, None))) == "a(b)c\\d AB x\ty zw")
  }

  test("nested unescaped parens stay balanced inside one string") {
    val content = latin1("BT (outer (inner) tail) Tj ET")
    assert(PdfText.extract(pdf((content, None))) == "outer (inner) tail")
  }

  test("hex strings decode pairwise with odd-digit padding") {
    // 48 65 6C 6C 6F = Hello ; trailing lone 4 pads to 0x40 = @
    val content = latin1("BT <48656C6C6F> Tj <4> Tj ET")
    assert(PdfText.extract(pdf((content, None))) == "Hello@")
  }

  test("multiple content streams join with newlines, page-style") {
    val p1 = latin1("BT (Page one) Tj ET")
    val p2 = latin1("BT (Page two) Tj ET")
    assert(PdfText.extract(pdf((p1, None), (deflate(p2), Some("FlateDecode"))))
      == "Page one\nPage two")
  }

  test("best-effort skips: unsupported filter, corrupt zlib; text outside BT ignored") {
    val good = latin1("BT (kept) Tj ET")
    val doc = pdf(
      (Array[Byte](1, 2, 3, 4), Some("DCTDecode")),         // image codec → skip
      (latin1("(not shown - outside BT) Tj"), None),         // no BT → ignored
      (Array[Byte](9, 9, 9), Some("FlateDecode")),           // corrupt zlib → skip
      (good, None))
    assert(PdfText.extract(doc) == "kept")
  }

  test("non-PDF bytes and null yield empty") {
    assert(PdfText.extract(latin1("<html>not a pdf</html>")) == "")
    assert(PdfText.extract(null) == "")
  }

  test("the registered pdf_text expression runs codegen'd over a binary column") {
    import spark.implicits._
    val doc = pdf((latin1("BT (From SQL) Tj ET"), None))
    val out = Seq((1L, doc), (2L, latin1("plain bytes")))
      .toDF("id", "payload")
      .select(col("id"), expr("pdf_text(payload)").as("txt"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toList
    assert(out == List((1L, "From SQL"), (2L, "")))
  }
}
