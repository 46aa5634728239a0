package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the winnowing fingerprint's rolling
  * minimum gram hash (q31, reference change-detection family —
  * study_scraper/models.py:22-26): the minimum over all character
  * `gramLen`-gram start positions of the engine's portable 60-bit hash
  * `conv(substring(md5(concat('<seed>:', substring(s, i, gramLen))), 1,
  * 15), 16, 10)`.
  *
  * Value-identical to the SQL composition (the DuckDB oracle replays that
  * composition unchanged), but in ONE hand-written loop per row:
  *  - the per-position `explode` shape (r6) copied the whole normalized
  *    document string into every one of its ~300 exploded rows and paid a
  *    shuffle + partial aggregate just to take a min;
  *  - the `array_min(transform(...))` shape evaluates the lambda through
  *    the interpreted expression walker per ELEMENT (higher-order
  *    functions are not codegen'd) — measured slower than the explode.
  * Here the digest runs over a reusable thread-local MD5 instance on byte
  * slices of one UTF-8 copy of the row's string — no per-gram allocation
  * beyond the 16-byte digest buffer, and codegen emits a static call so
  * the expression stays inside WholeStageCodegen.
  */
case class MinGramHash(child: Expression, seed: Int, gramLen: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "min_gram_hash"

  override def nullSafeEval(s: Any): Any =
    MinGramHash.compute(s.asInstanceOf[UTF8String], seed, gramLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinGramHash.compute($c, $seed, $gramLen)")

  override protected def withNewChildInternal(newChild: Expression): MinGramHash =
    copy(child = newChild)
}

object MinGramHash {

  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Min over SQL positions i = 1..greatest(numChars-gramLen+1, 1) of the
    * 60-bit md5-prefix hash of `"<seed>:" + substring(s, i, gramLen)` —
    * exactly the h60 composition, including the short-string case (one
    * gram: the whole string, even when empty). Substring positions are
    * CHARACTER positions (SQL semantics), so the byte walk tracks
    * codepoint starts, not byte offsets.
    */
  def compute(s: UTF8String, seed: Int, gramLen: Int): Long = {
    val bytes = s.getBytes
    // char-start byte offsets; offsets(n) = bytes.length sentinel
    val nBytes = bytes.length
    var nChars = 0
    var b = 0
    while (b < nBytes) { b += utf8Len(bytes(b)); nChars += 1 }
    val offsets = new Array[Int](nChars + 1)
    b = 0
    var c = 0
    while (b < nBytes) { offsets(c) = b; b += utf8Len(bytes(b)); c += 1 }
    offsets(nChars) = nBytes

    val prefix = (seed.toString + ":").getBytes("UTF-8")
    val md = digests.get()
    val out = new Array[Byte](16)
    val lastStart = math.max(nChars - gramLen, 0) // 0-based last gram start
    var min = Long.MaxValue
    var i = 0
    while (i <= lastStart) {
      val from = offsets(i)
      val until = offsets(math.min(i + gramLen, nChars))
      md.reset()
      md.update(prefix)
      md.update(bytes, from, until - from)
      md.digest(out, 0, 16)
      // first 15 hex chars base-16 == first 7 bytes << 4 | high nibble of byte 7
      var v = 0L
      var k = 0
      while (k < 7) { v = (v << 8) | (out(k) & 0xffL); k += 1 }
      v = (v << 4) | ((out(7) & 0xffL) >>> 4)
      if (v < min) min = v
      i += 1
    }
    min
  }

  private def utf8Len(firstByte: Byte): Int = {
    val u = firstByte & 0xff
    if (u < 0x80) 1 else if (u < 0xe0) 2 else if (u < 0xf0) 3 else 4
  }
}
