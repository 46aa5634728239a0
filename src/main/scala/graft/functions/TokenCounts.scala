package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `token_counts(text)` — the per-document token histogram of
  * `explode(split(trim(lower(text)), "\\s+")) → groupBy(token).count()`
  * as ONE codegen'd pass: lowercase once, scan bytes for ASCII-whitespace
  * runs, count maximal non-whitespace runs in an open-addressed map, and
  * return `map<string, bigint>`.
  *
  * Value-identical to the split/explode/count composition (the q76
  * oracle's regexp_split path), argued byte-level:
  *  - Java's un-flagged `\s` is exactly [ \t\n\x0B\f\r] — all ASCII, and
  *    UTF-8 continuation/lead bytes have the high bit set, so a byte scan
  *    cannot misread multi-byte text as whitespace;
  *  - Spark's `trim` strips ONLY the space character (0x20), and Spark's
  *    `split` compiles with limit -1, keeping leading AND trailing empty
  *    strings: after the space-trim, a residual whitespace edge (\t, \n,
  *    \f, \r, \x0B) yields one empty token per edge, and the empty/
  *    all-space input yields exactly one. All three degenerate shapes are
  *    reproduced bit-for-bit (the spec's edge matrix pins them).
  *  - lowercasing the WHOLE text first (UTF8String.toLowerCase, the same
  *    call `lower()` compiles to) commutes with splitting: case mapping
  *    never produces or consumes whitespace for the \s set.
  *
  * Replaces q76's token-stream explode + per-(doc, term) hash aggregate:
  * the occurrence rows never materialize and the aggregate's per-row
  * hashing/buffer work collapses into a per-document HashMap, while the
  * downstream plan (explode of the map) keeps the exact (doc, term,
  * n_occ) rows. TokenCountsSpec pins equality against the composition on
  * the documents corpus plus an edge matrix.
  */
case class TokenCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "token_counts"

  override def nullSafeEval(s: Any): Any =
    TokenCounts.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCounts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCounts =
    copy(child = newChild)
}

object TokenCounts {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def compute(in: UTF8String): MapData = {
    val lower = in.toLowerCase
    val bytes = lower.getBytes
    val counts = new java.util.LinkedHashMap[UTF8String, Long]()
    def bump(tok: UTF8String): Unit =
      counts.put(tok, counts.getOrDefault(tok, 0L) + 1L)
    // Spark trim: spaces only
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == ' ') lo += 1
    while (hi > lo && bytes(hi - 1) == ' ') hi -= 1
    if (lo == hi) bump(UTF8String.fromString("")) // split("", …) == [""]
    else {
      // split(limit = -1): residual ws at an edge → one empty token there
      if (isWs(bytes(lo))) bump(UTF8String.fromString(""))
      var i = lo
      while (i < hi) {
        if (isWs(bytes(i))) i += 1
        else {
          val start = i
          while (i < hi && !isWs(bytes(i))) i += 1
          bump(UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, start, i)))
        }
      }
      if (isWs(bytes(hi - 1))) bump(UTF8String.fromString(""))
    }
    val size = counts.size
    val keys = new Array[Any](size)
    val vals = new Array[Any](size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey
      vals(j) = e.getValue
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }
}
