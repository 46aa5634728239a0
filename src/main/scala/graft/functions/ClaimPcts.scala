package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** `claim_pcts(sentence)` — all German-decimal percent claims of a
  * sentence as `array<double>`: every non-overlapping match of
  * `(\d+),(\d+)\s*(?:%|Prozent)` valued as
  * `int_part + decimal_digit_run / 10` (claims.py:57-251; the q32/q59
  * extraction).
  *
  * Value-identical to the SQL composition the DuckDB oracle replays —
  * `transform(regexp_extract_all(s, pattern, 0), m -> CAST(split(m,
  * ',')[0] AS DOUBLE) + CAST(split(split(m, ',')[1], '[^0-9]+')[0] AS
  * DOUBLE) / 10)` — but as ONE byte-level scan per row with no regex
  * engine, no match-string materialization, and no per-match split
  * arrays. Equivalence argument, pinned by ClaimsSpec + a property test:
  *  - greedy digit runs need no backtracking: a shortened `\d+` leaves a
  *    digit as the next char, which can never match `\s*(?:%|Prozent)`
  *    (for group 2) or `,` (for group 1), so run-maximal matching is
  *    exact;
  *  - restart-after-failure at the failed position subsumes Java's
  *    start+1 restarts: a successful match starting INSIDE a digit run
  *    succeeds iff one starting at the run's head does (the continuation
  *    after the shared comma is identical), and later starts are all
  *    revisited by the forward scan;
  *  - `\d`/`\s` are ASCII-only in un-flagged Java regex, and UTF-8
  *    multi-byte continuation bytes have the high bit set, so a byte
  *    scan cannot misread a multi-byte character as a digit, space,
  *    '%', or 'P'.
  */
case class ClaimPcts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "claim_pcts"

  override def nullSafeEval(s: Any): Any =
    ClaimPcts.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ClaimPcts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ClaimPcts =
    copy(child = newChild)
}

object ClaimPcts {

  private val Prozent = "Prozent".getBytes("US-ASCII")

  private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  // Java regex \s without UNICODE_CHARACTER_CLASS: [ \t\n\x0B\f\r]
  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    var out: Array[Double] = null
    var nOut = 0
    var i = 0
    while (i < n) {
      if (!isDigit(bytes(i))) i += 1
      else {
        // group 1: maximal digit run
        val r1 = i
        var k = i
        while (k < n && isDigit(bytes(k))) k += 1
        var matched = false
        if (k + 1 < n && bytes(k) == ',' && isDigit(bytes(k + 1))) {
          // group 2: maximal digit run after the comma
          val r2 = k + 1
          var e = r2
          while (e < n && isDigit(bytes(e))) e += 1
          var p = e
          while (p < n && isSpace(bytes(p))) p += 1
          var end = -1
          if (p < n && bytes(p) == '%') end = p + 1
          else if (p + Prozent.length <= n) {
            var q = 0
            while (q < Prozent.length && bytes(p + q) == Prozent(q)) q += 1
            if (q == Prozent.length) end = p + Prozent.length
          }
          if (end >= 0) {
            // CAST(digit-run AS DOUBLE) semantics: plain non-negative
            // digit strings parse identically via parseDouble
            val v = java.lang.Double.parseDouble(ascii(bytes, r1, k)) +
              java.lang.Double.parseDouble(ascii(bytes, r2, e)) / 10
            if (out == null) out = new Array[Double](4)
            else if (nOut == out.length) out = java.util.Arrays.copyOf(out, nOut * 2)
            out(nOut) = v
            nOut += 1
            i = end // non-overlapping: continue after the match
            matched = true
          }
        }
        if (!matched) i = k // re-scan from the first non-digit; any match
        // starting inside this run is equivalent to one at its head
      }
    }
    if (nOut == 0) new GenericArrayData(Array.empty[Any])
    else {
      val boxed = new Array[Any](nOut)
      var j = 0
      while (j < nOut) { boxed(j) = out(j); j += 1 }
      new GenericArrayData(boxed)
    }
  }

  private def ascii(bytes: Array[Byte], from: Int, until: Int): String =
    new String(bytes, from, until - from, java.nio.charset.StandardCharsets.US_ASCII)
}
