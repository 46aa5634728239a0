package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared word-3-shingle machinery for the q27 MinHash family: the
  * distinct shingles of `concat_ws(' ', words[i], words[i+1], words[i+2])`
  * over `words = split(trim(text), '\s+')`, reproduced byte-exactly
  * (space-only trim; split limit -1 keeps empty edge tokens — the same
  * edge semantics TokenCounts pins for q76). */
private[functions] object Shingles {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** Word slices (start, end) of the space-trimmed byte range, including
    * empty edge tokens exactly where split(limit = -1) emits them. */
  def words(bytes: Array[Byte]): Array[(Int, Int)] = {
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == ' ') lo += 1
    while (hi > lo && bytes(hi - 1) == ' ') hi -= 1
    val out = new scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    if (lo == hi) { out += ((lo, lo)); return out.toArray } // [""]
    if (isWs(bytes(lo))) out += ((lo, lo))
    var i = lo
    while (i < hi) {
      if (isWs(bytes(i))) i += 1
      else {
        val s = i
        while (i < hi && !isWs(bytes(i))) i += 1
        out += ((s, i))
      }
    }
    if (isWs(bytes(hi - 1))) out += ((hi, hi))
    out.toArray
  }

  /** DISTINCT shingle strings (space-joined word triples). */
  def distinctShingles(text: UTF8String): java.util.LinkedHashSet[String] = {
    val bytes = text.getBytes
    val w = words(bytes)
    val set = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + 2 < w.length) {
      val sb = new java.lang.StringBuilder()
      var k = 0
      while (k < 3) {
        if (k > 0) sb.append(' ')
        val (s, e) = w(i + k)
        sb.append(new String(bytes, s, e - s, java.nio.charset.StandardCharsets.UTF_8))
        k += 1
      }
      set.add(sb.toString)
      i += 1
    }
    set
  }

  // one digest instance per thread, reset per hash — getInstance per call
  // paid a JCA provider lookup + allocation for every distinct
  // shingle/token of every document (~1.5 M/s at sf0.1)
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** `conv(substring(md5(concat('<seed>:', s)), 1, 15), 16, 10)` computed
    * from the digest bytes: the first 15 hex chars are bytes 0..6 plus
    * the high nibble of byte 7 — the full 60-bit TextDedup.h60 value. */
  def h60(seed: Int, s: String): Long = {
    val md = md5.get()
    md.reset()
    md.update(s"$seed:".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** The q27 base hash: h60 seed 0 folded into the affine field. */
  def baseHash(s: String): Long = h60(0, s) % 2147483647L
}

/** `minhash12(text)` — the q27 signature stage as ONE pass per document:
  * distinct word-3-shingles, the md5-based 60-bit base hash per shingle,
  * and the 12 affine-permutation minimums
  * (`min((hb·a_i + b_i) % 2147483647)`, TextDedup.MinhashA/B), returned
  * as `struct(n: int, mh: array<long>)` with n = |distinct shingles|.
  * NULL when the text has fewer than 3 words (no shingles) — such rows
  * cannot band and are filtered, exactly like the r10 shape's
  * `size(words) >= 3` pre-filter.
  *
  * Replaces the shingle explode → distinct shuffle → md5 column → 12-min
  * hash aggregate chain of the r10 q27 (the corpus-wide (doc, shingle)
  * stream never materializes); MinhashSigsSpec pins value parity against
  * that exact composition. */
case class MinhashSigs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("mh", ArrayType(LongType, containsNull = false), nullable = false)))
  override def prettyName: String = "minhash12"

  override def nullSafeEval(s: Any): Any =
    MinhashSigs.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinhashSigs.compute($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)
}

object MinhashSigs {
  // Mirrors TextDedup.MinhashA/B (the oracle carries the same table).
  private val A = Array(257L, 643L, 1031L, 1543L, 2053L, 3079L,
    4099L, 6151L, 8209L, 12289L, 16411L, 24593L)
  private val B = Array(911L, 1213L, 1713L, 2389L, 3391L, 4441L,
    5881L, 7121L, 9973L, 11939L, 14009L, 17327L)

  def compute(text: UTF8String): InternalRow = {
    val shingles = Shingles.distinctShingles(text)
    if (shingles.isEmpty) return null
    val mins = Array.fill(12)(Long.MaxValue)
    val it = shingles.iterator()
    while (it.hasNext) {
      val hb = Shingles.baseHash(it.next())
      var i = 0
      while (i < 12) {
        val h = (hb * A(i) + B(i)) % 2147483647L
        if (h < mins(i)) mins(i) = h
        i += 1
      }
    }
    val boxed = new Array[Any](12)
    var i = 0
    while (i < 12) { boxed(i) = mins(i); i += 1 }
    InternalRow(shingles.size, new GenericArrayData(boxed))
  }
}

/** `simhash60(text)` — the q28 60-bit SimHash signature as ONE pass per
  * document: whitespace tokens WITH multiplicity (split edge semantics as
  * in Shingles.words), h60 seed 99 per distinct token, and the 60 per-bit
  * ±1·count sums signed into the signature — value-identical to the
  * explode + 60-sum aggregate composition it replaces ((h div 2^b) % 2
  * == (h >>> b) & 1 for the non-negative 60-bit h; integer sums are
  * order-exact). Never null: split yields [""] even for empty text, so
  * every document has ≥1 token, matching the old shape's row always
  * existing. */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def nullSafeEval(s: Any): Any =
    SimHash60.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {
  def compute(text: UTF8String): Long = {
    val bytes = text.getBytes
    val w = Shingles.words(bytes)
    // histogram of tokens (WITH multiplicity via counts): one md5 per
    // DISTINCT token, ±count per bit — same sums as per-occurrence ±1
    val counts = new java.util.HashMap[String, Integer]()
    var i = 0
    while (i < w.length) {
      val (s, e) = w(i)
      val tok = new String(bytes, s, e - s, java.nio.charset.StandardCharsets.UTF_8)
      counts.merge(tok, 1, (a, b) => a + b)
      i += 1
    }
    val sums = new Array[Int](60)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val en = it.next()
      val h = Shingles.h60(99, en.getKey)
      val c = en.getValue
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) sums(b) += c else sums(b) -= c
        b += 1
      }
    }
    var sim = 0L
    var b = 0
    while (b < 60) { if (sums(b) > 0) sim |= 1L << b; b += 1 }
    sim
  }
}

/** `shingle_jaccard(a, b)` — exact Jaccard over the two texts' distinct
  * word-3-shingle sets, `|A∩B| / (|A| + |B| − |A∩B|)` as the identical
  * double division the r10 counting-join verify produced. 0.0 when either
  * side has no shingles (such docs never band, so candidates never hit
  * this; stated for totality). */
case class ShingleJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "shingle_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any =
    ShingleJaccard.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ShingleJaccard.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ShingleJaccard = copy(left = newLeft, right = newRight)
}

object ShingleJaccard {
  def compute(a: UTF8String, b: UTF8String): Double = {
    val sa = Shingles.distinctShingles(a)
    val sb = Shingles.distinctShingles(b)
    if (sa.isEmpty || sb.isEmpty) return 0.0
    var inter = 0
    val (small, large) = if (sa.size <= sb.size) (sa, sb) else (sb, sa)
    val it = small.iterator()
    while (it.hasNext) if (large.contains(it.next())) inter += 1
    inter.toDouble / (sa.size + sb.size - inter)
  }
}
