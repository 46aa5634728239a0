package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
import org.scalatest.prop.TableDrivenPropertyChecks

/** Pins `stance_pct` (the native q53 parse) against
  * `from_json(…, struct<stance:string, pct:double>)` on well-formed flat
  * payloads, and pins its documented divergence on malformed input:
  * stance_pct returns NULL (the reference's drop-unparseable rule) where
  * from_json's PERMISSIVE mode may return a struct of nulls. */
class StancePctSpec extends SparkSpec with TableDrivenPropertyChecks {
  private val schema = StructType(Seq(
    StructField("stance", StringType), StructField("pct", DoubleType)))

  private def both(payloads: Seq[String]): Seq[(String, Row, Row)] = {
    import spark.implicits._
    payloads.toDF("j")
      .select(col("j"), expr("stance_pct(j)").as("native"),
        from_json(col("j"), schema).as("jackson"))
      .collect()
      .map(r => (r.getString(0), r.getAs[Row]("native"), r.getAs[Row]("jackson")))
      .toSeq
  }

  test("well-formed payloads: bit-identical to from_json") {
    val stances = Seq("dafür", "dagegen", "support", "oppose", "neutral",
      "mixed\\u00e4", "with \\\"quote\\\"", "tab\\there", "")
    val pcts = Seq("0", "42", "98", "-3", "100.5", "0.0", "1e2", "2.5E-1", "-0.75")
    val payloads = for (s <- stances; p <- pcts) yield
      s"""{"stance": "$s", "pct": $p}"""
    val extras = Seq(
      """{"pct": 7, "stance": "support"}""",              // order swap
      """{"stance":"oppose","pct":3,"extra":"ignored"}""", // unknown key
      """{"stance": "a", "extra": {"deep": [1, {"x": "}"}]}, "pct": 9}""", // nested skip
      """{"stance": "dup", "pct": 1, "pct": 2}""",        // duplicate key: last wins
      """{}""",                                            // empty object
      """{"stance": null, "pct": null}""",                 // explicit nulls
      """  {"stance": "ws", "pct": 5}  """,                // surrounding ws
      """{"pct": 12}""", """{"stance": "only"}""")
    for ((j, n, f) <- both(payloads ++ extras))
      assert(n == f, s"payload: $j native=$n from_json=$f")
  }

  test("field-level coercion matches the declared schema") {
    // string pct / numeric stance → that FIELD nulls, struct survives;
    // key order must not matter for the coercions
    for ((j, n, f) <- both(Seq(
      """{"stance": "x", "pct": "42"}""",
      """{"pct": "42", "stance": "x"}""",
      """{"stance": 17, "pct": 3}""",
      """{"stance": true, "pct": 3}""")))
      assert(n == f, s"payload: $j native=$n from_json=$f")
  }

  test("JSON number grammar is strict: leading zeros and signed \\u escapes reject") {
    import org.apache.spark.sql.functions.{col, expr}
    import spark.implicits._
    val bad = Seq(
      """{"stance": "x", "pct": 042}""",   // leading zero: not JSON
      """{"stance": 042, "pct": 3}""",     // same via the stance coercion
      """{"pct": -042}""",
      // built by concat: Scala's scanner rejects a literal \u in source
      "{\"stance\": \"a" + "\\u" + "+12a\"}", // parseInt would take the sign
      "{\"stance\": \"a" + "\\u" + "-123\"}")
    val out = bad.toDF("j")
      .select(col("j"), expr("stance_pct(j)").as("native")).collect()
    for (r <- out)
      assert(r.isNullAt(1), s"payload: ${r.getString(0)} should parse to NULL")
    // …while plain zero and zero-fractions stay valid
    for ((j, n, f) <- both(Seq(
      """{"stance": "x", "pct": 0}""",
      """{"stance": "x", "pct": 0.5}""",
      """{"stance": "x", "pct": -0.25}""")))
      assert(n == f, s"payload: $j native=$n from_json=$f")
  }

  test("malformed input returns NULL (drop-unparseable rule)") {
    val bad = Seq("", "   ", "not json", "[1,2]", "42", "\"str\"",
      """{"stance": "x", "pct": }""", """{"stance" "x"}""",
      """{"stance": "x"""", """{"stance": "x"} trailing""",
      """{stance: "x"}""", """{"pct": 1e}""", """{"pct": --3}""",
      """{"pct": 01e}""", """{"a": tru}""", """{"a": "\q"}""")
    import spark.implicits._
    val out = bad.toDF("j")
      .select(col("j"), expr("stance_pct(j)").as("native")).collect()
    for (r <- out)
      assert(r.isNullAt(1), s"payload: ${r.getString(0)} should parse to NULL")
  }

  test("q53 corpus shape parses identically end-to-end") {
    // the exact fence-stripped shape q53 synthesizes
    val payloads = (0 until 200).map(i =>
      s"""{"stance": "${Seq("dafür", "dagegen", "support", "oppose", "neutral")(i % 5)}", "pct": ${i % 99}}""")
    for ((j, n, f) <- both(payloads)) assert(n == f, s"payload: $j")
  }
}
