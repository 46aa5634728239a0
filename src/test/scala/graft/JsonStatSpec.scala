package graft

import graft.operators.Cube

/** JSON-stat decode edge cases — study_scraper/jsonstat.py:30-109 and
  * tests/study_scraper/test_jsonstat.py (sparse decode, malformed skip,
  * unresolvable-cell skip). */
class JsonStatSpec extends SparkSpec {
  import spark.implicits._

  private def decode(payloads: String*): Seq[(Int, Double, Seq[Int])] =
    Cube.decodeSparse(payloads.toDF("payload"))
      .orderBy("idx")
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getSeq[Int](2)))
      .toSeq

  test("sparse 2x3 cube decodes row-major indices") {
    // size [2,3]: linear 4 → dims (4 div 3 % 2, 4 div 1 % 3) = (1, 1)
    val rows = decode("""{"size":[2,3],"value":{"0":1.0,"4":5.5,"5":9.9}}""")
    assert(rows == Seq(
      (0, 1.0, Seq(0, 0)),
      (4, 5.5, Seq(1, 1)),
      (5, 9.9, Seq(1, 2))))
  }

  test("three dimensions use products of trailing sizes as strides") {
    // size [3,2,12]: linear 35 → (35 div 24 % 3, 35 div 12 % 2, 35 % 12) = (1,0,11)
    val rows = decode("""{"size":[3,2,12],"value":{"35":7.0}}""")
    assert(rows == Seq((35, 7.0, Seq(1, 0, 11))))
  }

  test("single-dimension cube: stride 1") {
    val rows = decode("""{"size":[4],"value":{"3":2.5}}""")
    assert(rows == Seq((3, 2.5, Seq(3))))
  }

  test("malformed payloads are skipped, valid ones survive") {
    val rows = decode(
      "not json at all",
      """{"unrelated": true}""",
      """{"size":[2],"value":{"1":8.0}}""")
    assert(rows == Seq((1, 8.0, Seq(1))))
  }

  test("non-numeric linear keys are skipped (unresolvable cell)") {
    val rows = decode("""{"size":[2],"value":{"x":1.0,"1":2.0}}""")
    assert(rows == Seq((1, 2.0, Seq(1))))
  }

  test("dense form decodes by position and drops elided (null) cells") {
    val rows = Cube.decodeDense(
      Seq("""{"size":[2,2],"value":[1.0,null,3.0,4.0]}""").toDF("payload"))
      .orderBy("idx").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getSeq[Int](2))).toSeq
    assert(rows == Seq(
      (0, 1.0, Seq(0, 0)),
      (2, 3.0, Seq(1, 0)),
      (3, 4.0, Seq(1, 1))))
  }

  test("dense and sparse forms agree on the same cube") {
    val dense = Cube.decodeDense(
      Seq("""{"size":[3],"value":[5.0,6.0,7.0]}""").toDF("payload"))
      .orderBy("idx").collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
    val sparse = decode("""{"size":[3],"value":{"0":5.0,"1":6.0,"2":7.0}}""")
      .map(r => (r._1, r._2))
    assert(dense == sparse)
  }

  test("degenerate 0-dimensional cubes are skipped, not crashed on " +
    "(sequence(0, -1) descends in Spark; size[-1] throws under ANSI)") {
    // a '"size": []' payload has no addressable cells — both decode
    // paths must drop it like any unresolvable payload while decoding
    // valid neighbors in the same frame
    val sparse = Cube.decodeSparse(Seq(
      """{"size":[],"value":{"0":9.0}}""",
      """{"size":[2],"value":{"1":5.0}}""").toDF("payload")).collect()
    assert(sparse.length == 1 && sparse.head.getDouble(1) == 5.0)
    val dense = Cube.decodeDense(Seq(
      """{"size":[],"value":[9.0]}""",
      """{"size":[2],"value":[5.0,6.0]}""").toDF("payload")).collect()
    assert(dense.length == 2)
  }
}
