package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** q104/q105 semantics: pinned-values pivot fills missing combinations
  * with 0 (and ignores values outside the pinned list); rollup equals the
  * union of its three grouping levels computed independently. */
class GroupingSpec extends SparkSpec {
  import spark.implicits._

  test("pivot: missing combinations are 0; unpinned values are dropped") {
    val events = Seq(
      (1L, "click"), (1L, "click"), (1L, "view"),
      (2L, "purchase"), (2L, "weird_type"))
      .toDF("user_id", "event_type")
    val rows = Relational.pivotCounts(events).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // user 1: click=2 view=1, everything else 0
    assert(rows(0).getLong(1) == 2 && rows(0).getLong(5) == 1)
    assert(rows(0).getLong(2) == 0 && rows(0).getLong(3) == 0 && rows(0).getLong(4) == 0)
    // user 2: purchase=1; "weird_type" contributes to NO column
    assert(rows(1).getLong(3) == 1)
    assert(Seq(1, 2, 4, 5).forall(i => rows(1).getLong(i) == 0))
  }

  test("q107: ntile gives the first n mod k buckets the extra row; pr spans [0,1]") {
    val t = Tables.T(spark, "/root/testdata/sf0.001")
    val out = Relational.q107RankFamily(t).collect()
    val byType = out.groupBy(_.getString(1))
    for ((_, rows) <- byType) {
      val n = rows.length
      val sizes = rows.groupBy(_.getInt(3)).map { case (q, rs) => q -> rs.length }
      val base = n / 4; val extra = n % 4
      for (q <- 1 to 4)
        assert(sizes.getOrElse(q, 0) == base + (if (q <= extra) 1 else 0), s"ntile bucket $q of n=$n")
      assert(rows.map(_.getDouble(4)).min == 0.0 && rows.map(_.getDouble(4)).max == 1.0)
      assert(rows.map(_.getDouble(5)).max == 1.0) // cume_dist ends at 1
    }
  }

  test("rollup: equals the three grouping levels computed independently") {
    val t = Tables.T(spark, "/root/testdata/sf0.001")
    val out = Relational.q105Rollup(t).collect()
    val detail = t.lineitem.groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1))).count()
    val subtotal = t.lineitem.select("l_returnflag").distinct().count()
    assert(out.count(_.getInt(2) == 0) == detail)
    assert(out.count(_.getInt(2) == 1) == subtotal)
    assert(out.count(_.getInt(2) == 3) == 1) // grand total
    val grand = out.find(_.getInt(2) == 3).get
    assert(grand.getLong(3) == t.lineitem.count())
  }
}
