package graft

import org.scalatest.funsuite.AnyFunSuite
import thrivespark.plans.AsOf

/** The custom whole-operator as-of join (LogicalPlan + Strategy + exec). */
class AsOfJoinSpec extends AnyFunSuite {
  import SparkTestBase._

  test("plans the custom exec and handles ties + unmatched rows") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L))
      .toDF("k", "t", "lid")
    val r = Seq((1L, 8L, 7L), (1L, 8L, 9L), (1L, 15L, 1L), (3L, 1L, 5L))
      .toDF("k2", "t2", "rid")
    val out = AsOf.backward(l, r, "k", "k2", "t", "t2", "rid")
    assert(out.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      "custom exec must appear in the physical plan")
    val rows = out.select("lid", "rid", "t2").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1),
                 if (x.isNullAt(2)) -1L else x.getLong(2))).toSet
    assert(rows == Set(
      (100L, 9L, 8L),   // tie on t2=8 → greater tiebreak rid=9 wins
      (101L, 1L, 15L),  // later candidate t2=15 supersedes
      (102L, -1L, -1L)  // key 2 has no right rows → NULL right side
    ), s"got $rows")
  }

  test("native as-of equals the max_by formulation on real data") {
    val native = Registry_q("join_asof_native")
    val agg = Registry_q("join_asof")
    assert(native.exceptAll(agg).count() == 0 && agg.exceptAll(native).count() == 0)
  }

  private def Registry_q(k: String) =
    thrivespark.Registry.queries(k)(spark, sf0001)
}
