package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import thrivespark.ops.Analytics

/** Degenerate-data contracts for the A/B readout that the DuckDB oracle
  * cannot reach on the synthetic feed (every arm is populated there):
  * the readout must always emit exactly one row, and statistically
  * undefined quantities must surface as NULL, never as zero rows or
  * engine-dependent 0/0 artifacts. */
class AnalyticsSpec extends AnyFunSuite {
  import SparkTestBase._

  test("abReadout: empty arm still emits one row with NULL rate/z") {
    import spark.implicits._
    // every user hashes into arm 0 — arm 1 is empty
    val users = Seq((1L, 1, 0), (2L, 0, 0), (3L, 1, 0))
      .toDF("user_id", "converted", "arm")
    val rows = Analytics.abReadout(users).collect()
    assert(rows.length == 1, s"expected 1 row, got ${rows.length}")
    val r = rows(0)
    assert(r.getAs[Long]("n_a") == 3 && r.getAs[Long]("n_b") == 0)
    assert(!r.isNullAt(r.fieldIndex("rate_a")))
    assert(r.isNullAt(r.fieldIndex("rate_b")), "rate over an empty arm must be NULL")
    assert(r.isNullAt(r.fieldIndex("z_score")), "z over an empty arm must be NULL")
    assert(r.isNullAt(r.fieldIndex("significant")))
  }

  test("abReadout: zero-variance pooled rate yields NULL z, not 0/0") {
    import spark.implicits._
    // both arms populated but nobody converts: pooled rate 0 → variance 0
    val users = Seq((1L, 0, 0), (2L, 0, 1), (3L, 0, 0), (4L, 0, 1))
      .toDF("user_id", "converted", "arm")
    val rows = Analytics.abReadout(users).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[Double]("rate_a") == 0.0 && r.getAs[Double]("rate_b") == 0.0)
    assert(r.isNullAt(r.fieldIndex("z_score")),
      "z must be NULL when the pooled variance is zero")
  }

  test("abReadout on real data matches the registered query") {
    val fromOp = thrivespark.Registry.queries("analytics_ab_test")(spark, sf001)
      .collect()
    assert(fromOp.length == 1)
    assert(!fromOp(0).isNullAt(fromOp(0).fieldIndex("z_score")))
  }

  test("basketAffinityFrom: hand-computed lift/confidence on planted " +
      "baskets; min-support prunes") {
    import spark.implicits._
    // baskets: o1={A,B}, o2={A,B}, o3={A,C}, o4={B}. With minSupport=2
    // only (A,B) survives: pair_n=2, n_A=3, n_B=3, n_orders=4 →
    // conf_AB = 2e6 div 3 = 666666 (= conf_BA), lift = (2e6·4) div 9 =
    // 888888 — mild negative association (< 1e6), truncated exactly.
    val ob = Seq(("o1", "A"), ("o1", "B"), ("o2", "A"), ("o2", "B"),
      ("o3", "A"), ("o3", "C"), ("o4", "B")).toDF("okey", "brand")
    val out = Analytics.basketAffinityFrom(ob, minSupport = 2).collect()
    assert(out.length == 1, s"min-support must prune (A,C): ${out.toSeq}")
    val r = out(0)
    assert((r.getAs[String]("brand_a"), r.getAs[String]("brand_b"),
      r.getAs[Long]("pair_n"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Long]("conf_ab_micro"), r.getAs[Long]("conf_ba_micro"),
      r.getAs[Long]("lift_micro")) ==
      (("A", "B", 2L, 3L, 3L, 666666L, 666666L, 888888L)), s"got $r")
  }

  test("basketAffinityFrom: a perfectly-associated pair has lift > 1e6, " +
      "an anti-associated pair is filtered by support before it misleads") {
    import spark.implicits._
    // X,Y always co-occur (3/3 baskets, 6 baskets total): lift =
    // (3e6·6) div 9 = 2e6. Z never co-occurs with X → no (X,Z) row at all.
    val ob = Seq(("b1", "X"), ("b1", "Y"), ("b2", "X"), ("b2", "Y"),
      ("b3", "X"), ("b3", "Y"), ("b4", "Z"), ("b5", "Z"), ("b6", "Z"))
      .toDF("okey", "brand")
    val out = Analytics.basketAffinityFrom(ob, minSupport = 1).collect()
    assert(out.length == 1 && out(0).getAs[Long]("lift_micro") == 2000000L,
      s"got ${out.toSeq}")
  }
}
