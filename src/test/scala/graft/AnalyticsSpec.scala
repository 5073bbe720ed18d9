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
}
