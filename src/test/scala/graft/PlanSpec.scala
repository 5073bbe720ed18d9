package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import thrivespark.Registry
import thrivespark.ops.{Shingles, UdfSurface}

/** Plan-shape assertions (SURVEY.md §5.2 layer 2): the physical plans the
  * 100 TB design counts on actually materialize. */
class PlanSpec extends AnyFunSuite {
  import SparkTestBase._

  private def plan(key: String): String =
    Registry.queries(key)(spark, sf0001).queryExecution.executedPlan.toString

  test("join_broadcast plans a BroadcastHashJoin (no fact shuffle)") {
    assert(plan("join_broadcast").contains("BroadcastHashJoin"))
  }

  test("join_sort_merge plans a SortMergeJoin") {
    assert(plan("join_sort_merge").contains("SortMergeJoin"))
  }

  test("scan_pushdown_filter pushes predicates into the parquet scan") {
    val p = plan("scan_pushdown_filter")
    assert(p.contains("PushedFilters: ["), s"no pushed filters in:\n$p")
    // toString truncates the list; the shipdate range + discount not-null
    // reaching the scan proves both predicates were pushed
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), s"shipdate filter not pushed:\n$p")
    assert(p.contains("IsNotNull(l_discount)"), s"discount filter not pushed:\n$p")
  }

  test("scan reads only projected columns (column pruning)") {
    val p = Registry.queries("scan_pushdown_filter")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_tax"), "unprojected column l_tax must not be read")
  }

  test("topk_global plans TakeOrderedAndProject (no global sort)") {
    assert(plan("topk_global").contains("TakeOrderedAndProject"))
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query and column names line up") {
    val qs = SparkEntry.queries
    SparkEntry.oracleSql.keys.foreach(k => assert(qs.contains(k), s"oracle without query: $k"))
  }

  test("UDF shingles == native shingles composition") {
    import spark.implicits._
    val docs = thrivespark.Tables.documents(spark, sf0001).limit(50)
    val native = docs.select(col("doc_id"), Shingles.shingles3(col("text")).as("sh"))
    val viaUdf = docs.select(col("doc_id"),
      udf(UdfSurface.shinglesFn _).apply(col("text"), lit(3)).as("sh"))
    val diff = native.exceptAll(viaUdf).count() + viaUdf.exceptAll(native).count()
    assert(diff == 0, "UDF and native shingle sets differ")
  }
}
