package graft

import org.apache.spark.sql.DataFrame

/** The ONE seam for physical plan-shape assertions (r19, closing the r18
  * advisory): specs used to grep operator names out of
  * `executedPlan.toString` inline, so an AQE-config or Spark-version
  * rename would break N tests with no behavioral regression. All shape
  * checks now go through these helpers — a Spark upgrade that renames a
  * physical operator touches this file only. Matching stays string-based
  * deliberately: under AQE the pre-execution executedPlan is an
  * AdaptiveSparkPlanExec whose final children only exist after execution,
  * so tree-collecting exec classes would assert against a placeholder;
  * the string form of the initial plan is what actually carries the
  * pre-execution shape. */
object PlanShape {

  def planString(df: DataFrame): String = df.queryExecution.executedPlan.toString

  /** The expression shows up inside a whole-stage-codegen projection. */
  def assertUsesCodegenExpr(df: DataFrame, exprName: String, label: String): Unit = {
    val p = planString(df)
    assert(p.contains(exprName), s"$label must keep $exprName in the codegen loop:\n$p")
  }

  /** The small side broadcasts for a non-equi (Q×C-style) join. */
  def assertBroadcastsSmallSide(df: DataFrame, label: String): Unit = {
    val p = planString(df)
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"$label must broadcast the small side of the non-equi join:\n$p")
  }

  /** No shuffle-requiring or cartesian join anywhere in the plan. */
  def assertNoShuffleJoin(df: DataFrame, label: String): Unit = {
    val p = planString(df)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct"),
      s"$label must not shuffle-join or go cartesian:\n$p")
  }

  /** Map-only: no Exchange (shuffle or broadcast) anywhere in the plan. */
  def assertNoExchange(df: DataFrame, label: String): Unit = {
    val p = planString(df)
    assert(!p.contains("Exchange"), s"$label must stay a map-only plan:\n$p")
  }

  /** No join operator of any kind in the plan. */
  def assertNoJoin(df: DataFrame, label: String): Unit = {
    val p = planString(df)
    assert(!p.contains("Join"), s"$label must not join:\n$p")
  }
}
