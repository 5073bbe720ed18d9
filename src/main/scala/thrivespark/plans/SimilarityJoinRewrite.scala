package thrivespark.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType}
import thrivespark.functions.VecDot

/** Optimizer rewrite for naive similarity joins (SURVEY.md §4 custom
  * candidate 1): a join whose only cross-side predicate is
  * `vec_dot(a, b) > τ` would plan as a CartesianProduct /
  * BroadcastNestedLoopJoin — the driver-killing shape at any real corpus
  * size. This rule injects an EXACT 1-D projection blocking:
  *
  * For L2-normalized vectors, dot(a,b) > τ  ⟹  ‖a−b‖ < √(2−2τ), and for
  * any fixed probe vector u with ‖u‖ ≤ 1, Cauchy–Schwarz gives
  * |⟨a,u⟩ − ⟨b,u⟩| ≤ ‖a−b‖ < w. Bucketing the projection ⟨·,u⟩ into
  * width-w intervals therefore puts every qualifying pair in the same or
  * adjacent buckets — so joining on bucket equality with a 3-probe
  * ({−1,0,+1}) expansion of one side, keeping the ORIGINAL predicate as the
  * verify filter, is semantics-preserving (recall 1 by the bound, precision
  * by the kept filter). The physical plan becomes a shuffled equi-join on
  * the bucket key: no pair-space materialization on the driver, partitioned
  * shuffle, AQE/skew handling all apply.
  *
  * Pruning power scales with τ: at near-dup thresholds (τ → 1, the actual
  * embedding-dedup regime) w → 0 and buckets genuinely thin out the pair
  * space; at exploratory thresholds the rewrite degrades gracefully to a
  * few wide buckets — still an equi-join, never a cartesian.
  *
  * Precondition (the Similarity module's standing contract): vectors are
  * L2-normalized, so vec_dot ≡ cosine. The rule leaves joins that already
  * carry an equi-conjunct untouched (they plan fine natively) — which also
  * makes the rewrite idempotent, since the rewritten join carries one.
  */
object SimilarityJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** Probe length; on shorter vectors VecDot stops at min length, which only
    * shrinks ‖u‖ below 1 and loosens (never breaks) the bound. */
  private val Dim = 64

  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(this)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, jt, Some(cond), hint) if jt == Inner || jt == Cross =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasEqui = conjuncts.exists {
        case EqualTo(x, y) =>
          (x.references.subsetOf(left.outputSet) && y.references.subsetOf(right.outputSet)) ||
          (x.references.subsetOf(right.outputSet) && y.references.subsetOf(left.outputSet))
        case _ => false
      }
      val sim = conjuncts.collectFirst {
        case GreaterThan(VecDot(a, b), Literal(tau: Double, DoubleType))
            if tau > -1.0 && tau < 1.0 && a.references.nonEmpty && b.references.nonEmpty &&
               ((a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
                (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))) =>
          if (a.references.subsetOf(left.outputSet)) (a, b, tau) else (b, a, tau)
      }
      if (hasEqui || sim.isEmpty) j
      else {
        val (la, rb, tau) = sim.get
        // widen w by 1e-7 so adjacent-bucket probing survives IEEE rounding
        // of the two quotients (a boundary pair must still land ≤ 1 apart)
        val w = math.sqrt(2.0 - 2.0 * tau) * 1.0000001
        val u = Literal.create(Array.fill(Dim)(0.125f), ArrayType(FloatType))
        def bucket(e: Expression): Expression = Floor(Divide(VecDot(e, u), Literal(w)))
        val rAlias = Alias(bucket(rb), "__sim_bucket_r")()
        val rightB = Project(right.output :+ rAlias, right)
        val lb = bucket(la)
        val probes = CreateArray(Seq(
          Subtract(lb, Literal(1L)), lb, Add(lb, Literal(1L))))
        val lAttr = AttributeReference("__sim_bucket_l", LongType)()
        val leftG = Generate(Explode(probes), Nil, outer = false, None, Seq(lAttr), left)
        val newJoin = Join(leftG, rightB, Inner,
          Some(And(EqualTo(lAttr, rAlias.toAttribute), cond)), hint)
        Project(j.output, newJoin)
      }
  }
}
