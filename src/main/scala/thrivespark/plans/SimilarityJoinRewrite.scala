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
  * size. This rule injects an EXACT k-D projection blocking:
  *
  * For L2-normalized vectors, dot(a,b) > τ  ⟹  ‖a−b‖ < √(2−2τ), and for
  * any fixed probe vector u with ‖u‖ ≤ 1, Cauchy–Schwarz gives
  * |⟨a,u⟩ − ⟨b,u⟩| ≤ ‖a−b‖ < w. Bucketing each projection ⟨·,uᵢ⟩ into
  * width-w intervals therefore puts every qualifying pair in the same or
  * adjacent bucket PER PROJECTION — so joining on equality of the packed
  * k-tuple of floors, with a 3^k-probe neighbor expansion of one side, and
  * keeping the ORIGINAL predicate as the verify filter, is
  * semantics-preserving (recall 1 by the per-projection bound, precision by
  * the kept filter). The physical plan becomes a shuffled equi-join on the
  * packed bucket key: no pair-space materialization on the driver,
  * partitioned shuffle, AQE/skew handling all apply.
  *
  * k independent SEEDED pseudo-random unit projections (k = 3) multiply
  * pruning power: a non-qualifying pair survives only if it collides on
  * EVERY projection, so the candidate fraction is the product of the
  * per-projection collision rates — and random directions decorrelate the
  * buckets from any data-mean alignment a fixed all-positive probe would
  * suffer (the hot-bucket/shuffle-skew hazard).
  *
  * Pruning regime, measured on the 64-dim test embeddings (PlanSpec):
  * projections of isotropic unit vectors concentrate as ~N(0, 1/64) per
  * coordinate (total spread ≈ 0.75), so buckets thin the pair space only
  * once w < ~0.3, i.e. τ ≳ 0.95 — the actual near-dup regime, where at
  * τ=0.99 three projections admit 45% of all pairs vs a single
  * projection's 77%. Below that (e.g. τ=0.45) the recall-1 width exceeds
  * the whole projection spread and NO projection count can prune — there
  * the rewrite's whole value is the plan shape: a shuffled equi-join,
  * never a cartesian. The projection count is therefore chosen FROM τ
  * (projectionsFor): k = 3 where buckets can prune, k = 1 where they
  * cannot — because each extra projection also multiplies the probe
  * expansion by 3, and paying 27× row fan-out for zero pruning turns the
  * degenerate one-bucket join into a 9× slowdown (measured at τ=0.45,
  * sf0.1: 25 s vs 2 s).
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

  /** Max independent projections; probes per left row = 3^k. */
  val NumProjections = 3

  /** Projection count for a threshold: multiple projections only where the
    * bucket width sits below the ~N(0, 1/64) projection spread of
    * isotropic unit vectors (w < 0.35 ⟺ τ ≳ 0.94) — elsewhere buckets
    * cannot prune and extra probes are pure fan-out (see scaladoc). */
  def projectionsFor(tau: Double): Int =
    if (width(tau) < 0.35) NumProjections else 1

  /** Bucket values are bounded by |⟨v,u⟩|/w ≤ 1/w; pack base 2^20 covers
    * τ up to 1 − 2⁻³⁹ and 3 coordinates fit a Long (2^60 < 2^63). */
  private val PackBase = 1L << 20
  private val PackOffset = PackBase / 2

  /** Deterministic seeded Gaussian directions, L2-normalized (‖u‖ = 1). */
  val probeVectors: Array[Array[Float]] = {
    val rnd = new scala.util.Random(20260812L)
    Array.fill(NumProjections) {
      val v = Array.fill(Dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
  }

  /** Bucket width for threshold τ: widened by 1e-7 so adjacent-bucket
    * probing survives IEEE rounding of the two quotients (a boundary pair
    * must still land ≤ 1 apart). */
  def width(tau: Double): Double = math.sqrt(2.0 - 2.0 * tau) * 1.0000001

  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(this)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
    }
  }

  private def bucketExpr(e: Expression, u: Array[Float], w: Double): Expression =
    // containsNull=false: probe vectors are dense literals, and since the
    // vec_dot kernels honor element nullability (r19) a default
    // containsNull=true literal would put a per-element null-bit test in
    // every projection's codegen loop (measured ~1 s at sf0.1 on this op)
    Floor(Divide(
      VecDot(e, Literal.create(u, ArrayType(FloatType, containsNull = false))),
      Literal(w)))

  /** Packs k (bucket + offset) coordinates into one Long key. */
  private def packExpr(coords: Seq[Expression]): Expression =
    coords.reduceLeft[Expression]((acc, c) =>
      Add(Multiply(acc, Literal(PackBase)), c))

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
        val w = width(tau)
        val k = projectionsFor(tau)
        // right side: one packed key per row
        val rCoords = probeVectors.take(k).toSeq.map(u =>
          Add(bucketExpr(rb, u, w), Literal(PackOffset)))
        val rAlias = Alias(packExpr(rCoords), "__sim_bucket_r")()
        val rightB = Project(right.output :+ rAlias, right)
        // left side: compute the k floors ONCE in a Project, then explode
        // the 3^k neighbor-offset keys above it
        val lFloorAliases = probeVectors.take(k).toSeq.zipWithIndex.map { case (u, i) =>
          Alias(bucketExpr(la, u, w), s"__sim_floor_$i")()
        }
        val leftF = Project(left.output ++ lFloorAliases, left)
        val offsets = Seq.fill(k)(Seq(-1L, 0L, 1L))
          .foldLeft(Seq(Seq.empty[Long]))((acc, os) =>
            acc.flatMap(pfx => os.map(o => pfx :+ o)))
        val probeKeys = offsets.map { off =>
          packExpr(lFloorAliases.zip(off).map { case (fa, o) =>
            Add(Add(fa.toAttribute, Literal(o)), Literal(PackOffset))
          })
        }
        val lAttr = AttributeReference("__sim_bucket_l", LongType)()
        val leftG = Generate(Explode(CreateArray(probeKeys)), Nil,
          outer = false, None, Seq(lAttr), leftF)
        val newJoin = Join(leftG, rightB, Inner,
          Some(And(EqualTo(lAttr, rAlias.toAttribute), cond)), hint)
        Project(j.output, newJoin)
      }
  }
}
