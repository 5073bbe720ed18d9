package thrivespark.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Custom Catalyst expression: dot product of two float vectors in DOUBLE.
  *
  * Semantics are bit-identical to the composable formulation
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)` — a
  * sequential left-to-right IEEE double accumulation, which is also what the
  * DuckDB oracle computes — but Spark's higher-order functions have no
  * codegen (interpreted lambdas), while this compiles to a tight loop inside
  * whole-stage codegen. Embeddings are L2-normalized so cosine ≡ dot.
  * Null vectors → null; a null ELEMENT nulls the whole dot (what the
  * zip_with/aggregate formulation yields — the `+` fold propagates the
  * null product), keeping the registered SQL function on the documented
  * HOF equivalence for any input; element count = min(len(a), len(b)).
  * The per-element null check is emitted only when the static type says
  * elements can be null — hot paths read parquet embeddings with
  * containsNull=false and keep the branch-free loop.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  // lazy VAL, not def — the interpreted eval path calls this per row (see
  // VecDotLong); lazy because children resolve after construction
  private lazy val elemsNullable: Boolean = Seq(left.dataType, right.dataType).exists {
    case ArrayType(_, cn) => cn
    case _ => true
  }
  override def nullable: Boolean = super.nullable || elemsNullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires two array<float>, got ${l.simpleString(10)}, ${r.simpleString(10)}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    if (elemsNullable) {
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
    } else {
      while (i < n) {
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val nullCheck =
        if (elemsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $nullCheck
          $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}
