package thrivespark.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Custom Catalyst expression: the full k-permutation MinHash signature in a
  * single pass over the pre-hashed shingle array.
  *
  * The composable formulation (k × `array_min(transform(...))`) traverses the
  * array k times and generates k separate codegen lambdas — measurably slow to
  * JIT and to run. This expression does one tight loop:
  *   sig[j] = min over shingle-hashes h of xxhash64(h, seed = j)
  * using Spark's own XXH64 (public util in catalyst), so no new hash algebra
  * is introduced. The signature feeds LSH banding only (candidate pruning);
  * the final near-dup output is exact-verified, so no oracle ever compares
  * these values (SURVEY.md rule R5).
  *
  * Input: array<long> (pre-hashed shingles) — null shingle entries are
  * ignored; null input → null. Output: array<long> of length `numHashes`.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<bigint>, got ${other.simpleString(10)}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      MinHashCore.mins(input.asInstanceOf[ArrayData], numHashes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val gad = classOf[GenericArrayData].getName
      val out = ctx.freshName("mh")
      s"""
        ${MinHashCore.minsCode(ctx, c, numHashes, out)}
        ${ev.value} = new $gad($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** The one minhash inner loop, shared by MinHashSignature and LshBandKeys
  * (interpreted + codegen flavors). The LSH banding correctness argument
  * depends on the two expressions computing the IDENTICAL hash family
  * (sig[j] = min over shingle-hashes h of XXH64(h, seed = j)) — keeping a
  * single implementation makes desynchronizing them impossible. */
private[functions] object MinHashCore {
  def mins(arr: ArrayData, numHashes: Int): Array[Long] = {
    val out = Array.fill[Long](numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h0 = arr.getLong(i)
        var j = 0
        while (j < numHashes) {
          val h = XXH64.hashLong(h0, j)
          if (h < out(j)) out(j) = h
          j += 1
        }
      }
      i += 1
    }
    out
  }

  /** Codegen flavor: declares `long[] <out>` holding the minima of `c`. */
  def minsCode(ctx: CodegenContext, c: String, numHashes: Int, out: String): String = {
    val xxh = classOf[XXH64].getName
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val h0 = ctx.freshName("h0")
    val h = ctx.freshName("h")
    s"""
      long[] $out = new long[$numHashes];
      java.util.Arrays.fill($out, Long.MAX_VALUE);
      for (int $i = 0; $i < $c.numElements(); $i++) {
        if (!$c.isNullAt($i)) {
          long $h0 = $c.getLong($i);
          for (int $j = 0; $j < $numHashes; $j++) {
            long $h = $xxh.hashLong($h0, $j);
            if ($h < $out[$j]) $out[$j] = $h;
          }
        }
      }
    """
  }
}
