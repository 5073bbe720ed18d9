package thrivespark.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Custom Catalyst expression: MinHash + LSH banding fused into one pass.
  *
  * For pre-hashed shingles (array<long>) computes `bands · rowsPerBand`
  * minhash minima and folds each band's minima into a single 64-bit band
  * key (XXH64 chain). Output: array<long> of length `bands`; exploding it
  * gives fixed-width (doc, band, key) rows — the entire LSH shuffle payload.
  * Collisions across distinct band signatures are harmless: candidates are
  * exact-verified downstream (SURVEY.md rule R5).
  */
case class LshBandKeys(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  private val numHashes = bands * rowsPerBand

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_band_keys requires array<bigint>, got ${other.simpleString(10)}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_band_keys"

  override def nullSafeEval(input: Any): Any = {
    // the minhash minima come from the SAME shared loop as
    // MinHashSignature (MinHashCore) — the banding argument requires the
    // two expressions' hash families to be identical
    val mins = MinHashCore.mins(input.asInstanceOf[ArrayData], numHashes)
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var k = b.toLong
      var r = 0
      while (r < rowsPerBand) {
        k = XXH64.hashLong(mins(b * rowsPerBand + r), k)
        r += 1
      }
      keys(b) = k
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      val mins = ctx.freshName("mins")
      val keys = ctx.freshName("keys")
      val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      val k = ctx.freshName("k")
      s"""
        ${MinHashCore.minsCode(ctx, c, numHashes, mins)}
        long[] $keys = new long[$bands];
        for (int $b = 0; $b < $bands; $b++) {
          long $k = (long) $b;
          for (int $r = 0; $r < $rowsPerBand; $r++) {
            $k = $xxh.hashLong($mins[$b * $rowsPerBand + $r], $k);
          }
          $keys[$b] = $k;
        }
        ${ev.value} = new $gad($keys);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): LshBandKeys =
    copy(child = newChild)
}
