package thrivespark

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers implementing SURVEY.md §2 rules R1–R5.
  *
  * The correctness gate hash-compares our output against DuckDB 1.0.0 running
  * the oracle SQL on the same parquet. Floating aggregation order differs
  * between engines, so:
  *  - R2: sums/avgs go through exact decimal(38,6) — associative, so partial
  *    aggregation across any number of partitions is byte-identical.
  *  - Averages/divisions: DuckDB returns DOUBLE for decimal/bigint division,
  *    so both sides compute `round(cast(sum_dec as double)/n, 6)` then cast
  *    back to decimal — identical IEEE division of identical inputs.
  *  - R3: timestamps are emitted as DATE or epoch-microsecond BIGINT.
  */
object Det {
  val D = "decimal(38,6)"

  /** R2: exact, associative decimal for sums. */
  def dec(c: Column): Column = c.cast(D)

  def dsum(c: Column): Column = sum(dec(c))

  /** Deterministic "average": exact decimal sum, one IEEE double division,
    * round half-up at 6, back to decimal. Oracle mirror:
    * CAST(round(sum(CAST(x AS DECIMAL(38,6))) / n, 6) AS DECIMAL(38,6)). */
  def avg6(sumDec: Column, n: Column): Column =
    round(sumDec.cast("double") / n, 6).cast(D)

  def round6(c: Column): Column = round(c, 6).cast(D)
  def round4(c: Column): Column = round(c, 4).cast(D)
}
