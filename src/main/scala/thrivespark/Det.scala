package thrivespark

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers implementing SURVEY.md §2 rules R1–R5.
  *
  * The correctness gate hash-compares our output against DuckDB 1.0.0 running
  * the oracle SQL on the same parquet. Two engine-difference hazards:
  *
  *  1. Floating aggregation ORDER differs (partitioned partial aggregation vs
  *     vectorized single-node), so double sums drift in the last ulp.
  *     → R2: accumulate in exact decimal(18,6) fixed-point — associative, so
  *     partial aggregation across any number of partitions is byte-identical.
  *  2. Output TYPE must be DOUBLE, not DECIMAL: the driver hash-compares the
  *     *rendered value* of our parquet (pyarrow keeps `Decimal('2995.110000')`,
  *     trailing zeros and all) against DuckDB's result frame (float64
  *     `2995.11`). Round-1 shipped decimals and every decimal-emitting query
  *     hash-mismatched. → convert exactly once at the end: exact decimal sum →
  *     one double cast. DuckDB mirror: `CAST(sum(CAST(x AS DECIMAL(18,6))) AS
  *     DOUBLE)` (18,6 — NOT 38,6: DuckDB sums ≤18-digit decimals exactly in
  *     hugeint, but silently sums 38-digit decimals in *floating point*).
  *
  *  - Averages/divisions: one IEEE division of identical doubles is identical.
  *  - R3: timestamps are emitted as DATE or epoch-microsecond BIGINT.
  */
object Det {
  /** Exact fixed-point carrier. 12 integer digits covers every monetary /
    * quantity column here with 10^6 headroom at 100 TB scale (Spark widens
    * the sum to decimal(28,6); DuckDB to decimal(38,6) — both exact). */
  val D = "decimal(18,6)"

  /** R2: exact, associative decimal for accumulation. */
  def dec(c: Column): Column = c.cast(D)

  /** Exact decimal sum, emitted as DOUBLE (one conversion point).
    * Oracle mirror: CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE). */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Deterministic "average": exact decimal sum → one double cast → one IEEE
    * division → round half-up at 6. Oracle mirror:
    * round(CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / n, 6). */
  def avg6(sumDec: Column, n: Column): Column =
    round(sumDec.cast("double") / n, 6)

  /** Round a double pipeline to kill sub-ulp engine drift; stays DOUBLE. */
  def round6(c: Column): Column = round(c, 6)
  def round4(c: Column): Column = round(c, 4)
}
