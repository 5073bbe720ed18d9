package thrivespark.udf

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SURVEY.md §2.11 #62 — typed UDAF surface: Gini coefficient of a group of
  * doubles via `Aggregator[IN, BUF, OUT]`, registered with `udaf()`.
  *
  * Cross-engine determinism: the math mirrors the SQL-window oracle exactly —
  * values sorted ascending, per-row product i·x cast to decimal(38,6)
  * (HALF_UP, same as Spark/DuckDB double→decimal casts), exact decimal sums,
  * then one double formula:
  *   G = 2·S1 / (n·S) − (n+1)/n,  S1 = Σ i·x_i,  S = Σ x_i,  rounded to 6.
  *
  * The buffer is the value multiset — fine for per-group cardinalities in the
  * thousands (a rank-based UDAF; the sort is per-group at finish time). */
object GiniAggregator extends Aggregator[Double, List[Double], Double] {
  override def zero: List[Double] = Nil
  override def reduce(b: List[Double], a: Double): List[Double] = a :: b
  override def merge(b1: List[Double], b2: List[Double]): List[Double] = b1 ::: b2

  private def dec6(d: Double): JBigDecimal =
    JBigDecimal.valueOf(d).setScale(6, RoundingMode.HALF_UP)

  override def finish(buf: List[Double]): Double = {
    val xs = buf.sorted
    val n = xs.length.toLong
    if (n == 0) return 0.0
    var s1 = JBigDecimal.ZERO
    var s = JBigDecimal.ZERO
    var i = 1L
    xs.foreach { x =>
      s1 = s1.add(dec6(i * x))
      s = s.add(dec6(x))
      i += 1
    }
    val g = 2.0 * s1.doubleValue / (n * s.doubleValue) - (n + 1.0) / n
    JBigDecimal.valueOf(g).setScale(6, RoundingMode.HALF_UP).doubleValue
  }

  override def bufferEncoder: Encoder[List[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Double]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
