package thrivespark.udf

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed Aggregator — the scale-correct alternative to
  * `row_number() OVER (PARTITION BY g ORDER BY v) <= k` for small k:
  * the buffer never holds more than k elements, so the map-side partial
  * aggregation prunes each partition to ≤ k rows per group and the shuffle
  * carries O(groups · partitions · k) rows instead of the whole table.
  * (The window formulation must shuffle and sort every row of the group.)
  *
  * Ordering: by value descending, ties broken by smaller id first — the
  * exact ordering of SURVEY.md #34, so results are deterministic and
  * oracle-comparable.
  */
object TopKAggregator {
  type Entry = (Double, Long) // (value, id)

  /** ascending-last ordering: better entries sort earlier */
  private def better(a: Entry, b: Entry): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  final case class TopK(k: Int) extends Aggregator[Entry, List[Entry], List[Entry]] {
    override def zero: List[Entry] = Nil

    private def insert(buf: List[Entry], e: Entry): List[Entry] = {
      // buf is sorted best-first and capped at k
      if (buf.length >= k && better(buf.last, e)) buf
      else {
        val (front, back) = buf.span(better(_, e))
        (front ::: e :: back).take(k)
      }
    }

    override def reduce(buf: List[Entry], e: Entry): List[Entry] = insert(buf, e)
    override def merge(a: List[Entry], b: List[Entry]): List[Entry] =
      b.foldLeft(a)(insert)
    override def finish(buf: List[Entry]): List[Entry] = buf

    override def bufferEncoder: Encoder[List[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Entry]]()
    override def outputEncoder: Encoder[List[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Entry]]()
  }
}
