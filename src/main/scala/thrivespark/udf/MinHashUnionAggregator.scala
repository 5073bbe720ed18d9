package thrivespark.udf

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** SURVEY.md §4 custom candidate 2 — sketch-union UDAF: the elementwise-min
  * merge of MinHash signatures. minhash(A ∪ B) = min(minhash(A), minhash(B))
  * per permutation slot, so per-document signatures union DISTRIBUTIVELY:
  * partial aggregation on any partitioning yields the exact signature of the
  * group's shingle-set union — the property that lets a cluster sketch 100 TB
  * of documents with one map-side-combined shuffle of 32-long rows per group
  * instead of re-shingling the concatenated corpus.
  *
  * The buffer is the fixed-width signature itself (32 longs), so unlike a
  * multiset-buffer UDAF this one is O(1) memory per group at any scale.
  * Engine-specific hashing ⇒ no SQL oracle; PropertySpec proves
  * union-of-signatures == signature-of-union on the corpus. */
object MinHashUnionAggregator extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  val NumHashes = 32
  private val Empty = Array.fill(NumHashes)(Long.MaxValue)

  override def zero: Array[Long] = Empty.clone()

  override def reduce(b: Array[Long], sig: Seq[Long]): Array[Long] = {
    // SQL aggregates skip NULL inputs — a NULL signature (e.g. a doc whose
    // shingle set was empty) is a no-op, not an error. A short NON-null
    // signature stays a loud failure: silently tolerating it would leave
    // Long.MaxValue filler slots in the union — a corrupt sketch, far
    // harder to trace than an error at the source.
    if (sig == null) return b
    require(sig.length >= NumHashes,
      s"minhash signature must carry $NumHashes longs, got ${sig.length}")
    var i = 0
    while (i < NumHashes) {
      if (sig(i) < b(i)) b(i) = sig(i)
      i += 1
    }
    b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < NumHashes) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def finish(b: Array[Long]): Seq[Long] = b.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
