package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the composed corpus pipeline (pipeline_corpus_e2e) that the
  * strict oracle can't express directly: conservation across stages,
  * determinism of the content-addressed split, and stage ordering. */
class PipelineSpec extends AnyFunSuite {
  import SparkTestBase._

  private def run(sf: String) =
    thrivespark.Registry.queries("pipeline_corpus_e2e")(spark, sf)

  test("splits conserve the gated survivor tokens exactly") {
    val out = run(sf001).collect()
    val splitTokens = out.map(_.getAs[Long]("n_tokens")).sum
    val splitDocs = out.map(_.getAs[Long]("n_docs")).sum

    // independently recompute the kept set: dedup survivors passing the gate
    val drop = thrivespark.ops.Dedup.nearDupPairs(spark, sf001, 0.6)
      .select(col("b_id")).distinct()
    val kept = thrivespark.Tables.documents(spark, sf001)
      .join(drop, col("doc_id") === col("b_id"), "left_anti")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .withColumn("n_tokens", size(col("t")))
      .filter(col("n_tokens") >= 20 &&
        size(filter(col("t"), x => x === "the" || x === "a")).cast("double")
          / size(col("t")) > 0.05)
    val exp = kept.agg(sum("n_tokens"), count(lit(1))).head()
    assert(splitTokens == exp.getLong(0), "token count must survive pack+split")
    assert(splitDocs == exp.getLong(1), "doc count must survive pack+split")
  }

  test("every stage prunes: survivors < corpus, kept < survivors, seqs pack >1 doc") {
    val nDocs = thrivespark.Tables.documents(spark, sf001).count()
    val out = run(sf001).collect()
    val docs = out.map(_.getAs[Long]("n_docs")).sum
    val seqs = out.map(_.getAs[Long]("n_seqs")).sum
    assert(docs < nDocs, "dedup+gate must drop something on the planted corpus")
    assert(seqs < docs, "1024-token packing must combine docs into sequences")
    assert(seqs > 0)
  }

  test("split is content-addressed: rerun identical, all three splits, train largest") {
    val a = run(sf001).collect().map(_.toSeq).toSeq
    val b = run(sf001).collect().map(_.toSeq).toSeq
    assert(a == b, "md5 split must be reproducible across runs")
    val bySplit = a.map(r => r.head.toString -> r(1).asInstanceOf[Long]).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val") + bySplit("test"),
      "90/5/5 bucketing: train must dominate")
  }
}
