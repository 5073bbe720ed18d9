package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the composed corpus pipeline (pipeline_corpus_e2e) that the
  * strict oracle can't express directly: conservation across pack+split,
  * determinism of the content-addressed split, stage pruning, the three-way
  * split logic itself (on a frame large enough that no md5 bucket can be
  * empty — the tiny real corpus deterministically leaves the 5% "val"
  * bucket empty, which is correct behavior, not a bug; r7's test asserted
  * all three splits on the real corpus and was red for exactly that
  * reason), and the LSH-recall assumption stage 1's oracle silently leans
  * on. */
class PipelineSpec extends AnyFunSuite {
  import SparkTestBase._
  import thrivespark.ops.{Dedup, Pipeline}

  private def run(sf: String) =
    thrivespark.Registry.queries("pipeline_corpus_e2e")(spark, sf)

  test("splits conserve the gated survivor tokens and docs exactly") {
    val out = run(sf001).collect()
    val splitTokens = out.map(_.getAs[Long]("n_tokens")).sum
    val splitDocs = out.map(_.getAs[Long]("n_docs")).sum
    // the stage-2 boundary: whatever the gate emits, pack+split must neither
    // lose nor duplicate (gate semantics themselves are oracled vs DuckDB)
    val exp = Pipeline.gatedSurvivors(spark, sf001)
      .agg(sum("n_tokens"), count(lit(1))).head()
    assert(splitTokens == exp.getLong(0), "token count must survive pack+split")
    assert(splitDocs == exp.getLong(1), "doc count must survive pack+split")
  }

  test("every stage prunes: survivors < corpus, kept < survivors, seqs pack >1 doc") {
    val nDocs = thrivespark.Tables.documents(spark, sf001).count()
    val nSurv = Pipeline.survivors(spark, sf001).count()
    val out = run(sf001).collect()
    val docs = out.map(_.getAs[Long]("n_docs")).sum
    val seqs = out.map(_.getAs[Long]("n_seqs")).sum
    assert(nSurv < nDocs, "dedup must drop something on the planted corpus")
    assert(docs < nSurv, "the 4-filter gate must drop something")
    assert(seqs < docs, "1024-token packing must combine docs into sequences")
    assert(seqs > 0)
  }

  test("split is content-addressed: rerun identical, labels valid, train largest") {
    val a = run(sf001).collect().map(_.toSeq).toSeq
    val b = run(sf001).collect().map(_.toSeq).toSeq
    assert(a == b, "md5 split must be reproducible across runs")
    val bySplit = a.map(r => r.head.toString -> r(1).asInstanceOf[Long]).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit("train") > (bySplit.getOrElse("val", 0L) + bySplit.getOrElse("test", 0L)),
      "90/5/5 bucketing: train must dominate")
  }

  test("three-way split populates all buckets on a corpus-sized frame") {
    // 5000 single-token docs of 1024 tokens each → 5000 sequences: with
    // uniform md5 bucketing, P[val empty] ≈ (0.95)^5000 ≈ 10^-112 — the
    // assertion tests the split logic, not corpus-size luck.
    val kept = spark.range(5000).select(col("id").as("doc_id"),
      lit(1024).as("n_tokens"))
    val out = Pipeline.packAndSplit(kept).collect()
    val bySplit = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val") + bySplit("test"))
    assert(out.map(_.getAs[Long]("n_seqs")).sum == 5000L)
    assert(out.map(_.getAs[Long]("n_tokens")).sum == 5000L * 1024)
  }

  test("LSH candidates are a superset of brute-force tau-pairs (oracle recall pin)") {
    // Stage 1's oracle compares LSH-pruned exact-verified pairs against the
    // full O(n²) exact-Jaccard join; banding recall at τ=0.6 (~0.9998/pair)
    // makes them equal on THIS corpus + hash family. Pin that assumption:
    // if a corpus regen or hash-family change ever drops a τ-passing pair
    // from the candidate set, fail here at the cause, not downstream.
    val docs = Dedup.shingleDocs(spark, sf001)
    val sa = docs.select(col("doc_id").as("a_id"), col("shl").as("sh_a"))
    val sb = docs.select(col("doc_id").as("b_id"), col("shl").as("sh_b"))
    val brute = sa.crossJoin(sb).filter(col("a_id") < col("b_id"))
      .withColumn("jac",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jac") > 0.6)
      .select(col("a_id"), col("b_id"))
    val cands = Dedup.candidatePairs(Dedup.bandBuckets(docs))
    val missed = brute.join(cands, Seq("a_id", "b_id"), "left_anti").count()
    assert(missed == 0L,
      s"$missed tau-passing pairs missing from the LSH candidate set — " +
        "the pipeline/dedup oracles' recall assumption no longer holds")
  }

  test("multimodal pipeline: gates shrink monotonically, splits partition " +
      "the final gate exactly") {
    val out = thrivespark.Registry.queries("pipeline_multimodal_e2e")(spark, sf001)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val stages = Seq("0_decoded", "1_img_gate", "2_aud_gate", "3_vid_gate",
      "4_txt_gate")
    stages.foreach(st => assert(out.contains(st), s"missing stage $st"))
    stages.sliding(2).foreach { case Seq(a, b) =>
      assert(out(b)._1 <= out(a)._1 && out(b)._2 <= out(a)._2,
        s"stage $b must be a subset of $a")
      assert(out(b)._1 > 0, s"gate $b must not annihilate the corpus")
    }
    assert(out("4_txt_gate")._1 < out("0_decoded")._1,
      "the gate chain must actually drop something")
    val splitN = Seq("5_train", "6_val", "7_test").flatMap(out.get).map(_._1).sum
    val splitT = Seq("5_train", "6_val", "7_test").flatMap(out.get).map(_._2).sum
    assert(splitN == out("4_txt_gate")._1 && splitT == out("4_txt_gate")._2,
      "train/val/test must partition the gated survivors exactly")
  }
}
