package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The shared-derivation cache registry (Text.persistShared /
  * releaseSharedCaches — r14): storage dedup and the release path. The r13
  * advisory flagged session-lifetime persists with no release hook; these
  * tests pin that (a) re-deriving the same shared frame does NOT create a
  * second cache entry (the CacheManager sameResult dedup the registry
  * leans on), and (b) releaseSharedCaches actually uncaches — the plans
  * stop resolving to InMemoryRelation afterwards. */
class SharedCacheSpec extends AnyFunSuite {
  import SparkTestBase._

  private def cached(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.withCachedData.toString.contains("InMemoryRelation")

  test("windowIndex dedupes storage across separately-built frames and " +
      "releaseSharedCaches uncaches it") {
    import spark.implicits._
    def docs() = Seq((1L, (0 until 20).map("w" + _).mkString(" ")),
      (2L, (5 until 25).map("w" + _).mkString(" "))).toDF("doc_id", "text")
    val cm = spark.sharedState.cacheManager
    thrivespark.ops.Text.releaseSharedCaches()
    val idx1 = thrivespark.ops.Text.windowIndex(docs(), 8)
    assert(cached(idx1), "first derivation must be cache-backed")
    // independent construction of the SAME derivation: no new entry, the
    // plan resolves to the existing InMemoryRelation
    val idx2 = thrivespark.ops.Text.windowIndex(docs(), 8)
    assert(cached(idx2), "re-derivation must resolve to the cached entry")
    assert(idx1.collect().toSet == idx2.collect().toSet)
    // a DIFFERENT K is a different derivation — its own entry, both live
    val idx3 = thrivespark.ops.Text.windowIndex(docs(), 4)
    assert(cached(idx3) && idx3.count() > idx1.count())
    thrivespark.ops.Text.releaseSharedCaches()
    // after release the derivations' own plans no longer hit the cache
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    Seq(idx1, idx3).foreach { idx =>
      assert(cm.lookupCachedData(classic, idx.queryExecution.analyzed).isEmpty,
        "released derivation must not linger in the CacheManager")
    }
  }

  test("filterFlags routes through the releasable registry (r13 advisory)") {
    import spark.implicits._
    def docs() = Seq((1L, ("the a " * 15).trim),
      (2L, (0 until 25).map("t" + _).mkString(" "))).toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
    thrivespark.ops.Text.releaseSharedCaches()
    val f1 = thrivespark.ops.Text.filterFlags(docs())
    assert(cached(f1), "filterFlags must be cache-backed")
    val rows = f1.collect()
    assert(rows.nonEmpty)
    thrivespark.ops.Text.releaseSharedCaches()
    val f2 = thrivespark.ops.Text.filterFlags(docs())
    // re-derivable after release, same values
    assert(f2.collect().toSet == rows.toSet)
    thrivespark.ops.Text.releaseSharedCaches()
  }

  test("shared paragraph edges (r18): same frame object across the four " +
      "graph ops' derivations; rank cache hits on it; release re-derives") {
    import spark.implicits._
    def docs() = Seq(
      (1L, (0 until 20).map("p" + _).mkString(" ")),
      (2L, (0 until 20).map("p" + _).mkString(" ")),
      (3L, (40 until 60).map("q" + _).mkString(" "))).toDF("doc_id", "text")
    thrivespark.ops.Dedup.releaseSharedCaches()
    val e1 = thrivespark.ops.Dedup.sharedParagraphEdges(docs(), 100)
    val e2 = thrivespark.ops.Dedup.sharedParagraphEdges(docs(), 100)
    // the registry returns the SAME checkpointed frame — this identity is
    // what makes dedup_canonical_rank's rank lookup hit graph_pagerank's
    // cached result (the rank cache keys on the edge frame's plan)
    assert(e1 eq e2, "re-derivation must return the cached checkpointed frame")
    val r1 = thrivespark.ops.Dedup.pagerankFrom(e1, 3)
    val r2 = thrivespark.ops.Dedup.pagerankFrom(e2, 3)
    assert(r1 eq r2, "same edge frame + iters must hit the rank cache")
    // a different maxDf is a different derivation (the valve is part of
    // the edge definition)
    val e3 = thrivespark.ops.Dedup.sharedParagraphEdges(docs(), 1)
    assert(!(e3 eq e1) && e3.count() == 0L,
      "maxDf=1 drops the shared paragraph (df=2) - different artifact")
    thrivespark.ops.Dedup.releaseSharedCaches()
    val e4 = thrivespark.ops.Dedup.sharedParagraphEdges(docs(), 100)
    assert(!(e4 eq e1), "release must drop the registry entry")
    assert(e4.collect().toSet == e1.collect().toSet,
      "re-derived edges must be value-identical")
  }
}
