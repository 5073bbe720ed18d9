package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's contamination verdict logic (graft.Bench.ratioVerdict) —
  * pure-function replay tests. r5–r7 each produced an officially
  * contaminated record that self-labeled clean; r7's record carried the
  * proof in its own telemetry (prior_ratio_median 3.42, 58/150 queries
  * over 5× prior) while `contaminated` still read false because the
  * heuristic wasn't wired into the flag. These tests pin that a record
  * with r7-shaped telemetry now labels itself, and that clean-run shapes
  * (host variance, isolated spikes) do not. */
class BenchSpec extends AnyFunSuite {

  test("r7-shaped telemetry (median 3.42, 58/150 over 5x) labels contaminated") {
    // reconstruct the shape of BENCH_r07: most of the suite a few × slow,
    // a third of it 5–80× slow (I/O + state-replay queries)
    val ratios = Seq.fill(92)(3.4) ++ Seq.fill(29)(12.0) ++ Seq.fill(29)(55.0)
    val (median, over5x, breached) = Bench.ratioVerdict(ratios)
    assert(median > 2.5 && over5x == 58 && breached,
      s"r7 replay must breach: median=$median over5x=$over5x")
  }

  test("clean same-box re-run shape (median ~1.2, no 5x spikes) stays clean") {
    // the judge's r7 re-run: prior_ratio_median 1.24, n_over_5x 0
    val ratios = Seq.fill(150)(1.24)
    val (_, _, breached) = Bench.ratioVerdict(ratios)
    assert(!breached)
  }

  test("uniform ~1.5x host variance stays clean (slow box, not contention)") {
    val (_, _, breached) = Bench.ratioVerdict(Seq.fill(150)(1.5))
    assert(!breached)
  }

  test("isolated spikes on a clean median stay clean (one-off GC/compaction)") {
    val ratios = Seq.fill(147)(1.1) ++ Seq.fill(3)(50.0)
    val (median, over5x, breached) = Bench.ratioVerdict(ratios)
    assert(median < 2.5 && over5x == 3 && !breached)
  }

  test("empty priors (first run) stay clean") {
    assert(!Bench.ratioVerdict(Nil)._3)
  }

  test("breach needs BOTH median drift and spike mass") {
    // median high but spikes few: a uniformly 3x-slow box with priors from
    // a different protocol — suspicious but not the r7 signature
    assert(!Bench.ratioVerdict(Seq.fill(150)(3.0))._3)
    // spikes many but median clean: heavy tail alone doesn't breach
    val tail = Seq.fill(100)(1.0) ++ Seq.fill(50)(8.0)
    assert(!Bench.ratioVerdict(tail)._3)
  }

  test("QueryGuard: success passes through, a hung query is cancelled and " +
      "the session survives") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    assert(QueryGuard.timed(spark, "ok", 60L) {
      spark.range(10).count()
    } == Right(10L))
    assert(QueryGuard.timed(spark, "boom", 60L) {
      throw new IllegalStateException("no")
    }.swap.exists(_.contains("IllegalStateException")))
    // a task parked far past the cap: the guard must return within the cap
    // (plus cancellation slack), cancel the job, and leave the session usable
    val t0 = System.nanoTime()
    val r = QueryGuard.timed(spark, "hang", 3L) {
      spark.range(1).as[Long].map { _ => Thread.sleep(600000); 1L }.count()
    }
    val waited = (System.nanoTime() - t0) / 1e9
    assert(r.swap.exists(_.startsWith("timed out")), s"got $r")
    assert(waited < 30, s"guard took $waited s to give up")
    assert(spark.range(5).count() == 5, "session unusable after cancellation")
  }
}
