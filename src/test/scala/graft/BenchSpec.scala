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
    // spikes SCATTERED through the suite (a true one-off hits one query,
    // not a run) — clean under both the dispersion and contiguity rules
    val ratios = (0 until 150).map(i => if (i % 50 == 25) 50.0 else 1.1)
    val (median, over5x, breached) = Bench.ratioVerdict(ratios)
    assert(median < 2.5 && over5x == 3 && !breached)
    assert(!Bench.contiguityBreach(ratios))
  }

  test("r12-shaped telemetry (contiguous mid-run CPU-steal window) now labels " +
      "contaminated via the contiguity rule the dispersion rule cannot see") {
    // Replay of official BENCH_r12.json (292 s, shipped contaminated:false):
    // ratios below are the record's per-query seconds over BenchPriors for
    // the inflated stretch, in suite order — an isolated fn_string spike,
    // three clean queries, then the contiguous text-family window
    // (text_repetition..text_filter_pipeline), text_pii_scrub near-clean,
    // text_fingerprint still hot. Judge's same-box re-run measured the same
    // stretch at ratio ~1, adjudicating host contention, not code.
    val window = Seq(
      5.88,                           // fn_string (7.068 s / 1.203)
      1.1, 1.1, 1.1,                  // fn_math, bpe_train, bpe_char_train
      5.88, 19.31, 18.31, 23.73, 7.86, // text_repetition..filter_pipeline
      1.5,                            // text_pii_scrub
      4.26)                           // text_fingerprint (13.73 / 3.221)
    val ratios = Seq.fill(80)(1.07) ++ window ++ Seq.fill(96)(1.07)
    val (median, over5x, dispersionBreached) = Bench.ratioVerdict(ratios)
    // the r12 blind spot: median ~1.07, only ~6 queries over 5x — the
    // dispersion rule (median>2.5 AND quarter of suite over 5x) stays quiet
    assert(median < 1.5 && over5x < ratios.size / 4 && !dispersionBreached,
      s"dispersion rule unexpectedly fired: median=$median over5x=$over5x")
    // the new rule: >=3 consecutive suite-order queries each >4x prior
    assert(Bench.contiguityBreach(ratios),
      "r12 window must trip the contiguity rule")
  }

  test("contiguity rule boundaries: 2 adjacent spikes clean, 3 breach, " +
      "4.0 exactly does not count") {
    assert(!Bench.contiguityBreach(Seq.fill(50)(1.0) ++ Seq(9.0, 9.0) ++ Seq.fill(50)(1.0)))
    assert(Bench.contiguityBreach(Seq.fill(50)(1.0) ++ Seq(4.1, 4.1, 4.1) ++ Seq.fill(50)(1.0)))
    // threshold is strictly >4: a plateau AT 4.0 is suspicious-but-not-proof
    assert(!Bench.contiguityBreach(Seq.fill(10)(4.0)))
    // runs split by a clean query do not concatenate
    assert(!Bench.contiguityBreach(Seq(9.0, 9.0, 1.0, 9.0, 9.0)))
    assert(!Bench.contiguityBreach(Nil))
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
