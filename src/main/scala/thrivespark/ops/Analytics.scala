package thrivespark.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import thrivespark.{Op, Tables => T}
import thrivespark.Det._

/** Behavioral-analytics shapes over the events stream — the classic
  * large-scale product-analytics queries (funnel, cohort retention,
  * per-group mode). All are single- or two-shuffle plans keyed on
  * user_id, so they scale exactly like the aggregation core: partial
  * aggregation map-side, one exchange per distinct grouping key.
  */
object Analytics {
  /** A/B-test readout over a user-grain frame with `arm` (0/1) and
    * `converted` (0/1) columns. Extracted so AnalyticsSpec can prove the
    * degenerate cases the oracle can't reach on real data: an empty arm
    * still emits exactly one row (rates/z NULL, never zero rows), and a
    * zero-variance pooled rate yields z = NULL rather than engine-dependent
    * 0/0 behavior. */
  def abReadout(users: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val w = users.agg(
      sum(when(col("arm") === 0, 1).otherwise(0)).as("n_a"),
      sum(when(col("arm") === 0, col("converted")).otherwise(0)).as("c_a"),
      sum(when(col("arm") === 1, 1).otherwise(0)).as("n_b"),
      sum(when(col("arm") === 1, col("converted")).otherwise(0)).as("c_b"))
    // every divisor is nullif-guarded: Spark 4 runs ANSI (x/0 THROWS) while
    // DuckDB yields NULL — nullif makes both engines produce NULL
    def nz(c: org.apache.spark.sql.Column) = nullif(c, lit(0))
    val rateA = col("c_a").cast("double") / nz(col("n_a"))
    val rateB = col("c_b").cast("double") / nz(col("n_b"))
    val pooled = (col("c_a") + col("c_b")).cast("double") / nz(col("n_a") + col("n_b"))
    val denom = sqrt(pooled * (lit(1.0) - pooled)
      * (lit(1.0) / nz(col("n_a")) + lit(1.0) / nz(col("n_b"))))
    w.select(
      col("n_a"), col("c_a"), col("n_b"), col("c_b"),
      round6(rateA).as("rate_a"),
      round6(rateB).as("rate_b"),
      round6((rateA - rateB) / nullif(denom, lit(0.0))).as("z_score"))
      .withColumn("significant", (abs(col("z_score")) > 1.96).cast("int"))
  }

  /** Association scores over a DISTINCT (okey, brand) basket frame — the
    * testable surface of analytics_market_basket (AnalyticsSpec plants
    * baskets with hand-computed lift). Pair space is per-basket basket²;
    * item counts and the basket total are aggregate-sized broadcasts. */
  def basketAffinityFrom(ob: org.apache.spark.sql.DataFrame,
      minSupport: Long): org.apache.spark.sql.DataFrame = {
    val tot = ob.agg(countDistinct(col("okey")).as("n_orders"))
    val item = ob.groupBy(col("brand")).agg(count(lit(1)).as("n"))
    val pairs = ob.select(col("okey"), col("brand").as("brand_a"))
      .join(ob.select(col("okey"), col("brand").as("brand_b")), Seq("okey"))
      .filter(col("brand_a") < col("brand_b"))
      .groupBy(col("brand_a"), col("brand_b")).agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= minSupport)
    pairs
      .join(broadcast(item.select(col("brand").as("brand_a"), col("n").as("n_a"))),
        Seq("brand_a"))
      .join(broadcast(item.select(col("brand").as("brand_b"), col("n").as("n_b"))),
        Seq("brand_b"))
      .crossJoin(broadcast(tot))
      .select(col("brand_a"), col("brand_b"), col("pair_n"),
        col("n_a"), col("n_b"),
        expr("(1000000 * pair_n) div n_a").as("conf_ab_micro"),
        expr("(1000000 * pair_n) div n_b").as("conf_ba_micro"),
        expr("(1000000 * pair_n * n_orders) div (n_a * n_b)").as("lift_micro"))
      .orderBy(col("pair_n").desc, col("brand_a"), col("brand_b"))
  }

  val ops: Seq[Op] = Seq(
    // Market-basket association mining over order baskets (r17): brand
    // co-occurrence with support, directional confidence and lift — the
    // affinity readout merchandising/recsys pipelines compute at scale.
    // Shape: baskets = DISTINCT (order, brand) after the part-dim join
    // (one shuffle); the pair space is per-order basket² (baskets are
    // tiny — a handful of lines each — so the self-join on okey fans out
    // a bounded constant per order, never cross-order); pair counts
    // combine map-side; item counts and the order total are aggregate-
    // sized and broadcast back onto the 300-row pair table. All ratios
    // are integer micros in truncating division (non-negative ⇒ Spark
    // `div` ≡ DuckDB `//`), so the oracle is exact. At 100 TB the lift
    // numerator 1e6·pair_n·n_orders needs DECIMAL headroom — the
    // ordering of operations is pinned here so both engines overflow (or
    // not) identically, and the micro discipline moves to DECIMAL(38,0)
    // before LONG saturates (~1.8e13 order-pairs).
    Op("analytics_market_basket",
      (s, d) => {
        val ob = T.lineitem(s, d)
          .select(col("l_orderkey").as("okey"), col("l_partkey"))
          .join(T.part(s, d).select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .select(col("okey"), col("p_brand").as("brand")).distinct()
          .localCheckpoint(true)        // three consumers: pairs, items, total
        basketAffinityFrom(ob, minSupport = 5)
      },
      Some("""WITH ob AS (SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
                    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
              tot AS (SELECT count(DISTINCT okey) AS n_orders FROM ob),
              item AS (SELECT brand, count(*) AS n FROM ob GROUP BY brand),
              pairs AS (SELECT a.brand AS brand_a, b.brand AS brand_b,
                               count(*) AS pair_n
                        FROM ob a JOIN ob b
                          ON a.okey = b.okey AND a.brand < b.brand
                        GROUP BY 1, 2 HAVING count(*) >= 5)
              SELECT p.brand_a, p.brand_b, p.pair_n, ia.n AS n_a, ib.n AS n_b,
                     (1000000 * p.pair_n) // ia.n AS conf_ab_micro,
                     (1000000 * p.pair_n) // ib.n AS conf_ba_micro,
                     (1000000 * p.pair_n * (SELECT n_orders FROM tot))
                       // (ia.n * ib.n) AS lift_micro
              FROM pairs p JOIN item ia ON p.brand_a = ia.brand
                           JOIN item ib ON p.brand_b = ib.brand
              ORDER BY p.pair_n DESC, p.brand_a, p.brand_b""")),

    // Staged conversion funnel view → click → purchase, each step within
    // 1 hour of the previous step's FIRST completion (the strict
    // earliest-continuation semantics — deterministic, and expressible in
    // both engines). Three conditional min-aggregations chained by
    // user_id joins: every join key is user_id, so at scale the three
    // stages co-partition after one shuffle, and each stage's agg output
    // is |users| rows (broadcastable when users ≪ events).
    Op("analytics_funnel",
      (s, d) => {
        val ev = T.events(s, d)
        val t1 = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
        val t2 = ev.filter(col("event_type") === "click")
          .join(t1, "user_id")
          .filter(col("ts") > col("t1") &&
            col("ts") <= col("t1") + expr("INTERVAL 1 HOUR"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
        val t3 = ev.filter(col("event_type") === "purchase")
          .join(t2, "user_id")
          .filter(col("ts") > col("t2") &&
            col("ts") <= col("t2") + expr("INTERVAL 1 HOUR"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
        val stages = Seq(
          t1.agg(lit("1_view").as("stage"), count(lit(1)).as("n_users")),
          t2.agg(lit("2_click").as("stage"), count(lit(1)).as("n_users")),
          t3.agg(lit("3_purchase").as("stage"), count(lit(1)).as("n_users")))
        stages.reduce(_.unionAll(_)).orderBy(col("stage"))
      },
      Some("""WITH t1 AS (
                SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'view' GROUP BY user_id),
              t2 AS (
                SELECT e.user_id, min(e.ts) AS t2
                FROM events e JOIN t1 ON e.user_id = t1.user_id
                WHERE e.event_type = 'click'
                  AND e.ts > t1.t1 AND e.ts <= t1.t1 + INTERVAL 1 HOUR
                GROUP BY e.user_id),
              t3 AS (
                SELECT e.user_id, min(e.ts) AS t3
                FROM events e JOIN t2 ON e.user_id = t2.user_id
                WHERE e.event_type = 'purchase'
                  AND e.ts > t2.t2 AND e.ts <= t2.t2 + INTERVAL 1 HOUR
                GROUP BY e.user_id)
              SELECT '1_view' AS stage, count(*) AS n_users FROM t1
              UNION ALL
              SELECT '2_click', count(*) FROM t2
              UNION ALL
              SELECT '3_purchase', count(*) FROM t3
              ORDER BY stage""")),

    // Cohort retention: cohort = each user's first-seen day; cell
    // (cohort, day_offset) counts distinct users from that cohort active
    // that many days later. Two shuffles total (user_id for the cohort
    // min + distinct-day projection, then the cell key) — the standard
    // shape that a 100 TB events table feeds daily.
    Op("analytics_retention",
      (s, d) => {
        val ev = T.events(s, d)
        val cohort = ev.groupBy(col("user_id"))
          .agg(min(to_date(col("ts"))).as("cohort"))
        val active = ev.select(col("user_id"), to_date(col("ts")).as("day"))
          .distinct()
        active.join(cohort, "user_id")
          .groupBy(col("cohort"),
            datediff(col("day"), col("cohort")).as("day_offset"))
          .agg(countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("cohort"), col("day_offset"))
      },
      Some("""WITH c AS (
                SELECT user_id, min(CAST(date_trunc('day', ts) AS DATE)) AS cohort
                FROM events GROUP BY user_id)
              SELECT c.cohort,
                     CAST(datediff('day', c.cohort,
                       CAST(date_trunc('day', e.ts) AS DATE)) AS INTEGER) AS day_offset,
                     count(DISTINCT e.user_id) AS n_users
              FROM events e JOIN c ON e.user_id = c.user_id
              GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Time-series resample + gap-fill: a complete per-(user, day) spine
    // over each user's active span (sequence + explode — the distributed
    // way to densify; no driver-side calendar), missing days get n = 0 and
    // FORWARD-FILLED daily value (last non-null over an ordered window —
    // one shuffle on user_id, running frame, no self-join). The standard
    // metrics-pipeline shape for "every entity must have a row every day".
    Op("analytics_gapfill",
      (s, d) => {
        val agg = T.events(s, d)
          .groupBy(col("user_id"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("day_value"))
        val spine = agg.groupBy(col("user_id"))
          .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
          .select(col("user_id"),
            explode(sequence(col("d0"), col("d1"), expr("INTERVAL 1 DAY"))).as("d"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(agg, Seq("user_id", "d"), "left")
          .select(col("user_id"), col("d").as("day"),
            coalesce(col("n"), lit(0L)).as("n"),
            last(col("day_value"), ignoreNulls = true).over(w).as("filled_value"))
          .orderBy(col("user_id"), col("day"))
      },
      Some("""WITH agg AS (
                SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
                       count(*) AS n,
                       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS day_value
                FROM events GROUP BY 1, 2),
              span AS (SELECT user_id, min(d) AS d0, max(d) AS d1 FROM agg GROUP BY 1),
              spine AS (
                SELECT user_id,
                       CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
                FROM span)
              SELECT s.user_id, s.d AS day, coalesce(a.n, 0) AS n,
                     last_value(a.day_value IGNORE NULLS) OVER
                       (PARTITION BY s.user_id ORDER BY s.d
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
              FROM spine s LEFT JOIN agg a ON s.user_id = a.user_id AND s.d = a.d
              ORDER BY 1, 2""")),

    // Deterministic content-addressed train/val/test split — the
    // training-data-pipeline way to hold out data: bucket by a stable hash
    // of the key (md5, identical in both engines) instead of seeded
    // sampling (engine- and partitioning-dependent). Buckets 0-89 train /
    // 90-94 val / 95-99 test; membership is a pure function of doc_id, so
    // the split is reproducible across engines, re-runs, and repartitions.
    Op("analytics_hash_split",
      (s, d) => {
        val bucket = (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long") % 100).as("b")
        T.documents(s, d).select(col("doc_id"), col("lang"), bucket)
          .withColumn("split",
            when(col("b") < 90, "train").when(col("b") < 95, "val").otherwise("test"))
          .groupBy(col("split"), col("lang"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("split"), col("lang"))
      },
      Some("""SELECT CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
                          ELSE 'test' END AS split,
                     lang, count(*) AS n_docs
              FROM (SELECT lang,
                      CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS UBIGINT) % 100 AS b
                    FROM documents)
              GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Deterministic per-group mode: each user's most frequent event_type,
    // ties broken toward the lexicographically LARGEST type (declared so
    // both engines compute the identical winner — a bare mode() has
    // engine-defined tie behavior). max(struct(n, type)) is one extra
    // shuffle-free reduction over the (user, type) counts.
    Op("agg_mode",
      (s, d) => T.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("user_id"))
        .agg(max(struct(col("n"), col("event_type"))).as("m"))
        .select(col("user_id"), col("m.event_type").as("mode_type"),
          col("m.n").as("n"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id, event_type AS mode_type, n
              FROM (SELECT user_id, event_type, count(*) AS n,
                           row_number() OVER (PARTITION BY user_id
                             ORDER BY count(*) DESC, event_type DESC) AS rn
                    FROM events GROUP BY user_id, event_type)
              WHERE rn = 1 ORDER BY user_id""")),

    // Last-touch attribution: each purchase is credited to the user's most
    // recent view within the preceding 7 days (NULL day = organic/unattributed).
    // The same as-of shape as join_asof: an equi-join on user_id with a range
    // predicate, reduced by max() per purchase — partial max runs map-side, so
    // the join output never collects per-key; then one low-cardinality rollup
    // by attribution day. Both shuffles key on user_id/event_id — co-partitioned
    // with the rest of the events pipeline at scale.
    Op("analytics_attribution",
      (s, d) => {
        val ev = T.events(s, d)
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val v = ev.filter(col("event_type") === "view")
          .select(col("user_id").as("v_uid"), col("ts").as("vts"))
        p.join(v, col("v_uid") === col("user_id") &&
            col("vts") <= col("ts") &&
            col("vts") > col("ts") - expr("INTERVAL 7 DAYS"), "left")
          .groupBy(col("event_id"), col("value"))
          .agg(max(col("vts")).as("att_ts"))
          .groupBy(to_date(col("att_ts")).as("att_day"))
          .agg(count(lit(1)).as("n_purchases"), dsum(col("value")).as("total_value"))
          .orderBy(col("att_day").asc_nulls_first)
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts, value FROM events
                         WHERE event_type = 'purchase'),
                   v AS (SELECT user_id AS v_uid, ts AS vts FROM events
                         WHERE event_type = 'view'),
                   att AS (
                     SELECT p.event_id, p.value, max(v.vts) AS att_ts
                     FROM p LEFT JOIN v ON v.v_uid = p.user_id
                          AND v.vts <= p.ts AND v.vts > p.ts - INTERVAL 7 DAY
                     GROUP BY 1, 2)
              SELECT CAST(date_trunc('day', att_ts) AS DATE) AS att_day,
                     count(*) AS n_purchases,
                     CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
              FROM att GROUP BY 1 ORDER BY 1 NULLS FIRST""")),

    // Stratified sampling with per-stratum rates (oversample the head
    // language, downsample the rest) — selection is content-addressed
    // (md5-bucket of doc_id, same primitive as analytics_hash_split), so the
    // sample is reproducible across engines, re-runs and repartitioning,
    // unlike rand()-based sampling which is neither engine- nor
    // partitioning-stable. Map-only until one low-cardinality rollup.
    Op("analytics_stratified_sample",
      (s, d) => {
        val bucket = (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long") % 1000).as("b")
        val rate = when(col("lang") === "en", 500).otherwise(200)
        T.documents(s, d).select(col("doc_id"), col("lang"), bucket)
          .withColumn("sampled", (col("b") < rate).cast("int"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_total"), sum(col("sampled")).as("n_sampled"))
          .withColumn("achieved_rate",
            round6(col("n_sampled").cast("double") / col("n_total")))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, count(*) AS n_total,
                     CAST(sum(sampled) AS BIGINT) AS n_sampled,
                     round(CAST(sum(sampled) AS DOUBLE) / count(*), 6) AS achieved_rate
              FROM (SELECT lang,
                      CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS UBIGINT) % 1000
                           < CASE WHEN lang = 'en' THEN 500 ELSE 200 END AS INTEGER) AS sampled
                    FROM documents)
              GROUP BY lang ORDER BY lang""")),

    // Rolling 7-day active users (the WAU shape): for each day, the distinct
    // users active in the trailing 7 days. COUNT(DISTINCT) over a sliding
    // range frame doesn't distribute, so use the scalable rewrite: each
    // (user, active day) row is exploded to the ≤7 report days it covers
    // (sequence+explode — bounded ×7 fan-out), then one exact
    // count-distinct per report day. Report days are clamped to the
    // observed span so every output day aggregates a full window's data.
    // Both engines run the identical formulation — no frame semantics to
    // reconcile.
    // Ordered sequence-pattern match (the MATCH_RECOGNIZE shape): does a
    // user's event-type sequence, in (ts, event_id) order, contain
    // view → … → click → … → purchase? One groupBy(user) collecting the
    // ordered type string (deterministic: array_sort on the unique
    // (ts, event_id) prefix), then a regex — per-user state is one string,
    // so the shuffle carries nothing beyond the events themselves.
    Op("analytics_sequence_match",
      (s, d) => {
        val seq = array_join(transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
          x => x.getField("event_type")), ",")
        T.events(s, d)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"), seq.as("type_seq"))
          .select(col("user_id"), col("n_events"),
            col("type_seq").rlike("view.*click.*purchase").cast("int").as("matched"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, count(*) AS n_events,
                     CAST(regexp_matches(string_agg(event_type, ','
                            ORDER BY ts, event_id), 'view.*click.*purchase')
                          AS INTEGER) AS matched
              FROM events GROUP BY user_id ORDER BY user_id""")),

    // Event-transition matrix (r14): the Markov-chain readout product
    // analytics runs next to funnels — per user, consecutive event pairs
    // in (ts, event_id) order become (src, dst) transitions; corpus-wide
    // counts + per-source probabilities. One lag window over the user
    // partitioning the funnel/sessionize family already shuffles on, one
    // map-side-combined count; the per-src normalizer window adds an
    // exchange but over the ALREADY-AGGREGATED |src|x|dst| table
    // (constant-size), never raw data — pre-partitioning raw rows by src
    // (event-type cardinality) would funnel the corpus into a handful of
    // partitions. (ts, event_id) is a total order, so the transition set
    // is deterministic; probability is one BIGINT/BIGINT IEEE division,
    // round6.
    Op("analytics_transitions",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val wSrc = org.apache.spark.sql.expressions.Window
          .partitionBy(col("src"))
        T.events(s, d)
          .select(col("user_id"), col("event_type").as("dst"),
            lag(col("event_type"), 1).over(w).as("src"))
          .filter(col("src").isNotNull)
          .groupBy(col("src"), col("dst"))
          .agg(count(lit(1)).as("n"))
          .select(col("src"), col("dst"), col("n"),
            round6(col("n").cast("double") / sum(col("n")).over(wSrc))
              .as("p"))
          .orderBy(col("src"), col("dst"))
      },
      Some("""WITH seq AS (
                SELECT user_id, event_type AS dst,
                       lag(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS src
                FROM events),
              t AS (
                SELECT src, dst, count(*) AS n
                FROM seq WHERE src IS NOT NULL GROUP BY src, dst)
              SELECT src, dst, n,
                     round(CAST(n AS DOUBLE)
                           / sum(n) OVER (PARTITION BY src), 6) AS p
              FROM t ORDER BY src, dst""")),

    // Equi-depth traffic deciles (r17): bucket DAYS by order volume into
    // ten equal-population bands — the profiling readout capacity planning
    // and anomaly triage actually use (equi-WIDTH histograms starve on
    // skew; equi-depth puts the same number of days in every band). The
    // global ntile window is scale-SAFE here precisely because it runs on
    // the day-grain aggregate: TPC-H dates span ~2.4k days at EVERY scale
    // factor, so the single-partition window input is bounded-constant
    // while the only corpus-proportional work is the map-side-combined
    // day rollup (the memory-(e) pattern: never pre-sort raw rows for a
    // low-cardinality window). Output is all-integer — no IEEE anywhere.
    Op("analytics_volume_deciles",
      (s, d) => {
        val day = T.orders(s, d)
          .groupBy(to_date(col("o_orderdate")).as("d"))
          .agg(count(lit(1)).as("n_orders"))
        val w = Window.orderBy(col("n_orders"), col("d"))
        day.withColumn("bucket", ntile(10).over(w))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_days"),
            min(col("n_orders")).as("lo"), max(col("n_orders")).as("hi"),
            sum(col("n_orders")).as("sum_orders"))
          .orderBy(col("bucket"))
      },
      Some("""WITH day AS (SELECT CAST(o_orderdate AS DATE) AS d,
                                  count(*) AS n_orders
                           FROM orders GROUP BY 1),
              t AS (SELECT d, n_orders,
                           CAST(ntile(10) OVER (ORDER BY n_orders, d)
                             AS INTEGER) AS bucket
                    FROM day)
              SELECT bucket, CAST(count(*) AS BIGINT) AS n_days,
                     CAST(min(n_orders) AS BIGINT) AS lo,
                     CAST(max(n_orders) AS BIGINT) AS hi,
                     CAST(sum(n_orders) AS BIGINT) AS sum_orders
              FROM t GROUP BY 1 ORDER BY 1""")),

    Op("analytics_rolling_active",
      (s, d) => {
        val ev = T.events(s, d)
        val bounds = ev.agg(min(to_date(col("ts"))).as("d0"),
          max(to_date(col("ts"))).as("d1"))
        ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
          .crossJoin(broadcast(bounds))
          .select(col("user_id"),
            explode(sequence(greatest(col("day"), col("d0")),
              least(date_add(col("day"), 6), col("d1")))).as("report_day"))
          .groupBy(col("report_day"))
          .agg(countDistinct(col("user_id")).as("wau"))
          .orderBy(col("report_day"))
      },
      Some("""WITH b AS (SELECT CAST(min(date_trunc('day', ts)) AS DATE) AS d0,
                                CAST(max(date_trunc('day', ts)) AS DATE) AS d1
                         FROM events),
                   act AS (SELECT DISTINCT user_id,
                                  CAST(date_trunc('day', ts) AS DATE) AS day
                           FROM events)
              SELECT CAST(report_day AS DATE) AS report_day,
                     count(DISTINCT user_id) AS wau
              FROM (SELECT user_id,
                           unnest(generate_series(greatest(day, (SELECT d0 FROM b)),
                                                  least(day + 6, (SELECT d1 FROM b)),
                                                  INTERVAL 1 DAY)) AS report_day
                    FROM act)
              GROUP BY 1 ORDER BY 1""")),

    // Importance resampling: the acceptance rate comes from the DATA (a
    // per-doc quality weight — here token-uniqueness, the text_quality
    // signal), not from a per-stratum constant like stratified_sample.
    // Selection stays content-addressed (md5 bucket of doc_id), so the
    // sample is reproducible across engines, re-runs and repartitioning;
    // floor() is declared on the rate because double→int CAST truncates in
    // Spark but rounds in DuckDB. Map-only scoring + one low-cardinality
    // rollup — nothing here changes at 100 TB.
    Op("analytics_importance_sample",
      (s, d) => {
        val bucket = (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long") % 1000).as("b")
        val weight = least(lit(1.0),
          size(array_distinct(split(col("text"), " "))).cast("double") / 30.0)
        T.documents(s, d)
          .select(col("doc_id"), col("lang"), bucket,
            floor(weight * 1000).cast("long").as("rate"))
          .withColumn("sampled", (col("b") < col("rate")).cast("int"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_total"), sum(col("sampled")).as("n_sampled"),
            // R2: rates are exact longs — sum them exactly and divide ONCE
            // (a floating avg() of rate/1000.0 accumulates ulp error in
            // partition order, which DuckDB's row-order avg need not match)
            round6(sum(col("rate")).cast("double")
              / (lit(1000.0) * count(lit(1)))).as("mean_weight"))
          .withColumn("achieved_rate",
            round6(col("n_sampled").cast("double") / col("n_total")))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, count(*) AS n_total,
                     CAST(sum(sampled) AS BIGINT) AS n_sampled,
                     round(CAST(sum(rate) AS DOUBLE) / (1000.0 * count(*)), 6)
                       AS mean_weight,
                     round(CAST(sum(sampled) AS DOUBLE) / count(*), 6) AS achieved_rate
              FROM (SELECT lang,
                      CAST(floor(least(1.0,
                             len(list_distinct(string_split(text, ' '))) / 30.0)
                           * 1000) AS BIGINT) AS rate,
                      CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS UBIGINT) % 1000
                           AS BIGINT) AS b,
                      CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS UBIGINT) % 1000
                           < floor(least(1.0,
                               len(list_distinct(string_split(text, ' '))) / 30.0)
                             * 1000) AS INTEGER) AS sampled
                    FROM documents)
              GROUP BY lang ORDER BY lang""")),

    // Experiment readout over the content-addressed split: users hash into
    // A/B arms (md5 % 2 — same reproducibility argument as hash_split),
    // conversion = the user ever purchased, and the two-proportion z-score
    // decides significance. All math after the one user-grain aggregation
    // is scalar double arithmetic on a 1-row frame — sqrt and division are
    // IEEE-identical in both engines, round6 kills formatting drift. At
    // 100 TB the plan is one user-grain aggregation + a 1-row reduction.
    Op("analytics_ab_test",
      (s, d) => {
        // conversion = a HEAVY purchaser (≥ 8): on this synthetic feed every
        // user purchases at least once, which would make the pooled rate
        // exactly 1 and the z denominator zero
        val users = T.events(s, d)
          .groupBy(col("user_id"))
          .agg((sum((col("event_type") === "purchase").cast("int")) >= 8)
            .cast("int").as("converted"))
          .withColumn("arm",
            (conv(substring(md5(col("user_id").cast("string")), 1, 4), 16, 10)
              .cast("long") % 2).cast("int"))
        // Conditional aggregation (r6, per ADVICE): one global aggregate
        // always emits exactly one row even when a hash arm is empty —
        // filter+crossJoin of two 1-row frames would emit zero rows there
        // while the oracle's scalar subqueries emit one row of NULLs. The
        // pooled-variance denominator is nullif-guarded so a degenerate
        // pooled rate (0 or 1) yields z = NULL identically in both engines.
        // (Readout extracted as abReadout; degenerate cases pinned in
        // AnalyticsSpec.)
        abReadout(users)
      },
      Some("""WITH u AS (
                SELECT user_id,
                       CAST(sum(CAST(event_type = 'purchase' AS INTEGER)) >= 8
                            AS INTEGER) AS converted,
                       CAST(CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 4)) AS UBIGINT) % 2
                            AS INTEGER) AS arm
                FROM events GROUP BY user_id),
              w AS (SELECT
                      CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                      CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT) AS c_a,
                      CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                      CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT) AS c_b
                    FROM u)
              SELECT n_a, c_a, n_b, c_b,
                     round(CAST(c_a AS DOUBLE) / n_a, 6) AS rate_a,
                     round(CAST(c_b AS DOUBLE) / n_b, 6) AS rate_b,
                     round((CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
                           / nullif(sqrt(CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)
                                  * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                                  * (1.0 / n_a + 1.0 / n_b)), 0), 6) AS z_score,
                     CAST(abs(round((CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
                           / nullif(sqrt(CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)
                                  * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                                  * (1.0 / n_a + 1.0 / n_b)), 0), 6)) > 1.96 AS INTEGER) AS significant
              FROM w""")),

    // Domain mixing to a token budget (the DoReMi/Pile corpus-mixing step):
    // given target mixture weights per domain (en-heavy: 0.5 + 4×0.125) and
    // a global token budget (60% of the corpus), each domain's sampling
    // fraction is min(1, budget·w / domain_tokens) — clamped, so an
    // under-resourced domain contributes everything it has — and documents
    // are then selected content-addressed (md5 bucket vs the fraction in
    // millionths, floor()ed to a LONG threshold because double→int CAST
    // truncates in Spark but rounds in DuckDB). Two tiny aggregations
    // (per-domain totals, corpus total) broadcast into a map-side filter
    // over the corpus: at 100 TB the mixing plan reads the documents table
    // twice and shuffles only 5-row frames — the per-doc accept/reject
    // never leaves the map task. Determinism: budget is integer (×6/10 in
    // long math), the fraction is one multiply + one divide on identical
    // doubles, selection is the md5 idiom shared with hash_split.
    Op("analytics_domain_mix",
      (s, d) => {
        val docs = T.documents(s, d).select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).as("n_tokens"))
        val perLang = docs.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("lang_tokens"))
        // corpus total from the 5-row per-domain aggregate — NOT a second
        // scan of the documents table (identical value: Σ lang_tokens)
        val total = perLang.agg(sum(col("lang_tokens")).as("total_tokens"))
        val planned = perLang.crossJoin(broadcast(total))
          // Column./ is double division; floor() recovers DuckDB's integer
          // // quotient exactly (token totals ≪ 2^53)
          .withColumn("budget_tokens",
            floor(col("total_tokens") * 6 / 10).cast("long"))
          .withColumn("weight", when(col("lang") === "en", lit(0.5)).otherwise(lit(0.125)))
          .withColumn("frac", least(lit(1.0),
            col("budget_tokens") * col("weight") / col("lang_tokens")))
          .withColumn("thr", floor(col("frac") * 1000000).cast("long"))
          .select(col("lang"), col("n_docs"), col("lang_tokens"),
            col("frac"), col("thr"))
        val b = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 1000000
        docs.withColumn("b", b)
          .join(broadcast(planned), Seq("lang"))
          .withColumn("sampled", (col("b") < col("thr")).cast("int"))
          .groupBy(col("lang"), col("n_docs"), col("lang_tokens"), col("frac"))
          .agg(sum(col("sampled")).as("n_sampled"),
            sum(col("sampled") * col("n_tokens")).as("tokens_sampled"))
          .select(col("lang"), col("n_docs"), col("lang_tokens"),
            round6(col("frac")).as("target_frac"), col("n_sampled"),
            col("tokens_sampled"),
            round6(col("tokens_sampled").cast("double") / col("lang_tokens"))
              .as("achieved_frac"))
          .orderBy(col("lang"))
      },
      Some("""WITH docs AS (SELECT doc_id, lang,
                      len(string_split(text, ' ')) AS n_tokens FROM documents),
              pl AS (SELECT lang, count(*) AS n_docs,
                            CAST(sum(n_tokens) AS BIGINT) AS lang_tokens
                     FROM docs GROUP BY lang),
              tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) * 6 // 10
                             AS budget_tokens FROM docs),
              planned AS (
                SELECT lang, n_docs, lang_tokens,
                       least(1.0, budget_tokens
                             * (CASE WHEN lang = 'en' THEN 0.5 ELSE 0.125 END)
                             / lang_tokens) AS frac,
                       CAST(floor(least(1.0, budget_tokens
                             * (CASE WHEN lang = 'en' THEN 0.5 ELSE 0.125 END)
                             / lang_tokens) * 1000000) AS BIGINT) AS thr
                FROM pl, tot),
              sel AS (
                SELECT d.lang, p.n_docs, p.lang_tokens, p.frac,
                       CAST(CAST(concat('0x', substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 1000000
                            < p.thr AS INTEGER) AS sampled,
                       d.n_tokens
                FROM docs d JOIN planned p ON d.lang = p.lang)
              SELECT lang, n_docs, lang_tokens, round(frac, 6) AS target_frac,
                     CAST(sum(sampled) AS BIGINT) AS n_sampled,
                     CAST(sum(sampled * n_tokens) AS BIGINT) AS tokens_sampled,
                     round(CAST(sum(sampled * n_tokens) AS DOUBLE) / lang_tokens, 6)
                       AS achieved_frac
              FROM sel GROUP BY 1, 2, 3, frac ORDER BY lang""")),

    // Domain mixing WITH upsampling — the unclamped case analytics_domain_mix
    // rounds down: when budget·w exceeds a domain's token mass the recipe
    // repeats the domain across epochs (every real LLM data recipe upweights
    // small high-quality domains this way). epochs = budget·w / tokens
    // (here 120% budget, en-weight 0.6 ⇒ en ≈ 1.66 epochs, the rest
    // downsample); each doc emits floor(epochs) full copies plus one more
    // when its md5 bucket clears the fractional threshold. The Spark side
    // RUNS the emission — explode(array_repeat) fans each doc out to its
    // copy count before re-aggregating — so the op exercises the actual
    // row-multiplication path a 100 TB materialization pays (map-only
    // fan-out, no shuffle added; the oracle computes the arithmetically
    // identical Σcopies). Same two broadcast aggregates + map-side
    // selection as domain_mix; a domain emitting zero rows would drop its
    // row here while the oracle keeps a zero row — impossible on this
    // corpus (epochs ≥ 0.7 every lang, deterministic), declared rather
    // than papered over.
    Op("analytics_domain_upsample",
      (s, d) => {
        val docs = T.documents(s, d).select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).as("n_tokens"))
        val perLang = docs.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("lang_tokens"))
        // corpus total from the 5-row per-domain aggregate (see domain_mix)
        val total = perLang.agg(sum(col("lang_tokens")).as("total_tokens"))
        val planned = perLang.crossJoin(broadcast(total))
          .withColumn("budget_tokens",
            floor(col("total_tokens") * 12 / 10).cast("long"))
          .withColumn("weight", when(col("lang") === "en", lit(0.6)).otherwise(lit(0.1)))
          .withColumn("epochs",
            col("budget_tokens") * col("weight") / col("lang_tokens"))
          .withColumn("n_full", floor(col("epochs")).cast("long"))
          .withColumn("thr",
            floor((col("epochs") - floor(col("epochs"))) * 1000000).cast("long"))
          .select(col("lang"), col("n_docs"), col("lang_tokens"),
            col("epochs"), col("n_full"), col("thr"))
        val b = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 1000000
        docs.withColumn("b", b)
          .join(broadcast(planned), Seq("lang"))
          .withColumn("copies",
            (col("n_full") + (col("b") < col("thr")).cast("long")).cast("int"))
          .select(col("lang"), col("n_docs"), col("lang_tokens"), col("epochs"),
            col("n_tokens"),
            explode(array_repeat(lit(1), col("copies"))).as("one"))
          .groupBy(col("lang"), col("n_docs"), col("lang_tokens"), col("epochs"))
          .agg(count(lit(1)).as("n_emitted"), sum(col("n_tokens")).as("tokens_emitted"))
          .select(col("lang"), col("n_docs"), col("lang_tokens"),
            round6(col("epochs")).as("target_epochs"),
            col("n_emitted"), col("tokens_emitted"),
            round6(col("tokens_emitted").cast("double") / col("lang_tokens"))
              .as("achieved_epochs"))
          .orderBy(col("lang"))
      },
      Some("""WITH docs AS (SELECT doc_id, lang,
                      len(string_split(text, ' ')) AS n_tokens FROM documents),
              pl AS (SELECT lang, count(*) AS n_docs,
                            CAST(sum(n_tokens) AS BIGINT) AS lang_tokens
                     FROM docs GROUP BY lang),
              tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) * 12 // 10
                             AS budget_tokens FROM docs),
              planned AS (
                SELECT lang, n_docs, lang_tokens,
                       budget_tokens
                         * (CASE WHEN lang = 'en' THEN 0.6 ELSE 0.1 END)
                         / lang_tokens AS epochs
                FROM pl, tot),
              p2 AS (SELECT lang, n_docs, lang_tokens, epochs,
                            CAST(floor(epochs) AS BIGINT) AS n_full,
                            CAST(floor((epochs - floor(epochs)) * 1000000)
                                 AS BIGINT) AS thr
                     FROM planned),
              sel AS (
                SELECT d.lang, p.n_docs, p.lang_tokens, p.epochs,
                       p.n_full
                         + CAST(CAST(concat('0x', substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 1000000
                                < p.thr AS INTEGER) AS copies,
                       d.n_tokens
                FROM docs d JOIN p2 p ON d.lang = p.lang)
              SELECT lang, n_docs, lang_tokens, round(epochs, 6) AS target_epochs,
                     CAST(sum(copies) AS BIGINT) AS n_emitted,
                     CAST(sum(copies * n_tokens) AS BIGINT) AS tokens_emitted,
                     round(CAST(sum(copies * n_tokens) AS DOUBLE) / lang_tokens, 6)
                       AS achieved_epochs
              FROM sel GROUP BY 1, 2, 3, epochs ORDER BY lang""")),
  )
}
