package thrivespark.ops

import org.apache.spark.sql.functions._
import thrivespark.{Op, Tables => T}
import thrivespark.Det._

/** SURVEY.md §2.3 — join surface (#10–#20).
  *
  * Scale notes (100 TB design point):
  *  - dims (nation/region) broadcast explicitly (#11) — no shuffle of the fact;
  *  - the biggest join (#12 lineitem⋈orders) is pinned sort-merge, the plan
  *    Spark picks at scale; AQE re-plans skew at runtime;
  *  - #18 theta join keeps the small side broadcast (BNLJ over 1k rows);
  *  - #19 interval join is bucketized on (user, hour-bucket) so the shuffle key
  *    carries the time dimension — O(events-per-bucket²) not O(events-per-user²);
  *  - #20 as-of join = equi-shuffle on user + per-event window, the standard
  *    distributed formulation (no driver-side state).
  */
object Joins {
  val ops: Seq[Op] = Seq(
    Op("join_inner_hash",
      (s, d) => T.orders(s, d).join(T.customer(s, d),
          col("o_custkey") === col("c_custkey"), "inner")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
                     count(*) AS n_orders
              FROM orders JOIN customer ON o_custkey = c_custkey
              GROUP BY c_custkey, c_name ORDER BY c_custkey""")),

    Op("join_broadcast",
      (s, d) => T.customer(s, d)
        .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(T.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name")).agg(count(lit(1)).as("n_customers"))
        .orderBy(col("r_name")),
      Some("""SELECT r_name, count(*) AS n_customers
              FROM customer JOIN nation ON c_nationkey = n_nationkey
                            JOIN region ON n_regionkey = r_regionkey
              GROUP BY r_name ORDER BY r_name""")),

    Op("join_sort_merge",
      (s, d) => T.lineitem(s, d).hint("merge")
        .join(T.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_totalprice"))
        .agg(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).cast("double").as("net_lines"),
             count(lit(1)).as("n_lines"))
        .select(col("o_orderkey"), col("o_totalprice").as("total_price"),
                col("net_lines"), col("n_lines"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey, o_totalprice AS total_price,
                     CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS net_lines,
                     count(*) AS n_lines
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              GROUP BY o_orderkey, o_totalprice ORDER BY o_orderkey""")),

    Op("join_left_outer",
      (s, d) => {
        val lsum = T.lineitem(s, d).groupBy(col("l_orderkey"))
          .agg(dsum(col("l_quantity")).as("sq"), count(lit(1)).as("nl"))
        T.orders(s, d).join(lsum, col("o_orderkey") === col("l_orderkey"), "left")
          .select(col("o_orderkey"),
            coalesce(col("sq"), lit(0.0)).as("sum_qty"),
            coalesce(col("nl"), lit(0L)).as("n_lines"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
                     coalesce(sq, 0.0) AS sum_qty,
                     coalesce(nl, 0) AS n_lines
              FROM orders LEFT JOIN (
                SELECT l_orderkey,
                       CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sq,
                       count(*) AS nl
                FROM lineitem GROUP BY l_orderkey) s ON o_orderkey = l_orderkey
              ORDER BY o_orderkey""")),

    Op("join_full_outer",
      (s, d) => {
        val eu = T.events(s, d).select(col("user_id")).distinct()
        T.customer(s, d).select(col("c_custkey"))
          .join(eu, col("c_custkey") === col("user_id"), "full")
          .select(coalesce(col("c_custkey"), col("user_id")).as("k"),
            when(col("c_custkey").isNull, "event_only")
              .when(col("user_id").isNull, "cust_only")
              .otherwise("both").as("side"))
          .orderBy(col("k"))
      },
      Some("""SELECT coalesce(c_custkey, user_id) AS k,
                     CASE WHEN c_custkey IS NULL THEN 'event_only'
                          WHEN user_id IS NULL THEN 'cust_only'
                          ELSE 'both' END AS side
              FROM (SELECT c_custkey FROM customer) c
              FULL OUTER JOIN (SELECT DISTINCT user_id FROM events) e
                ON c_custkey = user_id
              ORDER BY k""")),

    Op("join_left_semi",
      (s, d) => T.customer(s, d)
        .join(T.orders(s, d).filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
              ORDER BY c_custkey""")),

    Op("join_left_anti",
      (s, d) => T.customer(s, d)
        .join(T.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
              ORDER BY c_custkey""")),

    Op("join_cross",
      (s, d) => T.region(s, d).crossJoin(T.nation(s, d))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name")),
      Some("""SELECT r_name, n_name FROM region CROSS JOIN nation
              ORDER BY r_name, n_name""")),

    // θ-band self-join, band-decomposed (r8, replacing the quadratic BNLJ):
    // bucketize balances at the band width, explode the probe side into its
    // bucket ±1 (any pair with |Δ| < w shares one of those buckets), and
    // ride the bucket equality as an equi-join key — the exact band + key
    // predicates re-check inside the bucket. Each qualifying pair matches in
    // exactly ONE bucket (b's bucket is unique; a's 3 exploded values are
    // distinct), so no dedup pass is needed. Per-task work is O(Σ bucket²)
    // on the shuffle key instead of O(N²) — the same move as
    // join_range_interval's hour buckets, applied to a value band.
    Op("join_theta_band",
      (s, d) => {
        val w = 10.0
        val s1 = T.supplier(s, d)
          .select(col("s_suppkey").as("a_key"), col("s_acctbal").as("a_bal"))
          .withColumn("pb", explode(array(floor(col("a_bal") / w) - 1,
            floor(col("a_bal") / w), floor(col("a_bal") / w) + 1)))
        val s2 = T.supplier(s, d)
          .select(col("s_suppkey").as("b_key"), col("s_acctbal").as("b_bal"))
          .withColumn("fb", floor(col("b_bal") / w))
        s1.join(s2, col("pb") === col("fb") &&
            col("a_key") < col("b_key") && abs(col("a_bal") - col("b_bal")) < w)
          .select(col("a_key"), col("b_key"))
          .orderBy(col("a_key"), col("b_key"))
      },
      Some("""SELECT a.s_suppkey AS a_key, b.s_suppkey AS b_key
              FROM supplier a JOIN supplier b
                ON a.s_suppkey < b.s_suppkey AND abs(a.s_acctbal - b.s_acctbal) < 10
              ORDER BY a_key, b_key""")),

    // Interval self-join: pairs of events of the same user within (0, 1h].
    // Bucketized on the hour so the shuffle key carries time — each probe row
    // lands in exactly 2 buckets, keeping per-task work O(bucket²) at scale.
    Op("join_range_interval",
      (s, d) => {
        val bucketUs = 3600000000L // 1 hour in µs
        val e = T.events(s, d)
          .select(col("user_id"), col("event_id").as("a_id"),
            unix_micros(col("ts")).as("a_us"))
          .withColumn("pb", explode(array(
            floor(col("a_us") / bucketUs), floor(col("a_us") / bucketUs) + 1)))
        val f = T.events(s, d)
          .select(col("user_id").as("f_user"), col("event_id").as("b_id"),
            unix_micros(col("ts")).as("b_us"))
          .withColumn("fb", floor(col("b_us") / bucketUs))
        e.join(f, col("user_id") === col("f_user") && col("pb") === col("fb") &&
            col("b_us") > col("a_us") && col("b_us") <= col("a_us") + bucketUs)
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT a.user_id, count(*) AS n_pairs
              FROM events a JOIN events b
                ON a.user_id = b.user_id
               AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
              GROUP BY a.user_id ORDER BY a.user_id""")),

    // As-of (backward): for each event, that customer's latest order at ts.
    // max_by over the (date, key) tuple instead of a row_number window: the
    // hash aggregate gets map-side partial combine, so the shuffle carries
    // one row per event, not one per candidate order — the plan that matters
    // when the probe side is 100 TB.
    Op("join_asof",
      (s, d) => {
        val e = T.events(s, d).select(col("event_id"), col("user_id"), col("ts"))
        val o = T.orders(s, d).select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        e.join(o, col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"))
          .groupBy(col("event_id"))
          .agg(max_by(struct(col("o_orderkey"), col("o_orderdate")),
                      struct(col("o_orderdate"), col("o_orderkey"))).as("m"))
          .select(col("event_id"), col("m.o_orderkey").as("o_orderkey"),
            col("m.o_orderdate").cast("date").as("order_date"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, o_orderkey, CAST(o_orderdate AS DATE) AS order_date
              FROM (
                SELECT e.event_id, o.o_orderkey, o.o_orderdate,
                       row_number() OVER (PARTITION BY e.event_id
                                          ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
                FROM events e JOIN orders o
                  ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
              WHERE rn = 1 ORDER BY event_id""")),

    // As-of with a staleness TOLERANCE (the feature-store point-in-time
    // lookup contract): the matched order must be within 30 days BEFORE the
    // event — older state is considered expired and the row null-pads
    // instead of silently joining stale data. Same max_by reduction as
    // join_asof (map-side combinable, no per-key window sort); the left
    // join back preserves unmatched events. The band predicate rides the
    // equi-join on user, so no extra shuffle vs the unbounded as-of.
    Op("join_asof_tolerance",
      (s, d) => {
        val e = T.events(s, d).select(col("event_id"), col("user_id"), col("ts"))
        val o = T.orders(s, d).select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        val matched = e.join(o,
            col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts") &&
            col("o_orderdate") >= col("ts") - expr("INTERVAL 30 DAYS"))
          .groupBy(col("event_id"))
          .agg(max_by(struct(col("o_orderkey"), col("o_orderdate")),
                      struct(col("o_orderdate"), col("o_orderkey"))).as("m"))
          .select(col("event_id"), col("m.o_orderkey").as("o_orderkey"),
            col("m.o_orderdate").as("od"))
        e.join(matched, Seq("event_id"), "left")
          .select(col("event_id"), col("o_orderkey"),
            datediff(to_date(col("ts")), to_date(col("od"))).as("staleness_days"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT e.event_id, m.o_orderkey,
                     CAST(date_diff('day', CAST(m.od AS DATE), CAST(e.ts AS DATE))
                          AS INTEGER) AS staleness_days
              FROM events e LEFT JOIN (
                SELECT event_id, o_orderkey, od FROM (
                  SELECT e.event_id, o.o_orderkey, o.o_orderdate AS od,
                         row_number() OVER (PARTITION BY e.event_id
                                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
                  FROM events e JOIN orders o
                    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
                       AND o.o_orderdate >= e.ts - INTERVAL 30 DAY)
                WHERE rn = 1) m ON e.event_id = m.event_id
              ORDER BY e.event_id""")),

    // Same semantics through the custom whole-operator path (LogicalPlan +
    // Strategy + SparkPlan, thrivespark.plans.AsOfJoin): sorted two-pointer
    // merge, no candidate-pair materialization. LEFT OUTER flavor.
    Op("join_asof_native",
      (s, d) => {
        val e = T.events(s, d).select(col("event_id"), col("user_id"), col("ts"))
        val o = T.orders(s, d).select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        thrivespark.plans.AsOf.backward(e, o,
            "user_id", "o_custkey", "ts", "o_orderdate", "o_orderkey")
          .select(col("event_id"), col("o_orderkey"),
            col("o_orderdate").cast("date").as("order_date"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, o_orderkey, CAST(o_orderdate AS DATE) AS order_date
              FROM (
                SELECT e.event_id, o.o_orderkey, o.o_orderdate,
                       row_number() OVER (PARTITION BY e.event_id
                                          ORDER BY o.o_orderdate DESC NULLS LAST,
                                                   o.o_orderkey DESC NULLS LAST) AS rn
                FROM events e LEFT JOIN orders o
                  ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
              WHERE rn = 1 ORDER BY event_id""")),

    // Fuzzy edit-distance record linkage (r12): match a dirty FEED of
    // titles back to the clean CATALOG under a bounded edit distance — the
    // entity-resolution join PPJoin's token-set similarity can't express
    // (typo/OCR-noise matching is character-, not token-grained). Fixture:
    // every catalog title (the doc's 24-char prefix) re-enters as a feed
    // row with TWO planted substitutions at id-dependent positions — built
    // from the same concat/substring expression in both engines. Blocking
    // is the aligned 3×8-char segment pigeonhole: ≤2 substitutions can
    // touch at most 2 of 3 segments, so every true match shares an aligned
    // segment (exact recall for the declared Hamming-≤2 regime; shifts
    // from insert/delete would need PassJoin's position windows — declared
    // out of scope). Candidates ride an EQUI-join on (segment_idx, bytes)
    // — one hash shuffle, bucket-bounded, never all-pairs — then the full
    // levenshtein verify (identical DP in both engines) keeps pairs ≤ 2.
    // On this corpus: all 500 planted links recover + 50 genuine 24-char
    // prefix near-collisions surface.
    Op("join_fuzzy_edit",
      (s, d) => {
        val base = T.documents(s, d)
          .select(col("doc_id"), substring(col("text"), 1, 24).as("t"))
          .withColumn("p1", (lit(3) + col("doc_id") % 5).cast("int"))
          .withColumn("p2", (lit(15) + col("doc_id") % 7).cast("int"))
        val cat = base.select(col("doc_id").as("cat_id"), col("t").as("title"))
        val feed = base.select((col("doc_id") + 1000000L).as("feed_id"),
          concat(col("t").substr(lit(1), col("p1") - 1), lit("#"),
            col("t").substr(col("p1") + 1, col("p2") - col("p1") - 1), lit("@"),
            col("t").substr(col("p2") + 1, lit(24))).as("title"))
        def segs(df: org.apache.spark.sql.DataFrame, id: String, tAs: String) =
          df.select(col(id), col("title").as(tAs),
            posexplode(transform(sequence(lit(0), lit(2)),
              i => col("title").substr(i * 8 + 1, lit(8)))).as(Seq("i", "seg")))
        segs(feed, "feed_id", "ft").join(segs(cat, "cat_id", "ct"), Seq("i", "seg"))
          .select(col("feed_id"), col("cat_id"), col("ft"), col("ct")).distinct()
          // compute the O(len²) DP once: Spark does not CSE across
          // Filter and Project
          .withColumn("dist", levenshtein(col("ft"), col("ct")))
          .filter(col("dist") <= 2)
          .select(col("feed_id"), col("cat_id"), col("dist"))
          .orderBy(col("feed_id"), col("cat_id"))
      },
      Some("""WITH cat AS (SELECT doc_id AS cat_id,
                                  substring(text, 1, 24) AS title FROM documents),
              feed AS (
                SELECT doc_id + 1000000 AS feed_id,
                       concat(substring(t, 1, p1 - 1), '#',
                              substring(t, p1 + 1, p2 - p1 - 1), '@',
                              substring(t, p2 + 1, 24)) AS title
                FROM (SELECT doc_id, substring(text, 1, 24) AS t,
                             3 + doc_id % 5 AS p1, 15 + doc_id % 7 AS p2
                      FROM documents)),
              cseg AS (SELECT cat_id, i, substring(title, i*8+1, 8) AS seg,
                              title
                       FROM cat, unnest(generate_series(0, 2)) AS u(i)),
              fseg AS (SELECT feed_id, i, substring(title, i*8+1, 8) AS seg,
                              title
                       FROM feed, unnest(generate_series(0, 2)) AS u(i)),
              cand AS (SELECT DISTINCT f.feed_id, c.cat_id,
                              f.title AS ft, c.title AS ct
                       FROM fseg f JOIN cseg c ON f.i = c.i AND f.seg = c.seg)
              SELECT feed_id, cat_id,
                     CAST(levenshtein(ft, ct) AS INTEGER) AS dist
              FROM cand WHERE levenshtein(ft, ct) <= 2
              ORDER BY feed_id, cat_id""")),
  )
}
