package thrivespark.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import thrivespark.{Op, Tables => T}
import thrivespark.Det._

/** SURVEY.md §2.5 — window functions (#29–#34).
  * Every window orderBy is total within its partition (R1 inside the frame):
  * the partition key plus a unique tiebreak column. */
object Windows {
  val ops: Seq[Op] = Seq(
    Op("win_ranking",
      (s, d) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        T.customer(s, d).select(
          col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"), // (dtype parity: oracle casts to INT)
          round(percent_rank().over(w), 6).as("pr"))
          .orderBy(col("c_mktsegment"), col("rn"))
      },
      Some("""SELECT c_mktsegment, c_custkey, c_acctbal,
                     CAST(row_number() OVER w AS INTEGER) AS rn,
                     CAST(rank() OVER w AS INTEGER) AS rnk,
                     CAST(dense_rank() OVER w AS INTEGER) AS drnk,
                     CAST(ntile(4) OVER w AS INTEGER) AS quartile,
                     round(percent_rank() OVER w, 6) AS pr
              FROM customer
              WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
              ORDER BY c_mktsegment, rn""")),

    Op("win_running_sum",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T.events(s, d).select(
          col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("running_n"),
          sum(dec(col("value"))).over(w).cast("double").as("running_value"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id,
                     count(*) OVER w AS running_n,
                     CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS running_value
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              ORDER BY event_id""")),

    Op("win_lag_lead",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        T.events(s, d).select(
          col("event_id"), col("user_id"),
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"),
          lead(col("event_type"), 1).over(w).as("next_type"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id,
                     epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS gap_us,
                     lead(event_type, 1) OVER w AS next_type
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
              ORDER BY event_id""")),

    // Daily granularity is bounded (~2,400 days) regardless of data scale, so
    // the single-partition window over the daily rollup is scale-safe.
    Op("win_moving_avg",
      (s, d) => {
        val daily = T.orders(s, d)
          .groupBy(col("o_orderdate").cast("date").as("dt"))
          .agg(sum(dec(col("o_totalprice"))).as("day_total_dec"), count(lit(1)).as("day_n"))
        val w = Window.orderBy(col("dt")).rowsBetween(-6, 0)
        daily.select(col("dt"), col("day_total_dec").cast("double").as("day_total"),
          sum(col("day_total_dec")).over(w).cast("double").as("mov_sum"),
          count(lit(1)).over(w).as("mov_n"),
          round(sum(col("day_total_dec")).over(w).cast("double") /
                count(lit(1)).over(w), 6).as("mov_avg"))
          .orderBy(col("dt"))
      },
      Some("""WITH daily AS (
                SELECT CAST(o_orderdate AS DATE) AS dt,
                       sum(CAST(o_totalprice AS DECIMAL(18,6))) AS day_total_dec,
                       count(*) AS day_n
                FROM orders GROUP BY 1)
              SELECT dt, CAST(day_total_dec AS DOUBLE) AS day_total,
                     CAST(sum(day_total_dec) OVER w AS DOUBLE) AS mov_sum,
                     count(*) OVER w AS mov_n,
                     round(CAST(sum(day_total_dec) OVER w AS DOUBLE) / count(*) OVER w, 6) AS mov_avg
              FROM daily
              WINDOW w AS (ORDER BY dt ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
              ORDER BY dt""")),

    Op("win_first_last",
      (s, d) => {
        // l_linenumber is NOT unique within an order in this data (FIXTURES);
        // the tiebreak chain below is verified unique at sf0.01.
        val w = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("l_shipdate"), col("l_linenumber"), col("l_quantity"),
                   col("l_extendedprice"), col("l_partkey"), col("l_suppkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        T.lineitem(s, d).select(
          col("l_orderkey"),
          first(col("l_shipdate")).over(w).cast("date").as("first_ship"),
          first(col("l_quantity")).over(w).as("first_qty"),
          last(col("l_shipdate")).over(w).cast("date").as("last_ship"),
          last(col("l_quantity")).over(w).as("last_qty"))
          .distinct()
          .orderBy(col("l_orderkey"))
      },
      Some("""SELECT DISTINCT l_orderkey,
                     CAST(first_value(l_shipdate) OVER w AS DATE) AS first_ship,
                     first_value(l_quantity) OVER w AS first_qty,
                     CAST(last_value(l_shipdate) OVER w AS DATE) AS last_ship,
                     last_value(l_quantity) OVER w AS last_qty
              FROM lineitem
              WINDOW w AS (PARTITION BY l_orderkey
                           ORDER BY l_shipdate, l_linenumber, l_quantity,
                                    l_extendedprice, l_partkey, l_suppkey
                           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
              ORDER BY l_orderkey""")),

    Op("win_dist_nth",
      (s, d) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal"), col("c_custkey"))
        val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        T.customer(s, d).select(
          col("c_mktsegment"), col("c_custkey"),
          round(cume_dist().over(w), 6).as("cd"),
          nth_value(col("c_name"), 2).over(wf).as("second_name"))
          .orderBy(col("c_mktsegment"), col("c_custkey"))
      },
      Some("""SELECT c_mktsegment, c_custkey,
                     round(cume_dist() OVER w, 6) AS cd,
                     nth_value(c_name, 2) OVER (PARTITION BY c_mktsegment
                        ORDER BY c_acctbal, c_custkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_name
              FROM customer
              WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
              ORDER BY c_mktsegment, c_custkey""")),

    // Batch sessionization — gaps-and-islands: flag gaps > 30 min, running
    // sum of flags numbers the sessions, then aggregate per session. The
    // window shuffles once on user_id and both window passes share that
    // partitioning (PLANS: single Exchange). Complements stream_session,
    // which gets the same semantics from session_window on a stream.
    Op("win_sessionize",
      (s, d) => {
        val gapUs = 30L * 60 * 1000000
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T.events(s, d)
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
          .withColumn("new_s",
            when(col("us") - lag(col("us"), 1).over(w) > gapUs ||
                 lag(col("us"), 1).over(w).isNull, 1).otherwise(0))
          .withColumn("session_id", sum(col("new_s")).over(run))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
               min(col("us")).as("start_us"), max(col("us")).as("end_us"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""WITH flagged AS (
                SELECT user_id, event_id, epoch_us(ts) AS us,
                       CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1)
                              OVER (PARTITION BY user_id ORDER BY ts, event_id)
                              > 30 * 60 * 1000000
                            OR lag(epoch_us(ts), 1)
                              OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                            THEN 1 ELSE 0 END AS new_s
                FROM events),
              sess AS (
                SELECT user_id, us,
                       CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
                FROM flagged)
              SELECT user_id, session_id, count(*) AS n_events,
                     min(us) AS start_us, max(us) AS end_us
              FROM sess GROUP BY user_id, session_id
              ORDER BY user_id, session_id""")),

    Op("topk_per_group",
      (s, d) => {
        val w = Window.partitionBy(col("p_brand"))
          .orderBy(col("p_retailprice").desc, col("p_partkey"))
        T.part(s, d).select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= 3)
          .orderBy(col("p_brand"), col("rn"))
      },
      Some("""SELECT p_brand, p_partkey, p_retailprice,
                     CAST(row_number() OVER (PARTITION BY p_brand
                                        ORDER BY p_retailprice DESC, p_partkey) AS INTEGER) AS rn
              FROM part
              QUALIFY rn <= 3
              ORDER BY p_brand, rn""")),

    // ntile quantile sharding (r6): assign each row to one of N
    // equal-count buckets within its group — the window primitive behind
    // quantile-stratified train/val splits and per-segment score bands.
    // SQL-standard semantics (earlier buckets take the remainder), so the
    // oracle is exact; one window shuffle on the group key, and the
    // orderBy carries the unique key tiebreak for total order (R1).
    Op("win_ntile",
      (s, d) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal"), col("c_custkey"))
        T.customer(s, d).select(
          col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          ntile(4).over(w).as("quartile"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_mktsegment, c_acctbal,
                     CAST(ntile(4) OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal, c_custkey) AS INTEGER) AS quartile
              FROM customer ORDER BY c_custkey""")),
  )
}
