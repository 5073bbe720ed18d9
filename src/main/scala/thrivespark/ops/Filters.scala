package thrivespark.ops

import org.apache.spark.sql.functions._
import thrivespark.{Op, Tables => T}
import thrivespark.Det._

/** SURVEY.md §2.2 — projection / filter / null semantics / DQ gate (#6–#9).
  * The testdata has no NULLs (FIXTURES.md), so null-handling ops derive them
  * via nullif — l_discount has 2,941 exact zeros at sf0.01. */
object Filters {
  val ops: Seq[Op] = Seq(
    Op("project_cast_rename",
      (s, d) => T.orders(s, d).select(
        col("o_orderkey").as("order_id"),
        col("o_custkey").as("customer_id"),
        col("o_orderstatus").as("status"),
        col("o_totalprice").cast("decimal(18,2)").cast("double").as("total_price"),
        col("o_orderdate").cast("date").as("order_date"),
        year(col("o_orderdate")).as("o_year"))
        .orderBy(col("order_id")),
      Some("""SELECT o_orderkey AS order_id, o_custkey AS customer_id, o_orderstatus AS status,
                     CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
                     CAST(o_orderdate AS DATE) AS order_date,
                     CAST(year(o_orderdate) AS INTEGER) AS o_year
              FROM orders ORDER BY order_id""")),

    Op("filter_compound",
      (s, d) => T.customer(s, d)
        .filter((col("c_acctbal").between(0, 5000) &&
                 col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")) ||
                col("c_name").like("%42"))
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
                col("c_acctbal"), col("c_mktsegment"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
              FROM customer
              WHERE (c_acctbal BETWEEN 0 AND 5000 AND c_mktsegment IN ('BUILDING','AUTOMOBILE'))
                 OR c_name LIKE '%42'
              ORDER BY c_custkey""")),

    Op("filter_null_handling",
      (s, d) => {
        val li = T.lineitem(s, d).withColumn("dn", nullif(col("l_discount"), lit(0.0)))
        li.agg(
          count(lit(1)).as("n_total"),
          count(col("dn")).as("n_notnull"),
          count(when(col("dn").isNull, 1)).as("n_null"),
          count(when(col("dn") <=> lit(0.05), 1)).as("n_nullsafe_005"),
          sum(dec(coalesce(col("dn"), lit(0.0)))).cast("double").as("sum_disc"))
      },
      Some("""SELECT count(*) AS n_total,
                     count(nullif(l_discount, 0)) AS n_notnull,
                     count(*) FILTER (WHERE nullif(l_discount, 0) IS NULL) AS n_null,
                     count(*) FILTER (WHERE nullif(l_discount, 0) IS NOT DISTINCT FROM 0.05) AS n_nullsafe_005,
                     CAST(sum(CAST(coalesce(nullif(l_discount, 0), 0) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc
              FROM lineitem""")),

    // The props parse comes from the shared parsed-events projection
    // (Tables.eventsParsed) — one JSON parse serves every `$.k` consumer.
    Op("dq_validate_reject",
      (s, d) => T.eventsParsed(s, d)
        .withColumn("status",
          when(col("k").between(0, 99) && col("value") > 0, "ok").otherwise("reject"))
        .groupBy(col("status")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("status")),
      Some("""SELECT CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) BETWEEN 0 AND 99
                           AND value > 0 THEN 'ok' ELSE 'reject' END AS status,
                     count(*) AS cnt
              FROM events GROUP BY 1 ORDER BY 1""")),
  )
}
