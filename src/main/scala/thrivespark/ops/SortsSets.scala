package thrivespark.ops

import org.apache.spark.sql.functions._
import thrivespark.{Op, Tables => T}

/** SURVEY.md §2.6 sort/limit (#35–#36) and §2.7 set operations (#37–#40). */
object SortsSets {
  val ops: Seq[Op] = Seq(
    Op("sort_multi_nulls",
      (s, d) => T.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          nullif(col("l_discount"), lit(0.0)).as("dn"))
        .orderBy(col("dn").asc_nulls_first, col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, nullif(l_discount, 0) AS dn
              FROM lineitem
              ORDER BY dn ASC NULLS FIRST, l_orderkey, l_linenumber""")),

    // TakeOrderedAndProject: top-k never sorts the full dataset globally.
    Op("topk_global",
      (s, d) => T.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20),
      Some("""SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""")),

    Op("set_union_all",
      (s, d) => {
        val c = T.customer(s, d).select(col("c_nationkey").as("nk"), lit("customer").as("src"))
        val u = T.supplier(s, d).select(col("s_nationkey").as("nk"), lit("supplier").as("src"))
        c.unionByName(u).groupBy(col("nk"), col("src")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("nk"), col("src"))
      },
      Some("""SELECT nk, src, count(*) AS cnt FROM (
                SELECT c_nationkey AS nk, 'customer' AS src FROM customer
                UNION ALL
                SELECT s_nationkey AS nk, 'supplier' AS src FROM supplier)
              GROUP BY nk, src ORDER BY nk, src""")),

    Op("set_union_distinct",
      (s, d) => T.customer(s, d).select(col("c_nationkey").as("nk"))
        .union(T.supplier(s, d).select(col("s_nationkey").as("nk")))
        .distinct()
        .orderBy(col("nk")),
      Some("""SELECT c_nationkey AS nk FROM customer
              UNION
              SELECT s_nationkey FROM supplier
              ORDER BY nk""")),

    Op("set_intersect",
      (s, d) => T.customer(s, d).select(col("c_nationkey").as("nk"))
        .intersect(T.supplier(s, d).select(col("s_nationkey").as("nk")))
        .orderBy(col("nk")),
      Some("""SELECT c_nationkey AS nk FROM customer
              INTERSECT
              SELECT s_nationkey FROM supplier
              ORDER BY nk""")),

    // Multiset (bag) semantics: multiplicity respected on both sides.
    Op("set_intersect_all",
      (s, d) => T.customer(s, d).select(col("c_nationkey").as("nk"))
        .intersectAll(T.supplier(s, d).select(col("s_nationkey").as("nk")))
        .orderBy(col("nk")),
      Some("""SELECT c_nationkey AS nk FROM customer
              INTERSECT ALL
              SELECT s_nationkey FROM supplier
              ORDER BY nk""")),

    Op("set_except_all",
      (s, d) => T.supplier(s, d).select(col("s_nationkey").as("nk"))
        .exceptAll(T.customer(s, d).select(col("c_nationkey").as("nk")))
        .orderBy(col("nk")),
      Some("""SELECT s_nationkey AS nk FROM supplier
              EXCEPT ALL
              SELECT c_nationkey FROM customer
              ORDER BY nk""")),

    Op("set_except",
      (s, d) => T.customer(s, d).select(col("c_nationkey").as("nk"))
        .except(T.supplier(s, d).select(col("s_nationkey").as("nk")))
        .orderBy(col("nk")),
      Some("""SELECT c_nationkey AS nk FROM customer
              EXCEPT
              SELECT s_nationkey FROM supplier
              ORDER BY nk""")),
  )
}
