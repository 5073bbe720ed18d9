package thrivespark.ops

import org.apache.spark.sql.functions._
import thrivespark.{Op, Tables => T}
import thrivespark.Det._
import thrivespark.udf.GiniAggregator

/** SURVEY.md §2.11 — UDF / UDAF / UDTF surface (#61–#63).
  *
  * #61 registers a Scala UDF as the surface demo (the hot-path variant of
  * shingling stays native — Shingles.shingles3 — because codegen'd
  * higher-order functions beat closures at scale; PlanSpec asserts both give
  * identical results).
  * #62 is the typed Aggregator registered via udaf().
  * #63 shows the Generator surface with posexplode (no custom Generator
  * needed — SURVEY.md §7.5). */
object UdfSurface {
  /** Word n-gram shingles as a plain Scala function (UDF surface, #61). */
  def shinglesFn(text: String, n: Int): Seq[String] = {
    val t = text.split(" ", -1)
    if (t.length < n) Seq.empty
    else t.sliding(n).map(_.mkString(" ")).toSeq.distinct
  }

  val ops: Seq[Op] = Seq(
    Op("udf_scalar",
      (s, d) => {
        val shinglesUdf = udf(shinglesFn _)
        s.udf.register("shingles", shinglesUdf)
        T.documents(s, d)
          .select(col("doc_id"), shinglesUdf(col("text"), lit(3)).as("sh"))
          .select(col("doc_id"), size(col("sh")).as("n_shingles"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id, CAST(len(${Shingles.duckShingles3FromT}) AS INTEGER) AS n_shingles
              FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
              ORDER BY doc_id""")),

    Op("udaf_typed",
      (s, d) => {
        val gini = udaf(GiniAggregator)
        s.udf.register("gini", gini)
        T.customer(s, d)
          .groupBy(col("c_mktsegment"))
          .agg(gini(col("c_acctbal")).as("gini_bal"), count(lit(1)).as("n"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""WITH r AS (
                SELECT c_mktsegment, c_acctbal,
                       row_number() OVER (PARTITION BY c_mktsegment
                                          ORDER BY c_acctbal, c_custkey) AS rn
                FROM customer),
              a AS (
                SELECT c_mktsegment,
                       sum(CAST(rn * c_acctbal AS DECIMAL(18,6))) AS s1,
                       sum(CAST(c_acctbal AS DECIMAL(18,6))) AS s,
                       count(*) AS n
                FROM r GROUP BY c_mktsegment)
              SELECT c_mktsegment,
                     round(2.0 * CAST(s1 AS DOUBLE) / (n * CAST(s AS DOUBLE))
                                - (n + 1.0) / n, 6) AS gini_bal,
                     n
              FROM a ORDER BY c_mktsegment""")),

    Op("udtf_generator",
      (s, d) => T.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .orderBy(col("doc_id"), col("pos")),
      Some("""SELECT * FROM (
                SELECT doc_id,
                       unnest([{'pos': CAST(i - 1 AS INTEGER), 'tok': t[i]} for i in generate_series(1, len(t))],
                              recursive := true)
                FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))
              ORDER BY doc_id, pos""")),

    // The typed Dataset[T] surface: case-class encoder, typed filter,
    // groupByKey + mapGroups — per-group imperative logic with compile-time
    // row types (the API tier between columnar exprs and raw RDDs).
    // Determinism inside mapGroups: money is folded as exact integer cents
    // (order-independent long addition), one double division at the end —
    // so arbitrary iterator order per group can't drift the result. Plan:
    // pushed scan → one groupByKey exchange → MapGroups; object serdes cost
    // is the documented price of this tier (the columnar ops above stay in
    // codegen, which is why only per-group imperative logic should live
    // here).
    Op("typed_dataset_pipeline",
      (s, d) => {
        import s.implicits._
        val ds = T.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice"), col("o_orderstatus"))
          .as[TypedOrder]
        ds.filter(_.o_totalprice > 100000.0)
          .groupByKey(_.o_orderstatus)
          .mapGroups { (status, it) =>
            var n = 0L; var cents = 0L
            it.foreach { o => n += 1; cents += math.round(o.o_totalprice * 100) }
            (status, n, cents / 100.0)
          }
          .toDF("o_orderstatus", "n", "total")
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
                     CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
              FROM orders WHERE o_totalprice > 100000.0
              GROUP BY o_orderstatus ORDER BY o_orderstatus""")),
  )
}

/** Typed row for the Dataset[T] surface op (encoders need a stable
  * top-level case class). */
case class TypedOrder(o_orderkey: Long, o_custkey: Long,
    o_totalprice: Double, o_orderstatus: String)
