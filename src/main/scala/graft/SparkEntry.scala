package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The engine itself lives in the `thrivespark` package; this object is the
  * thin driver-facing surface. */
object SparkEntry {
  /** Flagship query (SURVEY.md §7.2 — TPC-H Q1 shape, #21) on
    * /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    thrivespark.Registry.queries("agg_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2
    * (insertion-ordered ListMap so Bench timings are stable). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    thrivespark.Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    thrivespark.Registry.oracles
}
