package thrivespark.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Config-driven schema mapping — the reference's central ETL semantic [K]:
  * a declared per-dataset columns config maps raw fields to typed target
  * columns (never inferred), and rows that fail the declared contract are
  * rejected into a quarantine side-output with per-reason audit counts.
  *
  * The config format is a line-oriented `src:dest:type[:required]` mini
  * grammar (the columns-file analog); `apply` compiles it to a single
  * codegen'd projection, `split` derives accepted/rejected frames from one
  * pass (same predicate, two filters — Catalyst shares the scan). */
object ColumnMapping {

  final case class ColumnSpec(src: String, dest: String, dtype: String,
      required: Boolean)

  def parse(config: String): Seq[ColumnSpec] =
    config.linesIterator.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { line =>
        line.split(":").map(_.trim) match {
          case Array(s, d, t) => ColumnSpec(s, d, t, required = false)
          case Array(s, d, t, "required") => ColumnSpec(s, d, t, required = true)
          case other => throw new IllegalArgumentException(
            s"bad column spec '$line' (want src:dest:type[:required])")
        }
      }.toSeq

  /** Typed projection per the spec; failed casts become NULL (checked by
    * `split`, mirroring the reference's parse-then-validate stages). */
  def project(df: DataFrame, specs: Seq[ColumnSpec]): DataFrame =
    df.select(specs.map(sp =>
      expr(s"try_cast(`${sp.src}` AS ${sp.dtype})").as(sp.dest)): _*)

  /** One-pass audit variant: every input row projected to its typed dest
    * columns plus a `_valid` flag. Callers compute accept aggregates AND
    * reject counts from a single scan with conditional aggregation — no
    * second branch over the input and no eager action (the `split` shape
    * costs two filtered passes when both sides are aggregated separately). */
  def tagged(df: DataFrame, specs: Seq[ColumnSpec]): DataFrame = {
    val typed = df.select(specs.map(sp =>
      expr(s"try_cast(`${sp.src}` AS ${sp.dtype})").as(sp.dest)): _*)
    val valid = specs.filter(_.required).map(sp => col(sp.dest).isNotNull)
      .reduceOption(_ && _).getOrElse(lit(true))
    typed.withColumn("_valid", valid)
  }

  /** The reference's `setup` phase [K §3.1]: deterministic target-table DDL
    * generated from the columns config — the declared contract IS the
    * schema, never inference. Spark-SQL dialect, partitioned parquet (the
    * Hive-DDL analog of ALTER TABLE ADD PARTITION ingestion). */
  def ddl(table: String, specs: Seq[ColumnSpec],
      partitionBy: Seq[String] = Nil): String = {
    val cols = specs.map(sp =>
      s"${sp.dest} ${sp.dtype.toUpperCase}" + (if (sp.required) " NOT NULL" else ""))
    val part = if (partitionBy.isEmpty) "" else
      partitionBy.mkString(" PARTITIONED BY (", ", ", ")")
    s"CREATE TABLE $table (${cols.mkString(", ")}) USING parquet$part"
  }

  /** (accepted, rejected): required-null rows (including cast failures) are
    * quarantined, everything else passes. The rejected frame carries the
    * ORIGINAL raw columns (prefixed `raw_` where they'd collide) plus a
    * `_reject_reason` audit column, so forensics see the offending values,
    * not the NULLs the cast produced. */
  def split(df: DataFrame, specs: Seq[ColumnSpec]): (DataFrame, DataFrame) = {
    // internal prefix avoids ambiguity when a dest name equals a raw name
    def t(dest: String) = s"__typed_$dest"
    val typedCols = specs.map(sp =>
      expr(s"try_cast(`${sp.src}` AS ${sp.dtype})").as(t(sp.dest)))
    val withTyped = df.select(df.columns.map(col).toIndexedSeq ++ typedCols: _*)
    val bad = specs.filter(_.required)
      .map(sp => col(t(sp.dest)).isNull)
      .reduceOption(_ || _).getOrElse(lit(false))
    val accepted = withTyped.filter(!bad)
      .select(specs.map(sp => col(t(sp.dest)).as(sp.dest)): _*)
    val reason = array_join(filter(array(specs.filter(_.required).map(sp =>
      when(col(t(sp.dest)).isNull, lit(s"${sp.dest}:required_null_or_cast"))): _*),
      x => x.isNotNull), ";")
    val rawOut = df.columns.toSeq.map { c =>
      if (specs.exists(_.dest == c)) col(c).as(s"raw_$c") else col(c)
    }
    val rejected = withTyped.filter(bad)
      .select(rawOut :+ reason.as("_reject_reason"): _*)
    (accepted, rejected)
  }
}
