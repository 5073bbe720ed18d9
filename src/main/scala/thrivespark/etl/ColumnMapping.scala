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

  private def violation(specs: Seq[ColumnSpec]): Column =
    specs.filter(_.required)
      .map(sp => col(sp.dest).isNull)
      .reduceOption(_ || _)
      .getOrElse(lit(false))

  /** (accepted, rejected): required-null rows (including cast failures) are
    * quarantined, everything else passes. */
  def split(df: DataFrame, specs: Seq[ColumnSpec]): (DataFrame, DataFrame) = {
    val projected = project(df, specs)
    val bad = violation(specs)
    (projected.filter(!bad), projected.filter(bad))
  }
}
