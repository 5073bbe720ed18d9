package thrivespark.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Generic nested-to-flat projection — the reference's central parse step
  * [K §3.1: MR mapper flattens nested JSON to delimited scalar rows],
  * engine-native: recursively expands every StructType field to a top-level
  * column named by its path. A pure projection, so it stays inside
  * whole-stage codegen and costs nothing beyond the field access; arrays
  * are left intact (exploding is a row-multiplying choice the caller makes
  * deliberately, e.g. via posexplode). */
object Flatten {

  def flatten(df: DataFrame, sep: String = "_"): DataFrame = {
    def expand(schema: StructType, path: Seq[String]): Seq[Column] =
      schema.fields.toSeq.flatMap { f =>
        val p = path :+ f.name
        f.dataType match {
          case st: StructType => expand(st, p)
          case _ => Seq(col(p.map(n => s"`$n`").mkString(".")).as(p.mkString(sep)))
        }
      }
    df.select(expand(df.schema, Nil): _*)
  }
}
