package thrivespark.sinks

import org.apache.spark.sql.DataFrame

/** SURVEY.md §2.1 #5 — the Vertica-COPY analog behind a sink interface.
  * No JDBC database exists in this offline environment, so the JDBC path is
  * exercised against RecordingSink in SinkSpec; JdbcSink is the production
  * wiring (df.write.jdbc with batched writes — the Spark-native bulk-load
  * path, partition-parallel on a cluster). */
trait TableSink {
  def write(df: DataFrame, table: String): Unit
}

/** Production JDBC sink: batched, partition-parallel inserts. */
final class JdbcSink(url: String, props: java.util.Properties,
    batchSize: Int = 10000) extends TableSink {
  override def write(df: DataFrame, table: String): Unit = {
    props.setProperty("batchsize", batchSize.toString)
    df.write.mode("append").jdbc(url, table, props)
  }
}

/** Test fake: records what would have been shipped. */
final class RecordingSink extends TableSink {
  var written: Vector[(String, Long, Seq[String])] = Vector.empty
  override def write(df: DataFrame, table: String): Unit =
    written :+= ((table, df.count(), df.columns.toSeq))
}
