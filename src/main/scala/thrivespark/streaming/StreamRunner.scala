package thrivespark.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming execution paths (SURVEY.md §2.10 #58/#59): the ops
  * whose semantics only exist under streaming — watermark late-drop and
  * stateful dedup. Exercised by StreamingSpec via deterministic file replay
  * (one micro-batch per input file, maxFilesPerTrigger=1).
  *
  * At scale these are the standard Structured Streaming patterns: watermark
  * bounds state, dropDuplicatesWithinWatermark bounds the dedup map, and the
  * shuffle is keyed by the aggregation key exactly as in batch. */
object StreamRunner {

  /** Streaming state is partitioned by `spark.sql.shuffle.partitions` at the
    * stream's FIRST start and pinned in the checkpoint thereafter. Size it to
    * the stream's key cardinality, not the batch-side default: every extra
    * partition is an extra state-store instance committed per micro-batch
    * (32 → 32 HDFS-state commits per batch here, dominated by fs overhead).
    * On a real cluster with millions of keys you would raise it; these demo
    * streams carry a handful of keys. */
  private def withStatePartitions[A](spark: SparkSession, n: Int)(f: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try f finally spark.conf.set(key, prev)
  }

  /** #58: 1-hour tumbling counts with a 10-minute watermark; rows later than
    * the watermark are dropped from the aggregate. Returns the materialized
    * result after processing all available files in `srcDir`. */
  def tumblingWithWatermark(spark: SparkSession, srcDir: String,
      checkpoint: String, queryName: String): DataFrame =
      withStatePartitions(spark, 4) {
    val schema = spark.read.parquet(srcDir).schema
    val in = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
    val agg = in
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("ws"), col("event_type"), col("n"))
    val q = agg.writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** #59: stateful streaming dedup on event_id across micro-batches. */
  def dedupWithinWatermark(spark: SparkSession, srcDir: String,
      checkpoint: String, queryName: String): DataFrame =
      withStatePartitions(spark, 4) {
    val schema = spark.read.parquet(srcDir).schema
    val in = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
    val deduped = in
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("user_id"), col("event_type"))
    val q = deduped.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
