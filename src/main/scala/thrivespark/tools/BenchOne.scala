package thrivespark.tools

import org.apache.spark.sql.SparkSession

/** Same-session per-key A/B timer for optimization work (guide §1): times
  * the named registry keys N times each through the same noop sink the
  * official Bench uses, in ONE warmed session, printing every rep. Repeated
  * in-session reps separate steady-state cost from first-touch cost (shared
  * staging, codegen, page cache), which single-shot suite runs conflate.
  * Usage: tools/run.sh thrivespark.tools.BenchOne <sfDir> <reps> <key>...
  * NOT the official record — graft.Bench stays the only bench entrypoint. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val keys = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.scheduler.listenerbus.eventqueue.capacity", "50000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same engine warmup as graft.Bench so rep 1 ≈ the suite's conditions
    locally {
      import org.apache.spark.sql.functions._
      val tmp = "/tmp/graft_benchone_warmup"
      spark.range(1000).select(col("id"), (col("id") % 7).as("k"),
          col("id").cast("double").as("v"))
        .write.mode("overwrite").parquet(tmp)
      val w = spark.read.parquet(tmp)
      w.filter(col("k") > 2).groupBy(col("k")).agg(sum(col("v"))).count()
      thrivespark.functions.Register(spark)
    }
    keys.foreach { name =>
      val fn = thrivespark.Registry.queries.getOrElse(name,
        sys.error(s"unknown key: $name"))
      val times = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[benchone] $name rep$i ${sec}%7.3f s")
        sec
      }
      println(f"[benchone] $name min=${times.min}%7.3f first=${times.head}%7.3f")
    }
    spark.stop()
  }
}
