package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Steady-state measurement: pay JVM classloading + whole-stage-codegen
    // compiler warmup on a throwaway dataset (NOT the benchmark data), so the
    // first timed query measures the engine, not JIT startup.
    locally {
      import org.apache.spark.sql.functions._
      val tmp = "/tmp/graft_bench_warmup"
      spark.range(1000).select(col("id"), (col("id") % 7).as("k"),
          col("id").cast("double").as("v"))
        .write.mode("overwrite").parquet(tmp)
      val w = spark.read.parquet(tmp)
      w.filter(col("k") > 2).groupBy(col("k")).agg(sum(col("v"))).count()
      w.join(w.select(col("k").as("k2")).distinct(), col("k") === col("k2"))
        .count()
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
