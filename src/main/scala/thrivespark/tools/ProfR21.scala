package thrivespark.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r21 optimization-round scratch profiler: decomposes anomalous keys into
  * stages to find where the time goes (guide §1). Ad-hoc, not a bench. */
object ProfR21 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val what = if (args.length > 1) args(1) else "fn_math"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    thrivespark.functions.Register(spark)

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def rep(name: String, n: Int = 3)(f: => Unit): Unit =
      (1 to n).foreach(i => time(s"$name#$i")(f))

    val T = thrivespark.Tables
    what match {
      case "fn_math" =>
        val li = T.lineitem(spark, sfDir)
        rep("read only")(noop(li))
        val proj = li.select(
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice").cast("decimal(18,2)"), 1).cast("double").as("price_r1"),
          abs(col("l_discount").cast("decimal(10,2)") - lit(0.05).cast("decimal(10,2)")).cast("double").as("disc_dev"),
          ceil(col("l_extendedprice")).as("price_ceil"),
          floor(col("l_extendedprice")).as("price_floor"),
          pmod(col("l_orderkey"), lit(7)).as("key_mod7"),
          round(log(col("l_quantity")), 6).as("ln_qty"),
          round(sqrt(col("l_quantity")), 6).as("sqrt_qty"),
          pow(col("l_quantity"), 2).cast("long").as("qty_sq"))
        rep("proj only")(noop(proj))
        rep("proj+sort2")(noop(proj.orderBy(col("l_orderkey"), col("l_linenumber"))))
        rep("proj+sort9")(noop(proj.orderBy(col("l_orderkey"), col("l_linenumber"),
          col("price_r1"), col("disc_dev"), col("price_ceil"), col("price_floor"),
          col("ln_qty"), col("sqrt_qty"), col("qty_sq"))))
        rep("full op")(noop(thrivespark.Registry.queries("fn_math")(spark, sfDir)))
      case "agg_approx" =>
        val ev = T.events(spark, sfDir)
        rep("read only")(noop(ev))
        rep("count")(println(ev.count()))
        rep("approx only")(noop(ev.agg(approx_count_distinct(col("user_id"), 0.01))))
        rep("approx 0.05")(noop(ev.agg(approx_count_distinct(col("user_id"), 0.05))))
        rep("exact only")(noop(ev.agg(countDistinct(col("user_id")))))
        rep("both")(noop(ev.agg(approx_count_distinct(col("user_id"), 0.01).as("a"),
          countDistinct(col("user_id")).as("e"))))
      case "basket" =>
        rep("full op", 3)(noop(thrivespark.Registry.queries("analytics_market_basket")(spark, sfDir)))
      // Suite-wide phase survey: for every registry key, wall time plus the
      // Catalyst phase times (parsing/analysis/optimization/planning) of
      // every execution in the query, and the job/stage/task counts — the
      // empirical decomposition of where the 224-key suite's seconds go.
      case "survey" =>
        import scala.collection.mutable
        val phaseAgg = mutable.Map.empty[String, Long] // phase -> ms (current key)
        var executions = 0
        val ql = new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
            executions += 1
            qe.tracker.phases.foreach { case (ph, summ) =>
              phaseAgg(ph) = phaseAgg.getOrElse(ph, 0L) + (summ.endTimeMs - summ.startTimeMs)
            }
          }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution, ex: Exception): Unit = ()
        }
        spark.listenerManager.register(ql)
        var jobs = 0; var tasks = 0
        val sl = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            jobs += 1
          override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            tasks += 1
        }
        spark.sparkContext.addSparkListener(sl)
        val cg = org.apache.spark.metrics.source.CodegenMetrics
        def cgTime: Long = {
          val h = cg.METRIC_COMPILATION_TIME
          (h.getCount * h.getSnapshot.getMean).toLong
        }
        def cgCount: Long = cg.METRIC_COMPILATION_TIME.getCount
        println("key\twall_s\tplan_ms\texecs\tjobs\ttasks\tcg_n\tcg_ms")
        thrivespark.Registry.queries.foreach { case (name, fn) =>
          phaseAgg.clear(); executions = 0; jobs = 0; tasks = 0
          val (c0, t0ms) = (cgCount, cgTime)
          val t0 = System.nanoTime()
          try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          catch { case e: Throwable => println(s"$name FAILED ${e.getMessage}") }
          val wall = (System.nanoTime() - t0) / 1e9
          // listener bus is async — give it a beat before reading counters
          Thread.sleep(120)
          val plan = phaseAgg.values.sum
          println(f"$name\t$wall%.3f\t$plan\t$executions\t$jobs\t$tasks\t${cgCount - c0}\t${cgTime - t0ms}")
        }
      case k =>
        rep("full op", 3)(noop(thrivespark.Registry.queries(k)(spark, sfDir)))
    }
    spark.stop()
  }
}
