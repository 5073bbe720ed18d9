package thrivespark.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r21 optimization-round scratch profiler: decomposes anomalous keys into
  * stages to find where the time goes (guide §1). Ad-hoc, not a bench. */
object ProfR21 {
  /** r21 measured dead end, kept for the A/B kernels below (moved out of
    * Tables in r22 — ADVICE — so the production namespace doesn't export a
    * known-loss primitive): fanning heavy map work out above the
    * single-file single-row-group local fixtures (guide §2.5 "unsplittable
    * input" — the scan decodes in ONE task) with a round-robin exchange is
    * a net LOSS here: the exchange's own cost (map-side
    * sort-before-repartition of the payload, an extra AQE stage boundary,
    * 32 block fetches) matches or exceeds the serialized work it
    * parallelizes (interleaved A/B: windowOcc+df 0.59 s plain vs 0.87 s
    * fanned; events JSON parse 0.43 s plain vs 0.71 s fanned). At real
    * scale the input splits into many row groups and the question
    * disappears. Parallelism fixes that DID land ride existing exchanges
    * instead (explicit-n repartition pins against AQE over-coalescing —
    * hashedTopKFrom / ragRetrievalFrom). Note df.rdd.getNumPartitions
    * forces a separate physical planning pass and reads a pre-AQE
    * partition count — fine in a profiler, misleading in an op. */
  private def fanOut(df: DataFrame): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions >= n) df else df.repartition(n)
  }
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
      case "ab_hash" =>
        // hashedBuckets-shaped pipeline with and without the fanOut
        // exchange, interleaved so ambient noise hits both variants
        val docs = T.documents(spark, sfDir)
        def pipe(src: DataFrame) = {
          val tf = src.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
            .select(col("doc_id"),
              (conv(substring(md5(col("w")), 1, 6), 16, 10).cast("long") % 64).as("bucket"))
            .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("tf"))
          val nt = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("nt"))
          tf.join(nt, Seq("doc_id"))
            .select(col("doc_id"), col("bucket"), col("tf"),
              expr("(1000000 * tf) div nt").as("w_micro"))
            .orderBy(col("doc_id"), col("bucket"))
        }
        (1 to 4).foreach { i =>
          time(s"plain#$i")(noop(pipe(docs)))
          time(s"fanout#$i")(noop(pipe(fanOut(docs))))
        }
      // Dump .explain("formatted") of the named keys to <outDir>/<key>_<tag>.txt
      // (the plans/r21 deliverable). args: explain <outDir> <tag> <key>...
      case "explain" =>
        val outDir = args(2); val tag = args(3)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        args.drop(4).foreach { key =>
          val df = thrivespark.Registry.queries(key)(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"${key}_$tag.txt"),
            txt.getBytes("UTF-8"))
          println(s"[explain] wrote $outDir/${key}_$tag.txt")
        }
      // Dump EVERY key's formatted plan + a one-line shape summary
      // (exchange count, join strategies, scan/codegen markers) —
      // the round's examine-every-operator evidence. args: explain_all <outDir>
      case "explain_all" =>
        val outDir = args(2)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        val summary = new StringBuilder("key\texchanges\tjoins\tnotes\n")
        thrivespark.Registry.queries.foreach { case (key, fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(outDir, s"$key.txt"), txt.getBytes("UTF-8"))
            val tree = txt.linesIterator.takeWhile(_.nonEmpty).mkString("\n")
            val ex = "(?m)\\bExchange\\b".r.findAllIn(tree).size
            val joins = Seq("BroadcastHashJoin", "SortMergeJoin",
                "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct")
              .flatMap(j => { val n = ("\\b" + j + "\\b").r.findAllIn(tree).size
                if (n > 0) Some(s"$j×$n") else None }).mkString(",")
            val notes = Seq(
              if (tree.contains("REPARTITION_BY_NUM")) Some("pinned") else None,
              if (tree.contains("WindowGroupLimit")) Some("wgl") else None,
              if (txt.contains("PushedFilters: [")
                  && !txt.contains("PushedFilters: []")) Some("pushed") else None)
              .flatten.mkString(",")
            summary.append(s"$key\t$ex\t$joins\t$notes\n")
          } catch { case e: Throwable =>
            summary.append(s"$key\tERR\t${e.getClass.getSimpleName}\t\n") }
        }
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, "_shape_summary.tsv"),
          summary.toString.getBytes("UTF-8"))
        println(s"[explain] wrote ${outDir}/_shape_summary.tsv")
      // Like explain, but EXECUTES the query first so the dumped plan is
      // the final adaptive one (isFinalPlan=true, ReusedExchange / AQE
      // coalescing visible). args: explain_exec <outDir> <tag> <key>...
      case "explain_exec" =>
        val outDir = args(2); val tag = args(3)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        args.drop(4).foreach { key =>
          val df = thrivespark.Registry.queries(key)(spark, sfDir)
          df.collect(): Unit
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"${key}_$tag.txt"),
            txt.getBytes("UTF-8"))
          println(s"[explain] wrote $outDir/${key}_$tag.txt")
        }
      case "ab_xml" =>
        import org.apache.spark.sql.types._
        val o = T.orders(spark, sfDir)
        val schema = StructType(Seq(StructField("k", LongType), StructField("s", StringType)))
        def pipe(src: DataFrame) = {
          val xml = concat(lit("<r><k>"), col("o_orderkey"),
            lit("</k><s>"), col("o_orderstatus"), lit("</s></r>"))
          src.select(col("o_orderkey"), xml.as("x"))
            .select(col("o_orderkey"), col("x"), from_xml(col("x"), schema).as("p"))
            .select(col("o_orderkey"), col("p.k").as("k"), col("p.s").as("s"),
              (col("p.k") === col("o_orderkey")).cast("int").as("parity"))
            .orderBy(col("o_orderkey"))
        }
        (1 to 4).foreach { i =>
          time(s"plain#$i")(noop(pipe(o)))
          time(s"fanout#$i")(noop(pipe(fanOut(o))))
        }
      case "ab_asof" =>
        val n = spark.sessionState.conf.numShufflePartitions
        val e0 = T.events(spark, sfDir).select(col("event_id"), col("user_id"), col("ts"))
        val o0 = T.orders(spark, sfDir).select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        def pipe(e: DataFrame) =
          e.join(o0, col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"))
            .groupBy(col("event_id"))
            .agg(max_by(struct(col("o_orderkey"), col("o_orderdate")),
              struct(col("o_orderdate"), col("o_orderkey"))).as("m"))
            .select(col("event_id"), col("m.o_orderkey").as("o_orderkey"),
              col("m.o_orderdate").cast("date").as("order_date"))
            .orderBy(col("event_id"))
        (1 to 4).foreach { i =>
          time(s"plain#$i")(noop(pipe(e0)))
          time(s"pinned#$i")(noop(pipe(e0.repartition(n, col("user_id")))))
        }
      case "ab_approx" =>
        val ev = T.events(spark, sfDir)
        def plain = ev.agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        def split = ev.agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
          .crossJoin(ev.agg(countDistinct(col("user_id")).as("exact_users")))
        (1 to 4).foreach { i =>
          time(s"plain#$i")(noop(plain))
          time(s"split#$i")(noop(split))
        }
      case "ab_pin" =>
        // hashedTopKFrom's dot pipeline with the (un)pinned corpus exchange
        val docs = T.documents(spark, sfDir)
        val n = spark.sessionState.conf.numShufflePartitions
        def dense(g: org.apache.spark.sql.RelationalGroupedDataset) =
          thrivespark.ops.Text.hashedDense(g)
        def pipe(pin: Boolean) = {
          val hb = thrivespark.ops.Text.hashedBuckets(docs)
          val cvd = dense((if (pin) hb.repartition(n, col("doc_id")) else hb)
            .groupBy(col("doc_id")))
          val qvd = dense(thrivespark.ops.Text.hashedBuckets(
              docs.filter(col("doc_id") % 50 === 0)).groupBy(col("doc_id")))
            .select(col("doc_id").as("q_id"), col("vec").as("qvec"), col("nrm").as("q_nrm"))
          val w = org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
            .orderBy(col("sim_micro").desc, col("c_id"))
          cvd.join(broadcast(qvd), col("q_id") =!= col("doc_id"))
            .select(col("q_id"), col("doc_id").as("c_id"), col("q_nrm"), col("nrm").as("c_nrm"),
              call_function("vec_dot_long", col("qvec"), col("vec")).as("dot"))
            .filter(col("dot") > 0)
            .withColumn("sim_micro", thrivespark.ops.Text.simMicroExpr)
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") <= 5)
        }
        (1 to 4).foreach { i =>
          time(s"plain#$i")(noop(pipe(false)))
          time(s"pinned#$i")(noop(pipe(true)))
        }
      case "ab_win" =>
        val docs = T.documents(spark, sfDir)
        val n = spark.sessionState.conf.numShufflePartitions
        def pipe(src: DataFrame) =
          thrivespark.ops.Text.windowOcc(src, 8).repartition(n, col("h"))
            .groupBy(col("h")).agg(countDistinct(col("doc_id")).as("df"))
        (1 to 4).foreach { i =>
          time(s"plain#$i")(noop(pipe(docs)))
          time(s"fanout#$i")(noop(pipe(fanOut(docs))))
        }
      case "ab_rag" =>
        val docs = T.documents(spark, sfDir)
        (1 to 4).foreach { i =>
          time(s"rag#$i")(noop(thrivespark.ops.Text.ragRetrievalFrom(docs)))
        }
      case "ab_json" =>
        val ev = T.events(spark, sfDir)
        def pipe(src: DataFrame) =
          src.withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
            .groupBy(col("k")).agg(count(lit(1)))
        (1 to 4).foreach { i =>
          time(s"plain#$i")(noop(pipe(ev)))
          time(s"fanout#$i")(noop(pipe(fanOut(ev))))
        }
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
      // Per-job timeline of one key: job durations, task counts and the
      // inter-job gaps (driver-side codegen/AQE/planning time shows up as
      // gap, not job time).
      case "jobs" =>
        val key = args(2)
        val reps = if (args.length > 3) args(3).toInt else 3
        case class J(id: Int, t0: Long, var t1: Long = 0L, var tasks: Int = 0)
        val js = scala.collection.mutable.ArrayBuffer.empty[J]
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            js.synchronized { js += J(e.jobId, System.nanoTime()) }
          override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
            js.synchronized { js.find(_.id == e.jobId).foreach(_.t1 = System.nanoTime()) }
          override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            js.synchronized { js.lastOption.foreach(_.tasks += 1) }
        })
        (1 to reps).foreach { i =>
          js.synchronized(js.clear())
          val t0 = System.nanoTime()
          noop(thrivespark.Registry.queries(key)(spark, sfDir))
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(150)
          js.synchronized {
            var prevEnd = t0
            js.foreach { j =>
              val gap = (j.t0 - prevEnd) / 1e9
              val dur = (j.t1 - j.t0) / 1e9
              println(f"[jobs] rep$i job${j.id}%4d gap=${gap}%7.3f dur=${dur}%7.3f tasks=${j.tasks}%4d")
              prevEnd = j.t1
            }
            println(f"[jobs] rep$i tail_gap=${(System.nanoTime() - prevEnd - 150e6.toLong) / 1e9}%7.3f wall=${wall}%7.3f")
          }
        }
      case k =>
        rep("full op", 3)(noop(thrivespark.Registry.queries(k)(spark, sfDir)))
    }
    spark.stop()
  }
}
