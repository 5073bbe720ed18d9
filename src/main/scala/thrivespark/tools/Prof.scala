package thrivespark.tools

import org.apache.spark.sql.SparkSession

/** Verifies the spark.sql.extensions deployment path end to end in a fresh
  * JVM: a session configured with GraftExtensions must expose the SQL
  * functions AND the similarity-join rewrite with no install()/Register
  * call. Usage: tools/run.sh thrivespark.tools.ExtCheck <sfDir> */
object ExtCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "thrivespark.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.sql(
      """SELECT vec_dot(array(cast(1.0 as float), cast(2.0 as float)),
        |               array(cast(3.0 as float), cast(4.0 as float)))""".stripMargin)
      .collect()(0).getDouble(0)
    assert(d == 11.0, s"vec_dot via extensions returned $d")
    spark.read.parquet(s"$sfDir/embeddings.parquet").createOrReplaceTempView("emb")
    val plan = spark.sql(
      """SELECT a.vec_id, b.vec_id FROM emb a JOIN emb b
        |ON vec_dot(a.embedding, b.embedding) > 0.45 AND a.vec_id < b.vec_id"""
        .stripMargin).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"rewrite did not fire via extensions:\n$plan")
    assert(plan.contains("__sim_bucket"), s"bucket key missing:\n$plan")
    println("[extcheck] OK: functions + optimizer rule active via spark.sql.extensions")
    spark.stop()
  }
}

/** Ad-hoc stage profiler: times each stage of a pipeline op at a given sf.
  * Usage: tools/run.sh thrivespark.tools.Prof <sfDir> <what>  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val what = if (args.length > 1) args(1) else "dedup"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
      r
    }

    what match {
      case "dedup" =>
        import thrivespark.ops.Dedup._
        val docs = time("shingleDocs.count")(shingleDocs(spark, sfDir).count())
        val docsDf = shingleDocs(spark, sfDir)
        time("signatures.count")(signatures(docsDf).count())
        val banded = bandBuckets(docsDf)
        time("bandBuckets.count")(banded.count())
        val cands = candidatePairs(banded)
        time("candidatePairs.count")(cands.count())
        time("nearDupPairs.count")(nearDupPairs(spark, sfDir, 0.6).count())
        time("nearDupPairs2.count")(nearDupPairs(spark, sfDir, 0.6).count())
        println(s"docs=$docs")
      case "dedup3" =>
        import thrivespark.ops.Dedup._
        val docs = shingleDocs(spark, sfDir)
        time("warmup docs.count A")(docs.count())
        time("warmup docs.count B")(docs.count())
        time("bandBuckets 1st")(bandBuckets(docs).count())
        time("bandBuckets 2nd")(bandBuckets(docs).count())
        time("bandBuckets 3rd")(bandBuckets(docs).count())
        val c = candidatePairs(bandBuckets(docs))
        time("cands 1st")(c.count())
        time("cands 2nd")(c.count())
      case "simhash" =>
        import org.apache.spark.sql.functions._
        import thrivespark.ops.Dedup
        val fps = Dedup.simhashDocs(spark, sfDir)
        val near = thrivespark.Registry.queries("dedup_near_minhash")(spark, sfDir)
        val fa = fps.select(col("doc_id").as("a_id"), col("fp").as("a_fp"))
        val fb = fps.select(col("doc_id").as("b_id"), col("fp").as("b_fp"))
        println("planted-pair hamming distances:")
        near.join(fa, "a_id").join(fb, "b_id")
          .select(col("a_id"), col("b_id"),
            bit_count(col("a_fp").bitwiseXOR(col("b_fp"))).as("h"))
          .groupBy(col("h")).count().orderBy(col("h")).show(30)
        println("random-pair hamming (sample):")
        fa.join(fb, col("a_id") === col("b_id") - 250)
          .select(bit_count(col("a_fp").bitwiseXOR(col("b_fp"))).as("h"))
          .groupBy(col("h")).count().orderBy(col("h")).show(50)
      case "compact" =>
        val dir = "/tmp/prof_compact_data"
        thrivespark.Tables.events(spark, sfDir).repartition(20)
          .write.mode("overwrite").parquet(dir)
        val r = thrivespark.ops.Compaction.compact(spark, dir, 64L * 1024 * 1024)
        println(s"[prof] compact: $r reread=${spark.read.parquet(dir).count()}")
      case "ngram" =>
        import thrivespark.ops.Dedup
        import org.apache.spark.sql.functions._
        val tau = 0.6
        val docs = Dedup.shingleDocs(spark, sfDir)
        time("shingles")(docs.count())
        val posts = docs.select(col("doc_id"), explode(col("shl")).as("h"))
        time("posts")(posts.count())
        val freqs = posts.groupBy(col("h")).agg(count(lit(1)).as("df"))
        time("freqs")(freqs.count())
        val pref = posts.join(freqs, "h")
          .groupBy(col("doc_id"))
          .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("ord"))
          .select(col("doc_id"), size(col("ord")).as("sz"), posexplode(expr(
            s"slice(ord, 1, cast(size(ord) - ceil($tau * size(ord)) + 1 as int))"))
            .as(Seq("pos0", "p")))
          .select(col("doc_id"), col("sz"), (col("pos0") + 1).as("pos"),
            col("p.h").as("h"))
        time("prefix postings")(pref.count())
        val bare = pref.as("x")
          .join(pref.as("y"), col("x.h") === col("y.h") &&
            col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id")).distinct()
        time("candidates (no filters)")(bare.count())
        val cands = pref.as("x")
          .join(pref.as("y"), col("x.h") === col("y.h") &&
            col("x.doc_id") < col("y.doc_id") &&
            least(col("x.sz"), col("y.sz")).cast("double") >=
              lit(tau) * greatest(col("x.sz"), col("y.sz")) &&
            (lit(1) + least(col("x.sz") - col("x.pos"),
              col("y.sz") - col("y.pos"))).cast("double") >=
              lit(tau / (1 + tau)) * (col("x.sz") + col("y.sz")))
          .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id")).distinct()
        time("candidates (filtered)")(cands.count())
        time("full query")(thrivespark.Registry.queries("dedup_ngram_jaccard")(spark, sfDir).count())
        time("full query warm")(thrivespark.Registry.queries("dedup_ngram_jaccard")(spark, sfDir).count())

      case "buckets" =>
        import thrivespark.ops.Dedup._
        import org.apache.spark.sql.functions._
        val banded = bandBuckets(shingleDocs(spark, sfDir))
        val sizes = banded.groupBy(col("band"), col("bkey")).count()
        sizes.groupBy(col("count").as("bucket_size")).count()
          .orderBy(col("bucket_size").desc).show(20, false)
      case "pipeline" =>
        import thrivespark.ops.Pipeline
        val surv = Pipeline.survivors(spark, sfDir)
        time("survivors (dedup+persist)")(surv.count())
        time("gatedSurvivors")(Pipeline.gatedSurvivors(spark, sfDir).count())
        time("full op COLD")(
          thrivespark.Registry.queries("pipeline_corpus_e2e")(spark, sfDir).count())
        time("full op warm")(
          thrivespark.Registry.queries("pipeline_corpus_e2e")(spark, sfDir).count())
      case "gateprof" =>
        import thrivespark.ops.{Pipeline, Text}
        import org.apache.spark.sql.functions._
        val surv = Pipeline.survivors(spark, sfDir)
        time("survivors persist")(surv.count())
        val base = surv.select(col("doc_id"), size(col("ts")).as("n_tokens"),
          (size(filter(col("ts"), t => t === "the" || t === "a")).cast("double")
            / size(col("ts")) > 0.05).as("lang_ok"),
          (size(col("ts")) >= 20).as("len_ok"))
        time("base flags")(base.count())
        val grams = transform(sequence(lit(1), size(col("ts")) - 1),
          i => concat_ws(" ", element_at(col("ts"), i), element_at(col("ts"), i + 1)))
        val rep = surv.filter(size(col("ts")) >= 2)
          .select(col("doc_id"), explode(grams).as("gram"))
          .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
          .agg(sum(col("c")).as("n_grams"), count(lit(1)).as("n_distinct"))
        time("rep (bigram explode)")(rep.count())
        time("lmScores")(Text.lmScores(surv).count())
        time("gate total")(Pipeline.gatedSurvivorsOf(surv).count())
        time("full op warm")(
          thrivespark.Registry.queries("pipeline_corpus_e2e")(spark, sfDir).count())
      case "benchlike" =>
        // mimic graft.Bench's conditions for dedup_ngram_jaccard: run the
        // registry-order predecessors first (shingle persist + similar
        // codegen shapes warm), then time the op's first execution
        Seq("dedup_exact", "dedup_near_minhash", "dedup_pipeline_survivors",
            "dedup_clusters", "dedup_simhash").foreach { k =>
          time(k)(thrivespark.Registry.queries(k)(spark, sfDir).count())
        }
        time("dedup_ngram_jaccard COLD")(
          thrivespark.Registry.queries("dedup_ngram_jaccard")(spark, sfDir).count())
        time("dedup_ngram_jaccard warm")(
          thrivespark.Registry.queries("dedup_ngram_jaccard")(spark, sfDir).count())
      case "bpeprof" =>
        import org.apache.spark.sql.functions._
        val docs = thrivespark.Tables.documents(spark, sfDir)
          .filter(col("doc_id") % 5 === 0)
        val corpus = thrivespark.ops.Text.bpeCorpus(docs).persist()
        time("corpus count")(corpus.count())
        val t = split(expr("substring(s, 2, length(s) - 2)"), "\u001f\u001f")
        def pairCount() = corpus.select(t.as("t"))
          .select(explode(transform(sequence(lit(1), size(col("t")) - 1),
            i => struct(element_at(col("t"), i).as("l"),
              element_at(col("t"), i + 1).as("r")))).as("p"))
          .groupBy(col("p.l"), col("p.r")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc).limit(1).head()
        time("paircount 1")(pairCount())
        time("paircount 2")(pairCount())
        time("paircount 3")(pairCount())
        val rewritten = corpus.withColumn("s",
          replace(col("s"), lit("a"), lit("a")))
          .localCheckpoint(false)
        time("rewrite+ckpt")(rewritten.count())
        time("train 2 iters")(thrivespark.ops.Text.bpeTrain(docs, 2)._1.size)
        time("train 8 iters")(thrivespark.ops.Text.bpeTrain(docs, 8)._1.size)

      case "plan-nobcast" =>
        // Capture a query's plan with broadcast demotion OFF: at bench SFs
        // every table fits under the broadcast thresholds, so AQE rewrites
        // shuffle-free SMJ shapes (join_bucketed) into BHJ and the captured
        // plan contradicts the at-scale caption. Disabling both thresholds
        // shows the shape a 100 TB fact table would get.
        val key = if (args.length > 2) args(2) else "join_bucketed"
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        val q2 = thrivespark.Registry.queries(key)(spark, sfDir)
        q2.count()
        println(q2.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      case q =>
        // bench-basis timing: noop-sink write (full-plan evaluation, the
        // graft.Bench action since r12) — count() would measure a pruned plan
        val fn = thrivespark.Registry.queries(q)
        def noop(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.mode("overwrite").format("noop").save()
        time(s"$q run1 (noop)")(noop(fn(spark, sfDir)))
        time(s"$q run2 (noop)")(noop(fn(spark, sfDir)))
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
