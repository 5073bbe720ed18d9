package thrivespark.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import thrivespark.{Op, Tables => T}
import thrivespark.Det._

/** SURVEY.md §2.9 similarity search (#52–#54).
  *
  * Embeddings are L2-normalized (FIXTURES.md) so cosine ≡ dot product. The
  * dot is a sequential left fold over zip_with in DOUBLE — the identical
  * computation the oracle runs (list_sum of an in-order element product), so
  * both engines produce the same IEEE value.
  *
  * Scale path: sim_topk_cosine broadcasts the (small) query set against the
  * corpus — a map-side-only plan that scales linearly in corpus size;
  * sim_threshold_pairs blocks on the label column so the pair space is
  * O(Σ label²) not O(n²); sim_ann_ivf is the sub-linear scale path.
  */
object Similarity {
  /** dot(a, b) in double, sequential left fold — deterministic across
    * engines. Custom codegen'd expression (thrivespark.functions.VecDot);
    * bit-identical to aggregate(zip_with(...)) but stays in whole-stage
    * codegen instead of interpreted lambdas. */
  /** Exact float dot in the codegen kernel. Args are declared element-dense
    * (known_dense — the fixture/production embedding contract: no null
    * slots) because parquet list columns always surface containsNull=true
    * and the null-aware loop measured ~40% slower on the verify joins
    * (r19; see functions.KnownDense).
    *
    * PRECONDITION (r20, inherited by every frame-level API that routes a
    * caller frame through here — Dedup.embeddingLshSurvivors, the
    * dedup_embedding_cosine op, StreamRunner's centroid probe): no null
    * ELEMENTS inside the arrays. known_dense declares that fact to
    * codegen; an element that is actually null is read as 0 (declared UB),
    * NOT propagated to a null dot. A wholly-null array column is fine
    * (null in → null out). For frames that cannot promise density, use
    * [[dotNullable]]. */
  def dot(a: Column, b: Column): Column = call_function("vec_dot",
    call_function("known_dense", a), call_function("known_dense", b))

  /** Null-HONORING variant for untrusted frames: any null element yields a
    * null dot (the aggregate(zip_with(...)) equivalence the kernel
    * documents), at the cost of the per-element null-bit test (~40% on a
    * 64-dim verify join). Same kernel, density not declared. */
  def dotNullable(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** Session-scoped cache of the persisted trimodal manifest (decode-once
    * stage boundary of pipeline_multimodal_e2e). Memoized by (session,
    * sfDir) so repeated op invocations reuse ONE persisted frame — the
    * CacheManager would dedupe identical plans anyway, but this makes the
    * reuse explicit and gives the storage an owner with a release hook
    * (same shape as Text.bpeRelease) instead of blocks that live until
    * session teardown with nothing accountable for them. */
  private val manifestCache = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String),
      org.apache.spark.sql.DataFrame]
  private def trimodalManifestCached(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame =
    manifestCache.getOrElseUpdate((s, d), {
      val mm = thrivespark.multimodal.Multimodal
      mm.extractTrimodalManifest(mm.mediaTrimodalFromDocuments(T.documents(s, d)),
          everyNth = 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })
  /** Unpersist every cached manifest and drop the registry entries. */
  def releaseManifestCache(): Unit = {
    manifestCache.values.foreach(df => df.unpersist(): Unit)
    manifestCache.clear()
  }

  private val duckDot =
    "list_sum(list_transform(generate_series(1, 64), " +
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"

  /** IVF-style ANN: coarse-quantize the corpus into cells (centroids = a
    * deterministic sample), probe only the query's nprobe nearest cells.
    * The scale path for similarity search: the corpus is shuffled once by
    * cell, and each query touches nprobe/k of the data instead of all of it.
    * Approximate ⇒ no SQL oracle (rule R5); SimilaritySpec measures recall
    * against the brute-force sim_topk_cosine. */
  def annTopK(s: org.apache.spark.sql.SparkSession, d: String,
      k: Int = 5, nprobe: Int = 2): org.apache.spark.sql.DataFrame =
    annTopKFrom(T.embeddings(s, d), k, nprobe)

  /** IVF coarse assignment of `emb` against an explicit centroid frame
    * (cent_id, cent_emb): one (c_id, cell, c_emb) row per vector, cell =
    * nearest centroid (max sim, tie → lowest cent_id). max_by keeps the
    * shuffle at one row per vector; broadcast keeps assignment map-side —
    * the shape that lets a DELTA batch be ingested against a persisted
    * index without touching the standing assignments. */
  def ivfAssignTo(emb: org.apache.spark.sql.DataFrame,
      cent: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    thrivespark.functions.Register(emb.sparkSession)
    // the embedding rides THROUGH the argmax (every row of a vec_id group
    // carries the identical vector), so recovering it needs no second
    // corpus scan + re-join — the aggregation's output IS the assignment
    emb.join(broadcast(cent))
      .withColumn("sim", dot(col("embedding"), col("cent_emb")))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cent_id").as("cell"), col("embedding").as("c_emb")),
        struct(col("sim"), -col("cent_id"))).as("m"))
      .select(col("vec_id").as("c_id"), col("m.cell").as("cell"),
        col("m.c_emb").as("c_emb"))
  }

  /** Coarse-codebook size cap. The seed rule below yields AT MOST IvfK
    * centroids no matter how large the corpus grows — the same discipline
    * sim_ann_pq applies to its K=64 product codebook ("the codebook must
    * stay a constant-size broadcast at 100 TB"). Without the cap the old
    * `vec_id % 100 == 0` rule grew K linearly with the corpus, which at
    * 100 TB is a scale-killer three ways: the centroid broadcast grows as
    * n/100, per-vector assignment is O(K)=O(n/100) (quadratic total), and
    * the k-means seed collect is O(n) on the driver. With the cap all
    * three are constants. At the shipped SFs (max vec_id 1999) the cap
    * never bites, so every ANN oracle is unchanged by construction;
    * ScaleStressSpec synthesizes a corpus past the cap and pins K flat. */
  val IvfK = 64
  val IvfSeedCap: Long = IvfK * 100L
  /** SQL mirror of the coarse seed rule — interpolated into every ANN
    * oracle so the two engines share ONE rule and cannot drift. */
  val IvfSeedSql: String = s"vec_id % 100 = 0 AND vec_id < $IvfSeedCap"

  /** Default deterministic centroid rule: vec_id % 100 == 0, capped at
    * IvfK seeds (vec_id < IvfSeedCap). */
  def ivfCentroids(emb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < IvfSeedCap)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))

  /** IVF coarse assignment over any (vec_id, embedding) frame with the
    * default centroid rule. Exposed so ScaleStressSpec can measure
    * cell-occupancy balance on a synthesized corpus. */
  def ivfAssign(emb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    ivfAssignTo(emb, ivfCentroids(emb))

  /** The IVF probe: each query ranks the centroids, scans its nprobe
    * nearest cells from `assigned`, and keeps the exact top-k by cosine.
    * Shared by the one-shot (sim_ann_ivf) and incremental
    * (sim_ann_incremental) paths — identical query semantics over however
    * the assignment table was produced. */
  def probeTopK(q: org.apache.spark.sql.DataFrame,
      cent: org.apache.spark.sql.DataFrame,
      assigned: org.apache.spark.sql.DataFrame,
      k: Int, nprobe: Int,
      excludeSelf: Boolean = true): org.apache.spark.sql.DataFrame = {
    val wCell = Window.partitionBy(col("q_id")).orderBy(col("csim").desc, col("cent_id"))
    val probes = q.join(broadcast(cent))
      .withColumn("csim", dot(col("q_emb"), col("cent_emb")))
      .withColumn("crn", row_number().over(wCell))
      .filter(col("crn") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("cent_id").as("cell"))
    val wTop = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    probes.join(assigned, "cell")
      // self-exclusion only when query and corpus share an id space (the
      // embedding-to-embedding ops); cross-modal retrieval keeps every hit
      .filter(if (excludeSelf) col("q_id") =!= col("c_id") else lit(true))
      .withColumn("cos", dot(col("q_emb"), col("c_emb")))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("c_id"), round6(col("cos")).as("cos"), col("rn"))
      .orderBy(col("q_id"), col("rn"))
  }

  def annTopKFrom(emb: org.apache.spark.sql.DataFrame,
      k: Int = 5, nprobe: Int = 2): org.apache.spark.sql.DataFrame = {
    thrivespark.functions.Register(emb.sparkSession)
    val cent = ivfCentroids(emb)
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    probeTopK(q, cent, ivfAssign(emb), k, nprobe)
  }

  /** Incremental ANN (r12 — the verdict's "persistable index" item, the
    * dedup_incremental pattern applied to IVF): the BASE corpus's centroids
    * and cell assignments are persisted as parquet tables (the standing
    * index); a DELTA batch is then assigned to the EXISTING cells with one
    * broadcast map-side pass over the delta only — no re-clustering, no
    * recomputation of base assignments, which are read back from the index
    * — and queries probe the union. At 100 TB the index is the big table
    * and the per-batch cost is O(delta), exactly like the fingerprint
    * index in dedup_incremental. Every step keeps the IVF ladder's total
    * orders (deterministic centroids from the base, max-sim tie → lowest
    * cent_id, ranked probes), so the op still gets an exact SQL oracle:
    * incremental ingest must produce byte-identical results to assigning
    * everything against the same centroids in one shot. */
  def annIncremental(s: org.apache.spark.sql.SparkSession, d: String,
      k: Int = 5, nprobe: Int = 2): org.apache.spark.sql.DataFrame = {
    thrivespark.functions.Register(s)
    val emb = T.embeddings(s, d)
    val isDelta = col("vec_id") % 7 === 3
    val base = emb.filter(!isDelta)
    val delta = emb.filter(isDelta)
    // build phase (runs once per index lifetime): centroids from the BASE
    // only + base assignments, persisted as the standing index tables
    val idx = s"/tmp/graft_annidx_${new java.io.File(d).getName}"
    val baseCent = ivfCentroids(base)       // one frame for both build steps
    baseCent.write.mode("overwrite").parquet(s"$idx/centroids")
    ivfAssignTo(base, baseCent)
      .write.mode("overwrite").parquet(s"$idx/assignments")
    // incremental ingest: only the delta is assigned (broadcast centroids,
    // map-side); the persisted base assignments are reused as-is
    val pCent = s.read.parquet(s"$idx/centroids")
    val pAssigned = s.read.parquet(s"$idx/assignments")
    val assigned = pAssigned.unionByName(ivfAssignTo(delta, pCent))
    // query the fresh batch against the updated index
    val q = delta.filter(col("vec_id") % 3 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    probeTopK(q, pCent, assigned, k, nprobe)
  }

  // ------------------------------------------------ k-means training ---

  /** round(x · 1e6) per dimension as BIGINT — the "micro-space" embedding.
    * Micros are ≤ 1e6 in magnitude (embeddings are L2-normalized), so they
    * are EXACT in float32 (< 2^24) and every product of two micro values is
    * exact in double (≤ 1e12 < 2^53, and 64-term sums stay < 2^53). The
    * whole Lloyd loop below therefore runs in integer arithmetic that both
    * engines reproduce bit-for-bit: no IEEE mean, no summation-order drift
    * (the cross-engine avg(double) trap). */
  private def microArr(e: Column): Column =
    transform(e, x => round(x.cast("double") * 1000000d, 0).cast("long"))

  /** Lloyd's k-means over the embedding corpus, in micro-space (r15 — the
    * r14 verdict's #1: every IVF consumer quantized against SEEDED
    * centroids; this is the training loop that replaces them).
    *
    * Per iteration — the Spark MLlib KMeans shape, which is the only sane
    * 100 TB plan: centroids are a CONSTANT-SIZE driver array broadcast into
    * a map-side argmax (no per-vector shuffle), and the update is ONE
    * map-side-combinable (cell, dim) aggregation whose output is K×64 rows
    * regardless of corpus size — the collect is codebook-sized, never
    * data-sized. Determinism: assignment = max micro-dot, tie → lowest
    * cent_id (the ladder's total order); new centroid = per-dim
    * Σmicros / n in Long division (truncation toward zero — exactly
    * DuckDB's integer `//`, verified: -7 // 2 = -3); empty cells keep their
    * previous centroid. Differential testing is per-iteration, the
    * text_bpe_train method: the oracle CTE chain is GENERATED by the same
    * loop bound (kmeansOracleStages) so the two engines cannot drift.
    *
    * Returns the trained codebook and one stats row per (iteration,
    * centroid): members n, Σ dims csum, and L1 shift vs the previous
    * centroid — the trajectory fingerprint the oracle recomputes. */
  private val KmeansIters = 3
  def kmeansTrain(s: org.apache.spark.sql.SparkSession, d: String,
      iters: Int = KmeansIters)
      : (Seq[(Long, Array[Long])], Seq[(Int, Long, Long, Long, Long)]) =
    kmeansTrainFrom(T.embeddings(s, d), iters)

  /** kmeansTrain over any (vec_id, embedding) frame — the testable surface
    * (hand-computed planted corpora in DedupSimilaritySpec). */
  def kmeansTrainFrom(emb: org.apache.spark.sql.DataFrame, iters: Int = KmeansIters)
      : (Seq[(Long, Array[Long])], Seq[(Int, Long, Long, Long, Long)]) = {
    thrivespark.functions.Register(emb.sparkSession)
    // the micro column is DERIVED here (embeddings has only vec_id/
    // embedding/label) — m for the exact integer update, mf for the
    // map-side float dot (micros ≤ 1e6 are exact in float32)
    val memb = emb
      .select(col("vec_id"), microArr(col("embedding")).as("m"))
      .withColumn("mf", transform(col("m"), x => x.cast("float")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    // codebook-sized collect: the IvfSeedCap bounds this at IvfK rows
    // regardless of corpus size (never an O(n) driver pull)
    var cents: Seq[(Long, Array[Long])] = memb
      .filter(col("vec_id") % 100 === 0 && col("vec_id") < IvfSeedCap)
      .select(col("vec_id"), col("m")).orderBy(col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toSeq
    val stats = Seq.newBuilder[(Int, Long, Long, Long, Long)]
    for (it <- 1 to iters) {
      // constant-size codebook as a literal: micro floats are exact, so the
      // map-side vec_dot reproduces the integer micro-dot in double
      val centLit = typedlit(cents.map { case (id, cm) =>
        (id, cm.map(_.toFloat).toSeq) })
      // aliases inside a lambda-built struct are not preserved (fields
      // arrive as col1/col2): col1 = sim, col2 = -cent_id, so max = best
      // sim, tie → lowest cent_id
      val best = array_max(transform(centLit, c =>
        struct(dot(col("mf"), c.getField("_2")), -c.getField("_1"))))
      // ONE shuffle, K×64 rows out of the partial aggregation per partition
      // ONE codegen hash-agg pass: 64 positional sums as columns (no
      // posexplode — the exploded formulation pushed 64× the rows through
      // the aggregate for identical integer sums; r18, ~0.4 s/iteration
      // saved). Output is K rows × 66 cols — still codebook-sized.
      val dim = cents.head._2.length
      val sums = memb
        .select((-best.getField("col2")).as("cell"), col("m"))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n"),
          (0 until dim).map(i => sum(element_at(col("m"), i + 1)).as(s"s$i")): _*)
        .collect()
      val byCell = sums.map(r => r.getLong(0) -> r).toMap
      cents = cents.map { case (id, old) =>
        byCell.get(id) match {
          case Some(row) =>
            val n = row.getLong(1)
            val arr = Array.tabulate(old.length)(i => row.getLong(2 + i) / n)
            val shift = arr.indices.map(i => math.abs(arr(i) - old(i))).sum
            stats += ((it, id, n, arr.sum, shift))
            (id, arr)
          case None =>             // empty cell: centroid unchanged
            stats += ((it, id, 0L, old.sum, 0L))
            (id, old)
        }
      }
    }
    (cents, stats.result())
    } finally memb.unpersist(): Unit   // release even when an iteration throws
  }

  /** Session-scoped memo of the trained codebook + per-iteration stats —
    * training runs ONCE per (session, corpus) and every consumer
    * (sim_ann_kmeans_train, the trained-centroid recall ops) reads the same
    * result, exactly like bpeMergesFor. */
  private val kmeansCache = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String),
      (Seq[(Long, Array[Long])], Seq[(Int, Long, Long, Long, Long)])]
  private def kmeansTrained(s: org.apache.spark.sql.SparkSession, d: String)
      : (Seq[(Long, Array[Long])], Seq[(Int, Long, Long, Long, Long)]) = {
    // prune codebooks of stopped sessions on access (the Tables.cache
    // discipline) so long-lived multi-session JVMs don't retain dead ones
    kmeansCache.filterInPlace { case ((ss, _), _) => !ss.sparkContext.isStopped }
    kmeansCache.getOrElseUpdate((s, d), kmeansTrain(s, d))
  }
  /** Drop memoized codebooks (tests + long-lived multi-corpus JVMs). */
  def releaseKmeansCache(): Unit = kmeansCache.clear()

  /** Trained codebook as a broadcastable centroid frame. cent_emb is the
    * MICRO vector as float (exact): centroid RANKING under a micro-space
    * dot equals ranking under the real-valued centroid (uniform 1e6 scale
    * cancels), so probes stay consistent across engines with zero float
    * rounding anywhere. */
  def trainedCentroids(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    kmeansTrained(s, d)._1
      .map { case (id, cm) => (id, cm.map(_.toFloat).toSeq) }
      .toDF("cent_id", "cent_emb")
  }

  /** Micro-space IVF assignment: cell = argmax over Σ m_v[i]·m_c[i] (exact
    * integers both engines), carrying the RAW embedding through as c_emb so
    * candidate scoring stays in real cosine space. The trained-centroid
    * counterpart of ivfAssignTo. */
  def ivfAssignMicro(emb: org.apache.spark.sql.DataFrame,
      cent: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    thrivespark.functions.Register(emb.sparkSession)
    emb.select(col("vec_id"), col("embedding"),
        transform(microArr(col("embedding")), x => x.cast("float")).as("mf"))
      .join(broadcast(cent))
      .withColumn("sim", dot(col("mf"), col("cent_emb")))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cent_id").as("cell"), col("embedding").as("c_emb")),
        struct(col("sim"), -col("cent_id"))).as("m"))
      .select(col("vec_id").as("c_id"), col("m.cell").as("cell"),
        col("m.c_emb").as("c_emb"))
  }

  /** nprobe values the recall curve sweeps — shared by the Spark program
    * and the generated oracle so the two cannot drift. */
  private val CurveNprobes = Seq(1, 2, 3, 5)

  /** recall@5 vs brute force for each nprobe in CurveNprobes, one pass:
    * rank all 5 candidate cells once (crn), checkpoint the ranked candidate
    * set + the exact top-5, then each curve point filters crn <= nprobe. */
  def recallCurve(emb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    thrivespark.functions.Register(emb.sparkSession)
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = emb.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    val exact = broadcast(q).join(c, col("q_id") =!= col("c_id"))
      .withColumn("cos", dot(col("q_emb"), col("c_emb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("q_id"), col("c_id"))
      .localCheckpoint()                       // consumed once per curve point
    val cent = ivfCentroids(emb)
    val maxNp = CurveNprobes.max
    val wCell = Window.partitionBy(col("q_id")).orderBy(col("csim").desc, col("cent_id"))
    val probes = q.join(broadcast(cent))
      .withColumn("csim", dot(col("q_emb"), col("cent_emb")))
      .withColumn("crn", row_number().over(wCell))
      .filter(col("crn") <= maxNp)
      .select(col("q_id"), col("q_emb"), col("crn"), col("cent_id").as("cell"))
    val cand = probes.join(ivfAssign(emb), "cell")
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", dot(col("q_emb"), col("c_emb")))
      .select(col("q_id"), col("c_id"), col("crn"), col("cos"))
      .localCheckpoint()                       // ranked ONCE, filtered 4×
    val wTop = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    CurveNprobes.map { np =>
      val approx = cand.filter(col("crn") <= np)
        .withColumn("rn", row_number().over(wTop))
        .filter(col("rn") <= 5)
        .select(col("q_id"), col("c_id"))
      exact.join(approx.withColumn("hit", lit(1)), Seq("q_id", "c_id"), "left")
        .agg(count(lit(1)).as("k_total"),
          sum(coalesce(col("hit"), lit(0))).as("n_hit"))
        .select(lit(np).as("nprobe"), col("k_total"), col("n_hit"))
    }.reduce(_ unionByName _)
      .select(col("nprobe"), col("k_total"), col("n_hit").cast("long").as("n_hit"),
        (col("n_hit").cast("long") * lit(1000000L)
          / col("k_total")).cast("long").as("recall_micros"))
      .orderBy(col("nprobe"))
  }

  /** Generated mirror of recallCurve: shared exact/cent/assigned/cand CTEs,
    * then one (ap, r) CTE pair per CurveNprobes entry — same loop bound as
    * the Spark side (the kmeansOracleStages discipline). */
  private def recallCurveSql: String = {
    val ddot = (a: String, b: String) =>
      s"list_sum(list_transform(generate_series(1, 64), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
    val base = s"""WITH exact AS (
        SELECT q_id, c_id FROM (
          SELECT a.vec_id AS q_id, b.vec_id AS c_id,
                 row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY ${ddot("a.embedding", "b.embedding")} DESC,
                   b.vec_id) AS rn
          FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
          WHERE a.vec_id % 50 = 0)
        WHERE rn <= 5),
      cent AS (
        SELECT vec_id AS cent_id, embedding AS cent_emb
        FROM embeddings WHERE $IvfSeedSql),
      a1 AS (
        SELECT e.vec_id AS c_id, e.embedding AS c_emb, c.cent_id,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY ${ddot("e.embedding", "c.cent_emb")} DESC,
                 c.cent_id) AS arn
        FROM embeddings e CROSS JOIN cent c),
      assigned AS (SELECT c_id, c_emb, cent_id AS cell FROM a1 WHERE arn = 1),
      q AS (
        SELECT vec_id AS q_id, embedding AS q_emb
        FROM embeddings WHERE vec_id % 50 = 0),
      p1 AS (
        SELECT q.q_id, q.q_emb, c.cent_id AS cell,
               row_number() OVER (PARTITION BY q.q_id
                 ORDER BY ${ddot("q.q_emb", "c.cent_emb")} DESC,
                 c.cent_id) AS crn
        FROM q CROSS JOIN cent c),
      cand AS (
        SELECT p.q_id, a.c_id, p.crn, ${ddot("p.q_emb", "a.c_emb")} AS cos
        FROM (SELECT * FROM p1 WHERE crn <= ${CurveNprobes.max}) p
        JOIN assigned a ON p.cell = a.cell
        WHERE p.q_id <> a.c_id)"""
    val perNp = CurveNprobes.map { np =>
      s""",
      ap$np AS (
        SELECT q_id, c_id FROM (
          SELECT q_id, c_id,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY cos DESC, c_id) AS rn
          FROM cand WHERE crn <= $np)
        WHERE rn <= 5),
      r$np AS (
        SELECT $np AS nprobe, count(*) AS k_total, count(x.c_id) AS n_hit
        FROM exact e LEFT JOIN ap$np x
          ON e.q_id = x.q_id AND e.c_id = x.c_id)"""
    }.mkString
    val union = CurveNprobes.map(np => s"SELECT * FROM r$np").mkString(" UNION ALL ")
    s"""$base$perNp
      SELECT CAST(nprobe AS INTEGER) AS nprobe, CAST(k_total AS BIGINT) AS k_total,
             CAST(n_hit AS BIGINT) AS n_hit,
             CAST(n_hit * 1000000 // k_total AS BIGINT) AS recall_micros
      FROM ($union) ORDER BY nprobe"""
  }

  /** The decoded 8×8 grayscale thumbnail of every 25th document as a 64-dim
    * float query vector (row-major cell means, parsed from the decoder's
    * 64-byte thumb column via hex-pair → conv) — the cross-modal query set
    * shared by the retrieval/recall ops. Integer cell values are exact in
    * float32, so downstream dots stay engine-reproducible. */
  private def thumbQueries(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val mm = thrivespark.multimodal.Multimodal
    val media = mm.mediaPpmFromDocuments(
      T.documents(s, d).filter(col("doc_id") % 25 === 0))
    val hexThumb = hex(col("thumb"))
    mm.extractPpmFeatures(media)
      .select(col("media_id").as("q_id"),
        transform(sequence(lit(0), lit(63)),
          i => conv(hexThumb.substr(i * lit(2) + lit(1), lit(2)), 16, 10)
            .cast("float")).as("q_emb"))
  }

  /** The DuckDB mirror of kmeansTrain: micro corpus `kmm`, seed codebook
    * `kc0`, then per iteration an argmax-assignment CTE, a (cell, dim)
    * sum CTE, a per-cell new-centroid list CTE and a stats CTE — generated
    * by the same loop bound as the Spark side (the bpeOracleStages
    * discipline). Prefixed k* to compose collision-free with the recall
    * SQL's CTE names. */
  private def kmeansOracleStages(iters: Int): String = {
    val sb = new StringBuilder
    sb.append(s"""WITH kmm AS (
        SELECT vec_id, list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS m
        FROM embeddings),
      kc0 AS (SELECT vec_id AS cent_id, m AS cm FROM kmm WHERE $IvfSeedSql)""")
    for (t <- 0 until iters) {
      sb.append(s""",
      ka$t AS (
        SELECT vec_id, m, cent_id AS cell FROM (
          SELECT v.vec_id, v.m, c.cent_id,
                 row_number() OVER (PARTITION BY v.vec_id
                   ORDER BY list_sum(list_transform(generate_series(1, 64),
                     i -> v.m[i] * c.cm[i])) DESC, c.cent_id) AS rn
          FROM kmm v CROSS JOIN kc$t c)
        WHERE rn = 1),
      kg$t AS (
        SELECT cell, i.i AS i, CAST(SUM(m[i.i]) AS BIGINT) AS sv, COUNT(*) AS n
        FROM ka$t CROSS JOIN generate_series(1, 64) AS i(i)
        GROUP BY 1, 2),
      ku$t AS (
        SELECT cell, list(sv // n ORDER BY i) AS cml, any_value(n) AS n
        FROM kg$t GROUP BY cell),
      kc${t + 1} AS (
        SELECT c.cent_id, COALESCE(u.cml, c.cm) AS cm,
               COALESCE(u.n, 0) AS n, c.cm AS prev
        FROM kc$t c LEFT JOIN ku$t u ON u.cell = c.cent_id),
      ks$t AS (
        SELECT ${t + 1} AS it, cent_id, CAST(n AS BIGINT) AS n,
               CAST(list_sum(cm) AS BIGINT) AS csum,
               CAST(list_sum(list_transform(generate_series(1, 64),
                 i -> abs(cm[i] - prev[i]))) AS BIGINT) AS shift
        FROM kc${t + 1})""")
    }
    sb.toString
  }

  /** The IVFADC program (shared by sim_ann_ivfpq and its recall readout).
    * See the sim_ann_ivfpq Op comment for the full design. */
  def ivfpqTopK(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
      thrivespark.functions.Register(s)
      val M = 8; val SUB = 8; val nprobe = 2
      val emb = T.embeddings(s, d)
      val cent = ivfCentroids(emb)
      // coarse assignment + residual against the owning centroid (the
      // build stage: one broadcast argmax + one broadcast diff, map-side)
      val resid = ivfAssignTo(emb, cent)
        .join(broadcast(cent), col("cell") === col("cent_id"))
        .select(col("c_id"), col("cell"),
          zip_with(col("c_emb"), col("cent_emb"), (a, b) => a - b).as("res"))
      def subSlices(v: Column): Column = explode(array((0 until M).map(m =>
        struct(lit(m).as("m"), slice(v, m * SUB + 1, SUB).as("sub"))): _*))
      val subs = resid.select(col("c_id"), col("cell"), subSlices(col("res")).as("x"))
        .select(col("c_id"), col("cell"), col("x.m").as("m"), col("x.sub").as("sub"))
      // fixed-size RESIDUAL codebook: K = 64 seed residuals regardless of
      // corpus size (the constant-broadcast discipline of sim_ann_pq)
      val seedSubs = resid.filter(col("c_id") % 25 === 0 && col("c_id") < 1600)
        .select(col("c_id").as("s_id"), subSlices(col("res")).as("x"))
        .select(col("s_id"), col("x.m").as("sm"), col("x.sub").as("s_sub"))
      val d2 = dot(col("sub"), col("sub")) + dot(col("s_sub"), col("s_sub")) -
        lit(2) * dot(col("sub"), col("s_sub"))
      val codes = subs.join(broadcast(seedSubs), col("m") === col("sm"))
        .withColumn("d2", d2)
        .groupBy(col("c_id"), col("cell"), col("m"))
        .agg(min_by(col("s_id"), struct(col("d2"), col("s_id"))).as("code"))
      val recon = codes.join(broadcast(seedSubs),
          col("m") === col("sm") && col("code") === col("s_id"))
        .groupBy(col("c_id"), col("cell"))
        .agg(flatten(transform(array_sort(collect_list(struct(col("m"), col("s_sub")))),
          x => x.getField("s_sub"))).as("rres"))
      // query side: rank cells once, probe nprobe of them, ADC-score the
      // probed cells' codes only — an equi-join on cell, never a cartesian
      val q = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val wCell = Window.partitionBy(col("q_id")).orderBy(col("csim").desc, col("cent_id"))
      val probes = q.join(broadcast(cent))
        .withColumn("csim", dot(col("q_emb"), col("cent_emb")))
        .withColumn("crn", row_number().over(wCell))
        .filter(col("crn") <= nprobe)
        .select(col("q_id"), col("q_emb"), col("cent_id").as("cell"), col("csim"))
      val wTop = Window.partitionBy(col("q_id")).orderBy(col("approx").desc, col("c_id"))
      probes.join(recon, "cell")
        .filter(col("q_id") =!= col("c_id"))
        .withColumn("approx", col("csim") + dot(col("q_emb"), col("rres")))
        .withColumn("rn", row_number().over(wTop))
        .filter(col("rn") <= 5)
        .select(col("q_id"), col("c_id"), round6(col("approx")).as("approx_cos"), col("rn"))
        .orderBy(col("q_id"), col("rn"))
  }

  private def ivfpqCtes: String = s"""cent AS (
                SELECT vec_id AS cent_id, embedding AS cent_emb
                FROM embeddings WHERE $IvfSeedSql),
              a1 AS (
                SELECT e.vec_id AS c_id, e.embedding AS c_emb, c.cent_id,
                       row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY list_sum(list_transform(generate_series(1, 64),
                           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cent_emb[i] AS DOUBLE))) DESC,
                         c.cent_id) AS arn
                FROM embeddings e CROSS JOIN cent c),
              resid AS (
                SELECT a.c_id, a.cent_id AS cell,
                       list_transform(generate_series(1, 64),
                         i -> a.c_emb[i] - c.cent_emb[i]) AS res
                FROM a1 a JOIN cent c ON a.cent_id = c.cent_id
                WHERE a.arn = 1),
              ms AS (SELECT unnest(generate_series(0, 7)) AS m),
              subs AS (
                SELECT r.c_id, r.cell, ms.m, r.res[8*ms.m+1 : 8*ms.m+8] AS sub
                FROM resid r CROSS JOIN ms),
              ssubs AS (
                SELECT r.c_id AS s_id, ms.m AS sm,
                       r.res[8*ms.m+1 : 8*ms.m+8] AS s_sub
                FROM resid r CROSS JOIN ms
                WHERE r.c_id % 25 = 0 AND r.c_id < 1600),
              enc1 AS (
                SELECT v.c_id, v.cell, v.m, ss.s_id,
                       row_number() OVER (PARTITION BY v.c_id, v.m ORDER BY
                         (list_sum(list_transform(generate_series(1, 8),
                            i -> CAST(v.sub[i] AS DOUBLE) * CAST(v.sub[i] AS DOUBLE)))
                          + list_sum(list_transform(generate_series(1, 8),
                            i -> CAST(ss.s_sub[i] AS DOUBLE) * CAST(ss.s_sub[i] AS DOUBLE)))
                          - 2 * list_sum(list_transform(generate_series(1, 8),
                            i -> CAST(v.sub[i] AS DOUBLE) * CAST(ss.s_sub[i] AS DOUBLE)))) ASC,
                         ss.s_id) AS rn
                FROM subs v JOIN ssubs ss ON v.m = ss.sm),
              recon AS (
                SELECT c.c_id, c.cell, flatten(list(ss.s_sub ORDER BY c.m)) AS rres
                FROM enc1 c JOIN ssubs ss ON c.m = ss.sm AND c.s_id = ss.s_id
                WHERE c.rn = 1
                GROUP BY c.c_id, c.cell),
              q AS (SELECT vec_id AS q_id, embedding AS q_emb
                    FROM embeddings WHERE vec_id % 50 = 0),
              probes AS (
                SELECT q_id, q_emb, cell, csim FROM (
                  SELECT q.q_id, q.q_emb, c.cent_id AS cell,
                         list_sum(list_transform(generate_series(1, 64),
                           i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(c.cent_emb[i] AS DOUBLE))) AS csim,
                         row_number() OVER (PARTITION BY q.q_id
                           ORDER BY list_sum(list_transform(generate_series(1, 64),
                             i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(c.cent_emb[i] AS DOUBLE))) DESC,
                           c.cent_id) AS crn
                  FROM q CROSS JOIN cent c)
                WHERE crn <= 2),
              ivfpq_cand AS (
                SELECT p.q_id, r.c_id,
                       p.csim + list_sum(list_transform(generate_series(1, 64),
                         i -> CAST(p.q_emb[i] AS DOUBLE) * CAST(r.rres[i] AS DOUBLE))) AS approx
                FROM probes p JOIN recon r ON p.cell = r.cell
                WHERE r.c_id <> p.q_id)"""

  val ops: Seq[Op] = Seq(
    Op("sim_topk_cosine",
      (s, d) => {
        thrivespark.functions.Register(s)
        val emb = T.embeddings(s, d)
        val q = emb.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val c = emb.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
        broadcast(q).join(c, col("q_id") =!= col("c_id"))
          .withColumn("cos", dot(col("q_emb"), col("c_emb")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("q_id"), col("c_id"), round6(col("cos")).as("cos"), col("rn"))
          .orderBy(col("q_id"), col("rn"))
      },
      Some(s"""SELECT q_id, c_id, round(cos, 6) + 0.0 AS cos, rn
              FROM (
                SELECT a.vec_id AS q_id, b.vec_id AS c_id, $duckDot AS cos,
                       CAST(row_number() OVER (PARTITION BY a.vec_id
                                          ORDER BY $duckDot DESC, b.vec_id) AS INTEGER) AS rn
                FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
                WHERE a.vec_id % 50 = 0)
              WHERE rn <= 5 ORDER BY q_id, rn""")),

    // HARD-NEGATIVE MINING (r17) — the contrastive-training data op: for
    // each anchor, the top-5 most-similar vectors with a DIFFERENT label.
    // These are exactly the negatives a retrieval/embedding trainer wants
    // (semantically close, wrong class); random negatives are trivially
    // separable and teach nothing. Same scale shape as sim_topk_cosine —
    // broadcast anchor set, map-side cosine, per-anchor top-k — with the
    // label inequality pushed INTO the join condition so cross-label
    // candidates never materialize. At 100 TB the anchor set rides the
    // same IVF index as sim_ann_ivf (probe cells, then label-filter);
    // brute force here is the oracled baseline that path is measured
    // against. Label inequality also subsumes the self-pair filter.
    Op("sim_hard_negatives",
      (s, d) => {
        thrivespark.functions.Register(s)
        val emb = T.embeddings(s, d)
        val q = emb.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            col("label").as("q_label"))
        val c = emb.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
          col("label").as("c_label"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
        broadcast(q).join(c, col("q_label") =!= col("c_label"))
          .withColumn("cos", dot(col("q_emb"), col("c_emb")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("q_id"), col("q_label"), col("c_id"), col("c_label"),
            round6(col("cos")).as("cos"), col("rn"))
          .orderBy(col("q_id"), col("rn"))
      },
      Some(s"""SELECT q_id, q_label, c_id, c_label, round(cos, 6) + 0.0 AS cos, rn
              FROM (
                SELECT a.vec_id AS q_id, a.label AS q_label,
                       b.vec_id AS c_id, b.label AS c_label, $duckDot AS cos,
                       CAST(row_number() OVER (PARTITION BY a.vec_id
                                          ORDER BY $duckDot DESC, b.vec_id) AS INTEGER) AS rn
                FROM embeddings a JOIN embeddings b ON a.label <> b.label
                WHERE a.vec_id % 50 = 0)
              WHERE rn <= 5 ORDER BY q_id, rn""")),

    // Approximate scale path — but fully DETERMINISTIC: centroid choice
    // (vec_id % 100), assignment (max sim, tie → lowest cent_id), probe set
    // (top-nprobe cells, same tie-break) and final ranking all have total
    // orders, and the dot is the same sequential IEEE fold in both engines.
    // So the "approximate" operator still gets an exact SQL oracle (r2);
    // recall vs brute force is measured separately in DedupSimilaritySpec.
    Op("sim_ann_ivf",
      (s, d) => annTopK(s, d),
      Some(s"""WITH cent AS (
                SELECT vec_id AS cent_id, embedding AS cent_emb
                FROM embeddings WHERE $IvfSeedSql),
              a1 AS (
                SELECT e.vec_id AS c_id, e.embedding AS c_emb, c.cent_id,
                       row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY list_sum(list_transform(generate_series(1, 64),
                           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cent_emb[i] AS DOUBLE))) DESC,
                         c.cent_id) AS arn
                FROM embeddings e CROSS JOIN cent c),
              assigned AS (SELECT c_id, c_emb, cent_id AS cell FROM a1 WHERE arn = 1),
              q AS (
                SELECT vec_id AS q_id, embedding AS q_emb
                FROM embeddings WHERE vec_id % 50 = 0),
              p1 AS (
                SELECT q.q_id, q.q_emb, c.cent_id AS cell,
                       row_number() OVER (PARTITION BY q.q_id
                         ORDER BY list_sum(list_transform(generate_series(1, 64),
                           i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(c.cent_emb[i] AS DOUBLE))) DESC,
                         c.cent_id) AS crn
                FROM q CROSS JOIN cent c),
              probes AS (SELECT q_id, q_emb, cell FROM p1 WHERE crn <= 2),
              cand AS (
                SELECT p.q_id, a.c_id,
                       list_sum(list_transform(generate_series(1, 64),
                         i -> CAST(p.q_emb[i] AS DOUBLE) * CAST(a.c_emb[i] AS DOUBLE))) AS cos
                FROM probes p JOIN assigned a ON p.cell = a.cell
                WHERE p.q_id <> a.c_id)
              SELECT q_id, c_id, round(cos, 6) + 0.0 AS cos, rn FROM (
                SELECT q_id, c_id, cos,
                       CAST(row_number() OVER (PARTITION BY q_id
                         ORDER BY cos DESC, c_id) AS INTEGER) AS rn
                FROM cand)
              WHERE rn <= 5 ORDER BY q_id, rn""")),

    // Incremental ANN over a PERSISTED index (see annIncremental's doc):
    // base index written+reread as parquet, delta batch assigned to
    // existing cells map-side, delta queries probe the union. The oracle
    // assigns every vector against the base centroids in one shot — the
    // incremental path must match it byte-for-byte, which is exactly the
    // "incremental == full rebuild" invariant a production feature store
    // needs. Centroids exclude the delta (vec_id % 7 = 3); queries are the
    // delta's % 3 = 0 slice.
    Op("sim_ann_incremental",
      (s, d) => annIncremental(s, d),
      Some(s"""WITH cent AS (
                SELECT vec_id AS cent_id, embedding AS cent_emb
                FROM embeddings WHERE $IvfSeedSql AND vec_id % 7 <> 3),
              a1 AS (
                SELECT e.vec_id AS c_id, e.embedding AS c_emb, c.cent_id,
                       row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY list_sum(list_transform(generate_series(1, 64),
                           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cent_emb[i] AS DOUBLE))) DESC,
                         c.cent_id) AS arn
                FROM embeddings e CROSS JOIN cent c),
              assigned AS (SELECT c_id, c_emb, cent_id AS cell FROM a1 WHERE arn = 1),
              q AS (
                SELECT vec_id AS q_id, embedding AS q_emb
                FROM embeddings WHERE vec_id % 7 = 3 AND vec_id % 3 = 0),
              p1 AS (
                SELECT q.q_id, q.q_emb, c.cent_id AS cell,
                       row_number() OVER (PARTITION BY q.q_id
                         ORDER BY list_sum(list_transform(generate_series(1, 64),
                           i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(c.cent_emb[i] AS DOUBLE))) DESC,
                         c.cent_id) AS crn
                FROM q CROSS JOIN cent c),
              probes AS (SELECT q_id, q_emb, cell FROM p1 WHERE crn <= 2),
              cand AS (
                SELECT p.q_id, a.c_id,
                       list_sum(list_transform(generate_series(1, 64),
                         i -> CAST(p.q_emb[i] AS DOUBLE) * CAST(a.c_emb[i] AS DOUBLE))) AS cos
                FROM probes p JOIN assigned a ON p.cell = a.cell
                WHERE p.q_id <> a.c_id)
              SELECT q_id, c_id, round(cos, 6) + 0.0 AS cos, rn FROM (
                SELECT q_id, c_id, cos,
                       CAST(row_number() OVER (PARTITION BY q_id
                         ORDER BY cos DESC, c_id) AS INTEGER) AS rn
                FROM cand)
              WHERE rn <= 5 ORDER BY q_id, rn""")),

    // Recall@k of the IVF index vs exact brute force, AS A QUERY — "measure,
    // don't guess" applied to ANN quality. A production vector store ships
    // recall dashboards next to its index; this computes per-query hit
    // counts by left-semi-joining the exact top-k against the IVF top-k on
    // (q_id, c_id). Both sides are deterministic (total orders throughout
    // the ladder), so even the RECALL MEASUREMENT gets an exact SQL oracle
    // — the number the dashboard shows is differentially tested, not
    // sampled. Scale shape: the exact side is the one honest brute-force
    // pass (broadcast query block), the IVF side reuses the probe plan;
    // the join + count grain is queries × k, i.e. tiny.
    Op("sim_ann_recall",
      (s, d) => {
        thrivespark.functions.Register(s)
        val emb = T.embeddings(s, d)
        val q = emb.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val c = emb.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
        val exact = broadcast(q).join(c, col("q_id") =!= col("c_id"))
          .withColumn("cos", dot(col("q_emb"), col("c_emb")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("q_id"), col("c_id"))
        val approx = annTopKFrom(emb).select(col("q_id"), col("c_id"))
        // ONE aggregation over exact (left-joined to approx with a match
        // flag) computes k and n_hit together — the previous two-branch
        // shape (left_semi for hits + a separate groupBy for k) executed
        // the brute-force exact plan TWICE per run
        exact.join(approx.withColumn("hit", lit(1)), Seq("q_id", "c_id"), "left")
          .groupBy(col("q_id"))
          .agg(count(lit(1)).cast("int").as("k"),
            sum(coalesce(col("hit"), lit(0))).cast("int").as("n_hit"))
          .select(col("q_id"), col("k"), col("n_hit"),
            (col("n_hit").cast("long") * lit(1000000L)
              / col("k").cast("long")).cast("long").as("recall_micros"))
          .orderBy(col("q_id"))
      },
      Some(s"""WITH exact AS (
                SELECT q_id, c_id FROM (
                  SELECT a.vec_id AS q_id, b.vec_id AS c_id,
                         row_number() OVER (PARTITION BY a.vec_id
                           ORDER BY list_sum(list_transform(generate_series(1, 64),
                             i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) DESC,
                           b.vec_id) AS rn
                  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
                  WHERE a.vec_id % 50 = 0)
                WHERE rn <= 5),
              cent AS (
                SELECT vec_id AS cent_id, embedding AS cent_emb
                FROM embeddings WHERE $IvfSeedSql),
              a1 AS (
                SELECT e.vec_id AS c_id, e.embedding AS c_emb, c.cent_id,
                       row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY list_sum(list_transform(generate_series(1, 64),
                           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cent_emb[i] AS DOUBLE))) DESC,
                         c.cent_id) AS arn
                FROM embeddings e CROSS JOIN cent c),
              assigned AS (SELECT c_id, c_emb, cent_id AS cell FROM a1 WHERE arn = 1),
              q AS (
                SELECT vec_id AS q_id, embedding AS q_emb
                FROM embeddings WHERE vec_id % 50 = 0),
              p1 AS (
                SELECT q.q_id, q.q_emb, c.cent_id AS cell,
                       row_number() OVER (PARTITION BY q.q_id
                         ORDER BY list_sum(list_transform(generate_series(1, 64),
                           i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(c.cent_emb[i] AS DOUBLE))) DESC,
                         c.cent_id) AS crn
                FROM q CROSS JOIN cent c),
              probes AS (SELECT q_id, q_emb, cell FROM p1 WHERE crn <= 2),
              cand AS (
                SELECT p.q_id, a.c_id,
                       list_sum(list_transform(generate_series(1, 64),
                         i -> CAST(p.q_emb[i] AS DOUBLE) * CAST(a.c_emb[i] AS DOUBLE))) AS cos
                FROM probes p JOIN assigned a ON p.cell = a.cell
                WHERE p.q_id <> a.c_id),
              approx AS (
                SELECT q_id, c_id FROM (
                  SELECT q_id, c_id,
                         row_number() OVER (PARTITION BY q_id
                           ORDER BY cos DESC, c_id) AS rn
                  FROM cand)
                WHERE rn <= 5),
              hit AS (
                SELECT e.q_id, COUNT(*) AS n_hit
                FROM exact e JOIN approx x ON e.q_id = x.q_id AND e.c_id = x.c_id
                GROUP BY 1),
              kq AS (SELECT q_id, COUNT(*) AS k FROM exact GROUP BY 1)
              SELECT kq.q_id, CAST(kq.k AS INTEGER) AS k,
                     CAST(COALESCE(h.n_hit, 0) AS INTEGER) AS n_hit,
                     CAST(COALESCE(h.n_hit, 0) * 1000000 // kq.k AS BIGINT) AS recall_micros
              FROM kq LEFT JOIN hit h ON h.q_id = kq.q_id
              ORDER BY kq.q_id""")),

    // The nprobe dial AS AN ORACLED QUERY (r16 — the recall-curve readout a
    // vector store publishes before picking its probe budget): recall@5 of
    // the IVF probe vs exact brute force, for nprobe ∈ {1,2,3,5} of the 5%
    // centroid cells, in ONE pass. Cells are ranked once per query (crn);
    // each curve point is a FILTER on that ranked candidate set, not a
    // re-probe — candidates and the exact top-5 are localCheckpoint'd
    // (consumed 4×, the persisted-stage-boundary rule), so the brute-force
    // pass and the cell scan each run once. k_total/n_hit are corpus-grain
    // sums; recall_micros must be non-decreasing in nprobe (pinned in
    // DedupSimilaritySpec — more probed cells can only add candidates).
    Op("sim_ann_recall_curve",
      (s, d) => recallCurve(T.embeddings(s, d)),
      Some(recallCurveSql)),

    // Lloyd's k-means training AS AN ORACLED QUERY (r16 — finishes the r15
    // half-landed trainer): the op emits the per-(iteration, centroid)
    // trajectory rows — member count n, centroid dim-sum csum, L1 shift vs
    // the previous centroid — and the DuckDB oracle RE-RUNS the whole
    // training loop from the same seed via the generated CTE chain
    // (kmeansOracleStages, the text_bpe_train discipline: the mirror is
    // generated by the same iteration bound, so the engines cannot drift
    // silently). Everything is micro-space integer math (see microArr), so
    // the differential test is exact per iteration, not approximate.
    Op("sim_ann_kmeans_train",
      (s, d) => {
        import s.implicits._
        val (_, stats) = kmeansTrained(s, d)
        stats.toDF("it", "cent_id", "n", "csum", "shift")
          .orderBy(col("it"), col("cent_id"))
      },
      Some(kmeansOracleStages(KmeansIters) + "\n" +
        (0 until KmeansIters).map(t => s"SELECT * FROM ks$t").mkString(
          "SELECT CAST(it AS INTEGER) AS it, cent_id, n, csum, shift FROM (",
          " UNION ALL ", ") ORDER BY it, cent_id"))),

    // completes the ANN ladder (brute → IVF → sign-LSH → PQ): vectors are
    // encoded as M=8 subspace codes against a per-subspace codebook
    // (centroids = a deterministic seed sample's slices), and queries score
    // candidates against the RECONSTRUCTED vectors (ADC) — at 100 TB the
    // scan touches 8 codes + a broadcast codebook per vector (32× less
    // memory bandwidth than raw floats), composing with IVF cells for
    // sublinearity. Every step has a total order (argmin tie → lower seed
    // id; d2 and the ADC dot are the same sequential IEEE folds as the
    // oracle), so like sim_ann_ivf this "approximate" operator still gets
    // an exact SQL oracle; recall vs brute force is measured in
    // DedupSimilaritySpec.
    Op("sim_ann_pq",
      (s, d) => {
        thrivespark.functions.Register(s)
        val M = 8; val SUB = 8
        val emb = T.embeddings(s, d)
        def subSlices(v: Column): Column = explode(array((0 until M).map(m =>
          struct(lit(m).as("m"), slice(v, m * SUB + 1, SUB).as("sub"))): _*))
        val subs = emb.select(col("vec_id"), subSlices(col("embedding")).as("x"))
          .select(col("vec_id"), col("x.m").as("m"), col("x.sub").as("sub"))
        // fixed-size codebook: K = 64 seeds regardless of corpus size (the
        // codebook must stay a constant-size broadcast at 100 TB)
        val seedSubs = emb.filter(col("vec_id") % 25 === 0 && col("vec_id") < 1600)
          .select(col("vec_id").as("s_id"), subSlices(col("embedding")).as("x"))
          .select(col("s_id"), col("x.m").as("sm"), col("x.sub").as("s_sub"))
        // encode: per (vector, subspace) the nearest centroid by squared L2,
        // expanded via the three-dot identity so every distance is the same
        // sequential fold both engines run; broadcast codebook ⇒ the argmin
        // reduces map-side, one (vec_id, m) shuffle total
        val d2 = dot(col("sub"), col("sub")) + dot(col("s_sub"), col("s_sub")) -
          lit(2) * dot(col("sub"), col("s_sub"))
        val codes = subs.join(broadcast(seedSubs), col("m") === col("sm"))
          .withColumn("d2", d2)
          .groupBy(col("vec_id"), col("m"))
          .agg(min_by(col("s_id"), struct(col("d2"), col("s_id"))).as("code"))
        // reconstruction: concat the coded centroid slices back to 64 dims
        val recon = codes.join(broadcast(seedSubs),
            col("m") === col("sm") && col("code") === col("s_id"))
          .groupBy(col("vec_id"))
          .agg(flatten(transform(array_sort(collect_list(struct(col("m"), col("s_sub")))),
            x => x.getField("s_sub"))).as("recon"))
        val q = emb.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("approx").desc, col("c_id"))
        broadcast(q).join(recon.select(col("vec_id").as("c_id"), col("recon")),
            col("q_id") =!= col("c_id"))
          .withColumn("approx", dot(col("q_emb"), col("recon")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("q_id"), col("c_id"), round6(col("approx")).as("approx_cos"), col("rn"))
          .orderBy(col("q_id"), col("rn"))
      },
      Some("""WITH ms AS (SELECT unnest(generate_series(0, 7)) AS m),
              subs AS (
                SELECT e.vec_id, ms.m, e.embedding[8*ms.m+1 : 8*ms.m+8] AS sub
                FROM embeddings e CROSS JOIN ms),
              ssubs AS (
                SELECT s.vec_id AS s_id, ms.m AS sm,
                       s.embedding[8*ms.m+1 : 8*ms.m+8] AS s_sub
                FROM embeddings s CROSS JOIN ms WHERE s.vec_id % 25 = 0 AND s.vec_id < 1600),
              enc1 AS (
                SELECT v.vec_id, v.m, ss.s_id,
                       row_number() OVER (PARTITION BY v.vec_id, v.m ORDER BY
                         (list_sum(list_transform(generate_series(1, 8),
                            i -> CAST(v.sub[i] AS DOUBLE) * CAST(v.sub[i] AS DOUBLE)))
                          + list_sum(list_transform(generate_series(1, 8),
                            i -> CAST(ss.s_sub[i] AS DOUBLE) * CAST(ss.s_sub[i] AS DOUBLE)))
                          - 2 * list_sum(list_transform(generate_series(1, 8),
                            i -> CAST(v.sub[i] AS DOUBLE) * CAST(ss.s_sub[i] AS DOUBLE)))) ASC,
                         ss.s_id) AS rn
                FROM subs v JOIN ssubs ss ON v.m = ss.sm),
              codes AS (SELECT vec_id, m, s_id FROM enc1 WHERE rn = 1),
              recon AS (
                SELECT c.vec_id, flatten(list(ss.s_sub ORDER BY c.m)) AS recon
                FROM codes c JOIN ssubs ss ON c.m = ss.sm AND c.s_id = ss.s_id
                GROUP BY c.vec_id),
              q AS (SELECT vec_id AS q_id, embedding AS q_emb
                    FROM embeddings WHERE vec_id % 50 = 0),
              cand AS (
                SELECT q.q_id, r.vec_id AS c_id,
                       list_sum(list_transform(generate_series(1, 64),
                         i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(r.recon[i] AS DOUBLE))) AS approx
                FROM q JOIN recon r ON r.vec_id <> q.q_id)
              SELECT q_id, c_id, round(approx, 6) + 0.0 AS approx_cos, rn
              FROM (SELECT q_id, c_id, approx,
                           CAST(row_number() OVER (PARTITION BY q_id
                             ORDER BY approx DESC, c_id) AS INTEGER) AS rn
                    FROM cand)
              WHERE rn <= 5 ORDER BY q_id, rn""")),

    // IVFADC (r17 — the billion-scale ANN architecture, composing the two
    // ladders): coarse IVF quantization prunes the CANDIDATE SET (probe
    // nprobe cells), residual product quantization compresses the
    // CANDIDATE STORAGE (each vector's residual v − centroid[cell] is
    // PQ-coded in M=8 subspaces against a fixed-K=64 residual codebook),
    // and queries score candidates by ADC over the reconstruction:
    // approx = dot(q, centroid[cell]) + dot(q, recon(residual)). At 100 TB
    // the probe touches nprobe/K of the corpus and the scored
    // representation is M codes/vector + two constant-size broadcast
    // codebooks — the raw vectors never leave the build stage. Residuals
    // are float32 (Spark zip_with subtraction ≡ DuckDB REAL − REAL,
    // verified bit-identical rounding), every distance/dot is the same
    // sequential double fold both engines run, and every argmin/argmax/
    // top-k carries a total order (tie → lowest id), so this approximate
    // operator still gets an exact SQL oracle (rule R2); recall vs brute
    // force is measured in DedupSimilaritySpec.
    Op("sim_ann_ivfpq",
      (s, d) => ivfpqTopK(s, d),
      Some(s"""WITH $ivfpqCtes
              SELECT q_id, c_id, round(approx, 6) + 0.0 AS approx_cos, rn
              FROM (SELECT q_id, c_id, approx,
                           CAST(row_number() OVER (PARTITION BY q_id
                             ORDER BY approx DESC, c_id) AS INTEGER) AS rn
                    FROM ivfpq_cand)
              WHERE rn <= 5 ORDER BY q_id, rn""")),

    // Recall@5 of the IVFADC probe vs exact brute force, AS A QUERY (the
    // sim_ann_recall discipline applied to the r17 composition): the
    // compounded approximation — coarse pruning × residual-PQ scoring —
    // gets its dashboard number differentially tested, not sampled. The
    // exact side is the one honest brute-force pass; the IVFADC side
    // reuses the same deterministic chain as sim_ann_ivfpq (one shared
    // generated CTE block, so the two keys cannot drift).
    Op("sim_ann_ivfpq_recall",
      (s, d) => {
        thrivespark.functions.Register(s)
        val emb = T.embeddings(s, d)
        val q = emb.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val c = emb.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
        val exact = broadcast(q).join(c, col("q_id") =!= col("c_id"))
          .withColumn("cos", dot(col("q_emb"), col("c_emb")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("q_id"), col("c_id"))
        val approx = ivfpqTopK(s, d).select(col("q_id"), col("c_id"))
        exact.join(approx.withColumn("hit", lit(1)), Seq("q_id", "c_id"), "left")
          .groupBy(col("q_id"))
          .agg(count(lit(1)).cast("int").as("k"),
            sum(coalesce(col("hit"), lit(0))).cast("int").as("n_hit"))
          .select(col("q_id"), col("k"), col("n_hit"),
            (col("n_hit").cast("long") * lit(1000000L)
              / col("k").cast("long")).cast("long").as("recall_micros"))
          .orderBy(col("q_id"))
      },
      Some(s"""WITH exact AS (
                SELECT q_id, c_id FROM (
                  SELECT a.vec_id AS q_id, b.vec_id AS c_id,
                         row_number() OVER (PARTITION BY a.vec_id
                           ORDER BY list_sum(list_transform(generate_series(1, 64),
                             i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) DESC,
                           b.vec_id) AS rn
                  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
                  WHERE a.vec_id % 50 = 0)
                WHERE rn <= 5),
              $ivfpqCtes,
              approx AS (
                SELECT q_id, c_id FROM (
                  SELECT q_id, c_id,
                         row_number() OVER (PARTITION BY q_id
                           ORDER BY approx DESC, c_id) AS rn
                  FROM ivfpq_cand)
                WHERE rn <= 5),
              hit AS (
                SELECT e.q_id, COUNT(*) AS n_hit
                FROM exact e JOIN approx x ON e.q_id = x.q_id AND e.c_id = x.c_id
                GROUP BY 1),
              kq AS (SELECT q_id, COUNT(*) AS k FROM exact GROUP BY 1)
              SELECT kq.q_id, CAST(kq.k AS INTEGER) AS k,
                     CAST(COALESCE(h.n_hit, 0) AS INTEGER) AS n_hit,
                     CAST(COALESCE(h.n_hit, 0) * 1000000 // kq.k AS BIGINT) AS recall_micros
              FROM kq LEFT JOIN hit h ON h.q_id = kq.q_id
              ORDER BY kq.q_id""")),


    // The NAIVE all-pairs formulation — no blocking in the user's query.
    // SimilarityJoinRewrite (optimizer rule) injects exact projection-bucket
    // blocking, so this plans as a shuffled equi-join instead of a
    // CartesianProduct (asserted in PlanSpec) while producing byte-identical
    // results to the brute-force oracle.
    Op("sim_join_rewrite",
      (s, d) => {
        thrivespark.functions.Register(s)
        thrivespark.plans.SimilarityJoinRewrite.install(s)
        val a = T.embeddings(s, d)
          .select(col("vec_id").as("a_id"), col("embedding").as("e_a"))
        val b = T.embeddings(s, d)
          .select(col("vec_id").as("b_id"), col("embedding").as("e_b"))
        a.join(b, dot(col("e_a"), col("e_b")) > 0.45 && col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"),
            round6(dot(col("e_a"), col("e_b"))).as("cos"))
          .orderBy(col("a_id"), col("b_id"))
      },
      Some(s"""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                     round($duckDot, 6) + 0.0 AS cos
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              WHERE $duckDot > 0.45
              ORDER BY a_id, b_id""")),

    Op("sim_threshold_pairs",
      (s, d) => {
        thrivespark.functions.Register(s)
        val a = T.embeddings(s, d)
          .select(col("label").as("l_a"), col("vec_id").as("a_id"), col("embedding").as("e_a"))
        val b = T.embeddings(s, d)
          .select(col("label").as("l_b"), col("vec_id").as("b_id"), col("embedding").as("e_b"))
        a.join(b, col("l_a") === col("l_b") && col("a_id") < col("b_id"))
          .withColumn("cos", dot(col("e_a"), col("e_b")))
          .filter(col("cos") > 0.3)
          .select(col("a_id"), col("b_id"), col("l_a").as("label"), round6(col("cos")).as("cos"))
          .orderBy(col("a_id"), col("b_id"))
      },
      Some(s"""SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.label AS label,
                     round($duckDot, 6) + 0.0 AS cos
              FROM embeddings a JOIN embeddings b
                ON a.label = b.label AND a.vec_id < b.vec_id
              WHERE $duckDot > 0.3
              ORDER BY a_id, b_id""")),

    Op("multimodal_join",
      (s, d) => {
        thrivespark.functions.Register(s)
        T.documents(s, d)
        .join(T.embeddings(s, d), col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"), col("label"),
          size(col("embedding")).as("dim"),
          round4(sqrt(dot(col("embedding"), col("embedding")))).as("l2_norm"),
          size(split(col("text"), " ")).as("n_tokens"))
        .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang, source, n_chars, label,
                     CAST(len(embedding) AS INTEGER) AS dim,
                     round(sqrt(list_sum(list_transform(embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
                     CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
              FROM documents JOIN embeddings ON doc_id = vec_id
              ORDER BY doc_id""")),

    // Multimodal binary-column metadata: opaque-bytes surface (octet length,
    // content hashes) — the payload plumbing for media columns; the decode
    // stage itself is the real mapPartitions path in thrivespark.multimodal.
    Op("multimodal_binary_meta",
      (s, d) => T.documents(s, d).select(
        col("doc_id"),
        octet_length(col("text").cast("binary")).as("n_bytes"),
        sha2(col("text").cast("binary"), 256).as("sha_256"),
        md5(col("text")).as("md5_hex"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
                     CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
                     sha256(text) AS sha_256,
                     md5(text) AS md5_hex
              FROM documents ORDER BY doc_id""")),

    // The full multimodal pipeline surface in one plan: REAL binary P6 PPM
    // payloads → partition-parallel REAL decode (mapPartitions, map-only
    // stage) emitting exact channel means AND a REAL 8×8 grayscale
    // box-filter thumbnail computed from the decoded raster (r12 — real
    // video frame-sampling lives in multimodal_video_features; this op's
    // n_frames column is the codec-agnostic chunk count — how many 256-byte
    // chunks a keyframe sampler visiting every 4th chunk would emit —
    // computed as pure codegen arithmetic on octet_length (r19: the last
    // UDF-backed stub was retired; same integers, now whole-stage codegen).
    // The planted pixel function is closed-form in (media_id, x, y,
    // channel) and every feature — including the thumbnail's 64-byte length
    // and its checksum (Σ of the 64 cell means) — is exact integer math, so
    // the DuckDB oracle recomputes all of it from generate_series: a full
    // differential check of the downsample, not rows-only.
    // The self-join on media_id is fixture-grain only (both sides derive
    // from one scan; AQE broadcasts at small SF) — in production the decode
    // runs once per payload in the single mapPartitions stage.
    Op("multimodal_features",
      (s, d) => {
        val mm = thrivespark.multimodal.Multimodal
        val media = mm.mediaPpmFromDocuments(T.documents(s, d))
        val feats = mm.extractPpmFeatures(media)
        val derived = media.select(col("media_id"), col("kind"),
          expr("CAST(((octet_length(payload) + 255) div 256 + 3) div 4 AS INT)")
            .as("n_frames"))
        feats.join(derived, "media_id")
          .select(col("media_id"), col("kind"), col("width"), col("height"),
            col("n_pixel_bytes"), col("r_mean_micros"), col("g_mean_micros"),
            col("b_mean_micros"), octet_length(col("thumb")).as("thumb_bytes"),
            col("thumb_checksum"), col("n_frames"))
          .orderBy(col("media_id"))
      },
      Some("""WITH m AS (
                SELECT doc_id AS media_id,
                       8 + (doc_id % 9) AS w,
                       8 + (doc_id % 7) AS h
                FROM documents
              ), px AS (
                SELECT m.media_id, m.w, m.h, x.x AS x, y.y AS y,
                       (3 * m.media_id + x.x + 2 * y.y) % 256        AS r,
                       (3 * m.media_id + x.x + 2 * y.y + 37) % 256   AS g,
                       (3 * m.media_id + x.x + 2 * y.y + 74) % 256   AS b
                FROM m
                JOIN generate_series(0, 15) AS x(x) ON x.x < m.w
                JOIN generate_series(0, 13) AS y(y) ON y.y < m.h
              ), sums AS (
                SELECT media_id, w, h,
                       SUM(r) AS rsum, SUM(g) AS gsum, SUM(b) AS bsum
                FROM px GROUP BY 1, 2, 3
              ), cells AS (
                SELECT media_id, (x * 8) // w AS ci, (y * 8) // h AS cj,
                       SUM(r + g + b) AS gs, COUNT(*) AS nb
                FROM px GROUP BY 1, 2, 3
              ), thumb AS (
                SELECT media_id, SUM(gs // (3 * nb)) AS tsum
                FROM cells GROUP BY 1
              )
              SELECT s.media_id,
                     'image' AS kind,
                     CAST(w AS INTEGER) AS width,
                     CAST(h AS INTEGER) AS height,
                     CAST(w * h * 3 AS INTEGER) AS n_pixel_bytes,
                     CAST(rsum * 1000000 // (w * h) AS BIGINT) AS r_mean_micros,
                     CAST(gsum * 1000000 // (w * h) AS BIGINT) AS g_mean_micros,
                     CAST(bsum * 1000000 // (w * h) AS BIGINT) AS b_mean_micros,
                     CAST(64 AS INTEGER) AS thumb_bytes,
                     CAST(t.tsum AS BIGINT) AS thumb_checksum,
                     CAST((((9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR))
                             + 3 * w * h + 255) // 256) + 3) // 4 AS INTEGER) AS n_frames
              FROM sums s JOIN thumb t ON s.media_id = t.media_id
              ORDER BY s.media_id""")),

    // The audio leg of the multimodal path (r12 — the PPM move repeated for
    // WAV/PCM): fixtures are genuine RIFF/WAVE files generated from a
    // closed-form sample function, and the decode is a real chunk-walking
    // parser (magic, fmt, data; unknown chunks skipped) run as the same
    // map-only mapPartitions stage as the image decode. Every feature is
    // nonnegative integer math, so the DuckDB oracle recomputes all of them
    // from generate_series — a full differential check of the audio decode.
    Op("multimodal_audio_features",
      (s, d) => {
        val mm = thrivespark.multimodal.Multimodal
        val media = mm.mediaWavFromDocuments(T.documents(s, d))
        mm.extractWavFeatures(media)
          .select(col("media_id"), lit("audio").as("kind"), col("sample_rate"),
            col("n_samples"), col("duration_ms"), col("mean_micros"), col("peak"))
          .orderBy(col("media_id"))
      },
      Some("""WITH m AS (
                SELECT doc_id AS media_id, 256 + (doc_id % 41) * 4 AS n
                FROM documents
              ), s AS (
                SELECT m.media_id, m.n,
                       SUM((7 * m.media_id + 11 * i.i) % 4001) AS amp_sum,
                       MAX((7 * m.media_id + 11 * i.i) % 4001) AS peak
                FROM m
                JOIN generate_series(0, 415) AS i(i) ON i.i < m.n
                GROUP BY 1, 2
              )
              SELECT media_id,
                     'audio' AS kind,
                     CAST(8000 AS INTEGER) AS sample_rate,
                     CAST(n AS INTEGER) AS n_samples,
                     CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
                     CAST(amp_sum * 1000000 // n AS BIGINT) AS mean_micros,
                     CAST(peak AS INTEGER) AS peak
              FROM s
              ORDER BY media_id""")),

    // The video leg (r12 — the PPM/WAV move repeated for YUV4MPEG2):
    // fixtures are genuine Cmono Y4M clips generated from a closed-form luma
    // function, and the decode is a real stream parser (magic, tag walk,
    // FRAME-delimited raw planes) that SAMPLES every 3rd frame — the
    // keyframe-grain extraction a training pipeline runs so downstream
    // stages touch 1/N of the raster bytes. Map-only mapPartitions stage,
    // zero shuffles, like the image/audio legs. Every feature — including
    // the sampled-frame luma sum, mean and peak — is nonnegative integer
    // math, so the DuckDB oracle recomputes the full decode+sampling from a
    // generate_series pixel grid: frame sampling is differentially tested,
    // not stubbed — this is the real video decode story.
    Op("multimodal_video_features",
      (s, d) => {
        val mm = thrivespark.multimodal.Multimodal
        val media = mm.mediaY4mFromDocuments(T.documents(s, d))
        mm.extractY4mFeatures(media, everyNth = 3)
          .select(col("media_id"), lit("video").as("kind"), col("width"),
            col("height"), col("n_frames"), col("fps"), col("duration_ms"),
            col("n_sampled"), col("luma_sum"), col("mean_micros"), col("peak"))
          .orderBy(col("media_id"))
      },
      Some("""WITH m AS (
                SELECT doc_id AS media_id,
                       8 + (doc_id % 5) * 2 AS w,
                       8 + (doc_id % 3) * 2 AS h,
                       6 + (doc_id % 9) AS n
                FROM documents
              ), px AS (
                SELECT m.media_id, m.w, m.h, m.n,
                       (5 * m.media_id + 13 * f.f + x.x + 3 * y.y) % 256 AS v
                FROM m
                JOIN generate_series(0, 13) AS f(f) ON f.f < m.n AND f.f % 3 = 0
                JOIN generate_series(0, 15) AS x(x) ON x.x < m.w
                JOIN generate_series(0, 11) AS y(y) ON y.y < m.h
              ), s AS (
                SELECT media_id, w, h, n,
                       COUNT(*) AS npx, SUM(v) AS lsum, MAX(v) AS peak
                FROM px GROUP BY 1, 2, 3, 4
              )
              SELECT media_id,
                     'video' AS kind,
                     CAST(w AS INTEGER) AS width,
                     CAST(h AS INTEGER) AS height,
                     CAST(n AS INTEGER) AS n_frames,
                     CAST(10 AS INTEGER) AS fps,
                     CAST(n * 100 AS BIGINT) AS duration_ms,
                     CAST((n + 2) // 3 AS INTEGER) AS n_sampled,
                     CAST(lsum AS BIGINT) AS luma_sum,
                     CAST(lsum * 1000000 // npx AS BIGINT) AS mean_micros,
                     CAST(peak AS INTEGER) AS peak
              FROM s
              ORDER BY media_id""")),

    // The trimodal manifest in its production shape: ONE scan of the corpus
    // table, ONE mapPartitions pass decoding image (PPM) + audio (WAV) +
    // video (Y4M, every-3rd-frame sampled) payloads side by side, doc-level
    // columns riding through — zero joins, zero Exchanges (pinned in
    // PlanSpec). Per-modality extract ops would cost three scans and two
    // media_id shuffles for row-local work; at 100 TB the fused pass is the
    // only sane plan. Every emitted feature is integer math over the three
    // closed-form planted signals, so one DuckDB query recomputes the whole
    // manifest exactly.
    // Cross-modal retrieval (r14 — the composition that ties the two mature
    // axes together): decoded IMAGE features → 64-dim feature vector → ANN
    // probe against the standing embedding index. This is the retrieval
    // shape a multimodal training pipeline runs — embed the new modality,
    // query the existing vector index — and it reuses the IVF machinery
    // unchanged (ivfCentroids/ivfAssign/probeTopK, self-exclusion off since
    // media_id and vec_id are different id spaces). The query vector is the
    // REAL decoded 8×8 grayscale thumbnail (64 cell means, row-major
    // cj*8+ci), parsed out of the decoder's 64-byte thumb column via
    // hex-pair → conv — integer cell values are exact in float32, and
    // vec_dot's sequential double fold matches the oracle's list_sum, so
    // the whole approximate pipeline keeps an exact oracle (the sim_ann_ivf
    // determinism argument, extended across modalities). Candidates come
    // only from probed cells (equi-join on cell) — no cartesian.
    Op("multimodal_retrieval",
      (s, d) => {
        thrivespark.functions.Register(s)
        val q = thumbQueries(s, d)
        val emb = T.embeddings(s, d)
        probeTopK(q, ivfCentroids(emb), ivfAssign(emb), k = 5, nprobe = 2,
            excludeSelf = false)
          .select(col("q_id"), col("c_id"), col("cos").as("score"), col("rn"))
      },
      Some(s"""WITH m AS (
                SELECT doc_id AS media_id,
                       8 + (doc_id % 9) AS w,
                       8 + (doc_id % 7) AS h
                FROM documents WHERE doc_id % 25 = 0),
              px AS (
                SELECT m.media_id, m.w, m.h, x.x AS x, y.y AS y,
                       (3 * m.media_id + x.x + 2 * y.y) % 256      AS r,
                       (3 * m.media_id + x.x + 2 * y.y + 37) % 256 AS g,
                       (3 * m.media_id + x.x + 2 * y.y + 74) % 256 AS b
                FROM m
                JOIN generate_series(0, 15) AS x(x) ON x.x < m.w
                JOIN generate_series(0, 13) AS y(y) ON y.y < m.h),
              cells AS (
                SELECT media_id,
                       ((y * 8) // h) * 8 + (x * 8) // w AS idx,
                       SUM(r + g + b) // (3 * COUNT(*)) AS mv
                FROM px GROUP BY 1, 2),
              q AS (
                SELECT media_id AS q_id,
                       list(CAST(mv AS DOUBLE) ORDER BY idx) AS q_emb
                FROM cells GROUP BY 1),
              cent AS (
                SELECT vec_id AS cent_id, embedding AS cent_emb
                FROM embeddings WHERE $IvfSeedSql),
              a1 AS (
                SELECT e.vec_id AS c_id, e.embedding AS c_emb, c.cent_id,
                       row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY list_sum(list_transform(generate_series(1, 64),
                           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cent_emb[i] AS DOUBLE))) DESC,
                         c.cent_id) AS arn
                FROM embeddings e CROSS JOIN cent c),
              assigned AS (SELECT c_id, c_emb, cent_id AS cell FROM a1 WHERE arn = 1),
              p1 AS (
                SELECT q.q_id, q.q_emb, c.cent_id AS cell,
                       row_number() OVER (PARTITION BY q.q_id
                         ORDER BY list_sum(list_transform(generate_series(1, 64),
                           i -> q.q_emb[i] * CAST(c.cent_emb[i] AS DOUBLE))) DESC,
                         c.cent_id) AS crn
                FROM q CROSS JOIN cent c),
              probes AS (SELECT q_id, q_emb, cell FROM p1 WHERE crn <= 2),
              cand AS (
                SELECT p.q_id, a.c_id,
                       list_sum(list_transform(generate_series(1, 64),
                         i -> p.q_emb[i] * CAST(a.c_emb[i] AS DOUBLE))) AS cos
                FROM probes p JOIN assigned a ON p.cell = a.cell)
              SELECT q_id, c_id, round(cos, 6) + 0.0 AS score, rn FROM (
                SELECT q_id, c_id, cos,
                       CAST(row_number() OVER (PARTITION BY q_id
                         ORDER BY cos DESC, c_id) AS INTEGER) AS rn
                FROM cand)
              WHERE rn <= 5 ORDER BY q_id, rn""")),

    // Recall@5 of the cross-modal IVF probe vs the brute-force exact
    // top-5 on the SAME derived thumbnail vectors (r14 — sim_ann_recall's
    // move repeated for multimodal_retrieval): the measurement itself is
    // an oracled query, so the quality claim for the cross-modal path is
    // differentially tested, not asserted. One aggregation computes k and
    // n_hit together (exact left-joined to the probe with a hit flag).
    // Measured: mean recall@5 ≈ 0.41 at nprobe=2/5 cells on sf0.1 — the
    // honest cost of probing with OUT-OF-DISTRIBUTION query vectors
    // (thumbnails vs embedding-trained centroids); the production lever is
    // nprobe (recall → 1 as probes → all cells), and this op is exactly
    // the dial-setting measurement a pipeline runs before choosing it.
    Op("multimodal_retrieval_recall",
      (s, d) => {
        thrivespark.functions.Register(s)
        val q = thumbQueries(s, d)
        val emb = T.embeddings(s, d)
        val c = emb.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
        val exact = broadcast(q).join(c)
          .withColumn("cos", dot(col("q_emb"), col("c_emb")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("q_id"), col("c_id"))
        val approx = probeTopK(q, ivfCentroids(emb), ivfAssign(emb),
            k = 5, nprobe = 2, excludeSelf = false)
          .select(col("q_id"), col("c_id"))
        exact.join(approx.withColumn("hit", lit(1)), Seq("q_id", "c_id"), "left")
          .groupBy(col("q_id"))
          .agg(count(lit(1)).cast("int").as("k"),
            sum(coalesce(col("hit"), lit(0))).cast("int").as("n_hit"))
          .select(col("q_id"), col("k"), col("n_hit"),
            (col("n_hit").cast("long") * lit(1000000L)
              / col("k").cast("long")).cast("long").as("recall_micros"))
          .orderBy(col("q_id"))
      },
      Some(s"""WITH m AS (
                SELECT doc_id AS media_id,
                       8 + (doc_id % 9) AS w,
                       8 + (doc_id % 7) AS h
                FROM documents WHERE doc_id % 25 = 0),
              px AS (
                SELECT m.media_id, m.w, m.h, x.x AS x, y.y AS y,
                       (3 * m.media_id + x.x + 2 * y.y) % 256      AS r,
                       (3 * m.media_id + x.x + 2 * y.y + 37) % 256 AS g,
                       (3 * m.media_id + x.x + 2 * y.y + 74) % 256 AS b
                FROM m
                JOIN generate_series(0, 15) AS x(x) ON x.x < m.w
                JOIN generate_series(0, 13) AS y(y) ON y.y < m.h),
              cells AS (
                SELECT media_id,
                       ((y * 8) // h) * 8 + (x * 8) // w AS idx,
                       SUM(r + g + b) // (3 * COUNT(*)) AS mv
                FROM px GROUP BY 1, 2),
              q AS (
                SELECT media_id AS q_id,
                       list(CAST(mv AS DOUBLE) ORDER BY idx) AS q_emb
                FROM cells GROUP BY 1),
              exact AS (
                SELECT q_id, c_id FROM (
                  SELECT q.q_id, e.vec_id AS c_id,
                         row_number() OVER (PARTITION BY q.q_id
                           ORDER BY list_sum(list_transform(generate_series(1, 64),
                             i -> q.q_emb[i] * CAST(e.embedding[i] AS DOUBLE))) DESC,
                           e.vec_id) AS rn
                  FROM q CROSS JOIN embeddings e)
                WHERE rn <= 5),
              cent AS (
                SELECT vec_id AS cent_id, embedding AS cent_emb
                FROM embeddings WHERE $IvfSeedSql),
              a1 AS (
                SELECT e.vec_id AS c_id, e.embedding AS c_emb, c.cent_id,
                       row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY list_sum(list_transform(generate_series(1, 64),
                           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cent_emb[i] AS DOUBLE))) DESC,
                         c.cent_id) AS arn
                FROM embeddings e CROSS JOIN cent c),
              assigned AS (SELECT c_id, c_emb, cent_id AS cell FROM a1 WHERE arn = 1),
              p1 AS (
                SELECT q.q_id, q.q_emb, c.cent_id AS cell,
                       row_number() OVER (PARTITION BY q.q_id
                         ORDER BY list_sum(list_transform(generate_series(1, 64),
                           i -> q.q_emb[i] * CAST(c.cent_emb[i] AS DOUBLE))) DESC,
                         c.cent_id) AS crn
                FROM q CROSS JOIN cent c),
              probes AS (SELECT q_id, q_emb, cell FROM p1 WHERE crn <= 2),
              approx AS (
                SELECT q_id, c_id FROM (
                  SELECT p.q_id, a.c_id,
                         row_number() OVER (PARTITION BY p.q_id
                           ORDER BY list_sum(list_transform(generate_series(1, 64),
                             i -> p.q_emb[i] * CAST(a.c_emb[i] AS DOUBLE))) DESC,
                           a.c_id) AS rn
                  FROM probes p JOIN assigned a ON p.cell = a.cell)
                WHERE rn <= 5)
              SELECT e.q_id, CAST(count(*) AS INTEGER) AS k,
                     CAST(count(ap.c_id) AS INTEGER) AS n_hit,
                     CAST(count(ap.c_id) * 1000000 / count(*) AS BIGINT)
                       AS recall_micros
              FROM exact e LEFT JOIN approx ap
                ON e.q_id = ap.q_id AND e.c_id = ap.c_id
              GROUP BY e.q_id ORDER BY e.q_id""")),

    // The same cross-modal recall readout with the TRAINED codebook (r16 —
    // the measurement the k-means trainer exists to move): centroids are
    // kmeansTrain's final iterate instead of the seeded vec_id % 100 sample,
    // corpus assignment runs in exact micro space (ivfAssignMicro) and
    // probes rank cells by thumbnail·micro-centroid dot (uniform 1e6 scale
    // cancels in ranking; products are exact integers in double, see
    // microArr). The oracle RE-TRAINS the codebook via the generated CTE
    // chain and replays assignment + probe + recall on top of its kc<final>
    // — one SQL statement differentially testing trainer AND consumer.
    // Side-by-side with multimodal_retrieval_recall this is the
    // trained-vs-seeded A/B a production pipeline would run before
    // swapping codebooks. MEASURED (sf0.1, nprobe=2/20 cells): trained
    // 0.393 vs seeded 0.415 recall@5 — on this near-random synthetic
    // corpus 3 Lloyd iterations do NOT move out-of-distribution recall
    // (no cluster structure to find); what training DOES buy, measured on
    // the same corpus, is cell-occupancy balance (σ 10.3 → 7.4, max
    // 122 → 117 members), i.e. bounded per-cell scan cost at 100 TB.
    // The recall lever on unstructured data remains nprobe
    // (sim_ann_recall_curve measures that dial).
    Op("multimodal_retrieval_recall_trained",
      (s, d) => {
        thrivespark.functions.Register(s)
        val q = thumbQueries(s, d)
        val emb = T.embeddings(s, d)
        val cent = trainedCentroids(s, d)
        val c = emb.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
        val exact = broadcast(q).join(c)
          .withColumn("cos", dot(col("q_emb"), col("c_emb")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("q_id"), col("c_id"))
        val approx = probeTopK(q, cent, ivfAssignMicro(emb, cent),
            k = 5, nprobe = 2, excludeSelf = false)
          .select(col("q_id"), col("c_id"))
        exact.join(approx.withColumn("hit", lit(1)), Seq("q_id", "c_id"), "left")
          .groupBy(col("q_id"))
          .agg(count(lit(1)).cast("int").as("k"),
            sum(coalesce(col("hit"), lit(0))).cast("int").as("n_hit"))
          .select(col("q_id"), col("k"), col("n_hit"),
            (col("n_hit").cast("long") * lit(1000000L)
              / col("k").cast("long")).cast("long").as("recall_micros"))
          .orderBy(col("q_id"))
      },
      Some(kmeansOracleStages(KmeansIters) + s""",
              m AS (
                SELECT doc_id AS media_id,
                       8 + (doc_id % 9) AS w,
                       8 + (doc_id % 7) AS h
                FROM documents WHERE doc_id % 25 = 0),
              px AS (
                SELECT m.media_id, m.w, m.h, x.x AS x, y.y AS y,
                       (3 * m.media_id + x.x + 2 * y.y) % 256      AS r,
                       (3 * m.media_id + x.x + 2 * y.y + 37) % 256 AS g,
                       (3 * m.media_id + x.x + 2 * y.y + 74) % 256 AS b
                FROM m
                JOIN generate_series(0, 15) AS x(x) ON x.x < m.w
                JOIN generate_series(0, 13) AS y(y) ON y.y < m.h),
              cells AS (
                SELECT media_id,
                       ((y * 8) // h) * 8 + (x * 8) // w AS idx,
                       SUM(r + g + b) // (3 * COUNT(*)) AS mv
                FROM px GROUP BY 1, 2),
              q AS (
                SELECT media_id AS q_id,
                       list(CAST(mv AS DOUBLE) ORDER BY idx) AS q_emb
                FROM cells GROUP BY 1),
              exact AS (
                SELECT q_id, c_id FROM (
                  SELECT q.q_id, e.vec_id AS c_id,
                         row_number() OVER (PARTITION BY q.q_id
                           ORDER BY list_sum(list_transform(generate_series(1, 64),
                             i -> q.q_emb[i] * CAST(e.embedding[i] AS DOUBLE))) DESC,
                           e.vec_id) AS rn
                  FROM q CROSS JOIN embeddings e)
                WHERE rn <= 5),
              cent AS (SELECT cent_id, cm FROM kc$KmeansIters),
              a1 AS (
                SELECT v.vec_id AS c_id, c.cent_id,
                       row_number() OVER (PARTITION BY v.vec_id
                         ORDER BY list_sum(list_transform(generate_series(1, 64),
                           i -> v.m[i] * c.cm[i])) DESC, c.cent_id) AS arn
                FROM kmm v CROSS JOIN cent c),
              assigned AS (
                SELECT a.c_id, e.embedding AS c_emb, a.cent_id AS cell
                FROM a1 a JOIN embeddings e ON e.vec_id = a.c_id
                WHERE a.arn = 1),
              p1 AS (
                SELECT q.q_id, q.q_emb, c.cent_id AS cell,
                       row_number() OVER (PARTITION BY q.q_id
                         ORDER BY list_sum(list_transform(generate_series(1, 64),
                           i -> q.q_emb[i] * CAST(c.cm[i] AS DOUBLE))) DESC,
                         c.cent_id) AS crn
                FROM q CROSS JOIN cent c),
              probes AS (SELECT q_id, q_emb, cell FROM p1 WHERE crn <= 2),
              approx AS (
                SELECT q_id, c_id FROM (
                  SELECT p.q_id, a.c_id,
                         row_number() OVER (PARTITION BY p.q_id
                           ORDER BY list_sum(list_transform(generate_series(1, 64),
                             i -> p.q_emb[i] * CAST(a.c_emb[i] AS DOUBLE))) DESC,
                           a.c_id) AS rn
                  FROM probes p JOIN assigned a ON p.cell = a.cell)
                WHERE rn <= 5)
              SELECT e.q_id, CAST(count(*) AS INTEGER) AS k,
                     CAST(count(ap.c_id) AS INTEGER) AS n_hit,
                     CAST(count(ap.c_id) * 1000000 / count(*) AS BIGINT)
                       AS recall_micros
              FROM exact e LEFT JOIN approx ap
                ON e.q_id = ap.q_id AND e.c_id = ap.c_id
              GROUP BY e.q_id ORDER BY e.q_id""")),

    Op("multimodal_manifest",
      (s, d) => {
        val mm = thrivespark.multimodal.Multimodal
        val media = mm.mediaTrimodalFromDocuments(T.documents(s, d))
        mm.extractTrimodalManifest(media, everyNth = 3)
          .orderBy(col("media_id"))
      },
      Some("""WITH m AS (
                SELECT doc_id AS media_id, lang,
                       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
                       8 + (doc_id % 9) AS iw, 8 + (doc_id % 7) AS ih,
                       256 + (doc_id % 41) * 4 AS an,
                       8 + (doc_id % 5) * 2 AS vw, 8 + (doc_id % 3) * 2 AS vh,
                       6 + (doc_id % 9) AS vn
                FROM documents
              ), ipx AS (
                SELECT m.media_id, m.iw, m.ih, x.x AS x, y.y AS y,
                       (3 * m.media_id + x.x + 2 * y.y) % 256 AS r,
                       (3 * m.media_id + x.x + 2 * y.y) % 256
                       + (3 * m.media_id + x.x + 2 * y.y + 37) % 256
                       + (3 * m.media_id + x.x + 2 * y.y + 74) % 256 AS gray3
                FROM m
                JOIN generate_series(0, 15) AS x(x) ON x.x < m.iw
                JOIN generate_series(0, 13) AS y(y) ON y.y < m.ih
              ), isum AS (
                SELECT media_id, iw, ih, SUM(r) AS rsum
                FROM ipx GROUP BY 1, 2, 3
              ), icell AS (
                SELECT media_id, (x * 8) // iw AS ci, (y * 8) // ih AS cj,
                       SUM(gray3) AS gs, COUNT(*) AS nb
                FROM ipx GROUP BY 1, 2, 3
              ), ithumb AS (
                SELECT media_id, SUM(gs // (3 * nb)) AS tsum
                FROM icell GROUP BY 1
              ), aud AS (
                SELECT m.media_id, m.an,
                       SUM((7 * m.media_id + 11 * i.i) % 4001) AS asum,
                       MAX((7 * m.media_id + 11 * i.i) % 4001) AS apeak
                FROM m
                JOIN generate_series(0, 415) AS i(i) ON i.i < m.an
                GROUP BY 1, 2
              ), vid AS (
                SELECT m.media_id, m.vw, m.vh, m.vn, COUNT(*) AS vnpx,
                       SUM((5 * m.media_id + 13 * f.f + x.x + 3 * y.y) % 256) AS vsum,
                       MAX((5 * m.media_id + 13 * f.f + x.x + 3 * y.y) % 256) AS vpeak
                FROM m
                JOIN generate_series(0, 13) AS f(f) ON f.f < m.vn AND f.f % 3 = 0
                JOIN generate_series(0, 15) AS x(x) ON x.x < m.vw
                JOIN generate_series(0, 11) AS y(y) ON y.y < m.vh
                GROUP BY 1, 2, 3, 4
              )
              SELECT m.media_id, m.lang, m.n_tokens,
                     CAST(m.iw AS INTEGER) AS img_width,
                     CAST(m.ih AS INTEGER) AS img_height,
                     CAST(s.rsum * 1000000 // (m.iw * m.ih) AS BIGINT) AS img_r_mean_micros,
                     CAST(t.tsum AS BIGINT) AS img_thumb_checksum,
                     CAST(m.an AS INTEGER) AS aud_n_samples,
                     CAST(a.asum * 1000000 // m.an AS BIGINT) AS aud_mean_micros,
                     CAST(a.apeak AS INTEGER) AS aud_peak,
                     CAST(m.vn AS INTEGER) AS vid_n_frames,
                     CAST((m.vn + 2) // 3 AS INTEGER) AS vid_n_sampled,
                     CAST(v.vsum * 1000000 // v.vnpx AS BIGINT) AS vid_mean_micros,
                     CAST(v.vpeak AS INTEGER) AS vid_peak
              FROM m
              JOIN isum s ON s.media_id = m.media_id
              JOIN ithumb t ON t.media_id = m.media_id
              JOIN aud a ON a.media_id = m.media_id
              JOIN vid v ON v.media_id = m.media_id
              ORDER BY m.media_id""")),

    // The decode stage under Structured Streaming: media staged as 4 files
    // replays as 4 micro-batches (maxFilesPerTrigger=1), each decoded by
    // the SAME stateless map-only stage as the batch path and appended to a
    // parquet sink via Trigger.AvailableNow + checkpoint — the scheduled
    // media-ingest shape (decode only what arrived since the last run; the
    // bookmark contract applied to payload columns). Stateless +
    // deterministic ⇒ sink ≡ one-shot batch decode regardless of batch
    // boundaries, so the streaming execution gets the batch oracle.
    Op("multimodal_stream_decode",
      (s, d) => {
        val mm = thrivespark.multimodal.Multimodal
        val base = thrivespark.Scratch.dir("mmdec")
        val stage = s"$base/stage"
        mm.mediaPpmFromDocuments(T.documents(s, d))
          .repartition(4)
          .write.mode("overwrite").parquet(stage)
        thrivespark.streaming.StreamRunner.decodeMediaAvailableNow(
            s, stage, s"$base/out", s"$base/cp",
            "q_mmdec_" + new java.io.File(d).getName)
          .select(col("media_id"), col("width"), col("height"),
            col("n_pixel_bytes"), col("r_mean_micros"), col("g_mean_micros"),
            col("b_mean_micros"), octet_length(col("thumb")).as("thumb_bytes"),
            col("thumb_checksum"))
          .orderBy(col("media_id"))
      },
      Some("""WITH m AS (
                SELECT doc_id AS media_id,
                       8 + (doc_id % 9) AS w,
                       8 + (doc_id % 7) AS h
                FROM documents
              ), px AS (
                SELECT m.media_id, m.w, m.h, x.x AS x, y.y AS y,
                       (3 * m.media_id + x.x + 2 * y.y) % 256        AS r,
                       (3 * m.media_id + x.x + 2 * y.y + 37) % 256   AS g,
                       (3 * m.media_id + x.x + 2 * y.y + 74) % 256   AS b
                FROM m
                JOIN generate_series(0, 15) AS x(x) ON x.x < m.w
                JOIN generate_series(0, 13) AS y(y) ON y.y < m.h
              ), sums AS (
                SELECT media_id, w, h,
                       SUM(r) AS rsum, SUM(g) AS gsum, SUM(b) AS bsum
                FROM px GROUP BY 1, 2, 3
              ), cells AS (
                SELECT media_id, (x * 8) // w AS ci, (y * 8) // h AS cj,
                       SUM(r + g + b) AS gs, COUNT(*) AS nb
                FROM px GROUP BY 1, 2, 3
              ), thumb AS (
                SELECT media_id, SUM(gs // (3 * nb)) AS tsum
                FROM cells GROUP BY 1
              )
              SELECT s.media_id,
                     CAST(w AS INTEGER) AS width,
                     CAST(h AS INTEGER) AS height,
                     CAST(w * h * 3 AS INTEGER) AS n_pixel_bytes,
                     CAST(rsum * 1000000 // (w * h) AS BIGINT) AS r_mean_micros,
                     CAST(gsum * 1000000 // (w * h) AS BIGINT) AS g_mean_micros,
                     CAST(bsum * 1000000 // (w * h) AS BIGINT) AS b_mean_micros,
                     CAST(64 AS INTEGER) AS thumb_bytes,
                     CAST(t.tsum AS BIGINT) AS thumb_checksum
              FROM sums s JOIN thumb t ON s.media_id = t.media_id
              ORDER BY s.media_id""")),

    // Fault-TOLERANT decode with row-level quarantine: at 100 TB corrupt
    // blobs are a certainty, and the strict decoders' throw would retry the
    // whole partition 4 times then kill the job. This op decodes a corpus
    // with deterministically planted corruption (id%7==3 truncated
    // mid-raster, id%7==5 magic clobbered — closed-form, so the oracle
    // knows exactly which rows quarantine with which code) through the safe
    // mapPartitions stage: good rows emit features, bad rows emit a stable
    // err_code, nothing kills the stage. The dq_validate_reject pattern
    // applied to media columns; still zero shuffles.
    Op("multimodal_quarantine",
      (s, d) => {
        val mm = thrivespark.multimodal.Multimodal
        val media = mm.mediaCorruptPpmFromDocuments(T.documents(s, d))
        mm.extractPpmFeaturesQuarantine(media)
          .orderBy(col("media_id"))
      },
      Some("""WITH m AS (
                SELECT doc_id AS media_id,
                       8 + (doc_id % 9) AS w, 8 + (doc_id % 7) AS h,
                       doc_id % 7 AS r7
                FROM documents
              ), px AS (
                SELECT m.media_id, m.w, m.h,
                       SUM((3 * m.media_id + x.x + 2 * y.y) % 256) AS rsum
                FROM m
                JOIN generate_series(0, 15) AS x(x) ON x.x < m.w
                JOIN generate_series(0, 13) AS y(y) ON y.y < m.h
                WHERE m.r7 NOT IN (3, 5)
                GROUP BY 1, 2, 3
              )
              SELECT m.media_id,
                     CASE WHEN m.r7 IN (3, 5) THEN 'quarantined' ELSE 'ok' END AS status,
                     CASE WHEN m.r7 IN (3, 5) THEN NULL
                          ELSE CAST(m.w AS INTEGER) END AS width,
                     CASE WHEN m.r7 IN (3, 5) THEN NULL
                          ELSE CAST(m.h AS INTEGER) END AS height,
                     CASE WHEN m.r7 IN (3, 5) THEN NULL
                          ELSE CAST(p.rsum * 1000000 // (m.w * m.h) AS BIGINT)
                          END AS r_mean_micros,
                     CASE WHEN m.r7 = 3 THEN 'truncated'
                          WHEN m.r7 = 5 THEN 'bad_magic'
                          ELSE NULL END AS err_code
              FROM m LEFT JOIN px p ON p.media_id = m.media_id
              ORDER BY m.media_id""")),

    // Symmetric int8 embedding quantization (r12): the storage/bandwidth
    // move a 100 TB embedding table pays FIRST — per-vector scale =
    // max|x|/127 (epsilon-guarded), q_i = round(x_i/scale) ∈ [-127,127],
    // 4× smaller than float32 and ADC-compatible with the PQ scorer. Pure
    // map-only per-row array math (zero shuffles before the presentation
    // sort), and every emitted stat is either exact integer arithmetic or
    // one IEEE op mirrored by the oracle: scale/err are floored to micros,
    // round() is half-away-from-zero in BOTH engines, and the max
    // reconstruction error must stay ≤ scale/2 by construction (asserted
    // per row in DedupSimilaritySpec).
    Op("sim_embed_quantize",
      (s, d) => {
        val xd = (x: Column) => x.cast("double")
        val scale = greatest(
          array_max(transform(col("embedding"), x => abs(xd(x)))), lit(1e-12)) / 127.0
        T.embeddings(s, d).select(col("vec_id"), col("embedding"))
          .withColumn("scale", scale)
          .withColumn("q", transform(col("embedding"),
            x => round(xd(x) / col("scale")).cast("int")))
          .withColumn("err", array_max(zip_with(col("embedding"), col("q"),
            (x, qq) => abs(xd(x) - xd(qq) * col("scale")))))
          .select(col("vec_id"), size(col("embedding")).as("n_dims"),
            floor(col("scale") * 1000000).cast("long").as("scale_micros"),
            aggregate(col("q"), lit(0L), (acc, v) => acc + v).as("q_sum"),
            array_min(col("q")).as("q_min"), array_max(col("q")).as("q_max"),
            floor(col("err") * 1000000).cast("long").as("err_micros"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH b AS (
                SELECT vec_id, embedding,
                       greatest(list_max(list_transform(embedding,
                         x -> abs(CAST(x AS DOUBLE)))), 1e-12) / 127.0 AS scale
                FROM embeddings),
              q AS (
                SELECT vec_id, embedding, scale,
                       list_transform(embedding,
                         x -> CAST(round(CAST(x AS DOUBLE) / scale) AS INTEGER)) AS qv
                FROM b)
              SELECT vec_id, CAST(len(embedding) AS INTEGER) AS n_dims,
                     CAST(floor(scale * 1000000) AS BIGINT) AS scale_micros,
                     CAST(list_sum(qv) AS BIGINT) AS q_sum,
                     list_min(qv) AS q_min, list_max(qv) AS q_max,
                     CAST(floor(list_max(list_transform(
                            generate_series(1, len(embedding)),
                            i -> abs(CAST(embedding[i] AS DOUBLE)
                                     - qv[i] * scale))) * 1000000)
                          AS BIGINT) AS err_micros
              FROM q ORDER BY vec_id""")),

    // The multimodal counterpart of pipeline_corpus_e2e: decode ONCE (the
    // fused trimodal manifest persisted MEMORY_AND_DISK as the stage
    // boundary — five audit consumers), gate on DECODED features (image
    // exposure band, audio clip ceiling, video luma band, text length —
    // each a map-side predicate over the persisted manifest, the media QC
    // filters a trimodal training corpus runs), then the content-addressed
    // md5 90/5/5 split at media grain. The audit emits one row per
    // cumulative gate stage plus one per split — conservation is checkable
    // down the rows (each stage ⊆ the previous; splits partition the
    // final gate, asserted in PipelineSpec). At 100 TB: one decode pass,
    // zero-shuffle gates, 1-row audit aggregations; the only data-sized
    // exchange is the persist write. Thresholds from the sf0.01 feature
    // distribution (each gate drops 20–25%); all integer comparisons, so
    // the DuckDB oracle recomputes every stage from the closed-form pixel/
    // sample/luma functions.
    Op("pipeline_multimodal_e2e",
      (s, d) => {
        val man = trimodalManifestCached(s, d)
        val gImg = col("img_r_mean_micros") >= 60000000L
        val gAud = col("aud_peak") <= 3996
        val gVid = col("vid_mean_micros") >= 90000000L
        val gTxt = col("n_tokens") >= 15
        def stage(name: String, f: org.apache.spark.sql.DataFrame) =
          f.agg(count(lit(1)).as("n"), sum(col("n_tokens")).as("tokens"))
            .select(lit(name).as("stage"), col("n"), col("tokens"))
        val surv = man.filter(gImg && gAud && gVid && gTxt)
        val splits = surv
          .withColumn("b", conv(substring(md5(col("media_id").cast("string")), 1, 4), 16, 10)
            .cast("long") % 100)
          .withColumn("stage",
            when(col("b") < 90, "5_train").when(col("b") < 95, "6_val")
              .otherwise("7_test"))
          .groupBy(col("stage"))
          .agg(count(lit(1)).as("n"), sum(col("n_tokens")).as("tokens"))
          .select(col("stage"), col("n"), col("tokens"))
        stage("0_decoded", man)
          .unionAll(stage("1_img_gate", man.filter(gImg)))
          .unionAll(stage("2_aud_gate", man.filter(gImg && gAud)))
          .unionAll(stage("3_vid_gate", man.filter(gImg && gAud && gVid)))
          .unionAll(stage("4_txt_gate", surv))
          .unionAll(splits)
          .orderBy(col("stage"))
      },
      Some("""WITH m AS (
                SELECT doc_id AS media_id,
                       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
                       8 + (doc_id % 9) AS iw, 8 + (doc_id % 7) AS ih,
                       256 + (doc_id % 41) * 4 AS an,
                       8 + (doc_id % 5) * 2 AS vw, 8 + (doc_id % 3) * 2 AS vh,
                       6 + (doc_id % 9) AS vn
                FROM documents
              ), img AS (
                SELECT m.media_id,
                       SUM((3 * m.media_id + x.x + 2 * y.y) % 256)
                         * 1000000 // (m.iw * m.ih) AS img_mean
                FROM m
                JOIN generate_series(0, 15) AS x(x) ON x.x < m.iw
                JOIN generate_series(0, 13) AS y(y) ON y.y < m.ih
                GROUP BY m.media_id, m.iw, m.ih
              ), aud AS (
                SELECT m.media_id, MAX((7 * m.media_id + 11 * i.i) % 4001) AS aud_peak
                FROM m JOIN generate_series(0, 415) AS i(i) ON i.i < m.an
                GROUP BY 1
              ), vid AS (
                SELECT m.media_id,
                       SUM((5 * m.media_id + 13 * f.f + x.x + 3 * y.y) % 256)
                         * 1000000 // COUNT(*) AS vid_mean
                FROM m
                JOIN generate_series(0, 13) AS f(f) ON f.f < m.vn AND f.f % 3 = 0
                JOIN generate_series(0, 15) AS x(x) ON x.x < m.vw
                JOIN generate_series(0, 11) AS y(y) ON y.y < m.vh
                GROUP BY m.media_id
              ), man AS (
                SELECT m.media_id, m.n_tokens, i.img_mean, a.aud_peak, v.vid_mean
                FROM m
                JOIN img i ON i.media_id = m.media_id
                JOIN aud a ON a.media_id = m.media_id
                JOIN vid v ON v.media_id = m.media_id
              ), surv AS (
                SELECT * FROM man
                WHERE img_mean >= 60000000 AND aud_peak <= 3996
                  AND vid_mean >= 90000000 AND n_tokens >= 15)
              SELECT '0_decoded' AS stage, count(*) AS n,
                     CAST(sum(n_tokens) AS BIGINT) AS tokens FROM man
              UNION ALL
              SELECT '1_img_gate', count(*), CAST(sum(n_tokens) AS BIGINT)
              FROM man WHERE img_mean >= 60000000
              UNION ALL
              SELECT '2_aud_gate', count(*), CAST(sum(n_tokens) AS BIGINT)
              FROM man WHERE img_mean >= 60000000 AND aud_peak <= 3996
              UNION ALL
              SELECT '3_vid_gate', count(*), CAST(sum(n_tokens) AS BIGINT)
              FROM man WHERE img_mean >= 60000000 AND aud_peak <= 3996
                          AND vid_mean >= 90000000
              UNION ALL
              SELECT '4_txt_gate', count(*), CAST(sum(n_tokens) AS BIGINT)
              FROM surv
              UNION ALL
              SELECT CASE WHEN b < 90 THEN '5_train'
                          WHEN b < 95 THEN '6_val' ELSE '7_test' END,
                     count(*), CAST(sum(n_tokens) AS BIGINT)
              FROM (SELECT n_tokens,
                      CAST(concat('0x', substring(md5(CAST(media_id AS VARCHAR)), 1, 4)) AS UBIGINT) % 100 AS b
                    FROM surv)
              GROUP BY 1
              ORDER BY stage""")),
  )
}
