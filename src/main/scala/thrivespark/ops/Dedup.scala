package thrivespark.ops

import org.apache.spark.sql.functions._
import thrivespark.{Op, Tables => T}

/** SURVEY.md §2.9 dedup (#50, #51).
  *
  * dedup_near_minhash is the 100 TB-shaped pipeline:
  *   shingle → 32-perm minhash → LSH banding (16 bands × 2 rows) →
  *   candidate pairs by band-bucket equi-join → EXACT Jaccard verification.
  * The sketch only prunes candidates; the emitted result is exact (rule R5),
  * so the DuckDB oracle is the brute-force exact-Jaccard join. Banding keeps
  * cluster cost O(candidates) instead of O(n²): the only shuffles are the
  * band-bucket groupBy and the two shingle-set lookups.
  * Recall: P[candidate | J] = 1-(1-J²)^16 ≥ 0.9998 at J = 0.6.
  */
object Dedup {
  private val NumHashes = 32
  private val Bands = 16
  private val RowsPerBand = NumHashes / Bands

  val ops: Seq[Op] = Seq(
    Op("dedup_exact",
      (s, d) => T.documents(s, d)
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
        .select(col("keep_id"), col("n_dups"))
        .orderBy(col("keep_id")),
      Some("""SELECT min(doc_id) AS keep_id, count(*) AS n_dups
              FROM documents GROUP BY md5(text) ORDER BY keep_id""")),

    Op("dedup_near_minhash",
      (s, d) => {
        val docs = T.documents(s, d)
          .select(col("doc_id"), Shingles.shingles3(col("text")).as("sh"))
        // 32 minhash values: h_j = min over shingles of xxhash64(j, shingle)
        val sig = docs.select(col("doc_id"), col("sh"),
          array((0 until NumHashes).map(j =>
            array_min(transform(col("sh"), x => xxhash64(lit(j), x)))): _*).as("sig"))
        // LSH banding: emit (band, band-signature) keys; equal keys → candidates
        val banded = sig.select(col("doc_id"),
          explode(array((0 until Bands).map(b => struct(
            lit(b).as("band"),
            slice(col("sig"), b * RowsPerBand + 1, RowsPerBand).as("bsig"))): _*)).as("bs"))
          .select(col("doc_id"), col("bs.band").as("band"), col("bs.bsig").as("bsig"))
        val cands = banded.as("x").join(banded.as("y"),
            col("x.band") === col("y.band") &&
            col("x.bsig") === col("y.bsig") &&
            col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
          .distinct()
        // exact verification (R5): Jaccard over distinct shingle sets
        val sa = docs.select(col("doc_id").as("a_id"), col("sh").as("sh_a"))
        val sb = docs.select(col("doc_id").as("b_id"), col("sh").as("sh_b"))
        cands.join(sa, "a_id").join(sb, "b_id")
          .withColumn("jac",
            size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))))
          .filter(col("jac") > 0.6)
          .select(col("a_id"), col("b_id"))
          .orderBy(col("a_id"), col("b_id"))
      },
      Some(s"""WITH s AS (
                SELECT doc_id, ${Shingles.duckShingles3FromT} AS sh
                FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))
              SELECT a.doc_id AS a_id, b.doc_id AS b_id
              FROM s a JOIN s b ON a.doc_id < b.doc_id
              WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                    / len(list_distinct(list_concat(a.sh, b.sh))) > 0.6
              ORDER BY a_id, b_id""")),
  )
}
