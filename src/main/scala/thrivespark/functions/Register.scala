package thrivespark.functions

import org.apache.spark.sql.SparkSession

/** Registers the engine's custom Catalyst expressions on a session so they
  * are usable via functions.call_function / SQL. Idempotent. */
object Register {
  def apply(s: SparkSession): Unit = {
    val reg = s.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      es => VecDot(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("known_dense",
      es => KnownDense(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("vec_dot_long",
      es => VecDotLong(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_signature",
      es => MinHashSignature(es.head, 32), "scala_udf")
    reg.createOrReplaceTempFunction("lsh_band_keys",
      es => LshBandKeys(es.head, 16, 2), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      es => SimHash64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("shingle_hashes",
      es => ShingleHashes(es.head, 3), "scala_udf")
  }
}
