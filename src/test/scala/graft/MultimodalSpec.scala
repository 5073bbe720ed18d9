package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import thrivespark.Tables
import thrivespark.multimodal.Multimodal

/** Multimodal binary-column plumbing: schema, distributed decode stage,
  * null passthrough. The codec itself is a documented stub. */
class MultimodalSpec extends AnyFunSuite {
  import SparkTestBase._

  test("extractFeatures adds an 8-dim feature vector per media row") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf0001))
    val out = Multimodal.extractFeatures(media)
    assert(out.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "payload", "width", "height", "duration_ms", "features"))
    val rows = out.select(col("media_id"), col("features")).limit(10).collect()
    rows.foreach { r =>
      assert(r.getSeq[Float](1).length == 8)
    }
    assert(out.count() == 500)
  }

  test("decode is deterministic and partition-count independent") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf0001))
    val a = Multimodal.extractFeatures(media.repartition(1))
      .select("media_id", "features").collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = Multimodal.extractFeatures(media.repartition(7))
      .select("media_id", "features").collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a == b)
  }

  test("resize + frame-sample stubs: shapes, determinism, null-safety") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf0001))
      .withColumn("thumb", Multimodal.resizeUdf(col("payload"), lit(8), lit(8)))
      .withColumn("frames", Multimodal.frameSampleUdf(col("payload"), lit(64), lit(2)))
    val r = media.select(col("media_id"), col("thumb"), col("frames")).limit(20).collect()
    r.foreach { row =>
      assert(row.getAs[Array[Byte]]("thumb").length == 64)
      assert(row.getSeq[Array[Byte]](2).nonEmpty)
    }
    // null payload → null outputs
    import spark.implicits._
    val n = Seq((1L, null.asInstanceOf[Array[Byte]])).toDF("media_id", "payload")
      .withColumn("thumb", Multimodal.resizeUdf(col("payload"), lit(8), lit(8)))
      .withColumn("frames", Multimodal.frameSampleUdf(col("payload"), lit(64), lit(2)))
      .collect()(0)
    assert(n.isNullAt(2) || n.getAs[Array[Byte]]("thumb") == null)
  }

  test("null payloads pass through with null features") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf0001))
      .withColumn("payload", when(col("media_id") % 2 === 0, col("payload")))
    val out = Multimodal.extractFeatures(media)
    val nulls = out.filter(col("payload").isNull)
    assert(nulls.count() > 0)
    assert(nulls.filter(col("features").isNotNull).count() == 0)
  }
}
