package thrivespark.ops

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the maintenance step every incremental
  * micro-batch sink eventually needs (the reference's Camus folders had the
  * same pathology [K]): rewrite a parquet dataset into ⌈bytes/target⌉
  * files, then atomically swap directories. For Hive-style partitioned
  * layouts pass `partitionBy` — the rewrite then repartitions BY the
  * partition columns and writes with partitionBy, so the dt=... directory
  * structure (and therefore partition pruning) survives compaction; a
  * plain read→write would silently flatten it to unpartitioned files.
  *
  * At cluster scale the swap is a metastore location flip or a manifest
  * commit; the local implementation uses directory renames with the same
  * write-then-swap ordering (readers never observe a half-written set). */
object Compaction {

  final case class Report(filesBefore: Int, filesAfter: Int, rows: Long)

  private def parquetFiles(dir: Path): Seq[Path] =
    Files.walk(dir).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .toSeq

  def compact(spark: SparkSession, dir: String,
      targetBytesPerFile: Long = 128L * 1024 * 1024,
      partitionBy: Seq[String] = Nil): Report = {
    val root = Paths.get(dir)
    val before = parquetFiles(root)
    val totalBytes = before.map(Files.size).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytesPerFile).toInt)

    val df = spark.read.parquet(dir)
    val rows = df.count()
    val tmp = dir.stripSuffix("/") + ".compact_tmp"
    if (partitionBy.nonEmpty)
      // one write task per partition value → one compacted file per dt= dir
      df.repartition(partitionBy.map(org.apache.spark.sql.functions.col): _*)
        .write.mode("overwrite").partitionBy(partitionBy: _*).parquet(tmp)
    else
      df.repartition(nFiles).write.mode("overwrite").parquet(tmp)

    val old = dir.stripSuffix("/") + ".compact_old"
    Files.move(root, Paths.get(old), StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), root, StandardCopyOption.ATOMIC_MOVE)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(old))

    Report(before.size, parquetFiles(root).size, rows)
  }
}
