package thrivespark.ops

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the maintenance step every incremental
  * micro-batch sink eventually needs (the reference's Camus folders had the
  * same pathology [K]): rewrite a parquet dataset into ⌈bytes/target⌉
  * files, then swap directories. For Hive-style partitioned layouts pass
  * `partitionBy` — the rewrite then repartitions BY the partition columns
  * and writes with partitionBy, so the dt=... directory structure (and
  * therefore partition pruning) survives compaction; a plain read→write
  * would silently flatten it to unpartitioned files. In the partitioned
  * path `targetBytesPerFile` still holds: a hot partition larger than the
  * target is split via maxRecordsPerFile (records-per-target estimated from
  * the dataset's observed bytes/row).
  *
  * At cluster scale the swap is a metastore location flip or a manifest
  * commit; the local implementation uses two directory renames with the
  * same write-then-swap ordering. Each rename is atomic, so readers see
  * either the old or the new file set — but locally there is an instant
  * between the renames where the path is absent; the metastore flip is what
  * removes that window in production. Stale .compact_tmp/.compact_old
  * leftovers from a crashed prior run are removed up front, so the swap is
  * re-entrant. */
object Compaction {

  final case class Report(filesBefore: Int, filesAfter: Int, rows: Long)

  private def parquetFiles(dir: Path): Seq[Path] =
    Files.walk(dir).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .toSeq

  private def deleteIfExists(dir: String): Unit = {
    val f = new java.io.File(dir)
    if (f.exists()) org.apache.commons.io.FileUtils.deleteDirectory(f)
  }

  def compact(spark: SparkSession, dir: String,
      targetBytesPerFile: Long = 128L * 1024 * 1024,
      partitionBy: Seq[String] = Nil): Report = {
    val root = Paths.get(dir)
    val tmp = dir.stripSuffix("/") + ".compact_tmp"
    val old = dir.stripSuffix("/") + ".compact_old"
    // crash-safety: a prior failed run may have left either temp dir behind
    deleteIfExists(tmp)
    deleteIfExists(old)
    val before = parquetFiles(root)
    val totalBytes = before.map(Files.size).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytesPerFile).toInt)

    val df = spark.read.parquet(dir)
    // metadata-only on parquet (row-group footers) — not a data pass
    val rows = df.count()
    if (partitionBy.nonEmpty) {
      // one write task per partition value → one file per dt= dir, except
      // partitions above the size target, which maxRecordsPerFile splits
      val bytesPerRow = math.max(1L, totalBytes / math.max(1L, rows))
      df.repartition(partitionBy.map(org.apache.spark.sql.functions.col): _*)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", math.max(1L, targetBytesPerFile / bytesPerRow))
        .partitionBy(partitionBy: _*).parquet(tmp)
    } else
      df.repartition(nFiles).write.mode("overwrite").parquet(tmp)

    Files.move(root, Paths.get(old), StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), root, StandardCopyOption.ATOMIC_MOVE)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(old))

    Report(before.size, parquetFiles(root).size, rows)
  }
}
