package graft.store

import java.nio.file.{Files, Path, Paths}
import java.time.LocalDate
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-partitioned Parquet table layout + data lifecycle
  * (SURVEY.md §2.7 L1-L7): the Spark equivalent of the reference's
  * hypertable chunking, compression clustering, archival and retention.
  *
  *  - Layout: `event_date=YYYY-MM-DD/` partitions (≡ 1-day hypertable
  *    chunks, init.sql:74-77) → Catalyst partition pruning replaces
  *    TimescaleDB chunk exclusion.
  *  - Clustering: within each partition, rows are repartitioned by the
  *    device key and sorted by (key, ts desc) before write (≡ compression
  *    segmentby=device_id orderby=ts DESC, init.sql:80-91) — parquet
  *    row-group min/max stats then skip on both key and time.
  *  - Archive/retention/compaction are partition-level moves/drops —
  *    metadata-cheap at any scale, no row rewrites.
  */
object Lifecycle {

  /** Write a readings table in the clustered, date-partitioned layout
    * (L4). `keyCol` is the device/entity key, `tsCol` the event time.
    */
  def writeClustered(df: DataFrame, outDir: String, keyCol: String,
      tsCol: String, partitions: Int = 0): Unit = {
    val dated = df.withColumn("event_date", to_date(col(tsCol)))
    val np = if (partitions > 0) partitions
             else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    dated
      .repartition(np, col("event_date"), col(keyCol))
      .sortWithinPartitions(col("event_date"), col(keyCol), col(tsCol).desc)
      .write.mode("overwrite")
      .partitionBy("event_date")
      .parquet(outDir)
  }

  private def partitionDates(dir: String): Seq[(LocalDate, Path)] = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) return Seq.empty
    Files.list(root).iterator.asScala
      .filter(p => p.getFileName.toString.startsWith("event_date="))
      .map(p => (LocalDate.parse(p.getFileName.toString.stripPrefix("event_date=")), p))
      .toSeq
  }

  /** L1 archive_old_data: move partitions older than `cutoff` from the
    * main table to the archive — append to archive, then drop from main.
    * Returns the number of partitions moved. Pure partition surgery, no
    * row-level work.
    */
  def archiveOlderThan(spark: SparkSession, mainDir: String,
      archiveDir: String, cutoff: LocalDate): Int = {
    val old = partitionDates(mainDir).filter(_._1.isBefore(cutoff))
    if (old.nonEmpty) {
      spark.read
        .option("basePath", mainDir)
        .parquet(old.map(_._2.toString): _*)
        .write.mode("append").partitionBy("event_date").parquet(archiveDir)
      old.foreach { case (_, p) => deleteRecursively(p) }
    }
    old.size
  }

  /** L2/L3 retention: drop partitions older than cutoff. */
  def dropOlderThan(dir: String, cutoff: LocalDate): Int = {
    val old = partitionDates(dir).filter(_._1.isBefore(cutoff))
    old.foreach { case (_, p) => deleteRecursively(p) }
    old.size
  }

  /** L7 compaction (the VACUUM analog that matters in a file store):
    * rewrite each partition's small files into `filesPerPartition`
    * sorted files.
    */
  def compact(spark: SparkSession, dir: String, keyCol: String, tsCol: String,
      filesPerPartition: Int = 1): Unit = {
    val tmp = dir + "__compacting"
    spark.read.parquet(dir)
      .repartition(filesPerPartition, col("event_date"))
      .sortWithinPartitions(col(keyCol), col(tsCol).desc)
      .write.mode("overwrite").partitionBy("event_date").parquet(tmp)
    deleteRecursively(Paths.get(dir))
    Files.move(Paths.get(tmp), Paths.get(dir))
  }

  /** L9-ish introspection: per-partition file count + bytes. */
  def tableStats(dir: String): Seq[(String, Int, Long)] =
    partitionDates(dir).sortBy(_._1.toString).map { case (d, p) =>
      val files = Files.walk(p).iterator.asScala
        .filter(f => f.toString.endsWith(".parquet")).toSeq
      (d.toString, files.size, files.map(Files.size).sum)
    }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .iterator.asScala.foreach(Files.delete)
    }
  }
}
