package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The exactly-once batch-commit discipline shared by every persisted
  * store's append sink (ANN PQ/IVF/IVFPQ, lexical) — the same
  * marker + rollback-by-file-prefix contract as the keyed event sink
  * (`streaming.Streams.commitBatch`), reduced to its index-store
  * shape:
  *
  *   1. a `_committed/batch-N` marker short-circuits a fully
  *      committed replay (at-least-once delivery re-runs batches);
  *   2. any files a crashed promote left under this batch's prefix
  *      are rolled back UNCONDITIONALLY whenever the marker is absent
  *      (idempotent — a first attempt finds nothing to delete);
  *   3. the batch's relations are staged, then their part-files
  *      promoted into the live dirs under the `batchN-` prefix (for a
  *      cell-partitioned sub-table the promote walks the `cell=X`
  *      level, so directory pruning sees a plain append's layout);
  *   4. the marker is written LAST; staging is dropped.
  *
  * Readers need no quiescence: they see none or all of a committed
  * batch, plus possibly a torn prefix the next replay removes.
  */
object BatchCommit {

  /** `subs` maps each sub-table name to whether its staged output is
    * `cell=`-partitioned; `stage(sub, stagingPath)` writes that
    * relation. A failed promote rename throws — silently dropping a
    * staged file would commit a hole under the marker.
    */
  def commit(spark: SparkSession, root: String, batchId: Long,
      subs: Seq[(String, Boolean)])(
      stage: (String, String) => Unit): Unit = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(s"$root/_committed/batch-$batchId")
    val staging0 = new Path(s"$root/_staging/batch-$batchId")
    if (fs.exists(marker)) {
      // crash window: marker written, staging cleanup lost — the
      // replay must reap it here or the dead copy leaks forever
      fs.delete(staging0, true)
      return
    }
    val prefix = s"batch$batchId-"
    def dataFiles(dir: Path) = fs.listStatus(dir).filter { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    subs.foreach { case (sub, partitioned) =>
      val dir = new Path(s"$root/$sub")
      if (fs.exists(dir)) {
        val roots = if (partitioned) fs.listStatus(dir).filter(_.isDirectory)
          .map(_.getPath).toSeq else Seq(dir)
        roots.foreach { d =>
          fs.listStatus(d).filter(_.getPath.getName.startsWith(prefix))
            .foreach { st =>
              // a silently-failed rollback delete would let the
              // re-staged promote commit duplicate rows under the
              // marker — fail loudly, like promote does for rename
              if (!fs.delete(st.getPath, false) && fs.exists(st.getPath))
                throw new java.io.IOException(
                  s"rollback failed to delete torn file: ${st.getPath}")
            }
        }
      }
    }
    val staging = staging0
    fs.delete(staging, true)
    def promote(src: Path, dest: Path): Unit = {
      fs.mkdirs(dest)
      dataFiles(src).foreach { st =>
        val to = new Path(dest, prefix + st.getPath.getName)
        if (!fs.rename(st.getPath, to))
          throw new java.io.IOException(s"promote failed: ${st.getPath} -> $to")
      }
    }
    // stage EVERYTHING first, then promote: later stages may derive
    // from earlier staged relations (vnorms reads the staged codes),
    // and batching the promotes narrows the torn window to the move
    // loop alone
    subs.foreach { case (sub, _) => stage(sub, s"$staging/$sub") }
    subs.foreach { case (sub, partitioned) =>
      val src = new Path(s"$staging/$sub")
      if (partitioned)
        dataFiles(src).filter(st => st.isDirectory &&
            st.getPath.getName.startsWith("cell=")).foreach { cellDir =>
          promote(cellDir.getPath,
            new Path(s"$root/$sub/${cellDir.getPath.getName}"))
        }
      else promote(src, new Path(s"$root/$sub"))
    }
    fs.mkdirs(marker.getParent)
    fs.create(marker, true).close()
    fs.delete(staging, true)
  }

  private val BatchPrefix = "^batch(\\d+)-".r

  /** Classify one sub-table's data files for compaction: build-time and
    * previously-compacted files (no batch prefix) are committed by
    * construction; a `batchN-` file is committed iff its marker exists.
    * Files of a TORN batch (promoted, crashed before its marker) are
    * returned separately — a fold must EXCLUDE them (their batch will
    * replay and re-deliver in full), and dropping them in the rewrite
    * is exactly the rollback the replay would have performed.
    */
  def committedDataFiles(spark: SparkSession, root: String, sub: String,
      partitioned: Boolean): (Seq[String], Seq[String]) = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new Path(s"$root/$sub")
    if (!fs.exists(dir)) return (Seq.empty, Seq.empty)
    val dirs = if (partitioned)
      fs.listStatus(dir).filter(_.isDirectory).map(_.getPath).toSeq
    else Seq(dir)
    val files = dirs.flatMap(d => fs.listStatus(d).toSeq).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    val (committed, torn) = files.partition { st =>
      BatchPrefix.findFirstMatchIn(st.getPath.getName) match {
        case Some(m) => fs.exists(new Path(s"$root/_committed/batch-${m.group(1)}"))
        case None    => true
      }
    }
    (committed.map(_.getPath.toString), torn.map(_.getPath.toString))
  }
}
