package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** POLICY-DRIVEN MAINTENANCE — the one scheduled job a deployment
  * runs against its store base, unifying the primitives this layer
  * provides into a single idempotent pass:
  *
  *   1. healing: `StoreRoot.recoverSwap` reconciles root-level swap
  *      crash leftovers (`__old`/`__compacting`) so retention never
  *      sees a store's only surviving copy unstamped;
  *   2. retention: `StoreRoot.sweepStale` drops roots (and crashed
  *      staging) not used within the TTL;
  *   3. per surviving root, by store family (the kind prefix of the
  *      digest dir name): FOLD when a tombstone table exists or the
  *      representative sub-table's committed file count exceeds
  *      `segmentBound` (append history growing);
  *   4. for the cell-partitioned families, SPLIT when the census
  *      guard reports partitions over the skew bound.
  *
  * Every action is one of the already-certified single-writer ops
  * (fold/split are serve-identity; retention only touches unused
  * roots), so running the pass never changes a served result — and a
  * second immediate pass takes no action, which the spec asserts.
  * Returns one report row per action taken, for the operator's log.
  */
object Maintenance {

  case class Report(root: String, family: String, action: String,
      detail: String)

  /** Store family from the digest dir name's kind prefix (`ivfpq-…`
    * before `ivf-…`; unknown prefixes are left untouched).
    */
  private[store] def familyOf(name: String): Option[String] =
    if (name.contains(".build-")) None // possibly in-progress staging
    else if (name.endsWith("__old") || name.endsWith("__compacting"))
      None // root-level swap leftovers; recoverSwap reconciles them
    else if (name.startsWith("ivfpq")) Some("ivfpq")
    else if (name.startsWith("ivf")) Some("ivf")
    else if (name.startsWith("pq")) Some("pq")
    else if (name.startsWith("lex")) Some("lex")
    else None

  /** The sub-table whose committed-file census stands for the store's
    * append-history growth, plus its partitioning.
    */
  private[graft] val representative: Map[String, (String, Boolean)] = Map(
    "pq" -> ("codes", false),
    "ivf" -> ("lists", true),
    "ivfpq" -> ("cellcodes", true),
    "lex" -> ("postings", false))

  def run(spark: SparkSession, base: String = StoreRoot.defaultBase,
      ttlMs: Long = 7L * 24 * 3600 * 1000,
      segmentBound: Int = 8): Seq[Report] = {
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = Seq.newBuilder[Report]
    // heal root-level swap crashes (a rebuild's) FIRST — before the
    // retention sweep can see the unstamped `__old`/`__compacting`
    // leftovers (a `__old` whose live root vanished mid-swap is the
    // ONLY surviving copy; healing renames it back under its stamp)
    StoreRoot.healSwapsUnder(spark, base)
    val swept = StoreRoot.sweepStale(spark, base, ttlMs)
    if (swept > 0)
      out += Report(base, "-", "retention", s"$swept stale root(s) removed")
    if (!fs.exists(new Path(base))) return out.result()
    // list AFTER healing + retention, so a root recovered this pass is
    // walked this pass and a reaped root is not
    val roots = fs.listStatus(new Path(base))
      .filter(st => st.isDirectory && st.getPath.getName != "_live")
      .map(_.getPath).toSeq.sortBy(_.getName)
    roots.foreach { rootPath =>
      val root = rootPath.toString
      familyOf(rootPath.getName).foreach { family =>
        val (sub, partitioned) = representative(family)
        if (fs.exists(new Path(s"$root/$sub"))) {
          val (committed, _) =
            BatchCommit.committedDataFiles(spark, root, sub, partitioned)
          val hasDeletes = fs.exists(new Path(s"$root/deletes"))
          val perDir = if (partitioned)
            // partitioned stores legitimately hold ~1 file per cell;
            // growth shows as files per CELL dir, not per table
            committed.groupBy(f => new Path(f).getParent.getName)
              .values.map(_.size).maxOption.getOrElse(0)
          else committed.size
          if (hasDeletes || perDir > segmentBound) {
            family match {
              case "pq"    => Compaction.compactPqStore(spark, root)
              case "ivf"   => Compaction.compactIvfStore(spark, root)
              case "ivfpq" => Compaction.compactIvfPqStore(spark, root)
              case _       => Compaction.compactLexStore(spark, root)
            }
            out += Report(root, family, "fold",
              s"deletes=$hasDeletes segments=$perDir")
          }
          if ((family == "ivf" || family == "ivfpq") &&
              fs.exists(new Path(s"$root/centroids"))) {
            val rowsPerVec = if (family == "ivfpq") 8 else 1
            val over = AnnIndex.cellGuard(spark, root, sub, rowsPerVec)
              .head.getAs[Long]("cells_over_bound")
            if (over > 0) {
              val split = Compaction.splitHotCells(spark, root, sub,
                rowsPerVec = rowsPerVec)
              out += Report(root, family, "split",
                s"cells_over_bound=$over split=$split")
            }
          }
        }
      }
    }
    out.result()
  }
}
