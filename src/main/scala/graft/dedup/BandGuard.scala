package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hot-band occupancy guard + exact-duplicate pre-collapse for the
  * fixed-width banded LSH joins (r17 verdict #1).
  *
  * The problem (stated for the engine's own embedding-LSH in
  * `similarity/Similarity.scala`, and equally true of every fixed
  * banding): a FIXED band structure makes the bucket count constant,
  * so the candidate cost of the banded self-join is Θ(n²) in a
  * duplicate-heavy corpus — k byte-identical copies of one asset put
  * k rows in the SAME band key of EVERY band, and a web-scale corpus
  * is routinely 30–50 % exact/near-exact copies. Two mechanisms fix
  * this WITHOUT changing any verified output:
  *
  *  1. '''Exact pre-collapse.''' Identical fingerprints are collapsed
  *     to one representative (the minimum id) BEFORE banding; only
  *     representatives enter the band space. In-group pairs (identical
  *     fingerprints → Hamming 0) are emitted directly from the group
  *     relation — they are OUTPUT (k copies are k·(k−1)/2 result rows
  *     no matter the algorithm), never band-join work. Cross-group
  *     verified pairs are expanded back through both groups, and only
  *     where the full pair relation is demanded; apply/incremental
  *     consumers stay O(k) per group.
  *
  *  2. '''Hot-band sub-split.''' A band key whose DISTINCT-fingerprint
  *     occupancy still exceeds [[HotBandCap]] (a near-duplicate
  *     cluster, not exact copies) is split by extra fingerprint bits:
  *     the 45 bits OUTSIDE the hot band are sliced into five 9-bit
  *     sub-bands, and two hot-band mates are candidates iff they also
  *     share a sub-band. This is LOSSLESS for the verify threshold
  *     Hamming ≤ 4: two fingerprints sharing the hot band have all
  *     ≤ 4 differing bits among the other 45, and 4 flips across 5
  *     disjoint sub-bands leave at least one sub-band identical
  *     (pigeonhole) — so every pair the unguarded join verified is
  *     still generated, while a hot bucket of size m costs m²/512-ish
  *     instead of m² (and exact copies never reach it at all).
  *
  * Both mechanisms preserve the verified pair relation EXACTLY (the
  * differential property `BandGuardSpec` pins against the naive
  * banded join, hot cap forced to 0 so every band takes the split
  * path), which is why none of the DuckDB oracles changed: the oracle
  * SQL remains the naive definition, and the guard is a pure
  * execution-strategy rewrite — the same relationship Catalyst has to
  * a logical plan.
  */
object BandGuard {

  /** Occupancy cap above which a (band, band_key) bucket is "hot" and
    * takes the sub-split path. Collapse removes exact copies first, so
    * occupancy counts DISTINCT fingerprints: 1024 band-mates means a
    * ≥ 1024-member near-dup cluster, where the naive bucket join would
    * do ~2²⁰ comparisons and the split ~2¹¹ per sub-bucket.
    */
  val HotBandCap: Int = 1024

  /** 4 × 15-bit band rows over (idCol, keyCols…, fp) fingerprint rows
    * — the one banding definition every 60-bit modality shares.
    */
  def bands60Keyed(fps: DataFrame, idCol: String,
      keyCols: Seq[String]): DataFrame =
    fps.select((idCol +: keyCols :+ "fp").map(col): _*)
      .withColumn("band", explode(sequence(lit(0), lit(3))))
      .withColumn("band_key",
        expr("shiftright(fp, band * 15)").bitwiseAND(lit(32767L)))

  /** `sub`-th 9-bit slice of the 45 bits of `fp` OUTSIDE band `band`
    * (high bits shifted down over the removed band, low bits kept in
    * place, then sliced).
    */
  private val subKeyOfFp: Column = expr(
    "shiftright(shiftleft(shiftright(fp, (band + 1) * 15), band * 15) " +
      "| (fp & (shiftleft(CAST(1 AS BIGINT), band * 15) - 1)), sub * 9) & 511")

  /** Band rows with the hot-key sub-split applied: cold keys pass
    * through as one row (sub = −1, sub_key = 0); hot keys explode into
    * five rows keyed by the 9-bit slices of [[restOfFp]]. Joining two
    * relations guarded with the SAME `hot` set on
    * (keyCols…, band, band_key, sub, sub_key) is lossless vs the naive
    * (band, band_key) join at verify Hamming ≤ 4 (see object doc).
    */
  private def guardBands60(bands: DataFrame, hot: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val hk = keyCols ++ Seq("band", "band_key")
    bands.join(hot.withColumn("is_hot", lit(true)), hk, "left")
      .withColumn("sub", explode(when(col("is_hot"),
        array((0 to 4).map(lit(_)): _*)).otherwise(array(lit(-1)))))
      .withColumn("sub_key",
        when(col("sub") < 0, lit(0L)).otherwise(subKeyOfFp))
      .drop("is_hot")
  }

  /** Guarded banded Hamming pairs — the pair relation of the naive
    * 4×15 banded self-join at `hamming <= maxHamming`, computed via
    * pre-collapse + hot-band sub-split. `fps` carries
    * (idCol, keyCols…, fp); output is (<id>_a, <id>_b, keyCols…,
    * hamming) with `<id>_a < <id>_b`, exactly the rows the naive join
    * verifies (lossless: requires maxHamming ≤ 4 for the pigeonhole).
    */
  def guardedHammingPairs(fps0: DataFrame, idCol: String,
      keyCols: Seq[String], maxHamming: Int,
      hotCap: Int = HotBandCap): DataFrame = {
    require(maxHamming <= 4,
      "the 5x9 sub-band split is lossless only for maxHamming <= 4")
    val aCol = idCol.stripSuffix("_id") + "_a"
    val bCol = idCol.stripSuffix("_id") + "_b"
    val gcols = keyCols :+ "fp"
    val fps = fps0.select((idCol +: gcols).map(col): _*)
    // Eager checkpoint (r18 optimization): the representative relation
    // feeds FOUR subtrees (the hot census, both sides of the guarded
    // band self-join, and the member expansion), and none of them
    // share its aggregation exchange after planning — without
    // materialization the collapse groupBy re-ran per consumer
    // (measured: −9 s cpu / −0.5 s wall across the three media pair
    // detectors at sf0.1 in matched windows). One row per DISTINCT
    // fingerprint, id + fp — sublinear in corpus bytes, safe to
    // materialize at any scale; per-micro-batch checkpoints in the
    // incremental paths are reclaimed by the ContextCleaner.
    val reps = fps.groupBy(gcols.map(col): _*).agg(min(col(idCol)).as(idCol))
      .localCheckpoint()

    // in-group pairs: identical fingerprints, Hamming 0 — pure output,
    // generated on the full-fingerprint key, never through the bands
    val inGroup = fps.as("ga").join(fps.as("gb"),
        gcols.map(c => col(s"ga.$c") === col(s"gb.$c")).reduce(_ && _) &&
          col(s"ga.$idCol") < col(s"gb.$idCol"))
      .select(Seq(col(s"ga.$idCol").as(aCol), col(s"gb.$idCol").as(bCol)) ++
        keyCols.map(c => col(s"ga.$c")) :+ lit(0L).as("hamming"): _*)

    // guarded candidate pairs over representatives only
    val repBands = bands60Keyed(reps, idCol, keyCols)
    val hk = keyCols ++ Seq("band", "band_key")
    val hot = repBands.groupBy(hk.map(col): _*)
      .agg(count(lit(1)).as("occ")).filter(col("occ") > hotCap)
      .select(hk.map(col): _*)
    val gb = guardBands60(repBands, hot, keyCols)
    val joinKeys = hk ++ Seq("sub", "sub_key")
    val verified = gb.as("x").join(gb.as("y"),
        joinKeys.map(c => col(s"x.$c") === col(s"y.$c")).reduce(_ && _) &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(Seq(col(s"x.$idCol").as("rep_a"), col(s"y.$idCol").as("rep_b"),
        col(s"x.fp").as("fp_a"), col(s"y.fp").as("fp_b")) ++
        keyCols.map(c => col(s"x.$c")): _*)
      .distinct()
      .withColumn("hamming",
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast(LongType))
      .filter(col("hamming") <= maxHamming)

    // expand verified rep pairs back through the identical-fp groups
    val members = fps.join(reps.withColumnRenamed(idCol, "rep"), gcols)
    def keyEq(l: String, r: String): Column =
      keyCols.map(c => col(s"$l.$c") === col(s"$r.$c"))
        .foldLeft(lit(true))(_ && _)
    val crossPairs = verified.as("v")
      .join(members.as("ma"),
        col("v.rep_a") === col("ma.rep") && keyEq("v", "ma"))
      .join(members.as("mb"),
        col("v.rep_b") === col("mb.rep") && keyEq("v", "mb"))
      .select(Seq(
        least(col(s"ma.$idCol"), col(s"mb.$idCol")).as(aCol),
        greatest(col(s"ma.$idCol"), col(s"mb.$idCol")).as(bCol)) ++
        keyCols.map(c => col(s"v.$c")) :+ col("v.hamming"): _*)

    crossPairs.unionByName(inGroup)
  }

  /** Instrumentation for the O(k) regression pin and `ScaleCurve`:
    * the number of guarded rep-level candidate pairs the band join
    * generates BEFORE Hamming verification. k exact copies of one
    * asset contribute 0 (one representative); the naive join would
    * contribute k·(k−1)/2 per band.
    */
  def repCandidateCount(fps0: DataFrame, idCol: String,
      keyCols: Seq[String], hotCap: Int = HotBandCap): Long = {
    val gcols = keyCols :+ "fp"
    val fps = fps0.select((idCol +: gcols).map(col): _*)
    val reps = fps.groupBy(gcols.map(col): _*).agg(min(col(idCol)).as(idCol))
    val repBands = bands60Keyed(reps, idCol, keyCols)
    val hk = keyCols ++ Seq("band", "band_key")
    val hot = repBands.groupBy(hk.map(col): _*)
      .agg(count(lit(1)).as("occ")).filter(col("occ") > hotCap)
      .select(hk.map(col): _*)
    val gb = guardBands60(repBands, hot, keyCols)
    val joinKeys = hk ++ Seq("sub", "sub_key")
    gb.as("x").join(gb.as("y"),
        joinKeys.map(c => col(s"x.$c") === col(s"y.$c")).reduce(_ && _) &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol"), col(s"y.$idCol"))
      .distinct()
      .count()
  }

  /** Guarded bipartite matches between a batch fingerprint relation
    * and an accumulated band-row INDEX (the incremental families'
    * cross-delivery join): batch side collapsed to representatives,
    * hotness decided over the UNION occupancy (both sides must agree
    * on which keys are hot for the sub-split join to be closed), rep
    * matches expanded through the batch groups with the
    * `batch id ≠ index id` exclusion re-applied at MEMBER level — so
    * replay idempotence (a batch never deduping against its own landed
    * delta) holds exactly as in the naive join. Output:
    * (idCol, keyCols…, other_id) — one row per (batch member, matched
    * index id, key).
    */
  def guardedCrossMatches60(fps0: DataFrame, idCol: String,
      keyCols: Seq[String], indexBands: DataFrame, maxHamming: Int,
      hotCap: Int = HotBandCap): DataFrame = {
    require(maxHamming <= 4,
      "the 5x9 sub-band split is lossless only for maxHamming <= 4")
    val gcols = keyCols :+ "fp"
    val fps = fps0.select((idCol +: gcols).map(col): _*)
    val reps = fps.groupBy(gcols.map(col): _*).agg(min(col(idCol)).as(idCol))
    val repBands = bands60Keyed(reps, idCol, keyCols)
    val hk = keyCols ++ Seq("band", "band_key")
    val idx = indexBands.select(
      (idCol +: (gcols ++ Seq("band", "band_key"))).map(col): _*)
    val hot = repBands.select(hk.map(col): _*)
      .unionByName(idx.select(hk.map(col): _*))
      .groupBy(hk.map(col): _*)
      .agg(count(lit(1)).as("occ")).filter(col("occ") > hotCap)
      .select(hk.map(col): _*)
    val gx = guardBands60(repBands, hot, keyCols)
    val gi = guardBands60(idx, hot, keyCols)
    val joinKeys = hk ++ Seq("sub", "sub_key")
    val repMatch = gx.as("x").join(gi.as("i"),
        joinKeys.map(c => col(s"x.$c") === col(s"i.$c")).reduce(_ && _))
      .filter(bit_count(col(s"x.fp").bitwiseXOR(col(s"i.fp"))) <= maxHamming)
      .select(Seq(col(s"x.$idCol").as("rep"), col(s"i.$idCol").as("other_id")) ++
        keyCols.map(c => col(s"x.$c")): _*)
      .distinct()
    val members = fps.join(reps.withColumnRenamed(idCol, "rep"), gcols)
    repMatch.join(members, "rep" +: keyCols)
      .filter(col(idCol) =!= col("other_id"))
      .select((idCol +: keyCols :+ "other_id").map(col): _*)
  }

  /** One guarded incremental step for the 60-bit Hamming families —
    * the shared skeleton of the phash/audio/video step deltas:
    * within-delivery drops from [[guardedHammingPairs]] (larger id
    * dies), cross-delivery drops from [[guardedCrossMatches60]], both
    * rolled up through the family's frame VOTE (minVote = 1 for the
    * flat modalities). `batch` is the full batch relation to anti-join
    * survivors from; `fps` its (media_id, keyCols…, fp) fingerprint
    * view; `index` the accumulated band-row index. The delta is the
    * survivors' NAIVE band rows — the on-disk index schema is
    * unchanged, and hotness is re-derived at read time from live
    * occupancy, so a corpus that grows hot later still guards.
    */
  def guardedStepDelta60(batch: DataFrame, fps: DataFrame,
      keyCols: Seq[String], index: DataFrame, maxHamming: Int,
      minVote: Int, hotCap: Int = HotBandCap): (DataFrame, DataFrame) = {
    def voted(matches: DataFrame): DataFrame =
      matches.distinct()
        .groupBy(col("drop_id"), col("other_id"))
        .agg(count(lit(1)).as("n_frames"))
        .filter(col("n_frames") >= minVote)
        .select(col("drop_id").as("media_id"))
        .distinct()
    val pairs = guardedHammingPairs(fps, "media_id", keyCols, maxHamming, hotCap)
    val within = voted(pairs.select(
      (Seq(col("media_b").as("drop_id"), col("media_a").as("other_id")) ++
        keyCols.map(col)): _*))
    val cross = voted(
      guardedCrossMatches60(fps, "media_id", keyCols, index, maxHamming, hotCap)
        .select((Seq(col("media_id").as("drop_id"), col("other_id")) ++
          keyCols.map(col)): _*))
    val survivors = batch.join(within.union(cross).distinct(),
      Seq("media_id"), "left_anti")
    val delta = bands60Keyed(fps, "media_id", keyCols)
      .join(survivors.select(col("media_id")).distinct(),
        Seq("media_id"), "left_semi")
    (survivors, delta)
  }

  /** Per-family banding introspection — the `emb_ivf_cell_stats` twin
    * for the banded dedup families: pre-collapse volume, group
    * structure, and REPRESENTATIVE band occupancy against the hot cap.
    * `fps` carries (idCol, keyCols…, fp).
    */
  def bandStats(fps0: DataFrame, idCol: String, keyCols: Seq[String],
      family: String, hotCap: Int = HotBandCap): DataFrame = {
    val gcols = keyCols :+ "fp"
    val fps = fps0.select((idCol +: gcols).map(col): _*)
    val groups = fps.groupBy(gcols.map(col): _*)
      .agg(count(lit(1)).as("members"))
    val gstats = groups.agg(
      coalesce(sum(col("members")), lit(0L)).cast(LongType).as("n_raw"),
      count(lit(1)).as("n_reps"),
      coalesce(sum(when(col("members") > 1, 1L)), lit(0L)).cast(LongType)
        .as("n_dup_groups"),
      coalesce(max(col("members")), lit(0L)).cast(LongType).as("max_group"))
    val reps = fps.groupBy(gcols.map(col): _*).agg(min(col(idCol)).as(idCol))
    val hk = keyCols ++ Seq("band", "band_key")
    val occ = bands60Keyed(reps, idCol, keyCols)
      .groupBy(hk.map(col): _*).agg(count(lit(1)).as("occ"))
    val bstats = occ.agg(
      count(lit(1)).as("n_band_keys"),
      coalesce(max(col("occ")), lit(0L)).cast(LongType).as("max_band_occ"),
      coalesce(sum(when(col("occ") > hotCap, 1L)), lit(0L)).cast(LongType)
        .as("hot_bands"))
    // two 1-row aggregates side by side — the codebase's broadcast
    // scalar-panel idiom (never a shuffled cartesian)
    gstats.crossJoin(broadcast(bstats))
      .select(lit(family).as("family"), col("n_raw"), col("n_reps"),
        col("n_dup_groups"), col("max_group"), col("n_band_keys"),
        col("max_band_occ"), col("hot_bands"),
        lit(hotCap.toLong).as("hot_cap"))
  }
}
