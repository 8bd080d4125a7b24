package graft

import graft.analytics.TextAnalysis

/** Distributed BPE merge training (r17 verdict ask #2). Pins:
  *  - hand-computable merge sequences on tiny corpora, including the
  *    greedy leftmost-first application on overlapping runs (the
  *    `replace`-encoding's defining property) and early exhaustion;
  *  - merge-order DETERMINISM across partitionings — the named done
  *    check: the argmax tiebreak (count DESC, pair ASC) is a total
  *    order, so a re-shard can never reorder the learned table.
  */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  private def merges(texts: Seq[String], k: Int,
      parts: Int = 4): Seq[(Long, String, String, String, Long)] =
    TextAnalysis.bpeTrainDf(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text").repartition(parts),
        k)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
      .toSeq

  test("hand-computed merges; greedy left-to-right on overlapping runs") {
    // "oooo" has three overlapping (o,o) pairs; greedy BPE merges
    // left-to-right non-overlapping: oooo -> [oo][oo], so round 2's
    // top pair is (oo, oo) with one occurrence per word, and round 3
    // finds nothing (exhaustion before k) — the merge table stops
    val got = merges(Seq.fill(5)("oooo"), k = 5)
    assert(got == Seq(
      (1L, "o", "o", "oo", 15L),   // 3 pairs x 5 occurrences... counted per DISTINCT word x cnt
      (2L, "oo", "oo", "oooo", 5L)))
  }

  test("tiebreak: equal counts resolve to the lexicographically smallest pair") {
    // "ab" and "aa" each appear 3 times -> pairs (a,b) and (a,a) both
    // count 3; (a,a) < (a,b) must win round 1
    val got = merges(Seq.fill(3)("ab") ++ Seq.fill(3)("aa"), k = 1)
    assert(got == Seq((1L, "a", "a", "aa", 3L)))
  }

  test("merge order is deterministic across partitionings") {
    val texts = (0 until 120).map { i =>
      val w = Seq("the cat", "cat hat", "the the cat", "hat trick",
        "trick or treat", "treat the cat")(i % 6)
      w + " " + (i % 7).toString
    }
    val a = merges(texts, k = 12, parts = 1)
    val b = merges(texts, k = 12, parts = 13)
    assert(a.nonEmpty && a == b)
  }

  test("driver-side round replay == distributed rounds (r18 optimization)") {
    // the small-working-set fast path collects (cnt, symstr) once and
    // replays the greedy rounds on the driver; driverCap = 0 forces the
    // distributed per-round jobs on the SAME corpus — the two merge
    // tables must match rank for rank, including count ties resolved in
    // UTF-8 binary order and multi-char merged symbols
    val texts = (0 until 90).map { i =>
      val w = Seq("the cat sat", "a hat; the cat!", "tricé or treat",
        "treat the cat", "99 bottles", "the éclair")(i % 6)
      w + " " + (i % 5).toString
    }
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").repartition(7)
    def tbl(cap: Long) = TextAnalysis.bpeTrainDf(docs, 16, driverCap = cap)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    val driver = tbl(Long.MaxValue)
    val dist = tbl(0L)
    assert(driver.nonEmpty && driver == dist)
  }
}
