package graft

import graft.analytics.TextAnalysis

/** Sequence-packing invariants — the properties a training loader
  * relies on, beyond the oracle's row-hash:
  *  - concat-and-chunk (`txPackChunk`): every sequence except the last
  *    holds exactly seqLen tokens; each document's spans partition the
  *    document (contiguous, gapless, within bounds).
  *  - the two-phase prefix (bucketed window + broadcast bucket
  *    offsets) equals the single global cumsum it replaces.
  */
class PackSpec extends SparkSpec {

  test("chunk packing: exact seqLen everywhere but the tail; doc spans partition docs") {
    import spark.implicits._
    val seqLen = 512L
    val rows = TextAnalysis.txPackChunk(spark, Sf0001, seqLen)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // per-sequence totals: exactly seqLen for all but the last seq
    val bySeq = rows.groupBy(_._1).view.mapValues(_.map(_._5).sum).toMap
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (seq, tot) =>
      if (seq != lastSeq)
        assert(tot == seqLen, s"sequence $seq holds $tot tokens, want $seqLen")
      else assert(tot >= 1 && tot <= seqLen)
    }
    // per-doc spans: start at 0, contiguous, end at the doc's n_toks
    val nToks = TextAnalysis.txTokens(spark, Sf0001)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    rows.groupBy(_._2).foreach { case (doc, spans) =>
      val sorted = spans.sortBy(_._3)
      assert(sorted.head._3 == 0L, s"doc $doc first span starts at ${sorted.head._3}")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 == b._3,
          s"doc $doc spans not contiguous: ${a._4} vs ${b._3}")
        case _ =>
      }
      assert(sorted.last._4 == nToks(doc),
        s"doc $doc spans end at ${sorted.last._4}, want ${nToks(doc)}")
      // spans of one doc land on CONSECUTIVE sequences
      val seqs = sorted.map(_._1)
      assert(seqs.zip(seqs.tail).forall { case (x, y) => y == x + 1 })
    }
    // global conservation: spans sum to the corpus's packable tokens
    assert(rows.map(_._5).sum == nToks.values.filter(_ > 0).sum)
  }

  test("shuffled packing: same invariants under the permuted epoch order") {
    import spark.implicits._
    val seqLen = 512L
    val rows = TextAnalysis.txPackShuffled(spark, Sf0001, seqLen)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val bySeq = rows.groupBy(_._1).view.mapValues(_.map(_._5).sum).toMap
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (seq, tot) =>
      if (seq != lastSeq)
        assert(tot == seqLen, s"sequence $seq holds $tot tokens, want $seqLen")
      else assert(tot >= 1 && tot <= seqLen)
    }
    val nToks = TextAnalysis.txTokens(spark, Sf0001)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    rows.groupBy(_._2).foreach { case (doc, spans) =>
      val sorted = spans.sortBy(_._3)
      assert(sorted.head._3 == 0L && sorted.last._4 == nToks(doc))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 == b._3)
        case _ =>
      }
    }
    assert(rows.map(_._5).sum == nToks.values.filter(_ > 0).sum)
    // the permutation actually reorders: the first sequence's docs are
    // not simply the smallest doc_ids (vanishingly unlikely under the
    // content-addressed shuffle of this corpus, and pinned here so a
    // regression to doc_id order cannot pass silently)
    val firstSeqDocs = rows.filter(_._1 == 0L).map(_._2).sorted.toSeq
    val smallest = nToks.filter(_._2 > 0).keys.toSeq.sorted
      .take(firstSeqDocs.length)
    assert(firstSeqDocs != smallest, "epoch order degenerated to doc_id order")
  }
}
