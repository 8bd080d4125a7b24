package graft

import graft.analytics.TextAnalysis
import org.apache.spark.sql.functions._

/** BPE encoding with the learned merge table (the `tx_bpe_train`
  * consumer). Pins:
  *  - hand-computed per-doc token counts under 0, 1 and 2 learned
  *    merges (the k-rung ladder shows each merge rule taking effect);
  *  - zero-pretoken docs survive as explicit (0, 0, 0) rows;
  *  - determinism across partitionings;
  *  - corpus-scale invariants against the sibling operators:
  *    n_pretokens equals `txTokensBpe`'s pre-token count and the
  *    learned token count is bracketed by pre-tokens and base symbols.
  */
class BpeEncodeSpec extends SparkSpec {
  import spark.implicits._

  private def encode(texts: Seq[String], k: Int,
      parts: Int = 4): Seq[(Long, Long, Long, Long)] =
    TextAnalysis.bpeEncodeDf(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text").repartition(parts),
        k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("hand-computed counts under the 0/1/2-merge ladder") {
    // corpus ["ab ab", "ab"]: pre-tokens "ab"x2, " ab"x1; round 1
    // learns (a,b) -> "ab" (count 3 beats (' ',a) count 1), round 2
    // learns (' ', "ab") -> " ab"
    val texts = Seq("ab ab", "ab")
    // k=0: every pre-token stays characters
    assert(encode(texts, 0) == Seq((0L, 2L, 5L, 5L), (1L, 1L, 2L, 2L)))
    // k=1: "ab" -> [ab] (1), " ab" -> [' ', ab] (2)
    assert(encode(texts, 1) == Seq((0L, 2L, 5L, 3L), (1L, 1L, 2L, 1L)))
    // k=2: both words are single tokens
    assert(encode(texts, 2) == Seq((0L, 2L, 5L, 2L), (1L, 1L, 2L, 1L)))
  }

  test("docs with no pre-tokens emit explicit zero rows") {
    assert(encode(Seq("ab", ""), 1) ==
      Seq((0L, 1L, 2L, 1L), (1L, 0L, 0L, 0L)))
  }

  test("encoding is deterministic across partitionings") {
    val texts = (0 until 120).map { i =>
      val w = Seq("the cat", "cat hat", "the the cat", "hat trick",
        "trick or treat", "treat the cat")(i % 6)
      w + " " + (i % 7).toString
    }
    assert(encode(texts, 12, parts = 1) == encode(texts, 12, parts = 13))
  }

  test("sf0.001 corpus: pre-token parity and count bracketing") {
    val docs = Tables.documents(spark, Sf0001)
    val enc = TextAnalysis.bpeEncodeDf(docs, TextAnalysis.BpeMerges)
      .persist()
    val pre = TextAnalysis.txTokensBpe(spark, Sf0001)
      .select(col("doc_id"), col("n_tokens_bpe"))
    assert(enc.join(pre, Seq("doc_id"))
      .filter(col("n_pretokens") =!= col("n_tokens_bpe")).count() == 0)
    assert(enc.filter(col("n_bpe_tokens") > col("n_base_symbols") ||
      col("n_bpe_tokens") < col("n_pretokens")).count() == 0)
    // the learned merges actually compress: strictly fewer tokens than
    // base symbols over the corpus
    val sums = enc.agg(sum(col("n_bpe_tokens")), sum(col("n_base_symbols")))
      .head()
    assert(sums.getLong(0) < sums.getLong(1))
    enc.unpersist()
  }
}
