package graft

import graft.analytics.TextAnalysis
import org.apache.spark.sql.Row

/** Hand-computed oracles for the Gopher-style repetition signals
  * (`tx_repetition`): mode count × gram length over doc chars, the
  * lexicographic tiebreak, duplicated-5-gram mass, the 1.0 cap, and
  * the flag thresholds. The full-corpus hash check is the driver gate;
  * this spec pins the arithmetic on docs small enough to verify by
  * hand.
  */
class TextRepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: (Long, String)*): Map[Long, Row] =
    TextAnalysis.txRepetitionDf(
      texts.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap

  test("top-gram fraction: count x gram chars over doc chars") {
    // "a b a b a b": 2-grams 'a b'x3 'b a'x2 -> 3*3=9 over 11 chars
    val r = run(1L -> "a b a b a b")(1L)
    assert(r.getLong(1) == 11L)
    assert(r.getDouble(2) == 9.0 / 11)
    // 3-grams: 'a b a'x2, 'b a b'x2 -> tie, smallest 'a b a': 2*5=10/11
    assert(r.getDouble(3) == 10.0 / 11)
    assert(r.getBoolean(6)) // 0.818 > 0.20
  }

  test("tiebreak is lexicographically smallest max-count gram") {
    // "x y x z x y x z": 'x y'=2 'y x'=2 'x z'=2 'z x'=1 -> 'x y', 2*3=6/15
    val r = run(1L -> "x y x z x y x z")(1L)
    assert(r.getDouble(2) == 6.0 / 15)
  }

  test("duplicated-5-gram mass counts every occurrence of c>=2 grams") {
    // 15 tokens 'a b c d e' x3: eleven 5-grams, one x3 + four x2,
    // dup = 3*9 + 4*2*9 = 99 -> capped at 1.0 (29 chars)
    val r = run(1L -> ("a b c d e " * 3).trim)(1L)
    assert(r.getDouble(5) == 1.0)
    // no duplicated 5-gram -> 0
    val r2 = run(2L -> "a b c d e f g h")(2L)
    assert(r2.getDouble(5) == 0.0)
  }

  test("native gram stats == plain-Scala reference on random docs (seeded)") {
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 12).map(i => s"w$i") // small vocab forces repeats
    val docs = (0 until 30).map { i =>
      val len = 1 + rnd.nextInt(79) // includes len < n edges; empty text is out of contract
      (i.toLong, (0 until len).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    def ref(text: String, n: Int): (Long, Long) = {
      val t = text.split("\\s+").filter(_.nonEmpty)
      if (t.length < n) return (0L, 0L)
      val grams = (0 to t.length - n).map(i => t.slice(i, i + n).mkString(" "))
      val counts = grams.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val best = counts.toSeq.sortBy { case (g, c) => (-c, g) }.head
      val dup = counts.collect { case (g, c) if c >= 2 => c * g.length }.sum
      (best._2 * best._1.length, dup)
    }
    val rows = run(docs: _*)
    docs.foreach { case (id, text) =>
      val r = rows(id)
      val nChars = text.length.toLong
      val (top2, _) = ref(text, 2)
      val (top4, _) = ref(text, 4)
      val (_, dup5) = ref(text, 5)
      def frac(x: Long) =
        if (nChars == 0) 0.0 else math.min(1.0, x.toDouble / nChars)
      assert(r.getLong(1) == nChars)
      assert(r.getDouble(2) == frac(top2), s"doc $id top2")
      assert(r.getDouble(4) == frac(top4), s"doc $id top4")
      assert(r.getDouble(5) == frac(dup5), s"doc $id dup5")
    }
  }

  test("diverse doc stays below thresholds; degenerate docs survive") {
    // 40 distinct 3-char words (159 chars): every gram unique, so each
    // top fraction is one gram's span — 7/159, 11/159, 15/159 — all
    // below threshold (a SHORT diverse doc does flag: one 4-gram of
    // 1-char words spans 7/39 = 0.18 > 0.16, correctly — Gopher
    // thresholds presume documents longer than a few grams)
    val words = (0 until 40).map(i => f"w$i%02d")
    val r = run(1L -> words.mkString(" "))(1L)
    assert(r.getDouble(2) == 7.0 / 159)
    assert(r.getDouble(4) == 15.0 / 159)
    assert(!r.getBoolean(6))
    // fewer tokens than n -> 0 fractions, no flag; and the 1.0 cap
    val r2 = run(2L -> "one", 3L -> "a a a a")(2L)
    assert(r2.getDouble(2) == 0.0 && r2.getDouble(5) == 0.0 && !r2.getBoolean(6))
    val r3 = run(3L -> "a a a a")(3L)
    assert(r3.getDouble(2) == 1.0) // 'a a' x3 * 3 chars = 9 > 7, capped
  }
}
