package graft

import graft.analytics.{EventAnalytics, Relational}
import graft.operators.EventOps
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {

  test("q1: groups partition the filtered lineitem exactly") {
    val q1 = Relational.q1PricingSummary(spark, Sf0001).collect()
    val totalFromGroups = q1.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.lineitem(spark, Sf0001)
      .filter(col("l_shipdate") <= Cols.tsLit("1998-09-02")).count()
    assert(totalFromGroups == expected)
    q1.foreach { r =>
      assert(r.getAs[Double]("avg_qty") > 0 && r.getAs[Double]("sum_qty") > 0)
    }
  }

  test("a1: one row per device, counts partition the table") {
    val a1 = EventAnalytics.a1DeviceSummary(spark, Sf0001)
    val e = Tables.events(spark, Sf0001)
    assert(a1.count() == e.select("user_id").distinct().count())
    assert(a1.agg(sum("total_readings")).head().getLong(0) == e.count())
  }

  test("a2 hourly buckets cover every event exactly once") {
    val a2 = EventAnalytics.a2HourlyAgg(spark, Sf0001)
    assert(a2.agg(sum("n")).head().getLong(0) == Tables.events(spark, Sf0001).count())
  }

  test("funnel stages are monotone and cohort triangle covers every active (user, day)") {
    val f = EventAnalytics.funnelStages(spark, Sf0001).collect()
    assert(f.map(_.getAs[Long]("stage")).toSeq == Seq(1L, 2L, 3L))
    val counts = f.map(_.getAs[Long]("n_users"))
    assert(counts(0) >= counts(1) && counts(1) >= counts(2), counts.toSeq)
    assert(counts(0) > 0)
    val hours = f.map(_.getAs[Double]("mean_hours_from_signup"))
    assert(hours(0) == 0.0 && hours(1) >= 0.0 && hours(2) >= hours(1) - 1e-9)

    val tri = EventAnalytics.cohortRetention(spark, Sf0001)
    val total = tri.agg(sum("n_users")).head().getLong(0)
    val activeDays = Tables.events(spark, Sf0001)
      .select(col("user_id"), date_trunc("day", col("ts"))).distinct().count()
    assert(total == activeDays)
    assert(tri.filter(col("day_offset") < 0).count() == 0)
  }

  test("sketch merge: merged estimate tracks direct and exact at every scale") {
    // NOT merged == direct: bit-equality is a sparse-regime accident
    // that breaks at the union's dense-mode transition (sf0.1: merged
    // 1488, direct 1494, exact 1500). The stable contract is both
    // estimates inside the error band and the merge path adding only
    // estimator-mode noise (≤ 2% of direct).
    val r = graft.analytics.TextAnalysis.a6SketchMergeRaw(spark, Sf001).head()
    val (merged, direct, exact) =
      (r.getAs[Long]("merged_estimate"), r.getAs[Long]("direct_estimate"),
        r.getAs[Long]("exact_distinct"))
    assert(math.abs(merged - direct).toDouble / direct <= 0.02)
    assert(math.abs(merged - exact).toDouble / exact < 0.05)
    assert(math.abs(direct - exact).toDouble / exact < 0.05)
  }

  test("quantile merge: merged KLL estimates sit at the right ranks") {
    val r = graft.analytics.TextAnalysis.a6QuantileMergeRaw(spark, Sf001).head()
    val n = r.getAs[Long]("n_rows").toDouble
    assert(r.getAs[Double]("merged_p50") <= r.getAs[Double]("merged_p95"))
    assert(r.getAs[Long]("r50") >= n * 0.45 && r.getAs[Long]("r50") <= n * 0.55)
    assert(r.getAs[Long]("r95") >= n * 0.90)
  }

  test("gated sketch queries: every deterministic-part band boolean holds") {
    val sm = graft.analytics.TextAnalysis.a6SketchMerge(spark, Sf001).head()
    assert(sm.getAs[Boolean]("merged_in_band"))
    assert(sm.getAs[Boolean]("estimate_in_band"))
    val bad = graft.analytics.TextAnalysis.approxDistribution(spark, Sf001)
      .filter(!col("devices_in_band") || !col("median_in_band") ||
        !col("p95_in_band")).count()
    assert(bad == 0)
  }

  test("w2: moving average stays within per-device min/max") {
    val bad = EventAnalytics.w2MovingAvg(spark, Sf0001)
      .join(EventAnalytics.a4DeviceStats(spark, Sf0001)
        .groupBy("user_id")
        .agg(min("min_value").as("lo"), max("max_value").as("hi")), "user_id")
      .filter(col("moving_avg_12") < col("lo") || col("moving_avg_12") > col("hi"))
      .count()
    assert(bad == 0)
  }

  test("t1 fan-out doubles the rows (value + props_k both non-null here)") {
    val n = Tables.events(spark, Sf0001).count()
    assert(EventOps.t1Fanout(spark, Sf0001).count() == 2 * n)
  }

  test("w4 sessions partition each device timeline; rollup grand total = table count") {
    import spark.implicits._
    val e = Tables.events(spark, Sf0001)
    val sessions = EventAnalytics.w4SessionWindows(spark, Sf0001)
    assert(sessions.agg(sum("n_events")).head().getLong(0) == e.count())
    assert(sessions.filter($"duration_minutes" < 0).count() == 0)
    val roll = EventAnalytics.aggRollup(spark, Sf0001)
    val grand = roll.filter($"event_type" === "ALL" && $"day" === "ALL")
      .select("n").as[Long].head()
    assert(grand == e.count())
  }

  test("approx distribution (scale path) tracks the exact stats") {
    import spark.implicits._
    val exact = EventAnalytics.a6DailyDistribution(spark, Sf0001)
      .select($"bucket", $"event_type", $"n_devices", $"median_value")
    val approx = analytics.TextAnalysis.approxDistributionRaw(spark, Sf0001)
      .select($"bucket", $"event_type", $"n_devices_approx", $"median_approx")
    val joined = exact.join(approx, Seq("bucket", "event_type")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (nd, nda) = (r.getAs[Long]("n_devices"), r.getAs[Long]("n_devices_approx"))
      assert(math.abs(nd - nda) <= math.max(2, nd / 10), s"HLL off: $nd vs $nda")
    }
    // per-group medians are data-point picks on tiny sf0.001 groups —
    // bound the error where the statistic is meaningful: globally
    val e = Tables.events(spark, Sf0001)
    val exactMed = e.agg(percentile($"value", lit(0.5))).head().getDouble(0)
    val approxMed = e.agg(percentile_approx($"value", lit(0.5), lit(10000)))
      .head().getDouble(0)
    assert(math.abs(exactMed - approxMed) <= 5.0, s"$exactMed vs $approxMed")
  }

  test("salted two-phase aggregation equals the direct groupBy") {
    import spark.implicits._
    val e = Tables.events(spark, Sf0001)
    val direct = e.groupBy($"user_id".as("__key"))
      .agg(sum(Cols.dec2($"value")).as("sum_value"), count(lit(1)).as("n"))
      .as[(Long, BigDecimal, Long)].collect().toSet
    val salted = operators.Salting
      .saltedSumCount(e.withColumn("value", Cols.dec2($"value")), $"user_id", $"value", 8)
      .as[(Long, BigDecimal, Long)].collect().toSet
    assert(salted == direct)
  }

  test("t5: timestamp normalization handles epoch, uptime, ISO, garbage (FIXTURES F1)") {
    import spark.implicits._
    val nowStr = "2024-06-01T12:00"
    val now = Cols.tsLit("2024-06-01 12:00:00")
    val got = Seq("1758900000", "12345", "2024-01-15T10:30:00", "garbage")
      .toDF("raw")
      .select(EventOps.normalizeTs(col("raw"), now).as("ts"))
      .as[java.time.LocalDateTime].collect()
    assert(got(0) == java.time.LocalDateTime.ofEpochSecond(1758900000L, 0, java.time.ZoneOffset.UTC))
    assert(got(1) == java.time.LocalDateTime.parse(nowStr))   // uptime → now
    assert(got(2) == java.time.LocalDateTime.parse("2024-01-15T10:30"))
    assert(got(3) == java.time.LocalDateTime.parse(nowStr))   // garbage → now
  }

  test("l8 integrity: clean on generated data, dirty on mutated data") {
    import spark.implicits._
    val clean = EventOps.l8Integrity(spark, Sf0001).collect().head
    assert(clean.getAs[Long]("null_ids") == 0)
    assert(clean.getAs[Long]("duplicate_pairs") == 0)
    // mutate: inject a duplicate pair + an out-of-range value
    val e = Tables.events(spark, Sf0001).limit(1)
    val dirty = Tables.events(spark, Sf0001)
      .union(e)                                       // duplicate (user_id, ts)
      .union(e.withColumn("value", lit(5000.0))
        .withColumn("ts", Cols.tsLit("2024-01-02"))) // out-of-range value
    val dupPairs = dirty.groupBy("user_id", "ts").count().filter($"count" > 1).count()
    assert(dupPairs >= 1)
    val oob = dirty.filter($"value" < 0 || $"value" > 1000).count()
    assert(oob == 1)
  }

  test("tx_budget_select: histogram threshold equals the global greedy prefix") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFunctions.tokens
    val got = graft.analytics.TextAnalysis.txBudgetSelect(spark, Sf0001)
    // naive twin: global-window cumsum over (quality DESC, doc_id)
    val toks = tokens($"text")
    val scored = Tables.documents(spark, Sf0001)
      .select($"doc_id", size(toks).cast("long").as("n_tokens"),
        (size(array_distinct(toks)).cast("double") / size(toks)).as("quality"))
      .filter($"n_tokens" > 0)
    val total = scored.agg(sum($"n_tokens")).head().getLong(0)
    val budget = math.floor(0.4 * total.toDouble).toLong
    val w = Window.orderBy($"quality".desc, $"doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = scored.withColumn("csum", sum($"n_tokens").over(w))
      .filter($"csum" <= budget)
      .select($"doc_id", $"n_tokens", $"quality").orderBy($"doc_id")
    assert(got.collect().toSeq == want.collect().toSeq)
    // the selection actually fits the budget, and is non-trivial
    val sel = got.agg(sum($"n_tokens")).head().getLong(0)
    assert(sel <= budget && sel > 0)
    // scale shape: the only window keyed on document-scale rows is the
    // boundary cumsum, and it is PARTITIONED by the range shard (the
    // r13 degenerate-quality guard) — the histogram cumsum's
    // SinglePartition exchange carries ≤1001 rows and the shard-offset
    // cumsum ≤nShards rows, both by construction. Anchor on the
    // boundary window's OWN spec (shard partition key then quality
    // ordering): a weaker hashpartitioning-anywhere assert would stay
    // green after the window degraded to a global sort.
    // (the shard tag is a deterministic frozen-cuts expression since
    // r14 — no checkpoint, no range exchange; its exactness is covered
    // by the value fuzz tests, degenerate corpus included)
    val plan = got.queryExecution.executedPlan.toString
    assert("windowspecdefinition\\(shard#\\d+, quality#\\d+ DESC".r
      .findFirstIn(plan).isDefined,
      s"boundary window lost its shard partitioning:\n$plan")
  }

  test("tx_budget_select edges: overflowing top bucket; exact whole-bucket fit") {
    import spark.implicits._
    // Distinct-ratio quality: "a b c" = 1.0 (bucket 1000), "a a b" = 2/3
    // (bucket 666), "a a a" = 1/3 (bucket 333). 3 tokens per doc.
    def corpus(texts: (Long, String)*) =
      texts.toDF("doc_id", "text")
    // All 4 docs in the TOP bucket (12 tokens); budget = floor(0.25·12)
    // = 3 → the boundary cumsum must cut INSIDE the top bucket, keeping
    // exactly the lowest doc_id (ties in quality break by doc_id).
    val top = graft.analytics.TextAnalysis.txBudgetSelectDf(
      corpus(1L -> "a b c", 2L -> "d e f", 3L -> "g h i", 4L -> "j k l"),
      0.25).select("doc_id").as[Long].collect().toSeq
    assert(top == Seq(1L))
    // Quality ladder, budget = floor(0.5·9) = 4: bucket 1000 (3 tokens)
    // fits whole; bucket 666 (3 tokens) would overflow (6 > 4) and its
    // boundary prefix is empty (3+3 > 4); bucket 333 never reached.
    val ladder = graft.analytics.TextAnalysis.txBudgetSelectDf(
      corpus(1L -> "a b c", 2L -> "a a b", 3L -> "a a a"),
      0.5).select("doc_id").as[Long].collect().toSeq
    assert(ladder == Seq(1L))
    // Exact fit: budget = floor(0.75·9) = 6 (binary-exact fraction) —
    // two whole buckets fit with zero slack, and the third bucket's
    // boundary prefix is empty (the <= vs < edge).
    val exact = graft.analytics.TextAnalysis.txBudgetSelectDf(
      corpus(1L -> "a b c", 2L -> "a a b", 3L -> "a a a"),
      0.75).select("doc_id").as[Long].collect().toSeq
    assert(exact == Seq(1L, 2L))
    // Empty-token docs are excluded, not divide-by-zero
    val empties = graft.analytics.TextAnalysis.txBudgetSelectDf(
      corpus(1L -> "a b c", 2L -> "   "), 1.0)
      .select("doc_id").as[Long].collect().toSeq
    assert(empties == Seq(1L))
  }

  test("tx_budget_select fuzz: equals the brute-force greedy prefix on random corpora") {
    import spark.implicits._
    // Seeded random corpora spanning quality-tie-heavy shapes (tiny
    // vocabularies force many identical distinct-ratios) through
    // near-unique ones; reference = plain Scala sort + cumsum. Seeds
    // fixed: failures reproduce.
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val vocab = (0 until 5 + rnd.nextInt(60)).map(i => s"w$i")
      val corpus = (0 until 30 + rnd.nextInt(50)).map { i =>
        val len = 1 + rnd.nextInt(60)
        (i.toLong,
          (0 until len).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val frac = Seq(0.1, 0.3, 0.5, 0.8)(rnd.nextInt(4))
      val scored = corpus.map { case (id, text) =>
        val toks = text.split("\\s+").filter(_.nonEmpty)
        (id, toks.length.toLong, toks.distinct.length.toDouble / toks.length)
      }.filter(_._2 > 0)
      val budget = math.floor(frac * scored.map(_._2).sum.toDouble).toLong
      val want = scored.sortBy { case (id, _, q) => (-q, id) }
        .scanLeft((0L, -1L)) { case ((cum, _), (id, n, _)) => (cum + n, id) }
        .drop(1).takeWhile(_._1 <= budget).map(_._2).sorted
      val got = graft.analytics.TextAnalysis
        .txBudgetSelectDf(corpus.toDF("doc_id", "text"), frac)
        .select("doc_id").as[Long].collect().toSeq.sorted
      assert(got == want, s"seed=$seed frac=$frac n=${corpus.size}")
    }
  }

  test("tx_budget_select degenerate: constant-quality corpus selects exactly and stays sharded") {
    import spark.implicits._
    import graft.functions.TextFunctions.tokens
    // Every doc all-distinct tokens → quality ≡ 1.0: the WHOLE corpus
    // is the boundary bucket (machine-generated-shard shape). The old
    // bucket-partitioned window would run it as one global partition;
    // the r13 guard must (a) still select the exact greedy prefix and
    // (b) spread the boundary across range shards with no shard holding
    // more than ~n/nShards rows.
    val n = 3000
    val corpus = (0 until n).map { i =>
      val len = 1 + (i % 7)
      (i.toLong, (0 until len).map(j => s"u${i}_$j").mkString(" "))
    }
    val docs = corpus.toDF("doc_id", "text").repartition(8)
    val frac = 0.37
    val scored = corpus.map { case (id, text) =>
      (id, text.split("\\s+").count(_.nonEmpty).toLong)
    }
    val budget = math.floor(frac * scored.map(_._2).sum.toDouble).toLong
    // constant quality → greedy (quality DESC, doc_id) order is doc_id
    val want = scored.sortBy(_._1)
      .scanLeft((0L, -1L)) { case ((c, _), (id, t)) => (c + t, id) }
      .drop(1).takeWhile(_._1 <= budget).map(_._2).sorted
    val got = graft.analytics.TextAnalysis.txBudgetSelectDf(docs, frac)
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(got == want)
    assert(want.length > 1000, "degenerate case must be non-trivial")
    // run the guard's OWN shard assignment (shardByOrder — frozen
    // sampled cuts since r14) and bound the largest window partition —
    // the claim 'no partition exceeds ~n/nShards'
    val nShards = spark.sparkContext.defaultParallelism
    val toksC = tokens(col("text"))
    val shardSizes = graft.analytics.TextAnalysis.shardByOrder(
      docs.select($"doc_id", size(toksC).cast("long").as("n_tokens"),
          (size(array_distinct(toksC)).cast("double") / size(toksC)).as("quality"))
        .filter($"n_tokens" > 0),
      nShards, bySource = false)
      .groupBy($"shard").count()
      .as[(Int, Long)].collect()
    assert(shardSizes.length > 1, "degenerate corpus landed in one shard")
    val mx = shardSizes.map(_._2).max
    assert(mx <= 3L * n / nShards + 64,
      s"largest boundary shard $mx rows exceeds ~n/nShards (${n / nShards})")
  }

  test("tx_select_by_source degenerate: constant-quality dominant source selects exactly and stays sharded") {
    import spark.implicits._
    import graft.functions.TextFunctions.tokens
    // One source holds 90% of the corpus and every doc has all-distinct
    // tokens (quality ≡ 1.0): that source's whole corpus is its
    // boundary bucket, the one-giant-domain shape the per-source
    // histogram exists for.
    val n = 3000
    val corpus = (0 until n).map { i =>
      val src = if (i % 10 == 0) "small" else "big"
      val len = 1 + (i % 5)
      (i.toLong, src, (0 until len).map(j => s"v${i}_$j").mkString(" "))
    }
    val docs = corpus.toDF("doc_id", "source", "text").repartition(8)
    val pct = 40
    val want = corpus.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val nSrc = rows.size.toLong
      // constant quality → rank within source is doc_id order
      rows.sortBy(_._1).zipWithIndex.collect {
        case ((id, _, _), idx) if (idx + 1) * 100 <= nSrc * pct => id
      }
    }.sorted
    val got = graft.analytics.TextAnalysis.txSelectBySourceDf(docs, pct)
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(got == want)
    assert(want.length > 1000, "degenerate case must be non-trivial")
    val nShards = spark.sparkContext.defaultParallelism
    val toksC = tokens(col("text"))
    val shardSizes = graft.analytics.TextAnalysis.shardByOrder(
      docs.select($"doc_id", $"source", size(toksC).cast("long").as("n_tokens"),
          (size(array_distinct(toksC)).cast("double") / size(toksC)).as("quality"))
        .filter($"n_tokens" > 0),
      nShards, bySource = true)
      .groupBy($"source", $"shard").count()
      .as[(String, Int, Long)].collect()
    assert(shardSizes.count(_._1 == "big") > 1,
      "dominant source landed in one shard")
    val mx = shardSizes.map(_._3).max
    assert(mx <= 3L * n / nShards + 64,
      s"largest (source, shard) window $mx rows exceeds ~n/nShards (${n / nShards})")
  }

  test("tx_select_by_source: histogram threshold equals the per-source rank window") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFunctions.tokens
    val got = graft.analytics.TextAnalysis.txSelectBySource(spark, Sf0001)
    val toks = tokens($"text")
    val scored = Tables.documents(spark, Sf0001)
      .select($"doc_id", $"source", size(toks).cast("long").as("n_tokens"),
        (size(array_distinct(toks)).cast("double") / size(toks)).as("quality"))
      .filter($"n_tokens" > 0)
    val wr = Window.partitionBy($"source").orderBy($"quality".desc, $"doc_id")
    val want = scored
      .withColumn("rk", row_number().over(wr).cast("long"))
      .withColumn("n_src", count(lit(1)).over(Window.partitionBy($"source")))
      .filter($"rk" * 100 <= $"n_src" * 40)
      .select($"doc_id", $"source", $"n_tokens", $"quality").orderBy($"doc_id")
    assert(got.collect().toSeq == want.collect().toSeq)
    // scale shape: the only document-scale window is the boundary one,
    // and it keeps its (source, shard) partitioning (the r13
    // degenerate-quality guard). Anchor on the row_number window's OWN
    // spec — a hashpartitioning-anywhere assert would stay green after
    // the window degraded to per-source global ranking.
    val plan = got.queryExecution.executedPlan.toString
    assert(("row_number\\(\\) windowspecdefinition\\(" +
      "source#\\d+, shard#\\d+, quality#\\d+ DESC").r
      .findFirstIn(plan).isDefined,
      s"boundary window lost its (source, shard) partitioning:\n$plan")
  }

  test("tx_select_by_source fuzz: equals the per-source brute-force ranking") {
    import spark.implicits._
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(100 + seed)
      val nSrc = 1 + rnd.nextInt(6)
      val corpus = (0 until 40 + rnd.nextInt(60)).map { i =>
        val len = rnd.nextInt(30) // includes empty docs
        val vocab = 3 + rnd.nextInt(15) // tiny vocab: quality-tie-heavy
        (i.toLong, s"s${rnd.nextInt(nSrc)}",
          (0 until len).map(_ => s"w${rnd.nextInt(vocab)}").mkString(" "))
      }
      val pct = Seq(10, 25, 40, 50, 75)(rnd.nextInt(5))
      val scored = corpus.flatMap { case (id, src, text) =>
        val t = text.split("\\s+").filter(_.nonEmpty)
        if (t.isEmpty) None
        else Some((id, src, t.length.toLong, t.distinct.length.toDouble / t.length))
      }
      val want = scored.groupBy(_._2).toSeq.flatMap { case (_, docs) =>
        val n = docs.size
        docs.sortBy { case (id, _, _, q) => (-q, id) }
          .zipWithIndex
          .filter { case (_, idx) => (idx + 1) * 100 <= n * pct }
          .map(_._1._1)
      }.sorted
      val got = graft.analytics.TextAnalysis
        .txSelectBySourceDf(corpus.toDF("doc_id", "source", "text"), pct)
        .select("doc_id").as[Long].collect().toSeq.sorted
      assert(got == want, s"seed=$seed pct=$pct nSrc=$nSrc")
    }
  }

  test("tx_winnow: sharing guarantee, short-doc window, zero rows") {
    import spark.implicits._
    // two docs share an 8-token run (= w + k − 1 at the 5/4 defaults)
    // amid doc-unique filler → the winnowing guarantee forces ≥1 shared
    // selected hash in BOTH docs
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    val docs = Seq(
      (1L, s"a1 a2 a3 a4 $shared b1 b2 b3"),
      (2L, s"c1 c2 $shared d1 d2 d3 d4 d5"),
      (3L, "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10"), // no overlap with anyone
      (4L, "f1 f2 f3 f4 f5 f6"), // n_grams = 2 < w: one whole-array window
      (5L, "g1 g2 g3"),          // < k tokens: all-zero row
      (6L, "")
    ).toDF("doc_id", "text")
    val r = graft.analytics.TextAnalysis.txWinnowDf(docs, 5, 4)
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Long]("n_shared") >= 1 && r(2L).getAs[Long]("n_shared") >= 1)
    assert(r(3L).getAs[Long]("n_shared") == 0)
    assert(r(4L).getAs[Long]("n_windows") == 1 && r(4L).getAs[Long]("n_prints") == 1)
    assert(r(5L).getAs[Long]("n_grams") == 0 &&
      r(5L).getAs[Double]("winnow_density") == 0.0)
    assert(r(6L).getAs[Long]("n_grams") == 0 && r(6L).getAs[Long]("n_shared") == 0)
    // real corpus: every winnowed doc keeps 1 ≤ n_prints ≤ n_windows
    val c = graft.analytics.TextAnalysis.txWinnow(spark, Sf0001)
      .filter($"n_windows" > 0).collect()
    assert(c.nonEmpty)
    c.foreach { x =>
      val np = x.getAs[Long]("n_prints")
      assert(np >= 1 && np <= x.getAs[Long]("n_windows"), x.toString)
    }
  }

  test("sample_stratified: equals the rank-window twin; bounded-heap plan") {
    val got = graft.analytics.TextAnalysis.sampleStratified(spark, Sf0001)
    val rows = Tables.documents(spark, Sf0001).select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val want = rows.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      ds.toSeq.map { case (id, _) =>
        (src, id, graft.functions.TextHash.hash60(s"strat|$id") % (1L << 40)) }
        .sortBy { case (_, id, h) => (h, id) }.take(10).zipWithIndex
        .map { case ((s2, id, h), i) => (s2, (i + 1).toLong, id, h) }
    }.toSet
    val gotSet = got.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(gotSet == want)
    // scale shape: two-phase bounded-heap aggregate, never a per-source
    // rank window over the corpus
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"rank window crept in:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  test("emb_topk plan: two-phase aggregate with map-side partial, no rank window") {
    val plan = graft.similarity.Similarity.embTopk(spark, Sf0001)
      .queryExecution.executedPlan.toString
    // the scale-killer formulation would show a Window over the full
    // pair set; the bounded-heap Aggregator shows partial + final
    // ObjectHashAggregate instead, so only k-row states cross the wire
    assert(!plan.contains("Window"), s"rank window crept back in:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.toLowerCase.contains("partial_topkbycos") ||
      plan.contains("partial_"), s"no map-side partial aggregation:\n$plan")
  }
}
