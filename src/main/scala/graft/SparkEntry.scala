package graft

import graft.analytics.{EventAnalytics => EA, Relational => R, TextAnalysis => TX}
import graft.dedup.Dedup
import graft.operators.{EventOps => T, Multimodal}
import graft.serde.AvroPipeline
import graft.similarity.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (one entry per implemented
  * SURVEY.md §2 operator); `oracleSql` carries the DuckDB-equivalent SQL
  * for the driver's correctness gate. Column names are aligned
  * one-to-one between the Spark result and the oracle result.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    R.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational / star-schema (SURVEY §2.5, §2.6)
    "q1_pricing_summary"  -> (R.q1PricingSummary(_, _)),
    "q3_top_revenue"      -> (R.q3TopRevenue(_, _)),
    "q5_region_revenue"   -> (R.q5RegionRevenue(_, _)),
    "join_semi_orders"    -> (R.joinSemiOrders(_, _)),
    "join_anti_customers" -> (R.joinAntiCustomers(_, _)),
    "q6_forecast_revenue" -> (R.q6ForecastRevenue(_, _)),
    "topk_orders"         -> (R.topkOrders(_, _)),
    "brand_price_agg"     -> (R.brandPriceAgg(_, _)),
    // aggregations (SURVEY §2.3)
    "a1_device_summary"       -> (EA.a1DeviceSummary(_, _)),
    "a2_hourly_agg"           -> (EA.a2HourlyAgg(_, _)),
    // week/month time_bucket parity pins (SURVEY §7.4#3): date_trunc
    // week/month vs DuckDB time_bucket, certified by the oracle gate
    "a2_weekly_agg"           -> (EA.a2WeeklyAgg(_, _)),
    "a2_monthly_agg"          -> (EA.a2MonthlyAgg(_, _)),
    // A12 continuous aggregate END-TO-END (r12 verdict #4): stale
    // materialize → refreshRange → servedHourly, hashed against the
    // a2_hourly_agg oracle — the served rollup equals the reference's
    // fully-refreshed continuous aggregate (init.sql:324-345)
    "served_hourly"           -> (graft.store.Backfill.servedHourlyCertified(_, _)),
    "a3_daily_agg"            -> (EA.a3DailyAgg(_, _)),
    "a4_device_stats"         -> (EA.a4DeviceStats(_, _)),
    "a5_timeseries_stats"     -> (EA.a5TimeseriesStats(_, _)),
    "a6_daily_distribution"   -> (EA.a6DailyDistribution(_, _)),
    "a7_rollup_15min"         -> (EA.a7Rollup15min(_, _)),
    "a8_range_agg"            -> (EA.a8RangeAgg(_, _)),
    "a9_table_stats"          -> (EA.a9TableStats(_, _)),
    "a10_recent_distribution" -> (EA.a10RecentDistribution(_, _)),
    "a11_duplicate_detection" -> (EA.a11DuplicateDetection(_, _)),
    // funnel + cohort analytics (three narrow aggregates / two
    // aggregates and a key join — no full-stream windows)
    "funnel_stages"    -> (EA.funnelStages(_, _)),
    "cohort_retention" -> (EA.cohortRetention(_, _)),
    // mergeable-sketch distinct counting (re-aggregation property);
    // deterministic-part hash gate: exact count + band booleans (sketch
    // bytes stay engine-side, certified by each engine's own band check)
    "a6_sketch_merge"  -> (TX.a6SketchMerge(_, _)),
    "a6_quantile_merge" -> (TX.a6QuantileMerge(_, _)),
    // window analytics (SURVEY §2.4)
    "w1_gap_detection"  -> (EA.w1GapDetection(_, _)),
    "w2_moving_avg"     -> (EA.w2MovingAvg(_, _)),
    "w3_rate_of_change" -> (EA.w3RateOfChange(_, _)),
    "w4_session_windows" -> (EA.w4SessionWindows(_, _)),
    "agg_rollup"         -> (EA.aggRollup(_, _)),
    "pivot_user_type"    -> (EA.pivotUserType(_, _)),
    // as-of join (most-recent-prior-state; union + running-last window —
    // sort-merge-join cost, no range-join pair explosion)
    "asof_join_purchase" -> (graft.operators.AsofJoin.asofPurchaseJoin(_, _)),
    // keyless interval join via epoch bucketing + exact refine (the
    // shape Catalyst alone can only plan as a nested loop)
    "range_join_burst" -> (graft.operators.RangeJoin.rangeJoinBurst(_, _)),
    // sorts / limits (SURVEY §2.6)
    "o1_recent_readings"   -> (EA.o1RecentReadings(_, _)),
    "o2_anomalous_readings"-> (EA.o2AnomalousReadings(_, _)),
    "o3_recent_topn"       -> (EA.o3RecentTopN(_, _)),
    // row transforms + integrity (SURVEY §2.2, §2.7)
    "t1_fanout"        -> (T.t1Fanout(_, _)),
    "t4_battery_pct"   -> (T.t4BatteryPct(_, _)),
    "t5_normalize_ts"  -> (T.t5NormalizeTs(_, _)),
    "t6_clamp_ts"      -> (T.t6ClampTs(_, _)),
    "t7_valid_counts"  -> (T.t7ValidCounts(_, _)),
    "t9_anomaly_flags" -> (T.t9AnomalyFlags(_, _)),
    "t10_alerts"       -> (T.t10Alerts(_, _)),
    "l8_integrity"     -> (T.l8Integrity(_, _)),
    // text analysis (north-star extensions)
    "tx_tokens"      -> (TX.txTokens(_, _)),
    "tx_tokens_bpe"  -> (TX.txTokensBpe(_, _)),
    // distributed BPE merge TRAINING: the learned k-merge table, each
    // round one vocab-bounded pair-count agg + a 1-row argmax collect
    "tx_bpe_train"   -> (TX.txBpeTrain(_, _)),
    // BPE ENCODING with the learned table: per-doc token counts after
    // the k merges — one narrow corpus pass, no vocabulary join
    "tx_bpe_encode"  -> (TX.txBpeEncode(_, _)),
    "tx_split"       -> (TX.txSplit(_, _)),
    // concat-and-chunk packing (GPT-style, complements
    // pack_sequences' bin assignment): exact 512-token sequence
    // splits with within-doc spans; two-phase prefix sum so the
    // corpus never serializes through a global-order window
    "tx_pack_chunk"  -> (TX.txPackChunk(_, _)),
    // concat-and-chunk packing in the SHUFFLED epoch order (the
    // loader's order): shard = pack bucket, same two-phase prefix
    "tx_pack_shuffled" -> (TX.txPackShuffled(_, _)),
    "tx_quality"     -> (TX.txQuality(_, _)),
    // token-budget selection: histogram-threshold greedy prefix
    "tx_budget_select" -> (TX.txBudgetSelect(_, _)),
    // per-source top-40% quality calibration: the same histogram
    // threshold generalized per-group (no per-source global sort)
    "tx_select_by_source" -> (TX.txSelectBySource(_, _)),
    // DSIR (importance resampling): hashed-gram bucket model (≤1024
    // rows however big the corpus) + broadcast scoring; the resample is
    // hash-derived Gumbel-top-k — deterministic without an RNG
    "tx_dsir_weights" -> (TX.txDsirWeights(_, _)),
    "tx_dsir_select"  -> (TX.txDsirSelect(_, _)),
    // the DSIR model through the DURABLE streaming sink: per-batch
    // counter segments, fold, score-at-arrival — two parity deliveries
    // hash-checked against a relational two-step oracle
    "tx_dsir_incremental" -> (TX.txDsirIncremental(_, _)),
    // hashed multinomial NB lang-ID trained on the 90% hash split,
    // scored on the 5% test split — certified as a confusion matrix
    "tx_nb_langid"    -> (TX.txNbLangid(_, _)),
    // CCNet perplexity bucketing: cross-entropy under the target-slice
    // hashed-bucket LM, head/middle/tail via quantized-histogram cuts
    // (no global sort, no data-plane window)
    "tx_ccnet_ppl"    -> (TX.txCcnetPpl(_, _)),
    // CCNet's cut geometry: per-LANGUAGE tertiles — every language is
    // scored under the single targetLang LM (CCNet proper trains one
    // LM per language), but the head/middle/tail cuts are per-language
    "tx_ccnet_ppl_by_lang" -> (TX.txCcnetPplByLang(_, _)),
    // winnowing fingerprints (MOSS): rightmost-min-per-window selection
    // over positional 5-gram hashes + cross-doc shared-print counts
    "tx_winnow" -> (TX.txWinnow(_, _)),
    "tx_repetition"  -> (TX.txRepetition(_, _)),
    "tx_langid"      -> (TX.txLangid(_, _)),
    "tx_fingerprint" -> (TX.txFingerprint(_, _)),
    "tx_contains"    -> (TX.txContains(_, _)),
    "tx_entropy"     -> (TX.txEntropy(_, _)),
    // corpus-unigram surprisal (perplexity-filter core): model = one
    // token-count agg, scoring = shuffle join on token + per-doc agg
    "tx_unigram_bits" -> (TX.txUnigramBits(_, _)),
    // exact heavy hitters via the mergeable Misra-Gries summary:
    // candidate superset in one O(k)-state pass, exact re-count of
    // candidates only — no full-vocabulary shuffle
    "tx_heavy_hitters" -> (TX.txHeavyHitters(_, _)),
    "tx_heavy_hitters_by_source" -> (TX.txHeavyHittersBySource(_, _)),
    // Count-Min point-frequency estimates certified against exact
    // counts (fixed hash rows -> the counter matrix is deterministic,
    // so the estimates themselves are full-hash oracle'd)
    "tx_freq_cm" -> (TX.txFreqCm(_, _)),
    // fixed-window chunking with overlap (context-window prep) and
    // per-doc TF-IDF keyword extraction (search/tagging surface)
    "tx_chunk"    -> (TX.txChunk(_, _)),
    "tx_keywords" -> (TX.txKeywords(_, _)),
    // substring-level dedup signals: spans covered by cross-document
    // repeated 8-grams (the boilerplate stage doc-level dedup misses)
    "tx_boilerplate" -> (TX.txBoilerplate(_, _)),
    "tx_boilerplate_apply" -> (TX.txBoilerplateApply(_, _)),
    "tx_filter"      -> (TX.txFilter(_, _)),
    // per-language corpus rollup (the release dashboard of a corpus
    // build): counts, token mass, means, shares
    "corpus_report"  -> (TX.corpusReport(_, _)),
    // PII scrub: regex redaction (email/IP/phone) with audit counts over
    // a deterministically-planted corpus — oracle runs the same automaton
    "tx_redact"      -> (TX.txRedact(_, _)),
    // train/eval verbatim-overlap audit over the hash-split corpus with
    // planted contamination (the eval gram set is the broadcast side)
    "decontaminate"  -> (TX.decontaminate(_, _)),
    // incremental decontamination against a FROZEN persisted benchmark
    // gram index: two deliveries, each checked vs the index alone
    "decontaminate_incremental" -> (TX.decontaminateIncremental(_, _)),
    // the same pipeline through the durable ManifestFeed streaming
    // sink: per-batch flagged segments against the on-disk index
    "decontaminate_incremental_sink" -> (TX.decontaminateIncrementalSink(_, _)),
    "sample_documents" -> (TX.txSample(_, _)),
    // balanced per-source eval slice: bounded-heap top-N per source on
    // a content-addressed key — no rank window, no per-source sort
    "sample_stratified" -> (TX.sampleStratified(_, _)),
    // content-addressed per-epoch shuffle (reproducible training order)
    "shuffle_documents" -> (TX.txShuffle(_, _)),
    // Efraimidis-Spirakis weighted sampling (deterministic u from hash)
    "weighted_sample"   -> (TX.txWeightedSample(_, _)),
    // per-language token-budget admission (training-mix rebalancing);
    // two-phase bucketed cumsum — no whole-language window partitions
    "corpus_mix"       -> (TX.corpusMix(_, _)),
    // α=1/2 temperature reweighting over the same admission machinery;
    // all-integer per-language budgets (isqrt of exact token mass)
    "corpus_mix_temperature" -> (TX.corpusMixTemperature(_, _)),
    "pack_sequences"   -> (TX.txPack(_, _)),
    "a6_approx_distribution" -> (TX.approxDistribution(_, _)),
    // the registered-SQL-function surface (SparkSessionExtensions /
    // FunctionRegistry): native kernels reached through pure SQL text
    "sql_surface" -> (graft.functions.GraftFunctions.sqlSurface(_, _)),
    // deduplication (north-star extensions)
    "dedup_exact"         -> (Dedup.dedupExact(_, _)),
    "dedup_ngram_jaccard" -> (Dedup.dedupNgramJaccard(_, _)),
    // asymmetric containment (excerpt/superset duplication — the case
    // size-mismatched Jaccard misses); directed (contained, container)
    "dedup_containment"   -> (Dedup.dedupContainment(_, _)),
    // containment APPLY: excerpt removal, keep-the-larger semantics
    "dedup_apply_containment" -> (Dedup.dedupApplyContainment(_, _)),
    "dedup_minhash_lsh"   -> (Dedup.dedupMinhashLsh(_, _)),
    // sub-document granularity: txChunk's chunks through the same
    // MinHash-LSH family, chunk-dup pairs rolled up to doc pairs
    "dedup_chunks"        -> (Dedup.dedupChunks(_, _)),
    "dedup_simhash"       -> (Dedup.dedupSimhash(_, _)),
    // banded-family occupancy introspection (r17 verdict #1's loud
    // report): collapse group structure + rep band occupancy vs the
    // hot cap, one row per family — the emb_ivf_cell_stats twin
    "dedup_band_stats"    -> (Dedup.dedupBandStats(_, _)),
    // perceptual-hash IMAGE near-dup (multimodal × dedup): dHash over
    // real PNG-decoded rasters, simhash-style banded Hamming join —
    // never all-pairs; planted 2-block retouches are guaranteed hits
    "dedup_phash"         -> (Dedup.dedupPhash(_, _)),
    "dedup_phash_apply"   -> (Dedup.dedupPhashApply(_, _)),
    // incremental image dedup: bases as delivery 1 build a fingerprint
    // index; the retouched copies (delivery 2) die against the INDEX —
    // the accumulated corpus's images are never re-decoded
    "dedup_phash_incremental" -> (Dedup.dedupPhashIncremental(_, _)),
    // the same two deliveries through the DURABLE streaming sink
    // (ManifestFeed-gated multi-file deliveries, checkpointed query,
    // per-batch survivor + fingerprint-delta segments) — same oracle
    "dedup_phash_incremental_sink" ->
      (Dedup.dedupPhashIncrementalSink(_, _)),
    // lossy-survival audit: a JPEG-recompressed copy must stay inside
    // the detector's Hamming threshold AND keep a full band (the two
    // properties that make the banded detector catch recompressed
    // duplicates) — certified through two real codec cycles per row
    "dedup_phash_jpeg" -> ((s, d) => Multimodal.mmPhashJpegSurvival(s, d)),
    // AUDIO near-dup (the phash family's modality twin): 60-bit
    // energy-delta fingerprints of really WAV-decoded clips through
    // the SAME banded Hamming join; planted 2-window edits are
    // guaranteed hits
    "dedup_audio"       -> (Dedup.dedupAudio(_, _)),
    "dedup_audio_apply" -> (Dedup.dedupAudioApply(_, _)),
    // lossy-survival audit: a μ-law-companded copy (the JDK's real
    // ULAW codec) must stay inside the detector's Hamming threshold
    // AND keep a full band — certified through two real codec cycles
    "dedup_audio_ulaw" -> ((s, d) => Multimodal.mmAudioUlawSurvival(s, d)),
    // incremental audio dedup: base clips as delivery 1 build the
    // fingerprint index; the edited copies (delivery 2) die against
    // the INDEX — accumulated audio is never re-decoded
    "dedup_audio_incremental" -> (Dedup.dedupAudioIncremental(_, _)),
    // the same two deliveries through the DURABLE streaming sink —
    // same oracle verbatim
    "dedup_audio_incremental_sink" ->
      (Dedup.dedupAudioIncrementalSink(_, _)),
    // VIDEO near-dup (the image family lifted one level): per-sampled-
    // frame dHash through the frame-aligned banded join, then a frame
    // VOTE (≥2 of the 3 sampled frames at Hamming ≤4) — the planted
    // copies carry per-frame retouches plus one full scene cut, so
    // they vote exactly 2-of-3
    "dedup_video"       -> (Dedup.dedupVideo(_, _)),
    "dedup_video_apply" -> (Dedup.dedupVideoApply(_, _)),
    // incremental video dedup: base clips as delivery 1 build the
    // per-frame fingerprint index; the copies (delivery 2) die by
    // frame VOTE against the INDEX — accumulated video never
    // re-decoded
    "dedup_video_incremental" -> (Dedup.dedupVideoIncremental(_, _)),
    // the same two deliveries through the DURABLE streaming sink —
    // same oracle verbatim
    "dedup_video_incremental_sink" ->
      (Dedup.dedupVideoIncrementalSink(_, _)),
    // lossy-survival audit (the matrix-completing third: image x JPEG,
    // audio x mu-law, video x per-frame JPEG): every sampled frame of
    // a recompressed video stays inside the detector's reach, so every
    // frame vote survives - certified through real codec cycles
    "dedup_video_jpeg" -> ((s, d) => Multimodal.mmVideoJpegSurvival(s, d)),
    // winnowed-fingerprint pairs (MOSS): guaranteed detection of shared
    // ≥8-token runs from the ~0.4× winnow index, inverted-index join
    "dedup_winnow"        -> (Dedup.dedupWinnow(_, _)),
    // exact-substring dedup (Lee et al. 2022 §4, gram-anchored):
    // longest verbatim cross-doc token runs via diagonal islands
    "dedup_exact_runs"    -> (Dedup.dedupExactRuns(_, _)),
    "dedup_exact_runs_apply" -> (Dedup.dedupExactRunsApply(_, _)),
    // the exact-runs detector delivered incrementally through the
    // DURABLE streaming sink (append-only gram-segment index, capped
    // over index ∪ batch) — two parity deliveries, report read back
    // from segments, hash-checked against a relational two-step oracle
    "dedup_exact_runs_incremental" ->
      (Dedup.dedupExactRunsIncremental(_, _)),
    "dedup_clusters"      -> (Dedup.dedupClusters(_, _)),
    "dedup_apply"         -> (Dedup.dedupApply(_, _)),
    // apply over the UNIONED pair graphs of all three near-dup
    // detectors (ngram ∪ simhash ∪ embedding) — the full-stack corpus
    "dedup_apply_all"     -> (Dedup.dedupApplyAll(_, _)),
    // CROSS-MODAL joint apply: drop a document when EITHER its text
    // matches (dedup_apply_all's unioned pair graph) OR its attached
    // media near-matches another doc's (phash pairs mapped through
    // the media→doc attachment) — the apply a real pipeline runs
    "dedup_apply_multimodal" -> (Dedup.dedupApplyMultimodal(_, _)),
    // incremental (per-delivery) dedup against a signature index — the
    // accumulated corpus's text is never re-read
    "dedup_incremental"   -> (Dedup.dedupIncremental(_, _)),
    // the same two deliveries through the DURABLE streaming sink
    // (startIncrementalSink): real checkpointed query, per-batch
    // segment writes, corpus read back from disk — same oracle
    "dedup_incremental_sink" -> (Dedup.dedupIncrementalSink(_, _)),
    "dedup_clusters_simhash" -> (Dedup.dedupClustersSimhash(_, _)),
    "dedup_embedding"     -> (Similarity.dedupEmbedding(_, _)),
    // exact O(n^2) path at the LSH operating threshold — benched
    // head-to-head against dedup_embedding_lsh (same result set)
    "dedup_embedding_045" -> (Similarity.dedupEmbedding(_, _, 0.45)),
    // the scale default: threshold-aware dispatch — LSH buckets -> exact
    // refine when the derived index is selective, exact scan when the
    // threshold sits below the LSH break-even (0.45 does); hash-checked
    // against the full O(n^2) pair set either way
    "dedup_embedding_lsh" -> (Similarity.dedupEmbeddingLsh(_, _)),
    // the showcase at the TRUE near-dup operating point (0.9, planted
    // 3-clique near-dups): LSH vs exact twin, benched head-to-head
    "dedup_embedding_090"     -> (Similarity.dedupEmbedding090(_, _)),
    "dedup_embedding_lsh_090" -> (Similarity.dedupEmbeddingLsh090(_, _)),
    // detect -> cluster -> keep-canonical over the embedding-LSH pairs
    "dedup_clusters_embedding" -> (Dedup.dedupClustersEmbedding(_, _)),
    // SemDeDup: k-means cells (shared with IVF), near-dup prune WITHIN
    // cells only — pair space n^2/k, partitioned by cell
    "dedup_semantic" -> (Similarity.dedupSemantic(_, _)),
    // similarity search (north-star extensions)
    "emb_topk"            -> (Similarity.embTopk(_, _)),
    // MMR diversity re-rank over the top-C candidates: native greedy
    // selection per query, 6-dp/tie-break deterministic
    "emb_mmr_topk"        -> (graft.similarity.Mmr.embMmrTopk(_, _)),
    // MMR from the persisted PQ index: candidates AND pairwise sims
    // from index tables only — no embeddings scan on the serve side
    "emb_mmr_serve"       -> (graft.store.AnnIndex.embMmrServe(_, _)),
    // knn GRAPH: top-k neighbors for EVERY vector (query set = corpus) —
    // exact by contract (the recall oracle for the LSH-bucketed variant)
    "emb_knn_graph"       -> (Similarity.embKnnGraph(_, _)),
    // the bucketed scale path of the knn graph: LSH candidate buckets →
    // distinct pairs → one exact-cosine refine → bounded-heap top-k;
    // full hash gate (the oracle replays the deterministic pipeline)
    "emb_knn_graph_lsh"   -> (Similarity.embKnnGraphLshQ(_, _)),
    // int8 symmetric quantization + integer-dot candidate cut + exact
    // rescore: the memory-bound ANN path (4x scan/shuffle shrink)
    "emb_quantized_topk"  -> (Similarity.embQuantizedTopk(_, _)),
    // product quantization + asymmetric distance: per-subspace codebooks
    // (deterministic Lloyd), 8-nibble codes, LUT-summed candidate cut,
    // exact rescore — the 64x-compression ANN path
    "emb_pq_topk"         -> (Similarity.embPqTopk(_, _)),
    "emb_ivf_topk"        -> (Similarity.embIvfTopk(_, _)),
    // the PERSISTED index twins (store.AnnIndex): build-once to parquet
    // tables, then answer top-k FROM the index — the serve plan scans
    // codes/lists only, never the embeddings table
    "emb_pq_serve"        -> (graft.store.AnnIndex.embPqServe(_, _)),
    // filtered vector search: predicate on the index's attrs sidecar
    // pre-filters the code scan (semi-join) — embeddings-free
    "emb_pq_serve_filtered" -> (graft.store.AnnIndex.embPqServeFiltered(_, _)),
    // the two-tier serve: ADC cut from codes, rescore from the index's
    // own SQ8 int8 table — still embeddings-free
    "emb_pq_serve_sq8"    -> (graft.store.AnnIndex.embPqServeSq8(_, _)),
    // tombstone deletes: the takedown path — deleted ids anti-joined
    // out of every serve without rebuilding the index
    "emb_pq_serve_tombstone" -> (graft.store.AnnIndex.embPqServeTombstone(_, _)),
    // tombstone + FOLD: deleted rows physically removed by compaction
    // before serve — shares the tombstone oracle (fold ≡ identity)
    "emb_pq_serve_compacted" -> (graft.store.AnnIndex.embPqServeCompacted(_, _)),
    "emb_ivf_serve"       -> (graft.store.AnnIndex.embIvfServe(_, _)),
    // the DIALED serve: nprobe resolved from the dial manifest the
    // build measured (recall@5 per rung vs the exact panel) against a
    // target recall of 0.5 — same routed, partition-pruned scan
    "emb_ivf_serve_dialed" -> (graft.store.AnnIndex.embIvfServeDialed(_, _)),
    // dial introspection (the L9 surface for the dial): the persisted
    // manifest rows, certified against the relational replay of the
    // build-time measurement - the manifest's bytes, not just the
    // serve that reads them
    "emb_ivf_dial_stats" -> (graft.store.AnnIndex.embIvfDialStats(_, _)),
    // filtered ANN: top-k within a metadata slice (label = 3) — the
    // labeled index evaluates the predicate as a pushed parquet filter
    // on the routed scan, with nprobe 2 → 4 for the thinner pool
    "emb_ivf_serve_filtered" -> (graft.store.AnnIndex.embIvfServeFiltered(_, _)),
    // the filtered DIALED serve: the labeled index's own dial (recall
    // measured over the label slice at build) resolves the filtered
    // nprobe from a target — the 2→4 compensation as a stated target
    "emb_ivf_serve_filtered_dialed" ->
      (graft.store.AnnIndex.embIvfServeFilteredDialed(_, _)),
    // the COMPOSED index dials too: IVFPQ's dial prices routing AND
    // compression loss together — resolved at target 0.5, same routed
    // ADC serve
    "emb_ivfpq_serve_dialed" ->
      (graft.store.AnnIndex.embIvfPqServeDialed(_, _)),
    // the filtered-serve recall audit: exact filtered top-5 vs the
    // nprobe=4 filtered serve — prices the filtered-search dial
    "emb_ivf_filtered_recall" -> (graft.store.AnnIndex.embIvfFilteredRecall(_, _)),
    // the same audit on ANN's operating geometry (planted clusters,
    // labels pmod 16): the uniform row above is the adversarial floor,
    // this is where the filtered nprobe default is justified
    "emb_ivf_filtered_recall_clustered" ->
      (graft.store.AnnIndex.embIvfFilteredRecallClustered(_, _)),
    // incremental maintenance: build on the base half, APPEND the
    // delta against the frozen quantizers, serve — the oracle trains
    // on the base half only, so the hash certifies the append contract
    "emb_ivf_append_serve" -> (graft.store.AnnIndex.embIvfAppendServe(_, _)),
    // the composed index: coarse IVF routing over cell-partitioned PQ
    // codes (the FAISS IVFPQ layout) — probe prunes to nprobe code
    // partitions, ADC reads nibbles, no float vector touched at serve
    "emb_ivfpq_serve"     -> (graft.store.AnnIndex.embIvfPqServe(_, _)),
    // the composed index's two-tier serve: routed ADC cut + SQ8
    // rescore (the FAISS IVFPQ+refine shape), embeddings-free
    "emb_ivfpq_serve_sq8" -> (graft.store.AnnIndex.embIvfPqServeSq8(_, _)),
    // recall@5 audit of the PQ serve vs the exact scan (index-quality
    // monitoring — the measurement of the 64×-compression trade) and
    // the per-cell census of the IVF lists (the skew dial's gauge)
    "emb_pq_recall"       -> (graft.store.AnnIndex.embPqRecall(_, _)),
    "emb_ivfpq_recall"    -> (graft.store.AnnIndex.embIvfPqRecall(_, _)),
    // the same audit on ANN's operating geometry (planted clusters):
    // the uniform panel is PQ's adversarial floor, this is the recall
    // the nprobe/cut defaults are justified on (0.96 at nprobe=2)
    "emb_ivfpq_recall_clustered" ->
      (graft.store.AnnIndex.embIvfPqRecallClustered(_, _)),
    "emb_ivf_cell_stats"  -> (graft.store.AnnIndex.embIvfCellStats(_, _)),
    // the census wired to its ALARM: physical partitions over the
    // 4×-uniform bound the split discipline enforces (0 when healthy)
    "emb_ivf_cell_guard"  -> (graft.store.AnnIndex.embIvfCellGuard(_, _)),
    // hybrid retrieval: BM25 inverted-index leg + exact-cosine leg,
    // reciprocal-rank fusion over the two top-20 lists (the two-leg
    // RAG/search stack; doc_id ≡ vec_id in this corpus)
    "hybrid_topk"         -> (graft.similarity.Hybrid.hybridTopk(_, _)),
    // per-hit citation snippets: the 32-token window maximizing
    // query-term instances (all-integer argmax, earliest-start ties)
    "hybrid_snippets"     -> (graft.similarity.Hybrid.hybridSnippets(_, _)),
    // BM25 from the persisted lexical index (store.TextIndex): serve
    // never re-tokenizes the corpus — documents-free, like the ANN serves
    "lex_bm25_serve"      -> (graft.store.TextIndex.lexBm25Serve(_, _)),
    // build half + exactly-once append of the other half; additive
    // BM25 stats make append ≡ rebuild, certified by the shared oracle
    "lex_bm25_append_serve" -> (graft.store.TextIndex.lexBm25AppendServe(_, _)),
    // append + FOLD: df/stats delta segments collapsed to exact sums
    // before serve — shares the one-shot serve oracle (fold ≡ identity)
    "lex_bm25_compact_serve" -> (graft.store.TextIndex.lexBm25CompactServe(_, _)),
    // takedown parity with the ANN stores: tombstoned postings plus
    // negative df/stats deltas ≡ an index built without those docs
    "lex_bm25_serve_tombstone" -> (graft.store.TextIndex.lexBm25ServeTombstone(_, _)),
    // the whole hybrid stack from the persisted stores: postings-table
    // BM25 + PQ ADC dense leg, RRF-fused — no base-table scan anywhere
    "hybrid_serve"        -> (graft.similarity.Hybrid.hybridServe(_, _)),
    // the dialed hybrid: same two-leg served plan, (c, rrf_k, w_lex)
    // resolved from the persisted build-time quality dial
    "hybrid_serve_dialed" -> (graft.similarity.Hybrid.hybridServeDialed(_, _)),
    // the dial manifest itself, certified (emb_ivf_dial_stats twin)
    "hybrid_dial_stats"   -> (graft.similarity.Hybrid.hybridDialStats(_, _)),
    // ranking-quality evaluation of the hybrid hits: precision@5, MRR,
    // nDCG@5 with label-match relevance (corpus ground truth)
    "retrieval_metrics"   -> (graft.similarity.Hybrid.retrievalMetrics(_, _)),
    // L9-style introspection for the persisted stores: actual sub-table
    // row counts vs corpus-predicted cardinalities (structural gate)
    "store_manifest"      -> (graft.store.Manifest.storeManifest(_, _)),
    "emb_label_centroids" -> (Similarity.embLabelCentroids(_, _)),
    "emb_norms"           -> (Similarity.embNorms(_, _)),
    "emb_lsh_buckets"     -> (Similarity.embLshBuckets(_, _)),
    // multimodal columns (north-star extensions): decode+features,
    // box-average resize, frame sampling — all through a REAL decode
    "mm_features" -> (Multimodal.mmFeatures(_, _)),
    "mm_resize"   -> (Multimodal.mmResize(_, _)),
    "mm_frames"   -> (Multimodal.mmFrames(_, _)),
    "mm_audio"    -> (Multimodal.mmAudio(_, _)),
    // real-world codec families: PNG round-trips losslessly (exact
    // raster hash); JPEG is lossy (dims exact, luma banded)
    "mm_png"      -> (Multimodal.mmPng(_, _)),
    "mm_jpeg"     -> (Multimodal.mmJpeg(_, _)),
    // palette family: 256 gray levels exactly fill GIF's palette, so
    // the round-trip is lossless and raster-hash certified like PNG
    "mm_gif"      -> (Multimodal.mmGif(_, _)),
    // Avro wire format (S4 core: Confluent frame + union normalization)
    "avro_roundtrip" -> (AvroPipeline.avroRoundtrip(_, _))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = OracleSql.all

  /** Headline subset timed by Bench (the rest still run under Verify). */
  def benchQueries: Seq[String] = Seq(
    "q1_pricing_summary", "q3_top_revenue", "q5_region_revenue",
    "q6_forecast_revenue", "join_semi_orders", "join_anti_customers",
    "topk_orders", "brand_price_agg",
    "a1_device_summary", "a2_hourly_agg", "a6_daily_distribution",
    "w1_gap_detection", "w2_moving_avg", "o3_recent_topn",
    "t1_fanout", "t9_anomaly_flags", "l8_integrity",
    "dedup_minhash_lsh", "dedup_chunks", "emb_topk", "emb_knn_graph",
    "emb_knn_graph_lsh",
    "emb_pq_topk", "emb_pq_serve", "emb_ivf_serve",
    "emb_pq_serve_sq8", "emb_ivfpq_serve",
    "tx_fingerprint", "tx_boilerplate",
    "asof_join_purchase", "range_join_burst", "decontaminate",
    "emb_quantized_topk",
    // dedup_embedding_090 (the exact O(n²) twin at the showcase
    // threshold) is REGISTERED but not benched (r15 verdict #3): it was
    // 60% of the artifact's cpuTotal re-proving a parity the oracle
    // gate already hash-certifies at three scales; its LSH twin stays.
    // The 0.45-threshold exact/LSH head-to-head below keeps one
    // exact-vs-bucketed price comparison on the bench.
    "avro_roundtrip", "dedup_embedding_045", "dedup_embedding_lsh",
    "dedup_embedding_lsh_090",
    "tx_repetition", "dedup_semantic", "tx_heavy_hitters",
    "emb_mmr_serve", "emb_ivfpq_recall", "tx_freq_cm", "hybrid_topk",
    "hybrid_serve",
    // r12: recall audit on the clustered operating geometry
    "emb_ivfpq_recall_clustered",
    // r10: fold-compacted serves (the maintenance ops priced), the
    // lexical takedown, the census alarm, and the real-codec families
    "emb_pq_serve_compacted", "lex_bm25_compact_serve",
    "lex_bm25_serve_tombstone", "emb_ivf_cell_guard", "mm_png", "mm_jpeg",
    "mm_gif", "lex_bm25_serve", "lex_bm25_append_serve",
    // r12: winnowed fingerprints (native deque selection + df shuffle)
    // and their pair report (inverted-index self-join)
    "tx_winnow", "dedup_winnow",
    // r14: the exact-substring (Lee et al.) family — the r13 additions
    // the bench list had missed (verdict #5)
    "dedup_exact_runs", "dedup_exact_runs_apply",
    // r14: DSIR resample + hashed-NB lang-ID (the bucket-model family)
    "tx_dsir_select", "tx_nb_langid",
    // r16: perceptual-hash image near-dup (codec pass + banded join)
    "dedup_phash",
    // r17: the audio/video modality twins (WAV + sliced-BMP codec
    // passes through the same banded join; video adds the frame vote)
    // and the manifest-dialed IVF serve
    "dedup_audio", "dedup_video", "emb_ivf_serve_dialed",
    // r18: BPE training (vocab-bounded rounds) + learned-table encode
    // (one narrow corpus pass), the shuffled-order packing prefix sum,
    // the dialed hybrid serve (must price like hybrid_serve), the
    // incremental decontamination step, and the band-occupancy
    // introspection row (all four fingerprint passes + text scans)
    "tx_bpe_train", "tx_bpe_encode", "tx_pack_shuffled",
    "hybrid_serve_dialed", "decontaminate_incremental",
    "dedup_band_stats")
}
