package graft

/** DuckDB oracle SQL, one entry per SparkEntry.queries key.
  *
  * Fragments mirror graft.Cols exactly: aggregates over 2-decimal double
  * columns run through exact DECIMAL(18,2) sums so Spark and DuckDB
  * produce bit-identical doubles regardless of accumulation order; any
  * remaining double arithmetic is written as the same IEEE expression
  * tree on both sides.
  */
object OracleSql {
  /** Exact sum of a 2-decimal double column (Cols.dsum). */
  def dsum(c: String): String = s"sum($c::DECIMAL(18,2))::DOUBLE"
  /** Exact mean (Cols.davg). */
  def davg(c: String): String = s"(sum($c::DECIMAL(18,2))::DOUBLE / count($c))"
  /** Exact-moment sample stddev (Cols.dstddev). */
  def dstddev(c: String): String = {
    val sx  = s"sum($c::DECIMAL(18,2))::DOUBLE"
    val sxx = s"sum(($c::DECIMAL(18,2) * $c::DECIMAL(18,2))::DECIMAL(38,4))::DOUBLE"
    val n   = s"count($c)::DOUBLE"
    s"CASE WHEN count($c) > 1 THEN sqrt(($sxx - $sx * $sx / $n) / ($n - 1.0)) END"
  }
  /** TPC-H revenue term: Σ extprice×(1−discount), exact. */
  val rev: String =
    "sum((l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DECIMAL(38,4))::DOUBLE"

  /** The emb_lsh_buckets hyperplane sign matrix (8 planes × 64 dims) as
    * SQL VALUES rows — same deterministic splitmix64 family the native
    * LshBucketsExpr evaluates.
    */
  private def lshSignRowsFor(nPlanes: Int): String = (0 until nPlanes).map { p =>
    val sv = (0 until 64)
      .map(d => if (graft.functions.LshHash.planeSign(p, d.toLong) > 0) "1.0" else "-1.0")
      .mkString("[", ", ", "]")
    s"  ($p, $sv::DOUBLE[])"
  }.mkString(",\n")
  private val lshSignRows: String = lshSignRowsFor(8)

  /** One mega-cell split level of the dedup_semantic oracle — mirrors
    * Similarity.splitHotCells rung-for-rung: population count over the
    * incoming assignment `in`, the shared 4×-expected bound (bnd CTE),
    * the per-cell sample-pct CASE ladder, vec_id%8 sub-seeds over the
    * hot-cell hash-sample, two Lloyd rounds grouped by (cell, sub),
    * the full hot membership assigned once against the final
    * sub-centroids, composite ids (cell+1)*1024+sub, and untouched
    * pass-through for cells at or under the bound. Emits CTEs suffixed
    * `i`, ending in assignment relation `m{i}`.
    */
  private def semanticSplitLevel(i: Int, in: String): String = {
    def means(out: String, src: String): String =
      s"""s$out AS (SELECT cell, sub, d, round(avg(emb[d]), 6) AS c
         |  FROM $src CROSS JOIN generate_series(1, 64) g(d) GROUP BY cell, sub, d),
         |s${out}l AS (SELECT cell, sub, list(c ORDER BY d) AS centroid
         |  FROM s$out GROUP BY cell, sub),""".stripMargin
    def asn(out: String, src: String, cents: String): String =
      s"""$out AS (SELECT vec_id, emb, cell, sub FROM (
         |  SELECT t.vec_id, t.emb, t.cell, c.sub, row_number() OVER (PARTITION BY t.vec_id
         |    ORDER BY round(list_dot_product(t.emb, c.centroid) /
         |      (sqrt(list_dot_product(t.emb, t.emb)) *
         |       sqrt(list_dot_product(c.centroid, c.centroid))), 6) DESC, c.sub) AS r
         |  FROM $src t JOIN ${cents}l c ON c.cell = t.cell) WHERE r = 1),""".stripMargin
    // MATERIALIZED (DuckDB-only hint; the oracle never runs in Spark):
    // the multiply-referenced relations would otherwise be re-INLINED
    // into every consumer, and with two recursive levels the expansion
    // multiplies into minutes of replanning — materialization keeps the
    // oracle's work linear in the level count, like the Spark side's
    // checkpoint.
    s"""cnt$i AS (SELECT cell, count(*) AS pop FROM $in GROUP BY cell),
       |mc$i AS MATERIALIZED (SELECT m.vec_id, m.emb, m.cell, c.pop
       |  FROM $in m JOIN cnt$i c ON c.cell = m.cell),
       |cold$i AS (SELECT vec_id, emb, cell FROM mc$i
       |  WHERE pop <= (SELECT b FROM bnd)),
       |hot$i AS MATERIALIZED (SELECT vec_id, emb, cell,
       |    CASE WHEN pop <= 512 THEN 100 WHEN pop <= 1024 THEN 50
       |      WHEN pop <= 2048 THEN 25 WHEN pop <= 4096 THEN 12
       |      WHEN pop <= 8192 THEN 6 WHEN pop <= 16384 THEN 3 ELSE 1 END AS p
       |  FROM mc$i WHERE pop > (SELECT b FROM bnd)),
       |ht$i AS MATERIALIZED (SELECT vec_id, emb, cell, vec_id % 8 AS sub
       |  FROM hot$i
       |  WHERE ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT % 100 < p),
       |${means(s"${i}0", s"ht$i")}
       |${asn(s"sa${i}1", s"ht$i", s"s${i}0")}
       |${means(s"${i}1", s"sa${i}1")}
       |${asn(s"sa${i}2", s"ht$i", s"s${i}1")}
       |${means(s"${i}2", s"sa${i}2")}
       |${asn(s"saf$i", s"hot$i", s"s${i}2")}
       |m$i AS MATERIALIZED (SELECT vec_id, emb, cell FROM cold$i
       |  UNION ALL SELECT vec_id, emb, (cell + 1) * 1024 + sub AS cell
       |  FROM saf$i),""".stripMargin
  }

  /** Positional 8-gram hashes per document — shared by the boilerplate
    * pair and `dedup_exact_runs`. Ends at `g(doc_id, pos, gh)` with pos
    * 0-based, gh = hash60 of the space-joined 8-token slice (the
    * `GramHashesExpr` mirror).
    */
  private val gram8Ctes =
    """g0 AS (SELECT doc_id, CASE WHEN len(toks) >= 8 THEN list_transform(
      |    generate_series(1, len(toks) - 7),
      |    i -> {'pos': i - 1, 'gh': ('0x' || substr(md5(
      |      array_to_string(list_slice(toks, i, i + 7), ' ')), 1, 15))::BIGINT})
      |  ELSE []::STRUCT(pos BIGINT, gh BIGINT)[] END AS gl FROM t),
      |g AS (SELECT doc_id, unnest(gl, recursive := true) FROM g0)""".stripMargin

  /** Shared pair stage of the exact-runs family (Dedup.exactRunsStage):
    * capped inverted gram index — ≥2 DISTINCT docs (a single-doc gram
    * yields no cross-doc pair) AND ≤64 total OCCURRENCES (the position
    * self-join emits up to occ² pairs per gram; a distinct-doc-only cap
    * would let two repetitive docs explode it) — matched positions,
    * diagonal islands. Ends at `runs(a, b, s, e, run_len)` with [s, e)
    * the run's extent in the higher doc b.
    */
  private val exactRunsCtes =
    """keep AS (SELECT gh FROM g GROUP BY gh
      |  HAVING count(DISTINCT doc_id) >= 2 AND count(*) <= 64),
      |g2 AS (SELECT g.doc_id, g.pos, g.gh FROM g JOIN keep USING (gh)),
      |m AS (SELECT x.doc_id AS a, y.doc_id AS b, x.pos AS pa, y.pos AS pb
      |  FROM g2 x JOIN g2 y ON x.gh = y.gh AND x.doc_id < y.doc_id),
      |r AS (SELECT a, b, pa - pb AS d, pa, pb,
      |  pa - row_number() OVER (PARTITION BY a, b, pa - pb ORDER BY pa) AS grp
      |  FROM m),
      |runs AS (SELECT a, b, min(pb) AS s, max(pb) + 8 AS e,
      |  count(*) + 7 AS run_len
      |  FROM r GROUP BY a, b, d, grp)""".stripMargin

  /** Boilerplate-span detection (TextAnalysis.boilerplateIslands):
    * positional 8-gram hashes → df >= 2 hot set → flagged starts →
    * gaps-and-islands merge. Ends at `isl(doc_id, island, s, e, nf)`.
    */
  private val boilerplateCtes = gram8Ctes + ",\n" +
    """hot AS (SELECT gh FROM g GROUP BY gh HAVING count(DISTINCT doc_id) >= 2),
      |f AS (SELECT g.doc_id, g.pos FROM g JOIN hot USING (gh)),
      |w1 AS (SELECT doc_id, pos,
      |  max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      |  FROM f),
      |w2 AS (SELECT doc_id, pos,
      |  sum(CASE WHEN prev_end IS NULL OR pos >= prev_end THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |  FROM w1),
      |isl AS (SELECT doc_id, island,
      |  min(pos) AS s, max(pos) + 8 AS e, count(*) AS nf
      |  FROM w2 GROUP BY doc_id, island)""".stripMargin

  /** Shared CTE fragments for the text/dedup oracles. */
  private val toksCte =
    """t AS (SELECT doc_id, text, lang,
      |  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
      |FROM documents)""".stripMargin
  /** Hashed-gram instances for the DSIR / NB bucket-model family:
    * positional unigram + bigram hash60s mod 1024 (duplicates kept) —
    * the mirror of TextAnalysis.hashedGrams. Expects `t` (toksCte) or a
    * same-shaped CTE named in `src` to be in scope.
    */
  private def gramBucketCtes(src: String): String =
    s"""g AS (SELECT doc_id, lang, list_concat(
       |    list_transform(toks, tk -> ('0x' || substr(md5(tk), 1, 15))::BIGINT),
       |    CASE WHEN len(toks) >= 2 THEN list_transform(
       |      generate_series(1, len(toks) - 1),
       |      i -> ('0x' || substr(md5(toks[i] || ' ' || toks[i + 1]), 1, 15))::BIGINT)
       |    ELSE []::BIGINT[] END) AS gh
       |  FROM $src),
       |gi AS (SELECT doc_id, lang, unnest(gh) % 1024 AS bucket FROM g)""".stripMargin

  /** One DSIR model+score step (model over `modelPred` rows, scores
    * over `scorePred` rows), CTE names suffixed with `sfx`; ends with
    * sc<sfx>(doc_id, lang, n_grams, s). THE mirror of
    * TextAnalysis.scoreAgainstModel — the batch oracles and the
    * incremental two-step oracle all splice this one builder, so the
    * float expression tree exists once on the SQL side too.
    */
  private def dsirStepCtes(sfx: String, targetLang: String,
      modelPred: String, scorePred: String): String =
    s"""m$sfx AS (SELECT bucket, count(*) AS c_all,
       |    count(*) FILTER (WHERE lang = '$targetLang') AS c_t
       |  FROM gi WHERE $modelPred GROUP BY bucket),
       |tot$sfx AS (SELECT sum(c_all)::BIGINT AS n_all,
       |    sum(c_t)::BIGINT AS n_t FROM m$sfx),
       |lr$sfx AS (SELECT bucket,
       |    ((log2((c_t + 1)::DOUBLE) - log2((n_t + 1024)::DOUBLE)) -
       |     (log2((c_all + 1)::DOUBLE) - log2((n_all + 1024)::DOUBLE))) AS lr
       |  FROM m$sfx, tot$sfx),
       |sc$sfx AS (SELECT gi.doc_id, gi.lang, count(*)::BIGINT AS n_grams,
       |    sum(lr$sfx.lr) AS s
       |  FROM gi JOIN lr$sfx USING (bucket) WHERE $scorePred
       |  GROUP BY gi.doc_id, gi.lang)""".stripMargin

  /** DSIR per-doc raw score CTE chain over the whole corpus; ends with
    * sc(doc_id, lang, n_grams, s). Same expression tree as dsirScored.
    */
  private def dsirScCtes(targetLang: String): String =
    s"""${gramBucketCtes("t")},
       |${dsirStepCtes("", targetLang, "true", "true")}""".stripMargin

  private val shinglesCte =
    """sh AS (SELECT doc_id, unnest(
      |  CASE WHEN len(toks) >= 3 THEN list_distinct(list_transform(
      |    generate_series(1, len(toks) - 2),
      |    i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
      |  ELSE []::VARCHAR[] END) AS s FROM t)""".stripMargin
  /** The phash fixture + detector chain (operators.Multimodal
    * `phashBlockLevel`/`dhash60` + dedup.Dedup.dedupPhashPairsDf),
    * re-derived from the generating arithmetic — the Spark side
    * computes the SAME fingerprints from really PNG-encoded-and-
    * decoded rasters, so a hash match certifies codec round-trip and
    * fingerprint math together. Ends with `ppair` (media_a, media_b,
    * hamming ≤ 4) and keeps `pm` (the media corpus) in scope for the
    * apply oracle.
    */
  private val phashCtes =
    """pm AS (
      |  SELECT doc_id AS media_id, doc_id AS src_id, 0 AS planted FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, doc_id, 1 FROM documents WHERE doc_id % 20 = 7),
      |plv AS (SELECT media_id, k,
      |    ((('0x' || substr(md5('phash|' || src_id || '|' || k), 1, 15))::BIGINT % 256
      |      + CASE WHEN planted = 1 AND k IN (9, 41) THEN 40 ELSE 0 END) % 256) AS lvl
      |  FROM pm CROSS JOIN generate_series(0, 60) g(k)),
      |pfp AS (SELECT a.media_id,
      |    sum(CASE WHEN a.lvl > b.lvl THEN (1::BIGINT << a.k) ELSE 0 END)::BIGINT AS fp
      |  FROM plv a JOIN plv b ON a.media_id = b.media_id AND b.k = a.k + 1
      |  WHERE a.k < 60 GROUP BY a.media_id),
      |pbands AS (SELECT media_id, fp, b, (fp >> (b * 15)) & 32767 AS band_key
      |  FROM pfp CROSS JOIN generate_series(0, 3) g(b)),
      |pcand AS (SELECT DISTINCT x.media_id AS media_a, y.media_id AS media_b,
      |    x.fp AS fp_a, y.fp AS fp_b
      |  FROM pbands x JOIN pbands y
      |  ON x.b = y.b AND x.band_key = y.band_key AND x.media_id < y.media_id),
      |ppair AS (SELECT media_a, media_b,
      |    bit_count(xor(fp_a, fp_b))::BIGINT AS hamming
      |  FROM pcand WHERE bit_count(xor(fp_a, fp_b)) <= 4)""".stripMargin

  /** The audio fixture + detector chain (operators.Multimodal
    * `audWindowLevel`/`audioFp60` + dedup.Dedup.dedupAudioPairsDf),
    * re-derived from the generating arithmetic — the Spark side
    * computes the SAME fingerprints from really WAV-encoded-and-
    * decoded clips, so a hash match certifies codec round-trip and
    * fingerprint math together. Levels live on a 3-step grid
    * (idx 0-84 → level idx·3+2; the plant bumps 13 GRID units with a
    * mod-85 wrap) — see audWindowLevel's μ-law rationale. Ends with
    * `apair` (media_a, media_b, hamming ≤ 4) and keeps `am` (the
    * media corpus) in scope for the apply oracle.
    */
  private val audCtes =
    """am AS (
      |  SELECT doc_id AS media_id, doc_id AS src_id, 0 AS planted FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, doc_id, 1 FROM documents WHERE doc_id % 20 = 3),
      |alv AS (SELECT media_id, w,
      |    (((('0x' || substr(md5('audfp|' || src_id || '|' || w), 1, 15))::BIGINT % 85
      |      + CASE WHEN planted = 1 AND w IN (13, 47) THEN 13 ELSE 0 END) % 85)
      |     * 3 + 2) AS lvl
      |  FROM am CROSS JOIN generate_series(0, 60) g(w)),
      |afp AS (SELECT a.media_id,
      |    sum(CASE WHEN a.lvl > b.lvl THEN (1::BIGINT << a.w) ELSE 0 END)::BIGINT AS fp
      |  FROM alv a JOIN alv b ON a.media_id = b.media_id AND b.w = a.w + 1
      |  WHERE a.w < 60 GROUP BY a.media_id),
      |abands AS (SELECT media_id, fp, b, (fp >> (b * 15)) & 32767 AS band_key
      |  FROM afp CROSS JOIN generate_series(0, 3) g(b)),
      |acand AS (SELECT DISTINCT x.media_id AS media_a, y.media_id AS media_b,
      |    x.fp AS fp_a, y.fp AS fp_b
      |  FROM abands x JOIN abands y
      |  ON x.b = y.b AND x.band_key = y.band_key AND x.media_id < y.media_id),
      |apair AS (SELECT media_a, media_b,
      |    bit_count(xor(fp_a, fp_b))::BIGINT AS hamming
      |  FROM acand WHERE bit_count(xor(fp_a, fp_b)) <= 4)""".stripMargin

  /** The video fixture + detector chain (operators.Multimodal
    * `vidBlockLevel`/`dhash60` per sampled frame +
    * dedup.Dedup.dedupVideoPairsDf), re-derived from the generating
    * arithmetic — the Spark side computes the SAME per-frame
    * fingerprints from really BMP-encoded-and-decoded frame rasters.
    * Sampled frames are {0, 2, 4}; the planted cut frame (4) hashes
    * from a fresh salt; every other planted frame carries the phash
    * 2-block retouch. Ends with `vpair` (media_a, media_b,
    * n_frames_matched ≥ 2) and keeps `vm` in scope for the apply
    * oracle.
    */
  private val vidCtes =
    """vm AS (
      |  SELECT doc_id AS media_id, doc_id AS src_id, 0 AS planted FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, doc_id, 1 FROM documents WHERE doc_id % 20 = 11),
      |vlv AS (SELECT media_id, f, k,
      |    CASE WHEN planted = 1 AND f = 4
      |      THEN ('0x' || substr(md5('vidcut|' || src_id || '|' || f || '|' || k), 1, 15))::BIGINT % 256
      |      ELSE ((('0x' || substr(md5('vidfp|' || src_id || '|' || f || '|' || k), 1, 15))::BIGINT % 256
      |        + CASE WHEN planted = 1 AND k IN (9, 41) THEN 40 ELSE 0 END) % 256)
      |    END AS lvl
      |  FROM vm CROSS JOIN (VALUES (0), (2), (4)) fr(f)
      |    CROSS JOIN generate_series(0, 60) g(k)),
      |vfp AS (SELECT a.media_id, a.f,
      |    sum(CASE WHEN a.lvl > b.lvl THEN (1::BIGINT << a.k) ELSE 0 END)::BIGINT AS fp
      |  FROM vlv a JOIN vlv b
      |    ON a.media_id = b.media_id AND a.f = b.f AND b.k = a.k + 1
      |  WHERE a.k < 60 GROUP BY a.media_id, a.f),
      |vbands AS (SELECT media_id, f, fp, b, (fp >> (b * 15)) & 32767 AS band_key
      |  FROM vfp CROSS JOIN generate_series(0, 3) g(b)),
      |vcand AS (SELECT DISTINCT x.media_id AS media_a, y.media_id AS media_b,
      |    x.f AS f, x.fp AS fp_a, y.fp AS fp_b
      |  FROM vbands x JOIN vbands y
      |  ON x.f = y.f AND x.b = y.b AND x.band_key = y.band_key
      |    AND x.media_id < y.media_id),
      |vfmatch AS (SELECT DISTINCT media_a, media_b, f
      |  FROM vcand WHERE bit_count(xor(fp_a, fp_b)) <= 4),
      |vpair AS (SELECT media_a, media_b, count(*)::BIGINT AS n_frames_matched
      |  FROM vfmatch GROUP BY 1, 2 HAVING count(*) >= 2)""".stripMargin

  /** Relational replay of the two-delivery incremental VIDEO dedup —
    * the audio/image incremental structure over the frame-VOTED pair
    * relation (`vpair` already encodes the ≥2-of-3 vote, and the
    * incremental step votes with identical semantics). Base ids
    * < 1e6, plant ids ≥ 1e6; the index holds delivery-1 SURVIVORS'
    * frames only.
    */
  private lazy val videoIncrementalSql: String =
    s"""WITH $vidCtes,
       |s1 AS (SELECT media_id FROM vm WHERE media_id < 1000000
       |  AND media_id NOT IN
       |    (SELECT media_b FROM vpair WHERE media_b < 1000000)),
       |s2 AS (SELECT media_id FROM vm WHERE media_id >= 1000000
       |  AND media_id NOT IN (SELECT media_b FROM vpair WHERE media_a >= 1000000)
       |  AND media_id NOT IN (SELECT p.media_b FROM vpair p
       |     JOIN s1 ON p.media_a = s1.media_id WHERE p.media_b >= 1000000))
       |SELECT media_id, 1::BIGINT AS delivery FROM s1
       |UNION ALL
       |SELECT media_id, 2::BIGINT AS delivery FROM s2
       |ORDER BY media_id""".stripMargin

  /** Relational replay of the two-delivery incremental AUDIO dedup —
    * [[phashIncrementalSql]]'s structure over the audio pair relation
    * (`apair`), shared verbatim by the in-memory row and its
    * durable-sink twin. Base media ids < 1e6, plant ids ≥ 1e6.
    */
  private lazy val audioIncrementalSql: String =
    s"""WITH $audCtes,
       |s1 AS (SELECT media_id FROM am WHERE media_id < 1000000
       |  AND media_id NOT IN
       |    (SELECT media_b FROM apair WHERE media_b < 1000000)),
       |s2 AS (SELECT media_id FROM am WHERE media_id >= 1000000
       |  AND media_id NOT IN (SELECT media_b FROM apair WHERE media_a >= 1000000)
       |  AND media_id NOT IN (SELECT p.media_b FROM apair p
       |     JOIN s1 ON p.media_a = s1.media_id WHERE p.media_b >= 1000000))
       |SELECT media_id, 1::BIGINT AS delivery FROM s1
       |UNION ALL
       |SELECT media_id, 2::BIGINT AS delivery FROM s2
       |ORDER BY media_id""".stripMargin

  /** Relational replay of the two-delivery incremental image dedup —
    * shared verbatim by the in-memory row and its durable-sink twin.
    * ppair is the full banded-pair relation; base media ids are all
    * < 1e6 and plant ids all >= 1e6, so media_a's side identifies a
    * pair's delivery composition (media_a < media_b always):
    *  - within-delivery-1 drops: both sides base  ⇔ media_b < 1e6;
    *  - delivery-1 survivors s1 = bases minus those drops;
    *  - within-delivery-2 drops: both sides planted ⇔ media_a >= 1e6;
    *  - cross drops: a planted media pairing with an s1 SURVIVOR (the
    *    index holds survivors' fingerprints only — a copy matching a
    *    dropped base must NOT die through it).
    */
  private lazy val phashIncrementalSql: String =
    s"""WITH $phashCtes,
       |s1 AS (SELECT media_id FROM pm WHERE media_id < 1000000
       |  AND media_id NOT IN
       |    (SELECT media_b FROM ppair WHERE media_b < 1000000)),
       |s2 AS (SELECT media_id FROM pm WHERE media_id >= 1000000
       |  AND media_id NOT IN (SELECT media_b FROM ppair WHERE media_a >= 1000000)
       |  AND media_id NOT IN (SELECT p.media_b FROM ppair p
       |     JOIN s1 ON p.media_a = s1.media_id WHERE p.media_b >= 1000000))
       |SELECT media_id, 1::BIGINT AS delivery FROM s1
       |UNION ALL
       |SELECT media_id, 2::BIGINT AS delivery FROM s2
       |ORDER BY media_id""".stripMargin

  private val simhashCtes =
    """tok AS (SELECT doc_id, unnest(toks) AS w FROM t),
      |th AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 15))::BIGINT AS h FROM tok),
      |bits AS (SELECT doc_id, j,
      |  sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS cnt
      |  FROM th CROSS JOIN generate_series(0, 59) g(j) GROUP BY doc_id, j),
      |fp AS (SELECT doc_id,
      |  sum(CASE WHEN cnt > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS fp
      |  FROM bits GROUP BY doc_id)""".stripMargin

  /** The decontamination replay (TextAnalysis.decontamCorpus +
    * decontaminateDf): planted train/eval corpus, distinct 8-gram
    * hashes, train×eval gram join, per-train-doc evidence counts.
    * `withDelivery` adds the incremental variants' delivery label
    * (doc_id parity) — the benchmark index is FROZEN, so deliveries
    * are independent and the incremental union equals the batch audit
    * with the label.
    */
  private def decontamSql(withDelivery: Boolean): String = {
    val extraCol =
      if (withDelivery)
        ",\n  (CASE WHEN tr.doc_id % 2 = 0 THEN 1 ELSE 2 END)::BIGINT AS delivery"
      else ""
    s"""WITH $toksCte,
       |b AS (SELECT doc_id, text, toks,
       |  ((('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT) % 100) AS bucket
       |  FROM t),
       |sn AS (SELECT array_to_string(toks[1:12], ' ') AS snippet
       |  FROM b WHERE bucket >= 97 ORDER BY doc_id LIMIT 1),
       |p AS (SELECT doc_id, bucket,
       |  CASE WHEN bucket < 97 AND doc_id % 25 = 0
       |    THEN text || ' ' || (SELECT snippet FROM sn) ELSE text END AS text
       |  FROM b),
       |t2 AS (SELECT doc_id, bucket,
       |  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
       |  FROM p),
       |g AS (SELECT doc_id, bucket, unnest(list_distinct(
       |  CASE WHEN len(toks) >= 8 THEN list_transform(
       |    generate_series(1, len(toks) - 7),
       |    i -> ('0x' || substr(md5(array_to_string(
       |      list_slice(toks, i, i + 7), ' ')), 1, 15))::BIGINT)
       |  ELSE []::BIGINT[] END)) AS gh FROM t2),
       |tr AS (SELECT doc_id, gh FROM g WHERE bucket < 97),
       |ev AS (SELECT doc_id AS eval_id, gh FROM g WHERE bucket >= 97)
       |SELECT tr.doc_id, count(DISTINCT tr.gh)::BIGINT AS n_matched_grams,
       |  count(DISTINCT ev.eval_id)::BIGINT AS n_eval_docs$extraCol
       |FROM tr JOIN ev USING (gh)
       |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin
  }

  private lazy val decontamIncrementalSql: String =
    decontamSql(withDelivery = true)

  /** The planted-near-dup corpus (Similarity.augmentedEmbeddings):
    * perturbation arithmetic double-computed, float-cast — IEEE
    * round-to-nearest in both engines, so the derived corpus is
    * bit-identical.
    */
  private val augEmbCte = {
    // one UNION branch per planted copy, generated from the SAME
    // (offset, factor) list the Spark side folds over — double literals
    // render identically (shortest-repr toString) in both engines
    val branches = graft.similarity.Similarity.PlantFactors.map { case (off, f) =>
      s"""  SELECT vec_id + $off, list_transform(range(1, 65), i ->
         |    (embedding[i]::DOUBLE + $f * embedding[(i % 64) + 1]::DOUBLE)::FLOAT)
         |  FROM embeddings""".stripMargin
    }
    "aug AS (\n  SELECT vec_id, embedding FROM embeddings\n  UNION ALL\n" +
      branches.mkString("\n  UNION ALL\n") + ")"
  }

  /** Exact all-pairs cosine over the aug corpus at threshold 0.9 —
    * norms precomputed per vector (bit-identical to the per-pair
    * formulation: same dot fold, same dot/(√sa·√sb) IEEE tree — and the
    * same shape the Spark side uses). `cand` carries every ordered pair
    * with its rounded cosine; consumers filter on >= 0.9.
    */
  private val augPairCtes =
    """an AS (SELECT vec_id, embedding::DOUBLE[] AS e,
      |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      |  FROM aug),
      |cand AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |  round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) AS cos_sim
      |  FROM an a JOIN an b ON a.vec_id < b.vec_id)""".stripMargin

  /** Shared CTE chain of the PQ-family oracles: corpus → sample
    * rung → two unrolled Lloyd codebook rounds → full-corpus codes →
    * per-query LUT → ADC approximate cosine (`approx`). `emb_pq_topk`
    * appends its cut+rescore stages; `emb_pq_serve` (the persisted-
    * index serve twin) ranks `approx` directly.
    */
  /** The greedy MMR loop as 8 chained CTE stages (shared by
    * emb_mmr_topk and emb_mmr_serve — the two differ only in where the
    * candidate relation `mce` (query_id, vec_id, rel, relu) and the
    * pairwise relation `mpc` (query_id, d, sid, pcu) come from). Stage
    * r's selection is ROW_NUMBER() = 1 under (score_e7 DESC, vec_id)
    * with the score in EXACT integer 1e-7 units (7·rel_µ − 3·max_pc_µ,
    * λ = 0.7; float scores of 6-dp inputs sit on half-rounding
    * boundaries where engines' rounding legitimately diverges — see
    * MmrSelect's scaladoc); stage 1 fixes the empty-set diversity term
    * at 0, later stages use the TRUE max pairwise micro-cosine vs the
    * selected set (inner join: mpc is complete over candidate pairs).
    * MATERIALIZED hints stop exponential re-inlining of the chain.
    */
  private val mmrChainSql: String = {
    val sel1 =
      """,
        |sel1 AS (SELECT query_id, vec_id, rel, 1::BIGINT AS rank, mmr_score_e7 FROM (
        |  SELECT query_id, vec_id, rel, 7 * relu AS mmr_score_e7,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY 7 * relu DESC, vec_id) AS rn
        |  FROM mce) WHERE rn = 1),
        |selall1 AS MATERIALIZED (SELECT * FROM sel1)""".stripMargin
    val stages = (2 to 8).map { r =>
      s""",
         |sel$r AS (SELECT query_id, vec_id, rel, $r::BIGINT AS rank, mmr_score_e7 FROM (
         |  SELECT c.query_id, c.vec_id, c.rel,
         |    7 * c.relu - 3 * mx.m AS mmr_score_e7,
         |    row_number() OVER (PARTITION BY c.query_id
         |      ORDER BY 7 * c.relu - 3 * mx.m DESC, c.vec_id) AS rn
         |  FROM mce c
         |  JOIN (SELECT mpc.query_id, mpc.d, max(mpc.pcu) AS m
         |        FROM mpc JOIN selall${r - 1} s
         |          ON s.query_id = mpc.query_id AND s.vec_id = mpc.sid
         |        GROUP BY mpc.query_id, mpc.d) mx
         |    ON mx.query_id = c.query_id AND mx.d = c.vec_id
         |  LEFT JOIN selall${r - 1} sd
         |    ON sd.query_id = c.query_id AND sd.vec_id = c.vec_id
         |  WHERE sd.vec_id IS NULL) WHERE rn = 1),
         |selall$r AS MATERIALIZED (SELECT * FROM selall${r - 1} UNION ALL SELECT * FROM sel$r)""".stripMargin
    }.mkString
    sel1 + stages + """
      |SELECT query_id, vec_id, rank, rel AS rel_cos, mmr_score_e7
      |FROM selall8 ORDER BY query_id, rank""".stripMargin
  }

  private val pqApproxCtes: String =
    """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
      |pc AS (SELECT CASE WHEN count(*) <= 512 THEN 100
      |    WHEN count(*) <= 1024 THEN 50 WHEN count(*) <= 2048 THEN 25
      |    WHEN count(*) <= 4096 THEN 12 WHEN count(*) <= 8192 THEN 6
      |    WHEN count(*) <= 16384 THEN 3 ELSE 1 END AS p FROM embeddings),
      |sub AS (SELECT vec_id, label % 16 AS code0, ss AS s,
      |    list_slice(emb, ss*8+1, ss*8+8) AS sub
      |  FROM e CROSS JOIN generate_series(0, 7) g(ss)),
      |tsub AS (SELECT * FROM sub
      |  WHERE ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT % 100
      |    < (SELECT p FROM pc)),
      |w0 AS (SELECT s, code0 AS code, d, round(avg(sub[d]), 6) AS c
      |  FROM tsub CROSS JOIN generate_series(1, 8) gd(d) GROUP BY s, code0, d),
      |w0l AS (SELECT s, code, list(c ORDER BY d) AS cw FROM w0 GROUP BY s, code),
      |a1 AS (SELECT vec_id, s, sub, code FROM (
      |  SELECT u.vec_id, u.s, u.sub, w.code, row_number() OVER (
      |      PARTITION BY u.vec_id, u.s ORDER BY
      |      round(-(list_dot_product(u.sub, u.sub)
      |        - 2*list_dot_product(u.sub, w.cw)
      |        + list_dot_product(w.cw, w.cw)), 6) DESC, w.code) AS r
      |    FROM tsub u JOIN w0l w ON w.s = u.s) WHERE r = 1),
      |w1 AS (SELECT s, code, d, round(avg(sub[d]), 6) AS c
      |  FROM a1 CROSS JOIN generate_series(1, 8) gd(d) GROUP BY s, code, d),
      |w1l AS (SELECT s, code, list(c ORDER BY d) AS cw FROM w1 GROUP BY s, code),
      |a2 AS (SELECT vec_id, s, sub, code FROM (
      |  SELECT u.vec_id, u.s, u.sub, w.code, row_number() OVER (
      |      PARTITION BY u.vec_id, u.s ORDER BY
      |      round(-(list_dot_product(u.sub, u.sub)
      |        - 2*list_dot_product(u.sub, w.cw)
      |        + list_dot_product(w.cw, w.cw)), 6) DESC, w.code) AS r
      |    FROM tsub u JOIN w1l w ON w.s = u.s) WHERE r = 1),
      |w2 AS (SELECT s, code, d, round(avg(sub[d]), 6) AS c
      |  FROM a2 CROSS JOIN generate_series(1, 8) gd(d) GROUP BY s, code, d),
      |w2l AS (SELECT s, code, list(c ORDER BY d) AS cw FROM w2 GROUP BY s, code),
      |af AS (SELECT vec_id, s, code FROM (
      |  SELECT u.vec_id, u.s, w.code, row_number() OVER (
      |      PARTITION BY u.vec_id, u.s ORDER BY
      |      round(-(list_dot_product(u.sub, u.sub)
      |        - 2*list_dot_product(u.sub, w.cw)
      |        + list_dot_product(w.cw, w.cw)), 6) DESC, w.code) AS r
      |    FROM sub u JOIN w2l w ON w.s = u.s) WHERE r = 1),
      |q AS (SELECT vec_id AS query_id, emb AS qe FROM e WHERE vec_id < 10),
      |lut AS (SELECT query_id, w.s, w.code,
      |    list_dot_product(list_slice(qe, w.s*8+1, w.s*8+8), w.cw) AS part
      |  FROM q CROSS JOIN w2l w),
      |vn AS (SELECT a.vec_id, sqrt(sum(list_dot_product(w.cw, w.cw))) AS vnorm
      |  FROM af a JOIN w2l w ON w.s = a.s AND w.code = a.code
      |  GROUP BY a.vec_id),
      |qn AS (SELECT query_id, sqrt(list_dot_product(qe, qe)) AS qnorm FROM q),
      |approx AS (SELECT l.query_id, a.vec_id,
      |    round(sum(l.part) / (any_value(qn.qnorm) * any_value(vn.vnorm)), 6)
      |      AS pq_cos
      |  FROM af a
      |  JOIN lut l ON l.s = a.s AND l.code = a.code
      |  JOIN vn ON vn.vec_id = a.vec_id
      |  JOIN qn ON qn.query_id = l.query_id
      |  WHERE a.vec_id <> l.query_id
      |  GROUP BY l.query_id, a.vec_id)""".stripMargin

  /** Full build+probe mirror of the IVF family: the persisted-index
    * serve (`emb_ivf_serve`, store.AnnIndex) routes queries to the
    * same deterministically-trained cells and exact-scans the same
    * probed vectors as the in-session `emb_ivf_topk`, so ONE oracle
    * certifies both (the index tables are a pure function of the
    * corpus and never need mirroring).
    */
  private val ivfTopkSql: String =
    """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
      |pc AS (SELECT CASE WHEN count(*) <= 512 THEN 100
      |    WHEN count(*) <= 1024 THEN 50 WHEN count(*) <= 2048 THEN 25
      |    WHEN count(*) <= 4096 THEN 12 WHEN count(*) <= 8192 THEN 6
      |    WHEN count(*) <= 16384 THEN 3 ELSE 1 END AS p FROM embeddings),
      |t AS (SELECT * FROM e
      |  WHERE ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT % 100
      |    < (SELECT p FROM pc)),
      |c0 AS (SELECT label AS cell, d, round(avg(emb[d]), 6) AS c
      |  FROM t CROSS JOIN generate_series(1, 64) g(d) GROUP BY cell, d),
      |c0l AS (SELECT cell, list(c ORDER BY d) AS centroid FROM c0 GROUP BY cell),
      |a1 AS (SELECT vec_id, emb, cell FROM (
      |  SELECT t.vec_id, t.emb, c.cell, row_number() OVER (PARTITION BY t.vec_id
      |    ORDER BY round(list_dot_product(t.emb, c.centroid) /
      |      (sqrt(list_dot_product(t.emb, t.emb)) *
      |       sqrt(list_dot_product(c.centroid, c.centroid))), 6) DESC, c.cell) AS r
      |  FROM t CROSS JOIN c0l c) WHERE r = 1),
      |c1 AS (SELECT cell, d, round(avg(emb[d]), 6) AS c
      |  FROM a1 CROSS JOIN generate_series(1, 64) g(d) GROUP BY cell, d),
      |c1l AS (SELECT cell, list(c ORDER BY d) AS centroid FROM c1 GROUP BY cell),
      |a2 AS (SELECT vec_id, emb, cell FROM (
      |  SELECT t.vec_id, t.emb, c.cell, row_number() OVER (PARTITION BY t.vec_id
      |    ORDER BY round(list_dot_product(t.emb, c.centroid) /
      |      (sqrt(list_dot_product(t.emb, t.emb)) *
      |       sqrt(list_dot_product(c.centroid, c.centroid))), 6) DESC, c.cell) AS r
      |  FROM t CROSS JOIN c1l c) WHERE r = 1),
      |c2 AS (SELECT cell, d, round(avg(emb[d]), 6) AS c
      |  FROM a2 CROSS JOIN generate_series(1, 64) g(d) GROUP BY cell, d),
      |c2l AS (SELECT cell, list(c ORDER BY d) AS centroid FROM c2 GROUP BY cell),
      |af AS (SELECT vec_id, emb, cell FROM (
      |  SELECT e.vec_id, e.emb, c.cell, row_number() OVER (PARTITION BY e.vec_id
      |    ORDER BY round(list_dot_product(e.emb, c.centroid) /
      |      (sqrt(list_dot_product(e.emb, e.emb)) *
      |       sqrt(list_dot_product(c.centroid, c.centroid))), 6) DESC, c.cell) AS r
      |  FROM e CROSS JOIN c2l c) WHERE r = 1),
      |q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
      |  FROM embeddings WHERE vec_id < 10),
      |pr AS (
      |  SELECT query_id, cell,
      |    row_number() OVER (PARTITION BY query_id ORDER BY
      |      round(list_dot_product(qe, centroid) /
      |        (sqrt(list_dot_product(qe, qe)) *
      |         sqrt(list_dot_product(centroid, centroid))), 6) DESC,
      |      cell) AS r
      |  FROM q CROSS JOIN c2l),
      |cells AS (SELECT query_id, cell FROM pr WHERE r <= 2),
      |cand AS (
      |  SELECT c.query_id, m.vec_id AS neighbor_id,
      |    round(list_dot_product(q.qe, m.emb) /
      |      (sqrt(list_dot_product(q.qe, q.qe)) *
      |       sqrt(list_dot_product(m.emb, m.emb))), 6)
      |      AS cos_sim
      |  FROM cells c
      |  JOIN af m ON m.cell = c.cell
      |  JOIN q ON q.query_id = c.query_id
      |  WHERE m.vec_id <> c.query_id)
      |SELECT * FROM (
      |  SELECT query_id, neighbor_id, cos_sim,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY cos_sim DESC, neighbor_id)::BIGINT AS rank
      |  FROM cand)
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** `emb_ivf_append_serve` (store.AnnIndex.appendIvf): the SAME
    * pipeline with Lloyd training restricted to the BASE HALF — the
    * append contract is assignment-against-frozen-quantizers, so the
    * oracle trains its CTE chain on vec_id < n/2 and assigns the FULL
    * corpus. Derived from `ivfTopkSql` by retargeting exactly the two
    * training CTEs (the `require` guards against silent text drift).
    */
  private val ivfAppendServeSql: String = {
    val derived = ivfTopkSql
      .replace("ELSE 1 END AS p FROM embeddings)",
        "ELSE 1 END AS p FROM embeddings\n" +
          "    WHERE vec_id < (SELECT count(*) // 2 FROM embeddings))")
      .replace("t AS (SELECT * FROM e\n  WHERE",
        "t AS (SELECT * FROM e\n" +
          "  WHERE vec_id < (SELECT count(*) // 2 FROM embeddings) AND")
    require(derived != ivfTopkSql, "append-serve oracle derivation matched nothing")
    derived
  }

  /** `emb_ivf_serve_filtered` (store.AnnIndex.embIvfServeFiltered):
    * the SAME training/routing chain with the label carried through
    * the full-corpus assignment, nprobe widened 2 → 4, and the
    * candidate scan restricted to label = 3 — the oracle's filter
    * sits exactly where the engine's pushed parquet predicate does,
    * AFTER routing and BEFORE ranking. Derived from `ivfTopkSql` by
    * retargeting the four sites (the `require`s guard text drift).
    */
  private val ivfFilteredServeSql: String = {
    val sites = Seq(
      "af AS (SELECT vec_id, emb, cell FROM (",
      "SELECT e.vec_id, e.emb, c.cell, row_number() OVER (PARTITION BY e.vec_id",
      "cells AS (SELECT query_id, cell FROM pr WHERE r <= 2)",
      "WHERE m.vec_id <> c.query_id)")
    sites.foreach(s => require(ivfTopkSql.contains(s),
      s"filtered-serve oracle derivation site missing: $s"))
    ivfTopkSql
      .replace(sites(0), "af AS (SELECT vec_id, label, emb, cell FROM (")
      .replace(sites(1),
        "SELECT e.vec_id, e.label, e.emb, c.cell, row_number() OVER (PARTITION BY e.vec_id")
      .replace(sites(2), "cells AS (SELECT query_id, cell FROM pr WHERE r <= 4)")
      .replace(sites(3), "WHERE m.vec_id <> c.query_id AND m.label = 3)")
  }

  /** `emb_ivf_serve_dialed` (store.AnnIndex.embIvfServeDialed): the
    * ivfTopkSql chain up to the per-query cell ranking `pr`, then the
    * DIAL replayed relationally — candidates carry their routing rank
    * (≤ 8, the largest measured rung), each rung's served top-5 is
    * censused against the exact panel top-5 (hits summed over the
    * 10-query × k=5 panel, mean = one rounded integer division), the
    * resolved nprobe is the smallest rung at mean_recall ≥ 0.5 (else
    * the largest), and the final serve ranks the candidates within
    * the resolved routing rank — exactly the persisted dial manifest's
    * semantics.
    */
  /** The dial tail shared by the plain and FILTERED dialed serves:
    * rank-carrying candidates up to the largest measured rung,
    * per-rung census against the exact panel top-5 (`candPred` /
    * `exactPred` plumb the metadata slice — empty for the unfiltered
    * serve), integer-division mean, resolved rung, final serve.
    * 50.0 = the 10-query panel × k=5.
    */
  private def ivfDialedTail(candPred: String, exactPred: String): String =
    s"""cells AS (SELECT query_id, cell, r AS cell_rank FROM pr WHERE r <= 8),
       |cand AS (
       |  SELECT c.query_id, m.vec_id AS neighbor_id, c.cell_rank,
       |    round(list_dot_product(q.qe, m.emb) /
       |      (sqrt(list_dot_product(q.qe, q.qe)) *
       |       sqrt(list_dot_product(m.emb, m.emb))), 6) AS cos_sim
       |  FROM cells c
       |  JOIN af m ON m.cell = c.cell
       |  JOIN q ON q.query_id = c.query_id
       |  WHERE m.vec_id <> c.query_id$candPred),
       |ex AS (SELECT query_id, neighbor_id FROM (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY q.query_id ORDER BY
       |      round(list_dot_product(q.qe, e.emb) /
       |        (sqrt(list_dot_product(q.qe, q.qe)) *
       |         sqrt(list_dot_product(e.emb, e.emb))), 6) DESC, e.vec_id) AS rank
       |  FROM q CROSS JOIN e WHERE e.vec_id <> q.query_id$exactPred)
       |  WHERE rank <= 5),
       |rungs AS (SELECT p FROM (VALUES (1), (2), (4), (8)) r(p)),
       |served AS (SELECT p, query_id, neighbor_id FROM (
       |  SELECT r.p, c.query_id, c.neighbor_id,
       |    row_number() OVER (PARTITION BY r.p, c.query_id
       |      ORDER BY c.cos_sim DESC, c.neighbor_id) AS rank
       |  FROM rungs r JOIN cand c ON c.cell_rank <= r.p)
       |  WHERE rank <= 5),
       |mr AS (SELECT r.p,
       |    round(count(ex.neighbor_id) / 50.0, 6) AS mean_recall
       |  FROM rungs r
       |  LEFT JOIN served s ON s.p = r.p
       |  LEFT JOIN ex ON ex.query_id = s.query_id
       |    AND ex.neighbor_id = s.neighbor_id
       |  GROUP BY r.p),
       |dial AS (SELECT coalesce(min(p) FILTER (WHERE mean_recall >= 0.5),
       |    max(p)) AS np FROM mr)
       |SELECT * FROM (
       |  SELECT query_id, neighbor_id, cos_sim,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos_sim DESC, neighbor_id)::BIGINT AS rank
       |  FROM cand WHERE cell_rank <= (SELECT np FROM dial))
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  private val ivfDialedServeSql: String = {
    val tailSite = "cells AS (SELECT query_id, cell FROM pr WHERE r <= 2),"
    require(ivfTopkSql.contains(tailSite),
      "dialed-serve oracle derivation site missing")
    ivfTopkSql.substring(0, ivfTopkSql.indexOf(tailSite)) +
      ivfDialedTail("", "")
  }

  /** The FILTERED dialed serve's oracle: the filtered chain's prefix
    * (af carries the label) with the dial tail sliced to label = 3 on
    * BOTH the candidates and the exact side — the dial the labeled
    * index measures at build.
    */
  private val ivfFilteredDialedServeSql: String = {
    val tailSite = "cells AS (SELECT query_id, cell FROM pr WHERE r <= 4),"
    require(ivfFilteredServeSql.contains(tailSite),
      "filtered-dialed oracle derivation site missing")
    ivfFilteredServeSql.substring(0, ivfFilteredServeSql.indexOf(tailSite)) +
      ivfDialedTail(" AND m.label = 3", " AND e.label = 3")
  }

  /** `emb_ivf_dial_stats` (store.AnnIndex.embIvfDialStats): the dialed
    * chain cut after the per-rung census — the relational replay of
    * writeIvfDial's measurement, certifying the persisted manifest
    * rows byte-for-value (hits and n_queries are the exact integers,
    * mean_recall their one rounded division).
    */
  private val ivfDialStatsSql: String = {
    val cutSite = "mr AS (SELECT r.p,"
    require(ivfDialedServeSql.contains(cutSite),
      "dial-stats oracle derivation site missing")
    ivfDialedServeSql.substring(0, ivfDialedServeSql.indexOf(cutSite))
      .stripTrailing.stripSuffix(",") + "\n" +
      """SELECT r.p::BIGINT AS nprobe,
        |  count(ex.neighbor_id)::BIGINT AS hits,
        |  10::BIGINT AS n_queries,
        |  round(count(ex.neighbor_id) / 50.0, 6) AS mean_recall
        |FROM rungs r
        |LEFT JOIN served s ON s.p = r.p
        |LEFT JOIN ex ON ex.query_id = s.query_id
        |  AND ex.neighbor_id = s.neighbor_id
        |GROUP BY r.p ORDER BY nprobe""".stripMargin
  }

  /** `emb_ivf_filtered_recall` (store.AnnIndex.embIvfFilteredRecall):
    * the filtered serve (as a nested-WITH CTE — its own Lloyd chain,
    * names shadowed locally) censused against the exact top-5 over
    * the SAME label slice; one row per panel query, hits + recall.
    */
  private val ivfFilteredRecallSql: String =
    s"""WITH srv AS (
       |$ivfFilteredServeSql
       |),
       |e2 AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
       |q2 AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
       |  FROM embeddings WHERE vec_id < 10),
       |ex AS (SELECT query_id, vec_id FROM (
       |  SELECT q2.query_id, x.vec_id, row_number() OVER (PARTITION BY q2.query_id
       |      ORDER BY round(list_dot_product(q2.qe, x.emb) /
       |        (sqrt(list_dot_product(q2.qe, q2.qe)) *
       |         sqrt(list_dot_product(x.emb, x.emb))), 6) DESC, x.vec_id) AS r
       |  FROM e2 x CROSS JOIN q2
       |  WHERE x.vec_id <> q2.query_id AND x.label = 3) WHERE r <= 5)
       |SELECT ex.query_id, count(s.neighbor_id)::BIGINT AS hits,
       |  round(count(s.neighbor_id) / 5.0, 6) AS recall
       |FROM ex LEFT JOIN srv s
       |  ON s.query_id = ex.query_id AND s.neighbor_id = ex.vec_id
       |GROUP BY ex.query_id ORDER BY ex.query_id""".stripMargin

  /** `emb_ivf_filtered_recall_clustered` (store.AnnIndex
    * .embIvfFilteredRecallClustered): the SAME certified filtered-
    * recall chain with its corpus swapped for the planted-cluster
    * showcase shape — `aug` wearing derived labels pmod(vec_id, 16)
    * (plant offsets are multiples of 16, so copies co-label and
    * co-seed with their bases), exactly the `emb_ivfpq_recall_
    * clustered` derivation. The filtered-recall chain reads the raw
    * table FIVE times — the serve chain's `e`/`pc`/`q` and the census
    * wrapper's `e2`/`q2`; counting occurrences guards the swap's
    * totality against future reformatting (a silent partial swap
    * would mirror a chimera corpus).
    */
  private val ivfFilteredRecallClusteredSql: String = {
    require(ivfFilteredRecallSql.startsWith("WITH srv AS"),
      "filtered-recall-clustered: chain head anchor missing")
    val orig = ivfFilteredRecallSql.stripPrefix("WITH ")
    val occurrences = orig.sliding("FROM embeddings".length)
      .count(_ == "FROM embeddings")
    require(occurrences == 5,
      s"filtered-recall-clustered: expected exactly 5 corpus reads to " +
        s"swap (e, pc, q, e2, q2), found $occurrences — chain drifted")
    val body = orig.replace("FROM embeddings", "FROM aug2")
    "WITH " + augEmbCte + ",\n" +
      "aug2 AS (SELECT vec_id, (vec_id % 16)::INT AS label, embedding " +
      "FROM aug),\n" + body
  }

  /** Shared recall-census tail (`emb_pq_recall` / `emb_ivfpq_recall`):
    * top-5 of the preceding chain's `approx` relation (ADC cosine,
    * ties to lowest id), the exact top-5 from e×q, and a left-join
    * overlap census — hits and recall per query.
    */
  private val recallTailSql: String =
    """pqtop AS (SELECT query_id, vec_id FROM (
      |  SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
      |      ORDER BY pq_cos DESC, vec_id) AS r FROM approx) WHERE r <= 5),
      |ex AS (SELECT query_id, vec_id FROM (
      |  SELECT q.query_id, x.vec_id, row_number() OVER (PARTITION BY q.query_id
      |      ORDER BY round(list_dot_product(q.qe, x.emb) /
      |        (sqrt(list_dot_product(q.qe, q.qe)) *
      |         sqrt(list_dot_product(x.emb, x.emb))), 6) DESC, x.vec_id) AS r
      |  FROM e x CROSS JOIN q WHERE x.vec_id <> q.query_id) WHERE r <= 5)
      |SELECT ex.query_id, count(p.vec_id)::BIGINT AS hits,
      |  round(count(p.vec_id) / 5.0, 6) AS recall
      |FROM ex LEFT JOIN pqtop p
      |  ON p.query_id = ex.query_id AND p.vec_id = ex.vec_id
      |GROUP BY ex.query_id ORDER BY ex.query_id""".stripMargin

  /** `emb_ivf_cell_stats` (store.AnnIndex.embIvfCellStats): the IVF
    * training chain up to the full-corpus assignment `af`, then a
    * plain per-cell census — population and corpus share.
    */
  private val ivfCellStatsSql: String = {
    val qIdx = ivfTopkSql.indexOf("q AS (SELECT vec_id AS query_id")
    require(qIdx > 0, "cell-stats: ivf anchor missing")
    ivfTopkSql.substring(0, qIdx) +
      """sizes AS (SELECT cell::BIGINT AS cell, count(*)::BIGINT AS n_vecs
        |  FROM af GROUP BY cell)
        |SELECT cell, n_vecs,
        |  round(n_vecs / (SELECT count(*)::DOUBLE FROM embeddings), 6) AS share
        |FROM sizes ORDER BY cell""".stripMargin
  }

  /** `emb_ivf_cell_guard` (store.AnnIndex.embIvfCellGuard): the
    * census wired to its alarm — non-empty cell count, corpus size,
    * the 4×-uniform integer bound (ceil-division over the CENTROID
    * count, the routing denominator), and how many cells exceed it.
    * Same training chain as the stats row; the hash match certifies
    * the alarm arithmetic on whichever side of the bound the corpus
    * lands.
    */
  private val ivfCellGuardSql: String = {
    val qIdx = ivfTopkSql.indexOf("q AS (SELECT vec_id AS query_id")
    require(qIdx > 0, "cell-guard: ivf anchor missing")
    ivfTopkSql.substring(0, qIdx) +
      """sizes AS (SELECT cell::BIGINT AS cell, count(*)::BIGINT AS pop
        |  FROM af GROUP BY cell),
        |cc AS (SELECT count(*)::BIGINT AS c FROM c2l),
        |b AS (SELECT sum(pop)::BIGINT AS n_vecs,
        |    (4 * ((sum(pop)::BIGINT + (SELECT c FROM cc) - 1)
        |      // (SELECT c FROM cc)))::BIGINT AS bound
        |  FROM sizes)
        |SELECT (SELECT count(*)::BIGINT FROM sizes) AS n_cells,
        |  (SELECT n_vecs FROM b) AS n_vecs,
        |  (SELECT bound FROM b) AS bound,
        |  (SELECT count(*)::BIGINT FROM sizes
        |    WHERE pop > (SELECT bound FROM b)) AS cells_over_bound""".stripMargin
  }

  /** `emb_ivfpq_serve` (store.AnnIndex.buildIvfPq/serveIvfPqTopk):
    * the COMPOSED index — coarse IVF routing over PQ codes. Assembled
    * from the two proven chains: the IVF training CTEs (e..af) and
    * probe CTEs (pr/cells) from `ivfTopkSql`, the PQ chain
    * (sub..qn, its full-corpus code table renamed af2) from
    * `pqApproxCtes`, and an `approx` restricted to each query's
    * probed cells. Every `require` guards an extraction anchor
    * against text drift — a silent partial match would quietly change
    * the mirrored math.
    */
  private val ivfPqServeSql: String = {
    val qIdx = ivfTopkSql.indexOf("q AS (SELECT vec_id AS query_id")
    val prIdx = ivfTopkSql.indexOf("pr AS (")
    val candIdx = ivfTopkSql.indexOf("cand AS (")
    require(qIdx > 0 && prIdx > qIdx && candIdx > prIdx,
      "ivfpq: ivf anchors missing")
    val ivfTrain = ivfTopkSql.substring(0, qIdx)
    val probe = ivfTopkSql.substring(prIdx, candIdx)
    val subIdx = pqApproxCtes.indexOf("sub AS (")
    val approxIdx = pqApproxCtes.indexOf("approx AS (")
    require(subIdx > 0 && approxIdx > subIdx, "ivfpq: pq anchors missing")
    val pqMid0 = pqApproxCtes.substring(subIdx, approxIdx)
    val pqMid = pqMid0
      .replace("af AS (SELECT vec_id, s, code FROM (",
        "af2 AS (SELECT vec_id, s, code FROM (")
      .replace("FROM af a JOIN w2l w", "FROM af2 a JOIN w2l w")
      // the PQ chain's Lloyd assignment CTEs collide with the IVF
      // chain's a1/a2 — rename via their full distinctive texts (the
      // pq ones slice subspaces and group over gd(d), the ivf ones
      // assign cells over g(d))
      .replace("a1 AS (SELECT vec_id, s, sub, code FROM (",
        "b1 AS (SELECT vec_id, s, sub, code FROM (")
      .replace("FROM a1 CROSS JOIN generate_series(1, 8) gd(d)",
        "FROM b1 CROSS JOIN generate_series(1, 8) gd(d)")
      .replace("a2 AS (SELECT vec_id, s, sub, code FROM (",
        "b2 AS (SELECT vec_id, s, sub, code FROM (")
      .replace("FROM a2 CROSS JOIN generate_series(1, 8) gd(d)",
        "FROM b2 CROSS JOIN generate_series(1, 8) gd(d)")
    require(pqMid != pqMid0, "ivfpq: af2 rename matched nothing")
    require(!pqMid.contains("a1 AS (") && !pqMid.contains("a2 AS ("),
      "ivfpq: pq a1/a2 rename incomplete")
    ivfTrain + pqMid + probe +
      """approx AS (SELECT l.query_id, a.vec_id,
        |    round(sum(l.part) / (any_value(qn.qnorm) * any_value(vn.vnorm)), 6)
        |      AS pq_cos
        |  FROM af2 a
        |  JOIN af ON af.vec_id = a.vec_id
        |  JOIN cells cc ON cc.cell = af.cell
        |  JOIN lut l ON l.s = a.s AND l.code = a.code AND l.query_id = cc.query_id
        |  JOIN vn ON vn.vec_id = a.vec_id
        |  JOIN qn ON qn.query_id = l.query_id
        |  WHERE a.vec_id <> l.query_id
        |  GROUP BY l.query_id, a.vec_id)
        |SELECT * FROM (
        |  SELECT query_id, vec_id AS neighbor_id, pq_cos,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY pq_cos DESC, vec_id)::BIGINT AS rank
        |  FROM approx)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** `emb_ivfpq_serve_dialed` (store.AnnIndex.embIvfPqServeDialed):
    * the composed chain with the probe widened to the largest measured
    * rung (cell_rank carried through ADC), each rung's ADC top-5
    * censused against the exact panel top-5 (the dial prices routing
    * AND compression loss together), the resolved rung serving.
    */
  private val ivfPqDialedServeSql: String = {
    val cellsSite = "cells AS (SELECT query_id, cell FROM pr WHERE r <= 2)"
    val tailIdx = ivfPqServeSql.lastIndexOf("approx AS (")
    require(ivfPqServeSql.contains(cellsSite) && tailIdx > 0,
      "ivfpq-dialed: derivation anchors missing")
    ivfPqServeSql.substring(0, tailIdx)
      .replace(cellsSite,
        "cells AS (SELECT query_id, cell, r AS cell_rank FROM pr WHERE r <= 8)") +
      """approx AS (SELECT l.query_id, a.vec_id,
        |    min(cc.cell_rank) AS cell_rank,
        |    round(sum(l.part) / (any_value(qn.qnorm) * any_value(vn.vnorm)), 6)
        |      AS pq_cos
        |  FROM af2 a
        |  JOIN af ON af.vec_id = a.vec_id
        |  JOIN cells cc ON cc.cell = af.cell
        |  JOIN lut l ON l.s = a.s AND l.code = a.code AND l.query_id = cc.query_id
        |  JOIN vn ON vn.vec_id = a.vec_id
        |  JOIN qn ON qn.query_id = l.query_id
        |  WHERE a.vec_id <> l.query_id
        |  GROUP BY l.query_id, a.vec_id),
        |ex AS (SELECT query_id, neighbor_id FROM (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.query_id ORDER BY
        |      round(list_dot_product(q.qe, e.emb) /
        |        (sqrt(list_dot_product(q.qe, q.qe)) *
        |         sqrt(list_dot_product(e.emb, e.emb))), 6) DESC, e.vec_id) AS rank
        |  FROM q CROSS JOIN e WHERE e.vec_id <> q.query_id)
        |  WHERE rank <= 5),
        |rungs AS (SELECT p FROM (VALUES (1), (2), (4), (8)) r(p)),
        |served AS (SELECT p, query_id, neighbor_id FROM (
        |  SELECT r.p, x.query_id, x.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY r.p, x.query_id
        |      ORDER BY x.pq_cos DESC, x.vec_id) AS rank
        |  FROM rungs r JOIN approx x ON x.cell_rank <= r.p)
        |  WHERE rank <= 5),
        |mr AS (SELECT r.p,
        |    round(count(ex.neighbor_id) / 50.0, 6) AS mean_recall
        |  FROM rungs r
        |  LEFT JOIN served s ON s.p = r.p
        |  LEFT JOIN ex ON ex.query_id = s.query_id
        |    AND ex.neighbor_id = s.neighbor_id
        |  GROUP BY r.p),
        |dial AS (SELECT coalesce(min(p) FILTER (WHERE mean_recall >= 0.5),
        |    max(p)) AS np FROM mr)
        |SELECT * FROM (
        |  SELECT query_id, vec_id AS neighbor_id, pq_cos,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY pq_cos DESC, vec_id)::BIGINT AS rank
        |  FROM approx WHERE cell_rank <= (SELECT np FROM dial))
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** `emb_ivfpq_serve_sq8` (store.AnnIndex.serveIvfPqTopkSq8): the
    * composed index's two-tier serve — the IVFPQ routed-ADC chain's
    * `approx` feeding the SAME cut-64 + symmetric-int8 rescore tail
    * the flat-PQ sq8 serve certifies, verbatim.
    */
  private val ivfPqSq8ServeSql: String = {
    val idx = ivfPqServeSql.lastIndexOf("SELECT * FROM (")
    require(idx > 0, "ivfpq-sq8: tail anchor missing")
    ivfPqServeSql.substring(0, idx).stripTrailing.stripSuffix(",") + ",\n" +
      """cut AS (SELECT query_id, vec_id AS neighbor_id, pq_cos FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY pq_cos DESC, vec_id) AS r FROM approx) WHERE r <= 64),
        |i8 AS (SELECT vec_id, qv,
        |    sqrt(list_sum(list_transform(qv, v -> v * v))::DOUBLE) AS qn
        |  FROM (SELECT vec_id, list_transform(emb, x ->
        |      floor(x * (127.0 / list_max(list_transform(emb, y -> abs(y))))
        |        + 0.5)::BIGINT) AS qv
        |    FROM e)),
        |resc8 AS (SELECT c.query_id, c.neighbor_id, c.pq_cos,
        |    round(list_sum(list_transform(generate_series(1, len(a.qv)),
        |      i -> a.qv[i] * b.qv[i]))::DOUBLE / (a.qn * b.qn), 6) AS q8_cos
        |  FROM cut c
        |  JOIN i8 a ON a.vec_id = c.query_id
        |  JOIN i8 b ON b.vec_id = c.neighbor_id)
        |SELECT * FROM (
        |  SELECT query_id, neighbor_id, pq_cos, q8_cos,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY q8_cos DESC, neighbor_id)::BIGINT AS rank
        |  FROM resc8)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** `emb_ivfpq_recall`: the full IVFPQ serve chain with its final
    * top-5 select swapped for the shared recall-census tail.
    */
  private val ivfPqRecallSql: String = {
    val cut = ivfPqServeSql.lastIndexOf("SELECT * FROM (")
    require(cut > 0, "ivfpq-recall: final-select anchor missing")
    ivfPqServeSql.substring(0, cut).stripTrailing() + ",\n" + recallTailSql
  }

  /** `emb_ivfpq_recall_clustered` (store.AnnIndex
    * .embIvfPqRecallClustered): the SAME certified IVFPQ recall chain
    * with its corpus swapped for the planted-cluster showcase shape —
    * `aug` (the `dedup_embedding_090` corpus CTE, bit-identical
    * perturbation arithmetic) wearing derived labels
    * pmod(vec_id, 16) as the Lloyd seeds. Every `FROM embeddings` of
    * the proven chain — exactly two reads: the corpus CTE `e` and the
    * IVF sample-rung `pc` count (the spliced PQ mid-section references
    * `e`/`pc`, never the raw table) — re-points at `aug2`; the require
    * guards certify the swap was total and the splice point matches.
    */
  private val ivfPqRecallClusteredSql: String = {
    require(ivfPqRecallSql.startsWith("WITH e AS"),
      "ivfpq-recall-clustered: chain head anchor missing")
    val orig = ivfPqRecallSql.stripPrefix("WITH ")
    // the swap is total only if the literal still matches the chain's
    // formatting everywhere the corpus is read. The composed chain
    // reads the raw table EXACTLY twice — the `e` CTE and the IVF
    // sample-rung `pc` count (the spliced PQ mid-section starts at its
    // `sub` CTE and references `e`/`pc`, never the table). Counting
    // occurrences (not checking the post-replace string, which is
    // tautologically clean) is what fires if a future reformat breaks
    // the literal or adds an unswapped read (review r12).
    val occurrences = orig.sliding("FROM embeddings".length)
      .count(_ == "FROM embeddings")
    require(occurrences == 2,
      s"ivfpq-recall-clustered: expected exactly 2 corpus reads to " +
        s"swap (e, pc), found $occurrences — chain formatting drifted")
    val body = orig.replace("FROM embeddings", "FROM aug2")
    "WITH " + augEmbCte + ",\n" +
      "aug2 AS (SELECT vec_id, (vec_id % 16)::INT AS label, embedding " +
      "FROM aug),\n" + body
  }

  /** `hybrid_topk` / `hybrid_snippets` (similarity.Hybrid): BM25
    * inverted-index leg + exact-cosine leg, RRF-fused. Every float
    * literal is ::DOUBLE so DuckDB's decimal literals never enter the
    * arithmetic, and the multiply/divide order mirrors the Spark
    * expressions token for token. The CTE chain (through `fused`) is
    * shared with the snippet extractor.
    */
  private val hybridCtes: String =
    s"""WITH $toksCte,
       |tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf FROM (
       |  SELECT doc_id, unnest(toks) AS tok FROM t) GROUP BY doc_id, tok),
       |dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id),
       |stats AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl
       |  FROM dl),
       |dfq AS (SELECT tok, count(*)::BIGINT AS df FROM tf GROUP BY tok),
       |qt AS (SELECT doc_id AS query_id, tok FROM tf WHERE doc_id < 10),
       |term AS (SELECT q.query_id, f.doc_id,
       |    ln(1 + (s.n_docs - d.df + 0.5::DOUBLE) / (d.df + 0.5::DOUBLE)) *
       |    f.tf * 2.2::DOUBLE / (f.tf + 1.2::DOUBLE *
       |      (0.25::DOUBLE + 0.75::DOUBLE * l.dl * s.n_docs / s.sum_dl))
       |      AS tterm
       |  FROM tf f JOIN qt q ON q.tok = f.tok AND f.doc_id <> q.query_id
       |  JOIN dfq d ON d.tok = f.tok
       |  JOIN dl l ON l.doc_id = f.doc_id
       |  CROSS JOIN stats s),
       |bm AS (SELECT query_id, doc_id, round(sum(tterm), 6) AS bm25
       |  FROM term GROUP BY query_id, doc_id),
       |lex AS (SELECT query_id, doc_id, lex_rank FROM (
       |  SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
       |    ORDER BY bm25 DESC, doc_id) AS lex_rank FROM bm)
       |  WHERE lex_rank <= 20),
       |e2 AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |q2 AS (SELECT vec_id AS query_id, emb AS qe FROM e2 WHERE vec_id < 10),
       |vcos AS (SELECT q2.query_id, e2.vec_id AS doc_id,
       |    round(list_dot_product(qe, emb) /
       |      (sqrt(list_dot_product(qe, qe)) *
       |       sqrt(list_dot_product(emb, emb))), 6) AS cos
       |  FROM e2 CROSS JOIN q2 WHERE e2.vec_id <> q2.query_id),
       |vec AS (SELECT query_id, doc_id, vec_rank FROM (
       |  SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos DESC, doc_id) AS vec_rank FROM vcos)
       |  WHERE vec_rank <= 20),
       |fused AS (SELECT coalesce(l.query_id, v.query_id) AS query_id,
       |    coalesce(l.doc_id, v.doc_id) AS doc_id,
       |    l.lex_rank IS NOT NULL AS in_lexical,
       |    v.vec_rank IS NOT NULL AS in_vector,
       |    round(coalesce(1.0::DOUBLE / (60 + l.lex_rank), 0) +
       |          coalesce(1.0::DOUBLE / (60 + v.vec_rank), 0), 6) AS rrf_score
       |  FROM lex l FULL JOIN vec v
       |    ON v.query_id = l.query_id AND v.doc_id = l.doc_id)""".stripMargin

  /** `lex_bm25_serve` (store.TextIndex): the persisted-index BM25
    * serve is the hybrid chain's lexical leg verbatim (the index
    * tables are a pure function of the corpus), ranked to top-5 —
    * derived by cutting the chain before the dense leg.
    */
  private val lexBm25ServeSql: String = {
    val cut = hybridCtes.indexOf("lex AS (")
    require(cut > 0, "lex-serve: anchor missing")
    hybridCtes.substring(0, cut).stripTrailing.stripSuffix(",") + "\n" +
      """SELECT * FROM (
        |  SELECT query_id, doc_id, bm25,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY bm25 DESC, doc_id)::BIGINT AS rank
        |  FROM bm)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** `hybrid_serve` (similarity.Hybrid.hybridServe): both legs from
    * the persisted indexes — the PQ ADC chain supplies the dense
    * top-20, the shared lexical chain the BM25 top-20, RRF as ever.
    * The two proven CTE families compose without renames (no name
    * collisions between them, anchor-guarded extraction).
    */
  private val hybridServeSql: String = {
    val tIdx = hybridCtes.indexOf("t AS (")
    val e2Idx = hybridCtes.indexOf("e2 AS (")
    require(tIdx > 0 && e2Idx > tIdx, "hybrid-serve: lex anchors missing")
    val lexChain = hybridCtes.substring(tIdx, e2Idx)
      .stripTrailing.stripSuffix(",")
    pqApproxCtes + ",\n" + lexChain + """,
      |pqv AS (SELECT query_id, vec_id AS doc_id, vec_rank FROM (
      |  SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
      |      ORDER BY pq_cos DESC, vec_id) AS vec_rank FROM approx)
      |  WHERE vec_rank <= 20),
      |fused2 AS (SELECT coalesce(l.query_id, v.query_id) AS query_id,
      |    coalesce(l.doc_id, v.doc_id) AS doc_id,
      |    l.lex_rank IS NOT NULL AS in_lexical,
      |    v.vec_rank IS NOT NULL AS in_vector,
      |    round(coalesce(1.0::DOUBLE / (60 + l.lex_rank), 0) +
      |          coalesce(1.0::DOUBLE / (60 + v.vec_rank), 0), 6) AS rrf_score
      |  FROM lex l FULL JOIN pqv v
      |    ON v.query_id = l.query_id AND v.doc_id = l.doc_id)
      |SELECT * FROM (
      |  SELECT query_id, doc_id, rrf_score,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY rrf_score DESC, doc_id)::BIGINT AS rank,
      |    in_lexical, in_vector
      |  FROM fused2)
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** The dialed hybrid's shared chain: both served legs at top-20 (cut
    * from `hybridServeSql` at the fusion anchor), the rung panel, the
    * per-rung fusion/metrics, and the dial rows. Aggregates mirror the
    * Spark side exactly: p_hits integer, mrr/ndcg per-query values
    * rounded at 6 dp then summed as DECIMAL(28,6) (order-independent),
    * one final division.
    */
  private val hybridDialCtes: String = {
    val cut = hybridServeSql.indexOf("fused2 AS (")
    require(cut > 0, "hybrid-dial: fusion anchor missing")
    hybridServeSql.substring(0, cut).stripTrailing.stripSuffix(",") + ",\n" +
      """rungs(c, rrf_k, w_lex) AS (VALUES
        |  (5, 60, 1.0::DOUBLE), (10, 60, 1.0::DOUBLE), (20, 10, 1.0::DOUBLE),
        |  (20, 60, 0.5::DOUBLE), (20, 60, 1.0::DOUBLE), (20, 60, 1.5::DOUBLE)),
        |fr AS (SELECT r.c, r.rrf_k, r.w_lex,
        |    coalesce(l.query_id, v.query_id) AS query_id,
        |    coalesce(l.doc_id, v.doc_id) AS doc_id,
        |    round(coalesce(r.w_lex / (r.rrf_k +
        |        CASE WHEN l.lex_rank <= r.c THEN l.lex_rank END), 0) +
        |      coalesce(1.0::DOUBLE / (r.rrf_k +
        |        CASE WHEN v.vec_rank <= r.c THEN v.vec_rank END), 0), 6)
        |      AS rrf_score
        |  FROM lex l FULL JOIN pqv v
        |    ON v.query_id = l.query_id AND v.doc_id = l.doc_id
        |  CROSS JOIN rungs r
        |  WHERE l.lex_rank <= r.c OR v.vec_rank <= r.c),
        |rhits AS (SELECT * FROM (SELECT c, rrf_k, w_lex, query_id, doc_id,
        |    rrf_score,
        |    row_number() OVER (PARTITION BY c, rrf_k, w_lex, query_id
        |      ORDER BY rrf_score DESC, doc_id)::BIGINT AS rank
        |  FROM fr) WHERE rank <= 5),
        |qlab2 AS (SELECT vec_id AS query_id, label AS qlab FROM embeddings
        |  WHERE vec_id < 10),
        |dlab2 AS (SELECT vec_id AS doc_id, label AS dlab FROM embeddings),
        |rrel AS (SELECT h.c, h.rrf_k, h.w_lex, h.query_id, h.rank,
        |    CASE WHEN d.dlab = q.qlab THEN 1 ELSE 0 END AS rel
        |  FROM rhits h JOIN dlab2 d ON d.doc_id = h.doc_id
        |  JOIN qlab2 q ON q.query_id = h.query_id),
        |nr2 AS (SELECT q.query_id, count(*)::BIGINT AS n_rel FROM qlab2 q
        |  JOIN embeddings e ON e.label = q.qlab AND e.vec_id <> q.query_id
        |  GROUP BY q.query_id),
        |ic2 AS (SELECT n, sum(v) OVER (ORDER BY n) AS idcg FROM (
        |  SELECT i AS n, 1.0::DOUBLE / log2(i + 1) AS v
        |  FROM generate_series(1, 5) g(i))),
        |pqm AS (SELECT c, rrf_k, w_lex, query_id,
        |    sum(rel)::BIGINT AS p_hits_q,
        |    round(coalesce(max(CASE WHEN rel = 1
        |      THEN 1.0::DOUBLE / rank END), 0), 6) AS mrr,
        |    sum(rel * (1.0::DOUBLE / log2(rank + 1))) AS dcg
        |  FROM rrel GROUP BY 1, 2, 3, 4),
        |pqn AS (SELECT p.c, p.rrf_k, p.w_lex, p.p_hits_q, p.mrr,
        |    CASE WHEN coalesce(nr2.n_rel, 0) = 0 THEN 0.0::DOUBLE
        |      ELSE round(p.dcg / (SELECT idcg FROM ic2
        |        WHERE n = least(nr2.n_rel, 5)), 6) END AS ndcg
        |  FROM pqm p LEFT JOIN nr2 ON nr2.query_id = p.query_id),
        |dial AS (SELECT c, rrf_k, w_lex,
        |    (SELECT count(*) FROM qlab2)::BIGINT AS n_queries,
        |    sum(p_hits_q)::BIGINT AS p_hits,
        |    sum(mrr::DECIMAL(28, 6))::DOUBLE AS mrr_sum,
        |    sum(ndcg::DECIMAL(28, 6))::DOUBLE AS ndcg_sum,
        |    round(sum(ndcg::DECIMAL(28, 6))::DOUBLE /
        |      (SELECT count(*) FROM qlab2), 6) AS mean_ndcg
        |  FROM pqn GROUP BY 1, 2, 3)""".stripMargin
  }

  /** `hybrid_dial_stats`: the dial manifest rows. */
  private val hybridDialStatsSql: String = hybridDialCtes + """
    |SELECT c::BIGINT AS c, rrf_k::BIGINT AS rrf_k, w_lex, n_queries,
    |  p_hits, mrr_sum, ndcg_sum, mean_ndcg
    |FROM dial ORDER BY c, rrf_k, w_lex""".stripMargin

  /** `hybrid_serve_dialed`: the winner rung (cheapest c meeting the
    * 0.08 mean-nDCG target, honest best-measured fallback — the exact
    * `resolveHybridRung` ordering) applied to the same served legs.
    */
  private val hybridServeDialedSql: String = hybridDialCtes + """,
    |winner AS (SELECT c, rrf_k, w_lex FROM dial
    |  ORDER BY (mean_ndcg >= 0.08) DESC,
    |    CASE WHEN mean_ndcg >= 0.08 THEN c END ASC,
    |    CASE WHEN mean_ndcg >= 0.08 THEN rrf_k END ASC,
    |    CASE WHEN mean_ndcg >= 0.08 THEN w_lex END ASC,
    |    mean_ndcg DESC, c, rrf_k, w_lex
    |  LIMIT 1),
    |ffin AS (SELECT coalesce(l.query_id, v.query_id) AS query_id,
    |    coalesce(l.doc_id, v.doc_id) AS doc_id,
    |    coalesce(l.lex_rank <= (SELECT c FROM winner), FALSE) AS in_lexical,
    |    coalesce(v.vec_rank <= (SELECT c FROM winner), FALSE) AS in_vector,
    |    round(coalesce((SELECT w_lex FROM winner) /
    |        ((SELECT rrf_k FROM winner) +
    |         CASE WHEN l.lex_rank <= (SELECT c FROM winner)
    |           THEN l.lex_rank END), 0) +
    |      coalesce(1.0::DOUBLE / ((SELECT rrf_k FROM winner) +
    |         CASE WHEN v.vec_rank <= (SELECT c FROM winner)
    |           THEN v.vec_rank END), 0), 6) AS rrf_score
    |  FROM lex l FULL JOIN pqv v
    |    ON v.query_id = l.query_id AND v.doc_id = l.doc_id
    |  WHERE l.lex_rank <= (SELECT c FROM winner)
    |     OR v.vec_rank <= (SELECT c FROM winner))
    |SELECT * FROM (
    |  SELECT query_id, doc_id, rrf_score,
    |    row_number() OVER (PARTITION BY query_id
    |      ORDER BY rrf_score DESC, doc_id)::BIGINT AS rank,
    |    in_lexical, in_vector
    |  FROM ffin)
    |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  private val hybridTopkSql: String = hybridCtes +
    """
      |SELECT * FROM (
      |  SELECT query_id, doc_id, rrf_score,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY rrf_score DESC, doc_id)::BIGINT AS rank,
      |    in_lexical, in_vector
      |  FROM fused)
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  val textOracles: Map[String, String] = Map(
    "tx_tokens" ->
      s"""WITH $toksCte
         |SELECT doc_id, len(text)::BIGINT AS n_chars, len(toks)::BIGINT AS n_tokens,
         |  (CASE WHEN len(toks) >= 3 THEN len(list_distinct(list_transform(
         |    generate_series(1, len(toks) - 2),
         |    i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) ELSE 0 END)::BIGINT
         |    AS n_shingles
         |FROM t ORDER BY doc_id""".stripMargin,

    // sequence packing (concat-and-chunk): one global cumsum replays
    // the two-phase Spark prefix exactly (same doc_id order, same
    // whitespace token counts); within-doc offsets, span_end exclusive
    "tx_pack_chunk" ->
      s"""WITH $toksCte,
         |d AS (SELECT doc_id, len(toks)::BIGINT AS n_toks FROM t
         |  WHERE len(toks) > 0),
         |c AS (SELECT doc_id, n_toks,
         |    (sum(n_toks) OVER (ORDER BY doc_id
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |       - n_toks)::BIGINT AS gstart
         |  FROM d),
         |sp AS (SELECT doc_id, gstart, n_toks,
         |    unnest(range(gstart // 512, (gstart + n_toks - 1) // 512 + 1))
         |      AS seq_id
         |  FROM c)
         |SELECT seq_id::BIGINT AS seq_id, doc_id,
         |  greatest(gstart, seq_id * 512) - gstart AS span_start,
         |  least(gstart + n_toks, (seq_id + 1) * 512) - gstart AS span_end,
         |  least(gstart + n_toks, (seq_id + 1) * 512)
         |    - greatest(gstart, seq_id * 512) AS span_toks
         |FROM sp ORDER BY seq_id, doc_id""".stripMargin,

    // pack in epoch order: the same chunking over the shuffled global
    // order (shard = h % 64, then (h, doc_id) within shard) — one
    // global cumsum replays the two-phase Spark prefix exactly
    "tx_pack_shuffled" ->
      s"""WITH $toksCte,
         |d AS (SELECT doc_id, len(toks)::BIGINT AS n_toks,
         |    ('0x' || substr(md5('epoch0|' || doc_id::VARCHAR), 1, 15))::BIGINT
         |      AS h
         |  FROM t WHERE len(toks) > 0),
         |c AS (SELECT doc_id, n_toks,
         |    (sum(n_toks) OVER (ORDER BY h % 64, h, doc_id
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |       - n_toks)::BIGINT AS gstart
         |  FROM d),
         |sp AS (SELECT doc_id, gstart, n_toks,
         |    unnest(range(gstart // 512, (gstart + n_toks - 1) // 512 + 1))
         |      AS seq_id
         |  FROM c)
         |SELECT seq_id::BIGINT AS seq_id, doc_id,
         |  greatest(gstart, seq_id * 512) - gstart AS span_start,
         |  least(gstart + n_toks, (seq_id + 1) * 512) - gstart AS span_end,
         |  least(gstart + n_toks, (seq_id + 1) * 512)
         |    - greatest(gstart, seq_id * 512) AS span_toks
         |FROM sp ORDER BY seq_id, doc_id""".stripMargin,

    "tx_quality" ->
      s"""WITH $toksCte
         |SELECT doc_id, len(text)::BIGINT AS n_chars, len(toks)::BIGINT AS n_tokens,
         |  len(list_distinct(toks))::BIGINT AS n_distinct,
         |  len(list_distinct(toks))::DOUBLE / len(toks) AS distinct_ratio,
         |  len(list_filter(toks, x -> x IN ('the', 'a')))::DOUBLE / len(toks) AS stopword_ratio,
         |  list_sum(list_transform(toks, x -> len(x)))::DOUBLE / len(toks) AS mean_token_len
         |FROM t ORDER BY doc_id""".stripMargin,

    // token-budget selection oracle: the NAIVE global-window greedy
    // prefix (sort by quality, cumsum, keep while within budget). The
    // Spark side computes the same set via histogram thresholding with
    // no data-scale sort — this oracle certifies the equivalence.
    // quality = exact ints divided once (bit-reproducible); budget =
    // floor(0.4 · total) with the literal kept in double math.
    "tx_budget_select" ->
      s"""WITH $toksCte,
         |scored AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens,
         |    len(list_distinct(toks))::DOUBLE / len(toks) AS quality
         |  FROM t WHERE len(toks) > 0),
         |budget AS (SELECT FLOOR(0.4::DOUBLE * SUM(n_tokens)::DOUBLE)::BIGINT
         |    AS budget FROM scored),
         |ranked AS (SELECT doc_id, n_tokens, quality,
         |    SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS csum
         |  FROM scored)
         |SELECT doc_id, n_tokens, quality FROM ranked, budget
         |WHERE csum <= budget ORDER BY doc_id""".stripMargin,

    // BPE-ish pre-tokenization count: the same lookahead-free pattern
    // (Java regex on the Spark side, RE2 here — identical on this
    // alternation) over the raw text; ratio = exact ints divided once
    "tx_tokens_bpe" ->
      s"""WITH $toksCte
         |SELECT doc_id, len(text)::BIGINT AS n_chars,
         |  len(toks)::BIGINT AS n_tokens_ws,
         |  len(regexp_extract_all(text,
         |    '''(?:[sdmt]|ll|ve|re)| ?[a-zA-Z]+| ?[0-9]+| ?[^\\sa-zA-Z0-9]+|\\s+'))::BIGINT
         |    AS n_tokens_bpe,
         |  CASE WHEN len(regexp_extract_all(text,
         |    '''(?:[sdmt]|ll|ve|re)| ?[a-zA-Z]+| ?[0-9]+| ?[^\\sa-zA-Z0-9]+|\\s+')) > 0
         |  THEN len(text)::DOUBLE / len(regexp_extract_all(text,
         |    '''(?:[sdmt]|ll|ve|re)| ?[a-zA-Z]+| ?[0-9]+| ?[^\\sa-zA-Z0-9]+|\\s+'))
         |  END AS chars_per_bpe_token
         |FROM t ORDER BY doc_id""".stripMargin,

    // distributed BPE merge training: the k rounds are mechanically
    // UNROLLED CTEs (the merge sequence is deterministic given the
    // corpus — argmax by count DESC, pair ASC — so a static SQL text
    // can replay the training: each round's winner is read back as
    // scalar subqueries over m{i}); the merge application is literal
    // replace over U+001F-wrapped symbols, leftmost-first
    // non-overlapping = the greedy BPE merge, identical in both engines
    "tx_bpe_train" -> {
      val k = graft.analytics.TextAnalysis.BpeMerges
      // '' inside the single-quoted SQL literal = one escaped quote
      val pat = """''(?:[sdmt]|ll|ve|re)| ?[a-zA-Z]+| ?[0-9]+| ?[^\\sa-zA-Z0-9]+|\\s+"""
      val rounds = (0 until k).map { i =>
        s"""s$i AS MATERIALIZED (SELECT cnt,
           |    str_split(substr(symstr, 2, length(symstr) - 2),
           |      chr(31) || chr(31)) AS syms
           |  FROM w$i),
           |p$i AS MATERIALIZED (SELECT syms[j] AS s1, syms[j + 1] AS s2,
           |    sum(cnt)::BIGINT AS c
           |  FROM s$i, unnest(range(1, len(syms))) AS u$i(j)
           |  GROUP BY 1, 2),
           |m$i AS MATERIALIZED (SELECT s1, s2, c FROM p$i ORDER BY c DESC, s1, s2 LIMIT 1),
           |w${i + 1} AS MATERIALIZED (SELECT cnt, replace(symstr,
           |    chr(31) || (SELECT s1 FROM m$i) || chr(31) ||
           |      chr(31) || (SELECT s2 FROM m$i) || chr(31),
           |    chr(31) || (SELECT s1 FROM m$i) ||
           |      (SELECT s2 FROM m$i) || chr(31)) AS symstr
           |  FROM w$i)""".stripMargin
      }.mkString(",\n")
      val out = (0 until k).map { i =>
        s"""SELECT ${i + 1}::BIGINT AS merge_rank, s1, s2,
           |  s1 || s2 AS merged, c AS pair_count FROM m$i""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH tokw AS (SELECT unnest(regexp_extract_all(text,
         |    '$pat')) AS word
         |  FROM documents),
         |wc AS MATERIALIZED (SELECT word, count(*)::BIGINT AS cnt FROM tokw GROUP BY word),
         |w0 AS MATERIALIZED (SELECT cnt, chr(31) || array_to_string(
         |    list_transform(generate_series(1, length(word)),
         |      i -> substring(word, i, 1)), chr(31) || chr(31)) || chr(31)
         |    AS symstr
         |  FROM wc),
         |$rounds
         |$out
         |ORDER BY merge_rank""".stripMargin
    },

    // BPE encoding with the learned table: the training replay above
    // re-learns each round's winner (same unrolled m{i} chain), then a
    // parallel word-keyed chain v{i} applies the k merges to the
    // DISTINCT-word relation (the oracle may use the vocabulary join
    // the Spark side deliberately avoids — relational equivalence is
    // the point, not plan equivalence) and per-doc counts come from
    // joining the doc pre-token multiset back to the encoded vocab
    "tx_bpe_encode" -> {
      val k = graft.analytics.TextAnalysis.BpeMerges
      val pat = """''(?:[sdmt]|ll|ve|re)| ?[a-zA-Z]+| ?[0-9]+| ?[^\\sa-zA-Z0-9]+|\\s+"""
      val rounds = (0 until k).map { i =>
        s"""s$i AS MATERIALIZED (SELECT cnt,
           |    str_split(substr(symstr, 2, length(symstr) - 2),
           |      chr(31) || chr(31)) AS syms
           |  FROM w$i),
           |p$i AS MATERIALIZED (SELECT syms[j] AS s1, syms[j + 1] AS s2,
           |    sum(cnt)::BIGINT AS c
           |  FROM s$i, unnest(range(1, len(syms))) AS u$i(j)
           |  GROUP BY 1, 2),
           |m$i AS MATERIALIZED (SELECT s1, s2, c FROM p$i ORDER BY c DESC, s1, s2 LIMIT 1),
           |w${i + 1} AS MATERIALIZED (SELECT cnt, replace(symstr,
           |    chr(31) || (SELECT s1 FROM m$i) || chr(31) ||
           |      chr(31) || (SELECT s2 FROM m$i) || chr(31),
           |    chr(31) || (SELECT s1 FROM m$i) ||
           |      (SELECT s2 FROM m$i) || chr(31)) AS symstr
           |  FROM w$i),
           |v${i + 1} AS MATERIALIZED (SELECT word, replace(symstr,
           |    chr(31) || (SELECT s1 FROM m$i) || chr(31) ||
           |      chr(31) || (SELECT s2 FROM m$i) || chr(31),
           |    chr(31) || (SELECT s1 FROM m$i) ||
           |      (SELECT s2 FROM m$i) || chr(31)) AS symstr
           |  FROM v$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH dw AS MATERIALIZED (SELECT doc_id, unnest(regexp_extract_all(text,
         |    '$pat')) AS word
         |  FROM documents),
         |wc AS MATERIALIZED (SELECT word, count(*)::BIGINT AS cnt FROM dw GROUP BY word),
         |w0 AS MATERIALIZED (SELECT cnt, chr(31) || array_to_string(
         |    list_transform(generate_series(1, length(word)),
         |      i -> substring(word, i, 1)), chr(31) || chr(31)) || chr(31)
         |    AS symstr
         |  FROM wc),
         |v0 AS MATERIALIZED (SELECT word, chr(31) || array_to_string(
         |    list_transform(generate_series(1, length(word)),
         |      i -> substring(word, i, 1)), chr(31) || chr(31)) || chr(31)
         |    AS symstr
         |  FROM wc),
         |$rounds,
         |encw AS MATERIALIZED (SELECT word, length(word)::BIGINT AS n_base,
         |    len(str_split(substr(symstr, 2, length(symstr) - 2),
         |      chr(31) || chr(31)))::BIGINT AS n_syms
         |  FROM v$k),
         |per_doc AS (SELECT dw.doc_id, count(*)::BIGINT AS n_pretokens,
         |    sum(encw.n_base)::BIGINT AS n_base_symbols,
         |    sum(encw.n_syms)::BIGINT AS n_bpe_tokens
         |  FROM dw JOIN encw USING (word) GROUP BY dw.doc_id)
         |SELECT d.doc_id,
         |  coalesce(p.n_pretokens, 0)::BIGINT AS n_pretokens,
         |  coalesce(p.n_base_symbols, 0)::BIGINT AS n_base_symbols,
         |  coalesce(p.n_bpe_tokens, 0)::BIGINT AS n_bpe_tokens
         |FROM documents d LEFT JOIN per_doc p USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin
    },

    // Gopher repetition signals: per-(doc, n) gram counts, the top gram
    // picked by (count DESC, gram ASC) — the same first-max-in-sorted-
    // order tiebreak as the Spark run-length fold — and duplicated-5-gram
    // char mass; every fraction is exact-integer products divided once,
    // so the doubles match bit-for-bit
    "tx_repetition" ->
      s"""WITH $toksCte,
         |gr AS (SELECT doc_id, n, unnest(list_transform(
         |    generate_series(1, len(toks) - n + 1),
         |    i -> array_to_string(list_slice(toks, i, i + n - 1), ' '))) AS g
         |  FROM t, (SELECT unnest([2, 3, 4, 5]) AS n)),
         |c AS (SELECT doc_id, n, g, count(*) AS c FROM gr GROUP BY 1, 2, 3),
         |top AS (SELECT doc_id, n, c * len(g) AS cover,
         |    row_number() OVER (PARTITION BY doc_id, n
         |      ORDER BY c DESC, g ASC) AS rn
         |  FROM c WHERE n <= 4),
         |tops AS (SELECT doc_id,
         |    coalesce(max(CASE WHEN n = 2 THEN cover END), 0) AS c2,
         |    coalesce(max(CASE WHEN n = 3 THEN cover END), 0) AS c3,
         |    coalesce(max(CASE WHEN n = 4 THEN cover END), 0) AS c4
         |  FROM top WHERE rn = 1 GROUP BY doc_id),
         |dp AS (SELECT doc_id,
         |    coalesce(sum(c * len(g)) FILTER (WHERE c >= 2), 0) AS dupchars
         |  FROM c WHERE n = 5 GROUP BY doc_id)
         |SELECT doc_id, n_chars, top2_frac, top3_frac, top4_frac, dup5_frac,
         |  (top2_frac > 0.20 OR top3_frac > 0.18 OR top4_frac > 0.16
         |    OR dup5_frac > 0.15) AS rep_flag
         |FROM (SELECT d.doc_id, len(d.text)::BIGINT AS n_chars,
         |    least(1.0::DOUBLE, coalesce(tp.c2, 0)::DOUBLE / len(d.text)) AS top2_frac,
         |    least(1.0::DOUBLE, coalesce(tp.c3, 0)::DOUBLE / len(d.text)) AS top3_frac,
         |    least(1.0::DOUBLE, coalesce(tp.c4, 0)::DOUBLE / len(d.text)) AS top4_frac,
         |    least(1.0::DOUBLE, coalesce(dp.dupchars, 0)::DOUBLE / len(d.text)) AS dup5_frac
         |  FROM documents d LEFT JOIN tops tp ON tp.doc_id = d.doc_id
         |  LEFT JOIN dp ON dp.doc_id = d.doc_id)
         |ORDER BY doc_id""".stripMargin,

    "tx_langid" ->
      s"""WITH $toksCte
         |SELECT doc_id, lang,
         |  len(list_filter(toks, x -> x IN ('the', 'a')))::DOUBLE / len(toks) AS en_score,
         |  CASE WHEN len(list_filter(toks, x -> x IN ('the', 'a')))::DOUBLE / len(toks)
         |         >= 0.04::DOUBLE THEN 'en' ELSE 'unk' END AS lang_guess
         |FROM t ORDER BY doc_id""".stripMargin,

    "tx_fingerprint" ->
      s"""WITH $toksCte, $simhashCtes
         |SELECT d.doc_id, md5(d.text) AS md5_hex,
         |  ('0x' || substr(md5(d.text), 1, 15))::BIGINT AS content_hash60,
         |  coalesce(fp.fp, 0)::BIGINT AS simhash60
         |FROM documents d LEFT JOIN fp ON fp.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // substring-level dedup: positional 8-gram hashes, document
    // frequency >= 2 flags a span, union-of-intervals coverage per doc
    // via the same gaps-and-islands window the Spark side runs
    "tx_boilerplate" ->
      s"""WITH $toksCte, $boilerplateCtes,
         |cov AS (SELECT doc_id, sum(e - s)::BIGINT AS covered_tokens,
         |  sum(nf)::BIGINT AS n_flagged FROM isl GROUP BY doc_id)
         |SELECT t.doc_id, len(t.toks)::BIGINT AS n_tokens,
         |  greatest(len(t.toks) - 7, 0)::BIGINT AS n_grams,
         |  coalesce(cov.n_flagged, 0)::BIGINT AS n_flagged,
         |  coalesce(cov.covered_tokens, 0)::BIGINT AS covered_tokens,
         |  CASE WHEN len(t.toks) > 0 THEN
         |    round(coalesce(cov.covered_tokens, 0)::DOUBLE / len(t.toks), 6)
         |  ELSE 0.0 END AS boilerplate_ratio
         |FROM t LEFT JOIN cov ON cov.doc_id = t.doc_id
         |ORDER BY t.doc_id""".stripMargin,

    // exact-substring dedup (the Lee et al. 2022 "Deduplicating
    // Training Data" §4 signal, gram-anchored instead of
    // suffix-array): a shared verbatim run of R >= 16 tokens is
    // exactly a chain of R-7 consecutive shared 8-gram positions on
    // one (pa - pb) diagonal — islands of consecutive pa within each
    // (a, b, diagonal) group, run length = island size + 7. The df cap
    // (2..64) is the stop-gram discipline: a gram in d docs yields
    // d(d-1)/2 matched pairs, so ubiquitous boilerplate grams are
    // dropped (a run crossing one is split — both engines split it
    // identically). The oracle replays the identical diagonal-island
    // construction from the same gram CTE text.
    "dedup_exact_runs" ->
      s"""WITH $toksCte, $gram8Ctes, $exactRunsCtes
         |SELECT a AS doc_a, b AS doc_b,
         |  max(run_len)::BIGINT AS max_run_tokens,
         |  (count(*) FILTER (WHERE run_len >= 16))::BIGINT AS n_runs
         |FROM runs GROUP BY a, b HAVING max(run_len) >= 16
         |ORDER BY doc_a, doc_b""".stripMargin,

    // the incremental (two-delivery) exact-runs pipeline: delivery 1 =
    // even doc_ids under the evens-only occurrence cap; delivery 2 =
    // pairs with >=1 odd endpoint under the FULL-corpus cap (index ∪
    // batch — the cap is evaluated over every doc seen so far, so a
    // gram usable at delivery 1 may be over-cap at delivery 2, in
    // which case delivery 2 stops matching through it while delivery
    // 1's report stands: the natural streaming semantics, mirrored
    // here verbatim). The Spark side runs the DURABLE sink (file-fed
    // micro-batches, per-batch gram/report segments); the hash match
    // certifies segment read → capped match → island construction →
    // segment write equals this declarative two-step chain.
    "dedup_exact_runs_incremental" -> {
      // splice guards: the r1/runs1 (and r2/runs2) text below
      // replicates exactRunsCtes' island formulation over per-step
      // gram subsets — if the base chain's formulation drifts, fail
      // loudly instead of certifying two different constructions
      require(exactRunsCtes.contains(
        "pa - row_number() OVER (PARTITION BY a, b, pa - pb ORDER BY pa) AS grp"),
        "exact-runs-incremental: island formulation drifted from exactRunsCtes")
      require(exactRunsCtes.contains("min(pb) AS s, max(pb) + 8 AS e"),
        "exact-runs-incremental: run-extent formulation drifted from exactRunsCtes")
      require(exactRunsCtes.contains(
        "count(DISTINCT doc_id) >= 2 AND count(*) <= 64"),
        "exact-runs-incremental: cap discipline drifted from exactRunsCtes")
      s"""WITH $toksCte, $gram8Ctes,
         |keep1 AS (SELECT gh FROM g WHERE doc_id % 2 = 0 GROUP BY gh
         |  HAVING count(DISTINCT doc_id) >= 2 AND count(*) <= 64),
         |g21 AS (SELECT g.doc_id, g.pos, g.gh FROM g JOIN keep1 USING (gh)
         |  WHERE g.doc_id % 2 = 0),
         |m1 AS (SELECT x.doc_id AS a, y.doc_id AS b, x.pos AS pa, y.pos AS pb
         |  FROM g21 x JOIN g21 y ON x.gh = y.gh AND x.doc_id < y.doc_id),
         |r1 AS (SELECT a, b, pa - pb AS d, pa, pb,
         |  pa - row_number() OVER (PARTITION BY a, b, pa - pb ORDER BY pa) AS grp
         |  FROM m1),
         |runs1 AS (SELECT a, b, min(pb) AS s, max(pb) + 8 AS e,
         |  count(*) + 7 AS run_len FROM r1 GROUP BY a, b, d, grp),
         |keep2 AS (SELECT gh FROM g GROUP BY gh
         |  HAVING count(DISTINCT doc_id) >= 2 AND count(*) <= 64),
         |g22 AS (SELECT g.doc_id, g.pos, g.gh FROM g JOIN keep2 USING (gh)),
         |m2 AS (SELECT x.doc_id AS a, y.doc_id AS b, x.pos AS pa, y.pos AS pb
         |  FROM g22 x JOIN g22 y ON x.gh = y.gh AND x.doc_id < y.doc_id
         |  WHERE x.doc_id % 2 = 1 OR y.doc_id % 2 = 1),
         |r2 AS (SELECT a, b, pa - pb AS d, pa, pb,
         |  pa - row_number() OVER (PARTITION BY a, b, pa - pb ORDER BY pa) AS grp
         |  FROM m2),
         |runs2 AS (SELECT a, b, min(pb) AS s, max(pb) + 8 AS e,
         |  count(*) + 7 AS run_len FROM r2 GROUP BY a, b, d, grp),
         |rep1 AS (SELECT a AS doc_a, b AS doc_b,
         |  max(run_len)::BIGINT AS max_run_tokens,
         |  (count(*) FILTER (WHERE run_len >= 16))::BIGINT AS n_runs,
         |  1::BIGINT AS delivery
         |  FROM runs1 GROUP BY a, b HAVING max(run_len) >= 16),
         |rep2 AS (SELECT a AS doc_a, b AS doc_b,
         |  max(run_len)::BIGINT AS max_run_tokens,
         |  (count(*) FILTER (WHERE run_len >= 16))::BIGINT AS n_runs,
         |  2::BIGINT AS delivery
         |  FROM runs2 GROUP BY a, b HAVING max(run_len) >= 16)
         |SELECT * FROM rep1 UNION ALL SELECT * FROM rep2
         |ORDER BY delivery, doc_a, doc_b""".stripMargin
    },

    // the APPLY step of exact-substring dedup: keep-FIRST-occurrence —
    // every doc cuts the spans it shares verbatim (>= 16 tokens) with
    // any LOWER doc_id; spans are the runs' extents in the higher doc,
    // union-merged per doc with a running-max gaps-and-islands (spans
    // have varying lengths, unlike the fixed-width boilerplate merge),
    // then the same kept-token rewrite as tx_boilerplate_apply
    "dedup_exact_runs_apply" ->
      s"""WITH $toksCte, $gram8Ctes, $exactRunsCtes,
         |spans0 AS (SELECT DISTINCT b AS doc_id, s, e FROM runs
         |  WHERE run_len >= 16),
         |v1 AS (SELECT doc_id, s, e,
         |  max(e) OVER (PARTITION BY doc_id ORDER BY s, e
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
         |  FROM spans0),
         |v2 AS (SELECT doc_id, s, e,
         |  sum(CASE WHEN prev_end IS NULL OR s >= prev_end THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY doc_id ORDER BY s, e) AS island
         |  FROM v1),
         |isl2 AS (SELECT doc_id, min(s) AS s, max(e) AS e
         |  FROM v2 GROUP BY doc_id, island),
         |spans AS (SELECT doc_id, list({'s': s, 'e': e}) AS sp
         |  FROM isl2 GROUP BY doc_id),
         |kk AS (SELECT t.doc_id, t.toks,
         |  list_transform(list_filter(generate_series(1, len(t.toks)),
         |    i -> coalesce(len(list_filter(sp.sp,
         |      p -> i - 1 >= p.s AND i - 1 < p.e)), 0) = 0),
         |    i -> t.toks[i]) AS kept
         |  FROM t LEFT JOIN spans sp ON sp.doc_id = t.doc_id)
         |SELECT doc_id, len(toks)::BIGINT AS n_before,
         |  len(kept)::BIGINT AS n_after,
         |  coalesce(array_to_string(kept, ' '), '') AS cleaned_text
         |FROM kk ORDER BY doc_id""".stripMargin,

    // the APPLY step: every doc rewritten with its flagged spans cut
    "tx_boilerplate_apply" ->
      s"""WITH $toksCte, $boilerplateCtes,
         |spans AS (SELECT doc_id, list({'s': s, 'e': e}) AS sp
         |  FROM isl GROUP BY doc_id),
         |k AS (SELECT t.doc_id, t.toks,
         |  list_transform(list_filter(generate_series(1, len(t.toks)),
         |    i -> coalesce(len(list_filter(sp.sp,
         |      p -> i - 1 >= p.s AND i - 1 < p.e)), 0) = 0),
         |    i -> t.toks[i]) AS kept
         |  FROM t LEFT JOIN spans sp ON sp.doc_id = t.doc_id)
         |SELECT doc_id, len(toks)::BIGINT AS n_before,
         |  len(kept)::BIGINT AS n_after,
         |  -- DuckDB: array_to_string of an empty list is NULL; Spark's
         |  -- array_join is '' (a fully-covered doc must compare equal)
         |  coalesce(array_to_string(kept, ' '), '') AS cleaned_text
         |FROM k ORDER BY doc_id""".stripMargin,

    // the registered-SQL-function surface (GraftFunctions.sqlSurface):
    // same kernels as tx_fingerprint/tx_tokens, reached through SQL text
    "sql_surface" ->
      s"""WITH $toksCte, $simhashCtes
         |SELECT d.doc_id,
         |  ('0x' || substr(md5(d.text), 1, 15))::BIGINT AS content_hash60,
         |  coalesce(fp.fp, 0)::BIGINT AS simhash60,
         |  len(t.toks)::BIGINT AS n_tokens,
         |  (CASE WHEN len(t.toks) >= 3 THEN len(list_distinct(list_transform(
         |    generate_series(1, len(t.toks) - 2),
         |    i -> array_to_string(list_slice(t.toks, i, i + 2), ' ')))) ELSE 0 END)::BIGINT
         |    AS n_shingles
         |FROM documents d
         |JOIN t ON t.doc_id = d.doc_id
         |LEFT JOIN fp ON fp.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "tx_contains" ->
      s"""WITH $toksCte
         |SELECT source, count(*) AS n_docs,
         |  count(*) FILTER (WHERE list_contains(toks, 'spark')) AS n_spark,
         |  count(*) FILTER (WHERE list_contains(toks, 'spark')
         |    AND list_contains(toks, 'shuffle')) AS n_both
         |FROM (SELECT t.*, d.source FROM t JOIN documents d USING (doc_id))
         |GROUP BY source ORDER BY source""".stripMargin,

    // entropy from exact integer counts: log2(n) − Σ c·log2(c)/n;
    // per-term float work is a single log2, combination rounded at 6 dp
    "tx_entropy" ->
      s"""WITH $toksCte,
         |tc AS (SELECT doc_id, unnest(toks) AS tok FROM t),
         |cnt AS (SELECT doc_id, tok, count(*) AS c FROM tc GROUP BY 1, 2)
         |SELECT doc_id, sum(c)::BIGINT AS n_tokens, count(*) AS n_distinct,
         |  round(log2(sum(c)::DOUBLE) -
         |    sum(c::DOUBLE * log2(c::DOUBLE)) / sum(c), 6) AS token_entropy,
         |  round(max(c)::DOUBLE / sum(c), 6) AS top_token_share
         |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // corpus-unigram surprisal: same count model, same
    // log2(c) − log2(N) expression tree, 6-dp rounded mean
    "tx_unigram_bits" ->
      s"""WITH $toksCte,
         |tc AS (SELECT doc_id, unnest(toks) AS tok FROM t),
         |v AS (SELECT tok, count(*) AS c FROM tc GROUP BY tok),
         |n AS (SELECT sum(c)::DOUBLE AS total FROM v)
         |SELECT doc_id, count(*)::BIGINT AS n_tokens,
         |  round(sum(-(log2(c::DOUBLE) - log2((SELECT total FROM n))))
         |    / count(*), 6) AS bits_per_token
         |FROM tc JOIN v USING (tok)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // DSIR importance weights: hashed unigram+bigram buckets (mod 1024),
    // target = 'en' docs vs the whole corpus, add-one smoothing; each
    // log2 is its own term so the float expression tree matches Spark's
    "tx_dsir_weights" ->
      s"""WITH $toksCte,
         |${dsirScCtes("en")}
         |SELECT doc_id, lang, n_grams, round(s, 6) AS log2_weight,
         |  round(s / n_grams, 6) AS bits_per_gram
         |FROM sc ORDER BY doc_id""".stripMargin,

    // DSIR Gumbel-top-k resample: noise from hash60('dsir-g|'||doc_id)
    // masked to 52 bits (u = (h%2^52+0.5)/2^52 is EXACT and strictly
    // inside (0,1) on both engines — unmasked, an h within 64 of 2^60
    // rounds u to 1.0 where Spark log NULLs but DuckDB ln gives ±inf);
    // key = ln w + gumbel rounded at 6 dp, keep rank ≤ ⌈n/5⌉ with
    // doc_id tiebreak
    "tx_dsir_select" ->
      s"""WITH $toksCte,
         |${dsirScCtes("en")},
         |sel AS (SELECT doc_id, lang, n_grams, s,
         |    round(s * 0.6931471805599453 +
         |      -ln(-ln(((('0x' || substr(md5('dsir-g|' || doc_id), 1, 15))::BIGINT % 4503599627370496)::DOUBLE + 0.5)
         |        / 4503599627370496.0)), 6) AS sel_key
         |  FROM sc),
         |n AS (SELECT count(*) AS cnt FROM sel),
         |r AS (SELECT *, row_number() OVER (ORDER BY sel_key DESC, doc_id) AS rn
         |  FROM sel)
         |SELECT doc_id, lang, n_grams, round(s, 6) AS log2_weight, sel_key
         |FROM r, n WHERE rn * 5 - 4 <= cnt ORDER BY doc_id""".stripMargin,

    // incremental DSIR: delivery 1 = evens scored under the evens-only
    // model, delivery 2 = odds scored under the full-corpus model —
    // the fold of exact integer counter segments makes the streamed
    // model equal the relational one bit-for-bit
    "tx_dsir_incremental" -> {
      s"""WITH $toksCte,
         |${gramBucketCtes("t")},
         |${dsirStepCtes("1", "en", "doc_id % 2 = 0", "doc_id % 2 = 0")},
         |${dsirStepCtes("2", "en", "true", "doc_id % 2 = 1")}
         |SELECT 1::BIGINT AS delivery, doc_id, lang, n_grams,
         |  round(s, 6) AS log2_weight, round(s / n_grams, 6) AS bits_per_gram
         |FROM sc1
         |UNION ALL
         |SELECT 2::BIGINT AS delivery, doc_id, lang, n_grams,
         |  round(s, 6) AS log2_weight, round(s / n_grams, 6) AS bits_per_gram
         |FROM sc2
         |ORDER BY delivery, doc_id""".stripMargin
    },

    // CCNet perplexity bucketing: cross-entropy under the 'en'-slice
    // hashed-bucket LM (target half of the DSIR model, same float
    // tree), tertile split via the ≤1001-bin quantized histogram —
    // c1/c2 are the first bins whose cumulative mass reaches 1/3 and
    // 2/3, exactly as the Spark side freezes them
    "tx_ccnet_ppl" ->
      s"""WITH $toksCte,
         |${gramBucketCtes("t")},
         |m AS (SELECT bucket,
         |    count(*) FILTER (WHERE lang = 'en') AS c_t
         |  FROM gi GROUP BY bucket),
         |tot AS (SELECT sum(c_t)::BIGINT AS n_t FROM m),
         |lp AS (SELECT bucket,
         |    (log2((c_t + 1)::DOUBLE) - log2((n_t + 1024)::DOUBLE)) AS lp
         |  FROM m, tot),
         |sc AS (SELECT gi.doc_id, gi.lang, count(*)::BIGINT AS n_grams,
         |    sum(-(lp.lp)) AS h
         |  FROM gi JOIN lp USING (bucket) GROUP BY 1, 2),
         |sb AS (SELECT doc_id, lang, n_grams,
         |    round(h / n_grams, 6) AS bits_per_gram FROM sc),
         |sbb AS (SELECT *, least(greatest(floor(bits_per_gram * 50.0), 0.0),
         |    1000.0)::BIGINT AS bin FROM sb),
         |hist AS (SELECT bin, count(*) AS cnt FROM sbb GROUP BY bin),
         |cum AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum FROM hist),
         |n AS (SELECT count(*) AS n_docs FROM sbb),
         |cuts AS (SELECT
         |    min(CASE WHEN cum * 3 >= n_docs THEN bin END) AS c1,
         |    min(CASE WHEN cum * 3 >= 2 * n_docs THEN bin END) AS c2
         |  FROM cum, n)
         |SELECT doc_id, lang, n_grams, bits_per_gram,
         |  CASE WHEN bin <= c1 THEN 'head'
         |       WHEN bin <= c2 THEN 'middle'
         |       ELSE 'tail' END AS ppl_bucket
         |FROM sbb, cuts ORDER BY doc_id""".stripMargin,

    // CCNet per-language bucketing: identical scored chain; histogram
    // keys on (lang, bin), cuts derive per lang with in-plan totals,
    // bucket compares against the lang's own (c1, c2)
    "tx_ccnet_ppl_by_lang" ->
      s"""WITH $toksCte,
         |${gramBucketCtes("t")},
         |m AS (SELECT bucket,
         |    count(*) FILTER (WHERE lang = 'en') AS c_t
         |  FROM gi GROUP BY bucket),
         |tot AS (SELECT sum(c_t)::BIGINT AS n_t FROM m),
         |lp AS (SELECT bucket,
         |    (log2((c_t + 1)::DOUBLE) - log2((n_t + 1024)::DOUBLE)) AS lp
         |  FROM m, tot),
         |sc AS (SELECT gi.doc_id, gi.lang, count(*)::BIGINT AS n_grams,
         |    sum(-(lp.lp)) AS h
         |  FROM gi JOIN lp USING (bucket) GROUP BY 1, 2),
         |sb AS (SELECT doc_id, lang, n_grams,
         |    round(h / n_grams, 6) AS bits_per_gram FROM sc),
         |sbb AS (SELECT *, least(greatest(floor(bits_per_gram * 50.0), 0.0),
         |    1000.0)::BIGINT AS bin FROM sb),
         |hist AS (SELECT lang, bin, count(*) AS cnt FROM sbb GROUP BY 1, 2),
         |cum AS (SELECT lang, bin, cnt,
         |    sum(cnt) OVER (PARTITION BY lang ORDER BY bin) AS cum FROM hist),
         |totl AS (SELECT lang, sum(cnt) AS n_docs FROM hist GROUP BY lang),
         |cuts AS (SELECT lang,
         |    min(CASE WHEN cum * 3 >= n_docs THEN bin END) AS c1,
         |    min(CASE WHEN cum * 3 >= 2 * n_docs THEN bin END) AS c2
         |  FROM cum JOIN totl USING (lang) GROUP BY lang)
         |SELECT s.doc_id, s.lang, s.n_grams, s.bits_per_gram,
         |  CASE WHEN s.bin <= c.c1 THEN 'head'
         |       WHEN s.bin <= c.c2 THEN 'middle'
         |       ELSE 'tail' END AS ppl_bucket
         |FROM sbb s JOIN cuts c USING (lang) ORDER BY s.doc_id""".stripMargin,

    // hashed multinomial NB lang-ID: train on hash-split buckets <90,
    // score split ≥95; score = prior + Σ log2(c+1) − n·log2(N_l+1024),
    // argmax at 6 dp with lang-asc tiebreak, output = confusion matrix
    "tx_nb_langid" ->
      s"""WITH $toksCte,
         |sb AS (SELECT doc_id,
         |    ('0x' || substr(md5('epoch0|' || doc_id), 1, 15))::BIGINT % 100 AS sb
         |  FROM t),
         |tr AS (SELECT t.* FROM t JOIN sb USING (doc_id) WHERE sb.sb < 90),
         |ev AS (SELECT t.* FROM t JOIN sb USING (doc_id) WHERE sb.sb >= 95),
         |${gramBucketCtes("tr")},
         |m AS (SELECT lang AS cand, bucket, count(*) AS c
         |  FROM gi GROUP BY 1, 2),
         |nl AS (SELECT cand, sum(c)::BIGINT AS n_l FROM m GROUP BY cand),
         |dl AS (SELECT lang AS cand, count(*) AS d_l FROM tr GROUP BY lang),
         |da AS (SELECT count(*) AS d_all FROM tr),
         |ls AS (SELECT cand,
         |    (log2(d_l::DOUBLE) - log2(d_all::DOUBLE)) AS prior,
         |    log2((n_l + 1024)::DOUBLE) AS log2_denom
         |  FROM nl JOIN dl USING (cand), da),
         |eg AS (SELECT doc_id, lang, list_concat(
         |    list_transform(toks, tk -> ('0x' || substr(md5(tk), 1, 15))::BIGINT),
         |    CASE WHEN len(toks) >= 2 THEN list_transform(
         |      generate_series(1, len(toks) - 1),
         |      i -> ('0x' || substr(md5(toks[i] || ' ' || toks[i + 1]), 1, 15))::BIGINT)
         |    ELSE []::BIGINT[] END) AS gh
         |  FROM ev),
         |egi AS (SELECT doc_id, unnest(gh) % 1024 AS bucket FROM eg),
         |hits AS (SELECT egi.doc_id, m.cand,
         |    sum(log2((m.c + 1)::DOUBLE)) AS sh
         |  FROM egi JOIN m USING (bucket) GROUP BY 1, 2),
         |ed AS (SELECT doc_id, lang AS true_lang,
         |    (len(toks) + CASE WHEN len(toks) >= 2 THEN len(toks) - 1 ELSE 0 END)::BIGINT
         |      AS n_grams
         |  FROM ev),
         |scores AS (SELECT ed.doc_id, ed.true_lang, ls.cand,
         |    round(ls.prior + coalesce(h.sh, 0.0) -
         |      ed.n_grams::DOUBLE * ls.log2_denom, 6) AS score
         |  FROM ed CROSS JOIN ls
         |  LEFT JOIN hits h ON h.doc_id = ed.doc_id AND h.cand = ls.cand),
         |pred AS (SELECT doc_id, true_lang, cand,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cand) AS rn
         |  FROM scores)
         |SELECT true_lang, cand AS pred_lang, count(*)::BIGINT AS n_docs
         |FROM pred WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // heavy hitters: the MG candidate pass is a guaranteed superset of
    // every token above N/512, and the Spark side filters on EXACT
    // re-counts — so the oracle is the plain full GROUP BY the two-pass
    // plan avoids shuffling, with the same integer threshold compare
    "tx_heavy_hitters" ->
      s"""WITH $toksCte,
         |tc AS (SELECT unnest(toks) AS tok FROM t),
         |tot AS (SELECT count(*) AS n_total FROM tc),
         |c AS (SELECT tok, count(*) AS cnt FROM tc GROUP BY tok)
         |SELECT c.tok, c.cnt::BIGINT AS cnt,
         |  round(c.cnt::DOUBLE / tot.n_total, 6) AS share
         |FROM c, tot WHERE c.cnt * 100 > tot.n_total * 1
         |ORDER BY cnt DESC, tok""".stripMargin,

    // Count-Min point frequency: the deterministic d=4 × w=1024 counter
    // matrix replayed cell-for-cell (cell (i, hash60('cm'||i||':'||tok)
    // % w) holds the total count of tokens hashing there), probed for
    // the exact top-10 heavy hitters; estimate = min over the 4 rows
    "tx_freq_cm" ->
      s"""WITH $toksCte,
         |alltok AS (SELECT unnest(toks) AS tok FROM t),
         |tc AS (SELECT tok, count(*)::BIGINT AS c FROM alltok GROUP BY tok),
         |tot AS (SELECT sum(c)::BIGINT AS n FROM tc),
         |probe AS (SELECT tok, c AS exact_n FROM tc, tot
         |  WHERE c * 100 > n * 1 ORDER BY c DESC, tok LIMIT 10),
         |cells AS (SELECT g.i AS i,
         |    ('0x' || substr(md5('cm' || g.i || ':' || tok), 1, 15))::BIGINT
         |      % 1024 AS cell,
         |    sum(c)::BIGINT AS total
         |  FROM tc CROSS JOIN generate_series(0, 3) g(i)
         |  GROUP BY g.i, cell),
         |est AS (SELECT p.tok, p.exact_n, min(cl.total)::BIGINT AS cm_est
         |  FROM probe p CROSS JOIN generate_series(0, 3) gg(i)
         |  JOIN cells cl ON cl.i = gg.i AND cl.cell =
         |    ('0x' || substr(md5('cm' || gg.i || ':' || p.tok), 1, 15))::BIGINT
         |      % 1024
         |  GROUP BY p.tok, p.exact_n)
         |SELECT tok, exact_n, cm_est, cm_est - exact_n AS overcount
         |FROM est ORDER BY exact_n DESC, tok""".stripMargin,

    // per-language corpus rollup (TextAnalysis.corpusReport)
    "corpus_report" ->
      s"""WITH $toksCte,
         |per AS (SELECT lang, count(*)::BIGINT AS n_docs,
         |    sum(len(toks))::BIGINT AS total_tokens,
         |    sum(len(text))::BIGINT AS total_chars
         |  FROM t GROUP BY lang),
         |tot AS (SELECT sum(n_docs)::BIGINT AS n FROM per)
         |SELECT lang, n_docs, total_tokens,
         |  round(total_tokens / n_docs::DOUBLE, 6) AS mean_tokens,
         |  round(total_chars / n_docs::DOUBLE, 6) AS mean_chars,
         |  round(n_docs / (SELECT n FROM tot)::DOUBLE, 6) AS doc_share
         |FROM per ORDER BY lang""".stripMargin,

    // grouped heavy hitters: per-source GROUP BY with the 3% integer
    // threshold — the per-group MG guarantee (undercount <= group
    // total / 256) makes the Spark side's exact-filtered output equal
    // the full grouped count
    "tx_heavy_hitters_by_source" ->
      """WITH tc AS (SELECT source,
        |  unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
        |    AS tok FROM documents),
        |tot AS (SELECT source, count(*) AS n_total FROM tc GROUP BY source),
        |c AS (SELECT source, tok, count(*) AS cnt FROM tc GROUP BY source, tok)
        |SELECT c.source, c.tok, c.cnt::BIGINT AS cnt,
        |  round(c.cnt::DOUBLE / tot.n_total, 6) AS share
        |FROM c JOIN tot USING (source) WHERE c.cnt * 100 > tot.n_total * 3
        |ORDER BY source, cnt DESC, tok""".stripMargin,

    // chunking: stride 48 (= 64 − 16 overlap), chunk k = toks[k·48+1 ..
    // k·48+64] 1-based inclusive, last chunk short; same start set
    "tx_chunk" ->
      s"""WITH $toksCte,
         |c AS (SELECT doc_id, toks,
         |    unnest(generate_series(0, (len(toks) - 1) // 48)) AS chunk_id
         |  FROM t WHERE len(toks) > 0),
         |s AS (SELECT doc_id, chunk_id,
         |    list_slice(toks, chunk_id * 48 + 1, chunk_id * 48 + 64) AS ctoks
         |  FROM c)
         |SELECT doc_id, chunk_id::BIGINT AS chunk_id,
         |  len(ctoks)::BIGINT AS n_chunk_tokens,
         |  array_to_string(ctoks, ' ') AS chunk_text
         |FROM s ORDER BY doc_id, chunk_id""".stripMargin,

    // tf-idf keywords: score = tf · (log2(N) − log2(df)), 6-dp rounded
    // before the rank; ties break lexically on the token
    "tx_keywords" ->
      s"""WITH $toksCte,
         |tc AS (SELECT doc_id, unnest(toks) AS tok FROM t),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tc GROUP BY 1, 2),
         |idf AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
         |n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
         |sc AS (SELECT doc_id, tok, tf,
         |    round(tf::DOUBLE * (log2((SELECT n_docs FROM n)) -
         |      log2(df::DOUBLE)), 6) AS score
         |  FROM tf JOIN idf USING (tok))
         |SELECT doc_id, tok, tf, score, rk FROM (
         |  SELECT doc_id, tok, tf, score,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, tok)::BIGINT AS rk
         |  FROM sc)
         |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    // A-ES weighted sample: key = (log2(h+1) − 60) / n_chars, 9-dp
    // rounded before the rank, id tiebreak; top 50
    "weighted_sample" ->
      """SELECT doc_id, n_chars, es_key, rk FROM (
        |  SELECT doc_id, n_chars, es_key,
        |    row_number() OVER (ORDER BY es_key DESC, doc_id)::BIGINT AS rk
        |  FROM (SELECT doc_id, n_chars,
        |    round((log2((('0x' || substr(md5('ws|' || doc_id::VARCHAR), 1, 15))::BIGINT)::DOUBLE + 1)
        |      - 60.0) / n_chars, 9) AS es_key
        |    FROM documents))
        |WHERE rk <= 50 ORDER BY rk""".stripMargin,

    // train/val/test split: salted hash60 mod 100, 90/5/5 thresholds —
    // a pure function of (doc_id, salt), identical in any engine
    "tx_split" ->
      """SELECT doc_id, b AS bucket,
        |  CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
        |    ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |  ('0x' || substr(md5('epoch0|' || doc_id::VARCHAR), 1, 15))::BIGINT
        |    % 100 AS b
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // per-source top-40%-by-count selection: the windowed twin of the
    // histogram threshold (rank · 100 ≤ n_src · 40, all-integer keep
    // rule; quality = exact ints divided once, bit-reproducible)
    "tx_select_by_source" ->
      s"""WITH $toksCte,
         |scored AS (SELECT t.doc_id, d.source, len(toks)::BIGINT AS n_tokens,
         |    len(list_distinct(toks))::DOUBLE / len(toks) AS quality
         |  FROM t JOIN documents d USING (doc_id) WHERE len(toks) > 0),
         |ranked AS (SELECT doc_id, source, n_tokens, quality,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY quality DESC, doc_id) AS rk,
         |    count(*) OVER (PARTITION BY source) AS n_src
         |  FROM scored)
         |SELECT doc_id, source, n_tokens, quality FROM ranked
         |WHERE rk * 100 <= n_src * 40 ORDER BY doc_id""".stripMargin,

    // winnowing (MOSS): positional 5-gram hash60s, each 4-window keeps
    // its rightmost minimum (offset argmax over hash = window min);
    // short docs (1 ≤ grams < 4) winnow one whole-array window;
    // n_shared = this doc's selected hashes selected in ≥1 other doc
    "tx_winnow" ->
      s"""WITH $toksCte,
         |g AS (SELECT doc_id,
         |    CASE WHEN len(toks) >= 5 THEN list_transform(
         |      generate_series(1, len(toks) - 4),
         |      i -> ('0x' || substr(md5(
         |        array_to_string(list_slice(toks, i, i + 4), ' ')), 1, 15))::BIGINT)
         |    ELSE []::BIGINT[] END AS h
         |  FROM t),
         |s AS (SELECT doc_id, len(h)::BIGINT AS n_grams, h FROM g),
         |nz AS (SELECT doc_id, n_grams, h,
         |    least(4, n_grams)::INT AS wlen,
         |    greatest(n_grams - 3, 1)::BIGINT AS n_windows
         |  FROM s WHERE n_grams >= 1),
         |sel AS (SELECT doc_id, n_grams, n_windows, h,
         |    list_distinct(list_transform(generate_series(1, n_windows), j ->
         |      j + list_max(list_filter(generate_series(0, wlen - 1),
         |        q -> h[(j + q)::INT] =
         |          list_min(list_slice(h, j::INT, (j + wlen - 1)::INT))))))
         |      AS pos
         |  FROM nz),
         |ph AS (SELECT doc_id, n_grams, n_windows,
         |    len(pos)::BIGINT AS n_prints,
         |    list_distinct(list_transform(pos, p -> h[p::INT])) AS phs
         |  FROM sel),
         |pr AS (SELECT doc_id, unnest(phs) AS gh FROM ph),
         |dfc AS (SELECT gh, count(*) AS df FROM pr GROUP BY gh),
         |shr AS (SELECT pr.doc_id,
         |    count(*) FILTER (WHERE dfc.df >= 2)::BIGINT AS n_shared
         |  FROM pr JOIN dfc USING (gh) GROUP BY pr.doc_id)
         |SELECT d.doc_id,
         |  coalesce(ph.n_grams, 0)::BIGINT AS n_grams,
         |  coalesce(ph.n_windows, 0)::BIGINT AS n_windows,
         |  coalesce(ph.n_prints, 0)::BIGINT AS n_prints,
         |  CASE WHEN coalesce(ph.n_windows, 0) > 0
         |    THEN round(ph.n_prints::DOUBLE / ph.n_windows, 6)
         |    ELSE 0.0 END AS winnow_density,
         |  coalesce(shr.n_shared, 0)::BIGINT AS n_shared
         |FROM documents d LEFT JOIN ph ON ph.doc_id = d.doc_id
         |LEFT JOIN shr ON shr.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // winnowed-fingerprint pairs: the tx_winnow selection replayed,
    // fingerprints with 2 ≤ df ≤ 64 joined doc×doc (doc_a < doc_b),
    // shared-print counts per pair
    "dedup_winnow" ->
      s"""WITH $toksCte,
         |g AS (SELECT doc_id,
         |    CASE WHEN len(toks) >= 5 THEN list_transform(
         |      generate_series(1, len(toks) - 4),
         |      i -> ('0x' || substr(md5(
         |        array_to_string(list_slice(toks, i, i + 4), ' ')), 1, 15))::BIGINT)
         |    ELSE []::BIGINT[] END AS h
         |  FROM t),
         |nz AS (SELECT doc_id, h,
         |    greatest(len(h) - 3, 1)::BIGINT AS n_windows,
         |    least(4, len(h))::INT AS wlen
         |  FROM g WHERE len(h) >= 1),
         |sel AS (SELECT doc_id, h,
         |    list_distinct(list_transform(generate_series(1, n_windows), j ->
         |      j + list_max(list_filter(generate_series(0, wlen - 1),
         |        q -> h[(j + q)::INT] =
         |          list_min(list_slice(h, j::INT, (j + wlen - 1)::INT))))))
         |      AS pos
         |  FROM nz),
         |pr AS (SELECT doc_id,
         |    unnest(list_distinct(list_transform(pos, p -> h[p::INT]))) AS gh
         |  FROM sel),
         |hot AS (SELECT gh FROM pr GROUP BY gh
         |  HAVING count(*) >= 2 AND count(*) <= 64),
         |p2 AS (SELECT pr.doc_id, pr.gh FROM pr JOIN hot USING (gh))
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  count(*)::BIGINT AS shared_prints
         |FROM p2 a JOIN p2 b ON a.gh = b.gh AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 ORDER BY doc_a, doc_b""".stripMargin,

    // per-epoch shuffle: hash60('epoch0|' || id) drives shard and rank
    "shuffle_documents" ->
      """SELECT doc_id, shard, pos FROM (
        |  SELECT doc_id, h % 64 AS shard,
        |    (row_number() OVER (PARTITION BY h % 64 ORDER BY h, doc_id)
        |      - 1)::BIGINT AS pos
        |  FROM (SELECT doc_id,
        |    ('0x' || substr(md5('epoch0|' || doc_id::VARCHAR), 1, 15))::BIGINT AS h
        |    FROM documents))
        |ORDER BY doc_id""".stripMargin,

    "sample_documents" ->
      """SELECT doc_id, lang, source, n_chars,
        |  (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100) AS bucket
        |FROM documents
        |WHERE (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100) < 10
        |ORDER BY doc_id""".stripMargin,

    // stratified sample: the naive rank-window twin of the bounded-heap
    // per-source top-N (key = salted hash60 mod 2^40, id tiebreak)
    "sample_stratified" ->
      """SELECT source, rk, doc_id, hs FROM (
        |  SELECT source, doc_id, hs,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY hs, doc_id)::BIGINT AS rk
        |  FROM (SELECT source, doc_id,
        |    ('0x' || substr(md5('strat|' || doc_id::VARCHAR), 1, 15))::BIGINT
        |      % 1099511627776 AS hs
        |    FROM documents))
        |WHERE rk <= 10 ORDER BY source, rk""".stripMargin,

    // corpus mix: ONE cumsum per language over the global admission
    // order (bucket, hash, doc_id) — semantically identical to the
    // Spark side's two-phase bucketed plan
    "corpus_mix" ->
      s"""WITH $toksCte,
         |d AS (SELECT doc_id, lang, len(toks)::BIGINT AS n_tokens,
         |  ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS h
         |  FROM t),
         |c AS (SELECT doc_id, lang, n_tokens,
         |  coalesce(sum(n_tokens) OVER (PARTITION BY lang
         |    ORDER BY h % 256, h, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
         |    AS admit_offset
         |  FROM d)
         |SELECT doc_id, lang, n_tokens, admit_offset FROM c
         |WHERE admit_offset < 2000 ORDER BY doc_id""".stripMargin,

    // temperature mix: per-language budget = totalBudget·isqrt(mass) /
    // Σ isqrt(mass), all-integer (floor(sqrt(bigint)) is engine-exact,
    // // is integer division); admission = corpus_mix's per-language
    // cumsum in (bucket, hash, id) order against the language's budget
    "corpus_mix_temperature" ->
      s"""WITH $toksCte,
         |d AS (SELECT doc_id, lang, len(toks)::BIGINT AS n_tokens,
         |  ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS h
         |  FROM t),
         |m AS (SELECT lang, sum(n_tokens)::BIGINT AS mm FROM d GROUP BY lang),
         |wt AS (SELECT lang, floor(sqrt(mm::DOUBLE))::BIGINT AS w FROM m),
         |den AS (SELECT sum(w)::BIGINT AS wsum FROM wt),
         |b AS (SELECT lang, ((4000 * w) // wsum)::BIGINT AS lang_budget
         |  FROM wt, den),
         |c AS (SELECT doc_id, lang, n_tokens,
         |  coalesce(sum(n_tokens) OVER (PARTITION BY lang
         |    ORDER BY h % 256, h, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
         |    AS admit_offset
         |  FROM d)
         |SELECT c.doc_id, c.lang, c.n_tokens, b.lang_budget, c.admit_offset
         |FROM c JOIN b USING (lang)
         |WHERE c.admit_offset < b.lang_budget ORDER BY doc_id""".stripMargin,

    // shard = same 60-bit id hash as sample_documents, mod nShards=16 —
    // the bounded window key txPack uses (one cumsum per (lang, shard))
    "pack_sequences" ->
      s"""WITH $toksCte,
         |sh AS (SELECT doc_id, lang, len(toks)::BIGINT AS n_tokens,
         |  (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 16) AS shard
         |  FROM t)
         |SELECT doc_id, lang, n_tokens, shard,
         |  sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
         |    ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens,
         |  ((sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
         |    ROWS UNBOUNDED PRECEDING) - n_tokens) // 2048)::BIGINT AS bin_id
         |FROM sh ORDER BY doc_id""".stripMargin,

    "dedup_exact" ->
      """SELECT sum(c)::BIGINT AS total_docs, count(*) AS unique_texts,
        |  coalesce(sum(CASE WHEN c > 1 THEN c END), 0)::BIGINT AS docs_in_dup_groups
        |FROM (SELECT md5(text) AS h, count(*) AS c FROM documents GROUP BY 1)""".stripMargin,

    // cand = pairs sharing a df-capped shingle (mirrors Spark's
    // maxDf=10000 stop-shingle cap on CANDIDATE GENERATION only); the
    // verify step still intersects the FULL shingle sets, exactly like
    // dedupNgramJaccard
    "dedup_ngram_jaccard" ->
      s"""WITH $toksCte, $shinglesCte,
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |rare AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 10000),
         |pr AS (SELECT doc_id, s FROM sh JOIN rare USING (s)),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM pr a JOIN pr b ON a.s = b.s AND a.doc_id < b.doc_id),
         |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2
         |  ),
         |commonc AS (SELECT co.* FROM common co JOIN cand USING (doc_a, doc_b))
         |SELECT doc_a, doc_b,
         |  n_common::DOUBLE / (sa.n_sh + sb.n_sh - n_common) AS jaccard
         |FROM commonc
         |JOIN sizes sa ON sa.doc_id = doc_a
         |JOIN sizes sb ON sb.doc_id = doc_b
         |WHERE n_common::DOUBLE / (sa.n_sh + sb.n_sh - n_common) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,

    // connected components over the jaccard>=0.5 pair graph via
    // recursive min-label flooding; min(root) per node = component min
    "dedup_clusters" ->
      s"""WITH RECURSIVE $toksCte, $shinglesCte,
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |rare AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 10000),
         |pr AS (SELECT doc_id, s FROM sh JOIN rare USING (s)),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM pr a JOIN pr b ON a.s = b.s AND a.doc_id < b.doc_id),
         |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |commonc AS (SELECT co.* FROM common co JOIN cand USING (doc_a, doc_b)),
         |pairs AS (SELECT doc_a, doc_b FROM commonc
         |  JOIN sizes sa ON sa.doc_id = doc_a
         |  JOIN sizes sb ON sb.doc_id = doc_b
         |  WHERE n_common::DOUBLE / (sa.n_sh + sb.n_sh - n_common) >= 0.5),
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(u, root) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
         |  UNION
         |  SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.u)
         |SELECT u AS doc_id, min(root)::BIGINT AS cluster_rep,
         |  (u = min(root)) AS is_canonical
         |FROM reach GROUP BY u ORDER BY doc_id""".stripMargin,

    // composite quality gate: first failing rule = drop reason
    "tx_filter" ->
      s"""WITH $toksCte,
         |q AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens,
         |  len(list_distinct(toks))::DOUBLE / len(toks) AS distinct_ratio,
         |  len(list_filter(toks, x -> x IN ('the', 'a')))::DOUBLE / len(toks) AS en_score,
         |  list_sum(list_transform(toks, x -> len(x)))::DOUBLE / len(toks) AS mean_token_len
         |FROM t),
         |r AS (SELECT *, CASE WHEN n_tokens < 10 THEN 'too_short'
         |  WHEN n_tokens > 5000 THEN 'too_long'
         |  WHEN distinct_ratio < 0.3 THEN 'repetitive'
         |  WHEN en_score < 0.04 THEN 'non_english'
         |  WHEN mean_token_len < 2.0 OR mean_token_len > 12.0 THEN 'token_shape'
         |  END AS reason FROM q)
         |SELECT doc_id, n_tokens, distinct_ratio, en_score, mean_token_len,
         |  reason, reason IS NULL AS keep
         |FROM r ORDER BY doc_id""".stripMargin,

    // PII redaction over the planted corpus: identical Java-regex/RE2
    // subset patterns, same plant arithmetic, same email→ip→phone
    // replacement order; counts taken before redaction
    "tx_redact" ->
      """WITH a AS (SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 0 THEN text || ' contact user' ||
        |    doc_id::VARCHAR || '@mail.example.com from 10.0.' ||
        |    (doc_id % 256)::VARCHAR || '.7 call 555-' ||
        |    lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-0199'
        |  ELSE text END AS text FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
        |  len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ips,
        |  len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b'))::BIGINT AS n_phones,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS redacted_text,
        |  (len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) +
        |   len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) +
        |   len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b'))) > 0 AS pii_found
        |FROM a ORDER BY doc_id""".stripMargin,

    // decontamination: same hash split (buckets >= 97 eval), same
    // planted 12-token quote into every 25th train doc, same distinct
    // 8-gram hashes; counts = matched grams + matching eval docs
    "decontaminate" -> decontamSql(withDelivery = false),

    // incremental decontamination (+ durable-sink twin): the frozen
    // benchmark index makes deliveries independent, so the relational
    // replay is the batch audit with the delivery label (doc_id parity)
    "decontaminate_incremental" -> decontamIncrementalSql,
    "decontaminate_incremental_sink" -> decontamIncrementalSql,

    // the deduplicated corpus: exact-dup removal (min doc_id per md5)
    // + near-dup non-canonical removal over the ngram cluster graph
    "dedup_apply" ->
      s"""WITH RECURSIVE $toksCte, $shinglesCte,
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |rare AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 10000),
         |pr AS (SELECT doc_id, s FROM sh JOIN rare USING (s)),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM pr a JOIN pr b ON a.s = b.s AND a.doc_id < b.doc_id),
         |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |commonc AS (SELECT co.* FROM common co JOIN cand USING (doc_a, doc_b)),
         |pairs AS (SELECT doc_a, doc_b FROM commonc
         |  JOIN sizes sa ON sa.doc_id = doc_a
         |  JOIN sizes sb ON sb.doc_id = doc_b
         |  WHERE n_common::DOUBLE / (sa.n_sh + sb.n_sh - n_common) >= 0.5),
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(u, root) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
         |  UNION
         |  SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.u),
         |cl AS (SELECT u AS doc_id, min(root) AS rep FROM reach GROUP BY u),
         |exact_keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
         |SELECT d.doc_id, d.lang, d.source, d.n_chars
         |FROM documents d
         |JOIN exact_keep USING (doc_id)
         |WHERE d.doc_id NOT IN (SELECT doc_id FROM cl WHERE doc_id <> rep)
         |ORDER BY doc_id""".stripMargin,

    // apply over the UNION of all three detectors' pair graphs (ngram
    // Jaccard ∪ SimHash ∪ embedding cosine) — the ngram chain is the
    // dedup_apply CTEs verbatim (final CTE renamed npairs); the SimHash
    // band CTEs are renamed sbands to avoid the ngram cand; embedding
    // pairs use the dedup_embedding_045 exact predicate on vec_id=doc_id
    "dedup_apply_all" ->
      s"""WITH RECURSIVE $toksCte, $shinglesCte,
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |rare AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 10000),
         |pr AS (SELECT doc_id, s FROM sh JOIN rare USING (s)),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM pr a JOIN pr b ON a.s = b.s AND a.doc_id < b.doc_id),
         |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |commonc AS (SELECT co.* FROM common co JOIN cand USING (doc_a, doc_b)),
         |npairs AS (SELECT doc_a, doc_b FROM commonc
         |  JOIN sizes sa ON sa.doc_id = doc_a
         |  JOIN sizes sb ON sb.doc_id = doc_b
         |  WHERE n_common::DOUBLE / (sa.n_sh + sb.n_sh - n_common) >= 0.5),
         |$simhashCtes,
         |sbands AS (SELECT doc_id, fp, b, (fp >> (b * 15)) & 32767 AS band_key
         |  FROM fp CROSS JOIN generate_series(0, 3) g(b)),
         |spairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM sbands x JOIN sbands y
         |  ON x.b = y.b AND x.band_key = y.band_key AND x.doc_id < y.doc_id
         |  WHERE bit_count(xor(x.fp, y.fp)) <= 4),
         |epairs AS (SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
         |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |  WHERE round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
         |    (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
         |     sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) >= 0.45),
         |pairs AS (SELECT doc_a, doc_b FROM npairs
         |  UNION SELECT doc_a, doc_b FROM spairs
         |  UNION SELECT doc_a, doc_b FROM epairs),
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(u, root) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
         |  UNION
         |  SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.u),
         |cl AS (SELECT u AS doc_id, min(root) AS rep FROM reach GROUP BY u),
         |exact_keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
         |SELECT d.doc_id, d.lang, d.source, d.n_chars
         |FROM documents d
         |JOIN exact_keep USING (doc_id)
         |WHERE d.doc_id NOT IN (SELECT doc_id FROM cl WHERE doc_id <> rep)
         |ORDER BY doc_id""".stripMargin,

    // CROSS-MODAL joint apply: the dedup_apply_all chain with one
    // union branch PER MODALITY — the certified phash/audio/video
    // pair relations (phashCtes/audCtes/vidCtes, verbatim) mapped to
    // owner-document edges through their attachments (base media
    // owned by its doc; the near-dup copy of doc d's image/clip/video
    // embedded by doc d+1 / d+2 / d+3; owners past the corpus
    // dropped)
    "dedup_apply_multimodal" ->
      s"""WITH RECURSIVE $toksCte, $shinglesCte,
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |rare AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 10000),
         |pr AS (SELECT doc_id, s FROM sh JOIN rare USING (s)),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM pr a JOIN pr b ON a.s = b.s AND a.doc_id < b.doc_id),
         |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |commonc AS (SELECT co.* FROM common co JOIN cand USING (doc_a, doc_b)),
         |npairs AS (SELECT doc_a, doc_b FROM commonc
         |  JOIN sizes sa ON sa.doc_id = doc_a
         |  JOIN sizes sb ON sb.doc_id = doc_b
         |  WHERE n_common::DOUBLE / (sa.n_sh + sb.n_sh - n_common) >= 0.5),
         |$simhashCtes,
         |sbands AS (SELECT doc_id, fp, b, (fp >> (b * 15)) & 32767 AS band_key
         |  FROM fp CROSS JOIN generate_series(0, 3) g(b)),
         |spairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM sbands x JOIN sbands y
         |  ON x.b = y.b AND x.band_key = y.band_key AND x.doc_id < y.doc_id
         |  WHERE bit_count(xor(x.fp, y.fp)) <= 4),
         |epairs AS (SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
         |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |  WHERE round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
         |    (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
         |     sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) >= 0.45),
         |$phashCtes,
         |$audCtes,
         |$vidCtes,
         |pown AS (SELECT pm.media_id,
         |    CASE WHEN pm.planted = 1 THEN pm.src_id + 1 ELSE pm.media_id END AS owner
         |  FROM pm JOIN documents d
         |    ON d.doc_id = CASE WHEN pm.planted = 1 THEN pm.src_id + 1 ELSE pm.media_id END),
         |mdpairs AS (SELECT DISTINCT least(a.owner, b.owner) AS doc_a,
         |    greatest(a.owner, b.owner) AS doc_b
         |  FROM ppair p JOIN pown a ON p.media_a = a.media_id
         |               JOIN pown b ON p.media_b = b.media_id
         |  WHERE a.owner <> b.owner),
         |aown AS (SELECT am.media_id,
         |    CASE WHEN am.planted = 1 THEN am.src_id + 2 ELSE am.media_id END AS owner
         |  FROM am JOIN documents d
         |    ON d.doc_id = CASE WHEN am.planted = 1 THEN am.src_id + 2 ELSE am.media_id END),
         |adpairs AS (SELECT DISTINCT least(a.owner, b.owner) AS doc_a,
         |    greatest(a.owner, b.owner) AS doc_b
         |  FROM apair p JOIN aown a ON p.media_a = a.media_id
         |               JOIN aown b ON p.media_b = b.media_id
         |  WHERE a.owner <> b.owner),
         |vown AS (SELECT vm.media_id,
         |    CASE WHEN vm.planted = 1 THEN vm.src_id + 3 ELSE vm.media_id END AS owner
         |  FROM vm JOIN documents d
         |    ON d.doc_id = CASE WHEN vm.planted = 1 THEN vm.src_id + 3 ELSE vm.media_id END),
         |vdpairs AS (SELECT DISTINCT least(a.owner, b.owner) AS doc_a,
         |    greatest(a.owner, b.owner) AS doc_b
         |  FROM vpair p JOIN vown a ON p.media_a = a.media_id
         |               JOIN vown b ON p.media_b = b.media_id
         |  WHERE a.owner <> b.owner),
         |pairs AS (SELECT doc_a, doc_b FROM npairs
         |  UNION SELECT doc_a, doc_b FROM spairs
         |  UNION SELECT doc_a, doc_b FROM epairs
         |  UNION SELECT doc_a, doc_b FROM mdpairs
         |  UNION SELECT doc_a, doc_b FROM adpairs
         |  UNION SELECT doc_a, doc_b FROM vdpairs),
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(u, root) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
         |  UNION
         |  SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.u),
         |cl AS (SELECT u AS doc_id, min(root) AS rep FROM reach GROUP BY u),
         |exact_keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
         |SELECT d.doc_id, d.lang, d.source, d.n_chars
         |FROM documents d
         |JOIN exact_keep USING (doc_id)
         |WHERE d.doc_id NOT IN (SELECT doc_id FROM cl WHERE doc_id <> rep)
         |ORDER BY doc_id""".stripMargin,

    // same clustering stage over the SimHash detector's pair graph
    // (dedupClustersDf takes the pair DataFrame as a parameter)
    "dedup_clusters_simhash" ->
      s"""WITH RECURSIVE $toksCte, $simhashCtes,
         |bands AS (SELECT doc_id, fp, b, (fp >> (b * 15)) & 32767 AS band_key
         |  FROM fp CROSS JOIN generate_series(0, 3) g(b)),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |    x.fp AS fp_a, y.fp AS fp_b
         |  FROM bands x JOIN bands y
         |  ON x.b = y.b AND x.band_key = y.band_key AND x.doc_id < y.doc_id),
         |pairs AS (SELECT doc_a, doc_b FROM cand
         |  WHERE bit_count(xor(fp_a, fp_b)) <= 4),
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(u, root) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
         |  UNION
         |  SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.u)
         |SELECT u AS doc_id, min(root)::BIGINT AS cluster_rep,
         |  (u = min(root)) AS is_canonical
         |FROM reach GROUP BY u ORDER BY doc_id""".stripMargin,

    // r18: mirrors the guarded detector — exact pre-collapse (one
    // representative per byte-identical text; in-group pairs are
    // est = jaccard = 1.0 by definition) and the hot-band occupancy
    // cap over REPRESENTATIVE bands (the maxDf discipline applied to
    // the band space; never fires below occupancy HotBandCap, which
    // dedup_band_stats certifies for the oracle corpora)
    "dedup_minhash_lsh" ->
      s"""WITH $toksCte, $shinglesCte,
         |grp AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS rep
         |  FROM documents),
         |sh2 AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM sh),
         |ff AS (SELECT f, (f * 7 + 3) % 60 AS rr,
         |    ('0x' || substr(md5('mh|' || f::VARCHAR), 1, 15))::BIGINT AS c
         |  FROM generate_series(0, 15) g(f)),
         |sig AS (SELECT doc_id, f,
         |    min(xor((h >> rr) | ((h & ((1::BIGINT << rr) - 1)) << (60 - rr)), c)) AS h
         |  FROM sh2 CROSS JOIN ff GROUP BY doc_id, f),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |bands AS (SELECT doc_id, f // 2 AS band,
         |    string_agg(h::VARCHAR, '|' ORDER BY f) AS band_key
         |  FROM sig WHERE doc_id IN (SELECT rep FROM grp)
         |  GROUP BY doc_id, f // 2),
         |occok AS (SELECT band, band_key FROM bands
         |  GROUP BY band, band_key HAVING count(*) <= ${graft.dedup.BandGuard.HotBandCap}),
         |bandsok AS (SELECT b.* FROM bands b JOIN occok USING (band, band_key)),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bandsok x JOIN bandsok y
         |  ON x.band = y.band AND x.band_key = y.band_key AND x.doc_id < y.doc_id),
         |est AS (SELECT c.doc_a, c.doc_b,
         |    (count(*) FILTER (WHERE sa.h = sb.h))::DOUBLE / 16 AS est_jaccard
         |  FROM cand c
         |  JOIN sig sa ON sa.doc_id = c.doc_a
         |  JOIN sig sb ON sb.doc_id = c.doc_b AND sb.f = sa.f
         |  GROUP BY 1, 2),
         |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |vr AS (SELECT e.doc_a, e.doc_b, e.est_jaccard,
         |    co.n_common::DOUBLE / (da.n_sh + db.n_sh - co.n_common) AS jaccard
         |  FROM est e
         |  JOIN common co ON co.doc_a = e.doc_a AND co.doc_b = e.doc_b
         |  JOIN sizes da ON da.doc_id = e.doc_a
         |  JOIN sizes db ON db.doc_id = e.doc_b
         |  WHERE co.n_common::DOUBLE / (da.n_sh + db.n_sh - co.n_common) >= 0.5),
         |xp AS (SELECT least(ga.doc_id, gb.doc_id) AS doc_a,
         |    greatest(ga.doc_id, gb.doc_id) AS doc_b, v.est_jaccard, v.jaccard
         |  FROM vr v JOIN grp ga ON ga.rep = v.doc_a
         |            JOIN grp gb ON gb.rep = v.doc_b),
         |ig AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    1.0::DOUBLE AS est_jaccard, 1.0::DOUBLE AS jaccard
         |  FROM grp a JOIN grp b ON a.rep = b.rep AND a.doc_id < b.doc_id
         |  WHERE a.rep IN (SELECT DISTINCT doc_id FROM sh))
         |SELECT doc_a, doc_b, est_jaccard, jaccard FROM xp
         |UNION ALL
         |SELECT doc_a, doc_b, est_jaccard, jaccard FROM ig
         |ORDER BY doc_a, doc_b""".stripMargin,

    // banded-family occupancy introspection (r17 verdict #1's loud
    // report): per family, pre-collapse volume, identical-fingerprint
    // group structure, and REPRESENTATIVE band occupancy vs the hot
    // cap — the emb_ivf_cell_stats twin for the band space
    "dedup_band_stats" -> {
      val cap = graft.dedup.BandGuard.HotBandCap
      s"""WITH $toksCte, $shinglesCte,
         |sh2 AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM sh),
         |ff AS (SELECT f, (f * 7 + 3) % 60 AS rr,
         |    ('0x' || substr(md5('mh|' || f::VARCHAR), 1, 15))::BIGINT AS c
         |  FROM generate_series(0, 15) g(f)),
         |sig AS (SELECT doc_id, f,
         |    min(xor((h >> rr) | ((h & ((1::BIGINT << rr) - 1)) << (60 - rr)), c)) AS h
         |  FROM sh2 CROSS JOIN ff GROUP BY doc_id, f),
         |shd AS (SELECT DISTINCT doc_id FROM sh),
         |mgrp AS (SELECT min(doc_id) AS rep, count(*) AS members
         |  FROM documents WHERE doc_id IN (SELECT doc_id FROM shd)
         |  GROUP BY text),
         |mbands AS (SELECT doc_id, f // 2 AS band,
         |    string_agg(h::VARCHAR, '|' ORDER BY f) AS band_key
         |  FROM sig WHERE doc_id IN (SELECT rep FROM mgrp)
         |  GROUP BY doc_id, f // 2),
         |mocc AS (SELECT band, band_key, count(*) AS occ
         |  FROM mbands GROUP BY 1, 2),
         |$simhashCtes,
         |sgrp AS (SELECT fp, min(doc_id) AS rep, count(*) AS members
         |  FROM fp GROUP BY fp),
         |socc AS (SELECT b, (fp >> (b * 15)) & 32767 AS band_key,
         |    count(*) AS occ
         |  FROM sgrp CROSS JOIN generate_series(0, 3) sg(b) GROUP BY 1, 2),
         |$phashCtes,
         |pgrp AS (SELECT fp, min(media_id) AS rep, count(*) AS members
         |  FROM pfp GROUP BY fp),
         |pocc AS (SELECT b, (fp >> (b * 15)) & 32767 AS band_key,
         |    count(*) AS occ
         |  FROM pgrp CROSS JOIN generate_series(0, 3) pg(b) GROUP BY 1, 2),
         |$audCtes,
         |agrp AS (SELECT fp, min(media_id) AS rep, count(*) AS members
         |  FROM afp GROUP BY fp),
         |aocc AS (SELECT b, (fp >> (b * 15)) & 32767 AS band_key,
         |    count(*) AS occ
         |  FROM agrp CROSS JOIN generate_series(0, 3) ag(b) GROUP BY 1, 2),
         |$vidCtes,
         |vgrp AS (SELECT f, fp, min(media_id) AS rep, count(*) AS members
         |  FROM vfp GROUP BY f, fp),
         |vocc AS (SELECT f, b, (fp >> (b * 15)) & 32767 AS band_key,
         |    count(*) AS occ
         |  FROM vgrp CROSS JOIN generate_series(0, 3) vg(b) GROUP BY 1, 2, 3)
         |SELECT 'minhash' AS family,
         |  (SELECT count(*) FROM shd)::BIGINT AS n_raw,
         |  (SELECT count(*) FROM mgrp)::BIGINT AS n_reps,
         |  (SELECT count(*) FROM mgrp WHERE members > 1)::BIGINT AS n_dup_groups,
         |  (SELECT coalesce(max(members), 0) FROM mgrp)::BIGINT AS max_group,
         |  (SELECT count(*) FROM mocc)::BIGINT AS n_band_keys,
         |  (SELECT coalesce(max(occ), 0) FROM mocc)::BIGINT AS max_band_occ,
         |  (SELECT count(*) FROM mocc WHERE occ > $cap)::BIGINT AS hot_bands,
         |  $cap::BIGINT AS hot_cap
         |UNION ALL SELECT 'simhash',
         |  (SELECT count(*) FROM fp)::BIGINT,
         |  (SELECT count(*) FROM sgrp)::BIGINT,
         |  (SELECT count(*) FROM sgrp WHERE members > 1)::BIGINT,
         |  (SELECT coalesce(max(members), 0) FROM sgrp)::BIGINT,
         |  (SELECT count(*) FROM socc)::BIGINT,
         |  (SELECT coalesce(max(occ), 0) FROM socc)::BIGINT,
         |  (SELECT count(*) FROM socc WHERE occ > $cap)::BIGINT,
         |  $cap::BIGINT
         |UNION ALL SELECT 'phash',
         |  (SELECT count(*) FROM pfp)::BIGINT,
         |  (SELECT count(*) FROM pgrp)::BIGINT,
         |  (SELECT count(*) FROM pgrp WHERE members > 1)::BIGINT,
         |  (SELECT coalesce(max(members), 0) FROM pgrp)::BIGINT,
         |  (SELECT count(*) FROM pocc)::BIGINT,
         |  (SELECT coalesce(max(occ), 0) FROM pocc)::BIGINT,
         |  (SELECT count(*) FROM pocc WHERE occ > $cap)::BIGINT,
         |  $cap::BIGINT
         |UNION ALL SELECT 'audio',
         |  (SELECT count(*) FROM afp)::BIGINT,
         |  (SELECT count(*) FROM agrp)::BIGINT,
         |  (SELECT count(*) FROM agrp WHERE members > 1)::BIGINT,
         |  (SELECT coalesce(max(members), 0) FROM agrp)::BIGINT,
         |  (SELECT count(*) FROM aocc)::BIGINT,
         |  (SELECT coalesce(max(occ), 0) FROM aocc)::BIGINT,
         |  (SELECT count(*) FROM aocc WHERE occ > $cap)::BIGINT,
         |  $cap::BIGINT
         |UNION ALL SELECT 'video',
         |  (SELECT count(*) FROM vfp)::BIGINT,
         |  (SELECT count(*) FROM vgrp)::BIGINT,
         |  (SELECT count(*) FROM vgrp WHERE members > 1)::BIGINT,
         |  (SELECT coalesce(max(members), 0) FROM vgrp)::BIGINT,
         |  (SELECT count(*) FROM vocc)::BIGINT,
         |  (SELECT coalesce(max(occ), 0) FROM vocc)::BIGINT,
         |  (SELECT count(*) FROM vocc WHERE occ > $cap)::BIGINT,
         |  $cap::BIGINT
         |ORDER BY family""".stripMargin
    },

    // chunk-level dedup: tx_chunk's stride-48/window-64 chunks run
    // through the SAME minhash/band family keyed by (doc_id, chunk_id);
    // verified chunk pairs (exact jaccard >= 0.5) roll up to doc pairs
    "dedup_chunks" ->
      s"""WITH $toksCte,
         |chx AS (SELECT doc_id, toks,
         |    unnest(generate_series(0, (len(toks) - 1) // 48)) AS chunk_id
         |  FROM t WHERE len(toks) > 0),
         |cs AS (SELECT doc_id, chunk_id,
         |    list_slice(toks, chunk_id * 48 + 1, chunk_id * 48 + 64) AS ctoks
         |  FROM chx),
         |csh AS (SELECT doc_id, chunk_id, unnest(
         |    CASE WHEN len(ctoks) >= 3 THEN list_distinct(list_transform(
         |      generate_series(1, len(ctoks) - 2),
         |      i -> array_to_string(list_slice(ctoks, i, i + 2), ' ')))
         |    ELSE []::VARCHAR[] END) AS s
         |  FROM cs),
         |sh2 AS (SELECT doc_id, chunk_id,
         |    ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM csh),
         |ff AS (SELECT f, (f * 7 + 3) % 60 AS rr,
         |    ('0x' || substr(md5('mh|' || f::VARCHAR), 1, 15))::BIGINT AS c
         |  FROM generate_series(0, 15) g(f)),
         |sig AS (SELECT doc_id, chunk_id, f,
         |    min(xor((h >> rr) | ((h & ((1::BIGINT << rr) - 1)) << (60 - rr)), c)) AS h
         |  FROM sh2 CROSS JOIN ff GROUP BY doc_id, chunk_id, f),
         |bands AS (SELECT doc_id, chunk_id, f // 2 AS band,
         |    string_agg(h::VARCHAR, '|' ORDER BY f) AS band_key
         |  FROM sig GROUP BY doc_id, chunk_id, f // 2),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, x.chunk_id AS chunk_a,
         |    y.doc_id AS doc_b, y.chunk_id AS chunk_b
         |  FROM bands x JOIN bands y
         |  ON x.band = y.band AND x.band_key = y.band_key
         |    AND x.doc_id < y.doc_id),
         |sizes AS (SELECT doc_id, chunk_id, count(*) AS n_sh
         |  FROM csh GROUP BY 1, 2),
         |common AS (SELECT ca.doc_a, ca.chunk_a, ca.doc_b, ca.chunk_b,
         |    count(*) AS n_common
         |  FROM cand ca
         |  JOIN csh a ON a.doc_id = ca.doc_a AND a.chunk_id = ca.chunk_a
         |  JOIN csh b ON b.doc_id = ca.doc_b AND b.chunk_id = ca.chunk_b
         |    AND b.s = a.s
         |  GROUP BY 1, 2, 3, 4),
         |vp AS (SELECT co.doc_a, co.doc_b,
         |    co.n_common::DOUBLE / (sa.n_sh + sb.n_sh - co.n_common) AS jaccard
         |  FROM common co
         |  JOIN sizes sa ON sa.doc_id = co.doc_a AND sa.chunk_id = co.chunk_a
         |  JOIN sizes sb ON sb.doc_id = co.doc_b AND sb.chunk_id = co.chunk_b
         |  WHERE co.n_common::DOUBLE / (sa.n_sh + sb.n_sh - co.n_common) >= 0.5)
         |SELECT doc_a, doc_b, count(*)::BIGINT AS n_chunk_pairs,
         |  round(max(jaccard), 6) AS max_jaccard
         |FROM vp GROUP BY doc_a, doc_b ORDER BY doc_a, doc_b""".stripMargin,

    // asymmetric containment: same inverted-index candidates as the
    // jaccard detector, two directed rows per unordered pair
    "dedup_containment" ->
      s"""WITH $toksCte, $shinglesCte,
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |rare AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 10000),
         |pr AS (SELECT doc_id, s FROM sh JOIN rare USING (s)),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM pr a JOIN pr b ON a.s = b.s AND a.doc_id < b.doc_id),
         |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    count(*) AS n_common
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |cc AS (SELECT co.* FROM common co JOIN cand USING (doc_a, doc_b)),
         |dirp AS (
         |  SELECT doc_a AS contained_id, doc_b AS container_id,
         |    n_common::DOUBLE / sa.n_sh AS containment
         |  FROM cc JOIN sizes sa ON sa.doc_id = doc_a
         |  UNION ALL
         |  SELECT doc_b, doc_a, n_common::DOUBLE / sb.n_sh
         |  FROM cc JOIN sizes sb ON sb.doc_id = doc_b)
         |SELECT contained_id, container_id,
         |  round(containment, 6) AS containment
         |FROM dirp WHERE containment >= 0.8
         |ORDER BY contained_id, container_id""".stripMargin,

    // containment APPLY: same directed pairs, keep-the-larger rule —
    // drop a doc >=0.8-contained in one with MORE shingles (ties to
    // the lower container id); non-recursive by contract
    "dedup_apply_containment" ->
      s"""WITH $toksCte, $shinglesCte,
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |rare AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 10000),
         |pr AS (SELECT doc_id, s FROM sh JOIN rare USING (s)),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM pr a JOIN pr b ON a.s = b.s AND a.doc_id < b.doc_id),
         |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    count(*) AS n_common
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |cc AS (SELECT co.* FROM common co JOIN cand USING (doc_a, doc_b)),
         |dirp AS (
         |  SELECT doc_a AS contained_id, doc_b AS container_id,
         |    n_common::DOUBLE / sa.n_sh AS containment,
         |    sa.n_sh AS n_contained, sb.n_sh AS n_container
         |  FROM cc JOIN sizes sa ON sa.doc_id = doc_a
         |          JOIN sizes sb ON sb.doc_id = doc_b
         |  UNION ALL
         |  SELECT doc_b, doc_a, n_common::DOUBLE / sb.n_sh,
         |    sb.n_sh, sa.n_sh
         |  FROM cc JOIN sizes sa ON sa.doc_id = doc_a
         |          JOIN sizes sb ON sb.doc_id = doc_b),
         |drp AS (SELECT DISTINCT contained_id AS doc_id FROM dirp
         |  WHERE containment >= 0.8 AND (n_container > n_contained
         |    OR (n_container = n_contained AND container_id < contained_id)))
         |SELECT doc_id, lang, source, n_chars FROM documents
         |WHERE doc_id NOT IN (SELECT doc_id FROM drp)
         |ORDER BY doc_id""".stripMargin,

    // incremental two-delivery dedup: same sig/band family as
    // dedup_minhash_lsh; delivery 1 = even doc_ids deduped within
    // itself (drop the larger of any est>=0.5 bucket pair), delivery 2
    // = odd ids deduped within itself AND against delivery-1 SURVIVORS
    "dedup_incremental" ->
      s"""WITH $toksCte, $shinglesCte,
         |sh2 AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM sh),
         |ff AS (SELECT f, (f * 7 + 3) % 60 AS rr,
         |    ('0x' || substr(md5('mh|' || f::VARCHAR), 1, 15))::BIGINT AS c
         |  FROM generate_series(0, 15) g(f)),
         |sig AS (SELECT doc_id, f,
         |    min(xor((h >> rr) | ((h & ((1::BIGINT << rr) - 1)) << (60 - rr)), c)) AS h
         |  FROM sh2 CROSS JOIN ff GROUP BY doc_id, f),
         |bands AS (SELECT doc_id, f // 2 AS band,
         |    string_agg(h::VARCHAR, '|' ORDER BY f) AS band_key
         |  FROM sig GROUP BY doc_id, f // 2),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bands x JOIN bands y
         |  ON x.band = y.band AND x.band_key = y.band_key AND x.doc_id < y.doc_id),
         |ne AS (SELECT doc_a, doc_b FROM (
         |  SELECT c.doc_a, c.doc_b,
         |    (count(*) FILTER (WHERE sa.h = sb.h))::DOUBLE / 16 AS est
         |  FROM cand c
         |  JOIN sig sa ON sa.doc_id = c.doc_a
         |  JOIN sig sb ON sb.doc_id = c.doc_b AND sb.f = sa.f
         |  GROUP BY 1, 2) WHERE est >= 0.5),
         |d1 AS (SELECT doc_id FROM documents WHERE doc_id % 2 = 0),
         |d2 AS (SELECT doc_id FROM documents WHERE doc_id % 2 = 1),
         |surv1 AS (SELECT doc_id FROM d1 WHERE doc_id NOT IN (
         |  SELECT n.doc_b FROM ne n
         |  JOIN d1 a ON a.doc_id = n.doc_a JOIN d1 b ON b.doc_id = n.doc_b)),
         |drop2 AS (
         |  SELECT n.doc_b AS doc_id FROM ne n
         |    JOIN d2 a ON a.doc_id = n.doc_a JOIN d2 b ON b.doc_id = n.doc_b
         |  UNION
         |  SELECT n.doc_b FROM ne n
         |    JOIN surv1 s ON s.doc_id = n.doc_a JOIN d2 b ON b.doc_id = n.doc_b
         |  UNION
         |  SELECT n.doc_a FROM ne n
         |    JOIN surv1 s ON s.doc_id = n.doc_b JOIN d2 b ON b.doc_id = n.doc_a),
         |surv2 AS (SELECT doc_id FROM d2
         |  WHERE doc_id NOT IN (SELECT doc_id FROM drop2))
         |SELECT doc_id, 1::BIGINT AS delivery FROM surv1
         |UNION ALL SELECT doc_id, 2::BIGINT FROM surv2
         |ORDER BY doc_id""".stripMargin,

    "dedup_simhash" ->
      s"""WITH $toksCte, $simhashCtes,
         |bands AS (SELECT doc_id, fp, b, (fp >> (b * 15)) & 32767 AS band_key
         |  FROM fp CROSS JOIN generate_series(0, 3) g(b)),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |    x.fp AS fp_a, y.fp AS fp_b
         |  FROM bands x JOIN bands y
         |  ON x.b = y.b AND x.band_key = y.band_key AND x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b, bit_count(xor(fp_a, fp_b))::BIGINT AS hamming
         |FROM cand WHERE bit_count(xor(fp_a, fp_b)) <= 4
         |ORDER BY doc_a, doc_b""".stripMargin,

    // perceptual-hash image near-dup: the banded-pipeline replay (like
    // dedup_simhash's oracle — candidates from bands, then the Hamming
    // threshold), fingerprints from the generating arithmetic where the
    // Spark side round-trips a real PNG codec
    "dedup_phash" ->
      s"""WITH $phashCtes
         |SELECT media_a, media_b, hamming FROM ppair
         |ORDER BY media_a, media_b""".stripMargin,

    // apply: arrival-ordered keep policy — drop a media iff it
    // near-matches a LOWER media_id (the pair report's media_b side)
    "dedup_phash_apply" ->
      s"""WITH $phashCtes
         |SELECT pm.media_id, pm.src_id AS src_doc_id,
         |  (pm.planted = 1) AS planted,
         |  pm.media_id NOT IN (SELECT media_b FROM ppair) AS is_kept
         |FROM pm ORDER BY pm.media_id""".stripMargin,

    // incremental image dedup: relational replay of the two steps —
    // see phashIncrementalSql's scaladoc for the delivery/index logic
    "dedup_phash_incremental" -> phashIncrementalSql,

    // the durable-sink twin shares the relational oracle VERBATIM: the
    // sink path (ManifestFeed -> phashIncrementalCommit -> segments)
    // must compute exactly the in-memory step's semantics
    "dedup_phash_incremental_sink" -> phashIncrementalSql,

    // lossy-survival invariants (the mm_jpeg certification pattern):
    // measured over every producible id (tools/ProfilePhashJpeg,
    // max 3 flipped bits at q=0.9), so the oracle emits the expected
    // TRUE rows and a hash match certifies both codec cycles + the
    // fingerprint math landed in band for every document
    "dedup_phash_jpeg" ->
      """SELECT doc_id AS media_id, TRUE AS within_threshold,
        |  TRUE AS band_candidate
        |FROM documents ORDER BY media_id""".stripMargin,

    // AUDIO near-dup: the banded-pipeline replay on the audio
    // fingerprint arithmetic (the phash oracle's modality twin) —
    // fingerprints from the generating window levels where the Spark
    // side round-trips a real WAV codec
    "dedup_audio" ->
      s"""WITH $audCtes
         |SELECT media_a, media_b, hamming FROM apair
         |ORDER BY media_a, media_b""".stripMargin,

    // apply: arrival-ordered keep policy — drop a clip iff it
    // near-matches a LOWER media_id (the pair report's media_b side)
    "dedup_audio_apply" ->
      s"""WITH $audCtes
         |SELECT am.media_id, am.src_id AS src_doc_id,
         |  (am.planted = 1) AS planted,
         |  am.media_id NOT IN (SELECT media_b FROM apair) AS is_kept
         |FROM am ORDER BY am.media_id""".stripMargin,

    // lossy-survival invariants (the dedup_phash_jpeg pattern on the
    // audio modality): measured over every producible id
    // (tools/ProfileAudioUlaw, max 3 flipped bits / band candidacy
    // everywhere under the JDK's real μ-law cycle on the grid-3
    // fixture), so the oracle emits the expected TRUE rows and a hash
    // match certifies both codec cycles + the fingerprint math landed
    // in band for every document
    "dedup_audio_ulaw" ->
      """SELECT doc_id AS media_id, TRUE AS within_threshold,
        |  TRUE AS band_candidate
        |FROM documents ORDER BY media_id""".stripMargin,

    // incremental audio dedup: relational replay of the two steps —
    // see audioIncrementalSql's scaladoc; the durable-sink twin shares
    // it verbatim (the sink must compute the in-memory step exactly)
    "dedup_audio_incremental" -> audioIncrementalSql,
    "dedup_audio_incremental_sink" -> audioIncrementalSql,

    // VIDEO near-dup: the frame-vote replay — per-sampled-frame
    // fingerprints from the generating arithmetic, frame-aligned
    // banded candidates, Hamming-verified per frame, voted ≥2-of-3
    "dedup_video" ->
      s"""WITH $vidCtes
         |SELECT media_a, media_b, n_frames_matched FROM vpair
         |ORDER BY media_a, media_b""".stripMargin,

    // incremental video dedup: the two-delivery replay over the voted
    // pair relation (same structure as the audio/image incrementals —
    // vpair already encodes the frame vote); sink twin shares it
    "dedup_video_incremental" -> videoIncrementalSql,
    "dedup_video_incremental_sink" -> videoIncrementalSql,

    // lossy-survival invariants (the dedup_phash_jpeg pattern, per
    // sampled frame): measured over every producible frame
    // (tools/ProfileVideoJpeg, 15750 frames, max 4 flipped bits at
    // q=0.9, band candidacy everywhere), so the oracle emits the
    // expected TRUE rows per (doc, sampled frame)
    "dedup_video_jpeg" ->
      """SELECT doc_id AS media_id, f.f AS frame_idx,
        |  TRUE AS within_threshold, TRUE AS band_candidate
        |FROM documents CROSS JOIN (VALUES (0), (2), (4)) f(f)
        |ORDER BY media_id, frame_idx""".stripMargin,

    // apply: arrival-ordered keep policy over the voted pair report
    "dedup_video_apply" ->
      s"""WITH $vidCtes
         |SELECT vm.media_id, vm.src_id AS src_doc_id,
         |  (vm.planted = 1) AS planted,
         |  vm.media_id NOT IN (SELECT media_b FROM vpair) AS is_kept
         |FROM vm ORDER BY vm.media_id""".stripMargin,

    "dedup_embedding" ->
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        |    (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
        |     sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6)
        |    AS cos_sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        |    (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
        |     sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) >= 0.95
        |ORDER BY vec_a, vec_b""".stripMargin,

    // exact path at the LSH operating threshold (bench head-to-head twin)
    "dedup_embedding_045" ->
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        |    (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
        |     sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6)
        |    AS cos_sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        |    (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
        |     sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) >= 0.45
        |ORDER BY vec_a, vec_b""".stripMargin,

    // exact O(n²) pair set at the LSH pipeline's operating threshold —
    // a full hash match certifies 100% LSH recall on this corpus
    "dedup_embedding_lsh" ->
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        |    (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
        |     sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6)
        |    AS cos_sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        |    (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
        |     sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) >= 0.45
        |ORDER BY vec_a, vec_b""".stripMargin,

    // the TRUE near-dup operating point (threshold 0.9) over the
    // planted-near-dup corpus — exact twin of the LSH showcase
    "dedup_embedding_090" ->
      s"""WITH $augEmbCte,
         |$augPairCtes
         |SELECT vec_a, vec_b, cos_sim FROM cand WHERE cos_sim >= 0.9
         |ORDER BY vec_a, vec_b""".stripMargin,

    // exact O(n²) pair set over the same corpus — a full hash match
    // certifies 100% LSH recall at the showcase operating point
    "dedup_embedding_lsh_090" ->
      s"""WITH $augEmbCte,
         |$augPairCtes
         |SELECT vec_a, vec_b, cos_sim FROM cand WHERE cos_sim >= 0.9
         |ORDER BY vec_a, vec_b""".stripMargin,

    // clustering over the embedding-LSH pair graph (detect → cluster →
    // keep-canonical, the full scale pipeline): recursive min-label
    // flooding over the exact pair set at threshold 0.9
    "dedup_clusters_embedding" ->
      s"""WITH RECURSIVE $augEmbCte,
         |$augPairCtes,
         |pairs AS (SELECT vec_a, vec_b FROM cand WHERE cos_sim >= 0.9),
         |edges AS (SELECT vec_a AS u, vec_b AS v FROM pairs
         |  UNION ALL SELECT vec_b, vec_a FROM pairs),
         |reach(u, root) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
         |  UNION
         |  SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.u)
         |SELECT u AS vec_id, min(root)::BIGINT AS cluster_rep,
         |  (u = min(root)) AS is_canonical
         |FROM reach GROUP BY u ORDER BY vec_id""".stripMargin,

    "emb_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
        |  FROM embeddings WHERE vec_id < 10),
        |p AS (SELECT q.query_id, e.vec_id AS neighbor_id,
        |    round(list_dot_product(qe, e.embedding::DOUBLE[]) /
        |      (sqrt(list_dot_product(qe, qe)) *
        |       sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))), 6)
        |      AS cos_sim
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id)
        |SELECT * FROM (
        |  SELECT query_id, neighbor_id, cos_sim,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos_sim DESC, neighbor_id)::BIGINT AS rank
        |  FROM p)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // MMR diversity re-rank: the greedy loop replayed as 8 chained CTE
    // stages — stage r's selection is ROW_NUMBER() = 1 under the same
    // (score_e7 DESC, vec_id) order the native expression argmaxes,
    // with the score in EXACT integer 1e-7 units (7·rel_µ − 3·max_pc_µ;
    // float scores would sit on half-rounding boundaries, see
    // MmrSelect's scaladoc); stage 1 fixes the empty-set diversity term
    // at 0, later stages use the TRUE max pairwise micro-cosine vs the
    // selected set (inner join: pc is complete over candidate pairs).
    // MATERIALIZED hints stop exponential re-inlining of the chain.
    "emb_mmr_topk" -> (
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
        |  FROM embeddings WHERE vec_id < 10),
        |p AS MATERIALIZED (SELECT q.query_id, e.vec_id,
        |    round(list_dot_product(qe, e.embedding::DOUBLE[]) /
        |      (sqrt(list_dot_product(qe, qe)) *
        |       sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))), 6)
        |      AS rel
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
        |cand AS (SELECT query_id, vec_id, rel FROM (
        |  SELECT query_id, vec_id, rel,
        |    row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, vec_id) AS rn
        |  FROM p) WHERE rn <= 24),
        |mce AS MATERIALIZED (SELECT c.query_id, c.vec_id, c.rel,
        |    CAST(round(c.rel * 1000000) AS BIGINT) AS relu,
        |    e.embedding::DOUBLE[] AS emb
        |  FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id),
        |mpc AS MATERIALIZED (SELECT a.query_id, a.vec_id AS d, b.vec_id AS sid,
        |    CAST(round(list_dot_product(a.emb, b.emb) /
        |      (sqrt(list_dot_product(a.emb, a.emb)) *
        |       sqrt(list_dot_product(b.emb, b.emb))) * 1000000) AS BIGINT) AS pcu
        |  FROM mce a JOIN mce b ON a.query_id = b.query_id AND a.vec_id <> b.vec_id)""".stripMargin
      + mmrChainSql),

    // MMR served FROM the persisted PQ index: candidates are the
    // SQ8-rescored top-24 of the ADC cut (the emb_pq_serve_sq8
    // pipeline), and the PAIRWISE similarities also come from the
    // index's SQ8 vectors — retrieve AND diversify without touching
    // the embeddings table; then the same shared MMR chain
    "emb_mmr_serve" -> (pqApproxCtes + """,
        |cut AS (SELECT query_id, vec_id AS neighbor_id, pq_cos FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY pq_cos DESC, vec_id) AS r FROM approx) WHERE r <= 64),
        |i8 AS MATERIALIZED (SELECT vec_id, qv,
        |    sqrt(list_sum(list_transform(qv, v -> v * v))::DOUBLE) AS qn
        |  FROM (SELECT vec_id, list_transform(emb, x ->
        |      floor(x * (127.0 / list_max(list_transform(emb, y -> abs(y))))
        |        + 0.5)::BIGINT) AS qv
        |    FROM e)),
        |resc8 AS (SELECT c.query_id, c.neighbor_id,
        |    round(list_sum(list_transform(generate_series(1, len(a.qv)),
        |      i -> a.qv[i] * b.qv[i]))::DOUBLE / (a.qn * b.qn), 6) AS q8_cos
        |  FROM cut c
        |  JOIN i8 a ON a.vec_id = c.query_id
        |  JOIN i8 b ON b.vec_id = c.neighbor_id),
        |mce AS MATERIALIZED (SELECT query_id, vec_id, rel,
        |    CAST(round(rel * 1000000) AS BIGINT) AS relu FROM (
        |  SELECT query_id, neighbor_id AS vec_id, q8_cos AS rel,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY q8_cos DESC, neighbor_id) AS rn
        |  FROM resc8) WHERE rn <= 24),
        |mpc AS MATERIALIZED (SELECT a.query_id, a.vec_id AS d, b.vec_id AS sid,
        |    CAST(round(list_sum(list_transform(generate_series(1, len(ia.qv)),
        |      i -> ia.qv[i] * ib.qv[i]))::DOUBLE / (ia.qn * ib.qn) * 1000000)
        |      AS BIGINT) AS pcu
        |  FROM mce a JOIN mce b ON a.query_id = b.query_id AND a.vec_id <> b.vec_id
        |  JOIN i8 ia ON ia.vec_id = a.vec_id
        |  JOIN i8 ib ON ib.vec_id = b.vec_id)""".stripMargin
      + mmrChainSql),

    // knn GRAPH: emb_topk with the query set = the whole corpus —
    // top-5 neighbors for every vector, same cosine tree, same
    // (cos desc, id asc) rank tiebreak the bounded heap uses
    "emb_knn_graph" ->
      """WITH an AS (SELECT vec_id, embedding::DOUBLE[] AS e,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |p AS (SELECT a.vec_id AS src_id, b.vec_id AS neighbor_id,
        |    round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) AS cos_sim
        |  FROM an a JOIN an b ON a.vec_id <> b.vec_id)
        |SELECT * FROM (
        |  SELECT src_id, neighbor_id, cos_sim,
        |    row_number() OVER (PARTITION BY src_id
        |      ORDER BY cos_sim DESC, neighbor_id)::BIGINT AS rank
        |  FROM p)
        |WHERE rank <= 5 ORDER BY src_id, rank""".stripMargin,

    // the BUCKETED knn graph (the 100 TB path): every stage of the LSH
    // pipeline is deterministic, so the oracle replays it whole —
    // plane count derived from corpus size by the SAME integer ladder
    // as Similarity.knnLshPlanes (smallest b ≤ 8 with n ≤ 32·2^b),
    // 24 tables × b planes of literal splitmix64 sign vectors (table t
    // owning planes t*b..t*b+b-1 exactly as LshHash.lshBuckets
    // allocates), bucket self-join candidates, distinct, cosine refine,
    // (cos desc, id asc) top-5 — a full hash match on the scale path's
    // exact output at ANY sf
    "emb_knn_graph_lsh" ->
      s"""WITH signs(pl, sv) AS (VALUES
         |${lshSignRowsFor(192)}),
         |nb AS (SELECT CASE WHEN count(*) <= 64 THEN 1
         |    WHEN count(*) <= 128 THEN 2 WHEN count(*) <= 256 THEN 3
         |    WHEN count(*) <= 512 THEN 4 WHEN count(*) <= 1024 THEN 5
         |    WHEN count(*) <= 2048 THEN 6 WHEN count(*) <= 4096 THEN 7
         |    ELSE 8 END AS b FROM embeddings),
         |bk AS (SELECT e.vec_id, pl // (SELECT b FROM nb) AS tbl,
         |    sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], s.sv) > 0
         |      THEN 1::BIGINT << (pl % (SELECT b FROM nb)) ELSE 0 END)::BIGINT
         |      AS bucket
         |  FROM embeddings e CROSS JOIN signs s
         |  WHERE pl < 24 * (SELECT b FROM nb)
         |  GROUP BY e.vec_id, pl // (SELECT b FROM nb)),
         |cand AS (SELECT DISTINCT x.vec_id AS src_id, y.vec_id AS neighbor_id
         |  FROM bk x JOIN bk y ON x.tbl = y.tbl AND x.bucket = y.bucket
         |    AND x.vec_id <> y.vec_id),
         |an AS (SELECT vec_id, embedding::DOUBLE[] AS e,
         |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
         |  FROM embeddings),
         |pr AS (SELECT c.src_id, c.neighbor_id,
         |    round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) AS cos_sim
         |  FROM cand c JOIN an a ON a.vec_id = c.src_id
         |    JOIN an b ON b.vec_id = c.neighbor_id)
         |SELECT * FROM (
         |  SELECT src_id, neighbor_id, cos_sim,
         |    row_number() OVER (PARTITION BY src_id
         |      ORDER BY cos_sim DESC, neighbor_id)::BIGINT AS rank
         |  FROM pr)
         |WHERE rank <= 5 ORDER BY src_id, rank""".stripMargin,

    // int8 quantization + rescored top-k: scale = 127/max|x|,
    // q = floor(x·scale + 0.5) (floor, not round — HALF_UP vs
    // half-away-from-zero differ on negative midpoints); candidate cut
    // ranks by the EXACT-integer dot over quantized vectors, final rank
    // by full-precision cosine over the survivors only
    "emb_quantized_topk" ->
      """WITH m AS (SELECT vec_id, embedding::DOUBLE[] AS e,
        |    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS amax
        |  FROM embeddings),
        |qz AS (SELECT vec_id, e,
        |    list_transform(e, x -> floor(x * (127.0 / amax) + 0.5)::BIGINT) AS qv
        |  FROM m),
        |qn AS (SELECT vec_id, e, qv,
        |    sqrt(list_sum(list_transform(qv, v -> v * v))::DOUBLE) AS qn
        |  FROM qz),
        |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(list_sum(list_transform(generate_series(1, len(q.qv)),
        |      i -> q.qv[i] * c.qv[i]))::DOUBLE / (q.qn * c.qn), 6) AS qcos_sim,
        |    round(list_dot_product(q.e, c.e) /
        |      (sqrt(list_dot_product(q.e, q.e)) *
        |       sqrt(list_dot_product(c.e, c.e))), 6) AS cos_sim
        |  FROM qn q JOIN qn c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |cand AS (SELECT * FROM (
        |  SELECT query_id, neighbor_id, qcos_sim, cos_sim,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY qcos_sim DESC, neighbor_id) AS qrank
        |  FROM p) WHERE qrank <= 15)
        |SELECT query_id, neighbor_id, qcos_sim, cos_sim, rank FROM (
        |  SELECT query_id, neighbor_id, qcos_sim, cos_sim,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos_sim DESC, neighbor_id)::BIGINT AS rank
        |  FROM cand)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // IVF probe: centroid per label cell (6-dp rounded → engine-
    // independent cell ranking), nprobe=2 nearest cells per query,
    // exact cosine top-5 within the probed cells only
    // mirrors Similarity.kmeansCells ON THE TRAINING SAMPLE (t =
    // hash60(vec_id) % 100 < pct, pct from the trainSamplePct CASE
    // ladder): label-mean seeds (c0), TWO unrolled Lloyd rounds over t
    // — assign to max-cosine cell (6-dp rounds, ties to lowest cell),
    // recompute 6-dp per-dim means — then assign the FULL corpus
    // against the final centroids (af vs c2) and probe c2 over af
    // product quantization: 8 subspaces x 8 dims, codebooks seeded by
    // label%16 over the SAME hash-sample and refined with two unrolled
    // Lloyd rounds over the sample (arg-min L2 written
    // dot(a,a)-2dot(a,cw)+dot(cw,cw), 6-dp rounded, ties to lowest
    // code); the full corpus is encoded against the final codebooks
    // (af vs w2); ADC = per-query LUT of dot(q_sub, codeword), approx
    // dot = sum of 8 lookups; top-64 cut then exact-cosine rescore,
    // both stages mirrored
    "emb_pq_topk" -> (pqApproxCtes + """,
        |cut AS (SELECT query_id, vec_id AS neighbor_id, pq_cos FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY pq_cos DESC, vec_id) AS r FROM approx) WHERE r <= 64),
        |resc AS (SELECT c.query_id, c.neighbor_id, c.pq_cos,
        |    round(list_dot_product(q.qe, n.emb) /
        |      (sqrt(list_dot_product(q.qe, q.qe)) *
        |       sqrt(list_dot_product(n.emb, n.emb))), 6) AS cos_sim
        |  FROM cut c
        |  JOIN q ON q.query_id = c.query_id
        |  JOIN e n ON n.vec_id = c.neighbor_id)
        |SELECT * FROM (
        |  SELECT query_id, neighbor_id, pq_cos, cos_sim,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos_sim DESC, neighbor_id)::BIGINT AS rank
        |  FROM resc)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),

    // the persisted-index PQ serve (store.AnnIndex.embPqServe): the
    // IDENTICAL deterministic build pipeline (the index tables are a
    // pure function of the corpus, so the oracle never needs to see
    // them) with NO rescore stage — serve ranks purely by the ADC
    // approximate cosine, ties to the lowest vec_id
    "emb_pq_serve" -> (pqApproxCtes + """
        |SELECT * FROM (
        |  SELECT query_id, vec_id AS neighbor_id, pq_cos,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY pq_cos DESC, vec_id)::BIGINT AS rank
        |  FROM approx)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),

    // the tombstone serve (store.AnnIndex.embPqServeTombstone): same
    // ADC chain, candidates minus the deterministic delete set
    // vec_id % 17 == 3 BEFORE ranking — survivors' ranks close densely
    "emb_pq_serve_tombstone" -> (pqApproxCtes + """
        |SELECT * FROM (
        |  SELECT query_id, vec_id AS neighbor_id, pq_cos,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY pq_cos DESC, vec_id)::BIGINT AS rank
        |  FROM approx WHERE vec_id % 17 <> 3)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),

    // the fold-compacted tombstone serve (store.AnnIndex
    // .embPqServeCompacted): compaction physically removes the deleted
    // rows and is serve-identity, so the oracle is the tombstone
    // serve's verbatim
    "emb_pq_serve_compacted" -> (pqApproxCtes + """
        |SELECT * FROM (
        |  SELECT query_id, vec_id AS neighbor_id, pq_cos,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY pq_cos DESC, vec_id)::BIGINT AS rank
        |  FROM approx WHERE vec_id % 17 <> 3)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),

    // the FILTERED serve (store.AnnIndex.embPqServeFiltered): the
    // candidate set pre-filtered to label % 3 == 0 via the attrs
    // sidecar — rank over the restricted set (pre ≡ post here; the
    // serve's pre-filter is the starvation-proof shape at scale)
    "emb_pq_serve_filtered" -> (pqApproxCtes + """
        |SELECT * FROM (
        |  SELECT a.query_id, a.vec_id AS neighbor_id, a.pq_cos,
        |    row_number() OVER (PARTITION BY a.query_id
        |      ORDER BY a.pq_cos DESC, a.vec_id)::BIGINT AS rank
        |  FROM approx a JOIN e ON e.vec_id = a.vec_id
        |  WHERE e.label % 3 = 0)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),

    // the TWO-TIER persisted PQ serve (store.AnnIndex.servePqTopkSq8):
    // ADC cut of 64 candidates from the codes, rescored by the
    // symmetric int8 cosine of the index's SQ8 table — the same
    // quantization math emb_quantized_topk certifies (floor(x·127/amax
    // + 0.5), norms from quantized values) — ranked by q8_cos, ties to
    // the lowest id
    "emb_pq_serve_sq8" -> (pqApproxCtes + """,
        |cut AS (SELECT query_id, vec_id AS neighbor_id, pq_cos FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY pq_cos DESC, vec_id) AS r FROM approx) WHERE r <= 64),
        |i8 AS (SELECT vec_id, qv,
        |    sqrt(list_sum(list_transform(qv, v -> v * v))::DOUBLE) AS qn
        |  FROM (SELECT vec_id, list_transform(emb, x ->
        |      floor(x * (127.0 / list_max(list_transform(emb, y -> abs(y))))
        |        + 0.5)::BIGINT) AS qv
        |    FROM e)),
        |resc8 AS (SELECT c.query_id, c.neighbor_id, c.pq_cos,
        |    round(list_sum(list_transform(generate_series(1, len(a.qv)),
        |      i -> a.qv[i] * b.qv[i]))::DOUBLE / (a.qn * b.qn), 6) AS q8_cos
        |  FROM cut c
        |  JOIN i8 a ON a.vec_id = c.query_id
        |  JOIN i8 b ON b.vec_id = c.neighbor_id)
        |SELECT * FROM (
        |  SELECT query_id, neighbor_id, pq_cos, q8_cos,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY q8_cos DESC, neighbor_id)::BIGINT AS rank
        |  FROM resc8)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),

    // HYBRID RETRIEVAL (similarity.Hybrid.hybridTopk): BM25 inverted-
    // index leg + exact-cosine leg, fused by reciprocal rank (1/(60+r)
    // per leg over each top-20 list); every float literal is ::DOUBLE
    // so DuckDB's decimal literals never enter the arithmetic, and the
    // multiply/divide order mirrors the Spark expressions token for
    // token
    "hybrid_topk" -> hybridTopkSql,

    // persisted lexical index serve (store.TextIndex.lexBm25Serve):
    // BM25 top-5 from the postings/df/dl/stats tables — the lexical
    // CTE chain shared with hybrid_topk certifies it
    "lex_bm25_serve" -> lexBm25ServeSql,

    // lexical append-serve (store.TextIndex.appendBatch): BM25 stats
    // are additive, so build(half)+append(half) ≡ full build exactly —
    // same oracle as the one-shot serve
    "lex_bm25_append_serve" -> lexBm25ServeSql,

    // lexical takedown (store.TextIndex.deleteDocs): tombstoned
    // postings + negative df/stats deltas must equal an index built
    // over the surviving documents only — the whole BM25 chain is
    // re-derived with the deleted set excluded at the tokenize source
    "lex_bm25_serve_tombstone" -> {
      val derived = lexBm25ServeSql.replace(
        "SELECT doc_id, unnest(toks) AS tok FROM t) GROUP BY doc_id, tok)",
        "SELECT doc_id, unnest(toks) AS tok FROM t\n" +
          "  WHERE NOT (doc_id % 23 = 4 AND doc_id >= 10)) GROUP BY doc_id, tok)")
      require(derived != lexBm25ServeSql,
        "lex-tombstone oracle derivation matched nothing")
      derived
    },

    // append + fold (store.TextIndex.lexBm25CompactServe): collapsing
    // the additive delta segments to their sums is the identity on
    // every BM25 score — one-shot oracle again, now certifying the fold
    "lex_bm25_compact_serve" -> lexBm25ServeSql,

    // store manifest (store.Manifest): actual sub-table row counts of
    // both persisted stores vs corpus-PREDICTED cardinalities —
    // codebooks = the trained quantizer's occupied (s, code) pairs
    // (the full PQ chain's w2l), postings = distinct (doc, term)
    "store_manifest" -> (pqApproxCtes + ",\n" + toksCte + """,
        |postc AS (SELECT count(*)::BIGINT AS c FROM (
        |  SELECT DISTINCT doc_id, tok FROM (
        |    SELECT doc_id, unnest(toks) AS tok FROM t))),
        |vocab AS (SELECT count(DISTINCT tok)::BIGINT AS c FROM (
        |  SELECT unnest(toks) AS tok FROM t)),
        |n_e AS (SELECT count(*)::BIGINT AS c FROM embeddings),
        |n_d AS (SELECT count(*)::BIGINT AS c FROM documents),
        |cbk AS (SELECT count(*)::BIGINT AS c FROM w2l)
        |SELECT * FROM (
        |  SELECT 'lex' AS store, 'df' AS sub_table,
        |    (SELECT c FROM vocab) AS n_rows
        |  UNION ALL SELECT 'lex', 'dl', (SELECT c FROM n_d)
        |  UNION ALL SELECT 'lex', 'postings', (SELECT c FROM postc)
        |  UNION ALL SELECT 'lex', 'stats', 1::BIGINT
        |  UNION ALL SELECT 'pq', 'attrs', (SELECT c FROM n_e)
        |  UNION ALL SELECT 'pq', 'codebooks', (SELECT c FROM cbk)
        |  UNION ALL SELECT 'pq', 'codes', (SELECT c * 8 FROM n_e)
        |  UNION ALL SELECT 'pq', 'vecs8', (SELECT c FROM n_e)
        |  UNION ALL SELECT 'pq', 'vnorms', (SELECT c FROM n_e))
        |ORDER BY store, sub_table""".stripMargin),

    // retrieval evaluation (similarity.Hybrid.retrievalMetrics):
    // precision@5 / MRR / nDCG@5 of the hybrid hits with label-match
    // relevance; ideal DCG is the running log2-discount sum at
    // min(5, n_rel) positions (ascending fold, mirroring Spark's
    // aggregate() exactly)
    "retrieval_metrics" -> (hybridCtes + """,
        |hits AS (SELECT query_id, doc_id, rank FROM (
        |  SELECT query_id, doc_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY rrf_score DESC, doc_id)::BIGINT AS rank
        |  FROM fused) WHERE rank <= 5),
        |qlab AS (SELECT vec_id AS query_id, label AS qlab FROM embeddings
        |  WHERE vec_id < 10),
        |dlab AS (SELECT vec_id AS doc_id, label AS dlab FROM embeddings),
        |r AS (SELECT h.query_id, h.rank,
        |    CASE WHEN d.dlab = ql.qlab THEN 1 ELSE 0 END AS rel
        |  FROM hits h
        |  JOIN dlab d ON d.doc_id = h.doc_id
        |  JOIN qlab ql ON ql.query_id = h.query_id),
        |nr AS (SELECT ql.query_id, count(*)::BIGINT AS n_rel
        |  FROM qlab ql JOIN embeddings e2
        |    ON e2.label = ql.qlab AND e2.vec_id <> ql.query_id
        |  GROUP BY ql.query_id),
        |ic AS (SELECT n, sum(v) OVER (ORDER BY n) AS idcg FROM (
        |  SELECT i AS n, 1.0::DOUBLE / log2(i + 1) AS v
        |  FROM generate_series(1, 5) g(i))),
        |m AS (SELECT query_id,
        |    round(sum(rel) / 5.0, 6) AS precision_at_5,
        |    round(coalesce(max(CASE WHEN rel = 1
        |      THEN 1.0::DOUBLE / rank END), 0), 6) AS mrr,
        |    sum(rel * (1.0::DOUBLE / log2(rank + 1))) AS dcg
        |  FROM r GROUP BY query_id)
        |SELECT m.query_id, coalesce(nr.n_rel, 0) AS n_rel,
        |  m.precision_at_5, m.mrr,
        |  CASE WHEN coalesce(nr.n_rel, 0) = 0 THEN 0.0
        |    ELSE round(m.dcg / (SELECT idcg FROM ic
        |      WHERE n = least(nr.n_rel, 5)), 6) END AS ndcg_at_5
        |FROM m LEFT JOIN nr ON nr.query_id = m.query_id
        |ORDER BY m.query_id""".stripMargin),

    // index-served hybrid (similarity.Hybrid.hybridServe): lexical leg
    // from the postings tables, dense leg from the PQ codes, RRF-fused
    // — the whole retrieval stack without a base-table scan
    "hybrid_serve" -> hybridServeSql,

    // dialed hybrid: winner rung from the build-time quality dial
    // applied to the same served legs; the dial rows themselves
    "hybrid_serve_dialed" -> hybridServeDialedSql,
    "hybrid_dial_stats" -> hybridDialStatsSql,

    // SNIPPET EXTRACTION (similarity.Hybrid.hybridSnippets): for each
    // hybrid top-5 hit, the 32-token window with the maximum count of
    // query-term instances (ties to the earliest start; zero-match
    // dense-only hits fall back to start 1) — all-integer argmax, the
    // snippet text rebuilt from the winning slice
    "hybrid_snippets" -> (hybridCtes + """,
        |hits AS (SELECT query_id, doc_id, rank FROM (
        |  SELECT query_id, doc_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY rrf_score DESC, doc_id)::BIGINT AS rank
        |  FROM fused) WHERE rank <= 5),
        |ptoks AS (SELECT doc_id, unnest(toks) AS tok,
        |  unnest(generate_series(1, len(toks))) AS pos FROM t),
        |qset AS (SELECT doc_id AS query_id, tok FROM ptoks
        |  WHERE doc_id < 10 GROUP BY 1, 2),
        |lens AS (SELECT doc_id, max(pos)::BIGINT AS len FROM ptoks
        |  GROUP BY doc_id),
        |mp AS (SELECT h.query_id, h.doc_id, p.pos
        |  FROM hits h
        |  JOIN ptoks p ON p.doc_id = h.doc_id
        |  JOIN qset q ON q.query_id = h.query_id AND q.tok = p.tok),
        |starts AS (SELECT h.query_id, h.doc_id, h.rank,
        |    unnest(generate_series(1, greatest(l.len - 31, 1))) AS start
        |  FROM hits h JOIN lens l ON l.doc_id = h.doc_id),
        |ov AS (SELECT s.query_id, s.doc_id, s.rank, s.start,
        |    count(m.pos)::BIGINT AS n_matched
        |  FROM starts s LEFT JOIN mp m
        |    ON m.query_id = s.query_id AND m.doc_id = s.doc_id
        |    AND m.pos BETWEEN s.start AND s.start + 31
        |  GROUP BY s.query_id, s.doc_id, s.rank, s.start),
        |best AS (SELECT query_id, doc_id, rank, start, n_matched FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id, doc_id
        |    ORDER BY n_matched DESC, start) AS r FROM ov) WHERE r = 1)
        |SELECT b.query_id, b.doc_id, b.rank,
        |  b.start::BIGINT AS snippet_start, b.n_matched,
        |  array_to_string(list_slice(t.toks, b.start,
        |    least(b.start + 31, l.len)), ' ') AS snippet
        |FROM best b
        |JOIN t ON t.doc_id = b.doc_id
        |JOIN lens l ON l.doc_id = b.doc_id
        |ORDER BY query_id, rank""".stripMargin),

    // RECALL AUDIT (store.AnnIndex.embPqRecall): per-query recall@5 of
    // the persisted PQ serve against the exact scan — the ADC top-5
    // from the shared PQ chain, the exact top-5 from the corpus, and a
    // left-join census of the overlap
    "emb_pq_recall" -> (pqApproxCtes + ",\n" + recallTailSql),

    // composed-index recall audit (store.AnnIndex.embIvfPqRecall):
    // same census over the IVFPQ serve's approx chain — routing loss
    // (nprobe misses) compounds PQ's compression loss, so this is the
    // number that prices the nprobe dial
    "emb_ivfpq_recall" -> ivfPqRecallSql,

    // the same audit on ANN's operating geometry: the certified chain
    // over the planted-cluster corpus (aug + derived labels) — recall
    // where each panel query's exact top-5 is its planted clique
    "emb_ivfpq_recall_clustered" -> ivfPqRecallClusteredSql,

    // IVF introspection (store.AnnIndex.embIvfCellStats): per-cell
    // population + corpus share from the trained assignment
    "emb_ivf_cell_stats" -> ivfCellStatsSql,

    // the composed index's two-tier serve (FAISS IVFPQ+refine):
    // routed ADC cut rescored by the stored SQ8 table
    "emb_ivfpq_serve_sq8" -> ivfPqSq8ServeSql,

    // the census's alarm invariant (store.AnnIndex.embIvfCellGuard):
    // physical partitions over the 4×-uniform bound, integer
    // arithmetic mirrored exactly
    "emb_ivf_cell_guard" -> ivfCellGuardSql,

    // SemDeDup: the SAME two unrolled Lloyd rounds as the IVF oracle
    // (6-dp rounds, ties to lowest cell), trained on the hash-sample
    // (t = hash60(vec_id) % 100 < pct, trainSamplePct ladder) with the
    // full corpus assigned against the final centroids (af vs c2);
    // seeds are the SAMPLE's vec_id % cells with the cell count derived
    // from FULL corpus size by the SAME integer ladder as
    // Similarity.semanticCells (smallest power-of-two c in [16,1024]
    // with n <= 2048*c); then TWO mega-cell split levels
    // (semanticSplitLevel — mirrors Similarity.splitHotCells) re-cluster
    // any cell whose population exceeds 4×expected (bnd); a vector is a
    // dup iff a same-final-cell neighbor with smaller id sits at cosine
    // >= 0.40 (6-dp rounded — the identical pair predicate as the
    // exact-dedup oracles)
    "dedup_semantic" ->
      s"""WITH e AS MATERIALIZED (
        |  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |nc AS (SELECT CASE WHEN count(*) <= 32768 THEN 16
        |    WHEN count(*) <= 65536 THEN 32 WHEN count(*) <= 131072 THEN 64
        |    WHEN count(*) <= 262144 THEN 128 WHEN count(*) <= 524288 THEN 256
        |    WHEN count(*) <= 1048576 THEN 512 ELSE 1024 END AS ncells
        |  FROM embeddings),
        |bnd AS (SELECT 4 * ((count(*) + (SELECT ncells FROM nc) - 1)
        |    // (SELECT ncells FROM nc)) AS b FROM embeddings),
        |pc AS (SELECT CASE WHEN count(*) <= 512 THEN 100
        |    WHEN count(*) <= 1024 THEN 50 WHEN count(*) <= 2048 THEN 25
        |    WHEN count(*) <= 4096 THEN 12 WHEN count(*) <= 8192 THEN 6
        |    WHEN count(*) <= 16384 THEN 3 ELSE 1 END AS p FROM embeddings),
        |t AS MATERIALIZED (SELECT * FROM e
        |  WHERE ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT % 100
        |    < (SELECT p FROM pc)),
        |c0 AS (SELECT vec_id % (SELECT ncells FROM nc) AS cell, d,
        |    round(avg(emb[d]), 6) AS c
        |  FROM t CROSS JOIN generate_series(1, 64) g(d) GROUP BY cell, d),
        |c0l AS (SELECT cell, list(c ORDER BY d) AS centroid FROM c0 GROUP BY cell),
        |a1 AS (SELECT vec_id, emb, cell FROM (
        |  SELECT t.vec_id, t.emb, c.cell, row_number() OVER (PARTITION BY t.vec_id
        |    ORDER BY round(list_dot_product(t.emb, c.centroid) /
        |      (sqrt(list_dot_product(t.emb, t.emb)) *
        |       sqrt(list_dot_product(c.centroid, c.centroid))), 6) DESC, c.cell) AS r
        |  FROM t CROSS JOIN c0l c) WHERE r = 1),
        |c1 AS (SELECT cell, d, round(avg(emb[d]), 6) AS c
        |  FROM a1 CROSS JOIN generate_series(1, 64) g(d) GROUP BY cell, d),
        |c1l AS (SELECT cell, list(c ORDER BY d) AS centroid FROM c1 GROUP BY cell),
        |a2 AS (SELECT vec_id, emb, cell FROM (
        |  SELECT t.vec_id, t.emb, c.cell, row_number() OVER (PARTITION BY t.vec_id
        |    ORDER BY round(list_dot_product(t.emb, c.centroid) /
        |      (sqrt(list_dot_product(t.emb, t.emb)) *
        |       sqrt(list_dot_product(c.centroid, c.centroid))), 6) DESC, c.cell) AS r
        |  FROM t CROSS JOIN c1l c) WHERE r = 1),
        |c2 AS (SELECT cell, d, round(avg(emb[d]), 6) AS c
        |  FROM a2 CROSS JOIN generate_series(1, 64) g(d) GROUP BY cell, d),
        |c2l AS (SELECT cell, list(c ORDER BY d) AS centroid FROM c2 GROUP BY cell),
        |af AS MATERIALIZED (SELECT vec_id, emb, cell FROM (
        |  SELECT e.vec_id, e.emb, c.cell, row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY round(list_dot_product(e.emb, c.centroid) /
        |      (sqrt(list_dot_product(e.emb, e.emb)) *
        |       sqrt(list_dot_product(c.centroid, c.centroid))), 6) DESC, c.cell) AS r
        |  FROM e CROSS JOIN c2l c) WHERE r = 1),
        |${semanticSplitLevel(1, "af")}
        |${semanticSplitLevel(2, "m1")}
        |dup AS (SELECT DISTINCT a.vec_id FROM m2 a JOIN m2 b
        |  ON b.cell = a.cell AND b.vec_id < a.vec_id
        |  WHERE round(list_dot_product(a.emb, b.emb) /
        |    (sqrt(list_dot_product(a.emb, a.emb)) *
        |     sqrt(list_dot_product(b.emb, b.emb))), 6) >= 0.40)
        |SELECT m.vec_id, m.cell, (d.vec_id IS NOT NULL) AS is_dup
        |FROM m2 m LEFT JOIN dup d ON d.vec_id = m.vec_id
        |ORDER BY m.vec_id""".stripMargin,

    "emb_ivf_topk" -> ivfTopkSql,

    "emb_ivf_serve" -> ivfTopkSql,

    "emb_ivf_serve_dialed" -> ivfDialedServeSql,

    // the dial MANIFEST itself: the dialed chain cut at the census,
    // emitting (nprobe, hits, n_queries, mean_recall) per rung
    "emb_ivf_dial_stats" -> ivfDialStatsSql,

    "emb_ivf_serve_filtered_dialed" -> ivfFilteredDialedServeSql,

    "emb_ivf_serve_filtered" -> ivfFilteredServeSql,

    "emb_ivf_filtered_recall" -> ivfFilteredRecallSql,
    "emb_ivf_filtered_recall_clustered" -> ivfFilteredRecallClusteredSql,

    "emb_ivf_append_serve" -> ivfAppendServeSql,

    "emb_ivfpq_serve" -> ivfPqServeSql,

    "emb_ivfpq_serve_dialed" -> ivfPqDialedServeSql,

    "emb_label_centroids" ->
      """SELECT label, d AS dim, round(avg(embedding[d]::DOUBLE), 6) AS centroid,
        |  count(*) AS n
        |FROM embeddings CROSS JOIN generate_series(1, 64) g(d)
        |GROUP BY label, d ORDER BY label, dim""".stripMargin,

    "emb_norms" ->
      """SELECT vec_id, label,
        |  round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6)
        |    AS l2_norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    // the splitmix64 hyperplane signs are deterministic constants —
    // embedded below as literal ±1 vectors (computed from the SAME
    // LshHash.planeSign the Spark expression uses), so the only float
    // math left to mirror is the sequential ±1 dot-product fold, which
    // list_dot_product performs in the same element order
    "emb_lsh_buckets" ->
      s"""WITH signs(j, sv) AS (VALUES
         |$lshSignRows),
         |b AS (SELECT e.vec_id, e.label, s.j,
         |  CASE WHEN list_dot_product(e.embedding::DOUBLE[], s.sv) > 0
         |    THEN 1::BIGINT << s.j ELSE 0 END AS bit
         |  FROM embeddings e CROSS JOIN signs s)
         |SELECT vec_id, label, sum(bit)::BIGINT AS bucket
         |FROM b GROUP BY vec_id, label ORDER BY vec_id""".stripMargin,

    // mirror of the BMP fixture's generating arithmetic: Spark's side
    // renders + REALLY decodes (javax.imageio) a 16x16 gray BMP whose
    // pixel i is (i*37 + doc_id*11 + len) % 256; byte_len 822 = 54-byte
    // header + 768 pixel bytes; mean_luma = sum(gray)/(255*256)
    "mm_features" ->
      """SELECT doc_id AS media_id, 822::BIGINT AS byte_len,
        |  16 AS width, 16 AS height,
        |  (SELECT sum((i * 37 + d.doc_id * 11 + length(d.text)) % 256)::DOUBLE
        |     FROM generate_series(0, 255) g(i)) / 65280 AS mean_luma
        |FROM documents d ORDER BY media_id""".stripMargin,

    // box-average 16×16 → 4×4 resize: output pixel P's level is the
    // floor-mean of its 4×4 source block, recomputed from the fixture
    // arithmetic (the Spark side computes it from DECODED pixels)
    "mm_resize" ->
      """WITH r AS (SELECT doc_id AS media_id,
        |  list_transform(generate_series(0, 15), P ->
        |    list_sum(list_transform(generate_series(0, 15), q ->
        |      ((((P // 4) * 4 + (q // 4)) * 16 + ((P % 4) * 4 + (q % 4))) * 37
        |        + doc_id * 11 + length(text)) % 256)) // 16)
        |  AS px FROM documents)
        |SELECT media_id, 4 AS width, 4 AS height,
        |  array_to_string(px, '-') AS px_csv,
        |  list_sum(px)::DOUBLE / (255.0 * 16) AS mean_luma
        |FROM r ORDER BY media_id""".stripMargin,

    // frame sampling over the 6-frame fixture videos (stride 2): each
    // sampled frame's luma from the generating arithmetic, frame f
    // shifting every level by f·53
    "mm_frames" ->
      """SELECT d.doc_id AS media_id, f.f::BIGINT AS frame_idx,
        |  822::BIGINT AS byte_len,
        |  (SELECT sum((i * 37 + d.doc_id * 11 + length(d.text) + f.f * 53) % 256)::DOUBLE
        |     FROM generate_series(0, 255) g(i)) / 65280 AS mean_luma
        |FROM documents d CROSS JOIN (SELECT unnest([0, 2, 4]) AS f) f
        |ORDER BY media_id, frame_idx""".stripMargin,

    // PNG (operators.Multimodal.mmPng): lossless round-trip through
    // the REAL ImageIO PNG writer+reader — the decoded raster's exact
    // integer sum must equal the generating arithmetic's
    "mm_png" ->
      """SELECT doc_id AS media_id, 16 AS width, 16 AS height,
        |  (SELECT sum((i * 37 + d.doc_id * 11 + length(d.text)) % 256)::BIGINT
        |     FROM generate_series(0, 255) g(i)) AS px_sum,
        |  (SELECT sum((i * 37 + d.doc_id * 11 + length(d.text)) % 256)::DOUBLE
        |     FROM generate_series(0, 255) g(i)) / 65280 AS mean_luma
        |FROM documents d ORDER BY media_id""".stripMargin,

    // GIF (operators.Multimodal.mmGif): the palette family — 256 gray
    // levels exactly fill the palette, so the real-codec round-trip is
    // lossless and the oracle is the PNG family's arithmetic verbatim
    "mm_gif" ->
      """SELECT doc_id AS media_id, 16 AS width, 16 AS height,
        |  (SELECT sum((i * 37 + d.doc_id * 11 + length(d.text)) % 256)::BIGINT
        |     FROM generate_series(0, 255) g(i)) AS px_sum,
        |  (SELECT sum((i * 37 + d.doc_id * 11 + length(d.text)) % 256)::DOUBLE
        |     FROM generate_series(0, 255) g(i)) / 65280 AS mean_luma
        |FROM documents d ORDER BY media_id""".stripMargin,

    // JPEG (operators.Multimodal.mmJpeg): lossy — the oracle emits the
    // INVARIANTS lossy compression must preserve (exact dimensions,
    // successful decode, mean luma within ±0.02 of the pre-encode
    // raster); the Spark side computes the booleans from the real
    // decode, so a hash match means every payload decoded in band
    "mm_jpeg" ->
      """SELECT doc_id AS media_id, 16 AS width, 16 AS height,
        |  TRUE AS decodes_ok, TRUE AS luma_in_band
        |FROM documents ORDER BY media_id""".stripMargin,

    // audio features from the 8-bit PCM fixture arithmetic (the Spark
    // side computes them from a REAL javax.sound.sampled WAV decode)
    "mm_audio" ->
      """SELECT d.doc_id AS media_id, 1024::BIGINT AS n_samples,
        |  8000 AS sample_rate,
        |  ((d.doc_id * 11 + length(d.text)) % 256)::BIGINT AS first_sample,
        |  (SELECT sum((i * 37 + d.doc_id * 11 + length(d.text)) % 256)::DOUBLE
        |     FROM generate_series(0, 1023) g(i)) / (255.0 * 1024) AS mean_level,
        |  sqrt((SELECT sum(((i * 37 + d.doc_id * 11 + length(d.text)) % 256 - 128)
        |      * ((i * 37 + d.doc_id * 11 + length(d.text)) % 256 - 128))::DOUBLE
        |     FROM generate_series(0, 1023) g(i)) / 1024.0) AS rms
        |FROM documents d ORDER BY media_id""".stripMargin
  )

  val all: Map[String, String] = textOracles ++ Map(
    // ---- relational / star-schema ----
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsum("l_quantity")} AS sum_qty,
         |  ${dsum("l_extendedprice")} AS sum_base_price,
         |  $rev AS sum_disc_price,
         |  ${davg("l_quantity")} AS avg_qty,
         |  ${davg("l_extendedprice")} AS avg_price,
         |  ${davg("l_discount")} AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_revenue" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority, $rev AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |  AND l_shipdate > TIMESTAMP '1998-01-01'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      s"""SELECT n_name, $rev AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "join_semi_orders" ->
      s"""SELECT o_orderstatus, count(*) AS n_orders, ${dsum("o_totalprice")} AS sum_price
         |FROM orders WHERE EXISTS (
         |  SELECT 1 FROM lineitem
         |  WHERE l_orderkey = o_orderkey AND l_extendedprice > 50000)
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "join_anti_customers" ->
      s"""SELECT c_mktsegment, count(*) AS n_inactive, ${dsum("c_acctbal")} AS sum_acctbal
         |FROM customer WHERE NOT EXISTS (
         |  SELECT 1 FROM orders
         |  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01')
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT sum((l_extendedprice::DECIMAL(18,2) * l_discount::DECIMAL(18,2))::DECIMAL(38,4))::DOUBLE AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "brand_price_agg" ->
      s"""SELECT p_brand, count(*) AS n_lines,
         |  ${davg("l_extendedprice")} AS avg_price,
         |  ${dsum("l_quantity")} AS sum_qty
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    // ---- time-series analytics over events (A*) ----
    "a1_device_summary" ->
      s"""SELECT user_id, count(*) AS total_readings,
         |  min(ts) AS first_seen, max(ts) AS last_seen,
         |  ${davg("value")} AS avg_value,
         |  arg_max(value, ts) AS last_value,
         |  count(*) FILTER (WHERE event_type = 'error') AS error_count
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "a2_hourly_agg" ->
      s"""SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type,
         |  count(*) AS n, ${davg("value")} AS avg_value,
         |  min(value) AS min_value, max(value) AS max_value
         |FROM events GROUP BY bucket, event_type ORDER BY bucket, event_type""".stripMargin,

    // served_hourly: the Spark side runs materialize → refreshRange →
    // servedHourly (store/Backfill.servedHourlyCertified) — the oracle
    // is the continuous aggregate's DEFINITION over the full raw table
    // (the reference's fully-refreshed state, init.sql:324-345), i.e.
    // a2_hourly_agg — the served side derives avg from the rollup's
    // stored (decimal sum, count(value)) pair, so the mirror divides by
    // count(value): the reference AVG's null-skipping semantics, not
    // count(*) (advice r14). The hash match certifies the whole
    // materialize/refresh/serve lifecycle reproduces the direct
    // aggregation.
    "served_hourly" ->
      s"""SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type,
         |  count(*) AS n,
         |  (sum(value::DECIMAL(18,2))::DOUBLE / count(value)) AS avg_value,
         |  min(value) AS min_value, max(value) AS max_value
         |FROM events GROUP BY bucket, event_type ORDER BY bucket, event_type""".stripMargin,

    // week parity: time_bucket('1 week') aligns to 2000-01-03 (Monday)
    // = Spark date_trunc("week")'s ISO-Monday boundaries; month parity:
    // calendar months on both sides (SURVEY §7.4#3 pin)
    "a2_weekly_agg" ->
      s"""SELECT time_bucket(INTERVAL '1 week', ts) AS bucket, event_type,
         |  count(*) AS n, ${davg("value")} AS avg_value,
         |  min(value) AS min_value, max(value) AS max_value
         |FROM events GROUP BY bucket, event_type ORDER BY bucket, event_type""".stripMargin,

    "a2_monthly_agg" ->
      s"""SELECT time_bucket(INTERVAL '1 month', ts) AS bucket, event_type,
         |  count(*) AS n, ${davg("value")} AS avg_value,
         |  min(value) AS min_value, max(value) AS max_value
         |FROM events GROUP BY bucket, event_type ORDER BY bucket, event_type""".stripMargin,

    "a3_daily_agg" ->
      s"""SELECT bucket, user_id, n, avg_value, first_value, last_value,
         |  last_value - first_value AS value_change
         |FROM (
         |  SELECT date_trunc('day', ts) AS bucket, user_id, count(*) AS n,
         |    ${davg("value")} AS avg_value,
         |    arg_min(value, ts) AS first_value,
         |    arg_max(value, ts) AS last_value
         |  FROM events GROUP BY bucket, user_id)
         |ORDER BY bucket, user_id""".stripMargin,

    "a4_device_stats" ->
      s"""SELECT user_id, event_type, count(*) AS reading_count,
         |  min(ts) AS first_reading, max(ts) AS last_reading,
         |  ${davg("value")} AS avg_value,
         |  min(value) AS min_value, max(value) AS max_value
         |FROM events GROUP BY user_id, event_type ORDER BY user_id, event_type""".stripMargin,

    "a5_timeseries_stats" ->
      s"""SELECT time_bucket(INTERVAL '15 minutes', ts) AS bucket, user_id,
         |  count(*) AS n, ${davg("value")} AS avg_value,
         |  min(value) AS min_value, max(value) AS max_value
         |FROM events
         |WHERE user_id < 50 AND ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
         |GROUP BY bucket, user_id ORDER BY bucket, user_id""".stripMargin,

    // deterministic-part oracle for the approx scale path: group keys +
    // exact n are cross-engine; the sketch estimates are certified by
    // band booleans each engine computes against ITS OWN sketch (HLL
    // within max(2, 5%) of exact; quantiles by rank-interval recount vs
    // φ ± 5%·n — the guarantee quantile sketches actually give)
    "a6_approx_distribution" ->
      """WITH ev AS (SELECT date_trunc('day', ts) AS bucket, event_type,
        |    user_id, value FROM events),
        |est AS (SELECT bucket, event_type,
        |    approx_count_distinct(user_id) AS nd_approx,
        |    count(DISTINCT user_id) AS nd_exact, count(*) AS n,
        |    approx_quantile(value, 0.5) AS med_a,
        |    approx_quantile(value, 0.95) AS p95_a
        |  FROM ev GROUP BY bucket, event_type),
        |rk AS (SELECT ev.bucket, ev.event_type,
        |    count(*) FILTER (ev.value < e.med_a) AS med_lo,
        |    count(*) FILTER (ev.value <= e.med_a) AS med_hi,
        |    count(*) FILTER (ev.value <= e.p95_a) AS p95_hi
        |  FROM ev JOIN est e USING (bucket, event_type)
        |  GROUP BY ev.bucket, ev.event_type)
        |SELECT bucket, event_type, n,
        |  (abs(nd_approx - nd_exact) <= greatest(2.0, nd_exact * 0.05))
        |    AS devices_in_band,
        |  (med_hi >= 0.45 * n AND med_lo <= 0.55 * n) AS median_in_band,
        |  (p95_hi >= 0.90 * n) AS p95_in_band
        |FROM est JOIN rk USING (bucket, event_type)
        |ORDER BY bucket, event_type""".stripMargin,

    "a6_daily_distribution" ->
      s"""SELECT date_trunc('day', ts) AS bucket, event_type,
         |  count(DISTINCT user_id) AS n_devices, count(*) AS n,
         |  ${davg("value")} AS avg_value,
         |  ${dstddev("value")} AS stddev_value,
         |  round(quantile_cont(value, 0.5), 6) AS median_value,
         |  round(quantile_cont(value, 0.95), 6) AS p95_value
         |FROM events GROUP BY bucket, event_type ORDER BY bucket, event_type""".stripMargin,

    "a7_rollup_15min" ->
      s"""SELECT time_bucket(INTERVAL '15 minutes', ts) AS bucket, event_type,
         |  ${davg("value")} AS avg_value,
         |  arg_max(value, ts) AS last_value, max(ts) AS last_ts
         |FROM events WHERE event_type IN ('click', 'view')
         |GROUP BY bucket, event_type ORDER BY bucket, event_type""".stripMargin,

    "a8_range_agg" ->
      s"""SELECT user_id, ${davg("value")} AS avg_value,
         |  min(value) AS min_value, max(value) AS max_value, count(*) AS n
         |FROM events
         |WHERE ts BETWEEN TIMESTAMP '2024-01-10' AND TIMESTAMP '2024-01-20'
         |  AND event_type = 'purchase'
         |GROUP BY user_id ORDER BY avg_value DESC, user_id""".stripMargin,

    "a9_table_stats" ->
      s"""SELECT count(*) AS total_rows,
         |  count(DISTINCT user_id) AS n_devices,
         |  count(DISTINCT event_type) AS n_types,
         |  min(ts) AS min_ts, max(ts) AS max_ts,
         |  count(*) FILTER (WHERE event_type = 'error') AS error_count,
         |  ${davg("value")} AS avg_value
         |FROM events""".stripMargin,

    "a10_recent_distribution" ->
      s"""SELECT event_type, count(*) AS n, ${davg("value")} AS avg_value,
         |  min(value) AS min_value, max(value) AS max_value
         |FROM events
         |WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 24 HOURS
         |GROUP BY event_type ORDER BY n DESC, event_type""".stripMargin,

    // deterministic-part oracle for the sketch merge: exact_distinct is
    // cross-engine checked; merged_in_band is the merge-path error
    // bound the Spark plan itself certifies (sketch bytes never leave
    // their engine, so the oracle states the literal the property must
    // evaluate to — a Spark-side false is a hash mismatch; bit-equality
    // merged ≡ direct is NOT asserted: it is a sparse-regime accident
    // that breaks at the dense-mode transition, see a6SketchMerge);
    // the direct band is recomputed over DuckDB's OWN HLL estimate
    "a6_sketch_merge" ->
      """SELECT count(DISTINCT user_id) AS exact_distinct,
        |  TRUE AS merged_in_band,
        |  (abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
        |    <= count(DISTINCT user_id) * 0.05) AS estimate_in_band
        |FROM events""".stripMargin,

    // KLL quantile-merge gate: exact row count cross-engine; the rank
    // bands are each engine's own-property booleans (Spark certifies
    // its merged KLL estimates, DuckDB recomputes the same band over
    // its own approx_quantile — a false on either side hash-mismatches)
    "a6_quantile_merge" ->
      """SELECT (SELECT count(*) FROM events) AS n_rows,
        |  ((SELECT count(*) FROM events
        |     WHERE value <= (SELECT approx_quantile(value, 0.5) FROM events))
        |   BETWEEN (SELECT count(*) FROM events) * 0.45
        |       AND (SELECT count(*) FROM events) * 0.55) AS p50_rank_in_band,
        |  ((SELECT count(*) FROM events
        |     WHERE value <= (SELECT approx_quantile(value, 0.95) FROM events))
        |   BETWEEN (SELECT count(*) FROM events) * 0.90
        |       AND (SELECT count(*) FROM events) * 1.00) AS p95_rank_in_band""".stripMargin,

    "a11_duplicate_detection" ->
      """SELECT count(*)::BIGINT AS n_duplicate_pairs,
        |  coalesce(sum(c - 1), 0)::BIGINT AS n_excess_rows
        |FROM (SELECT user_id, ts, count(*) AS c FROM events
        |      GROUP BY user_id, ts HAVING count(*) > 1)""".stripMargin,

    // funnel: stage mins chained by joins; exact integer-micros sums,
    // one double division (mirrors the Spark expression tree)
    "funnel_stages" ->
      """WITH su AS (SELECT user_id, min(ts) AS t0 FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |cl AS (SELECT e.user_id, min(e.ts) AS t1, min(su.t0) AS t0
        |  FROM events e JOIN su ON su.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= su.t0 GROUP BY e.user_id),
        |pu AS (SELECT e.user_id, min(e.ts) AS t2, min(cl.t0) AS t0
        |  FROM events e JOIN cl ON cl.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= cl.t1 GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT 1::BIGINT AS stage, 'signup' AS stage_name,
        |    count(*) AS n_users,
        |    round(sum(epoch_us(t0) - epoch_us(t0))::DOUBLE / count(*)
        |      / 3600000000.0, 6) AS mean_hours_from_signup FROM su
        |  UNION ALL
        |  SELECT 2, 'click_after_signup', count(*),
        |    round(sum(epoch_us(t1) - epoch_us(t0))::DOUBLE / count(*)
        |      / 3600000000.0, 6) FROM cl
        |  UNION ALL
        |  SELECT 3, 'purchase_after_click', count(*),
        |    round(sum(epoch_us(t2) - epoch_us(t0))::DOUBLE / count(*)
        |      / 3600000000.0, 6) FROM pu)
        |ORDER BY stage""".stripMargin,

    // cohort triangle: first-seen day per user, distinct active users
    // per (cohort, day offset)
    "cohort_retention" ->
      """WITH bd AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day
        |  FROM events),
        |co AS (SELECT user_id, min(day) AS cohort_day FROM bd GROUP BY user_id)
        |SELECT co.cohort_day,
        |  date_diff('day', co.cohort_day, bd.day)::BIGINT AS day_offset,
        |  count(DISTINCT bd.user_id) AS n_users
        |FROM bd JOIN co ON co.user_id = bd.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // keyless interval join (RangeJoin.rangeJoinBurst): DuckDB plans
    // the inequality join natively (IEJoin); the Spark side buckets the
    // epoch at the lookback width and refines exactly
    "range_join_burst" ->
      """SELECT p.event_id, p.ts, count(b.ts)::BIGINT AS n_preceding
        |FROM events p LEFT JOIN events b
        |  ON epoch_us(b.ts) >= epoch_us(p.ts) - 60000000
        | AND epoch_us(b.ts) < epoch_us(p.ts)
        |WHERE p.event_type = 'error'
        |GROUP BY p.event_id, p.ts
        |ORDER BY p.event_id""".stripMargin,

    // as-of join (AsofJoin.asofPurchaseJoin): DuckDB has the operator
    // natively; the Spark side composes union + running-last window.
    // Build side pre-aggregated to one row per (user_id, ts) so the
    // greatest-ts-<= match is deterministic in both engines.
    "asof_join_purchase" ->
      """WITH b AS (SELECT user_id, ts AS purchase_ts,
        |    max(event_id) AS purchase_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |p AS (SELECT event_id, user_id, ts, event_type FROM events
        |  WHERE event_type <> 'purchase')
        |SELECT p.event_id, p.user_id, p.ts, p.event_type,
        |  b.purchase_ts, b.purchase_id
        |FROM p ASOF LEFT JOIN b
        |  ON p.user_id = b.user_id AND p.ts >= b.purchase_ts
        |ORDER BY p.event_id""".stripMargin,

    "w4_session_windows" ->
      s"""WITH g AS (
         |  SELECT user_id, ts, value,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
         |         THEN 1 ELSE 0 END AS new_session
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         |s AS (
         |  SELECT user_id, ts, value,
         |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
         |      ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
         |  FROM g)
         |SELECT user_id, session_id, count(*) AS n_events,
         |  min(ts) AS session_start, max(ts) AS session_end,
         |  (epoch_us(max(ts)) - epoch_us(min(ts)))::DOUBLE / 60000000.0
         |    AS duration_minutes,
         |  ${davg("value")} AS avg_value
         |FROM s GROUP BY user_id, session_id
         |ORDER BY user_id, session_id""".stripMargin,

    "agg_rollup" ->
      s"""SELECT coalesce(event_type, 'ALL') AS event_type,
         |  coalesce(day, 'ALL') AS day,
         |  count(*) AS n, ${davg("value")} AS avg_value
         |FROM (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, value
         |      FROM events)
         |GROUP BY ROLLUP (event_type, day)
         |ORDER BY event_type, day""".stripMargin,

    // ---- window analytics (W*) ----
    "w1_gap_detection" ->
      """WITH l AS (
        |  SELECT user_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        |  FROM events)
        |SELECT user_id, ts, prev_ts,
        |  (epoch_us(ts) - epoch_us(prev_ts)) / 60000000.0 AS gap_minutes
        |FROM l
        |WHERE (epoch_us(ts) - epoch_us(prev_ts)) / 60000000.0 > 60
        |ORDER BY user_id, ts""".stripMargin,

    "w2_moving_avg" ->
      """SELECT user_id, ts, value,
        |  (sum(value::DECIMAL(18,2)) OVER w)::DOUBLE / (count(*) OVER w) AS moving_avg_12,
        |  value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts) AS value_delta
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts""".stripMargin,

    "w3_rate_of_change" ->
      """WITH l AS (
        |  SELECT user_id, ts, value,
        |    lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS prev_value,
        |    epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS dt_us
        |  FROM events)
        |SELECT user_id, ts,
        |  (value - prev_value) / (dt_us / 3600000000.0) AS rate_per_hour
        |FROM l WHERE dt_us > 0 ORDER BY user_id, ts""".stripMargin,

    "pivot_user_type" ->
      s"""SELECT user_id,
         |  sum(CASE WHEN event_type = 'click' THEN value::DECIMAL(18,2) END)::DOUBLE
         |    / count(CASE WHEN event_type = 'click' THEN value END) AS click,
         |  sum(CASE WHEN event_type = 'view' THEN value::DECIMAL(18,2) END)::DOUBLE
         |    / count(CASE WHEN event_type = 'view' THEN value END) AS view,
         |  sum(CASE WHEN event_type = 'purchase' THEN value::DECIMAL(18,2) END)::DOUBLE
         |    / count(CASE WHEN event_type = 'purchase' THEN value END) AS purchase,
         |  sum(CASE WHEN event_type = 'signup' THEN value::DECIMAL(18,2) END)::DOUBLE
         |    / count(CASE WHEN event_type = 'signup' THEN value END) AS signup,
         |  sum(CASE WHEN event_type = 'error' THEN value::DECIMAL(18,2) END)::DOUBLE
         |    / count(CASE WHEN event_type = 'error' THEN value END) AS error
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    // ---- sorts / limits (O*) ----
    "o1_recent_readings" ->
      """SELECT event_id, ts, user_id, event_type, value
        |FROM events
        |WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 24 HOURS
        |ORDER BY ts DESC""".stripMargin,

    "o2_anomalous_readings" ->
      """SELECT event_id, ts, user_id, value FROM events
        |WHERE event_type = 'error' ORDER BY ts DESC""".stripMargin,

    "o3_recent_topn" ->
      """SELECT event_id, ts, user_id, event_type, value FROM events
        |ORDER BY ts DESC, event_id LIMIT 100""".stripMargin,

    // ---- Avro wire round-trip: encode∘decode is the identity, so the
    // oracle is the same flat projection computed directly from events
    "avro_roundtrip" ->
      """SELECT event_id,
        |  'dev-' || user_id::VARCHAR AS device_id,
        |  event_type AS device_type,
        |  strftime(ts, '%Y-%m-%dT%H:%M:%S') AS ts_str,
        |  CASE WHEN event_id % 3 = 0 THEN 'double'
        |       WHEN event_id % 3 = 1 THEN 'int' ELSE 'null' END AS value_kind,
        |  CASE WHEN event_id % 3 = 0 THEN value
        |       WHEN event_id % 3 = 1 THEN trunc(value)::INT::DOUBLE
        |       ELSE NULL END AS value_num,
        |  CASE event_type WHEN 'click' THEN 'count' WHEN 'view' THEN 'ms'
        |    WHEN 'purchase' THEN 'eur' WHEN 'signup' THEN 'count'
        |    ELSE 'code' END AS unit,
        |  60.0 + (user_id % 100)::DOUBLE * 0.001 AS latitude,
        |  24.0 + (user_id % 100)::DOUBLE * 0.002 AS longitude,
        |  CASE WHEN user_id % 5 = 0 THEN NULL
        |       ELSE 'B' || (user_id % 3)::VARCHAR END AS building,
        |  CASE WHEN user_id % 4 = 0 THEN NULL
        |       ELSE (user_id % 4)::DOUBLE END AS floor_d,
        |  CASE WHEN user_id % 2 = 0 THEN 'Z1' ELSE NULL END AS zone,
        |  NULL::VARCHAR AS room,
        |  CASE WHEN event_id % 5 = 0 THEN NULL ELSE value * 0.1 END
        |    AS battery_level,
        |  CASE WHEN event_id % 2 = 0 THEN -40.0 - (user_id % 30)::DOUBLE
        |       ELSE NULL END AS signal_strength,
        |  event_type = 'error' AS is_anomaly,
        |  CASE WHEN user_id % 6 = 0 THEN NULL
        |       ELSE 'fw-1.' || (user_id % 4)::VARCHAR END AS firmware_version,
        |  CASE WHEN event_id % 7 = 0 THEN NULL
        |       ELSE 'gw-' || (user_id % 5)::VARCHAR END AS meta_parent,
        |  CASE WHEN event_id % 7 = 0 THEN NULL ELSE 2 END::BIGINT AS n_meta,
        |  (['ACTIVE','IDLE','MAINTENANCE','ERROR','UNKNOWN'])[(event_id % 5)::INT + 1]
        |    AS status,
        |  2::BIGINT AS n_tags,
        |  event_type AS tag2,
        |  CASE WHEN user_id % 7 = 0 THEN NULL
        |       ELSE '2024-0' || ((user_id % 9) + 1)::VARCHAR || '-01' END
        |    AS maintenance_date,
        |  42::INT AS schema_id,
        |  TRUE AS magic_ok
        |FROM events ORDER BY event_id""".stripMargin,

    // ---- row transforms (T*) / integrity (L8) ----
    "t5_normalize_ts" ->
      """WITH r AS (SELECT event_id,
        |  CASE WHEN event_id % 4 = 0 THEN (1704067200 + event_id % 100000)::VARCHAR
        |       WHEN event_id % 4 = 1 THEN (event_id % 1000)::VARCHAR
        |       WHEN event_id % 4 = 2 THEN '2024-01-' ||
        |         lpad(((event_id % 28) + 1)::VARCHAR, 2, '0') ||
        |         ' 0' || (event_id % 10)::VARCHAR || ':30:00'
        |       ELSE 'garbage' END AS raw_ts
        |  FROM events)
        |SELECT event_id, raw_ts,
        |  CASE WHEN try_cast(raw_ts AS BIGINT) IS NOT NULL
        |         AND try_cast(raw_ts AS BIGINT) >= 10000000
        |         THEN make_timestamp(try_cast(raw_ts AS BIGINT) * 1000000)
        |       WHEN try_cast(raw_ts AS BIGINT) IS NOT NULL
        |         THEN TIMESTAMP '2024-01-15'
        |       ELSE coalesce(try_cast(raw_ts AS TIMESTAMP),
        |                     TIMESTAMP '2024-01-15') END AS norm_ts
        |FROM r ORDER BY event_id""".stripMargin,

    "t1_fanout" ->
      """SELECT * FROM (
        |  SELECT user_id::VARCHAR || '_value' AS device_id, event_id, ts,
        |    'value' AS metric, value AS metric_value FROM events
        |  UNION ALL
        |  SELECT user_id::VARCHAR || '_props_k', event_id, ts,
        |    'props_k', json_extract_string(props, '$.k')::DOUBLE FROM events)
        |WHERE metric_value IS NOT NULL ORDER BY event_id, metric""".stripMargin,

    "t4_battery_pct" ->
      """SELECT event_id, value,
        |  (CASE WHEN value <= 50.0 THEN 0.0
        |        WHEN value >= 450.0 THEN 100.0
        |        ELSE (value - 50.0) * 0.25 END)::DOUBLE AS battery_pct
        |FROM events ORDER BY event_id""".stripMargin,

    "t6_clamp_ts" ->
      """SELECT event_id, ts,
        |  CASE WHEN ts < TIMESTAMP '2024-01-05' THEN TIMESTAMP '2024-01-05'
        |       WHEN ts > TIMESTAMP '2024-01-25' THEN TIMESTAMP '2024-01-25'
        |       ELSE ts END AS ts_clamped,
        |  ts <> (CASE WHEN ts < TIMESTAMP '2024-01-05' THEN TIMESTAMP '2024-01-05'
        |              WHEN ts > TIMESTAMP '2024-01-25' THEN TIMESTAMP '2024-01-25'
        |              ELSE ts END) AS was_clamped
        |FROM events ORDER BY event_id""".stripMargin,

    "t7_valid_counts" ->
      """SELECT event_type, count(*) AS n_total,
        |  count(*) FILTER (WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |    AND ts IS NOT NULL AND value IS NOT NULL
        |    AND value >= 0 AND value <= 1000) AS n_valid,
        |  count(*) FILTER (WHERE NOT (user_id IS NOT NULL AND event_type IS NOT NULL
        |    AND ts IS NOT NULL AND value IS NOT NULL
        |    AND value >= 0 AND value <= 1000)) AS n_invalid
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "t9_anomaly_flags" ->
      """SELECT event_type, count(*) AS n,
        |  count(*) FILTER (WHERE (event_type = 'purchase' AND value > 400.0)
        |    OR event_type = 'error' OR value > 480.0) AS n_anomalies,
        |  (count(*) FILTER (WHERE (event_type = 'purchase' AND value > 400.0)
        |    OR event_type = 'error' OR value > 480.0))::DOUBLE * 100.0
        |    / count(*)::DOUBLE AS anomaly_pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "t10_alerts" ->
      """SELECT event_id, ts, user_id, event_type, value,
        |  CASE WHEN event_type = 'error' AND value > 300 THEN 'CRITICAL'
        |       WHEN event_type = 'error' THEN 'WARNING'
        |       WHEN value > 450 THEN 'HIGH_VALUE' END AS alert_level
        |FROM events
        |WHERE (CASE WHEN event_type = 'error' AND value > 300 THEN 'CRITICAL'
        |            WHEN event_type = 'error' THEN 'WARNING'
        |            WHEN value > 450 THEN 'HIGH_VALUE' END) IS NOT NULL
        |ORDER BY event_id""".stripMargin,

    "l8_integrity" ->
      """SELECT e.*, d.duplicate_pairs FROM (
        |  SELECT count(*) AS total_rows,
        |    count(*) FILTER (WHERE user_id IS NULL) AS null_ids,
        |    count(*) FILTER (WHERE ts > TIMESTAMP '2024-02-01') AS future_ts,
        |    count(*) FILTER (WHERE value < 0 OR value > 1000) AS out_of_range,
        |    count(*) FILTER (WHERE value IS NULL) AS null_values
        |  FROM events) e
        |CROSS JOIN (
        |  SELECT count(*) AS duplicate_pairs FROM (
        |    SELECT user_id, ts FROM events GROUP BY user_id, ts
        |    HAVING count(*) > 1)) d""".stripMargin
  ) +
    // the durable-sink drive of the two-delivery scenario computes the
    // SAME result as the in-memory steps — one declarative oracle
    // certifies both paths
    ("dedup_incremental_sink" -> textOracles("dedup_incremental"))
}
