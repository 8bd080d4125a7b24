package graft.store

import graft.Tables
import graft.functions.TextFunctions
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PERSISTED LEXICAL INDEX — the text twin of `AnnIndex`: the BM25
  * statistics a search deployment computes once at ingest, stored as
  * parquet tables, so serving a query never re-tokenizes the corpus:
  *
  *   postings  (tok, doc_id, tf)  — the inverted index, repartitioned
  *                                  and sorted by tok so min/max
  *                                  row-group stats skip non-matching
  *                                  splits on selective term sets
  *   df        (tok, df)          — document frequency per term
  *   dl        (doc_id, dl)       — document length
  *   stats     (n_docs, sum_dl)   — one row
  *
  * Serve answers BM25 top-k FROM THE INDEX TABLES ONLY (the query's
  * own terms are read from its postings rows) — no documents-table
  * scan on the serve side, the same contract the ANN serves prove.
  * With `AnnIndex`, both legs of the hybrid retrieval stack have a
  * build-once / serve-many store.
  *
  * Determinism: every table is an exact-integer aggregate of the token
  * multiset; the BM25 arithmetic mirrors `Hybrid.hybridTopkDf` term
  * for term, so one DuckDB oracle certifies the in-session leg and
  * this persisted serve alike.
  */
object TextIndex {

  private val FormatVersion = "v1"

  /** Root resolution + publish via the shared `StoreRoot` protocol,
    * keyed on the documents table's state.
    */
  // n is BY-NAME through the memo: a warm serve resolves the root
  // from (path, mtime, len, kind) without running the count job
  private def indexRoot(spark: SparkSession, dir: String, n: => Long,
      kind: String = "lex"): Path =
    StoreRoot.rootForCached(spark, s"$dir/documents.parquet", kind,
      FormatVersion)(n)

  private def ensureBuilt(spark: SparkSession, root: Path)(
      build: String => Unit): Unit =
    StoreRoot.ensureBuilt(spark, root)(build)

  /** The per-document token counts (the one tokenize scan an index
    * build or append pays). `df`, `dl` and `stats` are pure aggregates
    * of these rows, so both writers below derive them from the
    * ALREADY-WRITTEN postings parquet rather than re-running this
    * lineage — one tokenize pass per build/batch, the same
    * derive-from-staged pattern as `AnnIndex`'s vnorms-from-codes.
    * `df` and `stats` are stored as ADDITIVE DELTAS (serve sums them),
    * which is what makes incremental append exact: every BM25
    * statistic is a pure sum over documents, so build(A∪B) ≡
    * build(A) + append(B) bit-for-bit — the lexical store needs no
    * frozen-quantizer caveat.
    */
  private def tfOf(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"),
      explode(TextFunctions.tokens(col("text"))).as("tok"))
    .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))

  private def dfOf(postings: DataFrame): DataFrame =
    postings.groupBy(col("tok")).agg(count(lit(1)).as("df"))

  private def dlOf(postings: DataFrame): DataFrame =
    postings.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))

  private def statsOf(dl: DataFrame): DataFrame =
    dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))

  def build(docs: DataFrame, path: String): Unit = {
    val spark = docs.sparkSession
    tfOf(docs).select(col("tok"), col("doc_id"), col("tf"))
      .repartition(col("tok")).sortWithinPartitions(col("tok"))
      .write.parquet(s"$path/postings")
    val postings = spark.read.parquet(s"$path/postings")
    dfOf(postings).write.parquet(s"$path/df")
    dlOf(postings).write.parquet(s"$path/dl")
    statsOf(spark.read.parquet(s"$path/dl")).write.parquet(s"$path/stats")
  }

  /** EXACTLY-ONCE incremental append — the lexical twin of
    * `AnnIndex.appendPqBatch`, same marker + rollback-by-file-prefix
    * discipline: a new document batch appends its postings/dl rows and
    * its df/stats DELTAS (serve sums deltas, so global statistics stay
    * exact without ever re-reading the corpus). Cost is ONE tokenize
    * scan of the delta: postings stage first (the subs order), and
    * df/dl/stats derive from the just-staged postings parquet.
    */
  def appendBatch(docs: DataFrame, root: String, batchId: Long,
      filesPerBatch: Int = 1): Unit = {
    val spark = docs.sparkSession
    BatchCommit.commit(spark, root, batchId,
      Seq("postings", "df", "dl", "stats").map(_ -> false)) { (sub, path) =>
      def staged(name: String) = spark.read.parquet(
        path.substring(0, path.lastIndexOf('/')) + "/" + name)
      val bounded = sub match {
        // bound files per batch WITHOUT losing the postings' term
        // clustering (row-group stats skipping depends on it)
        case "postings" => tfOf(docs)
          .select(col("tok"), col("doc_id"), col("tf"))
          .repartition(filesPerBatch, col("tok"))
          .sortWithinPartitions(col("tok"))
        case "df"    => dfOf(staged("postings")).repartition(filesPerBatch)
        case "dl"    => dlOf(staged("postings")).repartition(filesPerBatch)
        case _       => statsOf(staged("dl"))
      }
      bounded.write.parquet(path)
    }
  }

  /** Streaming maintenance for the lexical index — the document delta
    * stream absorbed micro-batch by micro-batch, exactly once.
    */
  def startAppendSink(stream: DataFrame, root: String,
      checkpoint: String,
      filesPerBatch: Int = 1): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) =>
        appendBatch(b, root, id, filesPerBatch))
      .start()

  /** TAKEDOWN for the lexical store — the tombstone discipline the ANN
    * stores already have, in the form BM25's additivity makes exact:
    * deleted doc ids land in a `deletes` table (serve anti-joins the
    * postings against it) and the deleted docs' df/stats contributions
    * are cancelled by NEGATIVE delta segments computed from the
    * index's OWN postings — no corpus access, and after the sums the
    * statistics equal an index built without those docs bit-for-bit.
    * Committed exactly-once under `BatchCommit` (a replayed takedown
    * batch short-circuits on its marker), and ids already tombstoned
    * are excluded so a later batch can never double-subtract.
    * `Compaction.compactLexStore` later removes the rows physically
    * and folds the negatives away.
    */
  def deleteDocs(spark: SparkSession, root: String, ids0: DataFrame,
      batchId: Long): Unit = {
    val fresh = ids0.select(col("doc_id")).distinct()
    // already-deleted exclusion against COMMITTED tombstones only: a
    // torn prior attempt's deletes file is about to be rolled back by
    // this very commit's replay path — counting it would make the
    // replay see its own ids as already deleted and write EMPTY
    // deltas, silently losing the takedown
    val (delCommitted, _) =
      BatchCommit.committedDataFiles(spark, root, "deletes",
        partitioned = false)
    val ids =
      if (delCommitted.isEmpty) fresh
      else fresh.join(
        spark.read.parquet(delCommitted: _*).select(col("doc_id")),
        Seq("doc_id"), "left_anti")
    // cached for the batch: the df and stats stages both aggregate the
    // deleted docs' postings — one scan of the store's largest table,
    // not two
    val gone = spark.read.parquet(s"$root/postings")
      .join(broadcast(ids), Seq("doc_id"), "left_semi").persist()
    try BatchCommit.commit(spark, root, batchId,
      Seq("deletes", "df", "stats").map(_ -> false)) { (sub, path) =>
      (sub match {
        case "deletes" => ids
        case "df" => gone.groupBy(col("tok"))
          .agg((lit(0L) - count(lit(1))).as("df"))
        case _ => gone.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
          .agg((lit(0L) - count(lit(1))).as("n_docs"),
            (lit(0L) - coalesce(sum(col("dl")), lit(0L))).as("sum_dl"))
      }).coalesce(1).write.parquet(path)
    } finally gone.unpersist()
  }

  /** Takedown requests as a STREAM — each micro-batch of doc ids lands
    * through `deleteDocs`, whose marker short-circuits replays and
    * whose already-deleted exclusion makes overlapping batches safe,
    * so the negative-delta arithmetic stays exact under at-least-once
    * delivery.
    */
  def startDeleteSink(stream: DataFrame, root: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) =>
        deleteDocs(b.sparkSession, root, b, 1000000L + id))
      .start()

  /** Postings minus the tombstoned docs; identity when none exist
    * (the ANN stores' anti-join, keyed on doc_id).
    */
  private def minusDeletes(spark: SparkSession, root: String,
      postings: DataFrame): DataFrame =
    AnnIndex.minusDeletes(spark, root, postings, "doc_id")

  /** BM25 top-k from the persisted index: the query panel's terms come
    * from its own postings rows (doc_id < 10), candidates from the
    * postings join on term — the identical arithmetic (and literals)
    * as the in-session lexical leg, over stored statistics.
    */
  def serveBm25(spark: SparkSession, root: String, k: Int = 5): DataFrame = {
    val postings = minusDeletes(spark, root,
      spark.read.parquet(s"$root/postings"))
    // df and stats are append-only DELTAS — sum them (the identity
    // when the index was built in one shot)
    val dl = spark.read.parquet(s"$root/dl")
    val stats = spark.read.parquet(s"$root/stats")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    // the panel's terms as a LITERAL relation (control-plane — ≤
    // panel×terms rows, the lexical twin of the IVF probe route): the
    // IN literals push into the postings AND df scans as parquet
    // filters, so the term-sorted row groups SKIP everything outside
    // the query vocabulary. Without this the candidate join reads the
    // whole postings table; with it, serve I/O is the queried terms'
    // slice — the property that makes a 100 TB postings store servable.
    // ONE collect feeds both the literal panel relation and the term
    // literals (r14: the separate distinct().collect() was a second
    // driver job on every warm serve — pure stage-count latency)
    val (qtRows, qt) = graft.similarity.Similarity.materializeRows(
      postings.filter(col("doc_id") < 10)
        .select(col("doc_id").as("query_id"), col("tok")))
    // sorted: collect order is partition-arrival nondeterministic, and
    // these values become plan LITERALS — an unsorted list makes the
    // generated filter source differ per run, defeating the codegen
    // cache (the bench artifact read ~10 recompiled classes on every
    // re-run of the serve queries before this)
    val queryToks: Seq[Any] =
      qtRows.map(_.getString(1)).distinct.sorted.toSeq
    val dfreq = spark.read.parquet(s"$root/df")
      .filter(col("tok").isInCollection(queryToks))
      .groupBy(col("tok")).agg(sum(col("df")).as("df"))
    val term = postings.filter(col("tok").isInCollection(queryToks))
      .join(qt, Seq("tok"))
      .filter(col("doc_id") =!= col("query_id"))
      .join(dfreq, Seq("tok"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = lit(0.25) +
      lit(0.75) * col("dl") * col("n_docs") / col("sum_dl")
    val bm25 = term
      .select(col("query_id"), col("doc_id"),
        (idf * col("tf") * lit(2.2) /
          (col("tf") + lit(1.2) * norm)).as("t"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("t")), 6).as("bm25"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("bm25").desc, col("doc_id"))
    bm25.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("bm25"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** The lexical index root for a corpus dir, built if absent. */
  def ensuredRoot(s: SparkSession, dir: String): String = {
    val docs = Tables.documents(s, dir)
    val root = indexRoot(s, dir, docs.count())
    ensureBuilt(s, root)(staging => build(docs, staging))
    root.toString
  }

  def lexBm25Serve(s: SparkSession, dir: String, k: Int = 5): DataFrame =
    serveBm25(s, ensuredRoot(s, dir), k)

  /** The append path as a registered, oracle-gated query: build on the
    * first half of the corpus, APPEND the second half, serve. BM25's
    * statistics are additive, so this must equal the full build
    * EXACTLY — the query shares `lex_bm25_serve`'s oracle verbatim,
    * and a hash match certifies the delta-summing serve and the
    * append's exactly-once promote in one stroke.
    */
  def lexBm25AppendServe(s: SparkSession, dir: String,
      k: Int = 5): DataFrame = {
    val docs = Tables.documents(s, dir)
    val n = docs.count()
    val half = n / 2
    val root = indexRoot(s, dir, n, "lexapp")
    ensureBuilt(s, root) { staging =>
      build(docs.filter(col("doc_id") < half), staging)
      appendBatch(docs.filter(col("doc_id") >= half), staging, 0L)
    }
    serveBm25(s, root.toString, k)
  }

  /** The takedown path as a registered, oracle-gated query: build the
    * full index, DELETE the deterministic set doc_id % 23 == 4 (panel
    * docs excluded so every query survives), serve. The oracle rebuilds
    * the whole BM25 chain over the surviving documents only — a hash
    * match certifies that tombstone + negative-delta statistics equal
    * an index that never contained those docs.
    */
  def lexBm25ServeTombstone(s: SparkSession, dir: String,
      k: Int = 5): DataFrame = {
    val docs = Tables.documents(s, dir)
    val root = indexRoot(s, dir, docs.count(), "lexdel")
    ensureBuilt(s, root) { staging =>
      build(docs, staging)
      deleteDocs(s, staging,
        docs.filter(col("doc_id") % 23 === 4 && col("doc_id") >= 10)
          .select(col("doc_id")), 0L)
    }
    serveBm25(s, root.toString, k)
  }

  /** The append-then-FOLD path as a registered query: build + append
    * as above, then `Compaction.compactLexStore` collapses the df/stats
    * delta segments into their exact sums before serving. The fold is
    * the identity on every BM25 score (serve sums segments), so this
    * shares the one-shot serve oracle verbatim — the hash match
    * certifies the semantic fold's aggregation, standing, at every
    * gate scale.
    */
  def lexBm25CompactServe(s: SparkSession, dir: String,
      k: Int = 5): DataFrame = {
    val docs = Tables.documents(s, dir)
    val n = docs.count()
    val half = n / 2
    val root = indexRoot(s, dir, n, "lexcmp")
    ensureBuilt(s, root) { staging =>
      build(docs.filter(col("doc_id") < half), staging)
      appendBatch(docs.filter(col("doc_id") >= half), staging, 0L)
      Compaction.compactLexStore(s, staging)
    }
    serveBm25(s, root.toString, k)
  }
}
