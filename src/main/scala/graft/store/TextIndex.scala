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

  private def indexRoot(spark: SparkSession, dir: String, n: Long): Path = {
    val src = new Path(s"$dir/documents.parquet")
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(src)
    val digest = java.lang.Long.toHexString(graft.functions.TextHash.hash60(
      s"$dir|$n|${st.getModificationTime}|${st.getLen}|lex|$FormatVersion"))
    new Path(s"${System.getProperty("java.io.tmpdir")}/graft_ann/lex-$digest")
  }

  private def ensureBuilt(spark: SparkSession, root: Path)(
      build: String => Unit): Unit = {
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) return
    val staging = new Path(root.toString + s".build-${System.nanoTime()}")
    fs.delete(staging, true)
    build(staging.toString)
    fs.mkdirs(root.getParent)
    if (!fs.rename(staging, root)) {
      if (!fs.exists(root))
        throw new java.io.IOException(s"cannot publish text index at $root")
      fs.delete(staging, true)
    }
  }

  def build(docs: DataFrame, path: String): Unit = {
    val tf = docs
      .select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    tf.select(col("tok"), col("doc_id"), col("tf"))
      .repartition(col("tok")).sortWithinPartitions(col("tok"))
      .write.parquet(s"$path/postings")
    tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .write.parquet(s"$path/df")
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    dl.write.parquet(s"$path/dl")
    dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .write.parquet(s"$path/stats")
  }

  /** BM25 top-k from the persisted index: the query panel's terms come
    * from its own postings rows (doc_id < 10), candidates from the
    * postings join on term — the identical arithmetic (and literals)
    * as the in-session lexical leg, over stored statistics.
    */
  def serveBm25(spark: SparkSession, root: String, k: Int = 5): DataFrame = {
    val postings = spark.read.parquet(s"$root/postings")
    val dfreq = spark.read.parquet(s"$root/df")
    val dl = spark.read.parquet(s"$root/dl")
    val stats = spark.read.parquet(s"$root/stats")
    val qt = postings.filter(col("doc_id") < 10)
      .select(col("doc_id").as("query_id"), col("tok"))
    val term = postings.join(qt, Seq("tok"))
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

  def lexBm25Serve(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val docs = Tables.documents(s, dir)
    val root = indexRoot(s, dir, docs.count())
    ensureBuilt(s, root)(staging => build(docs, staging))
    serveBm25(s, root.toString, k)
  }
}
