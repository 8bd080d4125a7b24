package graft

import graft.functions.{GraftFunctions, TextFunctions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL surface: the native kernels registered as SQL functions, both via
  * `spark.sql.extensions` (session-build injection) and
  * `GraftFunctions.register` (live session). Parity is asserted against
  * the Column-API formulations the rest of the suite already certifies
  * against the DuckDB oracle.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private def freshSession(withExtensions: Boolean): SparkSession = {
    // the extensions config only applies at session construction, so
    // this suite manages its own sessions instead of using SparkSpec's
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val b = SparkSession.builder()
      .master("local[4]")
      .appName(getClass.getSimpleName)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
    (if (withExtensions)
      b.config("spark.sql.extensions", "graft.functions.GraftExtensions")
    else b).getOrCreate()
  }

  test("extensions-injected SQL functions match the Column API on real data") {
    val spark = freshSession(withExtensions = true)
    try {
      Tables.documents(spark, "/root/testdata/sf0.001")
        .createOrReplaceTempView("docs")
      Tables.embeddings(spark, "/root/testdata/sf0.001")
        .createOrReplaceTempView("embs")

      // text kernels: SQL text vs the Column pipeline, row for row
      val sql = spark.sql(
        """SELECT doc_id,
          |  graft_hash60(text) AS h,
          |  graft_simhash60(graft_tokens(text)) AS sh,
          |  size(graft_shingles(graft_tokens(text), 3)) AS nsh,
          |  graft_minhash_sig(graft_shingles(graft_tokens(text), 3), 4) AS sig
          |FROM docs ORDER BY doc_id""".stripMargin).collect()
      val viaColumns = Tables.documents(spark, "/root/testdata/sf0.001")
        .select(col("doc_id"),
          TextFunctions.hash60(col("text")).as("h"),
          TextFunctions.simhash60(TextFunctions.tokens(col("text"))).as("sh"),
          size(TextFunctions.shingles(col("text"), 3)).as("nsh"),
          TextFunctions.minhashSig(TextFunctions.shingles(col("text"), 3), 4).as("sig"))
        .orderBy("doc_id").collect()
      assert(sql.length == viaColumns.length && sql.length > 0)
      sql.zip(viaColumns).foreach { case (a, b) => assert(a == b) }

      // vector kernels: cosine/dot/buckets over a self-join sample
      val vec = spark.sql(
        """SELECT a.vec_id,
          |  round(graft_cosine(a.embedding, b.embedding), 6) AS cos,
          |  round(graft_dot(a.embedding, b.embedding), 6) AS dot,
          |  graft_lsh_buckets(a.embedding, 8, 2) AS buckets,
          |  graft_lsh_buckets(a.embedding, 8, 2, 1048576) AS split_buckets
          |FROM embs a JOIN embs b ON b.vec_id = a.vec_id + 1
          |ORDER BY a.vec_id LIMIT 20""".stripMargin).collect()
      assert(vec.length == 20)
      vec.foreach { r =>
        assert(math.abs(r.getDouble(1)) <= 1.0)
        assert(r.getSeq[Long](3).length == 2)
        // disjoint plane family: split buckets must not be a copy
        assert(r.getSeq[Long](3) != r.getSeq[Long](4) || r.getSeq[Long](3).forall(_ == 0L))
      }
      // self-cosine is exactly 1.0 under the shared fold
      val self = spark.sql(
        "SELECT min(round(graft_cosine(embedding, embedding), 6)) AS c FROM embs")
        .head().getDouble(0)
      assert(self == 1.0)

      // the registry carries usage text for DESCRIBE FUNCTION
      val desc = spark.sql("DESCRIBE FUNCTION graft_cosine")
        .collect().map(_.getString(0)).mkString("\n")
      assert(desc.contains("cosine similarity"))
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("summary aggregates work from pure SQL text") {
    val spark = freshSession(withExtensions = false)
    try {
      GraftFunctions.register(spark)
      import spark.implicits._
      Seq.tabulate(600)(i => s"w${i % 7}").toDF("tok")
        .createOrReplaceTempView("toks_sql")
      // CM: deterministic matrix — every hash row conserves total mass
      val m = spark.sql(
        "SELECT graft_count_min(tok, 4, 64) AS m FROM toks_sql")
        .head.getSeq[Long](0)
      assert(m.length == 4 * 64)
      (0 until 4).foreach(i => assert(m.slice(i * 64, (i + 1) * 64).sum == 600))
      // MG: the candidate set from SQL covers every token above N/k
      // (here k=4 and all 7 tokens sit near N/7 > N/4 is false — use
      // k=16 so all 7 clear the N/16 floor and MUST be candidates)
      val cands = spark.sql(
        "SELECT graft_misra_gries(tok, 16) AS c FROM toks_sql")
        .head.getSeq[String](0).toSet
      assert((0 until 7).map(i => s"w$i").toSet.subsetOf(cands))
      // literal-only sketch shape
      val err = intercept[Exception](
        spark.sql("SELECT graft_count_min(tok, cast(rand()*3 AS INT), 64) FROM toks_sql")
          .collect())
      assert(err.getMessage != null)
      // declared string input: a non-string column implicit-casts at
      // analysis time (used to ClassCastException at execution)
      Seq.tabulate(60)(i => i % 5).toDF("n")
        .createOrReplaceTempView("ints_sql")
      val mi = spark.sql("SELECT graft_count_min(n, 2, 32) AS m FROM ints_sql")
        .head.getSeq[Long](0)
      assert(mi.length == 2 * 32)
      (0 until 2).foreach(i => assert(mi.slice(i * 32, (i + 1) * 32).sum == 60))
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("runtime register() works on a session built without extensions") {
    val spark = freshSession(withExtensions = false)
    try {
      intercept[Exception](spark.sql("SELECT graft_hash60('x')").collect())
      GraftFunctions.register(spark)
      val h = spark.sql("SELECT graft_hash60('x') AS h").head().getLong(0)
      assert(h == graft.functions.TextHash.hash60("x"))
      // literal-only parameters fail analysis with a named argument
      val err = intercept[Exception](
        spark.sql("SELECT graft_shingles(array('a','b'), cast(rand()*3 AS INT))")
          .collect())
      assert(err.getMessage != null)
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
