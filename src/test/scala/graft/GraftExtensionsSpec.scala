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
