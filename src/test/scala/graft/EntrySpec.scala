package graft

import org.apache.spark.sql.functions._

class EntrySpec extends SparkSpec {

  test("entry() returns rows under a caller session with hostile defaults") {
    // the driver smoke-checks entry(spark) with ITS session — simulate
    // one configured opposite to ours (ANSI on, NTZ inference off)
    val foreign = spark.newSession()
    foreign.conf.set("spark.sql.ansi.enabled", "true")
    foreign.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    foreign.conf.set("spark.sql.session.timeZone", "America/New_York")
    val df = SparkEntry.entry(foreign)
    assert(df.count() > 0)
  }

  test("every registered query has aligned column names with its oracle SQL") {
    // cheap static alignment check: each oracle's SELECT list must
    // produce the same column names the Spark plan produces (the
    // driver's compare sorts columns by name before hashing)
    val q = SparkEntry.queries
    val o = SparkEntry.oracleSql
    assert(o.keySet.subsetOf(q.keySet), s"orphan oracles: ${o.keySet -- q.keySet}")
    q.keys.foreach { name =>
      val df = q(name)(spark, Sf0001)
      assert(df.columns.distinct.length == df.columns.length,
        s"$name has duplicate column names: ${df.columns.mkString(",")}")
    }
  }

  test("all queries execute on the smoke scale factor") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, Sf0001).count()
      assert(n >= 0, name)
    }
  }
}
