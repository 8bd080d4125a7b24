package graft

/** The one-factory contract (r15 verdict #3): every entry point —
  * Bench, Verify, the test base — builds through GraftSession, and the
  * scale-critical confs it encodes actually land on the session. A
  * regression here means an entry point (or an embedding application
  * following the factory) silently lost the r15 syscall fixes or the
  * oracle byte-compatibility settings.
  */
class GraftSessionSpec extends SparkSpec {

  test("scale-critical confs land on a factory-built session") {
    // SparkSpec.spark IS factory-built — asserting on it also proves
    // the test base goes through the factory
    assert(spark.conf.get("spark.shuffle.sort.bypassMergeThreshold") == "2",
      "bypass-merge writer must never engage (per-reducer file opens)")
    assert(spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled") == "true")
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    assert(spark.conf.get("spark.sql.ansi.enabled") == "false",
      "hash kernels rely on wrap-around int64 arithmetic")
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    // shuffle partitions sized to the session's core count, never
    // Spark's default 200
    assert(spark.conf.get("spark.sql.shuffle.partitions") == "4")
    // the JVM-global half of the r15 syscall fix rides factory init
    assert(!javax.imageio.ImageIO.getUseCache,
      "ImageIO must use memory-backed streams (no per-row temp files)")
  }
}
