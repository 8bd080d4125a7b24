package graft.tools

import graft.Tables
import graft.serde.{AvroPipeline, AvroWire}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of the Avro wire round-trip. */
object ProfileAvro {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val e = Tables.events(spark, dir)
    println(s"rows=${e.count()} partitions=${e.rdd.getNumPartitions}")
    time("scan only")(noop(e))
    val enc = e.select(col("event_id"),
      AvroWire.toAvro(AvroPipeline.sensorFromEvents(), AvroWire.sensorSchemaJson).as("body"))
    time("encode")(noop(enc))
    time("encode 2nd")(noop(enc))
    val dec = enc.select(col("event_id"),
      AvroWire.fromAvro(col("body"), AvroWire.sensorSchemaJson).as("r"))
    time("encode+decode (1 field)")(noop(dec.select(col("event_id"), col("r.device_id"))))
    time("encode+decode (struct)")(noop(dec))
    time("full query")(noop(AvroPipeline.avroRoundtrip(spark, dir)))
    time("full query 2nd")(noop(AvroPipeline.avroRoundtrip(spark, dir)))
    val plan = AvroPipeline.avroRoundtrip(spark, dir)
      .queryExecution.executedPlan.toString
    val decodes = "(?i)avrodecode".r.findAllIn(plan).size
    val encodes = "(?i)avroencode".r.findAllIn(plan).size
    println(s"plan occurrences: from_avro=$decodes to_avro=$encodes")
    spark.stop()
  }
}
