package graft

import graft.streaming.ManifestFeed

/** The NO-REPLACE publish race (r16 ADVICE #1): on file:// roots the
  * publish is an atomic link(2) — two concurrent deliver()s of the
  * same deliveryId must resolve to exactly ONE published manifest
  * whose data dir exists and reads back, with the loser (a) throwing,
  * (b) leaving no second manifest, and (c) removing its own staging
  * data dir. Run several rounds: the pre-flight exists() fail-fast
  * catches sequential duplicates, so only a genuinely concurrent pair
  * exercises the link — a barrier lines the two publishers up.
  */
class ManifestRaceSpec extends SparkSpec {

  test("concurrent duplicate deliveries: exactly one manifest wins, loser cleans up") {
    import java.util.concurrent.{CountDownLatch, CyclicBarrier, Executors}
    import scala.util.Try
    val df = Tables.documents(spark, Sf0001).limit(20)
      .select("doc_id", "lang", "source", "n_chars")
    val pool = Executors.newFixedThreadPool(2)
    try {
      for (round <- 0 until 3) {
        val root = java.nio.file.Files
          .createTempDirectory(s"mrace_$round").toString
        val barrier = new CyclicBarrier(2)
        val done = new CountDownLatch(2)
        val results = new java.util.concurrent.ConcurrentLinkedQueue[Try[String]]()
        for (_ <- 0 until 2) pool.submit(new Runnable {
          def run(): Unit = {
            val r = Try {
              barrier.await() // line the two publishers up
              ManifestFeed.deliver(df, root, deliveryId = 7L, nFiles = 2)
            }
            results.add(r); done.countDown()
          }
        })
        done.await()
        val (wins, losses) = results.toArray(Array.empty[Try[String]])
          .partition(_.isSuccess)
        assert(wins.length == 1, s"round $round: ${wins.length} winners")
        assert(losses.length == 1)
        // exactly one manifest, naming the winner's data dir
        val feed = new java.io.File(s"$root/feed").listFiles()
          .filter(_.getName.startsWith("m"))
        assert(feed.length == 1, s"round $round: ${feed.toSeq} manifests")
        val named = scala.io.Source.fromFile(feed.head).mkString.trim
        assert(named == wins.head.get, "manifest names a non-winning data dir")
        assert(new java.io.File(named).isDirectory, "published data dir missing")
        // the data reads back whole through the published manifest
        assert(spark.read.parquet(named).count() == 20)
        // loser threw the race/duplicate error and its staging dir is
        // gone — the only dirs under data/ belong to the winner
        val msg = losses.head.failed.get.getMessage
        assert(msg.contains("lost publish race") || msg.contains("already published"),
          s"unexpected loser error: $msg")
        val dataDirs = new java.io.File(s"$root/data").listFiles().map(_.toString)
        assert(dataDirs.toSet == Set(wins.head.get),
          s"round $round: orphaned staging dirs: ${dataDirs.toSeq}")
      }
    } finally pool.shutdown()
  }
}
