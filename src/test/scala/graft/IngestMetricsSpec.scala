package graft

import graft.streaming.{IngestMetrics, StreamingOps}

/** R11 observability mapping: listener-fed counters match ingested rows. */
class IngestMetricsSpec extends SparkSpec {

  test("IngestMetrics counts ingested rows across micro-batches") {
    val metrics = new IngestMetrics
    spark.streams.addListener(metrics)
    try {
      val srcDir = java.nio.file.Files.createTempDirectory("msrc")
      val mk = (i: Int) =>
        f"MSG,3,111,$i,MX$i%04d,$i,2026/08/12,14:21:00.000,2026/08/12,14:21:00.100,,$i,,,1.0,2.0,,,0,0,0,0"
      java.nio.file.Files.write(srcDir.resolve("a.txt"),
        (0 until 25).map(mk).mkString("", "\n", "\n").getBytes)
      val q = StreamingOps.writeParquet(
        StreamingOps.ingestFiles(spark, srcDir.toString),
        java.nio.file.Files.createTempDirectory("mout").toString,
        java.nio.file.Files.createTempDirectory("mck").toString)
      // the documented scope step: an UNBOUND listener parks events
      // instead of counting them (a concurrent stream's batches must not
      // inflate the counters), and bind() folds in this query's parked
      // events — batches completing in the start→bind window count
      // exactly once either way (r18 self-review)
      metrics.bind(q.id)
      q.awaitTermination()
      // listener events are delivered asynchronously
      val deadline = System.currentTimeMillis() + 10000
      while (metrics.totalRows < 25 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(metrics.totalRows == 25)
      assert(metrics.batchCount >= 1)
    } finally spark.streams.removeListener(metrics)
  }
}
