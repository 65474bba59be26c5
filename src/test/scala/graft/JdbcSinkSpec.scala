package graft

import java.io.OutputStream
import java.net.ServerSocket
import java.nio.charset.StandardCharsets

import graft.streaming.{StreamingOps, TransactionalJdbcSink}
import graft.tools.Dump1090StreamParser

/** The transactional embedded-database sink (R7/R9/R10 analog) and the CLI
  * entry point that drives it — restart-without-duplicates is the whole
  * point of the commit-log claim, so that is what gets pinned.
  */
class JdbcSinkSpec extends SparkSpec {

  private def count(url: String, table: String = "squitters"): Long = {
    val conn = TransactionalJdbcSink.connect(url)
    try {
      val rs = conn.createStatement().executeQuery(s"SELECT count(*) FROM $table")
      rs.next(); rs.getLong(1)
    } finally conn.close()
  }

  private val mk = (i: Int) =>
    f"MSG,3,111,$i,HX$i%04d,$i,2026/08/12,14:21:${i % 60}%02d.000,2026/08/12,14:21:${i % 60}%02d.100,,$i,,,1.0,2.0,,,0,0,0,0"

  test("restart from checkpoint writes no duplicate rows into Derby (R9/R10)") {
    val srcDir = java.nio.file.Files.createTempDirectory("jdbcsrc")
    val ckpt = java.nio.file.Files.createTempDirectory("jdbcck").toString
    val db = java.nio.file.Files.createTempDirectory("jdbcdb").toString + "/adsb.db"
    val url = Dump1090StreamParser.jdbcUrl(db)
    java.nio.file.Files.write(srcDir.resolve("a.txt"),
      (0 until 20).map(mk).mkString("", "\n", "\n").getBytes)
    def runOnce(): Unit = {
      val q = TransactionalJdbcSink.sink(
        StreamingOps.ingestFiles(spark, srcDir.toString),
        url, "squitters", batchSize = 7, checkpoint = ckpt)
      q.awaitTermination()
    }
    runOnce()
    assert(count(url) == 20)
    runOnce() // replay with nothing new — the claims make it a no-op
    assert(count(url) == 20)
    java.nio.file.Files.write(srcDir.resolve("b.txt"),
      (20 until 30).map(mk).mkString("", "\n", "\n").getBytes)
    runOnce() // restart — must append ONLY the new file's rows
    assert(count(url) == 30)
    val conn = TransactionalJdbcSink.connect(url)
    try {
      val rs = conn.createStatement()
        .executeQuery("SELECT count(DISTINCT hex_ident) FROM squitters")
      rs.next(); assert(rs.getLong(1) == 30)
    } finally conn.close()
  }

  test("a replayed micro-batch is skipped via the commit-log claim") {
    import spark.implicits._
    val db = ":memory:"
    val url = Dump1090StreamParser.jdbcUrl(db)
    val batch = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "s")
    TransactionalJdbcSink.ensureTables(url, "t1", batch.schema)
    TransactionalJdbcSink.writeBatch(batch, 7L, url, "t1", batchSize = 2)
    TransactionalJdbcSink.writeBatch(batch, 7L, url, "t1", batchSize = 2) // replay
    TransactionalJdbcSink.writeBatch(batch, 8L, url, "t1", batchSize = 2) // new epoch
    assert(count(url, "t1") == 6)
  }

  test("CLI pipeline e2e: argparse surface → socket → Derby squitters") {
    val cfg = Dump1090StreamParser.parseArgs(Seq(
      "--location=localhost", "-p", "0", "--buffer-size", "64",
      "--batch-size", "5", "--connect-attempt-limit", "0",
      "--connect-attempt-delay", "0.1"))
    assert(cfg.location == "localhost" && cfg.bufferSize == 64 &&
      cfg.batchSize == 5 && cfg.connectAttemptLimit == 0 &&
      cfg.connectAttemptDelay == 0.1 && cfg.database == "adsb_messages.db")

    val lines = (0 until 40).map(mk)
    val server = new ServerSocket(0)
    new Thread(() => {
      try {
        val sock = server.accept()
        val out: OutputStream = sock.getOutputStream
        lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8)
          .grouped(53).foreach { c => out.write(c); out.flush(); Thread.sleep(2) }
        out.flush(); sock.close()
      } catch { case _: Throwable => }
    }, "cli-test-server").start()
    val db = java.nio.file.Files.createTempDirectory("clidb").toString + "/adsb.db"
    try {
      val q = Dump1090StreamParser.run(spark, cfg.copy(
          port = server.getLocalPort, database = db,
          checkpoint = Some(java.nio.file.Files.createTempDirectory("click").toString)),
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      val url = Dump1090StreamParser.jdbcUrl(db)
      val deadline = System.currentTimeMillis() + 30000
      def sunk(): Long = try count(url) catch { case _: Throwable => 0L }
      while (sunk() < lines.length && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      q.stop()
      assert(sunk() == lines.length)
      val conn = TransactionalJdbcSink.connect(url)
      try {
        val rs = conn.createStatement().executeQuery(
          "SELECT count(*) FROM squitters WHERE parsed_time IS NOT NULL AND altitude >= 0")
        rs.next(); assert(rs.getLong(1) == lines.length)
      } finally conn.close()
    } finally server.close()
  }
}
