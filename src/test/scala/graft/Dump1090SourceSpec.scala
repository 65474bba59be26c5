package graft

import java.io.OutputStream
import java.net.ServerSocket
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** End-to-end test of the custom DSv2 dump1090 source (SURVEY.md §7.4):
  * a local TCP server replays SBS-1 lines in deliberately awkward chunks
  * (mid-line splits, CRLF, multi-line chunks) and the streaming query must
  * recover every record exactly once.
  */
class Dump1090SourceSpec extends SparkSpec {

  private val lines = (0 until 50).map { i =>
    f"MSG,3,111,$i%05d,HEX$i%03d,$i,2026/08/12,14:21:$i%02.0f.000,2026/08/12,14:21:$i%02.0f.100,,${30000 + i},,,42.0,-87.0,,,0,0,0,0"
  }

  /** Serve the payload in fixed-size chunks then close (EOF). */
  private def serve(payload: Array[Byte], chunk: Int): ServerSocket = {
    val server = new ServerSocket(0)
    new Thread(() => {
      try {
        val sock = server.accept()
        val out: OutputStream = sock.getOutputStream
        payload.grouped(chunk).foreach { c => out.write(c); out.flush(); Thread.sleep(2) }
        out.flush(); sock.close()
      } catch { case _: Throwable => }
    }, "sbs1-test-server").start()
    server
  }

  test("socket ingest frames chunk-split lines and never merges records") {
    val payload = lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8)
    val server = serve(payload, chunk = 37) // prime size → splits mid-line
    val out = java.nio.file.Files.createTempDirectory("d1090out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("d1090ckpt").toString
    try {
      val stream = spark.readStream
        .format("graft.sources.Dump1090TableProvider")
        .option("host", "localhost")
        .option("port", server.getLocalPort)
        .option("bufferSize", 100)          // reference default (P:30)
        .option("connectAttemptLimit", 0)   // EOF ⇒ exhausted (test mode)
        .load()
      val q = stream.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime("100 milliseconds"))
        .start()
      // wait until all lines surfaced in the sink
      val deadline = System.currentTimeMillis() + 30000
      def sunk(): Long =
        try spark.read.parquet(out).count() catch { case _: Throwable => 0L }
      while (sunk() < lines.length && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      q.stop()
      val got = spark.read.parquet(out).select("value").collect().map(_.getString(0))
      assert(got.length == lines.length, s"expected ${lines.length} rows, got ${got.length}")
      assert(got.sorted.toSeq == lines.sorted)
    } finally server.close()
  }

  test("parsed stream yields typed squitters rows") {
    val payload = lines.take(10).mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8)
    val server = serve(payload, chunk = 64)
    try {
      val df = graft.streaming.StreamingOps.ingestSocket(
        spark, "localhost", server.getLocalPort,
        Map("connectAttemptLimit" -> "0"))
      val q = df.writeStream.format("memory").queryName("squitters_mem")
        .trigger(Trigger.ProcessingTime("100 milliseconds"))
        .start()
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table("squitters_mem").count() < 10 &&
             System.currentTimeMillis() < deadline) Thread.sleep(200)
      q.stop()
      val rows = spark.table("squitters_mem")
      assert(rows.count() == 10)
      assert(rows.filter(col("altitude") >= 30000).count() == 10)
      assert(rows.filter(col("parsed_time").isNotNull).count() == 10)
    } finally server.close()
  }

  test("a large catch-up batch splits into multiple input partitions") {
    val payload = lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8)
    val server = serve(payload, chunk = 512)
    try {
      val stream = new graft.sources.Dump1090MicroBatchStream(
        "localhost", server.getLocalPort, 100,
        connectAttemptLimit = 0, connectAttemptDelayMs = 50,
        maxLinesPerPartition = 20)
      val deadline = System.currentTimeMillis() + 10000
      def latest() = stream.latestOffset()
        .asInstanceOf[graft.sources.LineOffset].offset
      while (latest() < lines.length && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(latest() == lines.length)
      val parts = stream.planInputPartitions(
        graft.sources.LineOffset(0), graft.sources.LineOffset(latest()))
      assert(parts.length == 3, s"expected ceil(50/20)=3, got ${parts.length}")
      stream.stop()
    } finally server.close()
  }

  test("a multi-byte UTF-8 char split across socket chunks decodes intact") {
    // chunk=1 forces EVERY multi-byte sequence to straddle a read boundary;
    // per-chunk decoding would corrupt each into replacement characters
    val utf8Lines = Seq("MSG,3,héllo,ü", "MSG,4,日本,語", "MSG,5,plain")
    val payload = utf8Lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8)
    val server = serve(payload, chunk = 1)
    try {
      val stream = new graft.sources.Dump1090MicroBatchStream(
        "localhost", server.getLocalPort, 1,
        connectAttemptLimit = 0, connectAttemptDelayMs = 50)
      val deadline = System.currentTimeMillis() + 15000
      def latest() = stream.latestOffset()
        .asInstanceOf[graft.sources.LineOffset].offset
      while (latest() < utf8Lines.length && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(latest() == utf8Lines.length)
      val got = stream.planInputPartitions(
          graft.sources.LineOffset(0), graft.sources.LineOffset(latest()))
        .flatMap(_.asInstanceOf[graft.sources.Dump1090Partition].rows)
      assert(got.toSeq == utf8Lines, got.mkString("|"))
      stream.stop()
    } finally server.close()
  }

  test("a dropped connection's incomplete UTF-8 tail never fuses with the " +
       "next connection's bytes, and the truncated record ends at EOF") {
    // conn 1 ends mid-character (first 2 bytes of 3-byte 日); conn 2 opens
    // with exactly the byte that would COMPLETE it. Carrying the stale
    // tail across the reconnect would decode a silently valid 日 out of
    // two unrelated connections; instead the tail flushes to replacement
    // chars at EOF AND the truncated partial is framed as its own record,
    // so conn 2's first message ("�X" — its lone continuation byte decodes
    // to a replacement char of its own) arrives as a clean separate line.
    val ch = "日".getBytes(StandardCharsets.UTF_8)
    val p1 = "LINE1\n".getBytes(StandardCharsets.UTF_8) ++ ch.take(2)
    val p2 = ch.drop(2) ++ "X\n".getBytes(StandardCharsets.UTF_8)
    val server = new ServerSocket(0)
    new Thread(() => {
      try Seq(p1, p2).foreach { p =>
        val sock = server.accept()
        sock.getOutputStream.write(p); sock.getOutputStream.flush()
        Thread.sleep(20); sock.close()
      } catch { case _: Throwable => }
    }, "sbs1-reconnect-server").start()
    try {
      val stream = new graft.sources.Dump1090MicroBatchStream(
        "localhost", server.getLocalPort, 100,
        connectAttemptLimit = 2, connectAttemptDelayMs = 50)
      val deadline = System.currentTimeMillis() + 15000
      def latest() = stream.latestOffset()
        .asInstanceOf[graft.sources.LineOffset].offset
      while (latest() < 3 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(latest() == 3)
      val got = stream.planInputPartitions(
          graft.sources.LineOffset(0), graft.sources.LineOffset(latest()))
        .flatMap(_.asInstanceOf[graft.sources.Dump1090Partition].rows)
      assert(got.head == "LINE1")
      // record 2: conn 1's truncated tail alone — replacement chars plus
      // the truncation tag (the unforgeable "this record was cut by a
      // disconnect" marker the validity predicate rejects on)
      assert(!got(1).contains("日"), s"stale bytes fused across reconnect: ${got(1)}")
      assert(got(1).last == graft.sources.Sbs1.TruncationTag,
        s"truncated record not tagged: ${got(1)}")
      assert(got(1).dropRight(1).forall(_ == '�'),
        s"truncated record not isolated: ${got(1)}")
      // record 3: conn 2's first message, uncontaminated by conn 1
      assert(got(2).endsWith("X") && !got(2).contains("日"), got(2))
      stream.stop()
    } finally server.close()
  }

  test("buffer is bounded: reader parks at maxBufferedLines until commit") {
    val payload = lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8)
    val server = serve(payload, chunk = 512)
    try {
      val stream = new graft.sources.Dump1090MicroBatchStream(
        "localhost", server.getLocalPort, 100,
        connectAttemptLimit = 0, connectAttemptDelayMs = 50,
        maxBufferedLines = 10)
      def latest() = stream.latestOffset()
        .asInstanceOf[graft.sources.LineOffset].offset
      var committed = 0L
      val deadline = System.currentTimeMillis() + 15000
      while (committed < lines.length && System.currentTimeMillis() < deadline) {
        val l = latest()
        assert(l - committed <= 10, s"buffer exceeded bound: ${l - committed}")
        if (l > committed) {
          // consume-then-commit drains the bound and wakes the reader
          stream.planInputPartitions(
            graft.sources.LineOffset(committed), graft.sources.LineOffset(l))
          stream.commit(graft.sources.LineOffset(l))
          committed = l
        } else Thread.sleep(20)
      }
      assert(committed == lines.length,
        s"only $committed of ${lines.length} lines drained through the bound")
      stream.stop()
    } finally server.close()
  }

  test("maxLinesPerTrigger bounds each micro-batch (admission control)") {
    import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxRows}
    val payload = lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8)
    val server = serve(payload, chunk = 512)
    try {
      val stream = new graft.sources.Dump1090MicroBatchStream(
        "localhost", server.getLocalPort, 100,
        connectAttemptLimit = 0, connectAttemptDelayMs = 50,
        maxLinesPerTrigger = Some(10L))
      assert(stream.getDefaultReadLimit.isInstanceOf[ReadMaxRows])
      def latest() = stream.latestOffset()
        .asInstanceOf[graft.sources.LineOffset].offset
      val deadline = System.currentTimeMillis() + 10000
      while (latest() < lines.length && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      // a 50-line backlog drains in capped epochs, not one giant batch
      assert(stream.latestOffset(graft.sources.LineOffset(0),
        ReadLimit.maxRows(10)) == graft.sources.LineOffset(10))
      assert(stream.latestOffset(graft.sources.LineOffset(10),
        ReadLimit.maxRows(10)) == graft.sources.LineOffset(20))
      stream.stop()
    } finally server.close()
  }

  test("offsets from a previous process fail fast instead of serving wrong data") {
    val dead = { val s = new ServerSocket(0); val p = s.getLocalPort; s.close(); p }
    val stream = new graft.sources.Dump1090MicroBatchStream(
      "localhost", dead, 100, connectAttemptLimit = 0, connectAttemptDelayMs = 50)
    // simulate recovery: the checkpoint says epoch [5,10) but this fresh
    // process never buffered those lines
    val e = intercept[IllegalStateException] {
      stream.planInputPartitions(
        graft.sources.LineOffset(5), graft.sources.LineOffset(10))
    }
    assert(e.getMessage.contains("non-replayable"), e.getMessage)
    stream.stop()
  }

  test("spill log replays a dead process's uncommitted epochs across restart") {
    val payload = lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8)
    val server = serve(payload, chunk = 256)
    val spillDir = java.nio.file.Files.createTempDirectory("spill")
      .toString + "/graft-lines"
    def deadPort = {
      val s = new ServerSocket(0); val p = s.getLocalPort; s.close(); p
    }
    try {
      // process A: buffers all 50 lines, source-commits [0,20); epoch
      // [20,50) is checkpoint-referenced but NOT source-committed when A
      // dies
      val a = new graft.sources.Dump1090MicroBatchStream(
        "localhost", server.getLocalPort, 100,
        connectAttemptLimit = 0, connectAttemptDelayMs = 50,
        spillDir = Some(spillDir))
      def latest() = a.latestOffset()
        .asInstanceOf[graft.sources.LineOffset].offset
      val deadline = System.currentTimeMillis() + 10000
      while (latest() < lines.length && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(latest() == lines.length)
      val served = a.planInputPartitions(
          graft.sources.LineOffset(20), graft.sources.LineOffset(50))
        .flatMap(_.asInstanceOf[graft.sources.Dump1090Partition].rows).toSeq
      a.commit(graft.sources.LineOffset(20))
      a.stop()

      // process B: same checkpoint slot, dead socket — the in-flight range
      // must replay with the SAME lines, from the spill log alone
      val b = new graft.sources.Dump1090MicroBatchStream(
        "localhost", deadPort, 100,
        connectAttemptLimit = 0, connectAttemptDelayMs = 50,
        spillDir = Some(spillDir))
      val replayed = b.planInputPartitions(
          graft.sources.LineOffset(20), graft.sources.LineOffset(50))
        .flatMap(_.asInstanceOf[graft.sources.Dump1090Partition].rows).toSeq
      assert(replayed == served)
      assert(replayed == lines.drop(20))
      // below the committed watermark still fails fast — that data is gone
      // by contract, never silently re-served
      val e = intercept[IllegalStateException] {
        b.planInputPartitions(
          graft.sources.LineOffset(0), graft.sources.LineOffset(20))
      }
      assert(e.getMessage.contains("non-replayable"), e.getMessage)
      b.commit(graft.sources.LineOffset(50))
      b.stop()

      // process C: everything committed — recovery lands exactly at the
      // watermark with an empty buffer (no stale files, no offset reset)
      val c = new graft.sources.Dump1090MicroBatchStream(
        "localhost", deadPort, 100,
        connectAttemptLimit = 0, connectAttemptDelayMs = 50,
        spillDir = Some(spillDir))
      assert(c.latestOffset()
        .asInstanceOf[graft.sources.LineOffset].offset == 50)
      c.stop()
    } finally server.close()
  }

  test("spill log: rolls files, trims on commit, and drops a torn tail") {
    val dir = java.nio.file.Files.createTempDirectory("spilllog").toString
    val log = new graft.sources.LineSpillLog(dir, rollEvery = 4)
    // per-line appends (the socket feed's shape) → files roll at 4 lines:
    // [0,4) [4,8) [8,10)
    (0 until 10).foreach(i => log.append(Seq(s"line$i")))
    log.commit(5)                                   // [0,4) fully covered → gone
    log.close()
    val names = new java.io.File(dir).list().filter(_.endsWith(".log")).sorted.toSeq
    assert(!names.contains("00000000000000000000.log"), names)
    assert(names.size == 2, names)
    // simulate a crash tearing the last write: garbage with no newline
    val active = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".log")).maxBy(_.getName)
    java.nio.file.Files.write(active.toPath, "torn-fragm".getBytes,
      java.nio.file.StandardOpenOption.APPEND)
    // a new process recovers only the uncommitted, fully-terminated lines
    val (base, recovered) = new graft.sources.LineSpillLog(dir).recover()
    assert(base == 5)
    assert(recovered.toSeq == (5 until 10).map(i => s"line$i"), recovered)
  }

  test("spill log: a crash inside commit's rename window never loses replay data") {
    def freshLog(lines: Int): String = {
      val dir = java.nio.file.Files.createTempDirectory("spillwm").toString
      val log = new graft.sources.LineSpillLog(dir, rollEvery = 4)
      (0 until lines).foreach(i => log.append(Seq(s"line$i")))
      log.commit(5) // watermark 5; files [0,4) dropped, [4,8) [8,10) live
      log.close()
      dir
    }
    def write(dir: String, name: String, content: String): Unit =
      java.nio.file.Files.write(new java.io.File(dir, name).toPath,
        content.getBytes)
    def delete(dir: String, name: String): Unit =
      new java.io.File(dir, name).delete()

    // window 1: tmp fully written, `committed` replaced by nothing yet
    // (non-atomic platform rename tore delete-from-rename). The tmp marker
    // holds the engine-committed watermark → honored, files [4,8) dropped.
    val d1 = freshLog(10)
    delete(d1, "committed")
    write(d1, "committed.tmp", "8")
    val (b1, r1) = new graft.sources.LineSpillLog(d1).recover()
    assert(b1 == 8)
    assert(r1.toSeq == Seq("line8", "line9"), r1)

    // window 2: NO marker survived at all. The old behavior read
    // watermark 0, saw file 00000000000000000004.log's start as a gap and
    // deleted every log file — bricking the checkpoint. Now the watermark
    // is inferred from the lowest surviving file and everything on disk
    // replays (the sink's claims dedupe the widened range).
    val d2 = freshLog(10)
    delete(d2, "committed")
    val (b2, r2) = new graft.sources.LineSpillLog(d2).recover()
    assert(b2 == 4)
    assert(r2.toSeq == (4 until 10).map(i => s"line$i"), r2)

    // window 3: `committed` itself torn mid-write (empty) and a whole tmp
    // exists — torn marker reads as absent, tmp wins
    val d3 = freshLog(10)
    write(d3, "committed", "")
    write(d3, "committed.tmp", "8")
    val (b3, r3) = new graft.sources.LineSpillLog(d3).recover()
    assert(b3 == 8)
    assert(r3.toSeq == Seq("line8", "line9"), r3)
  }

  test("a LOST spill log fails replay fast even after the new " +
       "connection outgrows the replayed range (r18 self-review)") {
    val payload = lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8)
    val serverA = serve(payload, chunk = 256)
    val spillDir = java.nio.file.Files.createTempDirectory("spill-lost")
      .toString + "/graft-lines"
    try {
      // process A: frames all 50 lines, plans epoch [20,50), dies
      val a = new graft.sources.Dump1090MicroBatchStream(
        "localhost", serverA.getLocalPort, 100,
        connectAttemptLimit = 0, connectAttemptDelayMs = 50,
        spillDir = Some(spillDir))
      def latestA() = a.latestOffset()
        .asInstanceOf[graft.sources.LineOffset].offset
      val deadline = System.currentTimeMillis() + 10000
      while (latestA() < lines.length && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(latestA() == lines.length)
      a.planInputPartitions(
        graft.sources.LineOffset(20), graft.sources.LineOffset(50))
      a.stop()

      // the spill log is DELETED: the replay state is gone
      val dir = new java.io.File(spillDir)
      Option(dir.listFiles).foreach(_.foreach(_.delete()))
      assert(dir.delete() || !dir.exists())

      // process B: same checkpoint slot, LIVE feed — by the time replay
      // plans, the NEW connection has framed past the replayed range, so
      // the buffer-length guard alone would serve NEW lines under OLD
      // offsets. The issued-offset high-water must fail it regardless.
      val serverB = serve(payload, chunk = 256)
      val b = new graft.sources.Dump1090MicroBatchStream(
        "localhost", serverB.getLocalPort, 100,
        connectAttemptLimit = 0, connectAttemptDelayMs = 50,
        spillDir = Some(spillDir))
      try {
        // wait through the SPILL LOG, not latestOffset: the engine's
        // replay call precedes any offset poll on restart, and polling
        // offsets here would legitimately issue them
        def spilled(): Long = {
          val fs = Option(new java.io.File(spillDir).listFiles)
            .getOrElse(Array.empty[java.io.File])
            .filter(_.getName.endsWith(".log"))
          fs.map(f => new String(
            java.nio.file.Files.readAllBytes(f.toPath),
            StandardCharsets.UTF_8).count(_ == '\n').toLong).sum
        }
        val dl2 = System.currentTimeMillis() + 10000
        while (spilled() < lines.length &&
               System.currentTimeMillis() < dl2)
          Thread.sleep(50)
        assert(spilled() >= 50, s"feed only framed ${spilled()} lines")
        val e = intercept[IllegalStateException] {
          b.planInputPartitions(
            graft.sources.LineOffset(20), graft.sources.LineOffset(50))
        }
        assert(e.getMessage.contains("non-replayable"), e.getMessage)
      } finally { b.stop(); serverB.close() }
    } finally serverA.close()
  }

  test("connect retry budget exhausts against a dead port (R2, P:98-99)") {
    val dead = { val s = new ServerSocket(0); val p = s.getLocalPort; s.close(); p }
    val stream = new graft.sources.Dump1090MicroBatchStream(
      "localhost", dead, 100, connectAttemptLimit = 2, connectAttemptDelayMs = 50)
    val deadline = System.currentTimeMillis() + 10000
    while (!stream.isExhausted && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(stream.isExhausted)
    stream.stop()
  }
}
