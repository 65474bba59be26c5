package graft.tools

import java.net.ServerSocket
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingOps

/** End-to-end demo of the reference pipeline (R1–R13): replays an SBS-1
  * fixture over a local TCP socket in reference-sized chunks (100 B,
  * P:30), ingests it through the custom DSv2 dump1090 source, parses to
  * typed squitters rows, and appends to parquet with checkpointing.
  *
  * Usage: sbt "runMain graft.tools.SocketIngestDemo [fixture] [outDir]"
  */
object SocketIngestDemo {
  def main(args: Array[String]): Unit = {
    val fixture = args.headOption.getOrElse(
      "/root/repo/src/test/resources/sbs1/batch.txt")
    val outDir = args.lift(1).getOrElse("/tmp/squitters_demo")

    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("dump1090-ingest-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val payload = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(fixture))
    val server = new ServerSocket(0)
    new Thread(() => {
      try {
        val sock = server.accept()
        val out = sock.getOutputStream
        payload.grouped(100).foreach { c => out.write(c); out.flush(); Thread.sleep(5) }
        sock.close()
      } catch { case _: Throwable => }
    }, "dump1090-replay").start()
    println(s"[demo] replaying $fixture on port ${server.getLocalPort}")

    val squitters = StreamingOps.ingestSocket(
      spark, "localhost", server.getLocalPort,
      Map("connectAttemptLimit" -> "0")) // EOF ends the demo stream
    val q = squitters.writeStream.format("parquet")
      .option("path", s"$outDir/data")
      .option("checkpointLocation", s"$outDir/checkpoint")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()

    val expected = new String(payload, StandardCharsets.UTF_8)
      .split("\n").count(l => l.count(_ == ',') == 21)
    val deadline = System.currentTimeMillis() + 30000
    def sunk(): Long =
      try spark.read.parquet(s"$outDir/data").count() catch { case _: Throwable => 0L }
    while (sunk() < expected && System.currentTimeMillis() < deadline)
      Thread.sleep(250)
    q.stop(); server.close()

    val got = spark.read.parquet(s"$outDir/data")
    println(s"[demo] ingested ${got.count()}/$expected squitters rows → $outDir/data")
    got.select("message_type", "transmission_type", "hex_ident", "callsign",
               "altitude", "lat", "lon", "squawk")
      .orderBy("hex_ident", "transmission_type")
      .show(30, truncate = false)
    spark.stop()
  }
}
