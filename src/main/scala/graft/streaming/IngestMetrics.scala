package graft.streaming

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Observability for the ingest pipeline (reference R11,
  * reference-reconstruction/dump1090-stream-parser.py P:45-47, 150-158,
  * 172-178: total/since-commit counters and lifecycle prints).
  *
  * Spark-native mapping: a StreamingQueryListener fed by the engine's own
  * QueryProgressEvent — numInputRows per micro-batch plays the reference's
  * per-commit count, totalRows the lifetime count, and start/termination
  * events the connect/shutdown messages. Attach with
  * `spark.streams.addListener(new IngestMetrics)`.
  */
class IngestMetrics(verbose: Boolean = false) extends StreamingQueryListener {

  private val total = new LongAdder
  private val batches = new LongAdder
  @volatile private var lastBatchRows = 0L

  def totalRows: Long = total.sum()
  def batchCount: Long = batches.sum()
  def lastBatch: Long = lastBatchRows

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    if (verbose) println(s"[ingest] query ${event.name} started (R1 connect analog)")

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val rows = event.progress.numInputRows
    total.add(rows)
    batches.increment()
    lastBatchRows = rows
    if (verbose && rows > 0)
      println(s"[ingest] committed batch ${event.progress.batchId}: " +
        s"$rows rows (total ${total.sum()}) — P:156-158 analog")
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    if (verbose) println(s"[ingest] query terminated; total rows ${total.sum()} (P:172-178 analog)")
}
