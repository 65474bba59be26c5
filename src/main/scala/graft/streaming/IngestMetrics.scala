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
  *
  * Two counting rules, both load-bearing:
  *  - listeners are SESSION-wide, so `forQuery` scopes the counters to one
  *    query id (set it via [[bind]] after start()) — a second concurrent
  *    stream on the session would otherwise silently inflate the totals;
  *  - zero-row progress events (the engine schedules no-data micro-batches
  *    continuously when any state op uses processing-time timeouts) don't
  *    count as commits: lastBatch holds the last DATA batch's size instead
  *    of clobbering back to 0, and batchCount counts data batches.
  */
class IngestMetrics(verbose: Boolean = false,
                    @volatile private var forQuery: Option[java.util.UUID] = None)
  extends StreamingQueryListener {

  private val total = new LongAdder
  private val batches = new LongAdder
  @volatile private var lastBatchRows = 0L

  def totalRows: Long = total.sum()
  def batchCount: Long = batches.sum()
  def lastBatch: Long = lastBatchRows

  /** Progress events arriving BEFORE [[bind]] park here per query id:
    * counting them unconditionally would let a CONCURRENT stream's
    * batches inflate the counters (the exact inflation `forQuery` exists
    * to prevent), while dropping them would undercount this stream's own
    * early batches in the addListener→start→bind window. On bind, the
    * bound query's parked events fold in (in arrival order) and the rest
    * drop (r18 self-review). Bounded: only the pre-bind window parks. */
  private val pending =
    new java.util.concurrent.ConcurrentLinkedQueue[(java.util.UUID, Long)]()

  /** Scope the counters to one query (call with `query.id` after start). */
  def bind(queryId: java.util.UUID): Unit = synchronized {
    forQuery = Some(queryId)
    var e = pending.poll()
    while (e != null) {
      if (e._1 == queryId) count(e._2)
      e = pending.poll()
    }
  }

  private def mine(id: java.util.UUID): Boolean = forQuery.forall(_ == id)

  private def count(rows: Long): Unit = {
    total.add(rows)
    if (rows > 0) {
      batches.increment()
      lastBatchRows = rows
    }
  }

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    if (verbose && mine(event.id))
      println(s"[ingest] query ${event.name} started (R1 connect analog)")

  override def onQueryProgress(event: QueryProgressEvent): Unit = synchronized {
    val rows = event.progress.numInputRows
    forQuery match {
      case Some(id) =>
        if (event.progress.id == id) {
          count(rows)
          if (verbose && rows > 0)
            println(s"[ingest] committed batch ${event.progress.batchId}: " +
              s"$rows rows (total ${total.sum()}) — P:156-158 analog")
        }
      case None => pending.add((event.progress.id, rows)): Unit
    }
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    if (verbose && mine(event.id))
      println(s"[ingest] query terminated; total rows ${total.sum()} (P:172-178 analog)")
}
