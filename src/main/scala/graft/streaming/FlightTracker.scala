package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operator (SURVEY.md §2.4 / spark guide):
  * per-aircraft flight tracking via flatMapGroupsWithState — the state
  * pattern session_window can't express: arbitrary per-key state
  * (message count, time window, max altitude) with explicit emission
  * rules — a FlightUpdate on flight start, on a gap closing a flight,
  * and on idle timeout.
  *
  * Event-time discipline for a lossy feed: pings inside the current
  * flight's window (including LATE ones — t < lastTs is normal under
  * out-of-order delivery) credit the flight and can extend firstTs
  * downward; pings a full gap OLDER than the flight belong to an
  * already-closed flight and are dropped rather than silently credited
  * to the wrong flight (a closed flight's summary was already emitted
  * and cannot be amended under Append output). The stale-drop gate is
  * anchored to the flight's CREATION timestamp (anchorTs, immutable),
  * not the mutable firstTs: gating on firstTs would make acceptance
  * arrival-order dependent — an in-window late ping lowers firstTs and
  * widens the window, so an older ping would be credited if it arrives
  * after the extender but dropped if it arrives before.
  *
  * State is evicted via processing-time timeout — the Spark-native analog
  * of the reference dropping silent aircraft from its working set.
  */
object FlightTracker {

  case class Ping(hex_ident: String, ts: Timestamp,
                  lat: Option[Double], lon: Option[Double],
                  altitude: Option[Int])

  /** `anchorTs` is the ts that created the flight — the fixed reference
    * for the stale-drop gate; `firstTs` can move below it as late
    * in-window pings arrive (duration is measured from firstTs).
    *
    * STATE-SCHEMA COMPATIBILITY: this case class is the
    * flatMapGroupsWithState state encoding. Changing its fields (as the
    * anchorTs addition did) is incompatible with checkpoints written by
    * a previous build — Spark's state-store schema check fails the
    * restarted query. Resume such a query from a fresh checkpoint (the
    * in-flight per-aircraft state is rebuilt from the live feed's next
    * gap cycle); there is no silent-migration path, by design.
    */
  case class FlightState(anchorTs: Long, firstTs: Long, lastTs: Long,
                         nMsgs: Long, maxAlt: Option[Int])

  case class FlightUpdate(hex_ident: String, event: String, n_msgs: Long,
                          duration_ms: Long, max_alt: Option[Int])

  val GapMs: Long = 5 * 60 * 1000

  def update(useIdleTimeout: Boolean)(hex: String, pings: Iterator[Ping],
             state: GroupState[FlightState]): Iterator[FlightUpdate] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(FlightUpdate(hex, "flight_closed", s.nMsgs,
                                   s.lastTs - s.firstTs, s.maxAlt))
    }
    val sorted = pings.toSeq.sortBy(_.ts.getTime)
    var out = Vector.empty[FlightUpdate]
    var s = state.getOption.getOrElse {
      val h = sorted.head
      out :+= FlightUpdate(hex, "flight_started", 0, 0, None)
      FlightState(h.ts.getTime, h.ts.getTime, h.ts.getTime, 0, None)
    }
    sorted.foreach { p =>
      val t = p.ts.getTime
      if (t - s.lastTs >= GapMs) { // gap ⇒ close previous flight, start new
        out :+= FlightUpdate(hex, "flight_closed", s.nMsgs, s.lastTs - s.firstTs, s.maxAlt)
        out :+= FlightUpdate(hex, "flight_started", 0, 0, None)
        s = FlightState(t, t, t, 0, None)
      }
      // a ping a full gap OLDER than this flight belongs to a flight
      // already closed and emitted — crediting it here would silently
      // corrupt this flight's count/duration. Gated on the immutable
      // anchorTs so acceptance never depends on arrival order (class doc)
      if (t > s.anchorTs - GapMs) {
        s = s.copy(
          firstTs = math.min(s.firstTs, t), // late ping can predate the start
          lastTs = math.max(s.lastTs, t),
          nMsgs = s.nMsgs + 1,
          maxAlt = (s.maxAlt ++ p.altitude).reduceOption(_ max _))
      }
    }
    state.update(s)
    if (useIdleTimeout) state.setTimeoutDuration(GapMs)
    out.iterator
  }

  /** Wire the tracker over a (streaming or batch) Dataset[Ping].
    *
    * `idleTimeout = true` evicts silent aircraft via processing-time
    * timeouts — production behavior, but timeout evaluation makes the
    * engine schedule no-data micro-batches continuously, so synchronous
    * tests (processAllAvailable) use the default NoTimeout.
    */
  def track(pings: Dataset[Ping], idleTimeout: Boolean = false): Dataset[FlightUpdate] = {
    implicit val updEnc = Encoders.product[FlightUpdate]
    implicit val stEnc = Encoders.product[FlightState]
    val conf = if (idleTimeout) GroupStateTimeout.ProcessingTimeTimeout()
               else GroupStateTimeout.NoTimeout()
    pings.groupByKey(_.hex_ident)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append(), conf)(update(idleTimeout))
  }
}
