package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.FlightTracker
import graft.streaming.FlightTracker.{FlightUpdate, Ping}

/** Custom stateful operator (flatMapGroupsWithState) driven as a stream. */
class FlightTrackerSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2026-08-12 14:$min%02d:$sec%02d")

  test("tracker opens flights, accumulates state, and splits on gaps") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Ping]
    val q = FlightTracker.track(in.toDS())
      .writeStream.format("memory").queryName("flights_out")
      .outputMode("append").start()
    in.addData(
      Ping("A0B1C2", ts(0), Some(42.1), Some(-87.5), Some(37000)),
      Ping("A0B1C2", ts(1), Some(42.2), Some(-87.6), Some(37500)),
      Ping("DEAD01", ts(0, 30), None, None, Some(8000)))
    q.processAllAvailable()
    // 10-min silence for A0B1C2 ⇒ next ping starts a new flight
    in.addData(Ping("A0B1C2", ts(12), Some(43.0), Some(-88.0), Some(12000)))
    q.processAllAvailable()
    q.stop()
    val updates = spark.table("flights_out").as[FlightUpdate].collect()
    val a = updates.filter(_.hex_ident == "A0B1C2")
    assert(a.count(_.event == "flight_started") == 2) // gap split the flights
    val closed = a.filter(_.event == "flight_closed")
    assert(closed.length == 1)
    assert(closed.head.n_msgs == 2 && closed.head.max_alt.contains(37500))
    assert(updates.count(_.hex_ident == "DEAD01") == 1) // started, still open
  }

  test("a stale cross-batch ping from a closed flight is dropped, not " +
       "credited to the current flight") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Ping]
    val q = FlightTracker.track(in.toDS())
      .writeStream.format("memory").queryName("flights_late")
      .outputMode("append").start()
    // flight 1 through 14:00-14:01, then a gap opens flight 2 at 14:12
    in.addData(
      Ping("AAA111", ts(0), None, None, Some(30000)),
      Ping("AAA111", ts(1), None, None, Some(31000)))
    q.processAllAvailable()
    in.addData(Ping("AAA111", ts(12), None, None, Some(12000)))
    q.processAllAvailable()
    // a late ping stamped inside CLOSED flight 1 (14:02): must not count
    // into flight 2, whose window starts 14:12; an in-window late ping
    // (14:10 — within the gap below flight 2's start) must count and
    // extend firstTs downward
    in.addData(
      Ping("AAA111", ts(2), None, None, Some(90000)),
      Ping("AAA111", ts(10), None, None, Some(13000)))
    q.processAllAvailable()
    // close flight 2 via another gap
    in.addData(Ping("AAA111", ts(30), None, None, Some(1000)))
    q.processAllAvailable()
    q.stop()
    val closed = spark.table("flights_late").as[FlightUpdate].collect()
      .filter(u => u.hex_ident == "AAA111" && u.event == "flight_closed")
    assert(closed.length == 2)
    // flight 2: the 14:12 ping + the in-window 14:10 late ping — NOT the
    // stale 14:02 one (whose 90000 alt would leak into max_alt)
    val f2 = closed(1)
    assert(f2.n_msgs == 2, s"stale ping credited: $f2")
    assert(f2.max_alt.contains(13000), s"stale ping's altitude leaked: $f2")
    assert(f2.duration_ms == (ts(12).getTime - ts(10).getTime),
      s"firstTs not extended by the in-window late ping: $f2")
  }

  test("stale-drop gate is anchored at flight creation: an accepted late " +
       "ping must not widen acceptance for even-older pings") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Ping]
    val q = FlightTracker.track(in.toDS())
      .writeStream.format("memory").queryName("flights_anchor")
      .outputMode("append").start()
    // flight 1 at 14:00, then flight 2 anchored at 14:12 (window > 14:07)
    in.addData(Ping("BBB222", ts(0), None, None, Some(30000)))
    q.processAllAvailable()
    in.addData(Ping("BBB222", ts(12), None, None, Some(12000)))
    q.processAllAvailable()
    // the in-window extender arrives FIRST and lowers firstTs to 14:10 —
    // under a firstTs-based gate that would widen the window to > 14:05
    in.addData(Ping("BBB222", ts(10), None, None, Some(13000)))
    q.processAllAvailable()
    // 14:06 is inside the widened window but OUTSIDE the anchor window:
    // same pings in the reverse order would have dropped it, so the
    // anchored gate must drop it too (delivery order must not matter)
    in.addData(Ping("BBB222", ts(6), None, None, Some(90000)))
    q.processAllAvailable()
    in.addData(Ping("BBB222", ts(30), None, None, Some(1000)))
    q.processAllAvailable()
    q.stop()
    val closed = spark.table("flights_anchor").as[FlightUpdate].collect()
      .filter(u => u.hex_ident == "BBB222" && u.event == "flight_closed")
    assert(closed.length == 2)
    val f2 = closed(1)
    assert(f2.n_msgs == 2, s"out-of-anchor-window ping credited: $f2")
    assert(f2.max_alt.contains(13000), s"stale ping's altitude leaked: $f2")
  }
}
