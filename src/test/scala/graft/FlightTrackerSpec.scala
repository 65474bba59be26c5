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
}
