package graft

import org.apache.spark.sql.functions._
import graft.sources.Sbs1

/** Golden + negative tests for the SBS-1 parser (SURVEY.md §5.2-3; FIXTURES.md §1). */
class Sbs1ParserSpec extends SparkSpec {
  import spark.implicits._

  private def parse(lines: String*) =
    Sbs1.parse(lines.toDF("value"), withParsedTime = false)

  private val posLine =
    "MSG,3,111,11111,A0B1C2,111111,2026/08/12,14:21:08.123,2026/08/12,14:21:08.141,,37000,,,42.12345,-87.54321,,,0,0,0,0"
  private val identLine =
    "MSG,1,111,11111,A0B1C2,111111,2026/08/12,14:21:09.005,2026/08/12,14:21:09.020,UAL123  ,,,,,,,,,,,"

  test("airborne position line parses to typed row with NULLs for empties") {
    val r = parse(posLine).first()
    assert(r.getAs[String]("message_type") == "MSG")
    assert(r.getAs[Int]("transmission_type") == 3)
    assert(r.getAs[String]("hex_ident") == "A0B1C2")
    assert(r.getAs[Int]("altitude") == 37000)
    assert(r.getAs[Double]("lat") == 42.12345)
    assert(r.getAs[Double]("lon") == -87.54321)
    // empty fields → NULL, not '' (deliberate divergence, SURVEY.md §1.2)
    assert(r.isNullAt(r.fieldIndex("callsign")))
    assert(r.isNullAt(r.fieldIndex("ground_speed")))
    assert(r.getAs[Int]("is_on_ground") == 0)
  }

  test("callsign keeps trailing spaces; squawk keeps leading zeros") {
    val r = parse(identLine).first()
    assert(r.getAs[String]("callsign") == "UAL123  ")
    val sq = parse(
      "MSG,6,111,1,AB34CD,1,2026/08/12,14:21:10.001,2026/08/12,14:21:10.018,,,,,,,,0421,1,1,0,0").first()
    assert(sq.getAs[String]("squawk") == "0421")
  }

  test("invalid field counts are dropped (R5), valid ones kept") {
    val df = parse("MSG,3,111", posLine, "", identLine + ",extra")
    assert(df.count() == 1)
  }

  test("a disconnect-truncated line with 22 fields by coincidence is " +
       "still rejected (TruncationTag beats the arity check)") {
    // cut posLine mid-last-field: still 21 commas, so arity alone would
    // accept it with is_on_ground silently truncated — the source's tag
    // makes the quarantine unforgeable
    val truncated = posLine.dropRight(1) + Sbs1.TruncationTag
    assert(truncated.count(_ == ',') == 21)
    assert(parse(truncated).count() == 0)
    val corrupt = Sbs1.parsePermissive(Seq(truncated).toDF("value"))
      .filter(col("corrupt_record").isNotNull).collect()
    assert(corrupt.length == 1) // permissive mode quarantines, not drops
  }

  test("malformed numeric fields null out instead of failing (ANSI-safe)") {
    val bad = posLine.replace("37000", "not_a_number")
    val r = parse(bad).first()
    assert(r.isNullAt(r.fieldIndex("altitude")))
    assert(r.getAs[Double]("lat") == 42.12345) // rest of the row survives
  }

  test("parsePermissive surfaces corrupt lines with the raw text") {
    val df = Sbs1.parsePermissive(Seq("MSG,3,111", posLine).toDF("value"))
    val corrupt = df.filter(col("corrupt_record").isNotNull).collect()
    assert(corrupt.length == 1)
    assert(corrupt.head.getAs[String]("corrupt_record") == "MSG,3,111")
  }

  test("event_time derives from generated date+time at ms precision") {
    val t = parse(posLine).withColumn("event_time", Sbs1.eventTime)
      .select(date_format(col("event_time"), "yyyy-MM-dd HH:mm:ss.SSS"))
      .first().getString(0)
    assert(t == "2026-08-12 14:21:08.123")
  }

  test("event_time: a garbled or absent date/time yields NULL, not an " +
       "ANSI parse failure that kills the stream (r18 self-review)") {
    // empty generated_date → fields TRY-cast to NULL, but concat_ws
    // SKIPS nulls: the timestamp parser sees the bare time (and for the
    // garbled line, junk) — both must yield one NULL event_time
    val noDate = "MSG,3,111,11111,A0B1C2,111111,,14:21:08.123," +
      "2026/08/12,14:21:08.141,,37000,,,42.1,-87.5,,,0,0,0,0"
    val garbled = "MSG,3,111,11111,A0B1C2,111111,2026/XX/12,junk," +
      "2026/08/12,14:21:08.141,,37000,,,42.1,-87.5,,,0,0,0,0"
    val rows = parse(noDate, garbled).withColumn("event_time", Sbs1.eventTime)
      .select("event_time").collect()
    assert(rows.length == 2)
    rows.foreach(r => assert(r.isNullAt(0), r.toString))
    // and a well-formed line still parses (the happy path is untouched)
    val ok = parse(posLine).withColumn("event_time", Sbs1.eventTime)
      .filter(col("event_time").isNotNull).count()
    assert(ok == 1L)
  }

  test("typed Dataset[Squitter] round-trips the parsed rows") {
    val ds = Sbs1.typed(parse(posLine, identLine))
    val rows = ds.collect().sortBy(_.transmission_type)
    assert(rows.length == 2)
    assert(rows.head.callsign.contains("UAL123  "))
    assert(rows.last.lat.contains(42.12345))
    assert(rows.last.callsign.isEmpty) // NULL → None in the typed view
    // typed filter compiles against fields, not strings
    assert(ds.filter(_.altitude.exists(_ > 30000)).count() == 1)
  }

  test("parsed_time enrichment appends processing time (R6)") {
    val df = Sbs1.parse(Seq(posLine).toDF("value"))
    assert(df.schema.fieldNames.last == "parsed_time")
    assert(df.filter(col("parsed_time").isNotNull).count() == 1)
  }
}
