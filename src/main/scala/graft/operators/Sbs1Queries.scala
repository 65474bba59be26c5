package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.sources.Sbs1

/** SBS-1 queries: the reference-domain surface (SURVEY.md §2.4 s_ingest's
  * batch twin, plus flight analytics over parsed squitters).
  *
  * q_sbs1_parse is oracle-checked against DuckDB's read_csv of the same
  * fixture (empty→NULL agrees with the engine's normalization — verified:
  * DuckDB nulls empty VARCHAR fields and preserves callsign padding).
  *
  * The s_* keys return the same unresolved plans the streaming variants
  * run under readStream (no oracle — covered by StreamingSpec); they're in
  * `queries` so t1/bench exercise them.
  */
object Sbs1Queries {

  type Q = (SparkSession, String) => DataFrame

  /** Driver-independent fixture (repo-internal, sf-invariant). Resolved
    * against the working directory (every entry point — sbt, the driver
    * mains — runs from the repo root), overridable for a checkout the
    * query process does not start from; a hardcoded absolute path broke
    * every other checkout location (r18 self-review). */
  val FixturePath: String = sys.env.getOrElse("SPARK_GRAFT_SBS1_FIXTURE",
    new java.io.File("src/test/resources/sbs1/batch.txt").getAbsolutePath)

  private def parsed(s: SparkSession): DataFrame =
    Sbs1.parse(s.read.text(FixturePath), withParsedTime = false)

  def queries: Map[String, Q] = Map(
    // sorted by EVERY parsed field (the s_ingest_sbs1 rule): a
    // two-field sort key left tie order engine-defined, so two lines
    // sharing (generated_time, message_type) would hash-flake
    // (r18 self-review)
    "q_sbs1_parse" -> ((s, _) =>
      parsed(s)
        .withColumn("event_time", Sbs1.eventTime)
        .orderBy(Sbs1.Fields.map { case (n, _) =>
          col(n).asc_nulls_first }: _*)),

    // Flight analytics over the parsed feed: messages per aircraft by type
    // (the "flights-per-aircraft" domain query, SURVEY.md §2.1 R14).
    "q_sbs1_aircraft_stats" -> ((s, _) =>
      parsed(s)
        .groupBy("hex_ident")
        .agg(count(lit(1)).as("n_msgs"),
             count(col("callsign")).as("n_callsign_msgs"),
             max(col("altitude")).cast("int").as("max_alt"),
             count(col("lat")).as("n_positions"))
        .orderBy(col("hex_ident").asc_nulls_first)),

    // Coverage-map grid density — the receiver-dashboard query every
    // ADS-B site runs: positions bucketed to 0.1°×0.1° cells (map-side
    // integer floor on the scaled coordinates — no distinct-values pass),
    // messages + distinct aircraft + ceiling per cell. One keyed
    // aggregation; the cell space is bounded (≤ 6.48M cells globally) so
    // the result stays dashboard-sized at any ingest volume.
    "q_sbs1_grid" -> ((s, _) =>
      parsed(s)
        .filter(col("lat").isNotNull && col("lon").isNotNull)
        .groupBy(floor(col("lat") * 10).cast("long").as("lat_cell"),
                 floor(col("lon") * 10).cast("long").as("lon_cell"))
        .agg(count(lit(1)).as("n_msgs"),
             count_distinct(col("hex_ident")).as("n_aircraft"),
             max(col("altitude")).cast("int").as("max_alt"))
        .orderBy("lat_cell", "lon_cell")),

    // Position-jump data-quality screen — see [[jumpReport]]
    "q_sbs1_jumps" -> ((s, _) =>
      jumpReport(parsed(s).withColumn("ems", unix_millis(Sbs1.eventTime)))),

    // Flight sessionization — the domain's core analytic: a "flight" is a
    // burst of squitters per aircraft separated by >5 min of silence
    // (SURVEY.md §2.1 R14 / §2.4 s_session_stream rationale). Batch twin of
    // StreamingOps.sessionize over the parsed fixture, oracle-checked via
    // gaps-and-islands on epoch-ms event time.
    "q_sbs1_flights" -> ((s, _) => {
      import org.apache.spark.sql.expressions.Window
      val e = parsed(s)
        .withColumn("ems", unix_millis(Sbs1.eventTime))
        // null ems excluded like jumpReport: Spark windows order NULLS
        // FIRST, DuckDB NULLS LAST — an un-timestamped squitter would
        // sessionize divergently on the two engines (r18 self-review)
        .filter(col("hex_ident").isNotNull && col("ems").isNotNull)
      val w = Window.partitionBy("hex_ident").orderBy("ems")
      val newFlight = when(
        col("ems") - lag("ems", 1).over(w) >= 300000 ||
          lag("ems", 1).over(w).isNull, 1).otherwise(0)
      e.withColumn("fid", sum(newFlight)
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("hex_ident", "fid")
        .agg(min("ems").as("s_ms"), max("ems").as("e_ms"),
             count(lit(1)).as("n_msgs"),
             max(col("altitude")).cast("int").as("max_alt"))
        .select("hex_ident", "fid", "s_ms", "e_ms", "n_msgs", "max_alt")
        .orderBy("hex_ident", "fid")
    }),

    // Emergency/alert report — the safety query an ADS-B site watches
    // continuously: aircraft squawking 7500 (hijack) / 7600 (radio fail) /
    // 7700 (emergency), or with the alert / emergency flags set (public
    // BaseStation field semantics, FIXTURES.md §1). The filter is
    // map-side (pushed to the scan); the rollup is bounded by the
    // handful of aircraft ever in an emergency state. Distinct emergency
    // squawks collect to a sorted scalar string so the compared value is
    // deterministic (the q_agg_collect rule).
    "q_sbs1_emergency" -> ((s, _) =>
      emergencyReport(
        parsed(s).withColumn("ems", unix_millis(Sbs1.eventTime)))),

    // Altitude-band occupancy — the vertical complement of q_sbs1_grid's
    // geographic cells: messages + distinct aircraft per 5,000 ft band
    // (airspace-utilization dashboards read exactly this). Map-side
    // integer floor on the parsed altitude, one bounded keyed
    // aggregation (≤ ~13 bands to FL600).
    "q_sbs1_altitude" -> ((s, _) =>
      parsed(s)
        .filter(col("altitude").isNotNull)
        .groupBy(floor(col("altitude") / 5000).cast("long").as("band"))
        .agg(count(lit(1)).as("n_msgs"),
             count_distinct(col("hex_ident")).as("n_aircraft"),
             min(col("altitude")).cast("int").as("min_alt"),
             max(col("altitude")).cast("int").as("max_alt"))
        .orderBy("band")),

    // Feed-health TYPE profile — which message/transmission types are
    // flowing and which carry callsigns/positions (a receiver delivering
    // MSG,3 without lat/lon has a decoder fault this surfaces at a
    // glance). Bounded output (message types × transmission types 1–8);
    // one keyed aggregation over the parsed feed.
    "q_sbs1_types" -> ((s, _) =>
      parsed(s)
        .groupBy("message_type", "transmission_type")
        .agg(count(lit(1)).as("n_msgs"),
             count(col("callsign")).as("n_callsign"),
             count(col("lat")).as("n_pos"))
        .orderBy(col("message_type"),
                 col("transmission_type").asc_nulls_first)),

    // Streaming twins (streaming behavior in StreamingSpec; the batch
    // plans are oracle-checked below — VERDICT r10 #4). s_ingest_sbs1
    // sorts by every field so the dump is deterministic even under exact
    // duplicate feed lines (equal rows tie → any order is the same
    // sequence).
    "s_ingest_sbs1" -> ((s, _) =>
      parsed(s).orderBy(Sbs1.Fields.map { case (n, _) =>
        col(n).asc_nulls_first }: _*)),
    "s_watermark_late" -> ((s, d) =>
      EventTimeQueries.queries("q_win_tumbling")(s, d)),
    "s_session_stream" -> ((s, d) =>
      EventTimeQueries.queries("q_session_windows")(s, d)),
    "s_stream_dedup" -> ((s, d) =>
      EventTimeQueries.queries("q_stream_dedup")(s, d)),
    "s_stream_join" -> ((s, d) => {
      // stream-static enrichment shape: events against the customer dim
      val e = events(s, d)
      val c = customer(s, d)
      e.join(broadcast(c), e("user_id") === c("c_custkey"), "left_outer")
        .select(e("event_id"), e("user_id"), c("c_name"), c("c_mktsegment"))
        .orderBy("event_id")
    }),

    "s_stream_stream_join" -> ((s, d) => {
      // stream-STREAM interval join (StreamingOps.intervalJoin — the same
      // plan under readStream, where the time-range condition is what
      // bounds the join state): purchases matched to the same user's
      // signups within the prior hour. Batch twin IS oracle-checked —
      // withWatermark is eliminated from batch plans, the join itself is
      // an equi-join on user_id with a residual time range.
      val e = events(s, d).withColumn("ems", expr("ts div 1000000"))
      def side(tpe: String) = e.filter(col("event_type") === tpe)
        .select(col("user_id"), timestamp_millis(col("ems")).as("ts"),
                col("event_id"))
      graft.streaming.StreamingOps
        .intervalJoin(side("purchase"), side("signup"), "user_id",
                      horizon = "1 hour")
        .select(col("event_id").as("purchase_id"),
                col("r_event_id").as("signup_id"), col("user_id"),
                (unix_millis(col("l_ts")) - unix_millis(col("r_ts")))
                  .as("gap_ms"))
        .orderBy("purchase_id", "signup_id")
    })
  )

  /** Implausible-position screen (q_sbs1_jumps) — the ADS-B data-quality
    * check every ingest pipeline needs (multipath/decoder glitches
    * produce "teleporting" aircraft that poison coverage maps and
    * flight tracks): consecutive positions per aircraft, displacement in
    * micro-degree integers (floor(coord·10⁶) — the grid device at e6),
    * and is_jump when the SQUARED displacement outruns (JumpSpeedE6PerMs
    * · Δt)² — all-integer planar test, no trigonometry, so both engines
    * compare bit-identically (a true great-circle distance is a float
    * surface; at jump magnitudes the planar approximation is the same
    * verdict). dt² runs in DECIMAL(38,0) so a months-long gap cannot
    * overflow the Long product (ANSI-loud past the envelope, per
    * doctrine). Shape: one hex_ident-keyed window over the position
    * subset — the same single exchange q_sbs1_flights already pays;
    * output is pair-per-consecutive-position, never a self-join.
    * Factored so specs can plant crafted feeds (the emergencyReport
    * pattern).
    */
  private[graft] def jumpReport(p: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // coordinate tie-breakers: two position messages in the same
    // millisecond would otherwise make lag() order- (and engine-)
    // dependent; the oracle window mirrors the same key
    val w = Window.partitionBy("hex_ident")
      .orderBy("ems", "lat_e6", "lon_e6")
    // a position without an aircraft id or event time cannot join a
    // track — and NULL keys would also sort differently across engines
    // (Spark ASC = NULLS FIRST, DuckDB = NULLS LAST), so they are
    // excluded on BOTH sides rather than left to ordering luck
    p.filter(col("lat").isNotNull && col("lon").isNotNull &&
             col("hex_ident").isNotNull && col("ems").isNotNull)
      .select(col("hex_ident"), col("ems"),
        floor(col("lat") * 1e6).cast("long").as("lat_e6"),
        floor(col("lon") * 1e6).cast("long").as("lon_e6"))
      .withColumn("p_ems", lag("ems", 1).over(w))
      .withColumn("dlat_e6", col("lat_e6") - lag("lat_e6", 1).over(w))
      .withColumn("dlon_e6", col("lon_e6") - lag("lon_e6", 1).over(w))
      .filter(col("p_ems").isNotNull)
      .withColumn("dt_ms", col("ems") - col("p_ems"))
      .withColumn("d2",
        col("dlat_e6") * col("dlat_e6") + col("dlon_e6") * col("dlon_e6"))
      .withColumn("is_jump",
        col("d2") > expr(s"cast(dt_ms AS DECIMAL(38,0)) * dt_ms" +
                         s" * ${JumpSpeedE6PerMs * JumpSpeedE6PerMs}"))
      .select("hex_ident", "p_ems", "ems", "dt_ms",
              "dlat_e6", "dlon_e6", "d2", "is_jump")
      .orderBy("hex_ident", "ems", "dlat_e6", "dlon_e6")
  }

  /** Jump threshold: 10 micro-degrees per millisecond = 0.01°/s ≈ 1.1 km/s
    * at the equator — faster than any transponder-bearing aircraft, slower
    * than a decode glitch.
    */
  val JumpSpeedE6PerMs = 10L

  /** q_sbs1_emergency core over parsed squitters carrying an epoch-ms
    * `ems` column: per-aircraft rollup of rows in an emergency state
    * (squawk 7500/7600/7700, or the alert / emergency flags). Factored so
    * specs can plant crafted feeds. */
  private[graft] def emergencyReport(p: DataFrame): DataFrame =
    p.filter(col("squawk").isin("7500", "7600", "7700") ||
             col("emergency") === 1 || col("alert") === 1)
      .groupBy("hex_ident")
      .agg(count(lit(1)).as("n_msgs"),
           sum(when(col("alert") === 1, 1L).otherwise(0L)).as("n_alert"),
           sum(when(col("emergency") === 1, 1L).otherwise(0L))
             .as("n_emergency"),
           concat_ws(",", array_sort(collect_set(
             when(col("squawk").isin("7500", "7600", "7700"),
                  col("squawk"))))).as("squawks"),
           min("ems").as("s_ms"), max("ems").as("e_ms"))
      // explicit NULLS FIRST matched in the oracle (the aircraft_stats
      // rule): an anonymous emergency squitter (empty hex) would sort
      // first on Spark, last on DuckDB (r18 self-review)
      .orderBy(col("hex_ident").asc_nulls_first)

  private val duckCols = Sbs1.Fields.map { case (n, _) => s"'$n': 'VARCHAR'" }
    .mkString("{", ", ", "}")

  // TRY_CAST, not CAST: the Spark parser TRY-casts to NULL, and a plain
  // CAST would ERROR the whole oracle query on a non-numeric field value
  // the engine silently nulls (the q_sbs1_altitude rule applied to every
  // typed oracle — r18 self-review)
  private val duckTyped = Sbs1.Fields.map {
    case (n, org.apache.spark.sql.types.IntegerType) =>
      s"TRY_CAST($n AS INTEGER) AS $n"
    case (n, org.apache.spark.sql.types.DoubleType) =>
      s"TRY_CAST($n AS DOUBLE) AS $n"
    case (n, _) => n
  }.mkString(",\n       ")

  def oracles: Map[String, String] = Map(
    // Streaming batch twins: the batch plan IS the already-oracled q_*
    // twin (or the typed parse below), so the oracle is shared — flips
    // these from rows-only to hash-checked (VERDICT r10 #4).
    "s_watermark_late" -> EventTimeQueries.oracles("q_win_tumbling"),
    "s_session_stream" -> EventTimeQueries.oracles("q_session_windows"),
    "s_stream_dedup" -> EventTimeQueries.oracles("q_stream_dedup"),
    "s_ingest_sbs1" ->
      s"""SELECT $duckTyped
         |FROM read_csv('$FixturePath', header=false, columns=$duckCols)
         |ORDER BY ${Sbs1.Fields.map { case (n, _) => s"$n ASC NULLS FIRST" }
                       .mkString(", ")}""".stripMargin,

    "q_sbs1_parse" ->
      s"""SELECT $duckTyped,
         |       strptime(generated_date || ' ' || generated_time,
         |                '%Y/%m/%d %H:%M:%S.%g') AS event_time
         |FROM read_csv('$FixturePath', header=false, columns=$duckCols)
         |ORDER BY ${Sbs1.Fields.map { case (n, _) => s"$n ASC NULLS FIRST" }
                       .mkString(", ")}""".stripMargin,

    "q_sbs1_aircraft_stats" ->
      s"""SELECT hex_ident, count(*) AS n_msgs,
         |       count(callsign) AS n_callsign_msgs,
         |       CAST(max(TRY_CAST(altitude AS INTEGER)) AS INTEGER) AS max_alt,
         |       count(lat) AS n_positions
         |FROM read_csv('$FixturePath', header=false, columns=$duckCols)
         |GROUP BY hex_ident ORDER BY hex_ident ASC NULLS FIRST""".stripMargin,

    "q_sbs1_grid" ->
      s"""SELECT CAST(floor(TRY_CAST(lat AS DOUBLE) * 10) AS BIGINT) AS lat_cell,
         |       CAST(floor(TRY_CAST(lon AS DOUBLE) * 10) AS BIGINT) AS lon_cell,
         |       count(*) AS n_msgs,
         |       count(DISTINCT hex_ident) AS n_aircraft,
         |       CAST(max(TRY_CAST(altitude AS INTEGER)) AS INTEGER) AS max_alt
         |FROM read_csv('$FixturePath', header=false, columns=$duckCols)
         |WHERE TRY_CAST(lat AS DOUBLE) IS NOT NULL
         |  AND TRY_CAST(lon AS DOUBLE) IS NOT NULL
         |GROUP BY 1, 2 ORDER BY lat_cell, lon_cell""".stripMargin,

    "q_sbs1_types" ->
      s"""SELECT message_type,
         |       TRY_CAST(transmission_type AS INTEGER) AS transmission_type,
         |       count(*) AS n_msgs,
         |       count(callsign) AS n_callsign,
         |       count(lat) AS n_pos
         |FROM read_csv('$FixturePath', header=false, columns=$duckCols)
         |GROUP BY 1, 2
         |ORDER BY message_type, transmission_type ASC NULLS FIRST""".stripMargin,

    "q_sbs1_altitude" ->
      // TRY_CAST mirrors the Spark side's parse-to-null (IntegerType parse
      // → null → filtered); a plain CAST would error the oracle on a
      // non-numeric altitude string the engine silently drops (ADVICE r10).
      s"""SELECT CAST(floor(TRY_CAST(altitude AS INTEGER) / 5000.0) AS BIGINT)
         |         AS band,
         |       count(*) AS n_msgs,
         |       count(DISTINCT hex_ident) AS n_aircraft,
         |       CAST(min(TRY_CAST(altitude AS INTEGER)) AS INTEGER) AS min_alt,
         |       CAST(max(TRY_CAST(altitude AS INTEGER)) AS INTEGER) AS max_alt
         |FROM read_csv('$FixturePath', header=false, columns=$duckCols)
         |WHERE TRY_CAST(altitude AS INTEGER) IS NOT NULL
         |GROUP BY 1 ORDER BY band""".stripMargin,

    "q_sbs1_emergency" ->
      s"""WITH p AS (
         |  SELECT hex_ident, squawk,
         |         TRY_CAST(alert AS INTEGER) AS alert,
         |         TRY_CAST(emergency AS INTEGER) AS emergency,
         |         epoch_ms(strptime(generated_date || ' ' || generated_time,
         |                           '%Y/%m/%d %H:%M:%S.%g')) AS ems
         |  FROM read_csv('$FixturePath', header=false, columns=$duckCols))
         |SELECT hex_ident, count(*) AS n_msgs,
         |       CAST(sum(CASE WHEN alert = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_alert,
         |       CAST(sum(CASE WHEN emergency = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_emergency,
         |       COALESCE(array_to_string(list_sort(list(DISTINCT squawk)
         |         FILTER (WHERE squawk IN ('7500', '7600', '7700'))), ','),
         |         '') AS squawks,
         |       min(ems) AS s_ms, max(ems) AS e_ms
         |FROM p
         |WHERE squawk IN ('7500', '7600', '7700')
         |   OR alert = 1 OR emergency = 1
         |GROUP BY hex_ident
         |ORDER BY hex_ident ASC NULLS FIRST""".stripMargin,

    "s_stream_join" ->
      """SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |ORDER BY e.event_id""".stripMargin,

    "s_stream_stream_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ems
        |           FROM events),
        |p AS (SELECT user_id, event_id AS purchase_id, ems AS p_ms
        |      FROM e WHERE event_type = 'purchase'),
        |g AS (SELECT user_id, event_id AS signup_id, ems AS s_ms
        |      FROM e WHERE event_type = 'signup')
        |SELECT p.purchase_id, g.signup_id, p.user_id,
        |       p.p_ms - g.s_ms AS gap_ms
        |FROM p JOIN g ON p.user_id = g.user_id
        | AND g.s_ms <= p.p_ms AND g.s_ms >= p.p_ms - 3600000
        |ORDER BY purchase_id, signup_id""".stripMargin,

    "q_sbs1_jumps" ->
      s"""WITH p AS (
         |  SELECT hex_ident,
         |         TRY_CAST(lat AS DOUBLE) AS lat,
         |         TRY_CAST(lon AS DOUBLE) AS lon,
         |         epoch_ms(strptime(generated_date || ' ' || generated_time,
         |                           '%Y/%m/%d %H:%M:%S.%g')) AS ems
         |  FROM read_csv('$FixturePath', header=false, columns=$duckCols)),
         |q AS (SELECT hex_ident, ems,
         |             CAST(floor(lat * 1e6) AS BIGINT) AS lat_e6,
         |             CAST(floor(lon * 1e6) AS BIGINT) AS lon_e6
         |      FROM p WHERE lat IS NOT NULL AND lon IS NOT NULL
         |        AND hex_ident IS NOT NULL AND ems IS NOT NULL),
         |l AS (SELECT hex_ident, ems, lag(ems) OVER w AS p_ems,
         |             lat_e6 - lag(lat_e6) OVER w AS dlat_e6,
         |             lon_e6 - lag(lon_e6) OVER w AS dlon_e6
         |      FROM q WINDOW w AS (PARTITION BY hex_ident
         |                          ORDER BY ems, lat_e6, lon_e6))
         |SELECT hex_ident, p_ems, ems, ems - p_ems AS dt_ms,
         |       dlat_e6, dlon_e6,
         |       dlat_e6*dlat_e6 + dlon_e6*dlon_e6 AS d2,
         |       (dlat_e6*dlat_e6 + dlon_e6*dlon_e6) >
         |         (CAST(ems - p_ems AS HUGEINT) * (ems - p_ems)
         |          * ${JumpSpeedE6PerMs * JumpSpeedE6PerMs}) AS is_jump
         |FROM l WHERE p_ems IS NOT NULL
         |ORDER BY hex_ident, ems, dlat_e6, dlon_e6""".stripMargin,

    "q_sbs1_flights" ->
      s"""WITH p AS (
         |  SELECT hex_ident, TRY_CAST(altitude AS INTEGER) AS altitude,
         |         epoch_ms(strptime(generated_date || ' ' || generated_time,
         |                           '%Y/%m/%d %H:%M:%S.%g')) AS ems
         |  FROM read_csv('$FixturePath', header=false, columns=$duckCols)
         |  WHERE hex_ident IS NOT NULL),
         |g AS (SELECT hex_ident, altitude, ems,
         |             CASE WHEN ems - lag(ems) OVER w >= 300000
         |                    OR lag(ems) OVER w IS NULL THEN 1 ELSE 0 END AS nf
         |      FROM p WHERE ems IS NOT NULL
         |      WINDOW w AS (PARTITION BY hex_ident ORDER BY ems)),
         |i AS (SELECT hex_ident, altitude, ems,
         |             CAST(sum(nf) OVER (PARTITION BY hex_ident ORDER BY ems
         |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fid
         |      FROM g)
         |SELECT hex_ident, fid, min(ems) AS s_ms, max(ems) AS e_ms,
         |       count(*) AS n_msgs, CAST(max(altitude) AS INTEGER) AS max_alt
         |FROM i GROUP BY hex_ident, fid ORDER BY hex_ident, fid""".stripMargin
  )
}
