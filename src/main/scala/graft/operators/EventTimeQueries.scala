package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.Parity._

/** Event-time inventory (SURVEY.md §2.3): tumbling / sliding / session
  * windows, as-of join, keyed dedup. These run in batch for the t2 oracle;
  * the identical expressions run under `readStream` in graft.streaming.
  *
  * Fixture quirk (SURVEY.md §7.5): events.ts is timestamp[ns]. Spark
  * truncates to µs on read while DuckDB keeps ns, so every ts that reaches
  * the output or an ordering is normalized to epoch milliseconds
  * (`unix_millis` / `epoch_ms`) with the unique event_id as tiebreak.
  *
  * Scale notes: every operator here shuffles exactly once on its key
  * (user_id or the window bucket). The as-of join deliberately avoids the
  * naive range-join + aggregate (quadratic on hot users): it unions both
  * sides and resolves the match with a single running `last(ignoreNulls)`
  * window — one shuffle, linear work, the standard distributed as-of plan.
  */
object EventTimeQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q_event_attribution lookback: clicks older than this attribute
    * nothing. The oracle SQL inlines the same 3600000 ms literal. */
  private val AttributionHorizonMs = 3600000L

  /** events.ts arrives as raw ns-since-epoch Long (Tables.events); integer
    * division gives exact epoch ms, matching DuckDB's epoch_ms(ts). */
  private def ems(s: SparkSession, d: String): DataFrame =
    events(s, d).withColumn("ems", expr("ts div 1000000"))

  /** Deterministic first-event-per-key dedup: row_number over a fully
    * tiebroken order — NOT dropDuplicates, which is order-nondeterministic
    * under parallelism (SURVEY.md §7.5).
    */
  private def firstPerKey(e: DataFrame, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("ems"), col("event_id"))
    e.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Per-user view→click→purchase stage-entry times over (user_id, ems,
    * event_type) rows — (user_id, v_ms, c_ms, p_ms), stage k's entry the
    * MIN event at-or-after stage k-1's entry (>= admits same-ms ties —
    * the ns fixture truncates to ms, §7.5, so ties are real). Three
    * chained whole-partition windows over ONE partitioning: a single
    * user_id exchange + sort carries all sequencing state — no per-stage
    * self-joins (the naive funnel is a join per stage; quadratic fan-out
    * on hot users and S shuffles for S stages). Stage times are
    * partition-constants, so the per-user rollup rides the window's
    * existing user_id partitioning (no new exchange). ONE sequencing
    * definition shared by q_event_funnel and q_event_funnel_time.
    */
  private[graft] def funnelStageTimes(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
    ev
      .withColumn("v_ms", min(when(col("event_type") === "view",
        col("ems"))).over(w))
      .withColumn("c_ms", min(when(col("event_type") === "click" &&
        col("ems") >= col("v_ms"), col("ems"))).over(w))
      .withColumn("p_ms", min(when(col("event_type") === "purchase" &&
        col("ems") >= col("c_ms"), col("ems"))).over(w))
      .groupBy("user_id")
      // __nev (r18): the user's TOTAL event count, riding the funnel's
      // one user_id exchange — the shrink closure's "is this user's
      // artifact state still exact?" witness (a removal that touched a
      // user's events, funnel-typed or not, strictly lowers it; see
      // [[funnelLagSet]]). Consumers aggregate named columns, so the
      // extra column is inert outside the persisted layer.
      .agg(max("v_ms").as("v_ms"), max("c_ms").as("c_ms"),
           max("p_ms").as("p_ms"), count(lit(1)).as("__nev"))
  }

  /** q_event_churn core over (user_id, ems) rows — per epoch week:
    * active users, users retained into the IMMEDIATELY next week, churn
    * rate in exact ppm. See the query entry for semantics and shape.
    */
  private[graft] def weeklyChurn(ev: DataFrame): DataFrame = {
    val uw = ev
      .select(col("user_id"), expr("ems div 604800000").as("wk"))
      .distinct()
    val nextW = lead(col("wk"), 1)
      .over(Window.partitionBy("user_id").orderBy("wk"))
    uw.withColumn("ret",
        when(nextW === col("wk") + 1, 1L).otherwise(0L))
      .groupBy("wk")
      .agg(count(lit(1)).as("n_active"), sum("ret").as("n_retained"))
      .withColumn("churn_ppm",
        expr("(n_active - n_retained) * 1000000 DIV n_active"))
      .orderBy("wk")
  }

  /** q_event_funnel_time core over (user_id, ems, event_type) rows —
    * per transition: converting users, exact p50/p90 of the stage-entry
    * lag in ms. See the query entry for the shape rationale.
    */
  private[graft] def funnelTime(ev: DataFrame): DataFrame =
    funnelTimeOverLags(funnelLagPlan(ev))

  /** The 2-rows-per-converting-user (transition, lag_ms) unpivot of
    * [[funnelStageTimes]] — the layer [[funnelLagSet]] memoizes. */
  private def funnelLagPlan(ev: DataFrame): DataFrame =
    funnelLagLayerPlan(ev).select("transition", "lag_ms")

  /** [[funnelLagPlan]] in its PERSISTED-LAYER shape (r18): user_id and
    * the user's build-time event count ride each lag row, so the shrink
    * closure can decide per user whether the artifact rows are still
    * exact. Quantile consumers name their columns; the extras are inert
    * to them. */
  private def funnelLagLayerPlan(ev: DataFrame): DataFrame =
    funnelStageTimes(ev).selectExpr("user_id", "__nev",
      "stack(2, 'view_to_click', c_ms - v_ms, " +
      "'click_to_purchase', p_ms - c_ms) AS (transition, lag_ms)")
      .filter(col("lag_ms").isNotNull)

  private def funnelTimeOverLags(lags: DataFrame): DataFrame =
    // counts ride the quantile engine's own stats pass (n = non-null
    // lags per transition = converting users — the stack's null filter
    // and Quantiles' null filter see the same rows): a separate
    // lags.groupBy count would re-execute the whole funnel window
    // pipeline, since the quantile result is driver-assembled with no
    // lineage back to the persisted base (review finding, round 12)
    graft.api.Quantiles.exactQuantilesAndCounts(
        lags, "transition", "lag_ms", Seq(0.5, 0.9))
      .groupBy("transition").agg(
        max("n").as("n_users"),
        max(when(col("p") === 0.5, col("value"))).as("p50_ms"),
        max(when(col("p") === 0.9, col("value"))).as("p90_ms"))
      .select("transition", "n_users", "p50_ms", "p90_ms")
      .orderBy("transition")

  /** Memoized per-(session, dir) funnel-lag layer (the winnowPickSet
    * precedent, VERDICT r12 #3): the stage-lag table is converting-users
    * sized but its LINEAGE is the whole funnel window pipeline, and
    * Quantiles' serial driver jobs (stats pass + leaf scan) each
    * re-materialized it inside the timed query. Built once per dir —
    * artifact-served via the shared derived-layer machinery (fingerprint
    * on events.parquet), attributed as the `funnel_lags` bench phase —
    * so q_event_funnel_time measures query-only cost: Quantiles over a
    * cached KB-scale table.
    */
  private val funnelLagMemo =
    new graft.api.SessionMemo[DataFrame](_.unpersist(blocking = false))

  /** The 30-minute `session_window` core shared by q_session_windows,
    * q_event_concurrency, and q_session_stats: (user_id, s_ms, e_ms, n)
    * per session over ms-TRUNCATED timestamps (the ns-fixture vs
    * ms-oracle rule, SURVEY §7.5) — one user_id-keyed exchange. Factored
    * like [[funnelStageTimes]] so a gap-parameter or truncation change
    * cannot silently reach only one of the three oracles
    * (r18 self-review). */
  private[graft] def sessionCore(ev: DataFrame): DataFrame =
    ev.withColumn("tsm", timestamp_millis(col("ems")))
      .groupBy(col("user_id"), session_window(col("tsm"), "30 minutes"))
      .agg(min(col("ems")).as("s_ms"),
           max(col("ems")).as("e_ms"),
           count(lit(1)).as("n"))

  /** Serves (user_id, __nev, transition, lag_ms) via the
    * manifest-incremental machinery (r18 — migrated from the plain
    * fingerprint gate so a retracted events file SHRINKS the layer).
    *
    * SHRINK exactness: a user's lag rows are a pure function of that
    * user's event set, and every stage time is a MIN over a candidate
    * set that only shrinks when events are removed — so a user absent
    * from the artifact (non-converting) can never GAIN lag rows under
    * removal, and a user whose surviving event count equals the stored
    * `__nev` lost nothing (counts strictly decrease per removed event —
    * a partial removal cannot be masked). The closure therefore keeps
    * intact users' rows verbatim, recomputes ONLY touched users (count
    * moved) over their surviving events, and drops tombstoned users
    * (absent from the surviving counts). Cost: one map-side-combinable
    * count aggregation over surviving events + the funnel window over
    * the touched users only — never the full window pipeline a rebuild
    * pays. All-intact shrinks commit sidecar-only (the reference-equal
    * contract). GROWTH still rebuilds: new events can raise a user's
    * stage times non-monotonically relative to the stored rows
    * (acceptPaths vetoes it up front).
    */
  private[operators] def funnelLagSet(s: SparkSession, d: String): DataFrame =
    funnelLagMemo.get(s, "", d) {
      // the shrink closure's touched-user set is referenced by its OWN
      // emptiness probe plus both union branches of the rewrite — cache
      // it eagerly so the count aggregation over surviving events runs
      // ONCE (the documented shrink cost), not once per consumer
      // (r18 self-review); released after the serve commits
      var touchedCache: Option[DataFrame] = None
      val (df, src) = try {
        graft.api.IndexArtifacts.serveDerivedIncremental(
        s, s"g_drv_funlags_${d.replaceAll("[^A-Za-z0-9]+", "_")}",
        s"$d/events.parquet", "stack3-nev",
        funnelLagLayerPlan(ems(s, d)),
        _ => { throw new IllegalStateException(
          "funnel_lags buildDelta unreachable: acceptPaths vetoes growth") },
        acceptPaths = _ => false,
        buildShrink = art => {
          val cols = Seq("user_id", "__nev", "transition", "lag_ms")
          val surv = ems(s, d).groupBy("user_id")
            .agg(count(lit(1)).as("__n2"))
          val verdicts = art.select("user_id", "__nev").distinct()
            .join(surv, Seq("user_id"), "left")
          val touched = verdicts
            .filter(col("__n2").isNull || col("__n2") =!= col("__nev"))
            .select("user_id").cache()
          touchedCache = Some(touched)
          if (touched.count() == 0L) Some(art) // all intact: sidecar-only
          else {
            val kept = art.join(touched, Seq("user_id"), "left_anti")
            val redone = funnelLagLayerPlan(
              ems(s, d).join(touched, Seq("user_id"), "left_semi"))
            Some(kept.select(cols.map(col): _*)
              .union(redone.select(cols.map(col): _*)))
          }
        },
        compactInvariant =
          DedupQueries.uniqueInvariant("user_id", "transition"))
      } finally touchedCache.foreach(_.unpersist(blocking = false))
      DedupQueries.noteDerivedSource(s, "funnel_lags", src)
      val lags = df.cache()
      lags.count() // eager: a lazily-cached layer recomputes on eviction races
      lags
    }

  /** Drop the session's memoized funnel-lag layer (the
    * releaseWinnowPicks convention). */
  private[graft] def releaseFunnelLags(s: SparkSession): Unit =
    funnelLagMemo.release(s)

  /** The funnel-lag layer as a NAMED one-time bench phase (the
    * [[DedupQueries.indexPhases]] convention). */
  private[graft] def lagPhases(s: SparkSession, d: String)
      : Seq[(String, () => Long, () => String)] =
    Seq(("funnel_lags", () => funnelLagSet(s, d).count(),
         () => DedupQueries.derivedSourceOf(s, "funnel_lags")))

  /** Last-touch attribution core over (event_id, user_id, ems, event_type)
    * rows: each purchase credits the same user's most recent
    * prior-or-equal click, but only within [[AttributionHorizonMs]]
    * (stale clicks attribute nothing). Union + running last() over ONE
    * user_id exchange — the q_join_asof plan — never a purchase×click
    * range join (quadratic fan-out on hot users, and the horizon
    * predicate would not save the build side at 100 TB). Both carried
    * click columns (ms + id) ride the SAME window frame: one Window node,
    * one sort. Factored so specs can drive crafted timelines.
    */
  private[graft] def lastTouch(ev: DataFrame): DataFrame = {
    val e = ev
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("tag", when(col("event_type") === "click", 0).otherwise(1))
      .withColumn("c_ms", when(col("tag") === 0, col("ems")))
      .withColumn("c_id", when(col("tag") === 0, col("event_id")))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ems"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hit = col("lc_ms").isNotNull &&
      col("ems") - col("lc_ms") <= AttributionHorizonMs
    e.withColumn("lc_ms", last("c_ms", ignoreNulls = true).over(w))
      .withColumn("lc_id", last("c_id", ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("user_id"),
              col("ems").as("purchase_ms"),
              when(hit, col("lc_id")).as("click_id"),
              when(hit, col("ems") - col("lc_ms")).as("lag_ms"))
      .orderBy("event_id")
  }

  /** Per-user event-type transition matrix (Markov counts): lead() pairs
    * each event with its successor inside ONE user_id exchange+sort; the
    * rollup collapses to the event-type vocabulary (≤ |types|² rows), so
    * the per-source probability window rides a tiny table, never the
    * corpus. p_e6 is integer micro-probability (exact Long arithmetic in
    * both engines — the tf·10⁶ precedent).
    */
  private[graft] def transitions(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ems"), col("event_id"))
    ev.withColumn("dst_type", lead(col("event_type"), 1).over(w))
      .filter(col("dst_type").isNotNull)
      .groupBy(col("event_type").as("src_type"), col("dst_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("tot", sum(col("n")).over(Window.partitionBy("src_type")))
      .withColumn("p_e6", expr("n * 1000000 div tot"))
      .drop("tot")
      .orderBy("src_type", "dst_type")
  }

  /** The third merge_asof direction (pandas: backward/forward/nearest;
    * q_join_asof is backward): each purchase matches the CLOSER of the
    * same user's latest prior-or-equal and earliest following signup,
    * ties to the prior (earlier) one. Both candidates ride TWO frames of
    * ONE user_id exchange+sort — never a purchase×signup range join
    * (PlanSpec pins one hash exchange, no Join). Same-ms signups sort
    * before the purchase (tag order), so at-or-equal matches resolve to
    * the prior side, exactly as q_join_asof. Factored so specs can drive
    * crafted timelines.
    */
  private[graft] def asofNearest(ev: DataFrame): DataFrame = {
    val e = ev
      .filter(col("event_type").isin("signup", "purchase"))
      .withColumn("tag", when(col("event_type") === "signup", 0).otherwise(1))
      .withColumn("s_ms", when(col("tag") === 0, col("ems")))
    val ord = Window.partitionBy("user_id")
      .orderBy(col("ems"), col("tag"), col("event_id"))
    val wPrior = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    e.withColumn("prior_ms", last("s_ms", ignoreNulls = true).over(wPrior))
      .withColumn("next_ms", first("s_ms", ignoreNulls = true).over(wNext))
      .filter(col("tag") === 1)
      .withColumn("signup_ms",
        when(col("prior_ms").isNull, col("next_ms"))
          .when(col("next_ms").isNull, col("prior_ms"))
          .when(col("ems") - col("prior_ms") <= col("next_ms") - col("ems"),
            col("prior_ms"))
          .otherwise(col("next_ms")))
      .select(col("event_id"), col("user_id"),
              col("ems").as("purchase_ms"), col("signup_ms"))
      .orderBy("event_id")
  }

  /** The remaining merge_asof direction (backward = q_join_asof, nearest
    * = [[asofNearest]]): each purchase matches the same user's EARLIEST
    * at-or-after signup — the "next appointment" lookup. One running
    * first() over the forward frame of the SAME user_id exchange+sort.
    * Tie order is tag DESC (purchases before same-ms signups), the
    * MIRROR of q_join_asof's tag ASC: each direction's frame must
    * include the equal-timestamp match on its own side, so the
    * at-or-equal contract holds from both ends. Factored so specs can
    * drive crafted timelines.
    */
  private[graft] def asofForward(ev: DataFrame): DataFrame = {
    val e = ev
      .filter(col("event_type").isin("signup", "purchase"))
      .withColumn("tag", when(col("event_type") === "signup", 0).otherwise(1))
      .withColumn("s_ms", when(col("tag") === 0, col("ems")))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ems"), col("tag").desc, col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    e.withColumn("signup_ms", first("s_ms", ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("user_id"), col("ems").as("purchase_ms"),
              col("signup_ms"))
      .orderBy("event_id")
  }

  /** Inter-event gap histogram core over (event_id, user_id, ems) rows:
    * per-user gaps from ONE lag() over the standard user_id exchange+sort
    * (the q_event_transitions partitioning), rolled up into a FIXED
    * 7-cell duration-decade histogram (<1s, <10s, <1m, <10m, <1h, <1d,
    * ≥1d) — the arrival-process profile behind session-gap tuning (is
    * 30 min the right q_session_windows gap?) and capacity planning.
    * Decade edges are integer ms literals compared exactly in both
    * engines; mean_gap_ms is integer floor division (the tf·10⁶
    * precedent). The histogram rollup is map-side partial over ≤7 cells;
    * nothing downstream of the window exceeds the cell count.
    */
  private[graft] def gapHistogram(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ems"), col("event_id"))
    ev.withColumn("prev", lag(col("ems"), 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("gap", col("ems") - col("prev"))
      .withColumn("bucket",
        when(col("gap") < 1000L, 0)
          .when(col("gap") < 10000L, 1)
          .when(col("gap") < 60000L, 2)
          .when(col("gap") < 600000L, 3)
          .when(col("gap") < 3600000L, 4)
          .when(col("gap") < 86400000L, 5)
          .otherwise(6))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("gap").as("sum_gap_ms"),
           min("gap").as("min_gap_ms"), max("gap").as("max_gap_ms"))
      .withColumn("mean_gap_ms", expr("sum_gap_ms DIV n"))
      .orderBy("bucket")
  }

  /** Trailing-window volume-anomaly core over an (hr, n) hourly rollup:
    * flag hours whose count sits more than 3 trailing standard deviations
    * above the previous 24 observed hours' mean. ENTIRELY in exact Long
    * arithmetic — the z>3 test is algebraically cleared of sqrt and
    * division: with c/S/Q = trailing count/Σn/Σn²,
    *   z > 3  ⇔  nc > S  ∧  (nc−S)²(c−1) > 9c(cQ−S²)
    * so both engines compare identical integers (no stddev-accumulation
    * or libm differences can drift). Flags only fire on a FULL 24-hour
    * history (c = 24) — cold-start hours report stats but never alert.
    * Long envelope: (nc)² must stay under 2⁶³ → safe to ~1.25e8 events
    * per hour; past that the comparison swaps to DECIMAL(38,0) with no
    * shape change (the e6-parity envelope rule).
    *
    * Shape at 100 TB: ONE corpus-scale hourly aggregation; the frame
    * window runs over the hours-sized rollup (8760 rows/year), not the
    * corpus. Factored so specs can plant synthetic spikes.
    */
  private[graft] def anomalyFlags(hourly: DataFrame): DataFrame = {
    val f = Window.orderBy("hr").rowsBetween(-24, -1)
    hourly
      .withColumn("trail_c", count(col("n")).over(f))
      // the z-test INTERNALS run in DECIMAL(38,0): n² overflows Long at
      // ~3e9 events/hour and (nc−S)²(c−1) far earlier — the envelope
      // swap the r10 prose promised, now in code (VERDICT r10 #5). The
      // REPORTED trail columns keep their BIGINT contract via try_cast
      // (overflow → null in ANSI and legacy modes alike, never a wrapped
      // Long; the oracle TRY_CASTs identically). The flag's own envelope
      // is DECIMAL(38): (nc−S)²(c−1) and 9c(cQ−S²) stay in 38 digits to
      // hourly counts ≈ 1e17 — far past any event feed — and past that
      // the comparison raises an ANSI overflow, never a wrong flag
      // (ADVICE r11: exact within the envelope, loud outside it).
      // PropertySpec pins the edge.
      .withColumn("trail_s_d",
        sum(col("n").cast("decimal(38,0)")).over(f))
      .withColumn("trail_q_d",
        sum(col("n").cast("decimal(38,0)") * col("n")).over(f))
      .withColumn("is_anomaly",
        col("trail_c") === 24 &&
        col("n").cast("decimal(38,0)") * col("trail_c") > col("trail_s_d") &&
        (col("n").cast("decimal(38,0)") * col("trail_c") - col("trail_s_d")) *
          (col("n").cast("decimal(38,0)") * col("trail_c") - col("trail_s_d")) *
          (col("trail_c") - 1) >
          lit(9) * col("trail_c").cast("decimal(38,0)") *
            (col("trail_c") * col("trail_q_d") -
             col("trail_s_d") * col("trail_s_d")))
      .withColumn("trail_s", expr("try_cast(trail_s_d AS BIGINT)"))
      .withColumn("trail_q", expr("try_cast(trail_q_d AS BIGINT)"))
      .select(col("hr"), col("n"), col("trail_c"), col("trail_s"),
              col("trail_q"), col("is_anomaly"))
      .orderBy("hr")
  }

  def queries: Map[String, Q] = Map(
    "q_event_anomaly" -> ((s, d) =>
      // hourly event-volume spikes vs the trailing day — see [[anomalyFlags]]
      anomalyFlags(
        ems(s, d).groupBy(expr("ems div 3600000").as("hr"))
          .agg(count(lit(1)).as("n")))),

    "q_join_asof" -> ((s, d) => {
      // Each purchase matched to the same user's latest prior-or-equal
      // signup. Union + running last() = single shuffle as-of join.
      val e = ems(s, d)
        .filter(col("event_type").isin("signup", "purchase"))
        .withColumn("tag", when(col("event_type") === "signup", 0).otherwise(1))
        .withColumn("s_ms", when(col("tag") === 0, col("ems")))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ems"), col("tag"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("signup_ms", last("s_ms", ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(col("event_id"), col("user_id"), col("ems").as("purchase_ms"),
                col("signup_ms"))
        .orderBy("event_id")
    }),

    "q_join_asof_nearest" -> ((s, d) => asofNearest(ems(s, d))),

    "q_join_asof_forward" -> ((s, d) => asofForward(ems(s, d))),

    "q_win_tumbling" -> ((s, d) =>
      // Tumbling 1h windows on the ms-exact timestamp; hour bucket
      // boundaries are µs-aligned so ns→ms truncation cannot rebucket.
      // sum(value) runs in DECIMAL for engine-exact results (Parity).
      ems(s, d)
        .groupBy(window(timestamp_millis(col("ems")), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("sum_v"))
        .select(unix_millis(col("window.start")).as("ws_ms"),
                col("event_type"), col("n"), col("sum_v"))
        .orderBy("ws_ms", "event_type")),

    "q_win_sliding" -> ((s, d) =>
      // 1h window sliding 30min: each event lands in 2 windows via the
      // shared bounded-Expand membership generic (GraftOps
      // .slidingMembership — q_event_dau's WAU fan-out is the same
      // definition); epoch-aligned starts match DuckDB's time_bucket.
      graft.api.GraftOps.slidingMembership(
          ems(s, d).select("ems"), "ems",
          width = 3600000L, slide = 1800000L, outCol = "ws_ms")
        .groupBy("ws_ms")
        .agg(count(lit(1)).as("n"))
        .orderBy("ws_ms")),

    "q_session_windows" -> ((s, d) =>
      // 30-min-gap sessionization via native session_window. Output contract
      // is (user_id, min ts, max ts, count) — session_window.end is
      // last+gap, which no gaps-and-islands oracle would match (§2.3).
      // Sessionize on ms-truncated timestamps so gap comparisons see the
      // exact values the ms-based oracle sees (ns fixture, §7.5).
      sessionCore(ems(s, d))
        .select("user_id", "s_ms", "e_ms", "n")
        .orderBy("user_id", "s_ms")),

    "q_event_concurrency" -> ((s, d) => {
      // Active sessions per hour — the interval-stab gauge (how many
      // 30-min-gap sessions SPAN each hour, not how many events landed
      // in it — a session quiet for 25 minutes is still active, which
      // is what DAU/event-count views can't see). Shape: sessionize
      // ([[sessionCore]]), explode each
      // session into the hours it spans — fan-out bounded by session
      // duration in hours, never by event count — then ONE hour-keyed
      // rollup. No interval theta join anywhere: the hour grid is the
      // bucketization of the classic interval-stab query, so at 100 TB
      // this is a map-side explode + one aggregation.
      val sess = sessionCore(ems(s, d))
      sess
        .select(col("user_id"),
          explode(sequence(expr("s_ms div 3600000"),
                           expr("e_ms div 3600000"))).as("hour"))
        .groupBy("hour")
        .agg(count(lit(1)).as("active_sessions"),
             count_distinct(col("user_id")).as("active_users"))
        .orderBy("hour")
    }),

    "q_session_stats" -> ((s, d) => {
      // Session duration/size PROFILE — q_session_windows' dashboard
      // rollup: sessions bucketed into a fixed 6-cell duration histogram
      // (single-event, <1m, <10m, <30m, <1h, ≥1h) with per-bucket event
      // and duration stats (exact integer means via DIV — the
      // q_event_gaps arithmetic). Shape: the same native session_window
      // aggregation ([[sessionCore]], one user_id-keyed exchange), then
      // a ≤6-cell map-side-combining rollup — the corpus-scale output
      // (sessions) never leaves the cluster, only the bounded histogram.
      val sess = sessionCore(ems(s, d))
        .select((col("e_ms") - col("s_ms")).as("dur"), col("n"))
      // bucket 0 is SINGLE-EVENT (n = 1), not dur = 0: a multi-event
      // same-millisecond burst has duration 0 but is a real session and
      // belongs in the <1m cell (review fix — the two predicates differ
      // exactly on bursts)
      sess.withColumn("bucket",
          when(col("n") === 1L, 0)
            .when(col("dur") < 60000L, 1)
            .when(col("dur") < 600000L, 2)
            .when(col("dur") < 1800000L, 3)
            .when(col("dur") < 3600000L, 4)
            .otherwise(5))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_sessions"),
             sum("dur").as("sum_dur_ms"),
             sum("n").as("n_events"),
             max("dur").as("max_dur_ms"))
        .withColumn("mean_dur_ms", expr("sum_dur_ms DIV n_sessions"))
        .withColumn("mean_events_e3", expr("n_events * 1000 DIV n_sessions"))
        .orderBy("bucket")
    }),

    "q_dedup_exact" -> ((s, d) =>
      firstPerKey(ems(s, d), Seq("user_id", "event_type"))
        .select("user_id", "event_type", "event_id", "ems")
        .orderBy("user_id", "event_type")),

    "q_stream_dedup" -> ((s, d) =>
      // Batch twin of dropDuplicatesWithinWatermark((user_id, event_type)) —
      // same key contract as streaming.StreamingOps.dedupStream (§2.4).
      firstPerKey(ems(s, d), Seq("user_id", "event_type"))
        .select("user_id", "event_type", "event_id")
        .orderBy("user_id", "event_type")),

    "q_approx_distinct" -> ((s, d) =>
      // HyperLogLog++ sketch — t2-excluded (sketches differ across engines);
      // accuracy pinned by ApproxDistinctSpec at ±5% vs exact.
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
        .orderBy("l_returnflag")),

    "q_event_funnel" -> ((s, d) =>
      // Ordered view→click→purchase funnel — per-user stage entry times
      // from [[funnelStageTimes]], rolled into per-stage user counts.
      funnelStageTimes(ems(s, d))
        .agg(count(col("v_ms")).as("nv"), count(col("c_ms")).as("nc"),
             count(col("p_ms")).as("np"))
        .selectExpr("stack(3, 1, 'view', nv, 2, 'click', nc, " +
          "3, 'purchase', np) as (stage_idx, stage, users)")
        .orderBy("stage_idx")),

    "q_event_funnel_time" -> ((s, d) => {
      // Time-to-convert between funnel stages — the LATENCY lens beside
      // q_event_funnel's count lens (two funnels can convert the same
      // fraction while one takes minutes and the other days; the product
      // read is the percentile, not the mean — one straggler must not
      // move the gate). Per converting user, the stage-entry lag in ms
      // (exact integer — stage times come from [[funnelStageTimes]], ONE
      // sequencing definition for both funnel ops), then per transition:
      // converted-user count and exact p50/p90 of the lag via
      // graft.api.Quantiles — bounded executor state at any scale (the
      // q_stats_outliers engine; 2 literal non-null groups), identical
      // interpolation to DuckDB's quantile_cont so the doubles are
      // hash-exact. Shape: the funnel's one user_id exchange, a 2-row-
      // per-converting-user unpivot, Quantiles' bin refinement over a
      // GROUPS×targets table, broadcast join-back of the 2-row quantile
      // block onto the 2-row count rollup. See [[funnelTime]] (factored
      // so specs drive crafted timelines through the production path);
      // the query entry rides the memoized [[funnelLagSet]] layer so the
      // timed cost is Quantiles over a cached KB-scale table, with the
      // funnel pipeline attributed as the funnel_lags phase.
      funnelTimeOverLags(funnelLagSet(s, d))
    }),

    "q_event_attribution" -> ((s, d) => lastTouch(ems(s, d))),

    "q_event_gaps" -> ((s, d) => gapHistogram(ems(s, d))),

    "q_event_transitions" -> ((s, d) => transitions(ems(s, d))),

    "q_event_paths" -> ((s, d) => {
      // Top user JOURNEYS — the 3-step sequence mining behind funnel
      // discovery (q_event_funnel checks one known path; this surfaces
      // the paths worth checking): both lead()s ride ONE user_id
      // exchange+sort (the q_event_transitions partitioning — a single
      // Window node carries lead(1) and lead(2)), trigrams roll up to a
      // ≤|types|³-bounded table with share in exact ppm, and the top-10
      // presentation is TakeOrderedAndProject. Never a self-join on
      // consecutive events (quadratic on hot users), never a window over
      // the path key.
      val w = Window.partitionBy("user_id").orderBy(col("ems"), col("event_id"))
      val tri = ems(s, d)
        .withColumn("e2", lead(col("event_type"), 1).over(w))
        .withColumn("e3", lead(col("event_type"), 2).over(w))
        .filter(col("e3").isNotNull)
        .groupBy(col("event_type").as("s1"), col("e2").as("s2"),
                 col("e3").as("s3"))
        .agg(count(lit(1)).as("n"))
      // the trigram total rides a single-partition window over the
      // ≤|types|³-BOUNDED rollup (the q_mix_alpha device — r18, guide
      // §2.4) instead of a scalar subquery whose execution re-ran the
      // rollup subtree as its own jobs; t is identical (sum of the same
      // group counts)
      val wAll = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      tri.withColumn("t", sum("n").over(wAll))
        .withColumn("share_ppm", expr("n * 1000000 DIV t"))
        .drop("t")
        .orderBy(col("n").desc, col("s1"), col("s2"), col("s3"))
        .limit(10)
    }),

    "q_event_seasonality" -> ((s, d) =>
      // Hour-of-day × day-of-week activity matrix — the seasonality
      // profile behind load forecasting and anomaly baselines. Pure
      // tz-free integer arithmetic on epoch ms (dow from the epoch-day
      // offset; 1970-01-01 was a Thursday, so +4 lands 0 = Sunday) —
      // no calendar/timezone library can drift the engines. One keyed
      // aggregation; the output is a fixed 168-cell grid.
      ems(s, d).groupBy(
          expr("(ems div 3600000) % 24").as("hour_utc"),
          expr("((ems div 86400000) + 4) % 7").as("dow"))
        .agg(count(lit(1)).as("n"),
             count_distinct(col("user_id")).as("n_users"))
        .orderBy("dow", "hour_utc")),

    "q_event_ltv" -> ((s, d) => {
      // User lifetime-value histogram: exact per-user DECIMAL value sums
      // (the Parity money rule), then a fixed-width MAP-SIDE bucket
      // rollup (the q_agg_histogram rule — a decile cut would need a
      // users-sized global-sort window). Two keyed aggregations, both
      // partial-combining; the bucket table is bounded. The per-bucket
      // LTV sum re-enters DECIMAL so no double sum ever depends on
      // accumulation order.
      val u = ems(s, d).groupBy("user_id")
        .agg(sumMoney(col("value")).as("ltv"), count(lit(1)).as("n_events"))
      u.groupBy(floor(col("ltv") / 100).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_users"),
             sum(col("n_events")).as("n_events"),
             sumMoney(col("ltv")).as("sum_ltv"))
        .orderBy("bucket")
    }),

    "q_event_dau" -> ((s, d) => {
      // DAU / trailing-7-day WAU / stickiness — the product-health
      // rollup. Distinct counts never merge across pre-aggregates, so
      // WAU cannot roll up from daily distincts: instead each (day,
      // user) membership fans out to the 7 exposure days it is
      // WAU-visible on (GraftOps.slidingMembership — the SAME definition
      // as q_win_sliding's Expand, width 7 days, slide 1, labeled by
      // window END; bounded ×7, never a window over users), then one
      // count_distinct per day. stickiness_e6 = dau·10⁶ DIV wau, exact
      // Long. Shape: one (day, user) dedup exchange, the ×7 map-side
      // fan-out, one day-keyed distinct aggregation — days-sized output,
      // AQE-broadcast join.
      val du = ems(s, d)
        .select(expr("ems div 86400000").as("day"), col("user_id"))
        .distinct()
      val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = graft.api.GraftOps
        .slidingMembership(du, "day", width = 7L, slide = 1L, outCol = "ws")
        .select((col("ws") + 6L).as("day"), col("user_id"))
        .groupBy("day").agg(count_distinct(col("user_id")).as("wau"))
      dau.join(wau, Seq("day"))
        .withColumn("stickiness_e6", expr("dau * 1000000 DIV wau"))
        .orderBy("day")
    }),

    "q_event_cohort" -> ((s, d) => {
      // Weekly cohort retention: cohort = epoch-aligned week of the user's
      // FIRST event (integer ms-div — deterministic, tz-free), retention
      // cell = distinct users active week_offset weeks later. Per-user
      // cohort is a whole-partition window min (one user_id exchange, no
      // first-event join-back); the cell rollup is the one further shuffle
      // any (cohort, offset) grouping needs.
      val e = ems(s, d).withColumn("wk", expr("ems div 604800000"))
      e.withColumn("cwk", min(col("wk")).over(Window.partitionBy("user_id")))
        .groupBy(col("cwk").as("cohort_week"),
                 (col("wk") - col("cwk")).as("week_offset"))
        .agg(count_distinct(col("user_id")).as("users"))
        .orderBy("cohort_week", "week_offset")
    }),

    "q_event_churn" -> ((s, d) => {
      // Weekly churn rate — q_event_cohort's operational inverse: the
      // cohort matrix reads "of the week-w signups, how many came back
      // k weeks later"; this reads "of EVERYONE active in week w, how
      // many were gone by w+1" — the single per-week number an ops
      // dashboard alerts on. Retained = active in the IMMEDIATELY next
      // epoch week (the strict-adjacency reading; a user skipping a week
      // counts as churned for w, re-acquired later — deliberate, and
      // the last fixture week right-censors to all-churned like every
      // trailing-window metric). Shape: one (user, week) distinct
      // rollup (map-side partial combine), a user-partitioned lead()
      // whose partitions are bounded by a user's distinct WEEKS (never
      // events), one week-keyed rollup; churn_ppm exact Long. See
      // [[weeklyChurn]] (factored so specs drive crafted timelines).
      weeklyChurn(ems(s, d))
    }),

    "q_event_concentration" -> ((s, d) => {
      // Traffic-concentration KPI: what share of all events comes from the
      // top-50 users — the Pareto check behind bot filtering and per-user
      // rate caps (a handful of accounts dominating a crawl or event feed
      // is the first thing an ingest audit looks for). Shape: one user-
      // keyed count aggregation, top-50 via orderBy+limit (TakeOrdered-
      // AndProject — never a users-wide rank window), a 1-row rollup of
      // the bounded top block, and corpus totals attached as scalar
      // subqueries on the 1-row spine (the q_dedup_rate rule — no join
      // node). share_e6 is exact Long: top_events·10⁶ DIV n_events.
      concentration(ems(s, d), 50)
    }),

    "q_event_diversity" -> ((s, d) => {
      // Behavioral-diversity screen — q_event_concentration's per-user
      // complement: bots and scripted accounts repeat ONE action, humans
      // mix them. Diversity is the Gini-Simpson index 1 − Σnᵢ²/N² in
      // EXACT integer ppm (Shannon entropy needs log — float drift; the
      // Simpson form is the log-free diversity with the same monotone
      // reading): single-type users score 0, uniform k-type users
      // approach 1e6·(1−1/k). Shape: one (user, type) aggregation, one
      // user-keyed rollup, map-side diversity + fixed decile bucket,
      // ≤10-cell output. Long envelope: ss·10⁶ ≤ N²·10⁶ < 2⁶³ holds to
      // ~3e6 events/user — DECIMAL(38) swap shape-free past it (the
      // q_event_anomaly rule).
      diversityHistogram(ems(s, d))
    }),

    "q_event_bursts" -> ((s, d) => {
      // Per-user PEAK burst rate — the rate-limit/abuse screen beside
      // q_event_diversity: each user's maximum events in any single
      // tumbling 5-minute bucket, rolled into a fixed power-of-two
      // histogram (1, 2–3, 4–7, 8–15, 16+). A human's peak sits in the
      // low cells; scripted traffic tops out. Shape: one (user, bucket)
      // aggregation, one user-keyed max, a CASE bucket (identical
      // literal tree both engines — no log2 float), ≤5-cell output.
      burstHistogram(ems(s, d))
    }),

    "q_event_new_users" -> ((s, d) => {
      // Daily NEW vs RETURNING split — growth accounting one level below
      // q_event_dau: a user is new on the epoch-day of their first event
      // (whole-partition window min, the q_event_cohort rule — no
      // first-event join-back), returning otherwise. One user_id
      // exchange carries the min; the day rollup counts each distinct
      // user once per day with a conditional distinct for the new side.
      newVsReturning(ems(s, d))
    }),

    "q_event_error_rate" -> ((s, d) =>
      // Hourly error-COMPOSITION trend — the SRE view beside
      // q_event_anomaly's volume z-score: total events, error events,
      // and the error share in exact ppm per hour (volume spikes with a
      // flat error share are load; a climbing share is a defect). One
      // hourly keyed aggregation with a conditional count; output is
      // hours-sized (8,760 rows/year) at any event volume.
      ems(s, d)
        .groupBy(expr("ems div 3600000").as("hour"))
        .agg(count(lit(1)).as("n"),
             sum(when(col("event_type") === "error", 1L).otherwise(0L))
               .as("n_error"))
        .withColumn("error_ppm", expr("n_error * 1000000 DIV n"))
        .orderBy("hour"))
  )

  /** q_event_bursts core over rows with (user_id, ems). */
  private[graft] def burstHistogram(e: DataFrame): DataFrame =
    e.groupBy(col("user_id"), expr("ems div 300000").as("w"))
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id").agg(max("n").as("peak"))
      .withColumn("bucket",
        when(col("peak") >= 16, 4).when(col("peak") >= 8, 3)
          .when(col("peak") >= 4, 2).when(col("peak") >= 2, 1)
          .otherwise(0))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_users"), max("peak").as("max_peak"))
      .orderBy("bucket")

  /** q_event_new_users core over rows with (user_id, ems). */
  private[graft] def newVsReturning(e: DataFrame): DataFrame =
    e.withColumn("day", expr("ems div 86400000"))
      .withColumn("d0", min(col("day")).over(Window.partitionBy("user_id")))
      .groupBy("day")
      .agg(count_distinct(col("user_id")).as("dau"),
           count_distinct(when(col("day") === col("d0"), col("user_id")))
             .as("new_users"))
      .withColumn("returning", col("dau") - col("new_users"))
      .orderBy("day")

  /** q_event_diversity core over rows with (user_id, event_type):
    * Gini-Simpson 1 − Σnᵢ²/N² per user in exact ppm, rolled into the
    * fixed decile histogram. Factored for crafted specs. */
  private[graft] def diversityHistogram(e: DataFrame): DataFrame =
    e.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(sum("n").as("tot"), sum(expr("n * n")).as("ss"))
      .withColumn("div_e6", expr("1000000 - ss * 1000000 DIV (tot * tot)"))
      .groupBy(expr("div_e6 DIV 100000").as("decile"))
      .agg(count(lit(1)).as("n_users"), sum("tot").as("n_events"))
      .orderBy("decile")

  /** q_event_concentration core over rows with a `user_id` column: 1-row
    * (n_users, n_events, top_users, top_events, share_e6) where the top
    * block is the k highest-count users (count desc, user_id asc
    * tiebreak) and share_e6 = top_events·10⁶ DIV n_events exact. Factored
    * so specs can drive crafted user distributions past the k edge. */
  private[graft] def concentration(e: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.scalarSubquery
    val c = e.groupBy("user_id").agg(count(lit(1)).as("n"))
    c.orderBy(col("n").desc, col("user_id")).limit(k)
      .agg(count(lit(1)).as("top_users"), sum("n").as("top_events"))
      .withColumn("n_users", scalarSubquery(c.agg(count(lit(1)))))
      .withColumn("n_events", scalarSubquery(e.agg(count(lit(1)))))
      .withColumn("share_e6", expr("top_events * 1000000 DIV n_events"))
      .select("n_users", "n_events", "top_users", "top_events", "share_e6")
      .orderBy("n_users")
  }

  def oracles: Map[String, String] = Map(
    "q_join_asof" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_ms(ts) AS ems,
        |         CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END AS tag,
        |         CASE WHEN event_type = 'signup' THEN epoch_ms(ts) END AS s_ms
        |  FROM events WHERE event_type IN ('signup', 'purchase'))
        |SELECT event_id, user_id, purchase_ms, signup_ms FROM (
        |  SELECT event_id, user_id, ems AS purchase_ms, tag,
        |         last_value(s_ms IGNORE NULLS) OVER (
        |           PARTITION BY user_id ORDER BY ems, tag, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS signup_ms
        |  FROM e) WHERE tag = 1
        |ORDER BY event_id""".stripMargin,

    "q_join_asof_nearest" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_ms(ts) AS ems,
        |         CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END AS tag,
        |         CASE WHEN event_type = 'signup' THEN epoch_ms(ts) END AS s_ms
        |  FROM events WHERE event_type IN ('signup', 'purchase')),
        |a AS (
        |  SELECT event_id, user_id, ems, tag,
        |         last_value(s_ms IGNORE NULLS) OVER wp AS prior_ms,
        |         first_value(s_ms IGNORE NULLS) OVER wn AS next_ms
        |  FROM e
        |  WINDOW wp AS (PARTITION BY user_id ORDER BY ems, tag, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wn AS (PARTITION BY user_id ORDER BY ems, tag, event_id
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_id, user_id, ems AS purchase_ms,
        |       CASE WHEN prior_ms IS NULL THEN next_ms
        |            WHEN next_ms IS NULL THEN prior_ms
        |            WHEN ems - prior_ms <= next_ms - ems THEN prior_ms
        |            ELSE next_ms END AS signup_ms
        |FROM a WHERE tag = 1
        |ORDER BY event_id""".stripMargin,

    "q_join_asof_forward" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_ms(ts) AS ems,
        |         CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END AS tag,
        |         CASE WHEN event_type = 'signup' THEN epoch_ms(ts) END AS s_ms
        |  FROM events WHERE event_type IN ('signup', 'purchase'))
        |SELECT event_id, user_id, purchase_ms, signup_ms FROM (
        |  SELECT event_id, user_id, ems AS purchase_ms, tag,
        |         first_value(s_ms IGNORE NULLS) OVER (
        |           PARTITION BY user_id ORDER BY ems, tag DESC, event_id
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |           AS signup_ms
        |  FROM e) WHERE tag = 1
        |ORDER BY event_id""".stripMargin,

    "q_win_tumbling" ->
      """SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS ws_ms,
        |       event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM events GROUP BY 1, 2 ORDER BY ws_ms, event_type""".stripMargin,

    "q_win_sliding" ->
      """SELECT ws_ms, count(*) AS n FROM (
        |  SELECT epoch_ms(time_bucket(INTERVAL '30 minutes', ts))
        |         - k * 1800000 AS ws_ms
        |  FROM events, unnest([0, 1]) AS t(k))
        |GROUP BY ws_ms ORDER BY ws_ms""".stripMargin,

    "q_session_windows" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ems FROM events),
        |g AS (SELECT user_id, ems,
        |             CASE WHEN ems - lag(ems) OVER (PARTITION BY user_id ORDER BY ems)
        |                    >= 1800000
        |                  OR lag(ems) OVER (PARTITION BY user_id ORDER BY ems) IS NULL
        |             THEN 1 ELSE 0 END AS new_s
        |      FROM e),
        |i AS (SELECT user_id, ems,
        |             sum(new_s) OVER (PARTITION BY user_id ORDER BY ems
        |                              ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM g)
        |SELECT user_id, min(ems) AS s_ms, max(ems) AS e_ms, count(*) AS n
        |FROM i GROUP BY user_id, sid ORDER BY user_id, s_ms""".stripMargin,

    "q_event_concurrency" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ems FROM events),
        |g AS (SELECT user_id, ems,
        |             CASE WHEN ems - lag(ems) OVER (PARTITION BY user_id ORDER BY ems)
        |                    >= 1800000
        |                  OR lag(ems) OVER (PARTITION BY user_id ORDER BY ems) IS NULL
        |             THEN 1 ELSE 0 END AS new_s
        |      FROM e),
        |i AS (SELECT user_id, ems,
        |             sum(new_s) OVER (PARTITION BY user_id ORDER BY ems
        |                              ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM g),
        |sess AS (SELECT user_id, min(ems) AS s_ms, max(ems) AS e_ms
        |         FROM i GROUP BY user_id, sid),
        |h AS (SELECT user_id,
        |             unnest(range(s_ms // 3600000, e_ms // 3600000 + 1)) AS hour
        |      FROM sess)
        |SELECT hour, count(*) AS active_sessions,
        |       count(DISTINCT user_id) AS active_users
        |FROM h GROUP BY hour ORDER BY hour""".stripMargin,

    "q_session_stats" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ems FROM events),
        |g AS (SELECT user_id, ems,
        |             CASE WHEN ems - lag(ems) OVER (PARTITION BY user_id ORDER BY ems)
        |                    >= 1800000
        |                  OR lag(ems) OVER (PARTITION BY user_id ORDER BY ems) IS NULL
        |             THEN 1 ELSE 0 END AS new_s
        |      FROM e),
        |i AS (SELECT user_id, ems,
        |             sum(new_s) OVER (PARTITION BY user_id ORDER BY ems
        |                              ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM g),
        |sess AS (SELECT max(ems) - min(ems) AS dur, count(*) AS n
        |         FROM i GROUP BY user_id, sid),
        |b AS (SELECT dur, n,
        |             CASE WHEN n = 1 THEN 0
        |                  WHEN dur < 60000 THEN 1
        |                  WHEN dur < 600000 THEN 2
        |                  WHEN dur < 1800000 THEN 3
        |                  WHEN dur < 3600000 THEN 4
        |                  ELSE 5 END AS bucket
        |      FROM sess)
        |SELECT CAST(bucket AS INTEGER) AS bucket, count(*) AS n_sessions,
        |       CAST(sum(dur) AS BIGINT) AS sum_dur_ms,
        |       CAST(sum(n) AS BIGINT) AS n_events,
        |       max(dur) AS max_dur_ms,
        |       CAST(sum(dur) // count(*) AS BIGINT) AS mean_dur_ms,
        |       CAST(sum(n) * 1000 // count(*) AS BIGINT) AS mean_events_e3
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_dedup_exact" ->
      """SELECT user_id, event_type, event_id, epoch_ms(ts) AS ems
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id, event_type
        |                           ORDER BY epoch_ms(ts), event_id) = 1
        |ORDER BY user_id, event_type""".stripMargin,

    "q_stream_dedup" ->
      """SELECT user_id, event_type, event_id
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id, event_type
        |                           ORDER BY epoch_ms(ts), event_id) = 1
        |ORDER BY user_id, event_type""".stripMargin,

    "q_event_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ems
        |           FROM events),
        |a AS (SELECT *, min(CASE WHEN event_type = 'view' THEN ems END)
        |               OVER (PARTITION BY user_id) AS v_ms FROM e),
        |b AS (SELECT *, min(CASE WHEN event_type = 'click' AND ems >= v_ms
        |                         THEN ems END)
        |               OVER (PARTITION BY user_id) AS c_ms FROM a),
        |c AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ems >= c_ms
        |                         THEN ems END)
        |               OVER (PARTITION BY user_id) AS p_ms FROM b),
        |u AS (SELECT user_id, max(v_ms) AS v_ms, max(c_ms) AS c_ms,
        |             max(p_ms) AS p_ms FROM c GROUP BY user_id),
        |t AS (SELECT count(v_ms) AS nv, count(c_ms) AS nc,
        |             count(p_ms) AS np FROM u)
        |SELECT 1 AS stage_idx, 'view' AS stage, nv AS users FROM t
        |UNION ALL SELECT 2, 'click', nc FROM t
        |UNION ALL SELECT 3, 'purchase', np FROM t
        |ORDER BY stage_idx""".stripMargin,

    // same sequencing CTEs as q_event_funnel; quantile_cont interpolates
    // identically to the engine's exact-quantile path (the
    // q_stats_outliers parity)
    "q_event_funnel_time" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ems
        |           FROM events),
        |a AS (SELECT *, min(CASE WHEN event_type = 'view' THEN ems END)
        |               OVER (PARTITION BY user_id) AS v_ms FROM e),
        |b AS (SELECT *, min(CASE WHEN event_type = 'click' AND ems >= v_ms
        |                         THEN ems END)
        |               OVER (PARTITION BY user_id) AS c_ms FROM a),
        |c AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ems >= c_ms
        |                         THEN ems END)
        |               OVER (PARTITION BY user_id) AS p_ms FROM b),
        |u AS (SELECT user_id, max(v_ms) AS v_ms, max(c_ms) AS c_ms,
        |             max(p_ms) AS p_ms FROM c GROUP BY user_id),
        |l AS (
        |  SELECT 'view_to_click' AS transition, c_ms - v_ms AS lag_ms
        |  FROM u WHERE c_ms IS NOT NULL
        |  UNION ALL
        |  SELECT 'click_to_purchase', p_ms - c_ms
        |  FROM u WHERE p_ms IS NOT NULL)
        |SELECT transition, count(*) AS n_users,
        |       quantile_cont(lag_ms, 0.5) AS p50_ms,
        |       quantile_cont(lag_ms, 0.9) AS p90_ms
        |FROM l GROUP BY transition ORDER BY transition""".stripMargin,

    "q_event_anomaly" ->
      """WITH h AS (
        |  SELECT epoch_ms(ts) // 3600000 AS hr, count(*) AS n
        |  FROM events GROUP BY 1),
        |w AS (
        |  SELECT hr, n,
        |         count(n) OVER f AS trail_c,
        |         sum(n) OVER f AS trail_s,
        |         sum(n*n) OVER f AS trail_q
        |  FROM h
        |  WINDOW f AS (ORDER BY hr ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT hr, n, trail_c,
        |       TRY_CAST(trail_s AS BIGINT) AS trail_s,
        |       TRY_CAST(trail_q AS BIGINT) AS trail_q,
        |       (trail_c = 24 AND n*trail_c > trail_s
        |        AND (n*trail_c - trail_s)*(n*trail_c - trail_s)*(trail_c - 1)
        |            > 9*trail_c*(trail_c*trail_q - trail_s*trail_s))
        |         AS is_anomaly
        |FROM w ORDER BY hr""".stripMargin,

    "q_event_attribution" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_ms(ts) AS ems,
        |         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS tag,
        |         CASE WHEN event_type = 'click' THEN epoch_ms(ts) END AS c_ms,
        |         CASE WHEN event_type = 'click' THEN event_id END AS c_id
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |a AS (
        |  SELECT event_id, user_id, ems, tag,
        |         last_value(c_ms IGNORE NULLS) OVER w AS lc_ms,
        |         last_value(c_id IGNORE NULLS) OVER w AS lc_id
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ems, tag, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, ems AS purchase_ms,
        |       CASE WHEN lc_ms IS NOT NULL AND ems - lc_ms <= 3600000
        |            THEN lc_id END AS click_id,
        |       CASE WHEN lc_ms IS NOT NULL AND ems - lc_ms <= 3600000
        |            THEN ems - lc_ms END AS lag_ms
        |FROM a WHERE tag = 1
        |ORDER BY event_id""".stripMargin,

    "q_event_gaps" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_ms(ts) AS ems FROM events),
        |g AS (
        |  SELECT ems - lag(ems) OVER (PARTITION BY user_id
        |           ORDER BY ems, event_id) AS gap
        |  FROM e),
        |b AS (
        |  SELECT gap,
        |         CASE WHEN gap < 1000 THEN 0
        |              WHEN gap < 10000 THEN 1
        |              WHEN gap < 60000 THEN 2
        |              WHEN gap < 600000 THEN 3
        |              WHEN gap < 3600000 THEN 4
        |              WHEN gap < 86400000 THEN 5
        |              ELSE 6 END AS bucket
        |  FROM g WHERE gap IS NOT NULL)
        |SELECT CAST(bucket AS INTEGER) AS bucket, count(*) AS n,
        |       CAST(sum(gap) AS BIGINT) AS sum_gap_ms,
        |       min(gap) AS min_gap_ms, max(gap) AS max_gap_ms,
        |       CAST(sum(gap) // count(*) AS BIGINT) AS mean_gap_ms
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_event_transitions" ->
      """WITH p AS (
        |  SELECT event_type AS src_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |           ORDER BY epoch_ms(ts), event_id) AS dst_type
        |  FROM events),
        |t AS (SELECT src_type, dst_type, count(*) AS n FROM p
        |      WHERE dst_type IS NOT NULL GROUP BY 1, 2)
        |SELECT src_type, dst_type, n,
        |       CAST(n * 1000000 // sum(n) OVER (PARTITION BY src_type)
        |            AS BIGINT) AS p_e6
        |FROM t ORDER BY src_type, dst_type""".stripMargin,

    "q_event_paths" ->
      """WITH p AS (
        |  SELECT event_type AS s1,
        |         lead(event_type, 1) OVER w AS s2,
        |         lead(event_type, 2) OVER w AS s3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
        |t AS (SELECT s1, s2, s3, count(*) AS n FROM p
        |      WHERE s3 IS NOT NULL GROUP BY 1, 2, 3),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM t)
        |SELECT s1, s2, s3, CAST(n AS BIGINT) AS n,
        |       CAST(n * 1000000 // t AS BIGINT) AS share_ppm
        |FROM t, tot
        |ORDER BY n DESC, s1, s2, s3 LIMIT 10""".stripMargin,

    "q_event_seasonality" ->
      """SELECT (epoch_ms(ts) // 3600000) % 24 AS hour_utc,
        |       ((epoch_ms(ts) // 86400000) + 4) % 7 AS dow,
        |       count(*) AS n,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY dow, hour_utc""".stripMargin,

    "q_event_ltv" ->
      """WITH u AS (
        |  SELECT user_id,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS ltv,
        |         count(*) AS n_events
        |  FROM events GROUP BY user_id)
        |SELECT CAST(floor(ltv / 100) AS BIGINT) AS bucket,
        |       count(*) AS n_users,
        |       CAST(sum(n_events) AS BIGINT) AS n_events,
        |       CAST(sum(CAST(ltv AS DECIMAL(18,2))) AS DOUBLE) AS sum_ltv
        |FROM u GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q_event_dau" ->
      """WITH e AS (SELECT DISTINCT epoch_ms(ts) // 86400000 AS day, user_id
        |           FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM e GROUP BY day),
        |w AS (SELECT day + off AS day, user_id
        |      FROM e, unnest([0, 1, 2, 3, 4, 5, 6]) t(off)),
        |wau AS (SELECT day, count(DISTINCT user_id) AS wau
        |        FROM w GROUP BY day)
        |SELECT dau.day, CAST(dau.dau AS BIGINT) AS dau,
        |       CAST(wau.wau AS BIGINT) AS wau,
        |       CAST(dau.dau * 1000000 // wau.wau AS BIGINT) AS stickiness_e6
        |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin,

    "q_event_cohort" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) // 604800000 AS wk
        |           FROM events),
        |a AS (SELECT user_id, wk,
        |             min(wk) OVER (PARTITION BY user_id) AS cwk FROM e)
        |SELECT cwk AS cohort_week, wk - cwk AS week_offset,
        |       count(DISTINCT user_id) AS users
        |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_event_churn" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id, epoch_ms(ts) // 604800000 AS wk
        |  FROM events),
        |r AS (
        |  SELECT wk,
        |         CASE WHEN lead(wk) OVER (PARTITION BY user_id
        |                                  ORDER BY wk) = wk + 1
        |              THEN 1 ELSE 0 END AS ret
        |  FROM uw)
        |SELECT wk, count(*) AS n_active,
        |       CAST(sum(ret) AS BIGINT) AS n_retained,
        |       CAST((count(*) - sum(ret)) * 1000000 // count(*) AS BIGINT)
        |         AS churn_ppm
        |FROM r GROUP BY wk ORDER BY wk""".stripMargin,

    "q_event_concentration" ->
      """WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
        |top AS (SELECT count(*) AS top_users,
        |               CAST(sum(n) AS BIGINT) AS top_events
        |        FROM (SELECT n, user_id FROM c
        |              ORDER BY n DESC, user_id LIMIT 50))
        |SELECT (SELECT count(*) FROM c) AS n_users,
        |       (SELECT count(*) FROM events) AS n_events,
        |       top_users, top_events,
        |       CAST(top_events * 1000000
        |            // (SELECT count(*) FROM events) AS BIGINT) AS share_e6
        |FROM top ORDER BY n_users""".stripMargin,

    "q_event_diversity" ->
      """WITH ut AS (SELECT user_id, event_type, count(*) AS n
        |            FROM events GROUP BY 1, 2),
        |u AS (SELECT user_id, CAST(sum(n) AS BIGINT) AS tot,
        |             CAST(sum(n * n) AS BIGINT) AS ss
        |      FROM ut GROUP BY user_id),
        |d AS (SELECT tot,
        |             1000000 - ss * 1000000 // (tot * tot) AS div_e6
        |      FROM u)
        |SELECT CAST(div_e6 // 100000 AS BIGINT) AS decile,
        |       count(*) AS n_users,
        |       CAST(sum(tot) AS BIGINT) AS n_events
        |FROM d GROUP BY 1 ORDER BY decile""".stripMargin,

    "q_event_bursts" ->
      """WITH b AS (SELECT user_id, epoch_ms(ts) // 300000 AS w,
        |                  count(*) AS n
        |           FROM events GROUP BY 1, 2),
        |p AS (SELECT user_id, CAST(max(n) AS BIGINT) AS peak
        |      FROM b GROUP BY user_id)
        |SELECT CAST(CASE WHEN peak >= 16 THEN 4 WHEN peak >= 8 THEN 3
        |                 WHEN peak >= 4 THEN 2 WHEN peak >= 2 THEN 1
        |                 ELSE 0 END AS INTEGER) AS bucket,
        |       count(*) AS n_users,
        |       CAST(max(peak) AS BIGINT) AS max_peak
        |FROM p GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q_event_new_users" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
        |         min(epoch_ms(ts) // 86400000)
        |           OVER (PARTITION BY user_id) AS d0
        |  FROM events)
        |SELECT day, count(DISTINCT user_id) AS dau,
        |       count(DISTINCT CASE WHEN day = d0 THEN user_id END)
        |         AS new_users,
        |       CAST(count(DISTINCT user_id)
        |            - count(DISTINCT CASE WHEN day = d0 THEN user_id END)
        |            AS BIGINT) AS returning
        |FROM e GROUP BY day ORDER BY day""".stripMargin,

    "q_event_error_rate" ->
      """SELECT epoch_ms(ts) // 3600000 AS hour, count(*) AS n,
        |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_error,
        |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |            * 1000000 // count(*) AS BIGINT) AS error_ppm
        |FROM events GROUP BY 1 ORDER BY hour""".stripMargin
  )
}
