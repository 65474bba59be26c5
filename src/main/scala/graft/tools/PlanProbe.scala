package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev harness: time a named query N times and dump its executed plan.
  *
  *   sbt "runMain graft.tools.PlanProbe q_stats_covariance /root/testdata/sf0.1 3"
  *
  * Prints one RUN line per iteration (first = cold incl. codegen) and the
  * AQE-final physical plan — the loop the bench can't give per-query.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    // trailing k=v args become runtime SQL confs (set AFTER session
    // build, before any plan) — for bisecting codegen/AQE constants,
    // e.g. spark.sql.codegen.wholeStage=false
    val confs = args.drop(3).filter(_.contains('='))
      .map { a => val Array(k, v) = a.split("=", 2); (k, v) }
    // same parallelism knob as Bench: the probe exists to explain bench
    // numbers, so it must run under the bench's session shape
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // k=v args land on the BUILDER (static confs like
    // spark.sql.codegen.cache.maxEntries reject a post-build set)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    confs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // per-run cluster-side truth: jobs launched, tasks run, summed task
    // runtime — a wall-fast re-run that launched no tasks did not
    // re-execute (it served cached/reused state), and the probe should
    // say so rather than let the wall time masquerade as execution cost
    val jobs = new AtomicInteger; val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    // per-stage accounting (r18): stageId -> (name, nTasks, taskMs,
    // deserializeMs, gcMs) — printed when SPARK_GRAFT_PROBE_STAGES=1, the
    // "which stage eats the CPU seconds" lens job totals can't give
    val stageAgg = new java.util.concurrent.ConcurrentHashMap[
      Int, (String, Int, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) {
          taskMs.addAndGet(t.taskInfo.duration)
          val de = if (t.taskMetrics != null)
            t.taskMetrics.executorDeserializeTime else 0L
          val gc = if (t.taskMetrics != null)
            t.taskMetrics.jvmGCTime else 0L
          stageAgg.merge(t.stageId, ("", 1, t.taskInfo.duration, de, gc),
            (a, b) => (a._1, a._2 + b._2, a._3 + b._3, a._4 + b._4,
              a._5 + b._5))
        }
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        stageAgg.merge(i.stageId,
          (i.name.takeWhile(_ != '\n').take(90), 0, 0L, 0L, 0L),
          (a, b) => (if (b._1.nonEmpty) b._1 else a._1,
            a._2 + b._2, a._3 + b._3, a._4 + b._4, a._5 + b._5))
      }
    })
    val probeStages = sys.env.get("SPARK_GRAFT_PROBE_STAGES").contains("1")
    def dumpStages(): Unit = if (probeStages) {
      import scala.jdk.CollectionConverters._
      stageAgg.asScala.toSeq.sortBy(-_._2._3).take(12).foreach {
        case (id, (name, n, ms, de, gc)) =>
          println(f"  STAGE $id%4d tasks=$n%3d taskTime=${ms / 1e3}%7.2f s " +
            f"deser=${de / 1e3}%5.2f s gc=${gc / 1e3}%5.2f s  $name")
      }
      stageAgg.clear()
    }
    def drain(): (Int, Int, Long) = {
      // private listener bus — a short settle sleep is enough at probe
      // scale (listener events for a finished job land within ms)
      Thread.sleep(300)
      (jobs.getAndSet(0), tasks.getAndSet(0), taskMs.getAndSet(0L))
    }
    // janino compilation truth per run: count + cumulative ms from
    // Spark's codegen metrics (JVM-wide) — the "did this fresh rebuild
    // recompile or cache-hit" answer (r18)
    val cgT = org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME
    var cgCount0 = cgT.getCount
    def cgDelta(): Long = {
      val c = cgT.getCount; val d = c - cgCount0; cgCount0 = c; d
    }
    val df = graft.SparkEntry.queries(key)(spark, dir)
    drain()
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      df.collect()
      val w = (System.nanoTime() - t0) / 1e9
      val (j, t, ms) = drain()
      println(f"RUN$i $w%.3f s  jobs=$j tasks=$t taskTime=${ms / 1e3}%.2f s")
    }
    // FRESH runs rebuild the DataFrame each time — the bench's shape
    // (rebuilding is mandatory there: re-collecting an AQE plan reuses
    // its materialized shuffle stages, which would understate execution).
    // Splitting tPlan (analysis+optimization+physical planning, up to
    // executedPlan) from tExec (collect) shows how much of a bench
    // minimum is a fixed driver-side planning constant vs the scale
    // term. JIT/codegen of generated classes lands in tExec on the
    // first fresh run and is cached (by generated source) after.
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      val fresh = graft.SparkEntry.queries(key)(spark, dir)
      fresh.queryExecution.executedPlan
      val t1 = System.nanoTime()
      fresh.collect()
      val t2 = System.nanoTime()
      val (j, t, ms) = drain()
      println(f"FRESH$i plan ${(t1 - t0) / 1e9}%.3f s  " +
        f"exec ${(t2 - t1) / 1e9}%.3f s  " +
        f"jobs=$j tasks=$t taskTime=${ms / 1e3}%.2f s codegenCompiles=${cgDelta()}")
      dumpStages()
    }
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
