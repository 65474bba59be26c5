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
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    // per-run cluster-side truth: jobs launched, tasks run, summed task
    // runtime — a wall-fast re-run that launched no tasks did not
    // re-execute (it served cached/reused state), and the probe should
    // say so rather than let the wall time masquerade as execution cost
    val jobs = new AtomicInteger; val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
      }
    })
    def drain(): (Int, Int, Long) = {
      // private listener bus — a short settle sleep is enough at probe
      // scale (listener events for a finished job land within ms)
      Thread.sleep(300)
      (jobs.getAndSet(0), tasks.getAndSet(0), taskMs.getAndSet(0L))
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
        f"jobs=$j tasks=$t taskTime=${ms / 1e3}%.2f s")
    }
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
