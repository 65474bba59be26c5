package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: batch plan-vs-exec attribution over MANY query keys in one
  * JVM (PlanProbe does one key per JVM — at 216 keys the sbt/session
  * startup dwarfs the measurement).
  *
  *   sbt "runMain graft.tools.PlanSplit all /root/testdata/sf0.1 3"
  *   sbt "runMain graft.tools.PlanSplit q_stats_covariance,q_text_bm25"
  *
  * For each key and each of N fresh runs it times:
  *   build — SparkEntry.queries(key)(spark, dir)   (DataFrame construction:
  *           Scala closures, expr() parsing, fanOut's getNumPartitions)
  *   plan  — .queryExecution.executedPlan          (analysis + optimization
  *           + physical planning + codegen source gen)
  *   exec  — .count()                              (execution incl. AQE
  *           replanning and task run)
  * and prints the per-key MIN of each component plus their sum, sorted by
  * total descending — the bench-minimum attribution table the optimization
  * rounds act on. Output is one aligned text line per key plus a JSON line
  * (key -> [build, plan, exec] minima) for tooling.
  *
  * Phases/artifacts: the standard bench warmup phases run first (catalog +
  * index/model layers at the measured dir) so per-key numbers are
  * query-only cost, mirroring Bench's attribution.
  */
object PlanSplit {
  def main(args: Array[String]): Unit = {
    val keysArg = if (args.nonEmpty) args(0) else "all"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = graft.SparkEntry.queries
    val keys =
      if (keysArg == "all") all.keys.toSeq.sorted
      else keysArg.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    val unknown = keys.filterNot(all.keySet)
    require(unknown.isEmpty, s"unknown keys: ${unknown.mkString(",")}")

    // bench-equivalent warm state: catalog stats + index/model phases at
    // the measured dir, plus one run of each requested key to absorb
    // codegen JIT — so the timed fresh runs see the bench's warm floor
    graft.api.CatalogOps.registerFixture(spark, dir)
    (graft.operators.DedupQueries.indexPhases(spark, dir) ++
     graft.operators.EventTimeQueries.lagPhases(spark, dir) ++
     graft.operators.SimilarityQueries.trainPhases(spark, dir) ++
     graft.operators.TextQueries.trainPhases(spark, dir) ++
     graft.operators.StatsQueries.statsPhases(spark, dir))
      .foreach { case (_, f, _) =>
        try { f(); () } catch { case _: Throwable => () }
      }
    keys.foreach { k =>
      try { all(k)(spark, dir).count(); () } catch { case _: Throwable => () }
    }

    final case class Split(build: Double, plan: Double, exec: Double) {
      def total: Double = build + plan + exec
    }
    val out = keys.flatMap { k =>
      try {
        val runs = (1 to n).map { _ =>
          System.gc()
          val t0 = System.nanoTime()
          val df = all(k)(spark, dir)
          val t1 = System.nanoTime()
          df.queryExecution.executedPlan
          val t2 = System.nanoTime()
          df.count()
          val t3 = System.nanoTime()
          Split((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
        }
        Some(k -> Split(runs.map(_.build).min, runs.map(_.plan).min,
          runs.map(_.exec).min))
      } catch {
        case t: Throwable =>
          System.err.println(s"[plansplit] $k failed: ${t.toString.take(200)}")
          None
      }
    }
    val sorted = out.sortBy(-_._2.total)
    println(f"${"key"}%-34s ${"build"}%7s ${"plan"}%7s ${"exec"}%7s ${"total"}%7s")
    sorted.foreach { case (k, s) =>
      println(f"$k%-34s ${s.build}%7.3f ${s.plan}%7.3f ${s.exec}%7.3f ${s.total}%7.3f")
    }
    val sb = sorted.map { case (k, s) =>
      f""""$k":[${s.build}%.3f,${s.plan}%.3f,${s.exec}%.3f]"""
    }.mkString("{", ",", "}")
    println("PLANSPLIT_JSON " + sb)
    println(f"TOTALS build=${out.map(_._2.build).sum}%.2f " +
      f"plan=${out.map(_._2.plan).sum}%.2f exec=${out.map(_._2.exec).sum}%.2f")
    spark.stop()
  }
}
