package graft

import org.apache.spark.sql.functions._
import graft.api.Quantiles

/** graft.api.Quantiles — exact-quantile histogram refinement vs Spark's
  * values-buffering `percentile` builtin (the ground truth it replaces),
  * including forced multi-iteration refinement (tiny bins/leaf), point
  * masses, tiny groups, and the interpolation edge cases.
  */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val Ps = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)

  private def builtin(df: org.apache.spark.sql.DataFrame): Map[(String, Double), Double] =
    df.groupBy("g")
      .agg(percentile(col("v"), lit(Ps.head)).as("p0"),
           Ps.tail.map(p => percentile(col("v"), lit(p)).as(s"p$p")): _*)
      .collect()
      .flatMap(r => Ps.zipWithIndex.map { case (p, i) =>
        (r.getString(0), p) -> r.getDouble(i + 1) })
      .toMap

  private def refined(df: org.apache.spark.sql.DataFrame,
                      bins: Int, leaf: Int): Map[(String, Double), Double] =
    Quantiles.exactQuantiles(df, "g", "v", Ps, bins = bins, leaf = leaf)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap

  test("matches Spark percentile bit-for-bit on pseudo-random groups, " +
       "forced through multiple refinement iterations") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 5000).map { i =>
      val g = s"g${i % 3}"
      // mixed scales + exact duplicates to stress bin boundaries
      val v = if (i % 17 == 0) 250.0 else rnd.nextDouble() * 1e6 - 5e5
      (g, v)
    }
    val df = rows.toDF("g", "v").repartition(4)
    val exp = builtin(df)
    // leaf=8/bins=4 forces many iterations; leaf huge short-circuits to
    // a pure window extraction — both must agree with the builtin exactly
    for ((bins, leaf) <- Seq((4, 8), (16, 64), (4096, 1000000))) {
      val got = refined(df, bins, leaf)
      assert(got.keySet == exp.keySet)
      got.foreach { case (k, v) =>
        assert(java.lang.Double.compare(v, exp(k)) == 0,
          s"$k bins=$bins leaf=$leaf: got $v expected ${exp(k)}")
      }
    }
  }

  test("point-mass and single-row groups terminate and agree") {
    val rows = Seq.fill(500)(("mass", 7.25)) ++
      Seq(("one", 3.0)) ++
      (1 to 9).map(i => ("nine", i.toDouble))
    val df = rows.toDF("g", "v").repartition(3)
    val exp = builtin(df)
    val got = refined(df, bins = 4, leaf = 2)
    assert(got == exp)
  }

  test("nulls are ignored like percentile's") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)))
      .toDF("g", "v")
    val got = refined(df, bins = 4, leaf = 2)
    assert(got(("a", 0.5)) == 2.0 && got(("a", 1.0)) == 3.0)
  }

  test("a NULL group key is its own group (SQL GROUP BY semantics), " +
       "bit-equal to the builtin — ADVICE r11") {
    val df = Seq((Some("a"), 1.0), (Some("a"), 3.0), (None, 10.0),
                 (None, 20.0), (None, 30.0), (Some("b"), 5.0))
      .toDF("g", "v")
    // builtin() can't key a Map on null cleanly — compare via Option
    val exp = df.groupBy("g")
      .agg(percentile(col("v"), lit(0.5)).as("m"))
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    val got = Quantiles.exactQuantiles(df, "g", "v", Seq(0.5),
        bins = 4, leaf = 2)
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(2)).toMap
    assert(got == exp, s"got $got expected $exp")
    assert(got(None) == 20.0)
  }

  test("large-input pin: 1e6 rows x 3 groups at leaf=1024/bins=16 " +
       "(>=3 refinement iterations by construction) bit-equals the builtin") {
    // deterministic pseudo-random doubles from xxhash64 — no RNG state,
    // spread over ~[0, 1e6); ~333k rows per group, so candidate counts
    // shrink 333k -> ~21k -> ~1.3k -> <=1024: three histogram iterations
    // before leaf extraction (the last new-engine surface without a
    // large-input pin — VERDICT r11 #6)
    val df = spark.range(1000000L)
      .select(concat(lit("g"), (col("id") % 3)).as("g"),
        (pmod(xxhash64(col("id")), lit(1000000000L)) / lit(1000.0)).as("v"))
    val exp = builtin(df)
    val got = refined(df, bins = 16, leaf = 1024)
    assert(got.keySet == exp.keySet)
    got.foreach { case (k, v) =>
      assert(java.lang.Double.compare(v, exp(k)) == 0,
        s"$k: got $v expected ${exp(k)}")
    }
  }

  test("high-cardinality group guard: a directed error routes to the " +
       "approx twin instead of collecting an unbounded group array") {
    val df = Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles(df, "g", "v", Seq(0.5), maxGroups = 2)
    }
    assert(e.getMessage.contains("percentile_approx"), e.getMessage)
  }

  test("q_stats_outliers_approx fences agree with the exact twin on the fixture") {
    val exact = SparkEntry.queries("q_stats_outliers")(spark, sf)
      .select("l_returnflag", "n", "n_outliers").as[(String, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    val approx = SparkEntry.queries("q_stats_outliers_approx")(spark, sf)
      .select("l_returnflag", "n", "n_outliers").as[(String, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (g, (_, n, out)) =>
      val (_, nA, outA) = approx(g)
      assert(nA == n)
      // sketch accuracy 10000 on sf0.001 → quartiles near-exact; the
      // fence count may shift by at most a small boundary band
      assert(math.abs(outA - out) <= math.max(2L, n / 100),
        s"$g: approx outliers $outA vs exact $out of $n")
    }
  }
}
