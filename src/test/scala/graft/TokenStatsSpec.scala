package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.TokenStats
import graft.functions.expressions.StringFunctions.{token_count, token_term_count}

/** The fused per-row token kernels (graft.functions.TokenStats) against
  * their definitional references: `token_count` must equal
  * `size(split(text, ' '))` (limit -1 — trailing empties kept) and
  * `token_term_count` must equal the explode-filter-count the BM25 tf
  * stage used before the rewrite, on every edge the split contract has
  * (empty string, leading/trailing/double spaces, multi-byte tokens).
  */
class TokenStatsSpec extends SparkSpec {

  private val cases = Seq(
    "", " ", "  ", "a", "a b", " a b ", "a  b", "dup dup dup",
    "dup dupx xdup dup", "日本 ab 日本", "a\tb", "trailing ", " leading")

  private def kc(s: String): Long =
    TokenStats.tokenCount(UTF8String.fromString(s))

  private def ktc(s: String, t: String): Long =
    TokenStats.termCount(UTF8String.fromString(s), UTF8String.fromString(t))

  test("tokenCount = size(split(text, ' ')) on every split edge case") {
    import spark.implicits._
    val got = cases.toDF("s")
      .select(token_count($"s").as("k"),
              size(split($"s", " ")).cast("long").as("ref"))
      .collect()
    got.zip(cases).foreach { case (r, s) =>
      assert(r.getLong(0) == r.getLong(1), s"text='$s'")
      assert(kc(s) == r.getLong(1), s"static text='$s'")
    }
  }

  test("termCount = explode-filter count (empty tokens, multi-byte, " +
       "substring-vs-token discrimination)") {
    import spark.implicits._
    for (term <- Seq("dup", "a", "", "日本")) {
      val ref = cases.toDF("s")
        .select(col("s"), explode(split(col("s"), " ")).as("tok"))
        .filter(col("tok") === term)
        .groupBy("s").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      cases.foreach { s =>
        assert(ktc(s, term) == ref.getOrElse(s, 0L), s"text='$s' term='$term'")
      }
    }
    // substring occurrences are NOT token matches
    assert(ktc("dupdup dup", "dup") == 1L)
  }

  test("the SQL surface evaluates the same kernels") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT token_count('a  b'), token_term_count('dup x dup', 'dup')")
      .first()
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
  }
}
