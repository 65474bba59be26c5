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

  test("simhash60 kernel = the relational explode/md5long/majority " +
       "definition, on edge cases AND the fixture corpus") {
    import spark.implicits._
    import graft.functions.expressions.StringFunctions.simhash60
    import graft.functions.TextHash.md5long
    def relational(docs: org.apache.spark.sql.DataFrame) = {
      val tok = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
        .select(col("doc_id"), md5long(col("t")).as("h"), col("c"))
      val bitSums = tok.groupBy("doc_id").agg(
        sum(when(expr("(h >> 0) & 1") === 1, col("c")).otherwise(-col("c"))).as("sb0"),
        (1 until 60).map(j =>
          sum(when(expr(s"(h >> $j) & 1") === 1, col("c")).otherwise(-col("c"))).as(s"sb$j")): _*)
      bitSums.select(col("doc_id"),
        (0 until 60).map(j =>
          when(col(s"sb$j") > 0, lit(1L << j)).otherwise(0L))
          .reduce(_ + _).as("ref"))
    }
    val edges = cases.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "text")
    val fixture = Tables.documents(spark, sf).select("doc_id", "text")
    for (docs <- Seq(edges, fixture)) {
      val got = docs.select(col("doc_id"), simhash60(col("text")).as("k"))
        .join(relational(docs), "doc_id")
        .filter(col("k") =!= col("ref"))
      assert(got.count() == 0L, got.collect().take(3).mkString("; "))
    }
  }

  test("bigram_hash_counts kernel = the relational slice/zip/xxhash64 " +
       "fan-out, on edge cases AND the fixture corpus (bit-identical keys)") {
    import spark.implicits._
    import graft.functions.expressions.StringFunctions.bigram_hash_counts
    // the exact pre-rewrite relational shape: per-position bigrams via
    // slice ×2 + arrays_zip, Spark's own xxhash64 (h1 = hash(w1),
    // h2 = chained hash(w1, w2)), counted per (doc, h1, h2)
    def relational(docs: org.apache.spark.sql.DataFrame) = {
      val ts = split(col("text"), " ")
      val nTok = size(ts)
      docs.select(col("doc_id"),
          explode(arrays_zip(
            slice(ts, lit(1), nTok - 1),
            slice(ts, lit(2), nTok - 1))).as("b"))
        .select(col("doc_id"),
          xxhash64(col("b").getField("0")).as("h1"),
          xxhash64(col("b").getField("0"), col("b").getField("1")).as("h2"))
        .groupBy("doc_id", "h1", "h2").agg(count(lit(1)).as("c"))
    }
    def kernel(docs: org.apache.spark.sql.DataFrame) =
      docs.select(col("doc_id"),
          explode(bigram_hash_counts(col("text"))).as("b"))
        .select(col("doc_id"), col("b.h1").as("h1"),
                col("b.h2").as("h2"), col("b.c").as("c"))
    val edges = cases.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "text")
    val fixture = Tables.documents(spark, sf).select("doc_id", "text")
    for (docs <- Seq(edges, fixture)) {
      val k = kernel(docs)
      val r = relational(docs)
      // exact row-set equality both directions: same keys, same counts
      assert(k.exceptAll(r).count() == 0L && r.exceptAll(k).count() == 0L,
        k.exceptAll(r).collect().take(3).mkString("; "))
    }
    // single-token and empty docs emit no bigrams (empty array, not null)
    val deg = Seq((0L, ""), (1L, "solo")).toDF("doc_id", "text")
      .select(size(bigram_hash_counts(col("text"))).as("n")).collect()
    assert(deg.forall(_.getInt(0) == 0))
  }
}
