package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.C4Clean
import graft.operators.TextQueries

/** The fused C4-clean kernel (graft.functions.C4Clean) against the HOF
  * cascade it replaced ([[TextQueries.cleanHof]]) — the differential pin
  * that lets q_text_clean ride the kernel. Two layers:
  *
  *  1. adversarial hand cases hitting every rule boundary (regex
  *     families, the scrub ORDER, line/doc gates, split-limit edges,
  *     multi-byte text, boilerplate casing);
  *  2. the real sf0.001 documents fixture, full table, row-for-row.
  *
  * Equality is bit-exact on all four output columns.
  */
class C4CleanSpec extends SparkSpec {

  private val cases = Seq(
    // regex families, one per line, with enough tokens to pass the gate
    "mail me at bob.smith+x@ex-ample.co today please ok",
    "server at 10.0.255.3 and also at 1.2.3.4 responded fine",
    "call (555) 123-4567 or +1 555 123 4567 now please",
    "bare local 555-0123. and decimal 123.4567 stay apart ok",
    "long run 12345678901 scrubbed but 123456 is kept here",
    // scrub ORDER is load-bearing: the IP pass must fire before the
    // digit-run pass can eat the octets
    "ip 192.168.100.200 then digits 99887766554433 in one line ok",
    // email whose domain looks like an IP — email pass runs first
    "contact user@1.2.3.4 about the 10.0.0.1 box please ok",
    // line gate: exactly 4 tokens (dropped), exactly 5 (kept)
    "one two three four",
    "one two three four five",
    // boilerplate markers, mixed case, mid-line
    "This Site Uses COOKIE banners every single visit sadly",
    "enable JavaScript to continue reading this article now",
    "Lorem Ipsum dolor sit amet consectetur adipiscing elit",
    "all rights reserved by the example media company 2020",
    // doc gate boundary feeders: short remains
    "tiny doc",
    // split-limit -1 edges: empty lines, trailing newline, double spaces
    "", " ", "a  b c d e f", "trailing space line here ok ",
    // multi-byte text around scrubbed spans
    "日本語のテキスト with an email 日本@例え.jp inside it ok",
    "числа 12345678 и текст вокруг них в одной строке да",
    // multiple lines per doc exercising reassembly order
    "first kept line with plenty of tokens here\nshort line\n" +
      "second kept line also with plenty of tokens",
    "\n\nleading empties then a kept line with many tokens\n\n",
    // a phone at line start/end (context groups at ^ and $)
    "555-0123 starts this line with enough tokens after",
    "this line ends with enough tokens before 555-0123")

  private def docsDf = {
    import spark.implicits._
    cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("kernel ≡ HOF cascade on adversarial hand cases") {
    val k = TextQueries.clean(docsDf).orderBy("doc_id").collect()
    val h = TextQueries.cleanHof(docsDf).orderBy("doc_id").collect()
    assert(k.length == h.length,
      s"row counts differ: kernel ${k.length} vs hof ${h.length}")
    k.zip(h).foreach { case (a, b) => assert(a == b, s"\n$a\nvs\n$b") }
  }

  test("kernel ≡ HOF cascade on the full documents fixture") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val k = TextQueries.clean(docs).orderBy("doc_id").collect()
    val h = TextQueries.cleanHof(docs).orderBy("doc_id").collect()
    assert(k.length == h.length && k.nonEmpty,
      s"row counts differ: kernel ${k.length} vs hof ${h.length}")
    k.zip(h).foreach { case (a, b) => assert(a == b, s"\n$a\nvs\n$b") }
  }

  test("kernel ≡ HOF cascade on generated adversarial corpora (fixed " +
       "seeds, rule-dense alphabet)") {
    import spark.implicits._
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    // tokens drawn from every rule family so the generated lines are
    // DENSE in boundary collisions (a phone beside a decimal, an email
    // beside an IP, markers in odd casing, multi-byte words, empty
    // tokens via double spaces)
    val tok = Gen.frequency(
      6 -> Gen.oneOf("alpha", "beta", "Gamma", "δέλτα", "日本語", "x"),
      2 -> Gen.oneOf("a@b.co", "bob.smith+x@ex.org", "u@1.2.3.4"),
      2 -> Gen.oneOf("10.0.0.1", "255.255.255.255", "1.2.3.4.5"),
      2 -> Gen.oneOf("555-0123", "(555) 123-4567", "+1 555 123 4567",
        "123.4567", "2020-2024", "3.1234567"),
      2 -> Gen.oneOf("1234567", "12345678901", "123456"),
      1 -> Gen.oneOf("COOKIE", "JavaScript", "Lorem", "ipsum",
        "privacy Policy", "terms"),
      1 -> Gen.oneOf("", " ", "."))
    val line = Gen.choose(0, 9)
      .flatMap(n => Gen.listOfN(n, tok)).map(_.mkString(" "))
    val doc = Gen.choose(1, 6)
      .flatMap(n => Gen.listOfN(n, line)).map(_.mkString("\n"))
    val docs = (1L to 120L).map(i => (i, sample(doc, i))).toDF("doc_id", "text")
    val k = TextQueries.clean(docs).orderBy("doc_id").collect()
    val h = TextQueries.cleanHof(docs).orderBy("doc_id").collect()
    assert(k.length == h.length)
    k.zip(h).foreach { case (a, b) => assert(a == b, s"\n$a\nvs\n$b") }
  }

  test("cleanTokens ≡ cleanStats.n_tokens_clean (the doc-gate contract: " +
       "the count-only gate admits exactly the projected survivors)") {
    (cases :+ cases.mkString("\n")).foreach { s =>
      val u = UTF8String.fromString(s)
      assert(C4Clean.cleanTokens(u) == C4Clean.cleanStats(u).getLong(3),
        s"text='$s'")
    }
  }

  test("kernel ≡ HOF cascade on malformed UTF-8 (parquet never validates " +
       "string bytes; the fast path must take the String round-trip)") {
    import spark.implicits._
    // invalid sequences: lone continuation byte, truncated 3-byte lead,
    // overlong-ish lead — embedded in otherwise-kept prose lines, one
    // with a digit (regex path) and one without (fast path, the case
    // the byte-slice would get wrong)
    val bad = Seq(
      Array[Byte]('o', 'n', 'e', ' ', 0x80.toByte, ' ', 't', 'w', 'o',
        ' ', 'x', ' ', 'y', ' ', 'z'),
      Array[Byte]('1', '2', ' ', 0xE2.toByte, 0x28.toByte, ' ', 'a',
        ' ', 'b', ' ', 'c', ' ', 'd'),
      Array[Byte]('a', ' ', 'b', ' ', 'c', ' ', 'd', ' ', 0xC3.toByte,
        '\n', 'e', ' ', 'f', ' ', 'g', ' ', 'h', ' ', 'i'))
    val df = bad.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("doc_id", "raw")
      .select(col("doc_id"), col("raw").cast("string").as("text"))
    val k = TextQueries.clean(df).orderBy("doc_id").collect()
    val h = TextQueries.cleanHof(df).orderBy("doc_id").collect()
    assert(k.length == h.length)
    k.zip(h).foreach { case (a, b) => assert(a == b, s"\n$a\nvs\n$b") }
  }

  test("the SQL surface evaluates the same kernel") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT c4_clean_stats('one two three four five\ntiny').n_lines " +
        "AS nl, c4_clean_stats('one two three four five').n_tokens_clean " +
        "AS nt").first()
    assert(r.getLong(0) == 2L && r.getLong(1) == 5L)
  }

  test("static kernel matches the expression surface on edge strings") {
    // the expression routes through the same static, but pin the static
    // on strings the DataFrame layer can't easily carry (lone newline)
    val r = C4Clean.cleanStats(UTF8String.fromString("\n"))
    assert(r.getLong(1) == 2L && r.getLong(2) == 0L && r.getLong(3) == 0L)
    val empty = C4Clean.cleanStats(UTF8String.fromString(""))
    assert(empty.getLong(1) == 1L && empty.getLong(3) == 0L)
  }
}
