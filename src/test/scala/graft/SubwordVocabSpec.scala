package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Contract for the corpus-trained subword vocabulary (VERDICT r12 #5):
  * the hash-checked derivation (q_text_vocab_train) against hand-derived
  * crafted corpora, the runtime PieceTable / subword_count_vocab
  * expression against the fixture tokenizer and hand counts, and the
  * no_oracle trained twin's determinism + fertility-improvement gates.
  */
class SubwordVocabSpec extends SparkSpec {
  import spark.implicits._

  test("vocabTopPieces: hand-derived scores, ranks, and ties on a " +
       "crafted word table") {
    // "abab"×2: pieces ab(2 occ),ba(1),aba(1),bab(1),abab(1) — each ×2
    // "bc"×3  : piece bc ×3
    val words = Seq(("abab", 2L), ("bc", 3L)).toDF("w", "n")
    val got = operators.TextQueries.vocabTopPieces(words)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // scores: ab=4, bc=3, and 2-point pieces tie-broken lexically
    assert(got == Seq(
      (1L, "ab", 4L), (2L, "bc", 3L), (3L, "aba", 2L), (4L, "abab", 2L),
      (5L, "ba", 2L), (6L, "bab", 2L)))
  }

  test("vocab derivation is deterministic across partitionings") {
    val words = (1L to 200L).map(i => (s"w${i % 37}ord", i % 5 + 1L))
      .toDF("w", "n").groupBy("w").agg(sum("n").as("n"))
    val a = operators.TextQueries.vocabTopPieces(words.repartition(3))
      .collect().toSeq
    val b = operators.TextQueries.vocabTopPieces(words.repartition(7))
      .collect().toSeq
    assert(a == b)
  }

  test("PieceTable with the fixture pieces reproduces SubwordTokenizer " +
       "exactly (200 random strings)") {
    val table = new graft.functions.PieceTable(
      graft.functions.SubwordTokenizer.Pieces)
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val s = (1 to rnd.nextInt(60)).map(_ =>
        "abcdefghijklmnopqrstuvwxyz 0123".charAt(rnd.nextInt(31))).mkString
      val u = UTF8String.fromString(s)
      assert(table.count(u) == graft.functions.SubwordTokenizer.count(u), s)
    }
  }

  test("subword_count_vocab: hand counts under a crafted vocab, and " +
       "greedy longest-match wins") {
    import graft.functions.expressions.SubwordFunctions.subword_count_vocab
    val df = Seq("thethe x", "abcd", "").toDF("t")
    // vocab {the, th}: "thethe x" → the|the|x = 3; "abcd" → 4 singles;
    // "" → 0
    val got = df.select(subword_count_vocab(col("t"),
      Seq("the", "th")).as("n")).as[Long].collect().toSeq
    assert(got == Seq(3L, 4L, 0L))
    // vocab {abcd} consumes "abcd" whole; "thethe x" falls back to 7
    // single-char pieces (the space costs none)
    val got2 = df.select(subword_count_vocab(col("t"),
      Seq("abcd")).as("n")).as[Long].collect().toSeq
    assert(got2 == Seq(7L, 1L, 0L))
  }

  test("trained twin: deterministic repeat, fertility improves on the " +
       "fixture vocab, and the vocab artifact round-trips") {
    val q = operators.TextQueries.queries("q_text_subwords_trained")
    val a = q(spark, sf).collect().toSeq
    val b = q(spark, sf).collect().toSeq
    assert(a == b)
    // budget-for-budget (same K) the corpus-derived vocab must tokenize
    // the corpus into FEWER pieces per word than the public-frequency
    // fixture vocab — the point of training it
    val trained = q(spark, sf).agg(avg("fertility_e6")).head.getDouble(0)
    val fixture = operators.TextQueries.queries("q_text_subwords")(spark, sf)
      .agg(avg("fertility_e6")).head.getDouble(0)
    assert(trained < fixture,
      s"trained fertility $trained not better than fixture $fixture")
    val pieces = Seq("q_text_vocab_train").map(
      operators.TextQueries.queries).map(_(spark, sf).count()).head
    assert(pieces == operators.TextQueries.TrainedVocabK)
  }
}
