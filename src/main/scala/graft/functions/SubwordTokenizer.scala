package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Deterministic subword tokenizer for context-window budgets — the
  * tokenizer-faithful replacement for the old ceil(len/4) estimate behind
  * q_pack_docs / q_chunk_docs.
  *
  * Algorithm: greedy longest-match over a fixed piece vocabulary — the
  * WordPiece matching rule (the public BERT-family tokenizer's inference
  * algorithm): at each position take the LONGEST vocabulary piece that
  * matches, else emit the single character as its own piece and advance.
  * Whitespace is a hard boundary (pieces never span it) and costs no
  * pieces. Chosen over merge-rank BPE deliberately: per-position greedy
  * matching is a pure function of (word, position), so the DuckDB oracle
  * mirrors it EXACTLY with a recursive scan ([[duckWordTokens]]) — the
  * merge-rank loop's evolving symbol list has no such set-based mirror,
  * and a budget column that the oracle cannot recompute bit-for-bit
  * would drop pack/chunk out of the hash-checked set.
  *
  * The vocabulary is the fixture merge table: the highest-frequency
  * English letter pairs/trigrams/quads from public frequency tables
  * (Norvig's Google-corpus n-gram counts), length 2–4, ASCII lowercase.
  * It is DATA both engines read from ONE definition — the engine compiles
  * [[Pieces]] into packed-int lookup sets, the oracle inlines
  * [[duckPieceList]] into its SQL — so the two tokenizations cannot
  * diverge silently. Swapping in a production vocab (e.g. a GPT-2 merge
  * dump re-expressed as its piece strings) is a data change, not a code
  * change.
  *
  * Scale: counting is one forward pass per string, O(bytes × MaxPiece)
  * byte compares, no allocation — runs inside whole-stage codegen via
  * [[graft.functions.expressions.SubwordCount]].
  */
object SubwordTokenizer {

  /** Longest piece length in bytes (and code points — pieces are ASCII). */
  val MaxPiece = 4

  /** The piece vocabulary (beyond single characters, which are always
    * pieces of last resort). Order is irrelevant — matching is by longest
    * length, and equal-length matches at one position are necessarily the
    * same string. All pieces are lowercase ASCII letters, length 2–4,
    * duplicate-free (asserted at class load).
    */
  val Pieces: Seq[String] = Seq(
    // quads: frequent English tetragrams (tion/ment/ther/with… per the
    // public frequency tables)
    "tion", "ment", "ther", "with", "ight", "ance", "ence", "able",
    "ound", "ever",
    // trigrams
    "the", "ing", "and", "ent", "ion", "for", "ter", "est", "ers", "his",
    "her", "ere", "ear", "our", "ate", "all", "ver", "con", "pro", "com",
    "per", "sta", "ist", "not", "are", "was", "you", "ore", "ave", "int",
    // bigrams
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
    "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar",
    "st", "to", "nt", "ng", "se", "ha", "as", "ou", "io", "le",
    "ve", "co", "me", "de", "hi", "ri", "ro", "ic", "ne", "ea",
    "ra", "ce", "li", "ch", "ll", "be", "ma", "si", "om", "ur")

  require(Pieces.distinct.size == Pieces.size, "duplicate vocabulary piece")
  require(Pieces.forall(p => p.length >= 2 && p.length <= MaxPiece &&
    p.forall(c => c >= 'a' && c <= 'z')), "pieces must be lowercase ASCII, len 2..4")

  /** [[Pieces]] compiled once — the JVM-global fixture lookup. */
  private val fixtureTable = new PieceTable(Pieces)

  /** Number of subword pieces in `s` under the FIXTURE vocabulary —
    * see [[PieceTable.count]] for the matching rule. Called from
    * generated code (static forwarder) — keep the signature stable.
    */
  def count(s: UTF8String): Long = fixtureTable.count(s)

  /** The vocabulary as a DuckDB list literal — the oracle's copy of the
    * merge table, interpolated from the SAME [[Pieces]] definition.
    */
  def duckPieceList: String =
    Pieces.map(p => s"'$p'").mkString("[", ", ", "]")

  /** Oracle building block: recursive-CTE SQL computing (w, wtoks) — the
    * greedy piece count per distinct word — from a CTE `wd(w)` of
    * non-empty words. The scan state is (word, position, pieces-so-far);
    * each step advances by the longest matching piece (list_max over the
    * matching piece lengths) or one code point, exactly [[count]]'s rule.
    * The caller's WITH must be declared RECURSIVE.
    */
  def duckWordTokens: String =
    s"""rec AS (
       |  SELECT w, 1 AS pos, CAST(0 AS BIGINT) AS toks FROM wd
       |  UNION ALL
       |  SELECT w, pos + adv, toks + 1 FROM (
       |    SELECT w, pos, toks,
       |           CAST(coalesce(list_max(list_transform(
       |                  list_filter($duckPieceList,
       |                              t -> substr(w, pos, length(t)) = t),
       |                  t -> length(t))), 1) AS INT) AS adv
       |    FROM rec WHERE pos <= length(w))),
       |wc AS (SELECT w, max(toks) AS wtoks FROM rec GROUP BY w)""".stripMargin
}

/** A piece vocabulary compiled to per-length lookup sets of packed-byte
  * keys: an L-byte window packs injectively into a Long (L ≤
  * [[PieceTable.MaxLen]] = 8 bytes — round 14 widened the packing from
  * Int/4 so COMPOSED vocabularies, the BPE merge outputs whose pieces
  * outgrow the fixture's length-4 cap by construction, compile into the
  * same table), so membership is one hash probe — no string allocation
  * on the hot path. The instance's greedy scan starts at ITS OWN longest
  * piece length, so a length-4 fixture table probes exactly the windows
  * it always did (bit-identical counts — q_text_subwords stays
  * hash-green). SERIALIZABLE so a runtime-vocab Catalyst expression can
  * ship a corpus-trained table to executors in its codegen reference
  * array (the fixture vocabulary stays JVM-global static state; a
  * trained vocabulary is per-plan MODEL state and must travel with the
  * plan).
  */
final class PieceTable(pieces: Seq[String]) extends Serializable {
  import PieceTable.MaxLen
  require(pieces.distinct.size == pieces.size, "duplicate vocabulary piece")
  require(pieces.forall(p => p.length >= 2 && p.length <= MaxLen &&
    p.forall(c => c >= 'a' && c <= 'z')),
    s"pieces must be lowercase ASCII, len 2..$MaxLen")

  /** This vocabulary's longest piece — where the greedy scan starts. */
  private val maxPiece: Int =
    if (pieces.isEmpty) 2 else pieces.map(_.length).max

  private val table: Array[java.util.HashSet[java.lang.Long]] = {
    val t = Array.fill(maxPiece + 1)(new java.util.HashSet[java.lang.Long]())
    pieces.foreach { p =>
      var k = 0L
      p.foreach(c => k = (k << 8) | (c.toInt & 0xffL))
      t(p.length).add(k)
    }
    t
  }

  /** Number of subword pieces in `s`, whitespace-separated words scanned
    * independently (a piece can never span a space: pieces contain no
    * space byte and matching is exact). Non-ASCII code points can never
    * match an ASCII piece, so each counts as ONE piece and is skipped
    * whole — byte-level advance stays on code-point boundaries, keeping
    * counts identical to the oracle's code-point arithmetic.
    */
  def count(s: UTF8String): Long = {
    val n = s.numBytes
    var i = 0
    var cnt = 0L
    while (i < n) {
      val b = s.getByte(i)
      if (b == ' ') { i += 1 }
      else {
        var matched = 0
        var len = maxPiece
        while (matched == 0 && len >= 2) {
          if (i + len <= n) {
            var k = 0L
            var j = 0
            while (j < len) { k = (k << 8) | (s.getByte(i + j) & 0xffL); j += 1 }
            if (table(len).contains(k)) matched = len
          }
          len -= 1
        }
        cnt += 1
        i += (if (matched > 0) matched
              else UTF8String.numBytesForFirstByte(b))
      }
    }
    cnt
  }
}

object PieceTable {
  /** Hard packing cap: 8 ASCII bytes fill a Long injectively. Vocabulary
    * derivations that can compose longer pieces (BPE merges) filter to
    * this cap before compiling a table. */
  val MaxLen = 8
}
