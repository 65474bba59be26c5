package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.TextQueries

/** Fused single-pass C4-style clean kernel — the per-row engine behind
  * `q_text_clean`, replacing the interpreted HOF cascade
  * (transform/filter/aggregate with four `regexp_replace` per line plus
  * two `split` re-tokenizations) with one compiled scan per document.
  *
  * Semantics are BIT-IDENTICAL to the HOF spelling it replaces (pinned
  * by the differential property spec in C4CleanSpec):
  *   - lines = `split(text, '\n')` with limit -1 (trailing empties kept;
  *     byte-level split is Unicode-safe — 0x0A never occurs inside a
  *     multi-byte UTF-8 sequence);
  *   - per line, the [[TextQueries.scrubCol]] cascade in its load-bearing
  *     order email → IPv4 → formatted-phone → digit-run, via the same
  *     `java.util.regex` machinery `regexp_replace` uses
  *     (`Matcher.replaceAll` ≡ the appendReplacement loop, including
  *     `$1`/`$7` group references);
  *   - keep a line iff `size(split(line, ' ')) >= CleanMinLineTokens`
  *     (= space count + 1, split-limit -1 parity) and its
  *     `UTF8String.toLowerCase` (exactly Spark's `lower`) contains no
  *     boilerplate marker;
  *   - outputs: kept lines re-joined with '\n', line/kept/token counts.
  *
  * Why it is faster than the cascade at identical semantics: the regex
  * passes are GATED on cheap byte scans — the email pattern cannot match
  * a line with no '@', and the IP/phone patterns cannot match a line
  * with no digit, so for typical prose lines all four engines are
  * skipped entirely (regexp_replace pays a full backtracking scan per
  * position even when nothing matches); the token count is a byte scan,
  * not a materialized array; and nothing allocates per line unless a
  * regex actually fires. At 100 TB this kernel keeps the clean pass a
  * pure zero-shuffle projection (its whole point), just with ~1 cheap
  * pass per document instead of ~6 interpreted ones.
  */
object C4Clean {

  private val emailP = Pattern.compile(TextQueries.EmailRe)
  private val ipP = Pattern.compile(TextQueries.IpRe)
  private val phoneFmtP = Pattern.compile(TextQueries.PhoneFmtRe)
  private val phoneP = Pattern.compile(TextQueries.PhoneRe)

  private val markers: Array[UTF8String] =
    TextQueries.CleanBoilerplate.map(UTF8String.fromString).toArray

  private val minLineTokens = TextQueries.CleanMinLineTokens

  /** One regexp_replace with a find() pre-probe: identical result to
    * `Matcher.replaceAll` (which Spark's RegExpReplace append-loop
    * matches), but returns the input object untouched when nothing
    * matches — no rebuild allocation on the common path. */
  private def replace(s: String, p: Pattern, rep: String): String = {
    val m = p.matcher(s)
    if (m.find()) {
      val sb = new java.lang.StringBuilder
      m.reset()
      while (m.find()) m.appendReplacement(sb, rep)
      m.appendTail(sb)
      sb.toString
    } else s
  }

  /** struct(clean_text, n_lines, n_lines_kept, n_tokens_clean) for one
    * document. */
  def cleanStats(text: UTF8String): GenericInternalRow = {
    val out = new java.lang.StringBuilder
    val counts = core(text, out)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(out.toString),
      counts(0), counts(1), counts(2)))
  }

  /** n_tokens_clean alone — the doc-gate kernel: identical scrub/keep
    * walk, but never assembles the cleaned output (the pushed-down scan
    * filter consumes only the count, and building + discarding an
    * O(doc)-sized string per scanned row there was pure waste — review
    * finding on the round-12 kernel). CleanTokensSpec-pinned ≡
    * cleanStats.n_tokens_clean. */
  def cleanTokens(text: UTF8String): Long = core(text, null)(2)

  /** Shared walk: returns (n_lines, n_lines_kept, n_tokens_clean);
    * appends kept lines to `out` when non-null. */
  private def core(text: UTF8String, out: java.lang.StringBuilder): Array[Long] = {
    val bytes = text.getBytes // one copy; per-line slices wrap this array
    val n = bytes.length
    // the no-regex fast path returns the line's original BYTES; the HOF
    // cascade it must mirror round-trips every line through
    // java.lang.String (StringSplit/RegExpReplace rebuild via toString
    // even when nothing matches), which substitutes U+FFFD for invalid
    // UTF-8 — so on a malformed input (parquet never validates string
    // bytes) take the same String round-trip on every line (review
    // finding on the round-12 kernel; valid inputs round-trip
    // bit-identically, so the slice is safe exactly when `isValid`)
    val valid = text.isValid
    var nLines = 0L
    var nKept = 0L
    var nTokens = 0L
    var lineStart = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == 0x0A) {
        nLines += 1L
        // cheap pre-scan of the raw line bytes: which regex families
        // can possibly fire, and where the spaces are if none can
        var hasAt = false
        var hasDigit = false
        var spaces = 0L
        var j = lineStart
        while (j < i) {
          val b = bytes(j)
          if (b == '@') hasAt = true
          else if (b >= '0' && b <= '9') hasDigit = true
          else if (b == 0x20) spaces += 1L
          j += 1
        }
        var lineU: UTF8String = null
        if (!hasAt && !hasDigit && valid) {
          // no regex can change this line: slice the original bytes
          // (byte offsets are safe — 0x0A is never a continuation byte)
          lineU = UTF8String.fromBytes(bytes, lineStart, i - lineStart)
        } else if (!hasAt && !hasDigit) {
          // malformed doc: String round-trip for U+FFFD parity, no regex
          lineU = UTF8String.fromString(UTF8String
            .fromBytes(bytes, lineStart, i - lineStart).toString)
          // U+FFFD (3 bytes, none 0x20) replaces bytes that were never
          // spaces — but recount to stay exactly what the round-tripped
          // line's split sees
          spaces = 0L
          val m = lineU.numBytes()
          var k = 0
          while (k < m) {
            if (lineU.getByte(k) == 0x20) spaces += 1L
            k += 1
          }
        } else {
          var s = UTF8String
            .fromBytes(bytes, lineStart, i - lineStart).toString
          if (hasAt) s = replace(s, emailP, "<EMAIL>")
          if (hasDigit) {
            s = replace(s, ipP, "<IP>")
            s = replace(s, phoneFmtP, TextQueries.PhoneFmtReplSpark)
            s = replace(s, phoneP, "<PHONE>")
          }
          lineU = UTF8String.fromString(s)
          // token count on the SCRUBBED line (replacements can change
          // spacing only via removed digits — count spaces post-scrub,
          // exactly what size(split(scrubbed, ' ')) sees)
          spaces = 0L
          val m = lineU.numBytes()
          var k = 0
          while (k < m) {
            if (lineU.getByte(k) == 0x20) spaces += 1L
            k += 1
          }
        }
        val tokens = spaces + 1L
        if (tokens >= minLineTokens) {
          val lower = lineU.toLowerCase
          var boiler = false
          var mi = 0
          while (!boiler && mi < markers.length) {
            if (lower.contains(markers(mi))) boiler = true
            mi += 1
          }
          if (!boiler) {
            if (out != null) {
              if (nKept > 0L) out.append('\n')
              out.append(lineU.toString)
            }
            nKept += 1L
            nTokens += tokens
          }
        }
        lineStart = i + 1
      }
      i += 1
    }
    Array(nLines, nKept, nTokens)
  }
}
