package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{C4Clean, SimHash, StringMetrics, TokenStats, TypoHash}

/** Native unrestricted Damerau-Levenshtein distance (see
  * [[graft.functions.StringMetrics]] for the algorithm and the
  * variant-parity contract with DuckDB's `damerau_levenshtein`).
  *
  * An Expression rather than a UDF for the usual reason: the verifier
  * sits in the hot path of a blocked entity-resolution join — one call
  * per candidate pair — and a codegen'd static call keeps the whole
  * verify stage in generated code where a Scala UDF would box every row.
  * Spark ships `levenshtein` but not the transposition-aware variant the
  * dedup literature uses for typos; this closes that gap natively.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"damerau_levenshtein requires string inputs, got " +
          s"${l.simpleString} / ${r.simpleString}")
    }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    StringMetrics.damerau(a.asInstanceOf[UTF8String],
                          b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.StringMetrics.damerau($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "damerau_levenshtein"
}

/** Native fused SymSpell deletion-variant bucket keys — array<long> of
  * sorted-unique hashes for {name} ∪ del1 ∪ del2, seeded with a hash of
  * the blocking attributes (see [[graft.functions.TypoHash]] for the
  * O(L²)-total rolling-hash arithmetic that replaced the r11
  * substring-concat lambdas). A codegen'd Expression for the same reason
  * as [[DamerauLevenshtein]]: it sits on the candidate-generation hot
  * path of the typo dedup (one call per catalog row) and a static call
  * keeps the variant stage inside whole-stage codegen.
  */
case class DeletionVariantHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"deletion_variant_hashes requires (string, bigint) inputs, got " +
          s"${l.simpleString} / ${r.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any, b: Any): Any =
    TypoHash.deletionVariantHashes(a.asInstanceOf[UTF8String],
                                   b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TypoHash.deletionVariantHashes($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DeletionVariantHashes =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "deletion_variant_hashes"
}

/** Native whitespace-token count — `size(split(text, ' '))` without
  * materializing the array (see [[graft.functions.TokenStats]] for the
  * split-parity contract). Sits on per-document corpus-statistics
  * paths (BM25 `dl`, corpus token totals) where the array allocation
  * per row is pure waste.
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"token_count requires a string input, got ${t.simpleString}")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    TokenStats.tokenCount(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.TokenStats.tokenCount($a)")

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)

  override def prettyName: String = "token_count"
}

/** Native per-term token frequency — occurrences of `term` among the
  * document's whitespace tokens, one fused scan, no token array and no
  * explode. The BM25 `tf` kernel: with this and [[TokenCount]] the
  * whole per-document statistics block stays inside whole-stage
  * codegen and the corpus never becomes token ROWS at all.
  */
case class TokenTermCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"token_term_count requires string inputs, got " +
          s"${l.simpleString} / ${r.simpleString}")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    TokenStats.termCount(a.asInstanceOf[UTF8String],
                         b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TokenStats.termCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenTermCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "token_term_count"
}

/** Native 60-bit SimHash over the whitespace-token multiset (see
  * [[graft.functions.SimHash]] for the parity contract with the
  * relational explode → md5long → majority definition). Per-row for
  * the usual reason: the fingerprint is a pure function of one
  * document, and computing it in the projection keeps the corpus from
  * ever becoming token rows.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"simhash60 requires a string input, got ${t.simpleString}")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    SimHash.simhash60(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.SimHash.simhash60($a)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)

  override def prettyName: String = "simhash60"
}

/** Native per-document bigram hash counts — array<struct<h1,h2,c>> of
  * the document's DISTINCT adjacent-token pairs keyed exactly like
  * Spark's `xxhash64(w1)` / `xxhash64(w1, w2)` (see
  * [[graft.functions.TokenStats.bigramHashCounts]] for the chained-seed
  * parity contract). Per-row for the same reason as [[SimHash60]]: the
  * bigram fan-out is the most expensive map pass of the conditional-
  * surprisal filter, and fusing tokenize + pair + hash + in-doc count
  * into one codegen'd scan keeps the corpus from ever materializing
  * token strings or per-position zip structs.
  */
case class BigramHashCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bigram_hash_counts requires a string input, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("h1", LongType, nullable = false),
      StructField("h2", LongType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(a: Any): Any =
    TokenStats.bigramHashCounts(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.TokenStats.bigramHashCounts($a)")

  override protected def withNewChildInternal(newChild: Expression): BigramHashCounts =
    copy(child = newChild)

  override def prettyName: String = "bigram_hash_counts"
}

/** Native fused C4-clean statistics — struct(clean_text, n_lines,
  * n_lines_kept, n_tokens_clean) in one compiled pass per document (see
  * [[graft.functions.C4Clean]] for the exact-parity contract with the
  * HOF cascade it replaces). An Expression rather than a UDF for the
  * q_text_clean hot path: the clean gate pushes to the scan, so this
  * kernel runs inside the scan stage's whole-stage codegen — a Scala
  * UDF there would box every document and fence the stage.
  */
case class C4CleanStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"c4_clean_stats requires a string input, got ${t.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("n_lines_kept", LongType, nullable = false),
    StructField("n_tokens_clean", LongType, nullable = false)))

  override def nullSafeEval(a: Any): Any =
    C4Clean.cleanStats(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.C4Clean.cleanStats($a)")

  override protected def withNewChildInternal(newChild: Expression): C4CleanStats =
    copy(child = newChild)

  override def prettyName: String = "c4_clean_stats"
}

/** The doc-gate twin of [[C4CleanStats]] — n_tokens_clean alone, never
  * assembling the cleaned text (the pushed-down scan filter consumes
  * only the count; see [[graft.functions.C4Clean.cleanTokens]]).
  */
case class C4CleanTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"c4_clean_tokens requires a string input, got ${t.simpleString}")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    C4Clean.cleanTokens(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.C4Clean.cleanTokens($a)")

  override protected def withNewChildInternal(newChild: Expression): C4CleanTokens =
    copy(child = newChild)

  override def prettyName: String = "c4_clean_tokens"
}

object StringFunctions {
  /** Column API for the native unrestricted Damerau-Levenshtein. */
  def damerau_levenshtein(a: Column, b: Column): Column =
    toColumn(DamerauLevenshtein(toExpression(a), toExpression(b)))

  /** Column API for the fused deletion-variant bucket keys. */
  def deletion_variant_hashes(name: Column, seed: Column): Column =
    toColumn(DeletionVariantHashes(toExpression(name), toExpression(seed)))

  /** Column API for the native whitespace-token count. */
  def token_count(text: Column): Column =
    toColumn(TokenCount(toExpression(text)))

  /** Column API for the native per-term token frequency. */
  def token_term_count(text: Column, term: Column): Column =
    toColumn(TokenTermCount(toExpression(text), toExpression(term)))

  /** Column API for the native 60-bit token-multiset SimHash. */
  def simhash60(text: Column): Column =
    toColumn(SimHash60(toExpression(text)))

  /** Column API for the native per-doc bigram hash counts. */
  def bigram_hash_counts(text: Column): Column =
    toColumn(BigramHashCounts(toExpression(text)))

  /** Column API for the fused C4-clean statistics struct. */
  def c4_clean_stats(text: Column): Column =
    toColumn(C4CleanStats(toExpression(text)))

  /** Column API for the count-only C4-clean doc gate. */
  def c4_clean_tokens(text: Column): Column =
    toColumn(C4CleanTokens(toExpression(text)))
}
