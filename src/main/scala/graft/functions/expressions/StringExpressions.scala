package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{StringMetrics, TypoHash}

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

object StringFunctions {
  /** Column API for the native unrestricted Damerau-Levenshtein. */
  def damerau_levenshtein(a: Column, b: Column): Column =
    toColumn(DamerauLevenshtein(toExpression(a), toExpression(b)))

  /** Column API for the fused deletion-variant bucket keys. */
  def deletion_variant_hashes(name: Column, seed: Column): Column =
    toColumn(DeletionVariantHashes(toExpression(name), toExpression(seed)))
}
