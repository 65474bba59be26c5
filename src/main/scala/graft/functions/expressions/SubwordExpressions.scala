package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.SubwordTokenizer

/** Native subword-piece count (see [[graft.functions.SubwordTokenizer]]
  * for the algorithm and the engine/oracle parity contract). An
  * Expression rather than a UDF for the usual reason: the count sits in
  * the per-document hot path of the pack/chunk budget queries, and a
  * codegen'd static call keeps the whole stage in generated code where a
  * Scala UDF would box every row through an encoder. The generated code
  * calls the tokenizer's static forwarder directly — the piece table is
  * JVM-global state, not per-plan state, so nothing needs capturing.
  */
case class SubwordCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"subword_count requires a string input, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(s: Any): Any =
    SubwordTokenizer.count(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SubwordTokenizer.count($c)")

  override protected def withNewChildInternal(newChild: Expression): SubwordCount =
    copy(child = newChild)

  override def prettyName: String = "subword_count"
}

/** [[SubwordCount]] with a RUNTIME vocabulary — the corpus-trained twin
  * (q_text_subwords_trained). The trained piece list is bounded MODEL
  * state (top-K strings, the KMeans-centroid contract), compiled once
  * per expression into a [[graft.functions.PieceTable]] and shipped to
  * executors through the codegen reference array (`addReferenceObj` —
  * the standard Catalyst route for driver-built lookup state; static
  * JVM state would not exist on a remote executor). Same matching rule,
  * same whole-stage-codegen residency as the fixture expression.
  */
case class SubwordCountVocab(child: Expression, pieces: Seq[String])
    extends UnaryExpression {

  @transient private lazy val table = new graft.functions.PieceTable(pieces)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"subword_count_vocab requires a string input, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(s: Any): Any =
    table.count(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pieceTable", table,
      classOf[graft.functions.PieceTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.count($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordCountVocab =
    copy(child = newChild)

  override def prettyName: String = "subword_count_vocab"
}

object SubwordFunctions {
  /** Column API for the native subword-piece count. */
  def subword_count(s: Column): Column =
    toColumn(SubwordCount(toExpression(s)))

  /** Column API for the runtime-vocabulary subword-piece count. */
  def subword_count_vocab(s: Column, pieces: Seq[String]): Column =
    toColumn(SubwordCountVocab(toExpression(s), pieces))
}
