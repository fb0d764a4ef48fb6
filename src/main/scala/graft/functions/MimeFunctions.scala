package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.SparkSession

import graft.mime.MimeRegistry

/** `detect_mime(binary) -> string` as a native Catalyst expression.
  *
  * The broadcast-trie detection (SURVEY.md §2.2) normally runs inside the
  * extraction `mapPartitions`; this expression exposes the same detector
  * to pure-SQL/DataFrame plans (e.g. filtering a 100 TB table by payload
  * type before the expensive parse stage, letting Catalyst push the
  * cheap detect ahead of the heavy extract). Codegen emits a direct
  * static call — no boxing, stays inside WholeStageCodegen spans.
  */
case class DetectMime(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"detect_mime requires binary input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(DetectMime.detect(input.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
      s"graft.functions.DetectMime.detect($c))")

  override protected def withNewChildInternal(newChild: Expression): DetectMime =
    copy(child = newChild)

  override def prettyName: String = "detect_mime"
}

object DetectMime {
  /** Static entry used by both interpreted and generated code. */
  def detect(bytes: Array[Byte]): String = MimeRegistry.detect(bytes)

  /** Column API. */
  def detect_mime(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      DetectMime(org.apache.spark.sql.GraftBridge.expression(c)))

  /** SQL registration: `SELECT detect_mime(payload) FROM t`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "detect_mime", exprs => DetectMime(exprs.head), "scala_udf")
}
