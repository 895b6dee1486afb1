package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import graft.core.Gaps

/** Native Catalyst expression: decode a delta-gap + VByte blob (the
  * postings table's `doc_gaps` format, graft.core.Gaps) into
  * array<bigint>, inside whole-stage codegen — the query-side decode
  * stays relational, with no Dataset-encoder boundary.
  *
  * vb_decode_gaps(blob BINARY, n INT) -> ARRAY<BIGINT>
  */
case class VbDecodeGaps(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == BinaryType && right.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vb_decode_gaps expects (binary, int), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullSafeEval(blob: Any, n: Any): Any =
    new GenericArrayData(
      Gaps.decode(blob.asInstanceOf[Array[Byte]], n.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (blob, n) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.core.Gaps.decode($blob, $n))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VbDecodeGaps =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vb_decode_gaps"
}

object GraftFunctions {

  /** Register on an existing session (idempotent); afterwards the
    * expression is usable from SQL and from the Column API via
    * functions.call_function("vb_decode_gaps", blob, n).
    */
  /** A clear arity error instead of a raw IndexOutOfBoundsException from
    * exprs(1) during function resolution.
    */
  private[functions] def build(exprs: Seq[Expression]): VbDecodeGaps = {
    require(exprs.length == 2,
      s"vb_decode_gaps expects 2 arguments (blob BINARY, n INT), got ${exprs.length}")
    VbDecodeGaps(exprs(0), exprs(1))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vb_decode_gaps", build _, "built-in")

  /** Column-API form (session must have the function registered). */
  def vb_decode_gaps(blob: Column, n: Column): Column =
    org.apache.spark.sql.functions.call_function("vb_decode_gaps", blob, n)
}

/** SparkSessionExtensions hook:
  * .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * or SparkSession.builder().withExtensions(new GraftExtensions()).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("vb_decode_gaps"),
      new ExpressionInfo(classOf[VbDecodeGaps].getName, "vb_decode_gaps"),
      (exprs: Seq[Expression]) => GraftFunctions.build(exprs)))
  }
}
