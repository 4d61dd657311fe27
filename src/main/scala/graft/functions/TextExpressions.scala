package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** SimHash64 over an array<string> of tokens → long signature. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    TextOps.simHash64(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.simHash64($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Min sliding-window xxHash64 fingerprint of a string column. */
case class MinWindowHash(child: Expression, window: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    TextOps.minWindowHash(v.asInstanceOf[UTF8String], window)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.minWindowHash($c, $window)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Hamming distance between two long signatures (bit_count(a XOR b)). */
case class HammingDistance64(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  // integral inputs accepted without analyzer help (AbstractDataType is
  // private[sql], so ImplicitCastInputTypes is unavailable to extensions):
  // eval widens via Number, codegen casts to long explicitly
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextOps.hamming64(a.asInstanceOf[Number].longValue, b.asInstanceOf[Number].longValue)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount((long)$a ^ (long)$b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-API entry points for the text signature kernels. */
object TextFunctions {
  import org.apache.spark.sql.GraftInternals.{column, expression}

  def simhash64(tokens: Column): Column = column(SimHash64(expression(tokens)))
  def min_window_hash(text: Column, window: Int): Column =
    column(MinWindowHash(expression(text), window))
  def hamming64(a: Column, b: Column): Column =
    column(HammingDistance64(expression(a), expression(b)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("simhash64", es => SimHash64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("hamming64", es => HammingDistance64(es(0), es(1)), "scala_udf")
  }
}
