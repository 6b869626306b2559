package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for the IAU constellation lookup (S11, SURVEY §2.2):
  * `constellation_of(ra, dec)` → full constellation name. One static
  * call per row inside whole-stage codegen — the table walk lives in
  * [[graft.astro.Constellation]]; no UDF, no join against a lookup
  * relation (the table is class data on every executor).
  */
case class ConstellationOf(ra: Expression, dec: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def left: Expression = ra
  override def right: Expression = dec

  override def dataType: DataType = StringType
  override def prettyName: String = "constellation_of"
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    UTF8String.fromString(graft.astro.Constellation.name(
      a.asInstanceOf[Double], b.asInstanceOf[Double]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.astro.Constellation.name($a, $b))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(ra = newLeft, dec = newRight)
}

object ConstellationOf {
  def constellationOf(ra: Column, dec: Column): Column =
    org.apache.spark.sql.graftbridge.ExpressionBridge.column(
      ConstellationOf(
        org.apache.spark.sql.graftbridge.ExpressionBridge.expression(ra),
        org.apache.spark.sql.graftbridge.ExpressionBridge.expression(dec)))
}
