package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit polynomial (Karp–Rabin style) rolling
  * hash of a string — the document-fingerprinting primitive
  * (`h = h * prime + codepoint`, wrapping on Long overflow).
  *
  * Implemented as a custom `Expression` with `doGenCode` rather than a Scala
  * UDF so it participates in whole-stage codegen: no boxing, no
  * serialization of a closure, and the generated loop sits inline in the
  * produced Java — the preference order of SURVEY.md §2.11 / the build
  * brief ((b) custom Expression beats UDF).
  */
case class RollingHash(child: Expression, prime: Long = 1000003L)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"rolling_hash needs STRING, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) { h = h * prime + s.charAt(i); i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |String $str = $c.toString();
         |long $h = 0L;
         |for (int $i = 0; $i < $str.length(); $i++) {
         |  $h = $h * ${prime}L + $str.charAt($i);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Column-API entry point. */
  def rolling_hash(c: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      RollingHash(org.apache.spark.sql.GraftShims.expression(c)))
}
