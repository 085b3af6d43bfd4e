package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding hot path: double-precision
  * dot product of two vector columns (array<float> or array<double>, mixed
  * allowed — float elements widen exactly).
  *
  * The composable form (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) builds an
  * intermediate array per row and interprets a lambda per element; this
  * expression stays inside whole-stage codegen as a tight primitive loop —
  * the "(b) custom Catalyst Expression" rung of the operator preference
  * ladder, used by [[graft.pipeline.Similarity]] for brute-force/LSH ANN.
  *
  * Assumes non-null elements (embedding vectors), accumulates left-to-right
  * in double — same order and precision as the composable form it replaces.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  /** Nullable even over non-null inputs: a LENGTH MISMATCH or a NULL
    * ELEMENT yields null — the same answers the composable
    * `aggregate(zip_with(a, b, _*_), …)` form gives (zip_with null-pads
    * the shorter side / propagates element nulls and the sum absorbs
    * them). Treating either as 0.0 instead would hand downstream ANN a
    * plausible partial similarity for a corrupt, wrong-model, or
    * partially-backfilled embedding and the data problem would never
    * surface. */
  override def nullable: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<float|double> arguments, " +
            s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val aFloat = elemType(left).contains(FloatType)
    val bFloat = elemType(right).contains(FloatType)
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      // a null element must poison the result, not multiply as the 0.0
      // its zeroed storage slot reads back as
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      def get(arr: String, e: Expression): String =
        if (elemType(e).contains(FloatType)) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      s"""
         |if ($l.numElements() != $r.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $l.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($l.isNullAt($i) || $r.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${get(l, left)} * ${get(r, right)};
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  import org.apache.spark.sql.GraftShims
  /** Column API for [[FloatDotProduct]]. */
  def floatDot(a: Column, b: Column): Column =
    GraftShims.column(FloatDotProduct(GraftShims.expression(a), GraftShims.expression(b)))
}
