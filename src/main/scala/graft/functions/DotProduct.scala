package graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Double-precision dot product of two float/double vectors — the
  * embedding similarity kernel
  * (cosine = dot_f(a,b) / (dot_f(a,a)^½ · dot_f(b,b)^½)). Each side may
  * independently be array<float> (stored embeddings) or array<double>
  * (derived hyperplanes / centroids); elements widen to double before
  * multiply, exactly like the CAST in the higher-order formulation.
  *
  * Why a native Catalyst Expression (SURVEY §7 extension order (b)):
  * the composed form `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, +)`
  * materializes the zip_with product array per pair and evaluates both
  * lambdas interpreted, outside whole-stage codegen. ANN queries run
  * this per candidate pair; the generated tight loop reads the element
  * slots directly with zero intermediate allocation. Accumulation is
  * left-to-right — the SAME order and widening as the higher-order form
  * and the DuckDB oracle, so results stay bit-identical, oracle-green.
  *
  * NULL vector → NULL (BinaryExpression default); a NULL ELEMENT on
  * either side → NULL, matching the zip_with/aggregate composition
  * (and `nullable` includes containsNull for exactly that reason —
  * declaring non-null there lets consumers skip the null bit and read
  * garbage). Trailing elements of the longer vector are ignored
  * (embedding tables are fixed-dimension; the HOF form instead nulls
  * out on pad — callers compare equal-length vectors, where the two
  * agree).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "dot_f requires array<float> or array<double> arguments, got " +
          s"${left.dataType.catalogString} and " +
          s"${right.dataType.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f"

  override def nullable: Boolean = super.nullable ||
    (left.dataType match { case ArrayType(_, cn) => cn; case _ => true }) ||
    (right.dataType match { case ArrayType(_, cn) => cn; case _ => true })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val aFloat = elemType(left).contains(FloatType)
    val bFloat = elemType(right).contains(FloatType)
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      // Element accessor picked at CODEGEN time from the static child
      // type — no per-element branch in the generated loop.
      def get(v: String, e: Expression, idx: String): String =
        if (elemType(e).contains(FloatType))
          s"((double) $v.getFloat($idx))"
        else s"$v.getDouble($idx)"
      // When the expression is statically non-nullable (both inputs
      // non-null with containsNull=false), nullSafeCodeGen makes
      // ev.isNull the LITERAL `false` — assigning to it would generate
      // `false = true;`, which janino rejects (and codegen silently
      // falls back to interpreted). The null-element branch is dead
      // code in that case, so emit it only when `nullable` holds.
      val nullElementCheck = if (nullable)
        s"""if ($a.isNullAt($i) || $b.isNullAt($i)) {
           |    ${ev.isNull} = true;
           |    break;
           |  }""".stripMargin
      else ""
      // Janino-safe: primitive locals only, single-step assignments.
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() < $n) $n = $b.numElements();
         |double $acc = 0.0d;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullElementCheck
         |  $acc += ${get(a, left, i)} * ${get(b, right, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}
