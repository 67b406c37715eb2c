package graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass set intersection+union sizes for two string arrays, packed
  * as `(|A ∩ B| << 32) | (|A ∪ B| & 0xFFFFFFFF)` — the near-dup
  * re-scoring kernel. Each input array holds at most Int.MaxValue
  * elements, so |∩| fits in 32 bits; |∪| can reach 2^32-2 and is summed
  * in LONG space before masking, so the packed low word is exact for
  * every representable input.
  *
  * Why a native Catalyst Expression (SURVEY §7 extension order (b)):
  * the composed form `size(array_intersect(a,b)) + size(array_union(a,b))`
  * builds THREE intermediate ArrayData (intersect result, union result,
  * plus the internal hash sets twice) per pair; at 100 TB the rescore
  * runs per candidate pair and this halves its allocation. `doGenCode`
  * keeps the whole computation inside whole-stage codegen — no UDF
  * boxing, no codegen fence. (The generated Java deliberately uses raw
  * HashSet and single-step local assignments: janino rejects generics
  * and misparses `((long) x) << 32`-style cast-then-shift expressions.)
  *
  * checkInputDataTypes turns a wrong-typed call into an analysis error
  * instead of an executor ClassCastException.
  */
case class JaccardParts(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "jaccard_parts requires two array<string> arguments, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "jaccard_parts"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardParts =
    copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val aset = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < a.numElements()) { aset.add(a.getUTF8String(i)); i += 1 }
    val bset = new java.util.HashSet[UTF8String]()
    var inter = 0
    i = 0
    while (i < b.numElements()) {
      val s = b.getUTF8String(i)
      if (bset.add(s) && aset.contains(s)) inter += 1
      i += 1
    }
    val union = aset.size.toLong + bset.size.toLong - inter
    (inter.toLong << 32) | (union & 0xFFFFFFFFL)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val aset = ctx.freshName("aset")
      val bset = ctx.freshName("bset")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val inter = ctx.freshName("inter")
      val hi = ctx.freshName("hi")
      val uni = ctx.freshName("uni")
      s"""
         |java.util.HashSet $aset = new java.util.HashSet();
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  $aset.add($a.getUTF8String($i));
         |}
         |java.util.HashSet $bset = new java.util.HashSet();
         |int $inter = 0;
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $s = $b.getUTF8String($i);
         |  if ($bset.add($s) && $aset.contains($s)) $inter++;
         |}
         |long $hi = $inter;
         |$hi = $hi << 32;
         |long $uni = $aset.size();
         |$uni += $bset.size();
         |$uni -= $inter;
         |${ev.value} = $hi | ($uni & 0xFFFFFFFFL);
       """.stripMargin
    })
}
