package graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass set intersection+union sizes for two string arrays, packed
  * as `(|A ∩ B| << 32) | |A ∪ B|` — the near-dup re-scoring kernel.
  *
  * Why a native Catalyst Expression (SURVEY §7 extension order (b)):
  * the composed form `size(array_intersect(a,b)) + size(array_union(a,b))`
  * builds THREE intermediate ArrayData (intersect result, union result,
  * plus the internal hash sets twice) per pair; at 100 TB the rescore
  * runs per candidate pair and this halves its allocation. `doGenCode`
  * keeps the whole computation inside whole-stage codegen — no UDF
  * boxing, no codegen fence.
  */
case class JaccardParts(left: Expression, right: Expression)
    extends BinaryExpression {

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
    val union = aset.size + bset.size - inter
    (inter.toLong << 32) | (union.toLong & 0xFFFFFFFFL)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val aset = ctx.freshName("aset")
      val bset = ctx.freshName("bset")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val inter = ctx.freshName("inter")
      val hs = "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>"
      s"""
         |$hs $aset = new $hs();
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  $aset.add($a.getUTF8String($i));
         |}
         |$hs $bset = new $hs();
         |int $inter = 0;
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $s = $b.getUTF8String($i);
         |  if ($bset.add($s) && $aset.contains($s)) $inter++;
         |}
         |${ev.value} = (((long) $inter) << 32)
         |  | ((long) ($aset.size() + $bset.size() - $inter) & 0xFFFFFFFFL);
       """.stripMargin
    })
}
