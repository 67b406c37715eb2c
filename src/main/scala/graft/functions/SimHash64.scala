package graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a token multiset in ONE per-row pass: bit j of the
  * result is 1 iff `sum over tokens of (bit j of xxhash64(tok) == 1 ?
  * +1 : -1)` is positive — bit-identical to the relational formulation
  * (explode → count per (doc, tok) → 64 signed `sum(when(...))`
  * aggregates → shiftleft/or assembly), because summing ±1 per token
  * OCCURRENCE equals summing ±count per DISTINCT token.
  *
  * Why a native Catalyst Expression (SURVEY §7 extension order (b)):
  * the relational form explodes every document into one row PER TOKEN
  * (~100× the corpus row count) and shuffles that twice (token count,
  * then 64-column signature agg). At 100 TB the explode alone dwarfs
  * the real work; this kernel turns the whole signature step into a
  * shuffle-free codegen'd projection.
  *
  * Null ELEMENTS contribute xxhash64's untouched seed (42) exactly like
  * the composed `xxhash64(tok)` on a null token (unreachable from
  * `split` output); an all-null/empty array yields signature 0 (every
  * bit-sum ties at 0, and ties round to 0 in both formulations).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires array<string>, got ${t.catalogString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def withNewChildInternal(
      newChild: Expression): SimHash64 = copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      val h =
        if (a.isNullAt(i)) 42L
        else XXH64.hashUTF8String(a.getUTF8String(i), 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val counts = ctx.freshName("counts")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      // Janino-safe: primitive arrays and locals, no generics, no
      // parenthesized-cast shifts.
      s"""
         |int[] $counts = new int[64];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.isNullAt($i) ? 42L
         |    : org.apache.spark.sql.catalyst.expressions.XXH64
         |        .hashUTF8String($a.getUTF8String($i), 42L);
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((($h >>> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($counts[$j] > 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
}
