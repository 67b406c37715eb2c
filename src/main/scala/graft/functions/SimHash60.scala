package graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 60-bit SimHash of a token multiset in ONE per-row pass, built on the
  * cross-engine-portable h60 token hash (the first 15 hex digits of
  * md5 — the exact value DuckDB computes as
  * `('0x' || substr(md5(t), 1, 15))::BIGINT`): bit j (0 ≤ j < 60) of
  * the result is 1 iff `sum over token OCCURRENCES of (bit j of
  * h60(tok) == 1 ? +1 : -1)` is positive; ties round to 0.
  *
  * Same shuffle-free design as [[SimHash64]] (the signature is a
  * codegen'd projection, never an explode + 60-column aggregation);
  * the difference is ONLY the token hash: xxhash64 cannot be evaluated
  * by the SQL oracle, md5 can — so a SimHash pipeline built on this
  * kernel is fully DuckDB-replayable end to end (banding, capping,
  * hamming filter included). Keep SimHash64 when oracle replay is not
  * needed: xxhash64 is ~10× cheaper per token than MD5.
  *
  * Null elements hash like the EMPTY STRING (split output never
  * produces null tokens; the choice only matters for hand-built
  * arrays, and empty-string md5 is portable to the oracle).
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"simhash60 requires array<string>, got ${t.catalogString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override protected def withNewChildInternal(
      newChild: Expression): SimHash60 = copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Int](60)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      val bytes =
        if (a.isNullAt(i)) Array.emptyByteArray
        else a.getUTF8String(i).getBytes
      val h = SimHash60.h60(md, bytes)
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) {
      if (counts(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val mdRef = ctx.addMutableState("java.security.MessageDigest", "simhashMd",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) {
              |  throw new RuntimeException(e);
              |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, a => {
      val counts = ctx.freshName("counts")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      val bytes = ctx.freshName("bytes")
      s"""
         |int[] $counts = new int[60];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  byte[] $bytes = $a.isNullAt($i) ? new byte[0]
         |    : $a.getUTF8String($i).getBytes();
         |  long $h = graft.SimHash60.h60($mdRef, $bytes);
         |  for (int $j = 0; $j < 60; $j++) {
         |    if ((($h >>> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 60; $j++) {
         |  if ($counts[$j] > 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }
}

object SimHash60 {
  /** First 60 bits of md5(bytes) as a non-negative long — numerically
    * identical to parsing the first 15 hex digits of the md5 hex string
    * (= the big-endian first 8 digest bytes shifted right 4).
    */
  def h60(md: java.security.MessageDigest, bytes: Array[Byte]): Long = {
    md.reset()
    val d = md.digest(bytes)
    var h = 0L
    var k = 0
    while (k < 8) { h = (h << 8) | (d(k) & 0xFFL); k += 1 }
    h >>> 4
  }
}
