package graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** All `numSigs` MinHash signatures of a string set in ONE pass:
  * element j of the result = min over the input strings of
  * `xxhash64(j, s)` — bit-identical to Spark's built-in chain
  * (seed 42 → `XXH64.hashInt(j)` → `XXH64.hashUTF8String(s)`), so it
  * is a drop-in for the composed
  * `array_min(transform(shingles, v -> xxhash64(j, v)))` per j.
  *
  * Why a native Catalyst Expression (SURVEY §7 extension order (b)):
  * the composed form walks the shingle array once PER SIGNATURE,
  * materializing an intermediate hash array each time and evaluating
  * the lambda interpreted — 24 traversals + 24 allocations per
  * document. This computes the whole signature vector in a single
  * traversal with one primitive long[] and stays inside whole-stage
  * codegen. At 100 TB the signature step touches every shingle of
  * every document; this is the dedup pipeline's hottest loop.
  *
  * Divergences from the composition, both unreachable from the dedup
  * queries (shingles are non-empty, non-null by construction):
  * an EMPTY input array yields seeds (the min over zero hashes —
  * xxhash64 of a null skips the value) rather than the composition's
  * null array_min; a null ELEMENT hashes to its slot seed, exactly
  * like `xxhash64(j, null)`.
  */
case class MinHashSigs(child: Expression, numSigs: Int)
    extends UnaryExpression {

  require(numSigs > 0 && numSigs <= 1024,
    s"minhash_sigs count must be in [1, 1024], got $numSigs")

  /** xxhash64(j, s) = hashUTF8String(s, hashInt(j, 42)): per-slot seeds
    * are constant — fold them once.
    */
  private lazy val seeds: Array[Long] =
    Array.tabulate(numSigs)(j => XXH64.hashInt(j, 42L))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"minhash_sigs requires array<string>, got ${t.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSigs = copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val mins = new Array[Long](numSigs)
    var j = 0
    while (j < numSigs) { mins(j) = Long.MaxValue; j += 1 }
    val n = a.numElements()
    var i = 0
    while (i < n) {
      val isNull = a.isNullAt(i)
      val s = if (isNull) null else a.getUTF8String(i)
      j = 0
      while (j < numSigs) {
        val h = if (isNull) seeds(j) else XXH64.hashUTF8String(s, seeds(j))
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    i = 0
    while (i < numSigs) {
      if (mins(i) == Long.MaxValue) mins(i) = seeds(i) // empty input
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
      val mins = ctx.freshName("mins")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      // Janino-safe: primitive arrays and locals, no generics.
      s"""
         |long[] $mins = new long[$numSigs];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) {
         |    for (int $j = 0; $j < $numSigs; $j++) {
         |      if ($seedsRef[$j] < $mins[$j]) $mins[$j] = $seedsRef[$j];
         |    }
         |  } else {
         |    org.apache.spark.unsafe.types.UTF8String $s =
         |      $a.getUTF8String($i);
         |    for (int $j = 0; $j < $numSigs; $j++) {
         |      long $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |        .hashUTF8String($s, $seedsRef[$j]);
         |      if ($h < $mins[$j]) $mins[$j] = $h;
         |    }
         |  }
         |}
         |for (int $j = 0; $j < $numSigs; $j++) {
         |  if ($mins[$j] == Long.MAX_VALUE) $mins[$j] = $seedsRef[$j];
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($mins);
       """.stripMargin
    })
}
