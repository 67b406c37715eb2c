package graft

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

/** KLL quantile sketches (DataSketches): mergeable rank/quantile
  * sketches — the fourth pillar of the sketch family alongside HLL
  * (cardinality), theta (set algebra) and frequent-items (heavy
  * hitters). Reference surface: Hive's percentile_approx rides the
  * same idea (GenericUDAFPercentileApprox's mergeable histogram), and
  * Hive's datasketches bundle ships kll_sketch directly.
  *
  * Same native TypedImperativeAggregate design as ThetaSketchAgg: a
  * LIVE KllDoublesSketch rides the aggregation buffer between rows;
  * bytes materialize only at partial/final shuffle boundaries.
  *
  * Scale (100 TB): the exact relational quantile (sort or window per
  * group) shuffles every value; the sketch form reduces each partition
  * to an O(k) summary and shuffles kilobytes, and per-slice blobs can
  * be PERSISTED and re-unioned for any later rollup without rescanning
  * (kll_union_agg). The sketch is EXACT while no compaction has
  * occurred (total items per sketch ≤ level-0 capacity ≈ k); beyond
  * that, rank error is bounded at ~1.65/sqrt(k) with proven
  * guarantees. KllSketchSpec pins the exact-mode identity and the
  * shard-merge ≡ direct-build law that holds at any scale.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch]
    with UnaryLike[Expression] {

  override def prettyName: String = "kll_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(
      b: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) b.update(v.asInstanceOf[Double])
    b
  }

  override def merge(
      b: KllDoublesSketch, o: KllDoublesSketch): KllDoublesSketch = {
    b.merge(o)
    b
  }

  override def eval(b: KllDoublesSketch): Any = b.toByteArray

  override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(n: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg =
    copy(child = c)
}

/** Union of already-serialized KLL sketch BLOBS — persisted per-slice
  * quantile sketches become a first-class table column; any later
  * rollup merges kilobyte blobs instead of rescanning the raw values.
  * The merged sketch adopts the smallest k among inputs (DataSketches
  * semantics), so build every slice with the same k.
  */
case class KllUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch]
    with UnaryLike[Expression] {

  override def prettyName: String = "kll_union_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  // Start with the max supported k: the first real input's (smaller) k
  // then governs, so an empty buffer never degrades a merge. (MAX_K is
  // a Java static on the KllSketch base — Scala must name that class.)
  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(
      org.apache.datasketches.kll.KllSketch.MAX_K)

  override def update(
      b: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      b.merge(KllDoublesSketch.wrap(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    b
  }

  override def merge(
      b: KllDoublesSketch, o: KllDoublesSketch): KllDoublesSketch = {
    b.merge(o)
    b
  }

  override def eval(b: KllDoublesSketch): Any = b.toByteArray

  override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(n: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllUnionAgg =
    copy(child = c)
}

/** Quantile at normalized rank q from a KLL sketch blob (INCLUSIVE
  * search: the smallest stored value whose rank (#items ≤ v)/n ≥ q —
  * in exact mode this IS the order statistic at index ceil(q·n), which
  * is what the DuckDB oracle computes relationally). CodegenFallback is
  * right here: evaluates on aggregated rows (one per group), never in
  * the scan hot path.
  */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback
    with BinaryLike[Expression] {
  override def prettyName: String = "kll_quantile"
  override def dataType: DataType = DoubleType
  override def nullSafeEval(blob: Any, q: Any): Any =
    KllDoublesSketch.wrap(Memory.wrap(blob.asInstanceOf[Array[Byte]]))
      .getQuantile(q.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KllQuantile = copy(l, r)
}

/** Stream length n summarized by a KLL sketch blob. */
case class KllN(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def prettyName: String = "kll_n"
  override def dataType: DataType = LongType
  override def nullSafeEval(blob: Any): Any =
    KllDoublesSketch.wrap(Memory.wrap(blob.asInstanceOf[Array[Byte]])).getN
  override protected def withNewChildInternal(c: Expression): KllN =
    copy(child = c)
}
