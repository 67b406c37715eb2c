package graft

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Sketches, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Theta sketches (DataSketches): mergeable distinct-count sketches that
  * — unlike HLL — support set INTERSECTION and DIFFERENCE, so
  * "distinct users in A and B" is computable from two kilobyte blobs
  * instead of a shuffle of both id sets.
  *
  * Reference surface: Hive ships the same capability via the
  * datasketches UDF bundle (`sketch_union` / `sketch_intersection`
  * estimates in hive-exec's sketches integration); here it is a native
  * Catalyst TypedImperativeAggregate — the same extension rung Spark's
  * own hll_sketch_agg uses (a LIVE Union object rides the aggregation
  * buffer between rows; bytes only materialize at partial/final
  * shuffle boundaries, never per row — a UDAF with a bytes buffer
  * would pay wrap+union per input row).
  *
  * Scale (100 TB): per-shard sketches build map-side at scan speed;
  * only ~kB compact blobs shuffle. Default lgK=12 keeps the sketch
  * EXACT below 4096 entries (theta=1, no sampling) — the test-scale
  * sets are far under that, so estimates hash-match an exact oracle;
  * at production cardinality the estimate carries bounded relative
  * error and the set algebra still holds.
  */
case class ThetaSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def prettyName: String = "theta_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Sketches.wrapCompactSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
}

/** Union of already-serialized theta sketch BLOBS (the analogue of
  * Spark's hll_union_agg): makes persisted per-slice sketches a first-
  * class table column — any later rollup unions kilobyte blobs instead
  * of rescanning the corpus that produced them.
  */
case class ThetaUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def prettyName: String = "theta_union_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(
      Sketches.wrapCompactSketch(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Sketches.wrapCompactSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(n: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): ThetaUnionAgg =
    copy(child = c)
}

/** Estimated distinct count of a single theta sketch blob. */
case class ThetaEstimate(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def prettyName: String = "theta_estimate"
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    math.round(Sketches.wrapCompactSketch(
      Memory.wrap(v.asInstanceOf[Array[Byte]])).getEstimate)
  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
}

/** Base for the sketch set-algebra estimators. CodegenFallback is the
  * right trade here: these evaluate on AGGREGATED rows (one per group),
  * never inside the scan hot path, so interpreted eval costs nothing
  * while keeping the operator expression-shaped (composable, null-safe,
  * Catalyst-optimizable).
  */
abstract class ThetaBinaryEstimate extends BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType

  protected def wrap(v: Any): CompactSketch =
    Sketches.wrapCompactSketch(Memory.wrap(v.asInstanceOf[Array[Byte]]))

  protected def op(a: Sketch, b: Sketch): Double

  override def nullSafeEval(a: Any, b: Any): Any =
    math.round(op(wrap(a), wrap(b)))
}

/** Estimated |A ∩ B| from two theta sketch blobs. */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
    extends ThetaBinaryEstimate with BinaryLike[Expression] {
  override def prettyName: String = "theta_intersect_estimate"
  override protected def op(a: Sketch, b: Sketch): Double = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(a); i.intersect(b)
    i.getResult.getEstimate
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaIntersectEstimate = copy(l, r)
}

/** Estimated |A ∪ B| from two theta sketch blobs. */
case class ThetaUnionEstimate(left: Expression, right: Expression)
    extends ThetaBinaryEstimate with BinaryLike[Expression] {
  override def prettyName: String = "theta_union_estimate"
  override protected def op(a: Sketch, b: Sketch): Double = {
    val u = SetOperation.builder().buildUnion()
    u.union(a); u.union(b)
    u.getResult.getEstimate
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaUnionEstimate = copy(l, r)
}

/** Estimated |A \ B| from two theta sketch blobs. */
case class ThetaAnotBEstimate(left: Expression, right: Expression)
    extends ThetaBinaryEstimate with BinaryLike[Expression] {
  override def prettyName: String = "theta_anotb_estimate"
  override protected def op(a: Sketch, b: Sketch): Double =
    SetOperation.builder().buildANotB().aNotB(a, b).getEstimate
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaAnotBEstimate = copy(l, r)
}
