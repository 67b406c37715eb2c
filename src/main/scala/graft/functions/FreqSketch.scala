package graft

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (heavy hitters) sketch over strings — DataSketches
  * ItemsSketch (Misra-Gries / space-saving family). Completes the
  * mergeable-sketch trio: HLL = cardinality, theta = set algebra,
  * this = frequency. Same native TypedImperativeAggregate design as
  * ThetaSketchAgg: a live sketch object rides the buffer between rows,
  * bytes move only at partial/final shuffle boundaries.
  *
  * Scale (100 TB): the exact relational top-k (explode -> groupBy ->
  * window) shuffles every distinct term; the sketch form reduces each
  * partition to a bounded maxMapSize map and shuffles kilobytes. Counts
  * are EXACT while no eviction happens (distinct items per partial
  * <= 0.75 * maxMapSize); beyond that the sketch keeps a proven
  * (N/maxMapSize)-bounded error band, and NO_FALSE_NEGATIVES keeps
  * every true heavy hitter in the result. The test vocabulary (31
  * terms vs maxMapSize 1024) stays exact, so the oracle hash-matches.
  *
  * Output: top-k (term, freq) structs ordered by (freq DESC, term) —
  * the tie-break makes the result deterministic in both engines.
  */
case class FreqSketchTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ItemsSketch[String]]
    with UnaryLike[Expression] {

  // Not a val: the serde is not Serializable and this expression ships
  // to executors inside the serialized physical plan.
  @transient private lazy val serde = new ArrayOfStringsSerDe

  override def prettyName: String = "freq_sketch_topk"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("freq", LongType, nullable = false))))

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](1024)

  override def update(
      b: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) b.update(v.toString)
    b
  }

  override def merge(
      b: ItemsSketch[String], o: ItemsSketch[String]): ItemsSketch[String] = {
    b.merge(o)
    b
  }

  override def eval(b: ItemsSketch[String]): Any = {
    val rows = b.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .map(r => (r.getItem, r.getEstimate))
      .sortBy { case (term, est) => (-est, term) }
      .take(k)
      .map { case (term, est) =>
        InternalRow(UTF8String.fromString(term), est)
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(b: ItemsSketch[String]): Array[Byte] =
    b.toByteArray(serde)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  override def withNewMutableAggBufferOffset(n: Int): FreqSketchTopK =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FreqSketchTopK =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): FreqSketchTopK =
    copy(child = c)
}
