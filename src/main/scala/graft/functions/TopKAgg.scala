package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Bounded top-k aggregate — the map-side replacement for rank-window
  * shapes over CANDIDATE EXPANSIONS (the round-14 verdict's named fix
  * for the ANN-expansion shuffle-scratch ENOSPC):
  *
  *   row_number().over(Window.partitionBy(g).orderBy(key DESC)) <= k
  *     ≡  posexplode(collect_topk(key, k, reverse=false)), rank = pos+1
  *
  * The window form must SORT the whole expansion within each task and
  * shuffle EVERY expanded row into the rank exchange (WindowGroupLimit
  * trims per-partition only after a full local sort of the stream);
  * this aggregate instead folds each map task down to one k-element
  * buffer per group before the exchange — the shuffle carries
  * ≤ |groups|·k rows regardless of expansion width, and nothing sorts
  * the expansion at all (each row does one O(log k) heap probe).
  * For the n·wc·fine ANN final-assignment expansion that is ~an order
  * of magnitude less shuffle scratch for bit-identical output.
  *
  * Semantics (law-tested against the window form in TopKSpec):
  * ordering is the child type's natural ordering (structs compare
  * lexicographically field by field — encode DESC tie-breaks as
  * negated fields, exactly like the max_by sites); the result array
  * holds the k extreme values sorted best-first:
  *   reverse=false → the k LARGEST, descending
  *   reverse=true  → the k SMALLEST, ascending
  * so element i (0-based) is the row_number = i+1 row of the
  * equivalent window. Nulls are skipped (collect_* convention; every
  * call site feeds non-null keys). Same design as Spark's own
  * private[sql] CollectTopK (the pandas-on-Spark nlargest kernel),
  * grafted here because that class is not accessible outside
  * org.apache.spark.sql.
  */
/** Size-adaptive cutover for the rank-window → collect_topk rewrite
  * (the RankSelect.aggregateSafeBytes idiom): below the threshold the
  * WINDOW form is used — measured 1.1-1.6× faster at bench SFs, where
  * the expansion fits memory and WindowGroupLimit's codegen sort beats
  * this aggregate's boxed per-row buffers — and above it the
  * collect_topk form takes over, because sorting a corpus-scale
  * candidate expansion inside the partial window is exactly the
  * shuffle-scratch that ENOSPC'd the sf100 ANN runs (BASELINE/SCALE
  * round-14). A wrong-side decision changes only the PLAN, never the
  * result: both forms emit identical rows (TopKSpec + the per-site
  * Round17OpsSpec force-mode parity). Gate on the CORPUS-side frame's
  * optimizer size estimate (the expansion's own join estimate is not
  * trustworthy); 128 MiB ≈ the third data decade (sf30), where the
  * expansion sorts start spilling — sf100 embeddings (~500 MB) engage,
  * every local bench SF keeps its frozen window plan byte-identical.
  * spark.graft.topk.forceAgg=true force-engages (tests).
  */
object TopKAgg {
  val engageBytes: Long = 1L << 27

  def engage(corpus: org.apache.spark.sql.DataFrame): Boolean =
    corpus.sparkSession.conf
      .getOption("spark.graft.topk.forceAgg").contains("true") ||
      corpus.queryExecution.optimizedPlan.stats.sizeInBytes > engageBytes
}

case class TopKAgg(
    child: Expression,
    k: Int,
    reverse: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[Any]]
    with UnaryLike[Expression] {

  require(k > 0, s"collect_topk k must be positive, got $k")

  override def prettyName: String = "collect_topk"
  override def dataType: DataType = ArrayType(child.dataType, false)
  override def nullable: Boolean = false

  // "Better" = greater per this ordering; the heap keeps the k best.
  @transient private lazy val ord: Ordering[Any] = {
    val base = TypeUtils.getInterpretedOrdering(child.dataType)
    if (reverse) base.reverse else base
  }

  // Min-heap of the kept elements (head = worst kept): a new value
  // displaces the head when it beats it — O(log k) per row, no sort.
  override def createAggregationBuffer(): java.util.PriorityQueue[Any] =
    new java.util.PriorityQueue[Any](k, ord)

  private def offer(b: java.util.PriorityQueue[Any], v: Any): Unit =
    if (b.size < k) { b.offer(v); () }
    else if (ord.compare(v, b.peek) > 0) { b.poll(); b.offer(v); () }

  override def update(
      b: java.util.PriorityQueue[Any], input: InternalRow): java.util.PriorityQueue[Any] = {
    val v = child.eval(input)
    // copyValue: eval of struct/array children returns a REUSED buffer
    // row — the kept element must own its bytes.
    if (v != null) offer(b, InternalRow.copyValue(v))
    b
  }

  override def merge(
      b: java.util.PriorityQueue[Any],
      o: java.util.PriorityQueue[Any]): java.util.PriorityQueue[Any] = {
    val it = o.iterator()
    while (it.hasNext) offer(b, it.next()) // already-copied values
    b
  }

  override def eval(b: java.util.PriorityQueue[Any]): Any = {
    val arr = b.toArray
    java.util.Arrays.sort(arr, ord.reverse.asInstanceOf[java.util.Comparator[Any]])
    new GenericArrayData(arr)
  }

  // Shuffle form: length-prefixed UnsafeRow bytes per element (the
  // Collect serializer shape) — element type is child.dataType.
  @transient private lazy val proj =
    UnsafeProjection.create(Array[DataType](child.dataType))

  override def serialize(b: java.util.PriorityQueue[Any]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(b.size)
    val it = b.iterator()
    while (it.hasNext) {
      val bytes = proj(InternalRow(it.next())).getBytes // getBytes copies
      dos.writeInt(bytes.length)
      dos.write(bytes)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[Any] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val q = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      val r = new UnsafeRow(1)
      r.pointTo(arr, len)
      q.offer(InternalRow.copyValue(r.get(0, child.dataType)))
      i += 1
    }
    q
  }

  override def withNewMutableAggBufferOffset(n: Int): TopKAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): TopKAgg =
    copy(child = c)
}
