package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, Expression, InterpretedOrdering, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k smallest rows under the
  * ordering (field0 DESC, field1 ASC) — i.e. the k highest-scoring
  * entries with a deterministic ascending tie-break — and emits them
  * as a sorted array, best first.
  *
  * This replaces the `row_number().over(Window.partitionBy(q))` idiom
  * for per-group top-k. The window form shuffles EVERY scored row of a
  * group into a single task before discarding all but k — at
  * 100 TB corpus scale that task holds the whole corpus per query
  * (straggler, then OOM). As a TypedImperativeAggregate this runs with
  * map-side partial aggregation (ObjectHashAggregate): each map task
  * retains at most k rows per group, so the shuffle carries
  * ≤ k·partitions rows per group instead of the full candidate set.
  *
  * Input: a struct whose FIRST field is the score (ordered DESC) and
  * whose SECOND field is the tie-break (ordered ASC, any orderable
  * type — the id-type-generic contract of the ANN operators). Extra
  * payload fields ride along uncompared. Null input structs are
  * skipped; null fields order per standard SQL sort rules.
  */
case class BoundedTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[InternalRow]]
  with UnaryLike[Expression] {

  private def structType: StructType =
    child.dataType.asInstanceOf[StructType]

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _ if k < 1 =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_topk k must be >= 1, got $k")
      case s: StructType if s.length >= 2 =>
        if (s.take(2).forall(f => RowOrdering.isOrderable(f.dataType)))
          TypeCheckResult.TypeCheckSuccess
        else
          TypeCheckResult.TypeCheckFailure(
            "graft_topk score and tie-break fields must be orderable, " +
              s"got ${s.simpleString}")
      case t =>
        TypeCheckResult.TypeCheckFailure(
          "graft_topk expects struct(score, tiebreak, payload...), got " +
            t.simpleString)
    }

  /** Best-first ordering: score desc, tie-break asc. Interpreted — it
    * runs O(log k) comparisons per retained row, not per input row
    * (rejected rows cost exactly one comparison against the heap head).
    */
  @transient private lazy val ord: Ordering[InternalRow] = {
    val fields = structType
    new InterpretedOrdering(Seq(
      SortOrder(BoundReference(0, fields(0).dataType, fields(0).nullable),
        Descending),
      SortOrder(BoundReference(1, fields(1).dataType, fields(1).nullable),
        Ascending)))
  }

  override def createAggregationBuffer(): java.util.PriorityQueue[InternalRow] =
    // head = WORST retained row (reverse of best-first), so bounded
    // insert is peek-compare-poll
    new java.util.PriorityQueue[InternalRow](k + 1, ord.reverse)

  private def insert(buf: java.util.PriorityQueue[InternalRow],
      row: InternalRow): Unit = {
    if (buf.size < k) {
      buf.add(row)
    } else if (ord.compare(row, buf.peek()) < 0) {
      buf.poll()
      buf.add(row)
    }
  }

  override def update(buf: java.util.PriorityQueue[InternalRow],
      input: InternalRow): java.util.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      // copy: Catalyst reuses the input row's backing buffer
      insert(buf, v.asInstanceOf[InternalRow].copy())
    }
    buf
  }

  override def merge(buf: java.util.PriorityQueue[InternalRow],
      other: java.util.PriorityQueue[InternalRow])
      : java.util.PriorityQueue[InternalRow] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.PriorityQueue[InternalRow]): Any = {
    val arr = new Array[InternalRow](buf.size)
    buf.toArray(arr)
    java.util.Arrays.sort(arr, ord) // best first
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  @transient private lazy val proj =
    UnsafeProjection.create(Array[DataType](child.dataType))

  override def serialize(buf: java.util.PriorityQueue[InternalRow])
      : Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val dos = new DataOutputStream(bos)
    val it = buf.iterator()
    val holder = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    while (it.hasNext) {
      holder.update(0, it.next())
      val rowBytes = proj.apply(holder).getBytes
      dos.writeInt(rowBytes.length)
      dos.write(rowBytes)
    }
    dos.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.PriorityQueue[InternalRow] = {
    val buf = createAggregationBuffer()
    val dis = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = structType.length
    while (dis.available() > 0) {
      val len = dis.readInt()
      val rowBytes = new Array[Byte](len)
      dis.readFully(rowBytes)
      val ur = new UnsafeRow(1)
      ur.pointTo(rowBytes, len)
      buf.add(ur.getStruct(0, n).copy())
    }
    buf
  }

  override def dataType: DataType = ArrayType(child.dataType, false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): BoundedTopK = copy(child = newChild)
}
