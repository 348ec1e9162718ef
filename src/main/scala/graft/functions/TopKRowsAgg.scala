package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: the k largest payloads by `ord` per group,
  * as a native Catalyst `TypedImperativeAggregate` with O(k) state.
  *
  * The window formulation of per-group top-k (`row_number() OVER
  * (PARTITION BY g ORDER BY ord DESC)` then `rank <= k`) must SORT
  * every group's full row set after shuffling all of it; this
  * aggregate keeps a k-bounded min-heap per group instead, and —
  * because it is an aggregate — Spark runs it with map-side partial
  * aggregation: each input partition reduces to at most k entries per
  * group BEFORE the shuffle. At 100 TB that's the difference between
  * shuffling the corpus and shuffling k rows per group.
  *
  * Ties on `ord` break toward the smallest payload (deterministic,
  * matching a `ORDER BY ord DESC, payload ASC` window). Output is the
  * payload array in rank order.
  */
case class TopKRowsAgg(
    ord: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
  with BinaryLike[Expression] {

  override def left: Expression = ord
  override def right: Expression = payload

  // min-heap by (ord asc, payload desc): the head is the entry to evict
  // — the smallest ord, largest payload among equals
  private val evictionOrder: Ordering[(Double, Long)] =
    Ordering.by { case (o, p) => (-o, p) }

  override def createAggregationBuffer()
      : mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(evictionOrder)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)],
      e: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else {
      // replace the current eviction candidate if the new entry ranks
      // higher (larger ord, or equal ord with smaller payload)
      val worst = buf.head
      if (evictionOrder.lt(e, worst)) { buf.dequeue(); buf.enqueue(e) }
    }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val o = ord.eval(input)
    val p = payload.eval(input)
    if (o != null && p != null)
      offer(buf, (o.asInstanceOf[Double], p.asInstanceOf[Long]))
    buf
  }

  override def merge(b1: mutable.PriorityQueue[(Double, Long)],
      b2: mutable.PriorityQueue[(Double, Long)])
      : mutable.PriorityQueue[(Double, Long)] = {
    b2.foreach(offer(b1, _))
    b1
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // rank order: ord desc, payload asc
    val sorted = buf.toSeq.sortBy { case (o, p) => (-o, p) }
    ArrayData.toArrayData(sorted.map(_._2).toArray)
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)])
      : Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (o, p) => out.writeDouble(o); out.writeLong(p) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(offset: Int): TopKRowsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKRowsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): TopKRowsAgg = copy(ord = l, payload = r)
}

object TopKRowsAgg {

  /** Builder for `top_k_rows(ord, payload, k)` (k a literal). */
  val builder: Seq[Expression] => Expression = { exprs =>
    val k = exprs(2) match {
      case Literal(v, IntegerType) => v.asInstanceOf[Int]
      case other => throw new IllegalArgumentException(
        s"top_k_rows: k must be an integer literal, got $other")
    }
    TopKRowsAgg(Cast(exprs.head, DoubleType), Cast(exprs(1), LongType), k)
      .toAggregateExpression()
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "top_k_rows", builder, "built-in")
}
