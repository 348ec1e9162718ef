package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * aggregate (SURVEY.md §2.7 sketch surface; complements the HLL path in
  * `operators/Sketches.scala`). Unlike HLL, the KMV estimate is exactly
  * expressible in portable SQL — "the k smallest md5 values" is an
  * ORDER BY/LIMIT any engine reproduces bit-for-bit — so this is the
  * sketch whose estimate the DuckDB oracle can hash-match (q76), ending
  * the suite's only rows-only row.
  *
  * Input is a 60-bit uniform hash (first 15 hex chars of md5, see
  * [[KmvSketchAgg.hash60]]); the buffer keeps the k smallest DISTINCT
  * hashes — bounded at k longs per group per partition, mergeable by
  * union+recap (same order-independence as HLL register max), so partial
  * aggregation works and a 100 TB scan exchanges only k×8 bytes per
  * group. Estimator: fewer than k distinct hashes → exact count; else
  * (k-1) / (v_k / 2^60) with v_k the k-th smallest (Bar-Yossef et al.
  * 2002, the classic bottom-k estimator).
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"kmv_distinct: k must be >= 2, got $k")

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty

  private def add(buf: mutable.TreeSet[Long], h: Long): Unit = {
    if (buf.size < k) buf += h
    else if (h < buf.last && !buf.contains(h)) { buf -= buf.last; buf += h }
  }

  override def update(buf: mutable.TreeSet[Long], input: InternalRow)
      : mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: mutable.TreeSet[Long], b2: mutable.TreeSet[Long])
      : mutable.TreeSet[Long] = {
    b2.foreach(add(b1, _))
    b1
  }

  override def eval(buf: mutable.TreeSet[Long]): Any = {
    if (buf.size < k) buf.size.toDouble
    // v_k as a fraction of the 60-bit hash space; ordering of ops must
    // match the oracle SQL exactly for bit-identical doubles:
    // (k-1) / (v_k / 2^60)
    else (k - 1).toDouble / (buf.last.toDouble / KmvSketchAgg.TwoPow60)
  }

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { buf += in.readLong(); i += 1 }
    buf
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(offset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): KmvSketchAgg =
    copy(child = c)
}

object KmvSketchAgg {

  /** 2^60 — exact in a double (power of two). */
  val TwoPow60: Double = math.pow(2.0, 60)

  /** The portable 60-bit uniform hash both engines compute identically:
    * first 15 hex chars of md5 of the value's string form. DuckDB
    * equivalent: `CAST(concat('0x', substr(md5(CAST(x AS VARCHAR)), 1,
    * 15)) AS BIGINT)`. 15 hex digits = 60 bits, always fits a signed
    * long; md5's hex form is lowercase in both engines.
    */
  def hash60(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")
  }

  /** Expression builder for SQL `kmv_distinct(hash60, k)` (k literal). */
  val builder: Seq[Expression] => Expression = { exprs =>
    if (exprs.size != 2) throw new IllegalArgumentException(
      s"kmv_distinct expects 2 arguments (hash, k), got ${exprs.size}")
    val k = exprs(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"kmv_distinct: k must be an integer literal, got $other")
    }
    KmvSketchAgg(org.apache.spark.sql.catalyst.expressions.Cast(
      exprs.head, LongType), k).toAggregateExpression()
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_distinct", builder, "built-in")
}
