package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Bounded KMV state: the `k` smallest DISTINCT hashes seen so far.
  * Insertion keeps the invariant in O(log k); the buffer never exceeds
  * k entries, so executor memory per group is a constant — the whole
  * point of a sketch aggregate. */
final class KmvBuffer(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()
  def insert(h: Long): Unit = {
    if (set.size < k) { set.add(h); () }
    else if (h < set.last && set.add(h)) { set.remove(set.last); () }
  }
  def mergeIn(other: KmvBuffer): KmvBuffer = {
    val it = other.set.iterator()
    while (it.hasNext) insert(it.next())
    this
  }
}

/** KMV distinct-count sketch as a NATIVE Catalyst aggregate function
  * ([[TypedImperativeAggregate]]) — the custom-AGGREGATE leg of the
  * extension story (expression / strategy / optimizer-rule are the
  * others): Spark drives the full partial-aggregation protocol through
  * it (map-side update per partition, binary-serialized partial buffers
  * across the exchange, reduce-side merge), so the sketch combines
  * map-side exactly like a built-in `count` — the property the dataflow
  * spelling (`q_approx_distinct_kmv`'s per-key heap) gets from operator
  * composition, here packaged as a reusable `agg()` function.
  *
  * Input contract: an already-hashed LONG (the portable md5-prefix
  * hash), so the function's algebra is engine-neutral and the DuckDB
  * oracle replays it verbatim. Returns struct(nh, hk): kept-hash count
  * and the k-th smallest (max kept) hash — the Bar-Yossef estimate is a
  * plain column formula on top, shared with the sketch family.
  * KMV's fold is commutative, associative, and idempotent, so the
  * result is invariant to partitioning and replay (KmvAggSpec pins
  * both). State: k longs per group, serialized as k·8 bytes. */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("nh", IntegerType, nullable = false),
    StructField("hk", LongType, nullable = true)))

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, row: InternalRow): KmvBuffer = {
    val v = child.eval(row)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer =
    buf.mergeIn(other)

  override def eval(buf: KmvBuffer): Any =
    new GenericInternalRow(Array[Any](
      buf.set.size,
      if (buf.set.isEmpty) null else buf.set.last.longValue()))

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.set.size * 8)
    val it = buf.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val buf = new KmvBuffer(k)
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) buf.insert(bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_agg"
}
