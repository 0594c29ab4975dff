package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded posting-list collector: the `limit` smallest (id, s) pairs
  * of the group, ascending by (id, then UTF8-binary s) — value-equal to
  * `slice(sort_array(collect_list(struct(id, s))), 1, limit)` for rows
  * whose id AND s are both non-null, but with an O(limit) aggregation
  * buffer instead of O(group). Null-bearing rows are SKIPPED by
  * `update` (consistent with the declared non-nullable struct fields),
  * where collect_list would keep a struct with null fields — so the
  * equivalence is exact only on null-free inputs (the sole call site's
  * c_custkey/c_name are non-null; the skip is spec-pinned).
  *
  * Why this exists: the blocking joins (deletion-variant neighbors,
  * posting-list dedup) group candidate members per bucket key, and a
  * structurally hot bucket — duplicate tokens, 1-char strings sharing
  * the "" deletion variant — makes `collect_list` buffer the ENTIRE
  * bucket in one ObjectHashAggregate entry before any downstream cap
  * can bite. At 100 TB a hub bucket is millions of rows → one
  * aggregation buffer of GBs. This aggregate keeps a size-`limit`
  * max-heap instead: update is O(log limit) per row, partials merge by
  * re-inserting ≤ limit entries (still bounded), and the map-side
  * combine already shrinks each shuffle block to ≤ limit members per
  * bucket — so the cap bounds the WIRE as well as the heap.
  *
  * Determinism: the kept set is the global (id, s)-minimum `limit`
  * members, independent of arrival/partition order; ties are exact
  * duplicates and survive as such (bag semantics, like collect_list).
  *
  * Strings are `.clone()`d on insert — the UTF8String handed to
  * `update` points into a reused scan buffer and is invalid after the
  * call returns (the same rule collect_list follows).
  */
case class BoundedCollect(
    idExpr: Expression, strExpr: Expression, limit: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[(Long, UTF8String)]]
  with BinaryLike[Expression] {

  require(limit > 0, s"bounded_collect limit must be positive, got $limit")

  override def left: Expression = idExpr
  override def right: Expression = strExpr

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("s", StringType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_collect"

  override def checkInputDataTypes(): TypeCheckResult =
    if (idExpr.dataType == LongType && strExpr.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BIGINT, STRING) arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))

  /** Ascending (id, binary s) — UTF8String.compareTo is unsigned-byte
    * lexicographic, the same ordering sort_array gives strings. */
  private def cmp(a: (Long, UTF8String), b: (Long, UTF8String)): Int = {
    val c = java.lang.Long.compare(a._1, b._1)
    if (c != 0) c else a._2.compareTo(b._2)
  }

  // head of the queue = LARGEST kept entry (the eviction candidate)
  private def newQueue(): java.util.PriorityQueue[(Long, UTF8String)] =
    new java.util.PriorityQueue[(Long, UTF8String)](
      math.min(limit, 16),
      new java.util.Comparator[(Long, UTF8String)] {
        override def compare(a: (Long, UTF8String),
            b: (Long, UTF8String)): Int = -cmp(a, b)
      })

  override def createAggregationBuffer()
      : java.util.PriorityQueue[(Long, UTF8String)] = newQueue()

  private def insert(q: java.util.PriorityQueue[(Long, UTF8String)],
      e: (Long, UTF8String)): Unit =
    if (q.size < limit) q.add(e)
    else if (cmp(e, q.peek) < 0) { q.poll(); q.add(e) }

  override def update(q: java.util.PriorityQueue[(Long, UTF8String)],
      input: InternalRow): java.util.PriorityQueue[(Long, UTF8String)] = {
    val id = idExpr.eval(input)
    val s = strExpr.eval(input)
    if (id != null && s != null) {
      val e = (id.asInstanceOf[Long], s.asInstanceOf[UTF8String])
      // clone only entries that will actually be kept
      if (q.size < limit || cmp(e, q.peek) < 0)
        insert(q, (e._1, e._2.clone()))
    }
    q
  }

  override def merge(q: java.util.PriorityQueue[(Long, UTF8String)],
      other: java.util.PriorityQueue[(Long, UTF8String)])
      : java.util.PriorityQueue[(Long, UTF8String)] = {
    val it = other.iterator()
    while (it.hasNext) insert(q, it.next())
    q
  }

  override def eval(q: java.util.PriorityQueue[(Long, UTF8String)]): Any = {
    val arr = q.toArray(new Array[(Long, UTF8String)](q.size))
    java.util.Arrays.sort(arr, new java.util.Comparator[(Long, UTF8String)] {
      override def compare(a: (Long, UTF8String),
          b: (Long, UTF8String)): Int = cmp(a, b)
    })
    new GenericArrayData(arr.map { case (id, s) =>
      new GenericInternalRow(Array[Any](id, s))
    }.toArray[Any])
  }

  override def serialize(q: java.util.PriorityQueue[(Long, UTF8String)])
      : Array[Byte] = {
    val entries = q.toArray(new Array[(Long, UTF8String)](q.size))
    val byteArrays = entries.map(_._2.getBytes)
    val size = 4 + entries.map(12 + _._2.numBytes()).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    var i = 0
    while (i < entries.length) {
      bb.putLong(entries(i)._1)
      bb.putInt(byteArrays(i).length)
      bb.put(byteArrays(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.PriorityQueue[(Long, UTF8String)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = newQueue()
    var i = 0
    while (i < n) {
      val id = bb.getLong
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      q.add((id, UTF8String.fromBytes(b)))
      i += 1
    }
    q
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedCollect =
    copy(idExpr = newLeft, strExpr = newRight)
}

object BoundedCollect {
  /** The `limit` smallest (id, s) pairs of the group, ascending —
    * `slice(sort_array(collect_list(struct(id, s))), 1, limit)` with an
    * O(limit) buffer. */
  def firstN(id: Column, s: Column, limit: Int): Column =
    CatalystBridge.column(BoundedCollect(
      CatalystBridge.expression(id), CatalystBridge.expression(s),
      limit).toAggregateExpression())
}
