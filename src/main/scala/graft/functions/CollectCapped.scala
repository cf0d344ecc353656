package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Mutable aggregation buffer for [[CollectSortedCapped]]: the collected
  * elements plus a sticky overflow flag. Once a bucket exceeds the cap its
  * buffer is CLEARED and only the flag travels — a hot key's partial is a
  * boolean from that point on, never a growing list. */
final class CappedCollectBuf(
    var overflowed: Boolean,
    val items: mutable.ArrayBuffer[Any])

/** `collect_sorted_capped(e, cap)` — `sort_array(collect_list(e))` that
  * gives up on buckets holding more than `cap` elements and returns NULL
  * for them (exactly `HAVING COUNT(*) <= cap` semantics: a kept bucket's
  * list is complete and sorted; an over-cap bucket yields NULL for the
  * caller to filter).
  *
  * Why it exists (round 15): the bucketed candidate generators bound their
  * quadratic pair expansion by dropping over-cap buckets. The two-pass
  * form (a counting aggregation derives the hot-key set, broadcast as a
  * left-anti filter, then `collect_list` over the survivors) computes the
  * postings subplan twice and probes an anti-join per row; this single
  * aggregate gets the same memory bound in ONE pass — a partial buffer
  * never holds more than cap+1 elements because the overflow flag replaces
  * the list the moment it spills past the cap, and `merge` propagates the
  * flag without rebuilding the list. Null inputs are skipped, matching
  * `collect_list`.
  *
  * Determinism: the per-bucket result is sorted with the element type's
  * interpreted ordering (the same ordering `sort_array` uses), so the
  * output is independent of arrival/partition order — the property every
  * oracle-checked consumer relies on.
  *
  * The overflow CONTRACT needs `merge` to see true combined sizes for
  * non-overflowed partials, which holds because a non-overflowed partial
  * is always complete for its slice; sizes add. A bucket is therefore
  * NULL iff its true size exceeds `cap` — bit-for-bit the two-pass
  * semantics (CollectCappedSpec property-checks equivalence bucket by
  * bucket; DedupSpec pins the skeleton's plan shape).
  */
case class CollectSortedCapped(
    child: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedCollectBuf] with BinaryLike[Expression] {

  override def left: Expression = child
  override def right: Expression = capExpr

  override def prettyName: String = "collect_sorted_capped"

  lazy val cap: Int = capExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"$prettyName cap must evaluate to INT, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!capExpr.foldable || capExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable INT cap, got ${capExpr.sql}")
    else if (capExpr.eval(InternalRow.empty).asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName cap must be >= 1")
    else if (!RowOrdering.isOrderable(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName element type ${child.dataType.sql} is not orderable")
    else TypeCheckResult.TypeCheckSuccess
  }

  // NULL marks an over-cap bucket and NOTHING else: a non-overflowed
  // bucket whose inputs were all NULL returns the EMPTY array, exactly
  // what sort_array(collect_list(e)) returns there — the function is
  // registered session-wide for general SQL use, so the equivalence
  // "result IS NULL iff true bucket size > cap" must hold without
  // exceptions, not just on the skeleton's postings frames (where an
  // elementless group cannot occur — groups exist only under a posting
  // row). Round 16, from the round-15 advice: eval previously returned
  // NULL here too, a contract divergence no spec exercised.
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): CappedCollectBuf =
    new CappedCollectBuf(false, mutable.ArrayBuffer.empty[Any])

  override def update(buf: CappedCollectBuf, input: InternalRow): CappedCollectBuf = {
    if (!buf.overflowed) {
      val v = child.eval(input)
      if (v != null) {
        // copy: unsafe rows / array data are reused backing buffers
        buf.items += InternalRow.copyValue(v)
        if (buf.items.length > cap) { buf.overflowed = true; buf.items.clear() }
      }
    }
    buf
  }

  override def merge(a: CappedCollectBuf, b: CappedCollectBuf): CappedCollectBuf = {
    if (a.overflowed || b.overflowed) { a.overflowed = true; a.items.clear() }
    else {
      a.items ++= b.items
      if (a.items.length > cap) { a.overflowed = true; a.items.clear() }
    }
    a
  }

  override def eval(buf: CappedCollectBuf): Any =
    if (buf.overflowed) null
    else new GenericArrayData(buf.items.sorted(ordering).toArray)

  // Partial-to-final wire format: one unsafe row (overflowed BOOLEAN,
  // items ARRAY<element>) — the same pattern Spark's own Collect uses.
  @transient private lazy val serSchema: Array[DataType] =
    Array(BooleanType, ArrayType(child.dataType, containsNull = false))
  @transient private lazy val serProj = UnsafeProjection.create(serSchema)
  @transient private lazy val serRow = new UnsafeRow(2)

  override def serialize(buf: CappedCollectBuf): Array[Byte] =
    serProj(InternalRow(
      buf.overflowed, new GenericArrayData(buf.items.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): CappedCollectBuf = {
    serRow.pointTo(bytes, bytes.length)
    val items = mutable.ArrayBuffer.empty[Any]
    if (!serRow.getBoolean(0)) {
      val arr = serRow.getArray(1)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        items += InternalRow.copyValue(arr.get(i, child.dataType))
        i += 1
      }
    }
    new CappedCollectBuf(serRow.getBoolean(0), items)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectSortedCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectSortedCapped =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, capExpr = newRight)
}
