package graft.exec

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `collect_list` with a hard cap on the number of buffered elements.
  *
  * The LSH dedup pipelines group corpus rows into (band, bucket) cells and
  * only ever want buckets up to `maxBucket` rows — larger cells are flood
  * buckets that get dropped or re-banded. Spark's `collect_list` would
  * still materialize the ENTIRE flood bucket in one aggregation buffer
  * before the size filter discards it, which at corpus scale means
  * buffering millions of rows (or vectors) in a single task. This
  * aggregate stops appending at `limit`, so every buffer is O(limit)
  * bytes no matter how hot the key: a result of size < limit is exact and
  * complete; size == limit means "at least limit elements" and is the
  * oversized signal (callers pass limit = maxBucket + 1).
  *
  * Buffer serialization follows Spark's own Collect aggregate: the buffer
  * round-trips through an UnsafeRow-projected array value, so any element
  * type (atomic, struct, array) is supported.
  */
final case class BoundedCollectList(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]]
    with UnaryLike[Expression] {

  require(limit > 0, "bounded_collect_list requires a positive limit")

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  override def update(
      buffer: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] = {
    if (buffer.size < limit) {
      val v = child.eval(input)
      // like collect_list, nulls are skipped; values are copied because the
      // input row is reused by the aggregation iterator
      if (v != null) buffer += InternalRow.copyValue(v)
    }
    buffer
  }

  override def merge(
      buffer: mutable.ArrayBuffer[Any],
      other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    var i = 0
    while (buffer.size < limit && i < other.size) {
      buffer += other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toSeq)

  @transient private lazy val projection =
    UnsafeProjection.create(Array[DataType](ArrayType(child.dataType, containsNull = false)))
  @transient private lazy val reusedRow = new UnsafeRow(1)

  override def serialize(obj: mutable.ArrayBuffer[Any]): Array[Byte] =
    projection.apply(InternalRow.apply(new GenericArrayData(obj.toSeq))).getBytes()

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val buffer = createAggregationBuffer()
    reusedRow.pointTo(bytes, bytes.length)
    reusedRow.getArray(0).foreach(child.dataType, (_, v: Any) => buffer += v)
    buffer
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollectList =
    copy(child = newChild)
  override def prettyName: String = "bounded_collect_list"
}

object BoundedCollect {
  /** Column API: collect up to `limit` values of `c` per group. */
  def boundedCollectList(c: Column, limit: Int): Column =
    ColumnBridge.column(
      BoundedCollectList(ColumnBridge.expression(c), limit).toAggregateExpression())
}
