package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import scala.collection.mutable.ArrayBuffer

/** `collect_list` with a hard per-group state bound.
  *
  * Accumulates at most `cap` long values per group and then stops — unlike
  * `collect_list`, whose buffer grows with the group, so one degenerate
  * key (an LSH bucket holding every copy of a boilerplate page, a whale
  * user's event list) can OOM an executor at scale. Callers that need to
  * DETECT truncation pass cap = wanted + 1 and drop groups whose result
  * reached the sentinel length.
  *
  * Values arriving after the cap are discarded, so for groups over the cap
  * the kept subset depends on task order — only size and set semantics up
  * to the cap are deterministic. Groups at or under the cap collect fully
  * and deterministically.
  */
case class CollectCappedLongs(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]] {

  require(cap > 0, "cap must be positive")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // update() reads the child as Long; make that a resolve-time contract
  // instead of a mid-job ClassCastException.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): ArrayBuffer[Long] =
    ArrayBuffer.empty[Long]

  override def update(buf: ArrayBuffer[Long],
                      input: InternalRow): ArrayBuffer[Long] = {
    if (buf.length < cap) {
      val v = child.eval(input)
      if (v != null) buf += v.asInstanceOf[Long]
    }
    buf
  }

  override def merge(a: ArrayBuffer[Long],
                     b: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    val room = cap - a.length
    if (room >= b.length) a ++= b else a ++= b.take(room)
    a
  }

  override def eval(buf: ArrayBuffer[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: ArrayBuffer[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[Long](n)
    var i = 0
    while (i < n) { buf += bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CollectCappedLongs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CollectCappedLongs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "collect_capped_longs"
}

object CollectCappedLongs {
  /** Column builder: collect at most `cap` longs per group. */
  def apply(c: Column, cap: Int): Column =
    GraftBridge.column(
      new CollectCappedLongs(GraftBridge.expression(c), cap)
        .toAggregateExpression())
}
