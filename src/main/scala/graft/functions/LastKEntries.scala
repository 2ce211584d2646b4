package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.Bridge

/** Bounded "tail of the segment" aggregate: the last `k` entries by
  * sequence, collected in one pass with a fixed-size buffer.
  *
  * The built-in formulation (`row_number() over (order by sequence desc)
  * <= k`) sorts every group; `collect_list` + `slice` holds the whole
  * group in memory. This TypedImperativeAggregate keeps at most k items
  * per group in both the partial and merge phases — the map-side combine
  * ships k entries per segment regardless of segment length, which is
  * what a "peek the last k" API must do on a 100 TB log.
  *
  * Input: struct(sequence long, ts_us long, value double, payload string).
  * Output: array of that struct, sequence-descending. */
case class LastKEntries(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[LastKEntries.Item]] {

  import LastKEntries.Item

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LastKEntries.itemType)
  override def prettyName: String = "last_k_entries"

  override def createAggregationBuffer(): ArrayBuffer[Item] =
    new ArrayBuffer[Item](k + 1)

  private def insert(buf: ArrayBuffer[Item], it: Item): Unit = {
    buf += it
    if (buf.length > k) {
      // drop the smallest sequence (linear scan; k is small)
      var minIdx = 0
      var i = 1
      while (i < buf.length) {
        if (buf(i).sequence < buf(minIdx).sequence) minIdx = i
        i += 1
      }
      buf.remove(minIdx)
    }
  }

  override def update(buf: ArrayBuffer[Item], input: InternalRow)
      : ArrayBuffer[Item] = {
    val row = child.eval(input).asInstanceOf[InternalRow]
    if (row != null) {
      val payload = if (row.isNullAt(3)) null else row.getUTF8String(3).toString
      insert(buf, Item(row.getLong(0), row.getLong(1), row.getDouble(2),
        payload))
    }
    buf
  }

  override def merge(a: ArrayBuffer[Item], b: ArrayBuffer[Item])
      : ArrayBuffer[Item] = {
    b.foreach(insert(a, _))
    a
  }

  override def eval(buf: ArrayBuffer[Item]): Any = {
    val sorted = buf.sortBy(-_.sequence)
    new GenericArrayData(sorted.map { it =>
      new GenericInternalRow(Array[Any](it.sequence, it.ts_us, it.value,
        if (it.payload == null) null else UTF8String.fromString(it.payload)))
    }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[Item]): Array[Byte] = {
    // null payloads encode as length -1
    val payloads = buf.map(it =>
      if (it.payload == null) null else it.payload.getBytes("UTF-8"))
    val size = 4 + buf.length * (8 + 8 + 8 + 4) +
      payloads.map(p => if (p == null) 0 else p.length).sum
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(buf.length)
    buf.zip(payloads).foreach { case (it, p) =>
      bb.putLong(it.sequence); bb.putLong(it.ts_us); bb.putDouble(it.value)
      if (p == null) bb.putInt(-1) else { bb.putInt(p.length); bb.put(p) }
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Item] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt()
    val buf = new ArrayBuffer[Item](n + 1)
    (1 to n).foreach { _ =>
      val seq = bb.getLong(); val ts = bb.getLong(); val v = bb.getDouble()
      val len = bb.getInt()
      val payload = if (len < 0) null else {
        val p = new Array[Byte](len); bb.get(p); new String(p, "UTF-8")
      }
      buf += Item(seq, ts, v, payload)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LastKEntries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LastKEntries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LastKEntries =
    copy(child = newChildren.head)
}

object LastKEntries {
  final case class Item(sequence: Long, ts_us: Long, value: Double,
      payload: String)

  val itemType: StructType = StructType(Seq(
    StructField("sequence", LongType),
    StructField("ts_us", LongType),
    StructField("value", DoubleType),
    StructField("payload", StringType)))

  def apply(entryStruct: Column, k: Int): Column =
    Bridge.column(LastKEntries(Bridge.expression(entryStruct), k)
      .toAggregateExpression())
}
