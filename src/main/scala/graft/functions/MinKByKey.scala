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

/** Bounded "k smallest by key" aggregate: the k items with the
  * lexicographically smallest (key, id) per group, collected in one pass
  * with a fixed-size buffer — the [[LastKEntries]] posture generalized
  * from "tail by sequence" to "head by an arbitrary string key".
  *
  * The built-in formulation (`row_number() over (partition by g order by
  * key) <= k`) SORTS every group — at 100 TB strata of a web corpus that
  * is a full per-stratum sort just to keep k rows. This aggregate keeps
  * at most k items per group in the partial AND merge phases, so the
  * map-side combine ships k rows per (stratum × input partition)
  * regardless of stratum size, and no sort ever runs over the corpus.
  * Determinism: ties on `key` break by `id`, so the result is a pure
  * function of the group's (key, id) set.
  *
  * Input: struct(key string, id long). Output: array of that struct,
  * (key, id)-ascending — position in the array is the sample rank. */
case class MinKByKey(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[MinKByKey.Item]] {

  import MinKByKey.Item

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(MinKByKey.itemType)
  override def prettyName: String = "min_k_by_key"

  override def createAggregationBuffer(): ArrayBuffer[Item] =
    new ArrayBuffer[Item](k + 1)

  private def greater(a: Item, b: Item): Boolean = {
    val c = a.key.compareTo(b.key)
    c > 0 || (c == 0 && a.id > b.id)
  }

  private def insert(buf: ArrayBuffer[Item], it: Item): Unit = {
    buf += it
    if (buf.length > k) {
      // evict the largest (key, id) (linear scan; k is small)
      var maxIdx = 0
      var i = 1
      while (i < buf.length) {
        if (greater(buf(i), buf(maxIdx))) maxIdx = i
        i += 1
      }
      buf.remove(maxIdx)
    }
  }

  override def update(buf: ArrayBuffer[Item], input: InternalRow)
      : ArrayBuffer[Item] = {
    val row = child.eval(input).asInstanceOf[InternalRow]
    if (row != null && !row.isNullAt(0) && !row.isNullAt(1)) {
      insert(buf, Item(row.getUTF8String(0).toString, row.getLong(1)))
    }
    buf
  }

  override def merge(a: ArrayBuffer[Item], b: ArrayBuffer[Item])
      : ArrayBuffer[Item] = {
    b.foreach(insert(a, _))
    a
  }

  override def eval(buf: ArrayBuffer[Item]): Any = {
    val sorted = buf.sortWith((x, y) => greater(y, x))
    new GenericArrayData(sorted.map { it =>
      new GenericInternalRow(
        Array[Any](UTF8String.fromString(it.key), it.id))
    }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[Item]): Array[Byte] = {
    val keys = buf.map(_.key.getBytes("UTF-8"))
    val size = 4 + buf.length * (4 + 8) + keys.map(_.length).sum
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(buf.length)
    buf.zip(keys).foreach { case (it, kb) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(it.id)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Item] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt()
    val buf = new ArrayBuffer[Item](n + 1)
    (1 to n).foreach { _ =>
      val len = bb.getInt()
      val kb = new Array[Byte](len); bb.get(kb)
      buf += Item(new String(kb, "UTF-8"), bb.getLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKByKey =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKByKey =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinKByKey =
    copy(child = newChildren.head)
}

object MinKByKey {
  final case class Item(key: String, id: Long)

  val itemType: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("id", LongType)))

  def apply(keyIdStruct: Column, k: Int): Column =
    Bridge.column(MinKByKey(Bridge.expression(keyIdStruct), k)
      .toAggregateExpression())
}
