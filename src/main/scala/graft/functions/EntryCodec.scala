package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.Bridge

/** Binary entry codec — the Spark dual of the reference's storage codec
  * (`internal/codec/codec.go:55-138` EncodeEntry/DecodeEntry: fixed-size
  * fields then length-prefixed variable fields, little-endian). The graft
  * layout is its own (version byte + sequence/ts_us/value + length-
  * prefixed space/segment/payload) but plays the same role: entries
  * become opaque bytes for transport/storage and decode losslessly.
  *
  * Both directions are single-pass ByteBuffer walks callable from
  * generated code. */
object EntryCodec {
  val Version: Byte = 1

  val entryType: StructType = StructType(Seq(
    StructField("sequence", LongType),
    StructField("ts_us", LongType),
    StructField("value", DoubleType),
    StructField("space", StringType),
    StructField("segment", StringType),
    StructField("payload", StringType)))

  /** Called from generated code: pack one entry struct. Null string
    * fields encode as length -1 (a producer may legitimately send a
    * null payload; crashing the executor is not an option). */
  def encode(row: InternalRow): Array[Byte] = {
    def strBytes(i: Int): Array[Byte] =
      if (row.isNullAt(i)) null else row.getUTF8String(i).getBytes
    val space = strBytes(3)
    val segment = strBytes(4)
    val payload = strBytes(5)
    def len(b: Array[Byte]): Int = if (b == null) 0 else b.length
    val buf = ByteBuffer
      .allocate(1 + 8 + 8 + 8 + 12 + len(space) + len(segment) +
        len(payload))
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(Version)
    buf.putLong(row.getLong(0))
    buf.putLong(row.getLong(1))
    buf.putDouble(row.getDouble(2))
    def put(b: Array[Byte]): Unit =
      if (b == null) buf.putInt(-1) else { buf.putInt(b.length); buf.put(b) }
    put(space); put(segment); put(payload)
    buf.array()
  }

  /** Called from generated code: unpack one entry struct. */
  def decode(bytes: Array[Byte]): InternalRow = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val version = buf.get()
    require(version == Version, s"unsupported entry codec version $version")
    val sequence = buf.getLong()
    val tsUs = buf.getLong()
    val value = buf.getDouble()
    def readStr(): UTF8String = {
      val n = buf.getInt()
      if (n < 0) null
      else {
        val arr = new Array[Byte](n)
        buf.get(arr)
        UTF8String.fromBytes(arr)
      }
    }
    new GenericInternalRow(Array[Any](sequence, tsUs, value,
      readStr(), readStr(), readStr()))
  }

  def pack(entryStruct: Column): Column =
    Bridge.column(EncodeEntryExpr(Bridge.expression(entryStruct)))

  def unpack(bin: Column): Column =
    Bridge.column(DecodeEntryExpr(Bridge.expression(bin)))
}

case class EncodeEntryExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "entry_pack"

  override def nullSafeEval(input: Any): Any =
    EntryCodec.encode(input.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.EntryCodec.encode($c)")

  override protected def withNewChildInternal(newChild: Expression): EncodeEntryExpr =
    copy(child = newChild)
}

case class DecodeEntryExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = EntryCodec.entryType
  override def prettyName: String = "entry_unpack"

  override def nullSafeEval(input: Any): Any =
    EntryCodec.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.EntryCodec.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): DecodeEntryExpr =
    copy(child = newChild)
}
