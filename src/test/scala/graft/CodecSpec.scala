package graft

import scala.util.Random
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.EntryCodec

class CodecSpec extends SparkSpec {

  private val rnd = new Random(7)
  private def randStr(n: Int): String =
    (0 until rnd.nextInt(n)).map(_ => (32 + rnd.nextInt(95)).toChar).mkString

  test("entry codec roundtrips random entries losslessly") {
    (1 to 300).foreach { _ =>
      val row = new GenericInternalRow(Array[Any](
        rnd.nextLong(), rnd.nextLong(), rnd.nextDouble(),
        UTF8String.fromString(randStr(20)),
        UTF8String.fromString(randStr(20)),
        UTF8String.fromString(randStr(500))))
      val back = EntryCodec.decode(EntryCodec.encode(row))
      assert(back.getLong(0) == row.getLong(0))
      assert(back.getLong(1) == row.getLong(1))
      assert(back.getDouble(2) == row.getDouble(2))
      (3 to 5).foreach { i =>
        assert(back.getUTF8String(i) == row.getUTF8String(i))
      }
    }
  }

  test("codec rejects unknown versions") {
    val row = new GenericInternalRow(Array[Any](1L, 2L, 3.0,
      UTF8String.fromString("s"), UTF8String.fromString("g"),
      UTF8String.fromString("p")))
    val bytes = EntryCodec.encode(row)
    bytes(0) = 99
    intercept[IllegalArgumentException](EntryCodec.decode(bytes))
  }

  test("codec works end-to-end inside a Spark plan") {
    import org.apache.spark.sql.functions.{col, struct}
    val entries = graft.sources.EventLog.entries(spark, SF, Some("view"))
    val out = entries
      .withColumn("bin", EntryCodec.pack(struct(
        col("sequence"), col("ts_us"), col("value"),
        col("space"), col("segment"), col("payload"))))
      .withColumn("e", EntryCodec.unpack(col("bin")))
      .filter(col("e.sequence") === col("sequence") &&
        col("e.payload") === col("payload"))
    assert(out.count() == entries.count())
  }
}
