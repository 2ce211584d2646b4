package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.Bridge

/** 64-bit polynomial rolling-hash fingerprint of a string:
  * `h = (h * 31 + byte) mod (2^61 - 1)`, seeded at 7.
  *
  * The document-fingerprinting primitive from SURVEY §2-G (dual of content
  * fingerprints the reference computes over payload bytes at produce time).
  * Implemented as a native Catalyst expression with `doGenCode` so it stays
  * inside whole-stage codegen — a Scala UDF here would break the codegen
  * span for every fingerprint/dedup pipeline that uses it.
  */
case class PolyHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash64"

  override def nullSafeEval(input: Any): Any =
    PolyHash64.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PolyHash64.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): PolyHash64 =
    copy(child = newChild)
}

object PolyHash64 {
  final val Mod: Long = (1L << 61) - 1

  /** Horner evaluation in the 2^61-1 field; called from generated code. */
  def hash(bytes: Array[Byte]): Long = {
    var h = 7L
    var i = 0
    while (i < bytes.length) {
      // h*31 fits: h < 2^61, 31*h < 2^66 — use Math.multiplyHigh-free
      // split: h*31 = h*32 - h, reduce mod 2^61-1 via shifts.
      val prod = mulMod31(h)
      h = prod + (bytes(i) & 0xff)
      if (h >= Mod) h -= Mod
      i += 1
    }
    h
  }

  private def mulMod31(h: Long): Long = {
    // (h * 31) mod (2^61 - 1) without 128-bit: h*31 = (h << 5) - h.
    // Compute in two reduced steps to stay within 64 bits.
    val h5 = shiftMod(h, 5)
    var r = h5 - h
    if (r < 0) r += Mod
    r
  }

  private def shiftMod(h: Long, k: Int): Long = {
    // (h << k) mod (2^61 - 1): rotate the top k bits around (Mersenne).
    val r = ((h << k) & Mod) + (h >>> (61 - k))
    if (r >= Mod) r - Mod else r
  }

  def apply(c: Column): Column =
    Bridge.column(PolyHash64(Bridge.expression(c)))
}
