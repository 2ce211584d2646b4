package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.Bridge

/** Winnowed content-defined anchors for exact-substring duplicate
  * detection (the ExactSubstr dedup recipe, re-expressed for a
  * shuffle-bounded engine; winnowing per Schleimer/Wilkerson/Aiken,
  * SIGMOD'03): md5 of every `k`-char window of the text, then the
  * minimum hash of each run of `w` consecutive window hashes (trailing
  * partial runs included), distinct.
  *
  * GUARANTEE: two documents sharing a verbatim character run of length
  * ≥ `k + w - 1` share at least one complete winnow window inside the
  * run, and the minimum of the same `w` hashes is the same hash — so
  * they share an anchor (recall 1 above the guarantee length; expected
  * anchor density is only ~2/(w+1) per position, which is what makes
  * the downstream anchor equijoin linear instead of positional).
  *
  * Everything here is reproducible in ANSI SQL (md5 + window min +
  * distinct), which is what lets the driver's DuckDB oracle check the
  * whole operator end-to-end. Hashes are md5 hex (lowercase): identical
  * bytes and identical lexicographic order in both engines. Windows are
  * counted in Unicode code points to match SQL `substr` semantics.
  *
  * Native Catalyst expression with `doGenCode` so the per-document
  * linear pass stays inside whole-stage codegen.
  */
case class WinnowedAnchors(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnowed_anchors"

  override def nullSafeEval(input: Any): Any =
    WinnowedAnchors.anchors(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowedAnchors.anchors($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowedAnchors =
    copy(child = newChild)
}

object WinnowedAnchors {
  def apply(c: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowedAnchors(Bridge.expression(c), k, w))

  private val Empty = new GenericArrayData(Array.empty[Any])

  private val Md5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val Hex = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = Hex(b >>> 4)
      out(i * 2 + 1) = Hex(b & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Char offsets of each code-point boundary (length = codePoints + 1).
    * SQL `substr` counts characters (code points); Java `String` indexes
    * UTF-16 units — identical until an astral char appears, at which
    * point naive char indexing silently diverges from the oracle. */
  private def codePointOffsets(s: String): Array[Int] = {
    val m = s.codePointCount(0, s.length)
    val offs = new Array[Int](m + 1)
    var p = 0
    var ci = 0
    while (ci < m) {
      offs(ci) = p
      p += Character.charCount(s.codePointAt(p))
      ci += 1
    }
    offs(m) = s.length
    offs
  }

  /** Called from generated code. */
  def anchors(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.toString
    val offs = codePointOffsets(str)
    val n = offs.length - 1 - k + 1 // number of k-char windows
    if (n <= 0) return Empty
    val digest = Md5.get()
    val hashes = new Array[String](n)
    var i = 0
    while (i < n) {
      val bytes = str.substring(offs(i), offs(i + k))
        .getBytes(StandardCharsets.UTF_8)
      hashes(i) = hex(digest.digest(bytes)) // digest() resets the instance
      i += 1
    }
    // winnow: min of hashes[i .. min(i+w-1, n-1)] for every start i,
    // via a monotonic deque (O(n) total), scanning starts right-to-left.
    // Deque holds indices ascending front→back; dominated values (≥ the
    // incoming hash, which outlives them) are popped at the insertion
    // side (front), so values DECREASE front→back and the back is both
    // the current window minimum and the next index to expire.
    val seen = new java.util.LinkedHashSet[String]()
    val deque = new java.util.ArrayDeque[Int]()
    var j = n - 1
    while (j >= 0) {
      while (!deque.isEmpty && deque.peekLast() > j + w - 1) deque.pollLast()
      while (!deque.isEmpty && hashes(deque.peekFirst()).compareTo(hashes(j)) >= 0)
        deque.pollFirst()
      deque.addFirst(j)
      seen.add(hashes(deque.peekLast()))
      j -= 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }
}
