package org.apache.spark.sql.graftx

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit md5-derived hash of a string column, bit-identical to
  * DuckDB's `md5_number_upper(s) >> 32` (DuckDB reads the first 8
  * digest bytes little-endian, so the value is digest bytes 7..4,
  * most-significant first).
  *
  * Why native: the builtin route (`conv(concat(substring(md5(s)...)
  * ×4), 16, 10)`) allocates five strings per input value — the 32-char
  * hex digest, four 2-char chops, their concat — and then PARSES the
  * result back out of text. Per-token in a fingerprinting pass that is
  * the dominant allocation source of the whole query (VERDICT r3 #1:
  * GC-pathological under bench-JVM heap pressure). This expression
  * digests the UTF-8 bytes directly and assembles the long with four
  * shifts — the only allocation is the 16-byte digest array, and the
  * MessageDigest instance is thread-local (one per executor thread,
  * not per row).
  */
case class Md5Hash32(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash32"

  override def nullSafeEval(input: Any): Any =
    Md5Hash32.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftx.Md5Hash32.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash32 =
    copy(child = newChild)
}

object Md5Hash32 {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Static entry point shared by interpreted eval and generated code
    * (Scala emits a static forwarder on the companion class, so Janino
    * calls it as a plain static method).
    */
  def hash(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    ((dig(7) & 0xFFL) << 24) | ((dig(6) & 0xFFL) << 16) |
      ((dig(5) & 0xFFL) << 8) | (dig(4) & 0xFFL)
  }
}
