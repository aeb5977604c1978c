package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial (Rabin-Karp) rolling hash of a string column:
  * h = fold(h * 31 + codepoint) mod (2^31 - 1), h0 = 0.
  *
  * The arithmetic is chosen to be mirrorable in portable SQL (the
  * DuckDB oracle computes the identical fold with list_reduce over
  * unicode codepoints), unlike md5/xxhash64 whose byte-level
  * definitions differ across engines' SQL surfaces. Codegen keeps the
  * per-character loop inside WholeStageCodegen.
  */
case class RollingHash(child: Expression, mult: Long = 31L)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(v: Any): Any =
    RollingHash.hash(v.asInstanceOf[UTF8String], mult)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.RollingHash.hash($x, ${mult}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  private val P = 2147483647L // 2^31 - 1

  /** Shared by interpreted and codegen paths; iterates Unicode
    * codepoints (not UTF-8 bytes) to match SQL `unicode(ch)`.
    * `mult` must keep mult*P + cp < 2^63 — any small prime is fine. */
  def hash(s: UTF8String, mult: Long): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * mult + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  def hash(s: UTF8String): Long = hash(s, 31L)

  def rollingHash(c: Column, mult: Long = 31L): Column =
    Shim.toColumn(RollingHash(Shim.toExpression(c), mult))
}
