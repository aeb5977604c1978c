package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** |a ∩ b| for two SORTED string arrays as a two-pointer merge —
  * O(n+m) with zero allocation, versus array_intersect's per-row
  * hash-set build + result-array materialization (we only need the
  * SIZE). This sits in the hottest loop of the dedup family: exact
  * Jaccard verification runs once per candidate pair, and candidate
  * counts are output-scale (~10^5 per 8× replica at sf0.1).
  *
  * Both inputs MUST be sorted ascending by UTF8String binary order —
  * Dedup.shingleArrays stages them with sort_array, which sorts by
  * exactly that order. Duplicates within an input are counted once
  * (set semantics, matching array_intersect); the staged arrays are
  * distinct anyway.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectSize.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.functions.SortedIntersectSize.count($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  /** Shared by interpreted and codegen paths.
    *
    * Null ELEMENTS follow array_intersect's semantics: null matches
    * null, counted once. sort_array (the documented way to produce
    * the sorted inputs) places nulls first, which is where they are
    * consumed; a null appearing mid-array (a differently-sorted
    * caller through the SQL registry) is skipped rather than
    * dereferenced — set semantics are preserved either way and the
    * function can no longer NPE on user input. */
  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    var aNull = false
    while (i < na && a.isNullAt(i)) { aNull = true; i += 1 }
    var bNull = false
    while (j < nb && b.isNullAt(j)) { bNull = true; j += 1 }
    if (aNull && bNull) n += 1
    var prev: UTF8String = null
    while (i < na && j < nb) {
      val x = a.getUTF8String(i)
      val y = b.getUTF8String(j)
      if (x == null) i += 1
      else if (y == null) j += 1
      else {
        val c = x.compareTo(y)
        if (c < 0) i += 1
        else if (c > 0) j += 1
        else {
          if (prev == null || x.compareTo(prev) != 0) { n += 1; prev = x }
          i += 1; j += 1
        }
      }
    }
    n
  }

  def sortedIntersectSize(a: Column, b: Column): Column =
    Shim.toColumn(
      SortedIntersectSize(Shim.toExpression(a), Shim.toExpression(b)))
}
