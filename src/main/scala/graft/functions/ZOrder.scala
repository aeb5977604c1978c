package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit, shiftleft}

/** Morton (Z-order) interleaving for two long keys — the
  * multi-dimensional clustering key every lakehouse format offers.
  * Write-side only: queries filter on the ORIGINAL columns; the
  * layout, not the z value, is what they consume. Shared by the
  * plain z-clustered parquet layout (SourceOps) and the transaction
  * log's OPTIMIZE ZORDER rewrite (TxnLog.compactZorder). */
object ZOrder {

  /** Keys must lie in [0, 2^31) for the curve position to be exact —
    * 31 bits per key interleave into a non-negative 62-bit long, so
    * the z value orders correctly under Spark's signed comparison. */
  val MaxKeyExclusive: Long = 1L << 31

  /** The classic branch-free bit spread: the low 31 bits of x move
    * to the even bit positions of a 62-bit long in five shift-or-mask
    * steps — pure integer ops, no per-row array, fully inside
    * whole-stage codegen (subexpression elimination shares the
    * intermediate steps). */
  private def spread(c: Column): Column = {
    val steps = Seq(
      16 -> 0x0000FFFF0000FFFFL,
      8 -> 0x00FF00FF00FF00FFL,
      4 -> 0x0F0F0F0F0F0F0F0FL,
      2 -> 0x3333333333333333L,
      1 -> 0x5555555555555555L)
    steps.foldLeft(c.bitwiseAND(lit(0x7FFFFFFFL))) { case (x, (sh, m)) =>
      x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(m))
    }
  }

  /** Interleave the low 31 bits of `a` and `b`: bit i of a lands at
    * position 2i, bit i of b at 2i+1 (max position 61 — the result
    * never touches the sign bit, so range-partitioning on it sorts
    * the true curve order). Keys outside [0, 2^31) alias onto the
    * curve (clustering degrades, correctness is preserved because
    * file min/max are recomputed from the real values);
    * `TxnLog.compactZorder` validates the range from manifest stats
    * when it has them. */
  def zValue(a: String, b: String): Column =
    spread(col(a)).bitwiseOR(shiftleft(spread(col(b)), 1))
}
