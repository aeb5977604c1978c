package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Morton (Z-order) interleaving for two long keys — the
  * multi-dimensional clustering key every lakehouse format offers.
  * Write-side only: queries filter on the ORIGINAL columns; the
  * layout, not the z value, is what they consume. Shared by the
  * plain z-clustered parquet layout (SourceOps) and the transaction
  * log's OPTIMIZE ZORDER rewrite (TxnLog.compactZorder). */
object ZOrder {

  /** Interleave the low 16 bits of `a` and `b`: bit i of a lands at
    * position 2i, bit i of b at 2i+1. Pure integer ops, codegen'd. */
  def zValue(a: String, b: String): Column = expr(
    s"""aggregate(sequence(0, 15), 0L, (acc, i) ->
        acc + shiftleft(shiftright($a, i) & 1, 2 * i)
            + shiftleft(shiftright($b, i) & 1, 2 * i + 1))""")
}
