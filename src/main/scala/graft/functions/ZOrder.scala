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

  /** Keys must lie in [0, 2^31) for the curve position to be exact —
    * 31 bits per key interleave into a non-negative 62-bit long, so
    * the z value orders correctly under Spark's signed comparison. */
  val MaxKeyExclusive: Long = 1L << 31

  /** Interleave the low 31 bits of `a` and `b`: bit i of a lands at
    * position 2i, bit i of b at 2i+1 (max position 61 — the result
    * never touches the sign bit, so range-partitioning on it sorts
    * the true curve order). Keys outside [0, 2^31) alias onto the
    * curve (clustering degrades, correctness is preserved because
    * file min/max are recomputed from the real values);
    * `TxnLog.compactZorder` validates the range from manifest stats
    * when it has them. Pure integer ops, codegen'd. */
  def zValue(a: String, b: String): Column = expr(
    s"""aggregate(sequence(0, 30), 0L, (acc, i) ->
        acc + shiftleft(shiftright($a, i) & 1, 2 * i)
            + shiftleft(shiftright($b, i) & 1, 2 * i + 1))""")
}
