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

  /** Bits each key contributes to an n-key interleave: the 62
    * non-sign bits split evenly, so 2 keys keep the classic 31, 3
    * keys get 20, 4 get 15. Coarser per-key resolution is the
    * inherent trade of higher-dimensional clustering — file-level
    * min/max only need the curve to keep each key's range tight, not
    * exact. */
  def bitsPerKey(n: Int): Int = 62 / n

  /** Key domain bound for an n-key interleave (2 keys reproduces
    * [[MaxKeyExclusive]]). */
  def maxKeyExclusive(n: Int): Long = 1L << bitsPerKey(n)

  /** Round-robin Morton interleave of N long keys: bit i of key j
    * lands at position i*n + j, so every prefix of the z value
    * constrains ALL keys about equally — the property that keeps
    * each key's per-file range tight under range-partitioning on the
    * value. Two keys route through the branch-free [[zValue]] fast
    * path; for n >= 3 the bits move individually (bitsPerKey(n)*n
    * shift-or terms — write-side rewrite cost only, still plain
    * integer ops inside codegen). Keys outside
    * [0, maxKeyExclusive(n)) alias on the curve (clustering degrades,
    * correctness is preserved); `TxnLog.compactZorder` validates the
    * range from manifest stats when it has them. */
  def zValueN(keys: Seq[String]): Column = {
    require(keys.length >= 2, "zValueN needs at least two keys")
    if (keys.length == 2) zValue(keys(0), keys(1))
    else {
      val n = keys.length
      val b = bitsPerKey(n)
      keys.zipWithIndex.map { case (k, j) =>
        val x = col(k).bitwiseAND(lit((1L << b) - 1))
        (0 until b).map(i =>
          shiftleft(x.bitwiseAND(lit(1L << i)), i * (n - 1) + j))
          .reduce(_.bitwiseOR(_))
      }.reduce(_.bitwiseOR(_))
    }
  }
}
