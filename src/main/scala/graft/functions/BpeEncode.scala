package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE merge application as ONE native Catalyst expression.
  *
  * The learned merge table (rank-ordered (lhs, rhs) pairs) rides into
  * the generated code as a single reference object — the broadcast-
  * variable pattern for plan-constant state — and the whole
  * application is one method call inside WholeStageCodegen. This
  * replaces the previous K-chained literal `replace` composition,
  * which grew the projection (and the generated method body) linearly
  * in K and hits the JVM method-size cliff at production merge counts
  * (K ≈ 30k for a GPT-2-class tokenizer); here the plan is the SAME
  * one-projection shape for any K, and K only changes the size of the
  * reference array.
  *
  * Semantics are the Sennrich, Neubig & Birch (2016) apply: for each
  * merge in rank order, one greedy left-to-right pass over the symbol
  * sequence collapses adjacent (lhs, rhs) into lhs+rhs — the fold the
  * trainer itself uses, and the fold the DuckDB oracle replays with
  * list_reduce, so all three agree bit-exactly (including the
  * overlapping-repeat case "aaaa" + (a,a) -> [aa, aa], where a
  * string-level replace would disagree).
  *
  * A bounded per-executor memo table (word -> count) makes the
  * per-occurrence cost one hash lookup: real tokenizers memoize by
  * word because Zipf corpora re-encode the same frequent words
  * endlessly. The cache lives behind the reference object, is rebuilt
  * lazily per executor after deserialization, and stops growing at
  * [[BpeEncode.CacheCap]] entries so a 100 TB long-tail corpus cannot
  * balloon executor memory.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_encode"

  @transient private lazy val table = new BpeEncode.Table(
    merges.map(_._1).toArray, merges.map(_._2).toArray)

  override def nullSafeEval(v: Any): Any =
    BpeEncode.count(v.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeEncode.Table].getName)
    defineCodeGen(ctx, ev, x => s"graft.functions.BpeEncode.count($x, $t)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncode {
  /** Memo cap: ~1M distinct words (a few tens of MB of strings) per
    * executor; past that, encode without caching. */
  val CacheCap = 1 << 20

  /** Rank-ordered merge table + per-executor memo. Serializable so it
    * ships inside the plan references; the memo itself is transient
    * and repopulates on each executor. */
  final class Table(val lhs: Array[String], val rhs: Array[String])
      extends Serializable {
    @transient lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  }

  /** Subword count of `word` after applying every merge in rank
    * order, greedy left-to-right (shared by interpreted + codegen). */
  def count(word: UTF8String, t: Table): Long = {
    val w = word.toString
    val hit = t.memo.get(w)
    if (hit != null) return hit.longValue()
    val n = encode(w, t.lhs, t.rhs).length.toLong
    if (t.memo.size < CacheCap) t.memo.put(w, n)
    n
  }

  /** The raw fold, exposed for specs: symbols after all K passes. */
  private[graft] def encode(w: String, lhs: Array[String],
      rhs: Array[String]): Array[String] = {
    val toks = new Array[String](w.length)
    var i = 0
    while (i < w.length) { toks(i) = String.valueOf(w.charAt(i)); i += 1 }
    var nTok = w.length
    var k = 0
    while (k < lhs.length && nTok > 1) {
      val a = lhs(k); val b = rhs(k)
      var wr = 0; var rd = 0
      while (rd < nTok) {
        val t = toks(rd)
        if (wr > 0 && toks(wr - 1) == a && t == b) toks(wr - 1) = a + b
        else { toks(wr) = t; wr += 1 }
        rd += 1
      }
      nTok = wr
      k += 1
    }
    java.util.Arrays.copyOfRange(toks, 0, nTok)
  }

  def bpeEncode(c: Column, merges: Seq[(String, String)]): Column =
    Shim.toColumn(BpeEncode(Shim.toExpression(c), merges))
}
