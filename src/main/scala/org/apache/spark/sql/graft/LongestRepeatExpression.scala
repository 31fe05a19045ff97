package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Length of the longest substring occurring at least twice WITHIN the
  * document (the classic longest-repeated-substring), at ARBITRARY
  * length and alignment — the suffix-automaton closure of the
  * substring-dedup family (q314): the fixed-floor window operators
  * (q128 ≥48, q179 ≥16) provably miss any repeat shorter than their
  * window, and no window ladder can report an exact length.
  *
  * One O(n·log σ) pass per row: build the suffix automaton (Blumer et
  * al. 1985 / Crochemore's CDAWG lineage — states ≤ 2n, transitions ≤
  * 3n), propagate endpos counts up the suffix-link tree in len order,
  * and answer max(len(v) : cnt(v) ≥ 2). Counted in CODE POINTS, not
  * UTF-16 units — SQL substring/length in both engines are
  * code-point-based (the r15 PHash64 lesson), so the DuckDB oracle's
  * window formulation sees the same offsets.
  *
  * Entirely row-local (a per-document statistic never needs to leave
  * the row — the RepetitionStats rule): the relational formulation
  * explodes EVERY (position, length) window into a row, Θ(n·maxLen)
  * corpus blowup before a doc-keyed exchange. CodegenFallback for the
  * same reason as [[RepetitionStats]]: the per-row loop is already a
  * tight JVM loop.
  */
case class LongestRepeat(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "longest_repeat"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // code points, not chars: surrogate pairs are one SQL character
    val n = s.codePointCount(0, s.length)
    val cps = new Array[Int](n)
    var ci = 0
    var off = 0
    while (off < s.length) {
      val cp = s.codePointAt(off)
      cps(ci) = cp; ci += 1; off += Character.charCount(cp)
    }
    LongestRepeat.longestRepeatLen(cps)
  }

  override protected def withNewChildInternal(newChild: Expression): LongestRepeat =
    copy(child = newChild)
}

object LongestRepeat {
  def apply(text: Column): Column =
    ExpressionUtils.column(LongestRepeat(ExpressionUtils.expression(text)))

  /** Suffix-automaton longest-repeated-substring over a code-point
    * array. States ≤ 2n+1; per-state transitions in a HashMap (σ is
    * unbounded unicode). cnt(original)=1, cnt(clone)=0, propagated to
    * suffix-link parents in decreasing-len order (counting sort by len
    * — lengths are ≤ n); LRS = max len over states with cnt ≥ 2.
    */
  private[graft] def longestRepeatLen(cps: Array[Int]): Long = {
    val n = cps.length
    if (n < 2) return 0L
    val cap = 2 * n + 2
    val len = new Array[Int](cap)
    val link = new Array[Int](cap)
    val cnt = new Array[Long](cap)
    val trans = new Array[java.util.HashMap[Integer, Integer]](cap)
    trans(0) = new java.util.HashMap[Integer, Integer]()
    link(0) = -1
    var size = 1
    var last = 0
    var i = 0
    while (i < n) {
      val c: Integer = cps(i)
      val cur = size; size += 1
      len(cur) = len(last) + 1
      cnt(cur) = 1L
      trans(cur) = new java.util.HashMap[Integer, Integer]()
      var p = last
      while (p != -1 && !trans(p).containsKey(c)) {
        trans(p).put(c, cur)
        p = link(p)
      }
      if (p == -1) link(cur) = 0
      else {
        val q = trans(p).get(c)
        if (len(p) + 1 == len(q)) link(cur) = q
        else {
          val clone = size; size += 1
          len(clone) = len(p) + 1
          link(clone) = link(q)
          cnt(clone) = 0L
          trans(clone) = new java.util.HashMap[Integer, Integer](trans(q))
          while (p != -1 && {
            val t = trans(p).get(c); t != null && t.intValue() == q
          }) {
            trans(p).put(c, clone)
            p = link(p)
          }
          link(q) = clone
          link(cur) = clone
        }
      }
      last = cur
      i += 1
    }
    // counting sort by len, then propagate cnt to link parents in
    // decreasing-len order
    val buckets = new Array[Int](n + 2)
    var v = 1
    while (v < size) { buckets(len(v)) += 1; v += 1 }
    var b = 1
    while (b <= n) { buckets(b) += buckets(b - 1); b += 1 }
    val order = new Array[Int](size - 1)
    v = 1
    while (v < size) {
      buckets(len(v)) -= 1
      order(buckets(len(v))) = v
      v += 1
    }
    var best = 0L
    var oi = order.length - 1
    while (oi >= 0) {
      val st = order(oi)
      if (cnt(st) >= 2L && len(st) > best) best = len(st)
      val lk = link(st)
      if (lk > 0) cnt(lk) += cnt(st)
      else if (lk == 0) () // root accumulates nothing we need
      oi -= 1
    }
    best
  }
}
