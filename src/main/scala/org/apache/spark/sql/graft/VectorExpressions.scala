package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, LongType, StructType, TypeCollection}

/** Native Catalyst expression for quantized-vector arithmetic (lives
  * in an `org.apache.spark.sql` subpackage because the Column↔
  * Expression bridge and `AbstractDataType` are `private[sql]`).
  *
  * `aggregate`/`zip_with` (the portable formulations in
  * graft.similarity) are higher-order functions Spark evaluates
  * interpreted — per element, with closure dispatch — and they block
  * whole-stage codegen of the surrounding stage. [[LongVectorDot]]
  * computes the same integer dot product as one fused loop with
  * `doGenCode`, keeping scan→score→top-k in a single codegen stage.
  * Same inputs, bit-identical outputs; only the execution strategy
  * differs (build-brief preference (b): native Expression over UDF).
  */
case class LongVectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "long_vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongVectorDot =
    copy(left = newLeft, right = newRight)
}

/** PQ asymmetric-distance gather: Σ_j lut[j·ksub + codes[j]] — the ADC
  * inner loop of product-quantized similarity scan (Jégou et al. 2011,
  * "Product Quantization for Nearest Neighbor Search"). `codes` is a
  * vector's m sub-quantizer cell ids; `lut` is one query's flattened
  * m×ksub table of per-cell score parts. One fused codegen loop per
  * (query, vector) pair keeps the compressed-corpus scan — the whole
  * point of PQ at scale — inside the scan stage's codegen span.
  */
case class PqAdcScore(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var acc = 0L
    var j = 0
    while (j < m) { acc += lut.getLong(j * ksub + codes.getLong(j).toInt); j += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = $codes.numElements();
         |long $acc = 0L;
         |for (int $j = 0; $j < $m; $j++) {
         |  $acc += $lut.getLong($j * $ksub + (int) $codes.getLong($j));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}

/** Fused embedding quantizer: array<float|double> → array<long> of
  * `round(x·10⁴)` (HALF_UP, bit-identical to the composed
  * `transform(emb, x -> round(cast(x as double) * 10000) cast long)` —
  * `java.math.BigDecimal.valueOf(...).setScale(0, HALF_UP)` is exactly
  * Spark's `Round` double path). Exists because the HOF form is a
  * CodegenFallback: a `posexplode` whose generator input is a
  * collapsed interpreted HOF re-evaluates the whole transform per
  * OUTPUT element — O(dim²) interpreted work per row (the q134
  * pathology; measured 5.3 s → 134.6 s on 100k → 1M vectors for
  * label centroids). One codegen'd kernel call per row restores O(dim)
  * and keeps the scan's codegen span intact.
  */
case class FloatVectorQuantize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "float_vector_quantize"

  // resolved lazily: child.dataType is not bound at construction
  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Per-row kernel, also called from generated code via reference obj.
    * Null ELEMENTS fail loud (suite convention): the output type declares
    * containsNull=false, and silently quantizing a null slot to 0 — what
    * getFloat on a null entry would do — would corrupt downstream vector
    * math invisibly. The HOF form this kernel replaced propagated null
    * elements; no caller feeds nullable slots, so loud is the safe seam.
    */
  def kernel(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) {
        throw new IllegalArgumentException(
          s"float_vector_quantize: null element at index $i of $n — " +
            "embedding vectors must be dense (containsNull=false output)")
      }
      val d = (if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)) * 10000.0
      out(i) = java.math.BigDecimal.valueOf(d)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = kernel(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("quantizer", this,
      classOf[FloatVectorQuantize].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.kernel($x);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): FloatVectorQuantize = copy(child = newChild)
}

/** max(|x_i|) over an array<long> — the per-vector quantization scale
  * lookup of the int8 audit (q266). One fused codegen loop; the
  * `array_max(transform(abs))` HOF form is interpreted per element and
  * would break the scan's codegen span. Empty arrays yield 0.
  */
case class LongVectorAbsMax(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "long_vector_abs_max"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var m = 0L
    var i = 0
    while (i < n) { val v = math.abs(x.getLong(i)); if (v > m) m = v; i += 1 }
    m
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val v = ctx.freshName("v")
      s"""
         |int $n = $x.numElements();
         |long $m = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $v = Math.abs($x.getLong($i));
         |  if ($v > $m) $m = $v;
         |}
         |${ev.value} = $m;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): LongVectorAbsMax = copy(child = newChild)
}

/** Row-local PQ encoder: quantized vector → its m sub-quantizer cell
  * ids against a DRIVER-LITERAL codebook (≤ m·ksub cells by operator
  * construction — bounded collect, the seeds-collect pattern). Per
  * subspace j: argmax over present cells of `2·(sv_j·cq) − ||cq||²`
  * (≡ argmin L2, exact integer), tie → min cid — bit-identical to the
  * join+window assignment it replaces (and to the oracle's unrolled
  * CTE), but with ZERO exchanges: the former plan shuffled every
  * (vector, subspace) row with its sv and winning centroid through a
  * window exchange — ~1.5 GB at 1M×64d, most of the PQ index build.
  * Cell norms are precomputed once per executor (lazy).
  */
case class PqEncode(
    child: Expression,
    cb: IndexedSeq[Long],
    present: IndexedSeq[Boolean],
    m: Int,
    dsub: Int,
    ksub: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode"
  // Plan text prints the codebook SHAPE, not its values: the payload is
  // data-derived (trained on the corpus), so printing it broke the
  // cross-SF Verify↔Bench fingerprint linkage for every PQ consumer —
  // the values are environment, the m×ksub×dsub layout is the plan.
  override def toString: String =
    s"$prettyName($child, cb[m=$m,ksub=$ksub,dsub=$dsub])"

  @transient private lazy val cbArr: Array[Long] = cb.toArray
  @transient private lazy val presentArr: Array[Boolean] = present.toArray
  // ||cq||² per flat cell id j·ksub + cid
  @transient private lazy val norms: Array[Long] = {
    val out = new Array[Long](m * ksub)
    var c = 0
    while (c < m * ksub) {
      var s = 0L
      var p = 0
      while (p < dsub) { val v = cbArr(c * dsub + p); s += v * v; p += 1 }
      out(c) = s
      c += 1
    }
    out
  }

  /** Per-row kernel, also called from generated code via reference obj.
    * Loud on malformed input (suite convention, same seam as
    * FloatVectorQuantize's null-slot guard): a vector shorter than
    * m·dsub would otherwise read unchecked garbage via getLong, and a
    * subspace with no present codebook cells would emit cid −1 as a
    * silent poison code.
    */
  def kernel(a: ArrayData): ArrayData = {
    if (a.numElements() != m * dsub) {
      throw new IllegalArgumentException(
        s"pq_encode: vector length ${a.numElements()} != m*dsub = ${m * dsub} — " +
          "codes would index past the codebook layout")
    }
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      var bestCid = -1L
      var bestNd = Long.MinValue
      var cid = 0
      while (cid < ksub) {
        val flat = j * ksub + cid
        if (presentArr(flat)) {
          var dot = 0L
          var p = 0
          val base = flat * dsub
          while (p < dsub) {
            dot += a.getLong(j * dsub + p) * cbArr(base + p)
            p += 1
          }
          val nd = 2L * dot - norms(flat)
          if (nd > bestNd) { bestNd = nd; bestCid = cid.toLong }
        }
        cid += 1
      }
      if (bestCid == -1L) {
        throw new IllegalStateException(
          s"pq_encode: subspace $j has no present codebook cells — " +
            "the codebook build must cover every subspace")
      }
      out(j) = bestCid
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = kernel(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncoder", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.kernel($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Row-local coarse-quantizer assignment: quantized vector → its `top`
  * nearest centroid ids from a DRIVER-LITERAL centroid table
  * (≤ nCentroids rows by operator construction). Ranking is exact
  * integer `2·(v·cq) − ||cq||²` descending (≡ L2 ascending), tie →
  * min cid — bit-identical to the crossJoin+window assignment it
  * replaces, which shuffled every vector together with its winning
  * centroids through the window exchange (~1.7 GB at 1M×64d for the
  * IVFPQ index+probe assignments). Returns the ids best-first.
  */
case class CentroidTopK(
    child: Expression,
    cents: IndexedSeq[Long],
    cids: IndexedSeq[Long],
    dim: Int,
    top: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "centroid_top_k"
  // shape-only plan text (see PqEncode.toString): centroid VALUES are
  // data-derived environment; count/dim/top are the plan
  override def toString: String =
    s"$prettyName($child, cents[n=${cids.length},dim=$dim], top=$top)"

  @transient private lazy val centArr: Array[Long] = cents.toArray
  @transient private lazy val cidArr: Array[Long] = cids.toArray
  @transient private lazy val norms: Array[Long] = {
    val n = cidArr.length
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      var s = 0L
      var p = 0
      while (p < dim) { val v = centArr(i * dim + p); s += v * v; p += 1 }
      out(i) = s
      i += 1
    }
    out
  }

  /** Per-row kernel, also called from generated code via reference obj.
    * Loud on length mismatch (same seam as [[PqEncode.kernel]]): a
    * short vector would read unchecked garbage via getLong.
    */
  def kernel(a: ArrayData): ArrayData = {
    if (a.numElements() != dim) {
      throw new IllegalArgumentException(
        s"centroid_top_k: vector length ${a.numElements()} != dim = $dim")
    }
    val n = cidArr.length
    val k = math.min(top, n)
    val bestNd = new Array[Long](k)
    val bestCid = new Array[Long](k)
    var size = 0
    var i = 0
    while (i < n) {
      var dot = 0L
      var p = 0
      val base = i * dim
      while (p < dim) { dot += a.getLong(p) * centArr(base + p); p += 1 }
      val nd = 2L * dot - norms(i)
      val cid = cidArr(i)
      // insertion position under (nd DESC, cid ASC)
      var pos = size
      while (pos > 0 &&
        (bestNd(pos - 1) < nd || (bestNd(pos - 1) == nd && bestCid(pos - 1) > cid))) {
        pos -= 1
      }
      if (pos < k) {
        val last = math.min(size, k - 1)
        var q = last
        while (q > pos) { bestNd(q) = bestNd(q - 1); bestCid(q) = bestCid(q - 1); q -= 1 }
        bestNd(pos) = nd
        bestCid(pos) = cid
        if (size < k) size += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(bestCid, size))
  }

  override def nullSafeEval(a: Any): Any = kernel(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centAssign", this, classOf[CentroidTopK].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.kernel($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidTopK =
    copy(child = newChild)
}

/** Generator form of [[CentroidTopK]]: one output row per assigned
  * cell, `(cells, cid)` — the full best-first cell array rides along
  * each row so IVF scans can apply the row-local min-shared-cell
  * spill dedup without a second projection. Exists as a GENERATOR
  * (not explode-of-expression) for a load-bearing reason:
  * `InferFiltersFromGenerate` rewrites `explode(f(x))` into
  * `Filter(size(f(x)) > 0 AND isnotnull(f(x)))` + generate after
  * project collapse — three full kernel evaluations per corpus row
  * (measured 3× the scan wall at 1M vectors). The rule matches only
  * `ExplodeBase`/`Inline`, so a custom generator evaluates the kernel
  * exactly ONCE per row. Interpreted generate (CodegenFallback-style)
  * is fine here: the kernel call dominates the virtual dispatch.
  */
case class CentroidCellsExplode(
    child: Expression,
    cents: IndexedSeq[Long],
    cids: IndexedSeq[Long],
    dim: Int,
    top: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  override def elementSchema: StructType = new StructType()
    .add("cells", ArrayType(LongType, containsNull = false), nullable = false)
    .add("cid", LongType, nullable = false)
  // shape-only plan text (see PqEncode.toString)
  override def toString: String =
    s"centroid_cells_explode($child, cents[n=${cids.length},dim=$dim], top=$top)"

  @transient private lazy val solver = CentroidTopK(child, cents, cids, dim, top)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val a = child.eval(input)
    if (a == null) Nil
    else {
      val cells = solver.kernel(a.asInstanceOf[ArrayData])
      val n = cells.numElements()
      val out = new Array[InternalRow](n)
      var i = 0
      while (i < n) { out(i) = InternalRow(cells, cells.getLong(i)); i += 1 }
      out
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): CentroidCellsExplode = copy(child = newChild)
}

/** posexplode for array<long> as a CUSTOM generator — exists for the
  * same load-bearing reason as [[CentroidCellsExplode]]:
  * `InferFiltersFromGenerate` turns `posexplode(f(x))` into
  * size/isnotnull guards that re-evaluate `f` twice more per row when
  * `f` is an expensive kernel (pq_encode, float_vector_quantize). The
  * rule matches only ExplodeBase/Inline, so this generator evaluates
  * its child exactly once per row. Output: (pos int, val long).
  */
case class LongArrayPosExplode(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {
  override def elementSchema: StructType = new StructType()
    .add("pos", org.apache.spark.sql.types.IntegerType, nullable = false)
    .add("val", LongType, nullable = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val a = child.eval(input)
    if (a == null) Nil
    else {
      val arr = a.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = new Array[InternalRow](n)
      var i = 0
      while (i < n) { out(i) = InternalRow(i, arr.getLong(i)); i += 1 }
      out
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): LongArrayPosExplode = copy(child = newChild)
}

/** All i<j pairs of a SORTED long-id posting list, emitted LAZILY as
  * (id_a, id_b) rows — the postings-join pair generator
  * (ngramJaccardPairs / containmentPairs / winnowingOverlapPairs).
  *
  * The HOF formulation it replaces — explode(flatten(transform(ids,
  * (x,i) -> transform(slice(ids, i+2, ...), y -> struct(x, y))))) —
  * was the q279/q28 hot-task class twice over: (1)
  * InferFiltersFromGenerate guards an ExplodeBase with size(f)>0 AND
  * isnotnull(f), so the interpreted HOF builds the FULL f² struct
  * array up to 3× per posting row (the r10 rule: only a custom
  * Generator escapes the rewrite); (2) even once, a stop-shingle's
  * f² array materializes whole before exploding. This iterator emits
  * pairs one at a time with no intermediate array — a 10k-id posting
  * streams its 50M pairs instead of allocating them.
  */
case class SortedPairsExplode(child: Expression)
    extends UnaryExpression with Generator with ExpectsInputTypes
    with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def elementSchema: StructType = new StructType()
    .add("id_a", LongType, nullable = false)
    .add("id_b", LongType, nullable = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val a = child.eval(input)
    if (a == null) Nil
    else {
      val arr = a.asInstanceOf[ArrayData]
      val n = arr.numElements()
      new Iterator[InternalRow] {
        private var i = 0
        private var j = 1
        def hasNext: Boolean = i < n - 1 && j < n
        def next(): InternalRow = {
          val r = InternalRow(arr.getLong(i), arr.getLong(j))
          j += 1
          if (j >= n) { i += 1; j = i + 1 }
          r
        }
      }
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): SortedPairsExplode = copy(child = newChild)
}

/** First table index where an LSH corpus bucket collides with one of
  * the query's probed buckets: `min { t : cBuckets[t] ∈
  * qVariants[t·perTable .. (t+1)·perTable) }`, −1 when none — the
  * row-local cross-table dedup predicate of the banded/multi-probe
  * LSH scan (a pair collides at most once per table, so keeping only
  * the minimum colliding table keeps exactly one instance). Primitive
  * nested loop over ≤ tables·perTable elements; replaces a pair-grain
  * dropDuplicates exchange that carried every scored collision.
  */
case class LshMinSharedTable(left: Expression, right: Expression, perTable: Int)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "lsh_min_shared_table"

  /** Per-row kernel, also called from generated code via reference obj. */
  def kernel(cB: ArrayData, qV: ArrayData): Int = {
    val tMax = math.min(cB.numElements(), qV.numElements() / perTable)
    var t = 0
    while (t < tMax) {
      val bkt = cB.getLong(t)
      var p = 0
      while (p < perTable) {
        if (qV.getLong(t * perTable + p) == bkt) return t
        p += 1
      }
      t += 1
    }
    -1
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    kernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshDedup", this, classOf[LshMinSharedTable].getName)
    nullSafeCodeGen(ctx, ev, (x, y) => s"${ev.value} = $ref.kernel($x, $y);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LshMinSharedTable =
    copy(left = newLeft, right = newRight)
}

/** Minimum element present in BOTH tiny long arrays (spill-cell lists,
  * ≤ nAssign × nProbe elements) — the row-local spill-list dedup
  * predicate of the IVF scans. A primitive nested loop: the
  * `array_min(array_intersect(...))` composition allocates an
  * intersection set per row, which at scan rate (~72M rows at 1M
  * corpus) dominates the operator. Returns Long.MaxValue when
  * disjoint (never on scan rows — they share the joined cell by
  * construction, so the filter semantics are unchanged).
  */
case class MinSharedCell(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "min_shared_cell"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var best = Long.MaxValue
    var i = 0
    while (i < nx) {
      val v = x.getLong(i)
      if (v < best) {
        var j = 0
        while (j < ny) {
          if (y.getLong(j) == v) { best = v; j = ny }
          else j += 1
        }
      }
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      val best = ctx.freshName("best")
      s"""
         |long $best = Long.MAX_VALUE;
         |for (int $i = 0; $i < $x.numElements(); $i++) {
         |  long $v = $x.getLong($i);
         |  if ($v < $best) {
         |    for (int $j = 0; $j < $y.numElements(); $j++) {
         |      if ($y.getLong($j) == $v) { $best = $v; break; }
         |    }
         |  }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinSharedCell =
    copy(left = newLeft, right = newRight)
}

/** One-pass perceptual hash: stride-1 `gram`-char md5 windows bucketed
  * into a 64-bin histogram (top 60 md5 bits — the first-15-hex-chars
  * convention — mod 64), an exact-integer 8×8 DCT against the caller's
  * 2^14-quantized basis, and the 64 coefficient SIGN BITS packed into
  * one long. Bit-identical to the composed form the DuckDB twin runs
  * (`explode(positions) → md5(substring) → conv → pmod → count`, two
  * basis matrix-multiply joins, CASE sign packing) — but as ONE
  * expression per DOCUMENT at scan rate. The composed DataFrame form
  * shuffled doc×64-grain frames through two agg exchanges (≈4 GB at
  * 500k docs); the kernel's hashing is zero-exchange. Windows are
  * CODE-POINT-wise over the row's UTF-8 bytes, matching SQL
  * substring/length semantics (Spark and DuckDB both count code
  * points) on BMP and supplementary-plane input alike; each window
  * hashes its UTF-8 bytes exactly as both engines'
  * md5(substring(...)) does.
  *
  * `basis` is the flat 8×8 DCT matrix `C[u*8+i]` — an OPERATOR
  * constant (same literals the oracle embeds as VALUES), so plan text
  * may print it without breaking cross-SF fingerprint linkage; the
  * shape-only toString keeps plan lines short regardless.
  */
case class PHash64(child: Expression, gram: Int, basis: IndexedSeq[Long])
    extends UnaryExpression with ExpectsInputTypes {
  require(gram >= 1 && basis.length == 64)
  override def inputTypes: Seq[AbstractDataType] = Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "phash64"
  override def toString: String = s"phash64($child, gram=$gram, dct[8x8])"

  @transient private lazy val basisArr: Array[Long] = basis.toArray

  @transient private lazy val localMd =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Per-row kernel, shared by interpreted eval and codegen.
    *
    * Windows are CODE-POINT-wise (ADVICE r14): SQL `substring`/`length`
    * — both Spark's (UTF8String.numChars) and DuckDB's — count Unicode
    * code points, while java String.substring counts UTF-16 units, so a
    * char-wise loop diverges from the oracle on any supplementary-plane
    * input. Code-point boundaries in UTF-8 are the non-continuation
    * bytes (& 0xC0 != 0x80), so the kernel slides directly over the
    * row's UTF-8 bytes — each window's md5 input is exactly the bytes
    * both engines' md5(substring(...)) hashes, with no per-window
    * String allocation.
    */
  def kernel(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val hist = new Array[Long](64)
    val bytes = s.getBytes
    // starts(j) = byte offset of the j-th code point; starts(m) = end
    val starts = new Array[Int](bytes.length + 1)
    var i = 0
    var m = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(m) = i; m += 1 }
      i += 1
    }
    starts(m) = bytes.length
    val n = m - gram + 1
    val md = localMd.get()
    var p = 0
    while (p < n) {
      md.reset()
      md.update(bytes, starts(p), starts(p + gram) - starts(p))
      val d = md.digest()
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      // top 60 bits == first 15 hex chars base-16 (the conv() twin)
      hist(((v >>> 4) % 64).toInt) += 1L
      p += 1
    }
    // t1[u][j] = Σ_i C[u][i] · hist[i*8 + j]  (exact int64, as the twin)
    val t1 = new Array[Long](64)
    var u = 0
    while (u < 8) {
      var j = 0
      while (j < 8) {
        var acc = 0L
        var i = 0
        while (i < 8) { acc += basisArr(u * 8 + i) * hist(i * 8 + j); i += 1 }
        t1(u * 8 + j) = acc
        j += 1
      }
      u += 1
    }
    // d[u][v] = Σ_j t1[u][j] · C[v][j]; bit u*8+v = (d > 0)
    var out = 0L
    u = 0
    while (u < 8) {
      var v2 = 0
      while (v2 < 8) {
        var acc = 0L
        var j = 0
        while (j < 8) { acc += t1(u * 8 + j) * basisArr(v2 * 8 + j); j += 1 }
        if (acc > 0L) out |= (1L << (u * 8 + v2))
        v2 += 1
      }
      u += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("phash64", this, this.getClass.getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PHash64 =
    copy(child = newChild)
}

/** Top 60 bits of md5(input) as a BIGINT — bit-identical to the
  * engine-wide SQL convention `conv(substring(md5(x), 1, 15), 16, 10)`
  * (DuckDB: `('0x' || substring(md5(x), 1, 15))::BIGINT`), but without
  * the hex-STRING round trip: the composed chain materializes a
  * 32-char hex string, slices it, and parses it back per row — ~90% of
  * the level-sample sketch's scan cost at 10M rows (7.7 of 8.2 s
  * measured). The kernel reads the first 8 digest bytes and shifts.
  * Use where the 60-bit prefix is consumed at scan rate; the SQL
  * twin stays the conv() form.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(org.apache.spark.sql.types.StringType,
      org.apache.spark.sql.types.BinaryType))
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"

  @transient private lazy val localMd =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Per-row kernel (string input), shared by eval and codegen. */
  def kernel(s: org.apache.spark.unsafe.types.UTF8String): Long =
    kernelBytes(s.getBytes)

  /** Per-row kernel (binary input) — md5 of the raw payload bytes,
    * exactly what both engines' md5(binary) hashes.
    */
  def kernelBytes(bytes: Array[Byte]): Long = {
    val md = localMd.get()
    md.reset()
    md.update(bytes)
    val d = md.digest()
    var v = 0L
    var b = 0
    while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
    v >>> 4 // top 60 bits == first 15 hex chars base-16
  }

  @transient private lazy val isBinary =
    child.dataType == org.apache.spark.sql.types.BinaryType

  override protected def nullSafeEval(input: Any): Any =
    if (isBinary) kernelBytes(input.asInstanceOf[Array[Byte]])
    else kernel(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5p60", this, this.getClass.getName)
    val m = if (isBinary) "kernelBytes" else "kernel"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.$m($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

/** A driver-computed constant whose VALUE is data (a corpus count, a
  * pair-space size), not plan shape: prints shape-only (`driver_lit`)
  * so cross-SF/cross-config plan fingerprints stay stable — the same
  * environment-out rule as path/partition-count normalization and the
  * codebook shape-printing above, applied at the expression seam
  * because a raw `Literal` prints its value. Runtime is the wrapped
  * literal verbatim (codegen delegates, so the constant still inlines
  * into the generated code); `foldable=false` only keeps
  * ConstantFolding from splicing the raw value back into surrounding
  * expression TEXT — the per-row cost is the literal's.
  */
case class DriverLit(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def foldable: Boolean = false
  override def prettyName: String = "driver_lit"
  override def toString: String = s"driver_lit(${child.dataType.simpleString})"
  override def sql: String = toString
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): DriverLit =
    copy(child = newChild)
}

object VectorExpressions {
  /** [[DriverLit]] over a long constant computed on the driver. */
  def driverLit(v: Long): Column =
    ExpressionUtils.column(
      DriverLit(org.apache.spark.sql.catalyst.expressions.Literal(v)))

  def longVectorDot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      LongVectorDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Σ x_i² without reading the array twice. */
  def longVectorNorm2(a: Column): Column = longVectorDot(a, a)

  def pqAdcScore(codes: Column, lut: Column, ksub: Int): Column =
    ExpressionUtils.column(
      PqAdcScore(ExpressionUtils.expression(codes), ExpressionUtils.expression(lut), ksub))

  def floatVectorQuantize(a: Column): Column =
    ExpressionUtils.column(FloatVectorQuantize(ExpressionUtils.expression(a)))

  def longVectorAbsMax(a: Column): Column =
    ExpressionUtils.column(LongVectorAbsMax(ExpressionUtils.expression(a)))

  def pqEncode(
      emb: Column,
      cb: IndexedSeq[Long],
      present: IndexedSeq[Boolean],
      m: Int,
      dsub: Int,
      ksub: Int): Column =
    ExpressionUtils.column(
      PqEncode(ExpressionUtils.expression(emb), cb, present, m, dsub, ksub))

  def centroidTopK(
      emb: Column,
      cents: IndexedSeq[Long],
      cids: IndexedSeq[Long],
      dim: Int,
      top: Int): Column =
    ExpressionUtils.column(
      CentroidTopK(ExpressionUtils.expression(emb), cents, cids, dim, top))

  def minSharedCell(a: Column, b: Column): Column =
    ExpressionUtils.column(
      MinSharedCell(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def centroidCellsExplode(
      emb: Column,
      cents: IndexedSeq[Long],
      cids: IndexedSeq[Long],
      dim: Int,
      top: Int): Column =
    ExpressionUtils.column(
      CentroidCellsExplode(ExpressionUtils.expression(emb), cents, cids, dim, top))

  def longArrayPosExplode(a: Column): Column =
    ExpressionUtils.column(LongArrayPosExplode(ExpressionUtils.expression(a)))

  def sortedPairsExplode(a: Column): Column =
    ExpressionUtils.column(SortedPairsExplode(ExpressionUtils.expression(a)))

  def phash64(text: Column, gram: Int, basis: IndexedSeq[Long]): Column =
    ExpressionUtils.column(
      PHash64(ExpressionUtils.expression(text), gram, basis))

  def md5Prefix60(s: Column): Column =
    ExpressionUtils.column(Md5Prefix60(ExpressionUtils.expression(s)))

  def lshMinSharedTable(cBuckets: Column, qVariants: Column, perTable: Int): Column =
    ExpressionUtils.column(LshMinSharedTable(
      ExpressionUtils.expression(cBuckets),
      ExpressionUtils.expression(qVariants), perTable))
}
