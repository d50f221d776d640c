package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Product-quantization encoding over int8 codes
  * (`pq_encode(qv, codebook, nsub)` →
  * `struct<codes binary, dist bigint, rsq bigint>`) — the PQ tier of
  * the ANN family's storage ladder (float 4 bytes/elem → int8 1
  * byte/elem → THIS: `dim/nsub` bytes per VECTOR, e.g. 8 bytes for a
  * 64-dim vector at nsub=8 — another 8× shrink on the scanned store).
  *
  * The codebook is SEED-DRAWN, not trained: entry `c` of subspace `j`
  * is the `j`-th slice of the `c`-th md5-ranked non-degenerate
  * vector's int8 codes (the seed-IVF centroid draw applied per
  * subspace), so the whole structure — codes, distortion, ADC
  * rankings — is exact integer arithmetic and sits under the DuckDB
  * hash oracle, unlike trained-kmeans PQ whose float iteration is
  * rows-only-checkable.
  *
  * Per subspace `j ∈ [0, nsub)` the code byte is the argmin over the
  * `K = matrix.length / dim` codebook entries of the exact integer
  * squared L2 distance `Σ_i (qv[j·sub+i] − cb(c)[j·sub+i])²`, ties to
  * the LOWEST entry id. `dist` is the summed minimal distortion (the
  * build-quality audit number); `rsq` is the squared norm of the
  * implied reconstruction — the denominator an ADC cosine needs,
  * computed here once so the probe never re-touches the codebook for
  * the corpus side.
  *
  * The codebook is a flat `K × dim` int matrix reference object
  * ([[CentroidScores]]'s packing: entry-major, `cb(c)[i] =
  * matrix[c·dim + i]`); `nsub` is an integer literal. A dimension
  * mismatch (`matrix.length % dim != 0` or `dim % nsub != 0`) yields
  * NULL, as does a codebook wider than 255 entries (a code BYTE
  * addresses at most 256 — wrapping would corrupt silently).
  */
case class PqEncode(child: Expression, matrix: IndexedSeq[Int], nSub: Int)
    extends UnaryExpression {

  require(nSub > 0, "pq_encode: nsub must be positive")
  require(matrix.nonEmpty, "pq_encode needs a non-empty codebook")

  private val structType = StructType(Seq(
    StructField("codes", BinaryType, nullable = false),
    StructField("dist", LongType, nullable = false),
    StructField("rsq", LongType, nullable = false)))

  override def dataType: DataType = structType
  override def prettyName: String = "pq_encode"
  override def nullable: Boolean = true

  @transient private lazy val matrixArr: Array[Int] = matrix.toArray

  override def nullSafeEval(input: Any): Any = {
    val qv = input.asInstanceOf[ArrayData]
    val dim = qv.numElements()
    // the > 255 guard: a code BYTE addresses at most 256 entries — a
    // larger codebook would wrap silently, so it is rejected as NULL
    if (dim == 0 || dim % nSub != 0 || matrixArr.length % dim != 0 ||
        matrixArr.length / dim > 255) null
    else {
      val sub = dim / nSub
      val k = matrixArr.length / dim
      val codes = new Array[Byte](nSub)
      var dist = 0L; var rsq = 0L
      var j = 0
      while (j < nSub) {
        val off = j * sub
        var bestC = 0; var bestD = Long.MaxValue
        var c = 0
        while (c < k) {
          val base = c * dim + off
          var d = 0L; var i = 0
          while (i < sub) {
            val diff = qv.getInt(off + i).toLong - matrixArr(base + i)
            d += diff * diff
            i += 1
          }
          if (d < bestD) { bestD = d; bestC = c }
          c += 1
        }
        codes(j) = bestC.toByte
        dist += bestD
        val base = bestC * dim + off
        var i = 0
        while (i < sub) {
          val v = matrixArr(base + i).toLong
          rsq += v * v
          i += 1
        }
        j += 1
      }
      val row = new GenericInternalRow(3)
      row.update(0, codes); row.update(1, dist); row.update(2, rsq)
      row
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("pqCodebook", matrixArr, "int[]")
    nullSafeCodeGen(ctx, ev, qv => {
      val dim = ctx.freshName("dim"); val sub = ctx.freshName("sub")
      val k = ctx.freshName("k"); val codes = ctx.freshName("codes")
      val dist = ctx.freshName("dist"); val rsq = ctx.freshName("rsq")
      val j = ctx.freshName("j"); val off = ctx.freshName("off")
      val bestC = ctx.freshName("bestC"); val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c"); val base = ctx.freshName("base")
      val d = ctx.freshName("d"); val i = ctx.freshName("i")
      val diff = ctx.freshName("diff"); val v = ctx.freshName("v")
      val row = ctx.freshName("row")
      s"""
         |int $dim = $qv.numElements();
         |// NEVER start a generated line with '|': Spark's enclosing
         |// codegen templates apply .stripMargin to the ASSEMBLED source
         |// (CodegenSupport et al.), so a leading "||" loses one pipe per
         |// enclosing template and Janino fails -> silent interpreted
         |// fallback for every plan containing this expression (r14's
         |// bench-tail ERROR). Operators go at the END of the line.
         |if ($dim == 0 || $dim % ${nSub} != 0 || $mRef.length % $dim != 0 ||
         |    $mRef.length / $dim > 255) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $sub = $dim / ${nSub};
         |  int $k = $mRef.length / $dim;
         |  byte[] $codes = new byte[${nSub}];
         |  long $dist = 0L; long $rsq = 0L;
         |  for (int $j = 0; $j < ${nSub}; $j++) {
         |    int $off = $j * $sub;
         |    int $bestC = 0; long $bestD = Long.MAX_VALUE;
         |    for (int $c = 0; $c < $k; $c++) {
         |      int $base = $c * $dim + $off;
         |      long $d = 0L;
         |      for (int $i = 0; $i < $sub; $i++) {
         |        long $diff = (long) $qv.getInt($off + $i) - $mRef[$base + $i];
         |        $d += $diff * $diff;
         |      }
         |      if ($d < $bestD) { $bestD = $d; $bestC = $c; }
         |    }
         |    $codes[$j] = (byte) $bestC;
         |    $dist += $bestD;
         |    int $base = $bestC * $dim + $off;
         |    for (int $i = 0; $i < $sub; $i++) {
         |      long $v = (long) $mRef[$base + $i];
         |      $rsq += $v * $v;
         |    }
         |  }
         |  org.apache.spark.sql.catalyst.expressions.GenericInternalRow $row =
         |    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3);
         |  $row.update(0, $codes);
         |  $row.update(1, Long.valueOf($dist));
         |  $row.update(2, Long.valueOf($rsq));
         |  ${ev.value} = $row;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The per-query ADC lookup table (`pq_lut(qv, codebook, nsub)` →
  * `array<bigint>` of `nsub × K` entries): `lut[j·K + c] = Σ_i
  * qv[j·sub+i] · cb(c)[j·sub+i]` — the exact integer dot of the
  * query's `j`-th slice with codebook entry `c`. Computed ONCE per
  * query row (the bounded side of an ADC scan); the corpus-side scan
  * is then `nsub` table lookups per pair ([[PqAdc]]) instead of `dim`
  * multiply-adds — PQ's asymmetric-distance trick, which with nsub=8
  * at dim=64 cuts both scan bandwidth (8 code bytes/vector) and
  * per-pair arithmetic 8×.
  */
case class PqLut(child: Expression, matrix: IndexedSeq[Int], nSub: Int)
    extends UnaryExpression {

  require(nSub > 0, "pq_lut: nsub must be positive")
  require(matrix.nonEmpty, "pq_lut needs a non-empty codebook")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_lut"
  override def nullable: Boolean = true

  @transient private lazy val matrixArr: Array[Int] = matrix.toArray

  override def nullSafeEval(input: Any): Any = {
    val qv = input.asInstanceOf[ArrayData]
    val dim = qv.numElements()
    if (dim == 0 || dim % nSub != 0 || matrixArr.length % dim != 0) null
    else {
      val sub = dim / nSub
      val k = matrixArr.length / dim
      val lut = new Array[Long](nSub * k)
      var j = 0
      while (j < nSub) {
        val off = j * sub
        var c = 0
        while (c < k) {
          val base = c * dim + off
          var dot = 0L; var i = 0
          while (i < sub) {
            dot += qv.getInt(off + i).toLong * matrixArr(base + i)
            i += 1
          }
          lut(j * k + c) = dot
          c += 1
        }
        j += 1
      }
      new GenericArrayData(lut)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("pqCodebook", matrixArr, "int[]")
    nullSafeCodeGen(ctx, ev, qv => {
      val dim = ctx.freshName("dim"); val sub = ctx.freshName("sub")
      val k = ctx.freshName("k"); val lut = ctx.freshName("lut")
      val j = ctx.freshName("j"); val off = ctx.freshName("off")
      val c = ctx.freshName("c"); val base = ctx.freshName("base")
      val dot = ctx.freshName("dot"); val i = ctx.freshName("i")
      s"""
         |int $dim = $qv.numElements();
         |if ($dim == 0 || $dim % ${nSub} != 0 || $mRef.length % $dim != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $sub = $dim / ${nSub};
         |  int $k = $mRef.length / $dim;
         |  long[] $lut = new long[${nSub} * $k];
         |  for (int $j = 0; $j < ${nSub}; $j++) {
         |    int $off = $j * $sub;
         |    for (int $c = 0; $c < $k; $c++) {
         |      int $base = $c * $dim + $off;
         |      long $dot = 0L;
         |      for (int $i = 0; $i < $sub; $i++) {
         |        $dot += (long) $qv.getInt($off + $i) * $mRef[$base + $i];
         |      }
         |      $lut[$j * $k + $c] = $dot;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($lut);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The ADC dot (`pq_adc(lut, codes)` → BIGINT): `Σ_j lut[j·K +
  * codes[j]]` with `K = lut.length / codes.length` — exactly
  * `int_dot(query_qv, reconstruction(codes))` (spec-pinned), read off
  * the per-query table in `nsub` adds per pair. NULL when the table
  * length is not a multiple of the code length (mismatched codebooks),
  * mirroring [[IntDot]]'s contract.
  */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[Array[Byte]]
    val m = codes.length
    if (m == 0 || lut.numElements() % m != 0) null
    else {
      val k = lut.numElements() / m
      var adc = 0L; var j = 0
      while (j < m) {
        val c = codes(j) & 0xff
        // a code byte past the table's per-subspace width means the
        // codes came from a DIFFERENT (larger) codebook than the lut —
        // NULL, never an index crash on malformed pairings
        if (c >= k) return null
        adc += lut.getLong(j * k + c)
        j += 1
      }
      adc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, codes) => {
      val m = ctx.freshName("m"); val k = ctx.freshName("k")
      val adc = ctx.freshName("adc"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val bad = ctx.freshName("bad")
      s"""
         |int $m = $codes.length;
         |if ($m == 0 || $lut.numElements() % $m != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $k = $lut.numElements() / $m;
         |  long $adc = 0L;
         |  boolean $bad = false;
         |  for (int $j = 0; $j < $m; $j++) {
         |    int $c = $codes[$j] & 0xff;
         |    if ($c >= $k) { $bad = true; break; }
         |    $adc += $lut.getLong($j * $k + $c);
         |  }
         |  if ($bad) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $adc;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** The implied reconstruction (`pq_recon(codes, codebook, k)` →
  * `array<int>`, `k` = entries per subspace so `dim =
  * codebook.length / k`): concatenates the chosen codebook slices back
  * into a dim-length int vector — the spec/audit bridge that lets
  * `pq_adc ≡ int_dot(q, pq_recon(codes))` and `rsq ≡
  * int_dot(pq_recon, pq_recon)` be pinned without duplicating PQ
  * arithmetic, and what a consumer needing approximate vectors back
  * (re-ranking, drift audits) reads from an 8-byte code row. NULL on
  * layout mismatch (dim not divisible by the code count, or a code
  * byte ≥ k).
  */
case class PqRecon(child: Expression, matrix: IndexedSeq[Int], k: Int)
    extends UnaryExpression {

  require(k > 0, "pq_recon: k must be positive")
  require(matrix.nonEmpty && matrix.length % k == 0,
    "pq_recon: codebook length must be k * dim")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_recon"
  override def nullable: Boolean = true

  @transient private lazy val matrixArr: Array[Int] = matrix.toArray
  private def dim: Int = matrix.length / k

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[Array[Byte]]
    val m = codes.length
    if (m == 0 || dim % m != 0) null
    else {
      val sub = dim / m
      val out = new Array[Int](dim)
      var j = 0
      while (j < m) {
        val c = codes(j) & 0xff
        if (c >= k) return null
        val base = c * dim + j * sub
        var i = 0
        while (i < sub) { out(j * sub + i) = matrixArr(base + i); i += 1 }
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("pqCodebook", matrixArr, "int[]")
    nullSafeCodeGen(ctx, ev, codes => {
      val m = ctx.freshName("m"); val sub = ctx.freshName("sub")
      val out = ctx.freshName("out"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val base = ctx.freshName("base")
      val i = ctx.freshName("i"); val bad = ctx.freshName("bad")
      s"""
         |int $m = $codes.length;
         |if ($m == 0 || ${dim} % $m != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $sub = ${dim} / $m;
         |  int[] $out = new int[${dim}];
         |  boolean $bad = false;
         |  for (int $j = 0; $j < $m && !$bad; $j++) {
         |    int $c = $codes[$j] & 0xff;
         |    if ($c >= ${k}) { $bad = true; break; }
         |    int $base = $c * ${dim} + $j * $sub;
         |    for (int $i = 0; $i < $sub; $i++) {
         |      $out[$j * $sub + $i] = (int) $mRef[$base + $i];
         |    }
         |  }
         |  if ($bad) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} =
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Elementwise integer vector arithmetic (`int_vec_add` /
  * `int_vec_sub`: `(array<int>, array<int>) → array<int>`) — the
  * residual algebra of the IVFADC family: `r = qv − cv(assigned)` and
  * `w = cv + r̂` stay exact 32-bit integers (int8 inputs bound every
  * sum/difference far below overflow), keeping the residual-quantized
  * index inside the hash-oracle regime. NULL on length mismatch,
  * mirroring [[IntDot]].
  */
case class IntVecOp(left: Expression, right: Expression, sub: Boolean)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = if (sub) "int_vec_sub" else "int_vec_add"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      val out = new Array[Int](n)
      var i = 0
      if (sub) while (i < n) { out(i) = x.getInt(i) - y.getInt(i); i += 1 }
      else while (i < n) { out(i) = x.getInt(i) + y.getInt(i); i += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val op = if (sub) "-" else "+"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $out = new int[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = $a.getInt($i) $op $b.getInt($i);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object PqCodes {
  private val arrInt = ArrayType(IntegerType)

  private def codebookLit(fn: String, exprs: Seq[Expression],
                          idx: Int): Array[Int] = {
    val e = exprs(idx)
    val cast = Cast(e, ArrayType(IntegerType, containsNull = false))
    val v = if (e.resolved && e.foldable) cast.eval() else null
    if (v == null)
      throw new org.apache.spark.sql.AnalysisException(
        "NON_FOLDABLE_ARGUMENT", Map(
          "funcName" -> s"`$fn`", "paramName" -> "`codebook`",
          "paramType" -> "\"ARRAY<INT>\""))
    v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray()
  }

  def encodeBuilder(exprs: Seq[Expression]): Expression = {
    FnArgs.arity("pq_encode", exprs, Seq(3))
    PqEncode(Cast(exprs(0), arrInt),
      codebookLit("pq_encode", exprs, 1).toIndexedSeq,
      FnArgs.intLit("pq_encode", exprs, 2, "nsub"))
  }

  def lutBuilder(exprs: Seq[Expression]): Expression = {
    FnArgs.arity("pq_lut", exprs, Seq(3))
    PqLut(Cast(exprs(0), arrInt),
      codebookLit("pq_lut", exprs, 1).toIndexedSeq,
      FnArgs.intLit("pq_lut", exprs, 2, "nsub"))
  }

  def adcBuilder(exprs: Seq[Expression]): Expression = {
    FnArgs.arity("pq_adc", exprs, Seq(2))
    PqAdc(Cast(exprs(0), ArrayType(LongType)), Cast(exprs(1), BinaryType))
  }

  def reconBuilder(exprs: Seq[Expression]): Expression = {
    FnArgs.arity("pq_recon", exprs, Seq(3))
    PqRecon(Cast(exprs(0), BinaryType),
      codebookLit("pq_recon", exprs, 1).toIndexedSeq,
      FnArgs.intLit("pq_recon", exprs, 2, "k"))
  }

  def vecAddBuilder(exprs: Seq[Expression]): Expression = {
    FnArgs.arity("int_vec_add", exprs, Seq(2))
    IntVecOp(Cast(exprs(0), arrInt), Cast(exprs(1), arrInt), sub = false)
  }

  def vecSubBuilder(exprs: Seq[Expression]): Expression = {
    FnArgs.arity("int_vec_sub", exprs, Seq(2))
    IntVecOp(Cast(exprs(0), arrInt), Cast(exprs(1), arrInt), sub = true)
  }

  def pq_encode(qv: Column, codebook: Array[Int], nSub: Int): Column =
    call_function("pq_encode", qv,
      org.apache.spark.sql.functions.typedlit(codebook.toSeq), lit(nSub))

  def pq_lut(qv: Column, codebook: Array[Int], nSub: Int): Column =
    call_function("pq_lut", qv,
      org.apache.spark.sql.functions.typedlit(codebook.toSeq), lit(nSub))

  def pq_adc(lut: Column, codes: Column): Column =
    call_function("pq_adc", lut, codes)

  def pq_recon(codes: Column, codebook: Array[Int], k: Int): Column =
    call_function("pq_recon", codes,
      org.apache.spark.sql.functions.typedlit(codebook.toSeq), lit(k))

  def int_vec_add(a: Column, b: Column): Column =
    call_function("int_vec_add", a, b)

  def int_vec_sub(a: Column, b: Column): Column =
    call_function("int_vec_sub", a, b)
}
