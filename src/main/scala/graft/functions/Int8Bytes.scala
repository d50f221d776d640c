package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType}

/** [[Int8Codes]]'s PACKED twin (`int8_bytes(array<double>) -> binary`):
  * the identical symmetric int8 quantization, emitted as one byte per
  * element instead of `array<int>`'s four (plus parquet's per-element
  * array overhead). Codes are in [-127, 127] by construction, so the
  * byte narrowing is lossless; element-wise equality with
  * [[Int8Codes]] is spec-pinned. This is the quantized tier's whole
  * point realized at the storage layer: a code STORE (the IVF index,
  * the embedding ingest exemplars) shrinks ~4× on disk and the scan
  * reads ~4× fewer bytes at 100 TB.
  */
case class Int8Bytes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "int8_bytes"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var mx = 0.0; var nan = false
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val av = math.abs(a.getDouble(i))
        if (java.lang.Double.isNaN(av)) nan = true
        else if (av > mx) mx = av
      }
      i += 1
    }
    val out = new Array[Byte](n)
    if (!nan && mx > 0) {
      val scale = mx / 127.0
      i = 0
      while (i < n) {
        if (!a.isNullAt(i))
          out(i) = math.floor(a.getDouble(i) / scale + 0.5).toByte
        i += 1
      }
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val mx = ctx.freshName("mx"); val nan = ctx.freshName("nan")
      val av = ctx.freshName("av"); val out = ctx.freshName("out")
      val scale = ctx.freshName("scale")
      s"""
         |int $n = $a.numElements();
         |double $mx = 0.0; boolean $nan = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $av = java.lang.Math.abs($a.getDouble($i));
         |    if (java.lang.Double.isNaN($av)) $nan = true;
         |    else if ($av > $mx) $mx = $av;
         |  }
         |}
         |byte[] $out = new byte[$n];
         |if (!$nan && $mx > 0) {
         |  double $scale = $mx / 127.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i))
         |      $out[$i] = (byte) (int) java.lang.Math.floor(
         |        $a.getDouble($i) / $scale + 0.5);
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Int8Bytes {
  def builder(exprs: Seq[Expression]): Expression = {
    FnArgs.arity("int8_bytes", exprs, Seq(1))
    Int8Bytes(Cast(exprs(0), ArrayType(DoubleType)))
  }

  def int8_bytes(a: Column): Column = call_function("int8_bytes", a)
}

/** [[IntDot]] over PACKED codes (`int_dot_bytes(binary, binary) ->
  * BIGINT`): the exact integer dot product of two byte-code vectors —
  * sign-extended multiply, widened to long before accumulation, so it
  * equals `int_dot` over the `array<int>` form bit-for-bit
  * (spec-pinned). Mismatched lengths yield NULL, mirroring
  * [[IntDot]]'s contract. Self-application is the exact squared norm.
  */
case class IntDotBytes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "int_dot_bytes"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length) null
    else {
      var dot = 0L
      var i = 0
      while (i < x.length) {
        dot += x(i).toLong * y(i)
        i += 1
      }
      dot
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.length;
         |if ($n != $b.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += (long) $a[$i] * $b[$i];
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object IntDotBytes {
  def builder(exprs: Seq[Expression]): Expression = {
    FnArgs.arity("int_dot_bytes", exprs, Seq(2))
    IntDotBytes(Cast(exprs(0), BinaryType), Cast(exprs(1), BinaryType))
  }

  def int_dot_bytes(a: Column, b: Column): Column =
    call_function("int_dot_bytes", a, b)
}

/** [[Int8Bytes]]'s inverse (`int8_unpack(binary) -> array<int>`):
  * sign-extends each packed byte code back to the `array<int>` form —
  * `int8_unpack(int8_bytes(e)) ≡ int8_codes(e)` element-wise
  * (spec-pinned), since the byte narrowing was lossless in [-127, 127].
  * This is what lets a consumer that needs the int form (a re-seed of
  * the persisted IVF index, whose store carries ONLY packed codes)
  * recover it from store bytes without re-reading the float embeddings.
  */
case class Int8Unpack(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "int8_unpack"

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val out = new Array[Int](b.length)
    var i = 0
    while (i < b.length) { out(i) = b(i).toInt; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $b.length;
         |int[] $out = new int[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (int) $b[$i];
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Int8Unpack {
  def builder(exprs: Seq[Expression]): Expression = {
    FnArgs.arity("int8_unpack", exprs, Seq(1))
    Int8Unpack(Cast(exprs(0), BinaryType))
  }

  def int8_unpack(a: Column): Column = call_function("int8_unpack", a)
}

/** UNSIGNED byte decode (`uint8_unpack(binary) -> array<int>`, each
  * byte as `b & 0xff` in [0, 255]) — the decode for byte payloads that
  * are ENTRY IDS rather than int8 codes: a PQ code byte addresses up
  * to 256 codebook entries, so ids >= 128 rendered through the
  * sign-extending [[Int8Unpack]] would print as negatives (the
  * rendering bug that capped the PQ codebook at 127 entries before
  * round 16). `uint8_unpack(bytes)[i] ≡ int8_unpack(bytes)[i] & 0xff`
  * element-wise (spec-pinned).
  */
case class Uint8Unpack(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "uint8_unpack"

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val out = new Array[Int](b.length)
    var i = 0
    while (i < b.length) { out(i) = b(i) & 0xff; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $b.length;
         |int[] $out = new int[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $b[$i] & 0xff;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Uint8Unpack {
  def builder(exprs: Seq[Expression]): Expression = {
    FnArgs.arity("uint8_unpack", exprs, Seq(1))
    Uint8Unpack(Cast(exprs(0), BinaryType))
  }

  def uint8_unpack(a: Column): Column = call_function("uint8_unpack", a)
}
