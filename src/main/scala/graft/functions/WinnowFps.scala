package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a document's complete winnowing
  * fingerprint set (Schleimer, Wilkerson & Aiken, SIGMOD 2003) in one
  * row-local pass: char `k`-grams hashed with the engine-portable
  * md5-60bit family (identical arithmetic to
  * [[graft.ext.Dedup.md5HashLong]] at seed 0 — first 15 hex chars of
  * md5 over gram + U+0001 + "0" as a BIGINT), a monotonic-deque sliding
  * minimum over each window of `w` consecutive gram hashes, and the
  * distinct minima returned sorted ascending as `array<long>`.
  *
  * This is the (b)-tier custom operator of the preference order. The
  * composed form ([[graft.ext.Dedup.winnowFingerprintsComposed]])
  * explodes one row PER CHARACTER, shuffles them all into a
  * doc-partitioned window, recomputes each window minimum from scratch
  * (O(n·w)), and runs a distinct — three wide stages of per-char rows.
  * Winnowing is row-local (a document's fingerprints depend on nothing
  * but its own text), so the expression computes the identical set with
  * ZERO exchanges: the only post-scan work is exploding the ~2/(w+1)
  * surviving fingerprints. At 100 TB that turns the dominant shuffle
  * (every character of the corpus) into none at all.
  *
  * Exactness: the gram walk counts Unicode code points, matching both
  * Spark's and DuckDB's `substr` semantics, so expression ≡ composed
  * twin ≡ DuckDB oracle on any input (DedupSpec pins Spark-side
  * equality; `q_winnow_fingerprints`/`q_winnow_neardup` pin the
  * oracle). Documents with fewer than `k + w - 1` code points have no
  * full window and yield an empty array.
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k > 0 && w > 0, s"k ($k) and w ($w) must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(t: Any): Any =
    WinnowFps.fingerprints(t.asInstanceOf[UTF8String], k, w)

  // one static call — the expression stays inside whole-stage codegen
  // (no interpreter barrier), the heavy loop lives in compiled Scala
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFps.fingerprints($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFps {
  /** Distinct sliding-window minima of the md5-60bit gram hashes,
    * sorted ascending. Called from generated code — must stay a pure
    * static function of its arguments.
    */
  def fingerprints(t: UTF8String, k: Int, w: Int): ArrayData = {
    // code-point walk (NOT UTF-16 chars): Spark's substr counts code
    // points, and gram bytes must be the UTF-8 bytes of that slice
    val s = t.toString
    val cps = s.codePoints().toArray
    val nGrams = cps.length - (k - 1)
    val nWins = nGrams - (w - 1)
    if (nWins <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)

    val md = MessageDigest.getInstance("MD5")
    val h = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      val gram = new String(cps, i, k)
      val gb = gram.getBytes("UTF-8")
      // md5 over gram + U+0001 + "0": the exact concat_ws byte
      // stream of the composed twin's md5HashLong at seed 0
      md.reset()
      md.update(gb)
      md.update(1.toByte)
      md.update('0'.toByte)
      val d = md.digest()
      // first 15 hex chars == top 60 bits: 7 full bytes + high nibble
      var v = 0L
      var j = 0
      while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      h(i) = (v << 4) | ((d(7) & 0xf0L) >>> 4)
      i += 1
    }

    // monotonic-deque sliding minimum: O(n) total, vs the window
    // operator's per-row frame rescan O(n*w)
    val deque = new Array[Int](nGrams)
    var head = 0; var tail = 0 // [head, tail) holds candidate indices
    val mins = new Array[Long](nWins)
    i = 0
    while (i < nGrams) {
      while (tail > head && h(deque(tail - 1)) >= h(i)) tail -= 1
      deque(tail) = i; tail += 1
      val start = i - (w - 1)
      if (start >= 0) {
        if (deque(head) < start) head += 1
        mins(start) = h(deque(head))
      }
      i += 1
    }

    java.util.Arrays.sort(mins)
    var n = 0
    i = 0
    while (i < nWins) {
      if (i == 0 || mins(i) != mins(i - 1)) { mins(n) = mins(i); n += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(mins, n))
  }
}
