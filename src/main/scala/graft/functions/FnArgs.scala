package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, NumericType, ShortType}

/** Builder-time argument validation shared by graft's registered SQL
  * functions. A builder that blindly runs `exprs(1).eval()` turns SQL
  * like `winnow_fps(text)` (missing parameter) or
  * `winnow_fps(text, k_col, w)` (non-literal parameter) into an opaque
  * IndexOutOfBoundsException / ClassCastException — or worse, evals an
  * unresolved expression at plan time. These helpers fail analysis with
  * Spark's own error classes (`WRONG_NUM_ARGS`, `NON_FOLDABLE_ARGUMENT`)
  * instead, the message a user can actually act on.
  */
private[functions] object FnArgs {

  /** Idempotent-QUIET temp-function registration: operators register at
    * every use site, and an unconditional replace logs a "replaced a
    * previously registered function" warning per call after the first —
    * noise that buries real warnings in long sessions. Registration
    * records the graft expression class in the `ExpressionInfo`, and a
    * present entry is skipped ONLY when that class check says it is
    * ours — a user session that registered its own temp function under
    * one of these names gets REPLACED (with Spark's one replace warning
    * as the correct signal), so graft operators never silently resolve
    * a foreign implementation. The residual check-then-register race
    * between two threads is benign (both install the identical builder).
    */
  def registerQuiet(spark: org.apache.spark.sql.SparkSession)(
      name: String, builder: Seq[Expression] => Expression,
      owner: Class[_]): Unit = {
    val reg = spark.sessionState.functionRegistry
    val ident = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
    // getClassName can be null (e.g. a registration path that derived
    // it from an anonymous class's getCanonicalName) — a null entry is
    // foreign by definition, never a crash
    val existing = reg.lookupFunction(ident)
    val ours = existing
      .exists(i => Option(i.getClassName).exists(_.startsWith("graft.")))
    if (!ours) {
      // name the displaced function explicitly — Spark's generic
      // "replaced a previously registered function" line doesn't say
      // WHOSE entry was clobbered, and the takeover is the one session
      // state change graft operators make as a side effect
      existing.foreach { i =>
        org.slf4j.LoggerFactory.getLogger("graft.functions.FnArgs").warn(
          s"replacing non-graft temp function `$name` " +
            s"(was ${Option(i.getClassName).getOrElse("<unknown class>")}) " +
            "with the graft built-in; the previous definition is gone for " +
            "this session")
      }
      reg.registerFunction(ident,
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          owner.getName, name),
        builder)
    }
  }

  /** Arity gate; `expected` lists every legal argument count. */
  def arity(fn: String, exprs: Seq[Expression], expected: Seq[Int]): Seq[Expression] = {
    if (!expected.contains(exprs.length))
      throw new AnalysisException("WRONG_NUM_ARGS.WITHOUT_SUGGESTION", Map(
        "functionName" -> s"`$fn`",
        "expectedNum" -> expected.mkString(" or "),
        "actualNum" -> exprs.length.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"))
    exprs
  }

  /** Integer-literal parameter: must be foldable, integral-typed, and
    * non-null (these parameters size codegen buffers — they cannot be
    * data-dependent).
    */
  def intLit(fn: String, exprs: Seq[Expression], idx: Int, paramName: String): Int = {
    val e = exprs(idx)
    val integral = e.resolved && (e.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    })
    val v = if (integral && e.foldable) e.eval() else null
    if (v == null)
      throw new AnalysisException("NON_FOLDABLE_ARGUMENT", Map(
        "funcName" -> s"`$fn`", "paramName" -> s"`$paramName`",
        "paramType" -> "\"INT\""))
    v.asInstanceOf[Number].intValue()
  }

  /** Numeric-literal parameter evaluated as a double (e.g. a quantile
    * probability).
    */
  def doubleLit(fn: String, exprs: Seq[Expression], idx: Int, paramName: String): Double = {
    val e = exprs(idx)
    val v =
      if (e.resolved && e.foldable && e.dataType.isInstanceOf[NumericType]) e.eval()
      else null
    if (v == null)
      throw new AnalysisException("NON_FOLDABLE_ARGUMENT", Map(
        "funcName" -> s"`$fn`", "paramName" -> s"`$paramName`",
        "paramType" -> "\"DOUBLE\""))
    v match {
      // SQL `0.5` parses as a DECIMAL literal, not a Number subclass
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case n: Number => n.doubleValue()
    }
  }
}
