package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Every native expression's generated Java must actually COMPILE.
  *
  * A `doGenCode` syntax error does not fail a query — Spark logs one
  * `ERROR CodeGenerator` and silently falls back to interpreted
  * evaluation, so correctness stays green while the "native codegen"
  * expression quietly runs at interpreted speed (round 14 shipped
  * exactly that: PqEncode's generated `if` had a continuation line
  * starting with `||`, Spark's enclosing templates' repeated
  * `.stripMargin` ate the pipes, and every PQ-tier query executed
  * interpreted for a round — visible only as an anonymous `[error]`
  * stack in the bench tail).
  *
  * This spec removes the silence: each native function is evaluated
  * over a NON-FOLDABLE input (a real column — all-literal args would
  * be constant-folded through `eval()` at plan time and never touch
  * `doGenCode`) under
  *   - `spark.sql.codegen.factoryMode=CODEGEN_ONLY` with
  *     `spark.sql.codegen.fallback=false`, where a compile failure
  *     THROWS instead of demoting, and
  *   - `NO_CODEGEN` (pure interpreted),
  * and the two results must match the default-regime baseline —
  * compiled-path health and interpreted≡codegen equivalence in one
  * sweep.
  */
class CodegenHealthSpec extends AnyFunSuite with SparkSpec {

  // dim=8 vectors; codebook k=2 entries × dim=8 → 16 ints; nsub=4
  private val CB = "array(1,2,3,4,5,6,7,8, 8,7,6,5,4,3,2,1)"

  /** name → SQL snippet over the bed (binary outputs wrapped in
    * hex/base64 so collected rows compare by value)
    */
  private val cases: Seq[(String, String)] = Seq(
    "cosine_sim" -> "cosine_sim(dv, reverse(dv))",
    "int_dot" -> "int_dot(iv, reverse(iv))",
    "int_vec_add" -> "int_vec_add(iv, reverse(iv))",
    "int_vec_sub" -> "int_vec_sub(iv, reverse(iv))",
    "int8_codes" -> "int8_codes(dv)",
    "int8_bytes" -> "base64(int8_bytes(dv))",
    "int8_unpack" -> "int8_unpack(int8_bytes(dv))",
    "int_dot_bytes" -> "int_dot_bytes(int8_bytes(dv), int8_bytes(reverse(dv)))",
    "winnow_fps" -> "winnow_fps(txt, 3, 4)",
    "unicode_normalize" -> "unicode_normalize(txt)",
    "zorder" -> "zorder(x, y)",
    "pq_encode" -> ("concat_ws(':', hex(pq_encode(iv, " + CB + ", 4).codes), " +
      "pq_encode(iv, " + CB + ", 4).dist, pq_encode(iv, " + CB + ", 4).rsq)"),
    "pq_encode_null" -> s"pq_encode(slice(iv, 1, 7), $CB, 4) IS NULL", // 7 % 4 != 0
    "pq_lut" -> s"pq_lut(iv, $CB, 4)",
    "pq_adc" -> s"pq_adc(pq_lut(iv, $CB, 4), pq_encode(iv, $CB, 4).codes)",
    "pq_recon" -> s"pq_recon(pq_encode(iv, $CB, 4).codes, $CB, 2)")

  private def bed() = {
    val df = spark.range(6).selectExpr(
      "transform(sequence(1, 8), e -> CAST(e + id AS INT)) AS iv",
      "transform(sequence(1, 8), e -> CAST(e * 2 - id AS DOUBLE)) AS dv",
      "CAST(id AS STRING) || ' the quick brown fox jumps over the lazy dog' AS txt",
      "id AS x", "id * 3 AS y")
    df.createOrReplaceTempView("cg_bed")
    df
  }

  private def run(expr: String): Seq[String] =
    spark.sql(s"SELECT $expr AS out FROM cg_bed").collect()
      .map(_.toString).toSeq

  private def withRegime[T](factoryMode: String, wscgFallback: Boolean)(body: => T): T = {
    val fmKey = "spark.sql.codegen.factoryMode"
    val fbKey = "spark.sql.codegen.fallback"
    val prevFm = spark.conf.getOption(fmKey)
    val prevFb = spark.conf.getOption(fbKey)
    spark.conf.set(fmKey, factoryMode)
    spark.conf.set(fbKey, wscgFallback.toString)
    try body
    finally {
      prevFm.fold(spark.conf.unset(fmKey))(spark.conf.set(fmKey, _))
      prevFb.fold(spark.conf.unset(fbKey))(spark.conf.set(fbKey, _))
    }
  }

  test("native expressions compile under CODEGEN_ONLY and match interpreted") {
    bed()
    for ((name, expr) <- cases) {
      val baseline = run(expr)
      assert(baseline.nonEmpty, s"$name produced no rows")
      val compiled = withRegime("CODEGEN_ONLY", wscgFallback = false)(run(expr))
      assert(compiled === baseline, s"$name: CODEGEN_ONLY result diverged")
      val interpreted = withRegime("NO_CODEGEN", wscgFallback = true)(run(expr))
      assert(interpreted === baseline, s"$name: NO_CODEGEN result diverged")
    }
  }

  test("centroid_scores compiles under CODEGEN_ONLY and matches interpreted") {
    import org.apache.spark.sql.functions.{col, expr}
    val df = bed().withColumn("qsq", expr("aggregate(iv, 0L, (a, e) -> a + CAST(e AS LONG) * e)"))
    val matrix = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 8, 7, 6, 5, 4, 3, 2, 1)
    val csqs = Seq(204L, 204L)
    val cids = Seq(0, 1)
    def run(): Seq[String] =
      df.select(CentroidScores.centroid_scores(col("iv"), col("qsq"),
        matrix, csqs, cids).as("s")).collect().map(_.toString).toSeq
    val baseline = run()
    assert(withRegime("CODEGEN_ONLY", wscgFallback = false)(run()) === baseline)
    assert(withRegime("NO_CODEGEN", wscgFallback = true)(run()) === baseline)
  }
}
