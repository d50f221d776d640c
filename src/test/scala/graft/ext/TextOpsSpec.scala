package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.SparkSpec

class TextOpsSpec extends AnyFunSuite with SparkSpec {

  def docs(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.map { case (id, t, l) => (id, t, l, "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("tokenCount: whitespace vs BPE-ish regex tokens") {
    val d = docs((1L, "hello world 123 foo-bar", "en"))
    val r = TextOps.tokenCount(d).collect()(0)
    assert(r.getAs[Int]("n_ws_tokens") === 4)
    // hello, world, 123, foo, -, bar
    assert(r.getAs[Int]("n_re_tokens") === 6)
  }

  test("langId: marker stopwords drive the prediction with fixed tie-break") {
    val d = docs(
      (1L, "the cat and the dog of the town", "en"),
      (2L, "el gato de la casa que los", "es"),
      (3L, "xyzzy plugh qwerty", "zz"))
    val rows = TextOps.langId(d).collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("predicted_lang")).toMap
    assert(rows(1L) === "en")
    assert(rows(2L) === "es")
    assert(rows(3L) === "und")
  }

  test("qualityScore ratios are exact") {
    val d = docs((1L, "ab cd!", "en")) // 6 chars, 2 ws tokens, 1 punct, 0 stopwords
    val r = TextOps.qualityScore(d).collect()(0)
    assert(r.getAs[Double]("avg_token_len") === 3.0)
    assert(r.getAs[Double]("punct_ratio") === math.rint(1.0 / 6.0 * 10000) / 10000)
    assert(r.getAs[Double]("stopword_ratio") === 0.0)
  }

  test("fingerprints: md5 matches java digest; rolling hash is order-sensitive") {
    val d = docs((1L, "a b c", "en"), (2L, "c b a", "en"))
    val md = TextOps.fingerprintMd5(d).collect()(0).getAs[String]("fingerprint")
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("a b c".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(md === expected)
    val rh = TextOps.rollingHash(d).collect().map(_.getLong(1))
    assert(rh(0) !== rh(1), "rolling hash must depend on character order")
    def ref(s: String): Long =
      s.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toLong) % 1000000007L)
    assert(rh(0) === ref("a b c"), "must equal the Rabin-Karp reference fold")
    assert(rh(1) === ref("c b a"))
  }

  test("repetitionRatio: exact duplicate-trigram fraction; short docs yield NULL") {
    // "a b a b a b" → trigrams: (a b a),(b a b),(a b a),(b a b) → 4 total, 2 distinct
    val d = docs((1L, "a b a b a b", "en"), (2L, "x y", "en"), (3L, "p q r", "en"))
    val rows = TextOps.repetitionRatio(d).collect()
    val r1 = rows.find(_.getLong(0) == 1L).get
    assert(r1.getAs[Int]("n_ngrams") === 4)
    assert(r1.getAs[Int]("n_distinct") === 2)
    assert(r1.getAs[Double]("dup_ratio") === 0.5)
    val r2 = rows.find(_.getLong(0) == 2L).get // 2 tokens < n → no grams
    assert(r2.getAs[Int]("n_ngrams") === 0)
    assert(r2.isNullAt(r2.fieldIndex("dup_ratio")))
    val r3 = rows.find(_.getLong(0) == 3L).get // exactly one trigram, no repeats
    assert(r3.getAs[Int]("n_ngrams") === 1)
    assert(r3.getAs[Double]("dup_ratio") === 0.0)
  }

  test("textStats aggregates per language") {
    val d = docs((1L, "one two", "en"), (2L, "three four five", "en"), (3L, "six", "fr"))
    val rows = TextOps.textStats(d).collect()
    val en = rows.find(_.getString(0) == "en").get
    assert(en.getAs[Long]("n_docs") === 2)
    assert(en.getAs[Long]("sum_tokens") === 5)
  }
}
