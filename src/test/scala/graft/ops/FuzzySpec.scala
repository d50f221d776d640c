package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.SparkSpec

class FuzzySpec extends AnyFunSuite with SparkSpec {

  def names(vs: String*): DataFrame = {
    import spark.implicits._
    vs.toDF("p_name")
  }

  test("fuzzyNameMatch: classic edit distances, ordered pairs, row weights") {
    // "kitten"/"kitchen" = 2 edits; duplicate rows feed the weight columns
    val d = names("kitten", "kitchen", "kitten", "zebra")
    val rows = Fuzzy.fuzzyNameMatch(d, "p_name").collect()
    assert(rows.length === 1)
    val r = rows(0)
    assert((r.getString(0), r.getString(1), r.getInt(2)) === (("kitchen", "kitten", 2)))
    assert((r.getLong(3), r.getLong(4)) === ((1L, 2L))) // kitchen×1, kitten×2
  }

  test("fuzzyNameMatch blocking contract: first-char and length-delta prune pairs") {
    // "cat"/"bat" is lev-1 but first chars differ → blocked (by contract);
    // "a"/"aaaa" is within first-char block but len delta 3 > 2 → blocked
    val d = names("cat", "bat", "a", "aaaa")
    assert(Fuzzy.fuzzyNameMatch(d, "p_name").collect().isEmpty)
  }

  test("fuzzyNameMatch: threshold boundary is inclusive") {
    val d = names("abcdef", "abcxyz") // distance exactly 3
    val rows = Fuzzy.fuzzyNameMatch(d, "p_name", maxDist = 3).collect()
    assert(rows.length === 1 && rows(0).getInt(2) === 3)
    assert(Fuzzy.fuzzyNameMatch(d, "p_name", maxDist = 2).collect().isEmpty)
  }
}
