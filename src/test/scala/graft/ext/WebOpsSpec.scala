package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

class WebOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  def urls(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "url")

  def canon(u: String): String =
    WebOps.canonicalizeUrl(urls((1L, u))).select("canonical_url")
      .collect()(0).getString(0)

  test("canonicalizeUrl: case, default port, fragment, tracking, order, slash") {
    assert(canon("HTTPS://News.Example.COM:443/A/b/?b=2&utm_source=x&a=1#frag")
      === "https://news.example.com/A/b?a=1&b=2")
    assert(canon("http://HOST.example.org:80/x") === "http://host.example.org/x")
    // non-default port survives; path case survives
    assert(canon("https://h.io:8443/Path") === "https://h.io:8443/Path")
    // http :443 is NOT a default port for http — kept
    assert(canon("http://h.io:443/x") === "http://h.io:443/x")
    // bare host -> root path; all-tracking query drops the '?' entirely
    assert(canon("https://h.io") === "https://h.io/")
    assert(canon("https://h.io/?utm_source=a&gclid=b&fbclid=c&ref=d&igshid=e")
      === "https://h.io/")
    // fragment before query text is still a fragment (everything after #)
    assert(canon("https://h.io/p#frag?not=query") === "https://h.io/p")
    // empty params from '&&' are dropped; value-less tracking key w/o '=' kept
    // (pattern anchors on 'key='; 'utm_source' alone is not a k=v tracker)
    assert(canon("https://h.io/p?a=1&&b=2") === "https://h.io/p?a=1&b=2")
  }

  test("canonicalizeUrl is idempotent") {
    val messy = Seq(
      "HTTPS://News.Example.COM:443/A/b/?b=2&utm_source=x&a=1#frag",
      "http://HOST.example.org:80/x//", "https://h.io",
      "https://h.io/p?z=9&a=1&gclid=g1")
    for (u <- messy) assert(canon(canon(u)) === canon(u))
  }

  test("urlDedup collapses the fixture's variants to doc_id % 100 groups") {
    val docs = (0L until 500L).map(i => (i, s"text $i", "en", "web", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val withUrls = WebOps.withSyntheticMessyUrl(docs)
    val deduped = WebOps.urlDedup(withUrls).collect()
    // canonical form is a pure function of doc_id % 100 -> exactly 100 groups
    assert(deduped.length === 100)
    assert(deduped.forall(_.getInt(1) === 5))
    // "first fetch wins": representative is the smallest doc_id = the residue
    val keep = deduped.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(keep.values.toSet === (0L until 100L).toSet)
    // canonical URLs carry no mess: lowercase scheme/host, no port/frag/tracking
    assert(deduped.forall { r =>
      val u = r.getString(0)
      u.startsWith("https://") && !u.contains(":443") && !u.contains("#") &&
        !u.contains("utm_") && !u.contains("gclid") && u == u.toLowerCase
    })
    // params arrive sorted: a= before b=
    assert(deduped.forall { r =>
      val q = r.getString(0).dropWhile(_ != '?')
      q.indexOf("a=") < q.indexOf("b=")
    })
  }

  test("canonicalization is a shuffle-free narrow projection") {
    val docs = Seq((1L, "t", "en", "web", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val plan = WebOps.canonicalizeUrl(WebOps.withSyntheticMessyUrl(docs))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
