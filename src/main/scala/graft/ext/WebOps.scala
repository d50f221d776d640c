package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus curation operators: URL canonicalization and
  * canonical-URL deduplication — the stage every web-scale pipeline
  * runs before content dedup (CommonCrawl-style: the same page is
  * fetched under scheme/case/port/tracking-param/fragment variants,
  * and URL-level dedup removes the bulk of refetches for the cost of
  * string arithmetic, no content comparison at all).
  *
  * Everything here is codegen'd built-in string/array expressions —
  * per-row, shuffle-free until the final dedup aggregation — so
  * canonicalization runs at scan speed over 100 TB. The regex subset
  * is shared by Java regex (Spark) and RE2-style engines, and the
  * whole chain is DuckDB-expressible, so both operators sit under the
  * exact oracle.
  */
object WebOps {

  /** Query parameters dropped during canonicalization: click/campaign
    * trackers that never change page content. Anchored match on the
    * `key=` prefix of a single `k=v` pair.
    */
  val trackingParamPattern = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref|igshid)="

  /** Canonicalize `urlCol` into `canonical_url`:
    *  1. drop the fragment (`#...`);
    *  2. lowercase scheme and host;
    *  3. strip the scheme-default port (`:443` for https, `:80` for http);
    *  4. trim trailing slashes off the path (empty path → `/`);
    *  5. drop tracking parameters ([[trackingParamPattern]]) and sort
    *     the surviving `k=v` pairs, so param order never splits a page.
    *
    * Deliberately NOT done: `www.` stripping and percent-decoding —
    * both can change which resource a URL names, so they belong to a
    * site-specific policy layer, not a default canonicalizer.
    *
    * Pure narrow projection — no shuffle, no UDF; idempotent
    * (canonicalize ∘ canonicalize = canonicalize, spec-pinned).
    */
  def canonicalizeUrl(df: DataFrame, urlCol: String = "url"): DataFrame = {
    val noFrag = regexp_replace(col(urlCol), "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val host = when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .otherwise(hostPort)
    val rest = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)$", 1)
    val rawPath = regexp_extract(rest, "^([^?]*)", 1)
    val path = {
      val trimmed = regexp_replace(rawPath, "/+$", "")
      when(trimmed === "", "/").otherwise(trimmed)
    }
    val rawQuery = regexp_extract(rest, "\\?(.*)$", 1)
    val params = array_sort(filter(split(rawQuery, "&"),
      p => p =!= "" && !p.rlike(trackingParamPattern)))
    val query = when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
      .otherwise(lit(""))
    df.withColumn("canonical_url", concat(scheme, lit("://"), host, path, query))
  }

  /** Canonical-URL dedup: one row per canonical URL with the duplicate
    * count and the kept representative (min doc id — the deterministic
    * "first fetch wins" policy). One hash-partial aggregation on the
    * canonical key is the only shuffle; at 100 TB this is the cheap
    * pre-pass that shrinks the corpus before any content-hash or
    * near-dup machinery runs.
    */
  def urlDedup(documents: DataFrame, urlCol: String = "url",
               idCol: String = "doc_id"): DataFrame =
    canonicalizeUrl(documents, urlCol)
      .groupBy("canonical_url")
      .agg(count(lit(1)).cast("int").as("n_docs"),
        min(col(idCol)).as("keep_doc"))
      .orderBy("canonical_url")

  /** Crawl-shaped URL fixture: most documents live at their OWN page,
    * but every `doc_id % 7 == 3` document aliases the previous page —
    * an SF-independent ~1/7 refetch rate, the proportion a crawl feed
    * actually shows (vs [[withSyntheticMessyUrl]]'s dense %100
    * collapse bed, which stress-tests the dedup itself). Page identity
    * (host, path, content params) is keyed on the PAGE; surface
    * variance (scheme case, default port, trailing slash, tracking
    * params, fragment) on the DOCUMENT — so alias pairs canonicalize
    * equal and nothing else does.
    */
  def withSyntheticCrawlUrl(documents: DataFrame): DataFrame = {
    val id = col("doc_id")
    val p = when(pmod(id, lit(7L)) === 3, id - 1).otherwise(id)
    val host = element_at(typedlit(Seq("News.Example.COM", "BLOG.Example.org",
      "Wiki.EXAMPLE.net", "Forum.example.IO", "DOCS.Example.dev")),
      (pmod(p, lit(5L)) + 1).cast("int"))
    val scheme = when(pmod(id, lit(2L)) === 0, lit("HTTPS")).otherwise(lit("https"))
    val port = when(pmod(id, lit(4L)) === 0, lit(":443")).otherwise(lit(""))
    val trail = when(pmod(id, lit(3L)) === 0, lit("/")).otherwise(lit(""))
    val a = pmod(p, lit(5L)).cast("string")
    val b = pmod(p, lit(7L)).cast("string")
    val query = when(pmod(id, lit(2L)) === 0,
        concat(lit("?b="), b, lit("&utm_source=feed&a="), a))
      .otherwise(concat(lit("?a="), a, lit("&b="), b,
        lit("&gclid=g"), id.cast("string")))
    val frag = when(pmod(id, lit(2L)) === 1,
      concat(lit("#sec-"), pmod(id, lit(4L)).cast("string"))).otherwise(lit(""))
    documents.withColumn("url",
      concat(scheme, lit("://"), host, port, lit("/p/"), p.cast("string"),
        trail, query, frag))
  }

  /** Deterministic messy-URL fixture (the corpus has no URL column):
    * every doc gets a URL whose canonical form depends only on
    * `doc_id % 100`, while scheme case, host case, default port,
    * trailing slash, tracking params, param order, and fragment all
    * vary with other residues — so canonicalization provably collapses
    * the variants (≈5 docs per canonical at 500 docs). Same
    * oracle-checkable fixture pattern as
    * [[TextOps.withSyntheticUrl]]/[[TextOps.withSyntheticPii]].
    */
  def withSyntheticMessyUrl(documents: DataFrame): DataFrame = {
    val id = col("doc_id")
    val m = pmod(id, lit(100L)).cast("string")
    val a = pmod(pmod(id, lit(100L)), lit(5L)).cast("string")
    val b = pmod(pmod(id, lit(100L)), lit(7L)).cast("string")
    val host = element_at(typedlit(Seq("News.Example.COM", "BLOG.Example.org",
      "Wiki.EXAMPLE.net", "Forum.example.IO", "DOCS.Example.dev")),
      (pmod(id, lit(5L)) + 1).cast("int"))
    val scheme = when(pmod(id, lit(2L)) === 0, lit("HTTPS")).otherwise(lit("https"))
    val port = when(pmod(id, lit(4L)) === 0, lit(":443")).otherwise(lit(""))
    val trail = when(pmod(id, lit(3L)) === 0, lit("/")).otherwise(lit(""))
    val query = when(pmod(id, lit(2L)) === 0,
        concat(lit("?b="), b, lit("&utm_source=feed&a="), a))
      .otherwise(concat(lit("?a="), a, lit("&b="), b,
        lit("&gclid=g"), id.cast("string")))
    val frag = when(pmod(id, lit(2L)) === 1,
      concat(lit("#sec-"), pmod(id, lit(4L)).cast("string"))).otherwise(lit(""))
    documents.withColumn("url",
      concat(scheme, lit("://"), host, port, lit("/p/"), m, trail, query, frag))
  }
}
