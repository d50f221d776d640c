package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.SparkSpec

class DedupSpec extends AnyFunSuite with SparkSpec {

  def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  val base = "the quick brown fox jumps over the lazy dog again and again today"
  val nearDup = "the quick brown fox jumps over the lazy dog again and again tonight"
  val other = "completely different words that share nothing with any other entry here"

  test("exactDedup: identical texts collapse to min doc_id with copy count") {
    val d = docs(1L -> base, 2L -> base, 3L -> other)
    val rows = Dedup.exactDedup(d).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L), (3L, 1L)))
  }

  test("shingles: k-gram count = tokens - k + 1 (distinct), short docs dropped") {
    val d = docs(1L -> "a b c d e f", 2L -> "a b c") // 6 tokens → 2 shingles; 3 → none
    val sh = Dedup.shingles(d, 5).collect()
    assert(sh.map(_.getString(1)).toSet === Set("a b c d e", "b c d e f"))
  }

  test("ngramJaccard: identical docs have jaccard 1.0; near-dups score high") {
    val d = docs(1L -> base, 2L -> base, 3L -> nearDup, 4L -> other)
    val rows = Dedup.ngramJaccard(d, threshold = 0.3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(rows((1L, 2L)) === 1.0)
    assert(rows((1L, 3L)) > 0.5 && rows((1L, 3L)) < 1.0)
    assert(!rows.keySet.exists { case (a, b) => b == 4L || a == 4L })
  }

  test("minhashNearDup finds the planted near-dup pair with exact jaccard attached") {
    val d = docs(1L -> base, 2L -> nearDup, 3L -> other)
    val rows = Dedup.minhashNearDup(d, threshold = 0.3).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
  }

  test("minhashNearDup: pruneVerifyShingles emits identical pairs and jaccards") {
    // mix of exact dup, near-dup, and unrelated docs so candidates are a
    // strict subset of the corpus — the regime the prune targets
    val d = docs(1L -> base, 2L -> base, 3L -> nearDup, 4L -> other,
      5L -> "yet another unrelated document with its own private vocabulary entirely",
      6L -> "one more distinct text again sharing no shingles with the rest at all")
    def run(prune: Boolean) =
      Dedup.minhashNearDup(d, threshold = 0.3, pruneVerifyShingles = prune)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = run(false)
    val pruned = run(true)
    assert(direct.nonEmpty, "planted dups must surface")
    assert(pruned === direct)
  }

  test("incrementalMinhashNearDup: new batch dedups against stored signatures only") {
    import org.apache.spark.sql.functions.col
    val corpus = docs(1L -> base, 2L -> other)
    val storedSigs = Dedup.minhashSignatures(Dedup.shingles(corpus))
      .localCheckpoint(true) // simulate signatures read back from storage
    // new batch: 10 = exact dup of stored doc 1; 11 = near-dup of 10 (new×new); 12 = fresh
    val newBatch = docs(10L -> base, 11L -> nearDup,
      12L -> "entirely novel content with no overlap to anything ingested before now")
    val rows = Dedup.incrementalMinhashNearDup(newBatch, storedSigs, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getBoolean(3))).toMap
    assert(rows.contains((1L, 10L)), s"cross dup not found: ${rows.keySet}")
    assert(rows((1L, 10L))._1 === 1.0, "identical text must estimate 1.0")
    assert(rows((1L, 10L))._2 === true, "pair with stored doc must be cross")
    assert(rows.contains((10L, 11L)) && rows((10L, 11L))._2 === false,
      "new-vs-new near-dup must be found and marked not cross")
    assert(!rows.keySet.exists { case (a, b) => a == 12L || b == 12L },
      "fresh content must not pair")
    assert(!rows.keySet.exists { case (a, b) => a == 2L && b < 10L },
      "stored-vs-stored pairs are not re-reported")
  }

  test("md5HashLong is the engine-portable value DuckDB computes") {
    import spark.implicits._
    // pinned cross-engine constant: DuckDB's
    //   ('0x' || substr(md5('abc' || chr(1) || '7'), 1, 15))::BIGINT
    // = 1102009975508406977 — the parity the _md5 oracle twins rest on
    val got = Seq("abc").toDF("s")
      .select(Dedup.md5HashLong(org.apache.spark.sql.functions.col("s"), 7))
      .collect()(0).getLong(0)
    assert(got === 1102009975508406977L)
  }

  test("portable minhash twin: planted duplicates found, cross/new classes correct") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // stored corpus (ids < 250) with one doc whose exact copy and one
    // near-copy arrive in the new batch; plus a new-vs-new exact pair
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val docs = Seq(
      (10L, base, "en", "s", 60L),
      (300L, base, "en", "s", 60L),   // new, dup of stored 10
      (301L, near, "en", "s", 60L),   // new, near-dup of stored 10
      (310L, "one two three four five six seven", "en", "s", 40L),
      (311L, "one two three four five six seven", "en", "s", 40L) // new-vs-new dup
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val stored = Dedup.minhashSignaturesMd5(
      Dedup.shingles(docs.filter(col("doc_id") < 250)), numHashes = 16)
    val out = Dedup.incrementalMinhashNearDup(
      docs.filter(col("doc_id") >= 250), stored,
      numHashes = 16, numBands = 8, portableHash = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val byPair = out.map(t => (t._1, t._2) -> t).toMap
    assert(byPair((10L, 300L))._3 === 1.0 && byPair((10L, 300L))._4 === true,
      "exact stored-dup must be found cross with est 1.0")
    assert(byPair.contains(10L -> 301L) && byPair((10L, 301L))._4 === true,
      "near-dup of stored content must be found cross")
    assert(byPair((310L, 311L))._3 === 1.0 && byPair((310L, 311L))._4 === false,
      "new-vs-new dup must be found non-cross")
  }

  test("simhashNearDup banding is recall-complete at any threshold (≡ brute force)") {
    import org.apache.spark.sql.functions._
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    for (maxH <- Seq(3, 5, 8)) {
      // guard off: recall-completeness is a property of the banding
      // itself; the auto guard's no-op-on-this-corpus is pinned below
      val banded = Dedup.simhashNearDup(d, maxH, maxBandBucket = 0).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue)).toSet
      val fp = Dedup.simhash(d)
      val brute = fp.as("x").join(fp.as("y"), col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id"), col("y.doc_id"),
          bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("h"))
        .filter(col("h") <= maxH)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue)).toSet
      assert(banded === brute,
        s"banding must find exactly the brute-force pairs at maxHamming=$maxH")
    }
    // default (auto guard) on a normal corpus: no bucket is degenerate,
    // so the guard must be a row-for-row no-op
    val auto = Dedup.simhashNearDup(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue)).toSet
    val off = Dedup.simhashNearDup(d, maxBandBucket = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue)).toSet
    assert(auto === off, "auto cap must not drop rows on a non-degenerate corpus")
  }

  test("simhashNearDupMd5: banded pairs ≡ brute force over the portable fingerprints") {
    import org.apache.spark.sql.functions._
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val banded = Dedup.simhashNearDupMd5(d, maxBandBucket = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue)).toSet
    val fp = Dedup.simhashMd5(d)
    val brute = fp.as("x").join(fp.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("h"))
      .filter(col("h") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue)).toSet
    assert(banded === brute,
      "md5-twin banding must find exactly the brute-force pairs")
    // portable fingerprints stay in the 60-bit positive range (the
    // DuckDB twin shifts into the same bits)
    val fps = fp.collect().map(_.getLong(1))
    assert(fps.forall(v => v >= 0L && v < (1L << 60)))
  }

  test("simhashNearDup band-bucket cap bounds the degenerate-corpus blowup") {
    import spark.implicits._
    // 200 empty docs share the all-zeros fingerprint: every band bucket
    // holds all 200, so the uncapped self-join emits all C(200,2) pairs
    val emptyDocs = (1 to 200).map(i => (i.toLong, "", "en", "s", 0L))
    // planted near-dup pair in a small bucket must survive the cap
    val planted = Seq(
      (1001L, "alpha beta gamma delta epsilon", "en", "s", 30L),
      (1002L, "alpha beta gamma delta epsilon", "en", "s", 30L))
    val d = (emptyDocs ++ planted)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val uncapped = Dedup.simhashNearDup(d, maxBandBucket = 0).collect()
    assert(uncapped.length === 200 * 199 / 2 + 1,
      "guard off: quadratic pair volume in the degenerate bucket")
    val capped = Dedup.simhashNearDup(d, maxBandBucket = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.toSeq === Seq((1001L, 1002L)),
      "cap must drop the mass-duplicate bucket (exact dedup's job) " +
        "while keeping pairs from non-degenerate buckets")
    // safe-by-default: NO caller-supplied parameter. 202 fingerprints ×
    // 4 bands = 808 band rows -> auto cap = max(64, ceil(sqrt(3232))) =
    // 64, so the 200-strong degenerate buckets are dropped and the
    // planted pair's 2-strong buckets survive
    val auto = Dedup.simhashNearDup(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(auto.toSeq === Seq((1001L, 1002L)),
      "auto cap must bound the degenerate corpus with no parameter")
  }

  test("connectedComponents: chains merge transitively, isolated nodes keep their id") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 1-2, 2-3 (chain) and 5-6; 4 isolated; labels = min reachable id
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val labels = Dedup.connectedComponents(edges, nodes).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
    // a ring with the min in the middle: diameter > 1 forces iteration
    val ring = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L)).toDF("src", "dst")
    val rn = Seq(10L, 11L, 12L, 13L).toDF("doc_id")
    val rl = Dedup.connectedComponents(ring, rn).collect().map(_.getLong(1)).distinct
    assert(rl === Array(10L))
  }

  test("connectedComponentsDistributed (at-scale path) ≡ local union-find path") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (7L, 5L), (9L, 8L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L).toDF("doc_id")
    val dist = Dedup.connectedComponentsDistributed(edges, nodes).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = Dedup.connectedComponents(edges, nodes).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist === local)
    assert(dist === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 8L, 9L -> 8L))
  }

  test("both regimes cover nodes ∪ edge endpoints when nodes miss endpoints") {
    import spark.implicits._
    // endpoint-only vertices: 2 bridges 1→3 but is not listed; the 8-9
    // edge touches NO listed node at all. Both regimes must emit the
    // full endpoint closure with the same min labels — seeding the
    // distributed path from `nodes` alone dropped 8-9 entirely and let
    // an unlisted endpoint receive a label without contributing its id.
    val edges = Seq((2L, 1L), (2L, 3L), (8L, 9L)).toDF("src", "dst")
    val nodes = Seq(1L, 3L, 4L).toDF("doc_id")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 8L -> 8L, 9L -> 8L)
    val dist = Dedup.connectedComponentsDistributed(edges, nodes).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = Dedup.connectedComponents(edges, nodes).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist === want)
    assert(local === want)
  }

  test("dedupClusters: transitive near-dup group collapses to one cluster") {
    // a≈b and b≈c but a,c share less: the pair list alone can't decide —
    // the cluster must contain all three with cluster_id = min doc_id
    val chain1 = "the quick brown fox jumps over the lazy dog again and again today ok"
    val chain2 = "the quick brown fox jumps over the lazy dog again and again tonight ok"
    val chain3 = "a quick brown fox jumps over the lazy dog again and again tonight ok"
    val d = docs(1L -> chain1, 2L -> chain2, 3L -> chain3, 4L -> other)
    val rows = Dedup.dedupClusters(d, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSet === Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L)))
  }

  test("sigJaccard estimator: identical sigs → 1.0, disjoint docs → low, symmetric") {
    import org.apache.spark.sql.functions.col
    val d = docs(1L -> base, 2L -> base, 3L -> other)
    val sigs = Dedup.minhashSignatures(Dedup.shingles(d))
    val pairs = sigs.as("a").join(sigs.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        Dedup.sigJaccard(col("a.sig"), col("b.sig"), 64).as("est"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) === 1.0, "identical text → identical sigs → est 1.0")
    assert(pairs((1L, 3L)) < 0.2, "unrelated docs must estimate low")
    // symmetry: reverse join direction gives the same estimates
    val rev = sigs.as("a").join(sigs.as("b"), col("a.doc_id") > col("b.doc_id"))
      .select(col("b.doc_id").as("da"), col("a.doc_id").as("db"),
        Dedup.sigJaccard(col("b.sig"), col("a.sig"), 64).as("est"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(rev === pairs)
  }

  test("minhash agrees with exact ngram jaccard on the real testdata corpus") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val exact = Dedup.ngramJaccard(d).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = Dedup.minhashNearDup(d).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.subsetOf(exact), "minhash must not emit false positives (exact verify step)")
    assert(mh.size >= (exact.size * 9) / 10, s"recall too low: ${mh.size}/${exact.size}")
  }

  test("skew stress: 10x-duplicated corpus — pairs found, and the DF cap bounds blowup") {
    import org.apache.spark.sql.functions._
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val skewed = (0 until 10).map(i =>
      d.withColumn("doc_id", col("doc_id") + lit(i * 1000000L))).reduce(_ union _)
    // every text now has 10 identical copies → C(10,2)=45 jaccard-1.0 pairs each
    val pairs = Dedup.ngramJaccard(skewed, threshold = 0.999)
    assert(pairs.count() >= 500L * 45)
    // a tight document-frequency cap drops the hot shingles entirely:
    // the pair space is bounded instead of exploding (guard semantics)
    val capped = Dedup.ngramJaccard(skewed, threshold = 0.999, maxShingleDf = 5)
    assert(capped.count() === 0)
  }

  test("native minhash_sketch signatures equal the composed min(xxhash64) form") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val sh = Dedup.shingles(d)
    val native = Dedup.minhashSignatures(sh, 64).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val composed = Dedup.minhashSignaturesComposed(sh, 64).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native.keySet === composed.keySet)
    assert(native.forall { case (k, sig) => composed(k) == sig },
      "hash replication must be exact: XXH64.hashInt(i, hashUnsafeBytes(shingle, 42))")
  }

  test("fused md5_minhash_sketch signatures equal the composed min(md5HashLong) form") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val sh = Dedup.shingles(d).repartition(8) // exercise partial/merge paths
    val fused = Dedup.minhashSignaturesMd5(sh, 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val composed = Dedup.minhashSignaturesMd5Composed(sh, 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fused.keySet === composed.keySet)
    assert(fused.forall { case (k, sig) => composed(k) == sig },
      "byte-level digests must replicate conv(substring(md5(concat_ws)))")
    // non-ASCII shingles: digest bytes must be the UTF-8 stream
    import spark.implicits._
    val uni = Seq((1L, "日本語"), (1L, "naïve café"), (1L, "😀emoji"), (2L, "日本語"))
      .toDF("doc_id", "shingle")
    val f2 = Dedup.minhashSignaturesMd5(uni, 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val c2 = Dedup.minhashSignaturesMd5Composed(uni, 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(f2 === c2)
    // NULL shingles: concat_ws drops a NULL arg and its separator, so
    // the composed twin hashes the seed-only string — the fused sketch
    // must replicate that (mixed and all-NULL groups alike), not skip
    val withNull = Seq((1L, "abc"), (1L, null), (2L, null), (2L, null))
      .toDF("doc_id", "shingle")
    val f3 = Dedup.minhashSignaturesMd5(withNull, 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val c3 = Dedup.minhashSignaturesMd5Composed(withNull, 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(f3 === c3,
      "twins must stay bit-identical on NULL input (concat_ws semantics)")
  }

  test("native simhash_sketch fingerprints equal the composed 64-column form") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val native = Dedup.simhash(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val composed = Dedup.simhashComposed(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native === composed)
  }

  test("clusterRepresentatives: longest member kept, doc_id breaks ties, drops tallied") {
    // one near-dup cluster {1,2,4}: 2 is longest → representative;
    // 3 is unrelated → no cluster row
    val longer = base + " with extra trailing words"
    val d = docs(1L -> base, 2L -> longer, 4L -> base, 3L -> other)
    val rows = Dedup.clusterRepresentatives(d).collect()
    assert(rows.length === 1)
    val r = rows(0)
    assert(r.getAs[Long]("cluster_id") === 1L)
    assert(r.getAs[Int]("cluster_size") === 3)
    assert(r.getAs[Long]("rep_doc") === 2L)
    assert(r.getAs[Int]("rep_chars") === longer.length)
    assert(r.getAs[Long]("dropped_chars") === 2L * base.length)
  }

  test("clusterRepresentatives: equal-length members fall back to min doc_id") {
    val d = docs(7L -> base, 5L -> base, 9L -> other)
    val r = Dedup.clusterRepresentatives(d).collect()(0)
    assert(r.getAs[Long]("rep_doc") === 5L)
  }

  test("simhash: identical docs get identical fingerprints → hamming-0 pair") {
    val d = docs(1L -> base, 2L -> base, 3L -> other)
    val fps = Dedup.simhash(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) === fps(2L))
    val pairs = Dedup.simhashNearDup(d).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L && r.getInt(2) == 0))
  }

  test("LSH banding rejects numHashes not divisible by numBands") {
    // 64/12 would silently drop the trailing 4 signature components and
    // lower recall below the banding guarantee
    val d = docs(1L -> base, 2L -> other)
    val ex = intercept[IllegalArgumentException] {
      Dedup.minhashNearDup(d, numHashes = 64, numBands = 12)
    }
    assert(ex.getMessage.contains("multiple"))
    val ex2 = intercept[IllegalArgumentException] {
      Dedup.incrementalMinhashNearDup(d, d, numHashes = 64, numBands = 12)
    }
    assert(ex2.getMessage.contains("multiple"))
  }

  test("repeatedSpans: cross-doc spans only; within-doc repeats never pass the gate") {
    val d = docs(
      (1L, "a b c d e f"),
      (2L, "x a b c d e y"),
      (3L, "z z z z z")) // "z z z" occurs 3x but in ONE doc only
    val rows = Dedup.repeatedSpans(d, k = 3, minDocs = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq === Seq(
      ("a b c", 2L, 2L, 1L), ("b c d", 2L, 2L, 1L), ("c d e", 2L, 2L, 1L)),
      "exactly the spans shared by both docs, count-desc/span-asc ordered")
  }

  test("removeRepeatedSpans: covered tokens cut, short docs and unique text survive") {
    val d = docs(
      (1L, "a b c d e f"),        // shares "a b c d e" span region with doc 2
      (2L, "x a b c d e y"),
      (3L, "z z z z z"),          // within-doc repeats only -> untouched
      (4L, "p q"),                // shorter than k -> passthrough
      (5L, "a b c d e"))          // ENTIRELY covered -> empty result
    val rows = Dedup.removeRepeatedSpans(d, k = 3, minDocs = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSeq
    // docs 1/2/5 share the grams of "a b c d e": every token of that
    // region is covered; doc 1 keeps "f", doc 2 keeps "x ... y"
    assert(rows === Seq(
      (1L, "f", 6, 5),
      (2L, "x y", 7, 5),
      (3L, "z z z z z", 5, 0),
      (4L, "p q", 2, 0),
      (5L, "", 5, 5)))
  }

  test("removeRepeatedSpans: clean corpus is a no-op reassembly") {
    val d = docs((1L, "alpha beta gamma delta"), (2L, "one two three four"))
    val rows = Dedup.removeRepeatedSpans(d, k = 3, minDocs = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(3))).toSeq
    assert(rows === Seq(
      (1L, "alpha beta gamma delta", 0),
      (2L, "one two three four", 0)),
      "no cross-doc grams -> byte-identical reassembly, zero removals")
  }

  test("winnowFingerprints: guarantee, density bound, short-doc guard, normalization") {
    // SIGMOD'03 guarantee: any shared substring of >= w + k - 1 chars
    // yields >= 1 shared fingerprint
    val k = 8; val w = 8
    val shared = "zqxwvutsrqponmlk" // 16 >= k + w - 1 = 15 chars, distinctive
    val d = docs(
      1L -> s"first document body $shared and then some trailing content here",
      2L -> s"totally other opening $shared closing words differ completely now",
      3L -> other,
      4L -> "tiny") // < 15 normalized chars -> no fingerprints
    val fp = Dedup.winnowFingerprints(d, k, w).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = fp.groupBy(_._1).map { case (id, a) => id -> a.map(_._2).toSet }
    assert(byDoc(1L).intersect(byDoc(2L)).nonEmpty,
      "docs sharing a 16-char substring must share a fingerprint")
    assert(byDoc(3L).intersect(byDoc(1L)).isEmpty, "unrelated doc shares nothing")
    assert(!byDoc.contains(4L), "sub-(k+w-1) docs produce no fingerprints")
    // density: distinct fingerprints <= full windows, >= windows / w
    // (every window selects a fingerprint within it, so one fingerprint
    // covers at most w windows)
    val norm1 = ("first document body " + shared + " and then some trailing content here")
      .toLowerCase.replaceAll("[^a-z0-9]", "")
    val nWindows = norm1.length - k + 1 - (w - 1)
    assert(byDoc(1L).size <= nWindows && byDoc(1L).size >= nWindows / w)
    // normalization: case and punctuation do not change the fingerprint set
    val d2 = docs(9L -> "The-Quick! brown FOX, jumps; over (the) lazy dog today yes",
                  10L -> "the quick brown fox jumps over the lazy dog today yes")
    val fp2 = Dedup.winnowFingerprints(d2, k, w).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (id, a) => id -> a.map(_._2).toSet }
    assert(fp2(9L) === fp2(10L))
  }

  test("winnowFingerprints: native expression == composed window twin, incl. edge cases") {
    // the native WinnowFps expression must reproduce the composed
    // explode/window/distinct pipeline EXACTLY: same md5-60bit hash,
    // same full-window rule, same short-doc guard. Edge beds: length
    // exactly k+w-1 (one window), length k+w-2 (none), repeated chars
    // (max hash ties in the sliding min), non-ASCII (code-point vs
    // UTF-16 walk would diverge on a supplementary char).
    val d = docs(
      1L -> (base + " extra tail words here to pass length"),
      2L -> nearDup,
      3L -> other,
      4L -> "abcdefgh1234567", // 15 normalized chars = k+w-1: exactly 1 window
      5L -> "abcdefgh123456",  // 14: no full window
      6L -> "aaaaaaaaaaaaaaaaaaaaaaaa") // all-equal hashes: tie handling
    for (kw <- Seq((8, 8), (5, 3), (2, 11))) {
      val (k, w) = kw
      val native = Dedup.winnowFingerprints(d, k, w).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val composed = Dedup.winnowFingerprintsComposed(d, k, w).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(native === composed, s"k=$k w=$w")
    }
    // and the plan earns its keep: no exchange anywhere
    val plan = Dedup.winnowFingerprints(d).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"native winnowing must be shuffle-free, got:\n$plan")
    import org.apache.spark.sql.functions._
    // code-point walk: normalization strips non-ASCII before the
    // expression in the operator, so pin the raw expression against the
    // SQL pipeline (both substr and length count code points) on text
    // with BMP and supplementary (emoji) characters, where a UTF-16
    // char walk would slice grams differently
    import org.apache.spark.sql.GraftBridge
    val k = 3; val w = 4
    val raw = spark.createDataFrame(Seq(
      (1L, "日本語テキスト😀abcdefgh12漢字"))).toDF("doc_id", "t")
    val nat = raw.select(col("doc_id"), explode(GraftBridge.column(
        graft.functions.WinnowFps(GraftBridge.expression(col("t")), k, w))).as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, w - 1)
    val sql = raw
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(1), length(col("t")) - (k - 1))).as("pos"))
      .select(col("doc_id"), col("pos"),
        Dedup.md5HashLong(col("t").substr(col("pos"), lit(k)), 0).as("h"),
        (length(col("t")) - (k - 1)).as("n_grams"))
      .select(col("doc_id"), col("pos"), col("n_grams"),
        min(col("h")).over(win).as("fp"))
      .filter(col("pos") <= col("n_grams") - (w - 1))
      .select(col("doc_id"), col("fp")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(nat === sql, "expression must hash code-point grams like substr")
  }

  test("containmentNearDup: quoted excerpt scores 1.0 where symmetric jaccard misses") {
    val container = base + " plus a much longer additional discussion that keeps " +
      "going with many more unique tokens beyond the quoted passage entirely now"
    val d = docs(1L -> base, 2L -> container, 3L -> other)
    val rows = Dedup.containmentNearDup(d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(rows((1L, 2L)) === 1.0, "wholly-quoted excerpt is fully contained")
    assert(!rows.contains((2L, 1L)),
      "directed: the long doc is not contained in the excerpt")
    assert(!rows.keySet.exists { case (a, b) => a == 3L || b == 3L })
    assert(Dedup.ngramJaccard(d).collect().isEmpty,
      "the pair symmetric jaccard at its default threshold never sees")
  }

  test("lshRecallCurve: buckets partition the truth set; identical docs always caught") {
    // planted pair-groups with stepped token overlap -> truth pairs
    // spread over several similarity buckets (disjoint token alphabets
    // between groups, so only the planted pairs exist)
    val rows = (0 until 10).flatMap { g =>
      val base = (0 until 30).map(i => s"g${g}t$i")
      val variant = base.take(30 - 3 * g) ++ (0 until 3 * g).map(i => s"x${g}n$i")
      Seq((2L * g) -> base.mkString(" "), (2L * g + 1) -> variant.mkString(" "))
    }
    val d = docs(rows: _*)
    val curve = Dedup.lshRecallCurve(d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(curve.nonEmpty)
    curve.foreach { case (b, n, c, r) =>
      assert(c <= n, s"bucket $b: caught $c > pairs $n")
      assert(r === math.rint(c.toDouble / n * 1e6) / 1e6, s"bucket $b recall")
      assert(b >= 1 && b <= 10)
    }
    // buckets partition exactly the >= minJaccard truth set
    val truthCount = Dedup.ngramJaccard(d, threshold = 0.1).count()
    assert(curve.map(_._2).sum === truthCount)
    // the identical pair has identical signatures -> guaranteed caught
    val b10 = curve.find(_._1 === 10)
    assert(b10.exists(t => t._2 >= 1 && t._3 === t._2 && t._4 === 1.0),
      s"jaccard-1.0 pairs must always be caught, got $b10")
  }

  test("winnowNearDup: overlap fraction isolates the planted dup pair") {
    val d = docs(
      1L -> (base + " extra tail words here to pass length"),
      2L -> (base + " extra tail words here to pass length"),
      3L -> nearDup, 4L -> other)
    val rows = Dedup.winnowNearDup(d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(rows((1L, 2L)) === 1.0, "identical docs overlap fully")
    assert(rows.contains((1L, 3L)) && rows((1L, 3L)) < 1.0,
      "near-dup (one word changed) passes the 0.4 overlap gate")
    assert(!rows.keySet.exists { case (a, b) => a == 4L || b == 4L },
      "unrelated doc never pairs")
  }
}
