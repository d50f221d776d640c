package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class DataPrepSpec extends AnyFunSuite with SparkSpec {
  val sf = "/root/testdata/sf0.001"

  test("hash sample: deterministic, stable under corpus growth") {
    val d = Tables.documents(spark, sf)
    val s1 = DataPrep.hashSample(d).collect().map(_.getLong(0)).toSet
    val s2 = DataPrep.hashSample(d).collect().map(_.getLong(0)).toSet
    assert(s1 === s2)
    // ~25% of 500 with binomial spread
    assert(s1.size > 80 && s1.size < 180)
    // growing the corpus keeps prior membership decisions unchanged
    val grown = d.union(d.withColumn("doc_id", col("doc_id") + 10000)
      .withColumn("text", concat(col("text"), lit(" extra"))))
    val s3 = DataPrep.hashSample(grown).collect().map(_.getLong(0)).toSet
    assert(s1.subsetOf(s3))
  }

  test("dataset split: partitions the corpus, ~80/10/10") {
    val d = Tables.documents(spark, sf)
    val rows = DataPrep.datasetSplit(d).collect()
    val bySplit = rows.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(bySplit.values.sum === 500L)
    assert(bySplit("train") > 350 && bySplit("train") < 450)
    assert(bySplit.keySet === Set("train", "val", "test"))
  }

  test("bloom-pre-filtered decontamination equals the exact form") {
    val docs = graft.Tables.documents(spark, sf)
    val exact = DataPrep.decontaminate(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bloom = DataPrep.decontaminateBloom(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bloom === exact,
      "bloom false positives must be eliminated by the exact join")
    assert(exact.nonEmpty, "fixture must actually contain leaked pairs")
    // the prune must stay inside Catalyst: Spark's own bloom aggregate +
    // might_contain probe, not a per-row Scala UDF (codegen barrier)
    val plan = DataPrep.decontaminateBloom(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.toLowerCase.contains("batchevalpython"),
      s"bloom probe must not be a UDF:\n$plan")
    assert(plan.contains("might_contain"), s"expected a might_contain probe:\n$plan")
  }

  test("decontaminateBloom cache hygiene: only the returned result stays pinned") {
    val docs = Tables.documents(spark, sf)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // k=7 keeps this call's plan distinct from the equality test's
    // cached results above (CacheManager dedupes identical plans, which
    // would make the new-cache diff empty)
    val out = DataPrep.decontaminateBloom(docs, k = 7)
    // the operator contract hands the caller a persisted, already-
    // materialised result; every intermediate (the shingle table) must
    // have been released before it returned — sequential operators must
    // not accumulate dead caches (the ×20-run failure mode in RESULTS.md)
    val during = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(during.size === 1, s"expected only the result cache, got: $during")
    out.unpersist(blocking = true)
    val after = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(after.isEmpty, s"caches left after releasing the result: $after")
  }

  test("stratified sample: balances strata toward the smallest, min stratum kept whole") {
    val d = Tables.documents(spark, sf)
    val rows = DataPrep.stratifiedSample(d, "lang").collect()
    val byLang = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val minTotal = byLang.values.map(_._1).min
    byLang.foreach { case (lang, (nTotal, cutoff, nKept)) =>
      assert(cutoff === minTotal * 256 / nTotal, s"cutoff formula for $lang")
      if (nTotal == minTotal)
        assert(nKept === nTotal, "smallest stratum keeps every row (cutoff 256)")
      else {
        // kept fraction tracks min/total with md5-bucket binomial spread
        val expected = nTotal.toDouble * cutoff / 256
        assert(math.abs(nKept - expected) < 6 * math.sqrt(expected),
          s"$lang kept $nKept, expected ~$expected")
      }
      assert(nKept <= nTotal)
    }
    // deterministic: same decisions on re-run
    assert(DataPrep.stratifiedSample(d, "lang").collect().toSeq === rows.toSeq)
  }

  test("curriculum deciles: equal-size phases, ordered non-overlapping ranges") {
    val d = Tables.documents(spark, sf)
    val rows = DataPrep.curriculumDeciles(d).collect()
    assert(rows.map(_.getInt(0)).toSeq === (1 to 10))
    assert(rows.map(_.getLong(1)).sum === 500L)
    // ntile: bucket sizes differ by at most 1, larger buckets first
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
    assert(sizes.toSeq === sizes.sortBy(-_).toSeq)
    // difficulty ranges are non-decreasing across phases
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Int]("max_chars") <= b.getAs[Int]("min_chars"))
      case _ =>
    }
  }

  test("temperature resample: integer factors balance strata, copies fully materialized") {
    val d = Tables.documents(spark, sf)
    val rows = DataPrep.temperatureResample(d).collect()
    val byLang = rows.groupBy(_.getString(1))
    val nDocs = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMax = nDocs.values.max
    byLang.foreach { case (lang, g) =>
      val factor = math.ceil(math.sqrt(nMax.toDouble / nDocs(lang))).toInt
      assert(g.forall(_.getInt(2) == factor), s"$lang factor")
      assert(g.length === nDocs(lang) * factor, s"$lang copy count")
      // every doc carries exactly copy_idx 1..factor
      g.groupBy(_.getLong(0)).foreach { case (_, copies) =>
        assert(copies.map(_.getInt(3)).sorted.toSeq === (1 to factor))
      }
    }
    // the largest stratum is never upsampled; smaller ones are
    val maxLang = nDocs.maxBy(_._2)._1
    assert(byLang(maxLang).head.getInt(2) === 1)
    assert(byLang.exists(_._2.head.getInt(2) > 1),
      "fixture must exercise an actual upsample")
  }

  test("sequence packing: packs respect order, cover every doc, budget boundaries") {
    val d = Tables.documents(spark, sf)
    val packs = DataPrep.sequencePacking(d, tokenBudget = 500).collect()
    assert(packs.map(_.getLong(2)).sum === 500L) // every doc packed once
    // within a lang, pack ids are contiguous from 0 and doc ranges don't overlap
    packs.groupBy(_.getString(0)).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getLong(1))
      assert(sorted.head.getLong(1) === 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(1) === a.getLong(1) + 1)
          assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"))
        case _ =>
      }
    }
  }

  test("leakageSafeSplit: perturbed variants co-assign; distinct content splits independently") {
    import spark.implicits._
    val d = Seq(
      (1L, "The quick brown fox jumps over dogs", "en"),
      (2L, "the quick  brown fox jumps over dogs!", "en"), // case/ws/punct variant
      (3L, "completely different content here now", "en"))
      .map { case (id, t, l) => (id, t, l, "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = DataPrep.leakageSafeSplit(d).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows(1L) === rows(2L), "variants must share split, rep, and group size")
    assert(rows(1L)._2 === 1L && rows(1L)._3 === 2L)
    assert(rows(3L)._2 === 3L && rows(3L)._3 === 1L)
  }

  test("tokenBudgetSelect: greedy admission by priority order, hard budget") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d", 400L), // 4 tokens, highest priority (n_chars)
      (2L, "a b c", 300L),   // 3 tokens
      (3L, "a b", 200L),     // 2 tokens — would exceed budget 8
      (4L, "a", 100L))       // 1 token — cumsum already past budget
      .map { case (id, t, nc) => (id, t, "en", "src0", nc) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = DataPrep.tokenBudgetSelect(d, budget = 8L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === Seq((1L, 4L, 4L), (2L, 3L, 7L)),
      "docs admitted in priority order until the running total would pass the budget")
  }

  test("tokenBudgetBySource: each source admits against its own budget") {
    import spark.implicits._
    val d = Seq(
      // srcA: 4+3 admitted (cum 7 <= 8), 2 pushes past -> cut
      (1L, "a b c d", 400L, "srcA"),
      (2L, "a b c", 300L, "srcA"),
      (3L, "a b", 200L, "srcA"),
      // srcB: its own fresh budget — both docs fit (cum 5 <= 8)
      (4L, "x y z", 300L, "srcB"),
      (5L, "x y", 200L, "srcB"))
      .map { case (id, t, nc, s) => (id, t, "en", s, nc) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = DataPrep.tokenBudgetBySource(d, budgetPerSource = 8L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq === Seq(
      (1L, "srcA", 4L, 4L), (2L, "srcA", 3L, 7L),
      (4L, "srcB", 3L, 3L), (5L, "srcB", 2L, 5L)),
      "admission is per-source: srcB starts a fresh cumsum, srcA cuts at its cap")
  }

  test("contaminationReport agrees with the pair-level decontaminate view") {
    val docs = Tables.documents(spark, sf)
    val report = DataPrep.contaminationReport(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toMap
    // ratio arithmetic is internally consistent
    report.foreach { case (doc, (total, hit, frac, flagged)) =>
      assert(hit <= total, s"doc $doc: contaminated > total")
      assert(frac === math.rint(hit.toDouble / total * 1e6) / 1e6,
        s"doc $doc: fraction mismatch")
      assert(flagged === (frac >= 0.2), s"doc $doc: flag threshold")
    }
    // every pair the pair-level operator reports is visible here: a
    // train doc sharing n shingles with SOME eval doc has at least that
    // many contaminated shingles overall
    val pairs = DataPrep.decontaminate(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(pairs.nonEmpty, "fixture must contain leaked pairs")
    pairs.foreach { case (trainDoc, nShared) =>
      assert(report(trainDoc)._2 >= nShared,
        s"train doc $trainDoc: report misses pair-level shingles")
    }
  }

  test("two-pass twins equal the window forms (corpus + ties/skew/empty-partition beds)") {
    import spark.implicits._
    // bed 1: the real corpus; bed 2: every n_chars ties (total order only
    // via doc_id tiebreak) with one skewed token-count outlier; both run
    // with more range partitions than bed-2 rows (empty partitions)
    val corpus = Tables.documents(spark, sf)
    val ties = (1 to 40).map { i =>
      val text = if (i == 7) ("w " * 500).trim else s"t$i u$i v$i"
      (i.toLong, text, "en", "src0", 100L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    for ((bed, np) <- Seq((corpus, 0), (corpus, 7), (ties, 64))) {
      assert(DataPrep.tokenBudgetSelect(bed, 2000L, np).collect().toSeq ===
        SparkSpec.expectGlobalWindow(
          DataPrep.tokenBudgetSelectWindow(bed, 2000L).collect().toSeq),
        s"tokenBudgetSelect two-pass vs window (np=$np)")
      assert(DataPrep.negativeSamples(bed, 3, np).collect().toSeq ===
        SparkSpec.expectGlobalWindow(
          DataPrep.negativeSamplesWindow(bed, 3).collect().toSeq),
        s"negativeSamples two-pass vs window (np=$np)")
      assert(DataPrep.curriculumDeciles(bed, 10, np).collect().toSeq ===
        SparkSpec.expectGlobalWindow(
          DataPrep.curriculumDecilesWindow(bed, 10).collect().toSeq),
        s"curriculumDeciles two-pass vs window (np=$np)")
    }
    // uneven ntile split: 40 rows into 7 buckets -> first 5 buckets of 6,
    // then 5+5 (rem = 40 % 7 = 5) — pinned against the closed form
    assert(DataPrep.curriculumDeciles(ties, 7, 3).collect().map(_.getLong(1)).toSeq ===
      SparkSpec.expectGlobalWindow(
        DataPrep.curriculumDecilesWindow(ties, 7).collect().map(_.getLong(1)).toSeq))
  }

  test("negativeSamples: k non-self partners per doc, deterministic, all ids real") {
    val d = Tables.documents(spark, sf)
    val ids = d.select("doc_id").collect().map(_.getLong(0)).toSet
    val a = DataPrep.negativeSamples(d, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val b = DataPrep.negativeSamples(d, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(a.toSeq === b.toSeq, "content-addressed sampling must be rerun-stable")
    assert(a.length === ids.size * 3)
    a.foreach { case (doc, _, neg) =>
      assert(doc != neg, s"self-pair for $doc")
      assert(ids.contains(neg), s"partner $neg is not a corpus doc")
    }
    // partners are spread, not collapsed onto a few docs
    assert(a.map(_._3).distinct.length > ids.size / 4)
  }

  test("contextWindows plan: explode stays narrow, scan prunes to (doc_id, text)") {
    val d = Tables.documents(spark, sf)
    val plan = DataPrep.contextWindows(d).queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"chunking must not read lang/source/n_chars:\n$plan")
    assert("Exchange".r.findAllIn(plan).size <= 1,
      s"per-row explode + presentation sort expected:\n$plan")
  }

  test("contextWindows: stride overlap, short tails, full token coverage") {
    import spark.implicits._
    val d = Seq((1L, "t0 t1 t2 t3 t4 t5 t6", "en"), (2L, "a b", "en"))
      .map { case (id, t, l) => (id, t, l, "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = DataPrep.contextWindows(d, windowTokens = 4, stride = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    assert(rows.toSeq === Seq(
      (1L, 0, 0, 4, "t0 t1 t2 t3"),
      (1L, 1, 3, 4, "t3 t4 t5 t6"), // overlap of window - stride = 1 token
      (1L, 2, 6, 1, "t6"),          // short tail kept, not padded
      (2L, 0, 0, 2, "a b")))
  }

  test("qualityQuantileFilter: per-source top fraction with deterministic ties") {
    val d = Tables.documents(spark, sf)
    val kept = DataPrep.qualityQuantileFilter(d, keepFraction = 0.5).collect()
    val perSource = d.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptPerSource = kept.groupBy(_.getString(1)).map { case (s, g) => s -> g.length }
    keptPerSource.foreach { case (s, n) =>
      val total = perSource(s)
      // percent_rank <= 0.5 keeps floor((n-1)/2)+1 of n
      assert(n === (total - 1) / 2 + 1, s"source $s kept $n of $total")
    }
    // the floor of each source's kept set is its n_chars median or above
    val minKept = kept.groupBy(_.getString(1)).map { case (s, g) =>
      s -> g.map(_.getLong(2)).min }
    minKept.foreach { case (s, m) =>
      val all = d.filter(col("source") === s).collect().map(_.getAs[Long]("n_chars")).sorted
      assert(m >= all(all.length / 2 - 1), s"source $s kept below-median doc")
    }
  }

  test("qualityRetentionCurve: monotone retention, exact agreement with a direct filter") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val curve = DataPrep.qualityRetentionCurve(d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(curve.nonEmpty)
    // retention never increases as the cutoff rises; fractions in (0, 1]
    curve.sliding(2).foreach {
      case Array((_, d1, t1, _, _), (_, d2, t2, _, _)) =>
        assert(d2 <= d1 && t2 <= t1, "retention must be monotone non-increasing")
      case _ =>
    }
    // lowest cutoff retains the whole scored corpus
    val scored = TextOps.classifierQualityScore(d)
    assert(curve.head._2 === scored.count())
    assert(curve.head._4 === 1.0 && curve.head._5 === 1.0)
    // each row equals a direct score >= cutoff/10 filter (integer-exact
    // bucket boundary: floor(10*s) >= c  <=>  s >= c/10)
    import org.apache.spark.sql.functions._
    for ((c, nd, nt, _, _) <- curve) {
      val direct = scored.filter(floor(col("quality_score") * 10) >= c)
        .agg(count(lit(1)), coalesce(sum(col("n_tokens")), lit(0L)))
        .collect()(0)
      assert((direct.getLong(0), direct.getLong(1)) === ((nd, nt)), s"cutoff10=$c")
    }
  }
}
