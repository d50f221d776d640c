package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-dataset preparation operators (SURVEY §2.10 north star):
  * reproducible sampling, split assignment, and sequence packing — the
  * bookkeeping layer of an LLM data pipeline.
  *
  * All three are *content-addressed and deterministic*: the md5 of the
  * text decides sampling and splits, so re-running the pipeline on a
  * grown corpus keeps previous decisions stable (no RNG state, no seed
  * coordination across 1000 executors), and the same rows land in the
  * same split on any engine — which is also what makes them exactly
  * DuckDB-oracle-checkable.
  */
object DataPrep {

  /** First two hex chars of md5(text) as the 0..255 bucket. */
  private def hashBucket(c: Column): Column = substring(md5(c), 1, 2)

  /** Deterministic ~`percent`% sample: keep rows whose md5 bucket falls
    * below the cutoff. Lexicographic hex compare = numeric compare on
    * the 0..255 bucket; 25% → buckets 0x00..0x3f.
    */
  def hashSample(documents: DataFrame, cutoffHex: String = "40"): DataFrame =
    documents.filter(hashBucket(col("text")) < cutoffHex)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")

  /** Content-hash train/val/test assignment (~80/10/10 via md5 bucket
    * ranges), reported as per-(lang, split) counts. A document's split
    * never changes as the corpus grows — the property that prevents
    * eval contamination across dataset versions.
    */
  def datasetSplit(documents: DataFrame): DataFrame = {
    val b = hashBucket(col("text"))
    documents
      .withColumn("split",
        when(b < "cc", "train").when(b < "e6", "val").otherwise("test"))
      .groupBy("lang", "split").agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy("lang", "split")
  }

  /** Dataset mixture: per-source sampling rates (the "mixing weights"
    * step of corpus assembly — e.g. upsample curated sources, downsample
    * crawl), decided content-deterministically per row so the mixture is
    * reproducible. Rates are expressed as md5-bucket cutoffs (out of
    * 256). Reports kept/total per source.
    */
  def sourceMixture(documents: DataFrame,
                    cutoffs: Map[String, String] = Map.empty,
                    defaultCutoff: String = "80"): DataFrame = {
    // cutoffs are compared lexicographically against lowercase hex md5
    // buckets — an uppercase or 1-char cutoff would silently produce a
    // wrong rate, so enforce the shape loudly
    (cutoffs.values.toSeq :+ defaultCutoff).foreach { c =>
      require(c.matches("[0-9a-f]{2}"),
        s"cutoff '$c' must be 2-char lowercase hex (a 00..ff md5 bucket bound)")
    }
    val cutoff = cutoffs.foldLeft(lit(defaultCutoff)) {
      case (acc, (src, cut)) => when(col("source") === src, lit(cut)).otherwise(acc)
    }
    documents
      .withColumn("kept", hashBucket(col("text")) < cutoff)
      .groupBy("source").agg(
        count(lit(1)).as("n_total"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
      .orderBy(col("source").asc_nulls_first) // pin NULL placement (DuckDB defaults last)
  }

  /** Length histogram: document size distribution in fixed-width
    * buckets — the standard corpus profiling step before choosing
    * truncation/packing budgets.
    */
  def lengthHistogram(documents: DataFrame, bucketWidth: Int = 100): DataFrame =
    documents
      .withColumn("bucket", (expr(s"n_chars div $bucketWidth") * bucketWidth).cast("long"))
      .groupBy("bucket").agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("bucket").asc_nulls_first)

  /** Stratified (balanced) sampling: downsample every stratum to
    * approximately the size of the SMALLEST stratum — the classic
    * class-balancing step — with the keep-decision still content-
    * addressed. Each stratum's md5-bucket cutoff is derived from the
    * data (`min_total * 256 div n_total`), so the smallest stratum
    * keeps everything (cutoff 256) and larger strata thin to match.
    * Integer arithmetic end-to-end → exactly reproducible on any
    * engine; reports per-stratum totals, cutoff, and kept counts.
    * Two tiny aggregations + one broadcast join — the corpus itself
    * is scanned once.
    */
  def stratifiedSample(documents: DataFrame, strataCol: String = "lang"): DataFrame = {
    val bucket = conv(substring(md5(col("text")), 1, 2), 16, 10).cast("int")
    val counts = documents.groupBy(strataCol).agg(count(lit(1)).as("n_total"))
    val minCount = counts.agg(min(col("n_total")).as("min_total"))
    val cut = counts.crossJoin(broadcast(minCount))
      .withColumn("cutoff_bucket", expr("min_total * 256 div n_total"))
      .select(col(strataCol), col("n_total"), col("cutoff_bucket"))
    documents.join(broadcast(cut), strataCol)
      .withColumn("kept", bucket < col("cutoff_bucket"))
      .groupBy(strataCol).agg(
        max(col("n_total")).as("n_total"),
        max(col("cutoff_bucket")).as("cutoff_bucket"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
      .orderBy(strataCol)
  }

  /** Curriculum bucketing: order the corpus by a difficulty proxy
    * (document length, doc_id tiebreak → total order) and cut it into
    * `nBuckets` equal-size phases — the "easy examples first" schedule
    * of curriculum training, reported as per-phase stats.
    *
    * DEFAULT PATH is the scale-safe two-pass form: a range-partitioned
    * global ordinal ([[graft.ops.GlobalOrder]]) plus the closed-form
    * `ntile` bucket derived from (ordinal, total count) — SQL `ntile(n)`
    * over N totally-ordered rows assigns row `ord` (0-based) to bucket
    * `ord div (base+1) + 1` for the first `rem` oversized buckets and
    * `rem + (ord - rem*(base+1)) div base + 1` after, where
    * `base = N div n`, `rem = N mod n`. Identical across engines given
    * the same total order (unique tie-break), so the assignment stays
    * exactly reproducible — [[curriculumDecilesWindow]] keeps the
    * single-window form as the oracle twin (equality pinned in
    * DataPrepSpec on ties/skew/empty-partition beds).
    */
  def curriculumDeciles(documents: DataFrame, nBuckets: Int = 10,
                        numPartitions: Int = 0): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val base = documents.select(col("doc_id"), col("n_chars"))
    val ordered = graft.ops.GlobalOrder.withOrdinal(base,
      Seq(col("n_chars"), col("doc_id")), valueCol = None,
      ordName = "_ord", numPartitions = numPartitions)
    val n = ordered.totalRows
    val bucketBase = n / nBuckets
    val rem = n % nBuckets
    val pivot = rem * (bucketBase + 1)
    // max(base,1) keeps the dead else-branch division defined when
    // N < nBuckets (then pivot = N and every ord takes the first branch)
    val decile = when(col("_ord") < pivot,
        expr(s"_ord div ${bucketBase + 1}"))
      .otherwise(expr(s"$rem + (_ord - $pivot) div ${math.max(bucketBase, 1L)}"))
      .cast("int") + 1
    ordered.df
      .withColumn("decile", decile)
      .groupBy("decile").agg(
        count(lit(1)).as("n_docs"),
        min(col("n_chars")).cast("int").as("min_chars"),
        max(col("n_chars")).cast("int").as("max_chars"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"))
      .orderBy("decile")
  }

  /** Single-global-window `ntile` form of [[curriculumDeciles]] — the
    * oracle shape (one serial sort; don't use at scale).
    */
  def curriculumDecilesWindow(documents: DataFrame, nBuckets: Int = 10): DataFrame = {
    val w = Window.orderBy(col("n_chars"), col("doc_id"))
    documents
      .withColumn("decile", ntile(nBuckets).over(w))
      .groupBy("decile").agg(
        count(lit(1)).as("n_docs"),
        min(col("n_chars")).cast("int").as("min_chars"),
        max(col("n_chars")).cast("int").as("max_chars"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"))
      .orderBy("decile")
  }

  /** Temperature-scaled mixture resampling: upsample under-represented
    * strata by an integer repeat factor `ceil((n_max/n_s)^(1/T))` — the
    * multinomial temperature trick of multilingual corpus assembly
    * (T → ∞ keeps natural proportions, T = 1 fully balances), made
    * deterministic by materializing whole copies instead of sampling.
    * Emits one row per (document, copy). Two tiny aggregations decide
    * the factors (broadcast back); the fan-out is `explode(sequence)` —
    * a single scan of the corpus, no shuffle of document content.
    *
    * The default T = 2 uses `sqrt`, which IEEE 754 requires to be
    * correctly rounded → the factor is engine-exact (oracle-checked).
    * Other temperatures go through `pow`, whose last-ulp behavior is
    * libm-specific — same pipeline, but don't expect cross-engine
    * bit-equality of the boundary cases.
    */
  def temperatureResample(documents: DataFrame, strataCol: String = "lang",
                          temperature: Double = 2.0): DataFrame = {
    val counts = documents.groupBy(strataCol).agg(count(lit(1)).as("n_total"))
    val nMax = counts.agg(max(col("n_total")).as("n_max"))
    val ratio = col("n_max").cast("double") / col("n_total").cast("double")
    val scaled = if (temperature == 2.0) sqrt(ratio)
      else pow(ratio, lit(1.0 / temperature))
    val factors = counts.crossJoin(broadcast(nMax))
      .select(col(strataCol), ceil(scaled).cast("int").as("factor"))
    documents.join(broadcast(factors), strataCol)
      .select(col("doc_id"), col(strataCol), col("factor"),
        explode(sequence(lit(1), col("factor"))).as("copy_idx"))
      .orderBy("doc_id", "copy_idx")
  }

  /** Decontamination: detect evaluation documents leaking into the
    * training split via shared word-k-grams — the cross-split variant of
    * n-gram near-dup detection (same shuffle-on-shingle shape; the join
    * is blocked by split so only train×eval pairs are generated). A
    * real pipeline drops or rewrites the flagged training docs; here the
    * operator reports (train_doc, eval_doc, n_shared) pairs.
    */
  def decontaminate(documents: DataFrame, k: Int = 5, minShared: Int = 3): DataFrame = {
    val withSplit = documents.withColumn("split",
      when(hashBucket(col("text")) < "cc", "train").otherwise("eval"))
    // split carried through the shingle explode (no doc_id self-join);
    // NOT cached — each side's recompute is one fused explode stage,
    // cheaper than a columnar cache build (measured at sf0.1)
    val sh = Dedup.shingles(withSplit, k, carry = Seq("split"))
    val train = sh.filter(col("split") === "train")
      .select(col("doc_id").as("train_doc"), col("shingle"))
    val eval_ = sh.filter(col("split") === "eval")
      .select(col("doc_id").as("eval_doc"), col("shingle"))
    train.join(eval_, "shingle")
      .groupBy("train_doc", "eval_doc")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy("train_doc", "eval_doc")
  }

  /** Per-document contamination REPORT — the graded companion of
    * [[decontaminate]]'s pair listing: for every training document,
    * what fraction of its distinct word-k-grams also appear anywhere
    * in the eval split. Pipelines threshold on this fraction (drop,
    * down-weight, or audit) rather than on raw pair counts, because
    * the fraction is length-invariant.
    *
    * Shape at scale: the eval shingle set is tiny next to the train
    * corpus (eval splits are), so the left join marks train shingles
    * against a broadcast-able distinct set — no train-side blowup, one
    * agg keyed by train doc with map-side combine. The
    * [[decontaminateBloom]] pre-shuffle prune composes with this
    * identically if the eval set outgrows broadcast.
    */
  def contaminationReport(documents: DataFrame, k: Int = 5,
                          flagFraction: Double = 0.2): DataFrame = {
    val withSplit = documents.withColumn("split",
      when(hashBucket(col("text")) < "cc", "train").otherwise("eval"))
    val sh = Dedup.shingles(withSplit, k, carry = Seq("split"))
    val train = sh.filter(col("split") === "train")
      .select(col("doc_id").as("train_doc"), col("shingle"))
    val evalSet = sh.filter(col("split") === "eval")
      .select("shingle").distinct().withColumn("hit", lit(1))
    train.join(evalSet, Seq("shingle"), "left")
      .groupBy("train_doc").agg(
        count(lit(1)).as("n_shingles"),
        count(col("hit")).as("n_contaminated"))
      .withColumn("contamination",
        round(col("n_contaminated") / col("n_shingles"), 6))
      .withColumn("flagged", col("contamination") >= flagFraction)
      .orderBy("train_doc")
  }

  /** Bloom-pre-filtered decontamination — the 100 TB shape of
    * [[decontaminate]]. The eval split's shingles are tiny next to the
    * training corpus, so build a Bloom filter over them and drop
    * non-matching train shingles BEFORE the shuffle — the train shingle
    * table shrinks by the filter's selectivity before any exchange.
    * False positives only admit extra candidates into the exact
    * equi-join, so the output is identical to the exact form
    * (equivalence-tested in DataPrepSpec).
    *
    * The filter stays fully inside Catalyst: the bloom is built by
    * Spark's own `BloomFilterAggregate` (distributed aggregation,
    * delivered to the probe side as a scalar subquery — the bit array
    * never transits user code) and probed by `BloomFilterMightContain`
    * over `xxhash64(shingle)` — the same expression pair Spark's
    * runtime-filter optimization injects, so the probe is codegen'd
    * instead of the per-row Scala UDF this used (the last hot-path
    * codegen barrier in the repo; plan pinned UDF-free in DataPrepSpec).
    */
  def decontaminateBloom(documents: DataFrame, k: Int = 5, minShared: Int = 3,
                         fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val withSplit = documents.withColumn("split",
      when(hashBucket(col("text")) < "cc", "train").otherwise("eval"))
    // pinned: consumed by the eval count, the bloom-build subquery, and
    // both sides of the exact join — unpersisted, each pass re-shingles
    val sh = Dedup.shingles(withSplit, k, carry = Seq("split")).persist()
    val eval_ = sh.filter(col("split") === "eval")
      .select(col("doc_id").as("eval_doc"), col("shingle"))
    val evalShingles = eval_.select("shingle").distinct()
    val expected = evalShingles.count()
    val train0 = sh.filter(col("split") === "train")
    // an empty eval side makes the join empty anyway — skip the filter
    // (BloomFilterAggregate requires a positive item estimate)
    val train = (if (expected == 0) train0
      else {
        // bits for the target fpp at `expected` items (the standard
        // -n·ln(p)/ln(2)² sizing), clamped to Spark's runtime-filter cap.
        // estimatedNumItems must respect its own cap too: Spark rejects
        // values above maxNumItems (default 4M) with an AnalysisException,
        // and an eval split with >4M distinct shingles is exactly the
        // regime this path exists for. When either clamp engages the
        // effective fpp rises above the requested one — which only
        // admits more rows into the exact equi-join below, never changes
        // the result.
        val conf = documents.sparkSession.conf
        val maxBits = conf
          .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
        val maxItems = conf
          .get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
        val estItems = math.min(maxItems, expected)
        val numBits = math.min(maxBits, math.max(64L,
          math.ceil(-expected * math.log(fpp) / (math.log(2) * math.log(2))).toLong))
        val bloomAgg = GraftBridge.column(
          new BloomFilterAggregate(
            GraftBridge.expression(xxhash64(col("shingle"))),
            Literal(estItems), Literal(numBits)).toAggregateExpression())
        val bloom = evalShingles.select(bloomAgg.as("bf")).scalar()
        val mightMatch = GraftBridge.column(BloomFilterMightContain(
          GraftBridge.expression(bloom),
          GraftBridge.expression(xxhash64(col("shingle")))))
        train0.filter(mightMatch) // map-side prune, pre-shuffle, codegen'd
      })
      .select(col("doc_id").as("train_doc"), col("shingle"))
    val result = train.join(eval_, "shingle")
      .groupBy("train_doc", "eval_doc")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy("train_doc", "eval_doc")
    Dedup.scopeCaches(result, sh)
  }

  /** Sequence packing: fill fixed token budgets (context windows) with
    * documents in deterministic (lang, doc_id) order — pack id = running
    * token total `div` budget. One window cumsum per lang partition; at
    * corpus scale this shuffles once on the partition key, and packs are
    * reproducible because the order is content-independent and total
    * preceding size decides the boundary.
    */
  def sequencePacking(documents: DataFrame, tokenBudget: Int = 2048): DataFrame = {
    val tokens = size(split(col("text"), " "))
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    documents
      .withColumn("n_tokens", tokens)
      .withColumn("tokens_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"tokens_before div $tokenBudget"))
      .groupBy("lang", "pack_id").agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("pack_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("lang", "pack_id")
  }

  /** Deterministic negative sampling — the contrastive-training prep
    * step (k pseudo-random non-self partners per document) without any
    * RNG state: the partner ordinal is an md5-derived 32-bit integer of
    * (doc_id, sample_idx) modulo the corpus size, shifted off self.
    * Content-addressed like the split/sample family, so re-runs and
    * both engines agree row-for-row. Ordinals come from a ranking of
    * doc_ids (no density assumption); DEFAULT PATH is the two-pass
    * range-partitioned rank ([[graft.ops.GlobalOrder]] — no
    * single-reducer window), with [[negativeSamplesWindow]] keeping the
    * global `row_number` form as the oracle twin (equality pinned in
    * DataPrepSpec).
    */
  def negativeSamples(documents: DataFrame, k: Int = 3,
                      numPartitions: Int = 0): DataFrame = {
    val ordered = graft.ops.GlobalOrder.withOrdinal(
      documents.select(col("doc_id")), Seq(col("doc_id")),
      valueCol = None, ordName = "ord", numPartitions = numPartitions)
    val ids = ordered.df
    // the corpus size is a by-product of the ordinal's first pass —
    // a bounded driver scalar, not an extra aggregation job
    val nDocs = ordered.totalRows
    negativeSamplesFromIds(ids, nDocs, k)
  }

  /** Global-window `row_number` form of [[negativeSamples]] — the
    * oracle shape (one serial sort; don't use at scale).
    */
  def negativeSamplesWindow(documents: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.orderBy(col("doc_id"))
    val ids = documents.select(col("doc_id"))
      .withColumn("ord", row_number().over(w).cast("long") - 1)
    val n = ids.count()
    negativeSamplesFromIds(ids, n, k)
  }

  /** Shared tail of both [[negativeSamples]] forms: md5-derived partner
    * ordinal modulo corpus size, shifted off self, joined back to ids.
    */
  private def negativeSamplesFromIds(ids: DataFrame, nDocs: Long, k: Int): DataFrame = {
    val h = (i: Column) => conv(
      substring(md5(concat(col("doc_id").cast("string"), lit(":"), i.cast("string"))), 1, 8),
      16, 10).cast("long")
    // nDocs == 0 is safe: pmod's zero divisor is never evaluated on an
    // empty frame, so the empty result flows through the normal plan
    val raw = ids
      .select(col("doc_id"), col("ord"),
        explode(sequence(lit(0), lit(k - 1))).as("sample_idx"))
      .withColumn("neg_ord", pmod(h(col("sample_idx")), lit(nDocs)))
      .withColumn("neg_ord",
        when(col("neg_ord") === col("ord"),
          pmod(col("neg_ord") + 1, lit(nDocs))).otherwise(col("neg_ord")))
    raw.join(ids.select(col("ord").as("neg_ord"), col("doc_id").as("neg_doc_id")),
        "neg_ord")
      .select(col("doc_id"), col("sample_idx"), col("neg_doc_id"))
      .orderBy("doc_id", "sample_idx")
  }

  /** Fixed-stride context windows: slide a `windowTokens`-wide window
    * over each document's tokens at `stride` (the chunking step that
    * feeds embedding models and RAG indexes; stride < window gives the
    * standard overlap). Pure per-row explode — narrow, scan-speed, no
    * shuffle until the presentation sort; trailing windows are shorter
    * (never dropped, never padded), and every token of every doc is
    * covered by construction.
    */
  def contextWindows(documents: DataFrame, windowTokens: Int = 64,
                     stride: Int = 32): DataFrame = {
    require(windowTokens > 0 && stride > 0, "window and stride must be positive")
    val toks = split(col("text"), " ")
    documents
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - 1, lit(stride))).as("start"))
      .select(
        col("doc_id"),
        (col("start") / stride).cast("int").as("window_idx"),
        col("start"),
        size(slice(col("toks"), col("start") + 1, lit(windowTokens))).as("n_tokens"),
        concat_ws(" ", slice(col("toks"), col("start") + 1, lit(windowTokens)))
          .as("window_text"))
      .orderBy("doc_id", "window_idx")
  }

  /** Leakage-safe split assignment: trivially-perturbed variants of the
    * same content (case, punctuation, run-on whitespace) must never
    * straddle train/test, so the split hash is taken over a NORMALIZED
    * canonical form instead of the raw text — the cheap tier of
    * fuzzy-dedup-aware splitting (near-dup clusters are the expensive
    * tier; see [[Dedup.dedupClusters]]). Emits each doc with its split,
    * the variant-group representative, and the group size; same
    * one-shuffle shape as exact dedup (hash agg on the canonical key,
    * join back pruned to two columns).
    */
  def leakageSafeSplit(documents: DataFrame): DataFrame = {
    val norm = regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " ")
    // group and join on md5(canon), not the canonical text itself: the
    // shuffle key is 32 hex chars instead of the whole document, and the
    // split bucket reads off the same digest for free
    val keyed = documents.select(col("doc_id"), md5(norm).as("ckey"))
    val groups = keyed.groupBy("ckey").agg(
      min(col("doc_id")).as("group_rep"),
      count(lit(1)).as("n_variants"))
    val b = substring(col("ckey"), 1, 2)
    keyed.join(groups, "ckey")
      .withColumn("split",
        when(b < "cc", "train").when(b < "e6", "val").otherwise("test"))
      .select("doc_id", "split", "group_rep", "n_variants")
      .orderBy("doc_id")
  }

  /** Token-budget selection: greedily admit documents in priority order
    * (quality proxy descending, doc_id tie-break) until the running
    * token total exceeds `budget` — the "fill the training-run budget
    * with the best data first" curation step. The window order is
    * total (unique tie-break) so admission is deterministic on any
    * engine.
    *
    * DEFAULT PATH is the two-pass range-partitioned cumulative sum
    * ([[graft.ops.GlobalOrder]]): one parallel range shuffle, per-range
    * local running totals, broadcast prefix offsets — no single-reducer
    * window. The token count is projected BEFORE the shuffle, so only
    * (doc_id, n_chars, n_tokens) moves, not the text.
    * [[tokenBudgetSelectWindow]] keeps the global-window form as the
    * oracle twin (equality pinned in DataPrepSpec).
    */
  def tokenBudgetSelect(documents: DataFrame, budget: Long = 20000L,
                        numPartitions: Int = 0): DataFrame = {
    val base = documents.select(col("doc_id"), col("n_chars"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val ordered = graft.ops.GlobalOrder.withOrdinal(base,
      Seq(col("n_chars").desc, col("doc_id")), valueCol = Some("n_tokens"),
      ordName = "_ord", cumName = "cum_tokens", numPartitions = numPartitions)
    ordered.df
      .filter(col("cum_tokens") <= budget)
      .select("doc_id", "n_tokens", "cum_tokens")
      .orderBy("doc_id")
  }

  /** Per-source token-budget admission — the source-balanced variant
    * of [[tokenBudgetSelect]] (build a mixture by giving every source
    * the same token allowance, best documents first, instead of one
    * global budget the largest source would swallow). Within each
    * source, docs are admitted in (n_chars desc, doc_id) order while
    * the source-local cumulative token count stays within budget.
    *
    * The window is PARTITIONED by source, so it spreads across tasks —
    * the scale regime for this operator is many sources (domain-level
    * mixtures: thousands to millions of keys), where a partitioned
    * window is the right Spark shape. For the few-giant-sources regime
    * (a handful of 25 TB sources), run [[tokenBudgetSelect]] per
    * source filter instead: its two-pass exchange is the shape that
    * survives a single source exceeding one task.
    */
  def tokenBudgetBySource(documents: DataFrame,
                          budgetPerSource: Long = 800L): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budgetPerSource)
      .select("doc_id", "source", "n_tokens", "cum_tokens")
      .orderBy("doc_id")
  }

  /** Single-global-window cumsum form of [[tokenBudgetSelect]] — the
    * oracle shape (one serial sort; don't use at scale).
    */
  def tokenBudgetSelectWindow(documents: DataFrame, budget: Long = 20000L): DataFrame = {
    val tokens = size(split(col("text"), " ")).cast("long")
    val w = Window.orderBy(col("n_chars").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents
      .withColumn("n_tokens", tokens)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .select("doc_id", "n_tokens", "cum_tokens")
      .orderBy("doc_id")
  }

  /** Per-source quality quantile gate: keep each source's top
    * `keepFraction` of documents by a quality proxy (percent_rank over
    * a totally-ordered window — unique tie-break, so membership is
    * deterministic and engine-exact). The per-source window shuffles
    * once on the source key; this is the "per-domain quality floor"
    * step crawl pipelines apply before mixing sources.
    */
  def qualityQuantileFilter(documents: DataFrame,
                            keepFraction: Double = 0.5): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    documents
      .withColumn("pr", percent_rank().over(w))
      .filter(col("pr") <= keepFraction)
      .select(col("doc_id"), col("source"), col("n_chars"),
        round(col("pr"), 6).as("quality_rank"))
      .orderBy("doc_id")
  }

  /** Quality-cutoff retention curve: for each 0.1-wide step of the
    * classifier quality score ([[TextOps.classifierQualityScore]],
    * range [-1, 1]), how many documents and tokens survive a
    * `score >= cutoff` filter, as counts and corpus fractions — the
    * knob-tuner that turns "pick a quality threshold" into a measured
    * trade-off (the filtering twin of [[graft.ext.Dedup.lshRecallCurve]]).
    *
    * `cutoff10` = ⌊10·score⌋, so the row at value c is retention at
    * cutoff c/10 exactly (`score >= c/10 ⇔ ⌊10·score⌋ >= c` for
    * integer c — no float boundary ambiguity, and the bucketing
    * arithmetic is the same IEEE double in any engine).
    *
    * Scale shape: ONE hash aggregation over the scored corpus into at
    * most 21 bucket rows (the score range [-1, 1] bounds ⌊10·score⌋ to
    * [-10, 10]); the cumulative sums then run on the DRIVER over that
    * constant-size result. The earlier partition-less-window form was
    * equally bounded but still planned a WindowExec with its
    * single-partition WARN on every run — over ≤21 rows, a driver fold
    * is the honest shape (exact long arithmetic, order-independent, no
    * window machinery). The collect is bounded by CONSTRUCTION, not by
    * data: 21 rows whatever the corpus size.
    */
  def qualityRetentionCurve(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    val scored = TextOps.classifierQualityScore(documents)
    val buckets = scored
      .groupBy(floor(col("quality_score") * 10).cast("int").as("cutoff10"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_toks"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(-_._1)
    var d = 0L; var t = 0L
    val cum = buckets.map { case (c, nd, nt) =>
      d += nd; t += nt; (c, d, t)
    }
    val (totalD, totalT) = (d, t)
    import spark.implicits._
    cum.toSeq.toDF("cutoff10", "docs_retained", "tokens_retained")
      .select(col("cutoff10"), col("docs_retained"), col("tokens_retained"),
        round(col("docs_retained").cast("double") / lit(totalD), 6)
          .as("doc_fraction"),
        round(col("tokens_retained").cast("double") / lit(totalT), 6)
          .as("token_fraction"))
      .orderBy("cutoff10")
  }
}
