package graft.props

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck property suites (run by sbt's native ScalaCheck support):
  * randomized equivalence between independent implementations — the
  * strongest cheap evidence that the custom operators preserve
  * semantics on inputs nobody hand-picked.
  */
object TopKProperties extends Properties("TopKPerKey") with SparkSpec {

  val rowsGen: Gen[List[(Long, Long, Double)]] = for {
    n <- Gen.chooseNum(0, 60)
    rows <- Gen.listOfN(n, for {
      k <- Gen.chooseNum(0L, 5L)     // few keys → collisions guaranteed
      id <- Gen.chooseNum(0L, 1000L)
      s <- Gen.chooseNum(0, 20).map(_.toDouble) // coarse scores → ties
    } yield (k, id, s))
  } yield rows.distinctBy(r => (r._1, r._2)) // unique tie-break per key

  property("equals window row_number form on random data") =
    forAll(rowsGen, Gen.chooseNum(1, 5)) { (rows, k) =>
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val df = rows.toDF("key", "id", "score")
      val custom = graft.plans.TopKPerKey(df, Seq("key"), "score", "id", k)
        .select("key", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val w = Window.partitionBy(col("key")).orderBy(col("score").desc, col("id"))
      val windowed = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .select("key", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      Prop(custom == windowed) :| s"custom=$custom window=$windowed"
    }
}

object TextProperties extends Properties("TextOps") with SparkSpec {

  // printable-ASCII word soup with a tiny vocabulary → repeats guaranteed
  val textGen: Gen[String] = Gen.listOf(
    Gen.oneOf("alpha", "beta", "gamma", "x1!", "y?")).map(_.mkString(" "))

  property("rollingHash equals the Rabin-Karp reference fold") =
    forAll(Gen.listOf(textGen)) { texts =>
      import spark.implicits._
      val df = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      def ref(s: String): Long =
        s.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toLong) % 1000000007L)
      val got = graft.ext.TextOps.rollingHash(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      Prop(texts.zipWithIndex.forall { case (t, i) => got(i.toLong) == ref(t) })
    }

  property("repetitionRatio is in [0,1], NULL iff fewer than n tokens") =
    forAll(Gen.listOf(textGen)) { texts =>
      import spark.implicits._
      val df = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val rows = graft.ext.TextOps.repetitionRatio(df).collect()
      Prop(rows.forall { r =>
        val nTokens = r.getInt(1); val nGrams = r.getInt(2)
        val isNull = r.isNullAt(r.fieldIndex("dup_ratio"))
        val bounds = isNull || {
          val v = r.getDouble(r.fieldIndex("dup_ratio")); v >= 0.0 && v <= 1.0
        }
        val nullRule = isNull == (nTokens < 3) && (nGrams == 0) == (nTokens < 3)
        bounds && nullRule
      })
    }
}

object ScdProperties extends Properties("Scd") with SparkSpec {

  // small key space so updates collide with current rows often
  val dimGen: Gen[List[(Long, String)]] =
    Gen.listOf(Gen.zip(Gen.chooseNum(1L, 8L), Gen.oneOf("A", "B", "C")))
      .map(_.distinctBy(_._1))

  property("exactly one open row per surviving key; tracked values come from updates") =
    forAll(dimGen, dimGen) { (cur, upd) =>
      import spark.implicits._
      val current = cur.map { case (k, s) => (k, s, "1992-01-01", null.asInstanceOf[String]) }
        .toDF("k", "segment", "valid_from", "valid_to")
      val updates = upd.toDF("k", "segment")
      val out = graft.ops.Scd.scd2Merge(current, updates, "k", Seq("segment"), "1998-01-01")
        .collect()
      val openByKey = out.filter(_.isNullAt(3))
        .groupBy(_.getLong(0)).view.mapValues(_.toList).toMap
      val curMap = cur.toMap
      val updMap = upd.toMap
      val allKeys = curMap.keySet ++ updMap.keySet
      Prop(allKeys.forall { k =>
        openByKey.get(k).exists(_.length == 1) && {
          // the open row carries the update's value when one exists,
          // else the current value
          val seg = openByKey(k).head.getString(1)
          seg == updMap.getOrElse(k, curMap(k))
        }
      }) :| "one open row per key with the freshest value" &&
      Prop(out.count(!_.isNullAt(3)) ==
        cur.count { case (k, s) => updMap.get(k).exists(_ != s) }
      ) :| "closed rows = changed keys exactly"
    }

  property("funnel stage counts are monotonically non-increasing") =
    forAll(Gen.listOf(Gen.zip(Gen.chooseNum(1L, 6L),
      Gen.chooseNum(0, 5000), Gen.oneOf("view", "click", "purchase")))) { evs =>
      import spark.implicits._
      val df = evs.zipWithIndex.map { case ((u, off, tpe), i) =>
        (i.toLong, new java.sql.Timestamp(1700000000000L + off * 1000L), u, tpe, 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val counts = graft.ext.Events.funnel(df).collect()
        .sortBy(_.getInt(0)).map(_.getLong(2))
      Prop(counts.sliding(2).forall {
        case Array(a, b) => b <= a
        case _ => true
      })
    }
}

object DateProperties extends Properties("Dates") with SparkSpec {

  property("builtin and UDF SAS-date forms agree incl. null/zero") =
    forAll(Gen.listOf(Gen.oneOf(Gen.const(null: Integer),
      Gen.chooseNum(0, 50000).map(Int.box)))) { days =>
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val df = days.map(Tuple1(_)).toDF("d")
      val b = df.select(graft.ops.Dates.sasDaysToIso(col("d"))).collect().map(_.getString(0))
      val u = df.select(graft.ops.Dates.sasDaysToIsoUdf(col("d"))).collect().map(_.getString(0))
      Prop(b.sameElements(u))
    }

  property("decimal-exact sums are partition-layout invariant") =
    forAll(Gen.listOf(Gen.chooseNum(-100000, 100000).map(_ / 100.0)),
      Gen.chooseNum(1, 16)) { (xs, parts) =>
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val df = xs.toDF("x")
      def total(d: org.apache.spark.sql.DataFrame): Option[java.math.BigDecimal] =
        Option(d.agg(sum(col("x").cast("decimal(18,2)"))).collect()(0)
          .getDecimal(0))
      Prop(total(df) == total(df.repartition(parts)))
    }
}

object KmvProperties extends Properties("KmvSketch") {
  import java.util.{TreeMap => JTreeMap}
  import graft.functions.KmvTestHooks

  val keysGen: Gen[List[Long]] = Gen.listOf(Gen.chooseNum(-1000L, 1000L))

  /** Offer a stream into a fresh buffer. */
  private def sketch(k: Int, vs: Seq[Long]): JTreeMap[Long, Long] = {
    val m = new JTreeMap[Long, Long]()
    vs.foreach(v => KmvTestHooks.offer(m, k, v))
    m
  }

  property("any partitioning of the input merges to the single-pass sketch") =
    forAll(keysGen, Gen.chooseNum(2, 32), Gen.chooseNum(1, 8)) { (vs, k, parts) =>
      val whole = sketch(k, vs)
      val merged = new JTreeMap[Long, Long]()
      vs.grouped(math.max(1, vs.size / parts + 1)).foreach { chunk =>
        KmvTestHooks.mergeInto(merged, k, sketch(k, chunk))
      }
      Prop(merged == whole) :| s"merged=$merged whole=$whole"
    }

  property("estimate is exact below k and never negative") =
    forAll(keysGen, Gen.chooseNum(2, 64)) { (vs, k) =>
      val m = sketch(k, vs)
      val est = KmvTestHooks.estimate(m, k)
      val distinct = vs.distinct.size
      if (distinct < k) Prop(est == distinct.toLong)
      else Prop(est >= 0L)
    }
}

object WinnowProperties extends Properties("WinnowFps") {

  // mixed-script text incl. supplementary (emoji) code points — the
  // bed where a UTF-16 char walk would slice grams wrong
  val textGen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)),
    Gen.oneOf("日本", "語", "😀", "naïve", "ß", ""))).map(_.mkString)

  /** Naive reference: materialize every gram string, hash it the way
    * md5HashLong does (hex-string arithmetic, independently coded), take
    * each window's min by scanning, distinct + sort. No deques, no bit
    * tricks — a different implementation of the same definition.
    */
  def reference(s: String, k: Int, w: Int): Seq[Long] = {
    val cps = s.codePoints().toArray
    val grams = (0 to cps.length - k).map(i => new String(cps, i, k))
    if (grams.length < w) return Seq.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = grams.map { g =>
      val hex = md.digest((g + "\u0001" + "0").getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    hs.sliding(w).map(_.min).toSeq.distinct.sorted
  }

  property("kernel equals the naive gram/window reference on random unicode") =
    forAll(textGen, Gen.chooseNum(1, 6), Gen.chooseNum(1, 6)) { (s, k, w) =>
      val got = {
        val arr = graft.functions.WinnowFps.fingerprints(
          org.apache.spark.unsafe.types.UTF8String.fromString(s), k, w)
        (0 until arr.numElements()).map(arr.getLong(_))
      }
      val want = reference(s, k, w)
      Prop(got == want) :| s"k=$k w=$w text=${s.take(40)} got=$got want=$want"
    }
}

object ClusterCollapseProperties extends Properties("ClusterCollapse") with SparkSpec {

  // few distinct hash VALUES close together in Hamming space →
  // identical-fingerprint groups AND cross-group near-dup edges both
  // occur; random ids → the min-label arithmetic is exercised
  val fpGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(0, 40)
    rows <- Gen.listOfN(n, for {
      id <- Gen.chooseNum(0L, 500L)
      base <- Gen.oneOf(0L, 7L, 1L << 20, (1L << 40) + 5L)
      flips <- Gen.chooseNum(0, 2)
      bits <- Gen.listOfN(flips, Gen.chooseNum(0, 62))
    } yield (id, bits.foldLeft(base)((h, b) => h ^ (1L << b))))
  } yield rows.distinctBy(_._1)

  /** plain union-find over ALL pairs with Hamming ≤ t — the O(n²)
    * reference the collapsed banding core must equal
    */
  private def reference(rows: List[(Long, Long)], t: Int): Set[(Long, Long, Long)] = {
    val ids = rows.map(_._1)
    val parent = scala.collection.mutable.HashMap(ids.map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else {
      val r = find(parent(x)); parent(x) = r; r
    }
    for {
      (a, ha) <- rows; (b, hb) <- rows
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= t
    } { val ra = find(a); val rb = find(b); if (ra != rb) parent(ra) = rb }
    val comp = ids.groupBy(find)
    comp.values.filter(_.size > 1).flatMap { members =>
      val label = members.min
      members.map(m => (m, label, members.size.toLong))
    }.toSet
  }

  property("collapsed banded clusters equal brute-force union-find") =
    forAll(fpGen, Gen.chooseNum(0, 6)) { (rows, t) =>
      import spark.implicits._
      val fp = rows.toDF("doc_id", "dhash")
      val got = graft.ext.Multimodal
        .imageClustersFromHashes(fp, maxHamming = t, maxBandBucket = 0)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = reference(rows, t)
      Prop(got == want) :| s"t=$t got=$got want=$want"
    }
}

object IncrementalPairProperties extends Properties("IncrementalPairs")
    with SparkSpec {

  // the ClusterCollapse generator's hash shape (few bases, 0-2 bit
  // flips → identical groups AND near-dup neighbors), plus a random
  // stored/new split per doc — so cross, new/new, AND stored/stored
  // candidates all occur in the same bucket
  val rowsGen: Gen[List[(Long, Long, Boolean)]] = for {
    n <- Gen.chooseNum(0, 40)
    rows <- Gen.listOfN(n, for {
      id <- Gen.chooseNum(0L, 500L)
      base <- Gen.oneOf(0L, 7L, 1L << 20, (1L << 40) + 5L)
      flips <- Gen.chooseNum(0, 2)
      bits <- Gen.listOfN(flips, Gen.chooseNum(0, 62))
      isNew <- Gen.oneOf(true, false)
    } yield (id, bits.foldLeft(base)((h, b) => h ^ (1L << b)), isNew))
  } yield rows.distinctBy(_._1)

  /** brute force: every a<b pair with Hamming ≤ t and ≥ 1 new side —
    * the contract the NEW×ALL banded enumeration must reproduce
    * exactly (stored×stored pairs excluded, new/new deduplicated)
    */
  private def reference(rows: List[(Long, Long, Boolean)],
                        t: Int): Set[(Long, Long, Int, Boolean)] =
    (for {
      (a, ha, na) <- rows; (b, hb, nb) <- rows
      if a < b && (na || nb) &&
        java.lang.Long.bitCount(ha ^ hb) <= t
    } yield (a, b, java.lang.Long.bitCount(ha ^ hb), na != nb)).toSet

  property("NEW×ALL banded incremental pairs equal brute force") =
    forAll(rowsGen, Gen.chooseNum(0, 6)) { (rows, t) =>
      import spark.implicits._
      val newFp = rows.filter(_._3).map(r => (r._1, r._2)).toDF("doc_id", "dhash")
      val storedFp = rows.filterNot(_._3).map(r => (r._1, r._2)).toDF("doc_id", "dhash")
      val res = graft.ext.Dedup.bandedHammingPairsIncremental(
        newFp, storedFp, "dhash", 63, t, maxBandBucket = 0)
      val got = res.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getBoolean(3))).toSet
      res.unpersist(false)
      val want = reference(rows, t)
      Prop(got == want) :| s"t=$t got=$got want=$want"
    }
}

/** Seed-code IVF assignment vs an independent driver reference: the
  * int8 quantization, the integer-dot cosine, and the
  * sim-DESC-then-lowest-id tie rule re-implemented from the spec, on
  * corpora nobody hand-picked — duplicate vectors force exact ties,
  * zero vectors force the degenerate path, power-of-two scalings force
  * identical codes across distinct vectors.
  */
object IvfAssignProperties extends Properties("IvfAssign") with SparkSpec {

  val corpusGen: Gen[List[(Long, Seq[Float])]] = for {
    dim <- Gen.chooseNum(3, 6)
    n <- Gen.chooseNum(2, 24)
    base <- Gen.listOfN(n, Gen.listOfN(dim,
      Gen.oneOf(-2f, -1f, -0.5f, 0f, 0.5f, 1f, 2f)))
    // duplicates + ×2 scalings: tie and identical-code pressure
    dups <- Gen.someOf(base)
  } yield (base ++ dups.map(_.map(_ * 2f))).zipWithIndex
    .map { case (v, i) => (i.toLong, v: Seq[Float]) }

  private def quant(v: Seq[Float]): Array[Int] = {
    val d = v.map(_.toDouble)
    val mx = d.map(math.abs).max
    if (mx.isNaN || mx == 0) Array.fill(v.size)(0)
    else { val s = mx / 127.0; d.map(x => math.floor(x / s + 0.5).toInt).toArray }
  }

  property("assignment equals a driver re-implementation of the spec") =
    forAll(corpusGen, Gen.chooseNum(1, 5)) { (rows, nList) =>
      import spark.implicits._
      val anyGood = rows.exists(r => quant(r._2).exists(_ != 0))
      if (!anyGood) Prop.passed else {
        val df = rows.toDF("vec_id", "embedding")
        val cents = graft.ext.Similarity.ivfSeedCentroids(df, nList)
        val seeds = cents.select("centroid_id", "cv", "csq").collect()
          .map(r => (r.getInt(0), r.getSeq[Int](1).toArray, r.getLong(2)))
          .sortBy(_._1)
        val got = graft.ext.Similarity.ivfIndexAssign(df, cents)
          .select("vec_id", "centroid_id").collect()
          .map(r => r.getLong(0) -> r.getInt(1)).toMap
        val want = rows.flatMap { case (id, v) =>
          val qv = quant(v)
          val qsq = qv.map(x => x.toLong * x).sum
          if (qsq == 0) None
          else {
            val best = seeds.map { case (cid, cv, csq) =>
              val dot = qv.zip(cv).map { case (a, b) => a.toLong * b }.sum
              (dot.toDouble / math.sqrt(qsq.toDouble * csq.toDouble), cid)
            }.maxBy { case (s, cid) => (s, -cid) }
            Some(id -> best._2)
          }
        }.toMap
        Prop(got == want) :| s"nList=$nList got=$got want=$want"
      }
    }

  property("assignment is stateless: union splits freely across batches") =
    forAll(corpusGen) { rows =>
      import spark.implicits._
      val anyGood = rows.exists(r => quant(r._2).exists(_ != 0))
      if (!anyGood) Prop.passed else {
        val df = rows.toDF("vec_id", "embedding")
        val cents = graft.ext.Similarity.ivfSeedCentroids(df)
        def asg(d: org.apache.spark.sql.DataFrame) =
          graft.ext.Similarity.ivfIndexAssign(d, cents)
            .select("vec_id", "centroid_id", "centroid_sim")
            .collect().map(_.toSeq).toSet
        val (a, b) = rows.partition(_._1 % 2 == 0)
        val whole = asg(df)
        val parts =
          (if (a.nonEmpty) asg(a.toDF("vec_id", "embedding")) else Set.empty) ++
          (if (b.nonEmpty) asg(b.toDF("vec_id", "embedding")) else Set.empty)
        Prop(whole == parts) :| s"whole=$whole parts=$parts"
      }
    }
}
