package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Tombstone day cells (round 18): deletion for stores that hold
  * streamed days — merge-on-read before the fold, physical apply at
  * compact, exactly-once under replays.
  */
class TombstoneSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("lexical tombstones: merge-on-read serves survivors before any " +
    "fold; replay cannot double-subtract; compact applies physically") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft_lex_tomb")
      .toString + "/idx"
    val h = substring(md5(col("doc_id").cast("string")), 1, 1)
    TextOps.bm25IndexInit(d.filter(h < "8"), dir)
    TextOps.bm25IndexStreamDay(spark, d.filter(h >= "8"), 0L, dir)
    val victim = col("doc_id") % 5 === 2
    val survivors = TextOps.bm25TopDocs(d.filter(!victim))
      .collect().map(_.toSeq)
    // the batch delete refuses under unfolded days; the tombstone is
    // the supported path
    intercept[IllegalStateException] {
      TextOps.bm25IndexDelete(spark, d.filter(victim).select("doc_id"), dir)
    }
    val nd = TextOps.bm25IndexTombstone(spark,
      d.filter(victim).select("doc_id"), dir, 1L)
    assert(nd > 0)
    // MERGE-ON-READ: the served ranking equals the survivor build
    // BEFORE any compact (ids anti-joined, df/stats subtracted)
    assert(TextOps.bm25StoreTopDocs(spark, dir).collect().map(_.toSeq)
      .toSeq === survivors.toSeq,
      "pre-compact view must serve the survivor ranking")
    // replay: the same day cell re-derives the same facts off the same
    // view (which excludes the prior tombstone) — re-tombstoned ids
    // contribute ZERO, so nothing double-subtracts
    val nd2 = TextOps.bm25IndexTombstone(spark,
      d.filter(victim).select("doc_id"), dir, 2L)
    assert(nd2 === 0L, "re-tombstoning must find no victim")
    assert(TextOps.bm25StoreTopDocs(spark, dir).collect().map(_.toSeq)
      .toSeq === survivors.toSeq, "replay must not change the ranking")
    // a TORN tombstone (ids landed, stats marker did not) is invisible
    val extra = col("doc_id") % 5 === 3
    TextOps.bm25IndexTombstone(spark, d.filter(extra).select("doc_id"),
      dir, 3L)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/tomb_stats/day=3"), true)
    assert(TextOps.bm25StoreTopDocs(spark, dir).collect().map(_.toSeq)
      .toSeq === survivors.toSeq,
      "a marker-less tombstone day must be invisible, never half-applied")
    // completing the torn day applies it
    TextOps.bm25IndexTombstone(spark, d.filter(extra).select("doc_id"),
      dir, 3L)
    assert(TextOps.bm25StoreTopDocs(spark, dir).collect().map(_.toSeq)
      .toSeq === TextOps.bm25TopDocs(d.filter(!victim && !extra))
      .collect().map(_.toSeq).toSeq)
    // the delete still refuses (pending tombstones), then compact
    // applies everything physically and retires the day dirs
    intercept[IllegalStateException] {
      TextOps.bm25IndexDelete(spark, Seq(0L).toDF("doc_id"), dir)
    }
    TextOps.bm25IndexCompact(spark, dir)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/day_tombstones")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/tomb_dfreq")))
    assert(TextOps.bm25StoreTopDocs(spark, dir).collect().map(_.toSeq)
      .toSeq === TextOps.bm25TopDocs(d.filter(!victim && !extra))
      .collect().map(_.toSeq).toSeq,
      "compact must equal the survivor build")
    val clean = TextOps.bm25StoreFsck(spark, dir).collect()(0)
    assert(clean.getBoolean(3) && clean.getBoolean(8) && clean.getBoolean(9))
  }

  test("IVF tombstones: probes and occupancy serve survivors at " +
    "merge-on-read; update/delete refuse until the fold; compact applies " +
    "to every sidecar") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_tomb")
      .toString + "/idx"
    val h = substring(md5(col("vec_id").cast("string")), 1, 1)
    Similarity.ivfIndexStoreInit(emb.filter(h < "8"), dir)
    Similarity.ivfIndexStorePrefixBuild(spark, dir)
    Similarity.ivfIndexStorePqBuild(spark, dir)
    Similarity.ivfIndexStreamDay(spark, emb.filter(h >= "8"), 0L, dir)
    val victims = emb.filter(col("vec_id") % 7 === 3).select("vec_id")
    val n = Similarity.ivfIndexStoreTombstone(spark, victims, dir, 1L)
    assert(n > 0)
    // replay: overwrite-by-day of a pure function — byte-stable
    assert(Similarity.ivfIndexStoreTombstone(spark, victims, dir, 1L) === n)
    // merge-on-read: no probe or audit surfaces a tombstoned id
    val probed = Similarity.ivfIndexStoreProbe(spark,
      emb.filter(col("vec_id") < 10), dir, nProbe = 16)
    assert(probed.join(victims.withColumnRenamed("vec_id", "neighbor_id"),
      Seq("neighbor_id")).count() === 0,
      "probe must not surface a tombstoned id")
    val occ = Similarity.ivfIndexStoreOccupancy(spark, dir)
      .agg(sum("list_size")).collect()(0).getLong(0)
    val live = Similarity.ivfIndexStoreLiveAssignments(spark, dir).count()
    assert(occ === live, "occupancy must count the live view")
    // sidecar-consuming mutations refuse until the fold
    intercept[IllegalStateException] {
      Similarity.ivfIndexStoreUpdateCentroids(spark, dir)
    }
    intercept[IllegalStateException] {
      Similarity.ivfIndexStoreDelete(spark, victims, dir)
    }
    // compact: physical apply — rows, pq, prefix all survivor-only;
    // sidecars re-derived; tombstone days retired; fsck clean
    Similarity.ivfIndexStoreCompact(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/day_tombstones")))
    def leak(table: String) = spark.read.parquet(s"$dir/$table")
      .join(victims, Seq("vec_id")).count()
    assert(leak("assignments") === 0L && leak("pq_codes") === 0L &&
      leak("prefix_codes") === 0L,
      "compact must drop tombstoned ids from rows and every sidecar")
    val fsck = Similarity.ivfIndexStoreFsck(spark, dir).collect()
    assert(fsck.nonEmpty && fsck.forall(r =>
      r.getBoolean(4) && r.getBoolean(5)), "post-fold sidecar must be exact")
    // ... and the update that was refused now proceeds
    Similarity.ivfIndexStoreUpdateCentroids(spark, dir)
  }
}
