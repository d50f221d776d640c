package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-18 session-2: the version-pointer manifest
  * ([[StoreVersioning]]) that removes the whole-store swap's
  * reader-absent window. Pins:
  *
  *   1. publish commits with ONE atomic marker creation; a crash at
  *      any point before the marker leaves an UNMARKED partial that no
  *      reader resolves and the next publish re-stages;
  *   2. a reader racing a publish resolves (and fully reads) the OLD
  *      version — its bytes are never moved by the publish, and GC
  *      retains exactly one superseded version as the reader grace
  *      copy;
  *   3. [[Similarity.stageThenSwap]] on a published `store_v{N}` root
  *      publishes the sibling v{N+1} (compact/train/fold inherit the
  *      windowless swap with zero caller changes) and returns the new
  *      live root; flat-layout callers get the legacy in-place swap
  *      and their own dir back;
  *   4. a lost single-writer race (two publishes staging the same
  *      version) fails LOUD at the marker creation, never silently.
  */
class StoreVersioningSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def fs(p: String) = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def tmpBase(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString + "/store"

  test("publish commits atomically: a crashed stage is unmarked, " +
    "invisible, and re-staged by the retry") {
    val base = tmpBase("graft_ver_crash")
    StoreVersioning.publish(spark, base) { root =>
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(s"$root/t")
    }
    assert(StoreVersioning.versions(spark, base) === Seq(1L))
    val v1 = StoreVersioning.resolve(spark, base)
    assert(v1.endsWith("store_v1"))
    // crash mid-stage: data landed, marker never written
    intercept[RuntimeException] {
      StoreVersioning.publish(spark, base) { root =>
        Seq((3L, "c")).toDF("id", "v").write.parquet(s"$root/t")
        throw new RuntimeException("injected crash before the marker")
      }
    }
    // the partial v2 is in the hidden aside staging — no reader path
    // ever names it
    assert(fs(base).exists(
      new org.apache.hadoop.fs.Path(s"$base/.store_v2.staging/t")))
    assert(StoreVersioning.versions(spark, base) === Seq(1L))
    assert(StoreVersioning.resolve(spark, base) === v1)
    // the retry re-stages v2 from scratch (the partial is deleted first)
    StoreVersioning.publish(spark, base) { root =>
      Seq((4L, "d"), (5L, "e")).toDF("id", "v").write.parquet(s"$root/t")
    }
    assert(StoreVersioning.versions(spark, base) === Seq(1L, 2L))
    val got = spark.read.parquet(
      s"${StoreVersioning.resolve(spark, base)}/t")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got === Seq((4L, "d"), (5L, "e")), "retry must not serve " +
      "the crashed attempt's partial rows")
  }

  test("a reader racing a publish finishes on the old version's " +
    "untouched bytes; GC retains exactly one superseded grace copy") {
    val base = tmpBase("graft_ver_race")
    StoreVersioning.publish(spark, base) { root =>
      Seq((1L, 10L), (2L, 20L)).toDF("id", "x").write.parquet(s"$root/t")
    }
    var midPublishResolved: String = null
    var midPublishRows: Long = -1
    StoreVersioning.publish(spark, base) { root =>
      Seq((1L, 11L)).toDF("id", "x").write.parquet(s"$root/t")
      // the RACE, injected at the worst instant of the legacy swap
      // (mid-"rename"): a concurrent reader resolves and fully reads —
      // under the manifest it sees v1, intact
      midPublishResolved = StoreVersioning.resolve(spark, base)
      midPublishRows = spark.read.parquet(s"$midPublishResolved/t").count()
    }
    assert(midPublishResolved.endsWith("store_v1"))
    assert(midPublishRows === 2L)
    // post-publish: fresh readers get v2; the v1 grace copy is intact
    assert(StoreVersioning.resolve(spark, base).endsWith("store_v2"))
    assert(spark.read.parquet(
      s"${StoreVersioning.resolveVersion(spark, base, 1L)}/t").count() === 2L)
    // the third publish expires v1: marker gone FIRST, then the root
    StoreVersioning.publish(spark, base) { root =>
      Seq((1L, 12L)).toDF("id", "x").write.parquet(s"$root/t")
    }
    assert(StoreVersioning.versions(spark, base) === Seq(2L, 3L))
    assert(!fs(base).exists(new org.apache.hadoop.fs.Path(s"$base/store_v1")))
    val ex = intercept[java.io.IOException] {
      StoreVersioning.resolveVersion(spark, base, 1L)
    }
    assert(ex.getMessage.contains("not published (or was GC'd)"))
  }

  test("stageThenSwap on a published version root publishes the next " +
    "version; the IVF compact inherits the windowless swap and both " +
    "versions serve identical occupancy") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val base = tmpBase("graft_ver_ivf")
    StoreVersioning.publish(spark, base) { root =>
      Similarity.ivfIndexStoreInit(emb, root)
    }
    val v1 = StoreVersioning.resolve(spark, base)
    val occ1 = Similarity.ivfIndexStoreOccupancy(spark, v1).collect().toSeq
    val occRet = Similarity.ivfIndexStoreCompact(spark, v1).collect().toSeq
    assert(StoreVersioning.versions(spark, base) === Seq(1L, 2L),
      "compact on a version root must publish, not double-rename")
    assert(fs(base).exists(new org.apache.hadoop.fs.Path(
      s"$base/store_v1/assignments")), "the superseded version's bytes " +
      "must survive the publish for in-flight readers")
    val v2 = StoreVersioning.resolve(spark, base)
    assert(v2.endsWith("store_v2"))
    val occ2 = Similarity.ivfIndexStoreOccupancy(spark, v2).collect().toSeq
    assert(occ2 === occ1, "fold must be logically invisible")
    assert(occRet === occ2, "compact's post-swap read must come off the " +
      "NEW live root")
    // and the versioned store ≡ a flat build over the same corpus
    val flat = tmpBase("graft_ver_flatref")
    Similarity.ivfIndexStoreInit(emb, flat)
    assert(Similarity.ivfIndexStoreOccupancy(spark, flat).collect().toSeq
      === occ2)
  }

  test("flat layout is untouched: stageThenSwap double-renames in " +
    "place and returns its own argument") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = tmpBase("graft_ver_flatlex")
    TextOps.bm25IndexInit(docs, dir)
    val before = TextOps.bm25StoreTopDocs(spark, dir).collect().toSeq
    val live = TextOps.bm25IndexCompact(spark, dir)
    assert(live === dir, "flat compact must keep serving the same root")
    assert(TextOps.bm25StoreTopDocs(spark, dir).collect().toSeq === before)
    assert(!fs(dir).exists(new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(dir).getParent, "manifest")),
      "flat compact must not invent a manifest")
  }

  test("a lost single-writer race fails loud at the marker creation") {
    val base = tmpBase("graft_ver_racewr")
    StoreVersioning.publish(spark, base) { root =>
      Seq(1L).toDF("id").write.parquet(s"$root/t")
    }
    val winner = new org.apache.hadoop.fs.Path(s"$base/manifest/v2")
    intercept[java.io.IOException] {
      StoreVersioning.publish(spark, base) { root =>
        Seq(2L).toDF("id").write.parquet(s"$root/t")
        // the concurrent winner commits v2 while our stage runs
        fs(base).create(winner, false).close()
      }
    }
    // the loser's failure is detected, never silent: the winner's
    // marker stands and resolve follows it
    assert(StoreVersioning.versions(spark, base) === Seq(1L, 2L))
  }

  test("a loser whose winner fully committed (root AND marker) fails " +
    "at the rename with the winner's bytes untouched") {
    val base = tmpBase("graft_ver_racefull")
    StoreVersioning.publish(spark, base) { root =>
      Seq(1L).toDF("id").write.parquet(s"$root/t")
    }
    intercept[java.io.IOException] {
      StoreVersioning.publish(spark, base) { root =>
        Seq(2L).toDF("id").write.parquet(s"$root/t")
        // the winner commits v2 COMPLETELY while our stage runs: its
        // own root (staged aside, renamed in) plus its marker
        Seq(99L).toDF("id").write.parquet(s"$base/store_v2/t")
        fs(base).create(
          new org.apache.hadoop.fs.Path(s"$base/manifest/v2"), false).close()
      }
    }
    // the loser could never scribble on the committed root: v2 serves
    // the WINNER's bytes exactly
    assert(StoreVersioning.versions(spark, base) === Seq(1L, 2L))
    val got = spark.read.parquet(
      s"${StoreVersioning.resolve(spark, base)}/t")
      .as[Long].collect().toSeq
    assert(got === Seq(99L), "winner's committed bytes must be intact")
  }

  test("publish sweeps gc-crash orphans: a markerless root is deleted " +
    "by the next publish, never resurrected") {
    val base = tmpBase("graft_ver_orphan")
    StoreVersioning.publish(spark, base) { root =>
      Seq(1L).toDF("id").write.parquet(s"$root/t")
    }
    // simulate gc crashing between its two deletes: a root whose
    // marker is gone (here: a root that never had one)
    val orphan = new org.apache.hadoop.fs.Path(s"$base/store_v99/t")
    fs(base).mkdirs(orphan)
    StoreVersioning.publish(spark, base) { root =>
      Seq(2L).toDF("id").write.parquet(s"$root/t")
    }
    assert(!fs(base).exists(orphan.getParent),
      "unmarked roots must be swept by the next publish")
    assert(StoreVersioning.versions(spark, base) === Seq(1L, 2L))
  }
}
