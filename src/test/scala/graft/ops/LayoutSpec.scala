package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class LayoutSpec extends AnyFunSuite with SparkSpec {

  test("writeShards: every file within the record budget, all rows present, shards key-disjoint") {
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
    val total = o.count()
    val path = java.nio.file.Files.createTempDirectory("shards").toString + "/t"
    val manifest = Layout.writeShards(o, path, "o_orderkey",
      numShards = 4, maxRecordsPerFile = 500).collect()
    assert(manifest.map(_.getLong(1)).sum === total, "no row lost or duplicated")
    manifest.foreach { r =>
      assert(r.getLong(1) <= 500, s"${r.getString(0)} exceeds maxRecordsPerFile")
    }
    // a range-partitioned write keeps shards key-disjoint: per-file key
    // ranges must not interleave across range partitions
    val back = spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col("o_orderkey")).as("lo"), max(col("o_orderkey")).as("hi"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // group files by the writer partition id in the filename
    // (part-0000N-…); range partitions must be pairwise key-disjoint
    // and ordered by id
    val pidOf = "part-(\\d+)".r
    val parts = back
      .groupBy(t => pidOf.findFirstMatchIn(
        new java.io.File(t._1).getName).get.group(1).toInt)
      .map { case (pid, fs) => (pid, fs.map(_._2).min, fs.map(_._3).max) }
      .toSeq.sortBy(_._1)
    assert(parts.length > 1, "fixture must produce several range partitions")
    parts.sliding(2).foreach {
      case Seq((_, _, hiA), (pid, loB, _)) =>
        assert(hiA <= loB, s"range partition $pid overlaps its predecessor")
      case _ => ()
    }
  }

  test("writeShardsManifest: closed-form shard sizes and file counts, rerun-identical") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val total = d.count() // 500
    val path = java.nio.file.Files.createTempDirectory("shardsm").toString + "/t"
    val m1 = Layout.writeShardsManifest(d, path, "doc_id",
      numShards = 4, maxRecordsPerFile = 60).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // deterministic equal split: shard s holds ords [s*N/4, (s+1)*N/4)
    assert(m1.map(_._1).toSeq === (0 until 4))
    assert(m1.map(_._2).sum === total)
    m1.foreach { case (s, rows, files, _, _) =>
      assert(rows === total / 4, s"shard $s must hold exactly N/numShards rows")
      assert(files === (rows + 59) / 60, s"shard $s file count must be ceil(rows/max)")
    }
    // shards are contiguous, key-disjoint ranges in sort-key order
    m1.sliding(2).foreach {
      case Array((_, _, _, _, hiA), (s, _, _, loB, _)) =>
        assert(hiA < loB, s"shard $s key range overlaps its predecessor")
      case _ => ()
    }
    // unlike sampled range boundaries, reruns reproduce the manifest exactly
    val m2 = Layout.writeShardsManifest(d, path, "doc_id",
      numShards = 4, maxRecordsPerFile = 60).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(m2.toSeq === m1.toSeq)
  }

  test("writeShardsManifest: empty input returns an empty manifest, not a read error") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(org.apache.spark.sql.functions.lit(false))
    val path = java.nio.file.Files.createTempDirectory("shardse").toString + "/t"
    val m = Layout.writeShardsManifest(d, path, "doc_id")
    assert(m.collect().isEmpty)
    assert(m.schema.fieldNames.toSeq ===
      Seq("shard", "n_rows", "n_files", "min_key", "max_key"))
  }
}
