package graft.ext

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Version-pointer manifest for the persisted stores (round 18) — the
  * micro-Iceberg shape the whole-store swap's single-reader contract
  * pointed at ([[Similarity.stageThenSwap]]'s doc): under the legacy
  * flat layout, the double rename (target → old, staging → target) has
  * an instant where NO live store root exists, so a reader racing a
  * compact/train fails spuriously. Under this layout there is no such
  * instant, ever:
  *
  * {{{
  *   base/
  *     manifest/v1  v2  …        ← empty MARKER files; creating one IS
  *                                  the commit (file creation is atomic
  *                                  on every Hadoop FS — no rename, no
  *                                  pointer rewrite, no window)
  *     store_v1/  store_v2/ …    ← immutable-at-publish store roots
  * }}}
  *
  * Readers [[resolve]] the highest marked version and hold that ROOT
  * for their whole query — a concurrent [[publish]] of v{N+1} never
  * moves, renames, or deletes v{N}'s bytes (GC retains the previous
  * version exactly so in-flight readers of the just-superseded root
  * finish on intact data). Writers stage the ENTIRE next store under
  * `store_v{N+1}` — invisible to every reader, because no marker names
  * it — then commit with one `fs.create(manifest/v{N+1})`. A crash at
  * any point before the marker leaves an unmarked partial dir that no
  * reader can resolve; the next publish deletes and re-stages it. A
  * crash after the marker is a COMPLETED publish (the `_SUCCESS` file
  * inside the root was written before the marker; marker-implies-
  * complete is the write-order invariant, like the stores' day cells).
  *
  * Scope (deliberate, documented): versions snapshot at PUBLISH
  * boundaries — init, compact, train/reseed route through [[publish]]
  * (via [[Similarity.stageThenSwap]]'s versioned branch, which detects
  * a `store_v{N}` root and publishes the sibling v{N+1} instead of
  * double-renaming). In-place mutations between publishes (append,
  * streamed days, tombstones, per-partition deletes) mutate the
  * CURRENT version root under the same single-WRITER contract as the
  * flat layout — this manifest fixes the reader-absent window, it does
  * not make every mutation copy-on-write. That is the honest LSM
  * shape: day cells accumulate in the live version; a fold publishes
  * the next snapshot.
  *
  * At 100 TB the manifest is one `listStatus` of a few marker files
  * per resolve — no store bytes read — and GC deletes whole superseded
  * roots (marker first, so a reader can never resolve a half-deleted
  * root).
  */
object StoreVersioning {

  private val Marker = "v(\\d+)".r
  private val Root = "store_v(\\d+)".r

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(base: Path) = new Path(base, "manifest")

  /** Marked (= committed) versions at `base`, ascending; empty when the
    * dir is not a versioned store (or holds no published version yet).
    */
  def versions(spark: SparkSession, base: String): Seq[Long] = {
    val m = manifestDir(new Path(base))
    val fs = fsOf(spark, m)
    if (!fs.exists(m)) Seq.empty
    else fs.listStatus(m).toSeq.map(_.getPath.getName).collect {
      case Marker(n) => n.toLong
    }.sorted
  }

  /** The root of version `v` — time-travel read while retained. Fails
    * loud on an unmarked (never published or GC'd) version: resolving
    * a root whose marker is gone could hand a reader a half-deleted
    * dir.
    */
  def resolveVersion(spark: SparkSession, base: String, v: Long): String = {
    val marker = new Path(manifestDir(new Path(base)), s"v$v")
    if (!fsOf(spark, marker).exists(marker))
      throw new java.io.IOException(
        s"version $v at $base is not published (or was GC'd); " +
          s"retained versions: ${versions(spark, base).mkString(", ")}")
    new Path(new Path(base), s"store_v$v").toString
  }

  /** The CURRENT store root: highest marked version. One bounded
    * manifest listing; never reads store bytes.
    */
  def resolve(spark: SparkSession, base: String): String = {
    val vs = versions(spark, base)
    if (vs.isEmpty)
      throw new java.io.IOException(
        s"no published version at $base — publish one (init through " +
          "StoreVersioning.publish) or use the flat layout")
    resolveVersion(spark, base, vs.last)
  }

  /** True iff `dir` is a PUBLISHED version root (`…/store_v{N}` with
    * its marker present) — the trigger for
    * [[Similarity.stageThenSwap]]'s versioned branch.
    */
  private[ext] def isVersionRoot(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    p.getName match {
      case Root(n) =>
        val marker = new Path(manifestDir(p.getParent), s"v$n")
        fsOf(spark, marker).exists(marker)
      case _ => false
    }
  }

  /** Publish the next version: stage the WHOLE store in a HIDDEN
    * aside dir (the callback writes every table there, exactly like
    * [[Similarity.stageThenSwap]]'s staging root), `_SUCCESS` it,
    * RENAME it to `store_v{N+1}`, then commit with one atomic marker
    * creation. Retains the newest `retain` versions (default 2:
    * current + one superseded, the in-flight-reader grace copy); older
    * roots are GC'd marker-FIRST. Returns the new live root.
    *
    * Single-writer, like every store mutation here — but a LOST race
    * is detected loud, never silent, and never corrupts the winner:
    * the loser stages beside (its own hidden dir — it cannot scribble
    * on a root the winner already committed), and then either its
    * rename refuses (the winner's `store_v{N+1}` exists) or its marker
    * creation refuses (create-no-overwrite). The one cross-writer
    * hazard left is the entry sweep deleting the other racer's
    * IN-FLIGHT staging (same staging name) — which fails that racer's
    * rename loudly with the winner's bytes untouched.
    */
  def publish(spark: SparkSession, base: String, retain: Int = 2)
             (stage: String => Unit): String = {
    require(retain >= 1, s"retain must be >= 1, got $retain")
    val basePath = new Path(base)
    val fs = fsOf(spark, basePath)
    val marked = versions(spark, base)
    val next = marked.lastOption.getOrElse(0L) + 1
    val root = new Path(basePath, s"store_v$next")
    val staging = new Path(basePath, s".store_v$next.staging")
    // sweep every UNMARKED root and stale staging: the crashed prior
    // attempt at `next`, and any [[gc]]-crash orphan (a crash between
    // gc's marker delete and root delete leaves a markerless root
    // nothing can resolve or ever mark — publish is the one writer
    // entry point, so it owns the sweep). Unmarked ⇒ invisible to
    // readers ⇒ safe to delete.
    val markedSet = marked.toSet
    if (fs.exists(basePath))
      fs.listStatus(basePath).foreach { st =>
        st.getPath.getName match {
          case Root(k) if !markedSet.contains(k.toLong) =>
            fs.delete(st.getPath, true)
          case _ => ()
        }
      }
    fs.delete(staging, true)
    stage(staging.toString)
    fs.create(new Path(staging, "_SUCCESS")).close()
    // the aside→root rename: refuses if a concurrent winner already
    // committed this version's root — loser fails HERE with the
    // winner's bytes untouched
    if (!fs.rename(staging, root))
      throw new java.io.IOException(
        s"publish rename $staging -> $root failed — lost race with a " +
          "concurrent publish (winner's root intact) or staging swept")
    val m = manifestDir(basePath)
    fs.mkdirs(m)
    // the commit: atomic create, no-overwrite — the marker-level race
    // also fails loud, with the staged root intact for forensics
    fs.create(new Path(m, s"v$next"), false).close()
    gc(spark, base, retain)
    root.toString
  }

  /** Drop every marked version except the newest `retain`: marker
    * first (after which no reader can resolve the root), then the
    * root's bytes. Idempotent; safe to re-run after a crash between
    * the two deletes (a rootless marker is exactly what the marker
    * delete-first order prevents — the crash state is a MARKERLESS
    * root, which the next publish or gc sweep removes).
    */
  def gc(spark: SparkSession, base: String, retain: Int = 2): Seq[Long] = {
    val basePath = new Path(base)
    val fs = fsOf(spark, basePath)
    val victims = versions(spark, base).dropRight(retain)
    victims.foreach { v =>
      fs.delete(new Path(manifestDir(basePath), s"v$v"), false)
      fs.delete(new Path(basePath, s"store_v$v"), true)
    }
    victims
  }
}
