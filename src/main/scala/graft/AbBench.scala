package graft

import java.nio.file.{Files, Paths, Path}
import scala.jdk.CollectionConverters._

/** Same-epoch old-code A/B — the measurement-integrity harness round
  * 14 hand-built to adjudicate a suspected bench regression (the r13→
  * r14 "1.28× slowdown" that turned out to be host-epoch drift), made
  * a one-command StressBench mode so the next adjudication is
  * `SPARK_GRAFT_AB_REF=<gitref> tools/run_stress.sh`:
  *
  *  1. materialize the ref's classes once (git worktree + sbt compile
  *     to the worktree's own target dir — the working tree is never
  *     touched);
  *  2. run the probe queries in ALTERNATING fresh JVMs (ref, head,
  *     ref, head, …) so both codebases sample the SAME host windows —
  *     the property that makes the comparison epoch-proof: a
  *     contention window inflates both sides equally instead of
  *     whichever side happened to run then;
  *  3. emit the paired per-query table (all samples + min each +
  *     head/ref ratio) as one JSON file plus a compact stdout line.
  *
  * Each sample is `graft.Bench` with SPARK_GRAFT_RUNS=1 in its own
  * JVM and its own scratch cwd (the full-record sidecar lands there,
  * never on the repo's committed BENCH_FULL.json). Reading the ratio:
  * ≈1 on every probe ⇒ any committed-record delta is the HOST, not
  * the code; a per-query ratio well off 1 with flat neighbors ⇒ a
  * genuine plan/code regression on that query.
  */
object AbBench {

  /** The r13→r14 adjudication's drift sentinels: a round-1 broadcast
    * star join, an LSH probe, and a window/graph composition — old,
    * stable queries the diff under test almost never touches.
    */
  private val defaultProbes = "q_star_join,q_lsh_topk,q_event_transitions"

  private def run(cmd: Seq[String], cwd: Path,
                  env: Map[String, String] = Map.empty): Int = {
    val pb = new ProcessBuilder(cmd.asJava)
    pb.directory(cwd.toFile)
    pb.redirectErrorStream(true)
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    val p = pb.start()
    // drain (bounded interest: last lines only, for error reporting)
    val out = new java.io.BufferedReader(
      new java.io.InputStreamReader(p.getInputStream))
    val tail = new scala.collection.mutable.Queue[String]()
    var line = out.readLine()
    while (line != null) {
      tail.enqueue(line); if (tail.size > 20) tail.dequeue()
      line = out.readLine()
    }
    val rc = p.waitFor()
    if (rc != 0)
      System.err.println(s"[ab] FAILED rc=$rc: ${cmd.mkString(" ")}\n" +
        tail.mkString("\n"))
    rc
  }

  /** JDK17 module opens Spark needs — the run_bench.sh list. */
  private def addOpens: Seq[String] = {
    val base = Seq("java.lang", "java.lang.invoke", "java.lang.reflect",
      "java.io", "java.net", "java.nio", "java.util",
      "java.util.concurrent", "java.util.concurrent.atomic")
      .map(p => s"--add-opens=java.base/$p=ALL-UNNAMED")
    val sun = Seq("sun.nio.ch", "sun.nio.cs", "sun.security.action",
      "sun.util.calendar")
      .map(p => s"--add-opens=java.base/$p=ALL-UNNAMED")
    base ++ sun
  }

  private def sparkJars: String =
    new java.io.File("/opt/spark/jars").listFiles()
      .filter(_.getName.endsWith(".jar")).map(_.getPath).sorted
      .mkString(":")

  /** One fresh-JVM bench sample of the probe set against `classes`;
    * returns query → seconds parsed from the run's own full-record
    * sidecar (written to the per-run scratch cwd).
    */
  private def sample(classes: String, sfDir: String, probes: String,
                     cpus: String, scratch: Path): Map[String, Double] = {
    val full = scratch.resolve("ab_full.json")
    Files.deleteIfExists(full)
    val cmd = Seq("java") ++ addOpens ++ Seq("-Xmx16g",
      "-cp", s"$classes:$sparkJars", "graft.Bench")
    val rc = run(cmd, scratch, Map(
      "SPARK_GRAFT_SF_DIR" -> sfDir,
      "SPARK_GRAFT_CPUS" -> cpus,
      "SPARK_GRAFT_ONLY" -> probes,
      "SPARK_GRAFT_RUNS" -> "1",
      "SPARK_GRAFT_BENCH_FULL" -> full.toString))
    if (rc != 0 || !Files.exists(full)) return Map.empty
    val txt = Files.readString(full)
    // the queries object is flat (name → seconds) and brace-free
    val qs = txt.indexOf("\"queries\":{")
    if (qs < 0) return Map.empty
    val body = txt.substring(qs + 11, txt.indexOf("}", qs))
    raw""""([^"]+)":(-?[0-9.eE+]+)""".r.findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  def main(args: Array[String]): Unit = {
    val ref = sys.env.getOrElse("SPARK_GRAFT_AB_REF",
      sys.error("SPARK_GRAFT_AB_REF=<gitref> is required"))
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val probes = sys.env.getOrElse("SPARK_GRAFT_AB_ONLY", defaultProbes)
    val rounds = sys.env.get("SPARK_GRAFT_AB_ROUNDS")
      .map(_.toInt).filter(_ > 0).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_AB_OUT", "BENCH_AB.json")
    val repo = Paths.get(".").toAbsolutePath.normalize

    // 1. ref classes, built once in a worktree with its own target dir
    val shaOut = new ProcessBuilder("git", "rev-parse", ref)
      .directory(repo.toFile).start()
    val sha = new String(shaOut.getInputStream.readAllBytes()).trim
    require(shaOut.waitFor() == 0 && sha.nonEmpty, s"unresolvable ref: $ref")
    val wt = Paths.get(sys.props("java.io.tmpdir"), s"graft_ab_${sha.take(12)}")
    val refClasses = wt.resolve("target/scala-2.13/classes")
    if (!Files.isDirectory(refClasses)) {
      if (!Files.isDirectory(wt))
        require(run(Seq("git", "worktree", "add", "--detach",
          wt.toString, sha), repo) == 0, "git worktree add failed")
      System.err.println(s"[ab] compiling ref $sha in $wt ...")
      require(run(Seq("sbt", "-batch", "compile"), wt) == 0,
        "ref compile failed")
    }
    val headClasses = repo.resolve("target/scala-2.13/classes")
    require(Files.isDirectory(headClasses), "run `sbt compile` first")

    // 2. alternating fresh JVMs: (ref, head) × rounds — both sides see
    // the same host windows
    val refT = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    val headT = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    val scratch = Files.createTempDirectory("graft_ab_run")
    for (r <- 1 to rounds) {
      System.err.println(s"[ab] round $r/$rounds: ref")
      sample(refClasses.toString, sfDir, probes, cpus, scratch)
        .foreach { case (k, v) => if (v >= 0) refT(k) = v :: refT(k) }
      System.err.println(s"[ab] round $r/$rounds: head")
      sample(headClasses.toString, sfDir, probes, cpus, scratch)
        .foreach { case (k, v) => if (v >= 0) headT(k) = v :: headT(k) }
    }

    // 3. the paired table
    def fmt(v: Double) = f"$v%.3f"
    val names = (refT.keySet ++ headT.keySet).toSeq.sorted
    val rows = names.map { n =>
      val (r, h) = (refT(n), headT(n))
      val (rm, hm) = (if (r.isEmpty) -1 else r.min, if (h.isEmpty) -1 else h.min)
      val ratio = if (rm > 0 && hm > 0) hm / rm else -1
      s""""$n":{"ref":[${r.reverse.map(fmt).mkString(",")}],""" +
        s""""head":[${h.reverse.map(fmt).mkString(",")}],""" +
        s""""ref_min":${fmt(rm)},"head_min":${fmt(hm)},"ratio":${fmt(ratio)}}"""
    }
    val json = s"""{"metric":"ab","ref":"$sha","rounds":$rounds,""" +
      s""""sf":"$sfDir","cpus":$cpus,"queries":{${rows.mkString(",")}}}"""
    Files.writeString(Paths.get(outPath), json + "\n")
    println(json)
  }
}
