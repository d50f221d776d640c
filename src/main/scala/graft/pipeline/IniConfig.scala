package graft.pipeline

/** Minimal INI config reader — the reference's `configparser` surface
  * (SURVEY §2 A4; `etl.py:10-17` reads 4 paths from `cp.cfg`).
  * Supports `[section]` headers, `key = value` pairs, `#`/`;` comments.
  */
object IniConfig {

  def parse(content: String): Map[String, Map[String, String]] = {
    var section = ""
    val out = scala.collection.mutable.Map.empty[String, Map[String, String]]
      .withDefaultValue(Map.empty)
    content.linesIterator.map(_.trim).foreach {
      case l if l.isEmpty || l.startsWith("#") || l.startsWith(";") => ()
      case l if l.startsWith("[") && l.endsWith("]") =>
        section = l.substring(1, l.length - 1).trim
      case l if l.contains("=") =>
        val Array(k, v) = l.split("=", 2)
        out(section) = out(section) + (k.trim -> v.trim.stripPrefix("'").stripSuffix("'"))
      case _ => ()
    }
    out.toMap
  }

  def parseFile(path: String): Map[String, Map[String, String]] = {
    val src = scala.io.Source.fromFile(path)
    try parse(src.mkString) finally src.close()
  }
}
