package graft.pipeline

/** Pure-Scala parser for SAS `proc format` label dictionaries — the
  * reference's driver-local lookup-table source (SURVEY §2 A3; reference
  * algorithm at `/root/reference/etl.py:20-38`, data at
  * `/root/reference/I94_SAS_Labels_Descriptions.SAS`).
  *
  * The format is `value <name>` blocks of `code = 'LABEL'` lines ending
  * at `;`. The I94VISA block lives inside a comment, so the parser keys
  * on the block name token and the terminating `;` only — matching the
  * reference's behavior of substring-from-name-to-semicolon.
  *
  * Driver-local by design: the label file is a static ~1100-line
  * dictionary, so parsing on the driver and building the DataFrame from
  * a local Seq is the correct scale posture (SURVEY §4) — the resulting
  * dimension tables are broadcast-sized.
  */
object SasLabels {

  /** Extract (code, label) pairs from the block named `blockName`. */
  def parse(content: String, blockName: String): Seq[(String, String)] = {
    val start = content.indexOf(blockName)
    require(start >= 0, s"label block '$blockName' not found")
    val end = content.indexOf(';', start)
    val block = content.substring(start, if (end >= 0) end else content.length)
    block.linesIterator
      .map(_.trim)
      .filter(_.contains("="))
      .map { line =>
        val Array(code, label) = line.split("=", 2)
        (stripQuotes(code), stripQuotes(label))
      }
      .toSeq
  }

  private def stripQuotes(s: String): String =
    s.trim.stripPrefix("'").stripSuffix("'").trim

  def parseFile(path: String, blockName: String): Seq[(String, String)] = {
    val src = scala.io.Source.fromFile(path, "ISO-8859-1")
    try parse(src.mkString, blockName) finally src.close()
  }
}
