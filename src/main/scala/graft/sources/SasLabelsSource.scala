package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability,
  TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSource V2 connector for SAS `proc format` label dictionaries —
  * the pluggable-format mechanism the reference relied on for its
  * binary source (`spark.read.format('com.github.saurfang.sas.spark')`,
  * `etl.py:103-107,227`; SURVEY §2 A2), implemented for the label file
  * that IS distributable in this environment.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.SasLabelsSource")
  *   .option("path", "/root/reference/I94_SAS_Labels_Descriptions.SAS")
  *   .option("block", "i94model")
  *   .load()                       // → DataFrame(code string, label string)
  * }}}
  *
  * The full TableProvider → Table → ScanBuilder → Batch →
  * PartitionReader chain is real; the file is driver-dictionary-sized so
  * a single input partition is the correct plan (a block-splittable
  * format would emit one InputPartition per split here).
  */
class SasLabelsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SasLabelsSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SasLabelsTable(properties.asScala.toMap)
  override def supportsExternalMetadata(): Boolean = false
}

object SasLabelsSource {
  val schema: StructType = StructType(Seq(
    StructField("code", StringType, nullable = false),
    StructField("label", StringType, nullable = false)))
}

class SasLabelsTable(properties: Map[String, String]) extends Table with SupportsRead {
  override def name(): String =
    s"sas_labels(${properties.getOrElse("block", "?")})"
  override def schema(): StructType = SasLabelsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SasLabelsScanBuilder(
      options.getOrDefault("path", properties.getOrElse("path", "")),
      options.getOrDefault("block", properties.getOrElse("block", "")))
}

/** Column pruning reaches the connector: Catalyst calls
  * `pruneColumns` with the columns the query actually needs and the
  * reader emits only those — the DSv2 contract that lets a real format
  * skip decoding unused columns at 100 TB.
  */
class SasLabelsScanBuilder(path: String, block: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = SasLabelsSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new SasLabelsScan(path, block, required)
}

class SasLabelsScan(path: String, block: String, required: StructType)
    extends Scan with Batch {
  require(path.nonEmpty, "option 'path' is required")
  require(block.nonEmpty, "option 'block' is required (e.g. i94model)")
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(SasLabelsPartition(path, block, required.fieldNames)) // dictionary-sized → one split
  override def createReaderFactory(): PartitionReaderFactory =
    new SasLabelsReaderFactory
}

case class SasLabelsPartition(path: String, block: String,
    columns: Array[String]) extends InputPartition

class SasLabelsReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SasLabelsPartition]
    new SasLabelsReader(p.path, p.block, p.columns)
  }
}

class SasLabelsReader(path: String, block: String, columns: Array[String])
    extends PartitionReader[InternalRow] {
  private val rows = graft.pipeline.SasLabels.parseFile(path, block).iterator
  private var current: (String, String) = _
  override def next(): Boolean = {
    if (rows.hasNext) { current = rows.next(); true } else false
  }
  override def get(): InternalRow =
    InternalRow(columns.map {
      case "code" => UTF8String.fromString(current._1)
      case "label" => UTF8String.fromString(current._2)
    }: _*)
  override def close(): Unit = ()
}
