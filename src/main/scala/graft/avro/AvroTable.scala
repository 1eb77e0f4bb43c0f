package graft.avro

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** `graft-avro`: the OCF source as a named DataSource-V2 table, so a
  * library user reads Avro archives with the stock API —
  * `spark.read.format("graft-avro").load(dir)` — instead of calling
  * [[AvroFiles.read]]:
  *
  *  - schema inference from the first container's writer schema (the
  *    header carries it; metadata-only probe), or an explicit
  *    `avroSchema` option for schema-evolution reads (reader-added
  *    fields default, writer-only fields drop, fields match by name);
  *  - the same sync-marker byte-range split planning as
  *    [[AvroFiles.planSplits]] — one task group per ~`splitBytes`
  *    (default 128 MiB), so a multi-GiB archival object parallelizes
  *    and small files bin-pack;
  *  - `permissive` option for the lake-robustness mode (corrupt-header
  *    files skipped, corrupt tails salvaged).
  *
  * Options: `path` (required), `avroSchema` (reader schema JSON),
  * `splitBytes`, `permissive`.
  */
object AvroTable {
  val ShortName = "graft-avro"

  final case class OcfBin(splits: Seq[AvroFiles.OcfSplit]) extends InputPartition

  /** Project the reader schema to `required`'s top-level fields, in
    * `required`'s order — Avro schema resolution then SKIPS every other
    * field during decode (no UTF-8 materialization, no nested-record
    * construction for pruned columns), which is the column-pruning
    * behavior a columnar scan gives for free, at the best a row format
    * can do. */
  private[avro] def projectSchemaJson(fullJson: String,
      required: StructType): String = {
    val full = AvroCodec.parsedSchema(fullJson)
    val byName = full.getFields.asScala.map(f => f.name() -> f).toMap
    val fields = required.fields.toSeq.map { rf =>
      val f = byName.getOrElse(rf.name, throw new IllegalArgumentException(
        s"$ShortName: required column ${rf.name} not in reader schema"))
      new org.apache.avro.Schema.Field(f.name(), f.schema(), f.doc(),
        f.defaultVal())
    }
    org.apache.avro.Schema.createRecord(full.getName, full.getDoc,
      full.getNamespace, false, fields.asJava).toString
  }

  final class OcfScan(path: String, readerSchemaJson: String,
      splitBytes: Long, permissive: Boolean)
      extends Scan with ScanBuilder with Batch
      with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
    private var projectedJson: String = readerSchemaJson

    override def pruneColumns(required: StructType): Unit =
      projectedJson = projectSchemaJson(readerSchemaJson, required)

    override def build(): Scan = this
    override def readSchema(): StructType =
      AvroCodec.sparkStructType(projectedJson)
    override def description(): String =
      s"$ShortName path=$path ReadSchema: " +
        readSchema().fieldNames.mkString("[", ",", "]")
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] =
      AvroFiles.planSplits(
        SparkSession.active.sparkContext.hadoopConfiguration, path, splitBytes)
        .map(OcfBin(_): InputPartition).toArray
    override def createReaderFactory(): PartitionReaderFactory =
      OcfReaderFactory(
        new SerializableConfiguration(
          SparkSession.active.sparkContext.hadoopConfiguration),
        projectedJson, permissive)
  }

  final case class OcfReaderFactory(conf: SerializableConfiguration,
      readerSchemaJson: String, permissive: Boolean)
      extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val rows = p.asInstanceOf[OcfBin].splits.iterator.flatMap(sp =>
        AvroFiles.decodeSplit(sp, conf.value, readerSchemaJson, permissive,
          onCorruptHeader = () => (), onTruncated = () => ()))
      new PartitionReader[InternalRow] {
        private var row: InternalRow = _
        override def next(): Boolean =
          if (rows.hasNext) { row = rows.next(); true } else false
        override def get(): InternalRow = row
        override def close(): Unit = ()
      }
    }
  }

  final class OcfTable(path: String, readerSchemaJson: String)
      extends Table with SupportsRead {
    override def name(): String = s"$ShortName($path)"
    override def schema(): StructType = AvroCodec.sparkStructType(readerSchemaJson)
    override def capabilities(): java.util.Set[TableCapability] =
      Set(TableCapability.BATCH_READ).asJava
    override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
      new OcfScan(path, readerSchemaJson,
        Option(o.get("splitBytes")).map(_.toLong)
          .getOrElse(AvroFiles.DefaultSplitBytes),
        Option(o.get("permissive")).exists(_.toBoolean))
  }

  private[avro] def resolveSchemaJson(options: CaseInsensitiveStringMap): String = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(s"$ShortName requires option 'path'"))
    Option(options.get("avroSchema")).orElse(
      AvroFiles.firstWriterSchemaJson(
        SparkSession.active.sparkContext.hadoopConfiguration, path))
      .getOrElse(throw new IllegalArgumentException(
        s"$ShortName: no readable container under $path and no 'avroSchema' option"))
  }
}

/** Registered as `graft-avro` via META-INF/services. */
class GraftAvroProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = AvroTable.ShortName
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AvroCodec.sparkStructType(AvroTable.resolveSchemaJson(options))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new AvroTable.OcfTable(
      Option(opts.get("path")).getOrElse(
        throw new IllegalArgumentException(s"${AvroTable.ShortName} requires option 'path'")),
      AvroTable.resolveSchemaJson(opts))
  }
}
