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

  /** Serialize epoch commits on the archive dir — the same
    * [[graft.sources.FileLocks]] monitor+flock protocol KafkaReplay's
    * commits use (ONE implementation; the r15 review found hand-rolled
    * copies diverging on symlink canonicalization): two live queries
    * sharing one archive path would otherwise race the incarnation
    * sweep — writer A's sweep deletes writer B's mid-commit batch= dir
    * (parts renamed, ledger line not yet written), then B ledgers the
    * epoch as committed: silent data loss. Only local paths can flock;
    * non-local filesystems fall back to the JVM monitor alone
    * (single-driver commits, the common case). */
  private[graft] def withArchiveLock[A](
      dir: org.apache.hadoop.fs.Path,
      fs: org.apache.hadoop.fs.FileSystem)(body: => A): A =
    if (fs.getScheme == "file") {
      val d = new java.io.File(dir.toUri.getPath)
      d.mkdirs()
      graft.sources.FileLocks.withFileLock(new java.io.File(d, "_commit.lock"))(body)
    } else graft.sources.FileLocks.withMonitor(
      fs.makeQualified(dir).toString)(body)

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

  // ---------------------------------------------------------------- write

  import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}

  final case class OcfPartMsg(tmpPath: String, finalName: String, rows: Long)
      extends WriterCommitMessage

  /** Task-side part writer: one container per non-empty task, streamed
    * to a temp name and renamed into place by the driver commit. */
  final case class OcfWriterFactory(path: String, schemaJson: String,
      codec: String, conf: SerializableConfiguration)
      extends DataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
      new DataWriter[InternalRow] {
        private val finalName = f"part-$partitionId%05d-$taskId.avro"
        private val tmp = new org.apache.hadoop.fs.Path(path,
          s"_tmp-$finalName")
        private var writer: org.apache.avro.file.DataFileWriter[org.apache.avro.generic.GenericRecord] = _
        private val schema = AvroCodec.parsedSchema(schemaJson)
        private var n = 0L
        private def ensureOpen(): Unit = if (writer == null) {
          val fs = tmp.getFileSystem(conf.value)
          writer = new org.apache.avro.file.DataFileWriter(
            new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
          // one codec table (AvroFiles.codecFactory) for every writer:
          // the inline copy this replaces mapped any unknown name to
          // deflate, so a typo ("zstd") silently changed the codec
          writer.setCodec(AvroFiles.codecFactory(codec))
          writer.create(schema, fs.create(tmp, true))
        }
        override def write(row: InternalRow): Unit = {
          ensureOpen()
          writer.append(AvroCodec.rowToAvro(row, schema))
          n += 1
        }
        override def commit(): WriterCommitMessage = {
          if (writer != null) writer.close()
          OcfPartMsg(tmp.toString, finalName, n)
        }
        override def abort(): Unit = {
          if (writer != null) writer.close()
          tmp.getFileSystem(conf.value).delete(tmp, false); ()
        }
        override def close(): Unit = if (writer != null) writer.close()
      }
  }

  /** Driver commit: optionally truncate (overwrite mode), then rename
    * every non-empty part into place — tasks never mutate the visible
    * layout, so failed/speculative attempts leave only temp files that
    * commit/abort clean up. */
  final class OcfBatchWrite(path: String, schemaJson: String, codec: String,
      truncate: Boolean) extends BatchWrite {
    private def conf = SparkSession.active.sparkContext.hadoopConfiguration
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      OcfWriterFactory(path, schemaJson, codec, new SerializableConfiguration(conf))
    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val dir = new org.apache.hadoop.fs.Path(path)
      val fs = dir.getFileSystem(conf)
      fs.mkdirs(dir)
      if (truncate) {
        val it = fs.listFiles(dir, true)
        val stale = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.Path]
        while (it.hasNext) {
          val st = it.next()
          if (st.isFile && st.getPath.getName.endsWith(".avro")
              && !st.getPath.getName.startsWith("_tmp-"))
            stale += st.getPath
        }
        stale.foreach(fs.delete(_, false))
      }
      messages.collect { case m: OcfPartMsg => m }.foreach { m =>
        val tmp = new org.apache.hadoop.fs.Path(m.tmpPath)
        if (m.rows > 0L) {
          val dst = new org.apache.hadoop.fs.Path(dir, m.finalName)
          // unchecked fs.rename silently loses the partition (the
          // classic Hadoop pitfall AvroFiles.write already guards)
          if (!fs.rename(tmp, dst) && !fs.exists(dst))
            throw new java.io.IOException(
              s"batch commit rename failed: $tmp -> $dst")
        } else fs.delete(tmp, false) // empty task: no zero-record container
      }
    }
    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
      messages.collect { case m: OcfPartMsg => m }
        .foreach(m => fs.delete(new org.apache.hadoop.fs.Path(m.tmpPath), false))
    }
  }

  /** Streaming half of the writer: per-epoch `batch=<epoch>/` subdirs
    * (the micro-batch archival layout [[graft.streaming.StreamingPipeline.avroSink]]
    * established), same spool + rename-on-commit discipline as the batch
    * writer, plus an `_epochs` ledger so a REPLAYED epoch (restart after
    * a sink-side failure) is dropped wholesale — exactly-once object
    * contents without coordination beyond the driver. */
  final class OcfStreamingWrite(path: String, schemaJson: String, codec: String,
      queryId: String = "")
      extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
    import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory
    private def conf = SparkSession.active.sparkContext.hadoopConfiguration

    override def createStreamingWriterFactory(
        info: PhysicalWriteInfo): StreamingDataWriterFactory = {
      val batchFactory =
        OcfWriterFactory(path, schemaJson, codec, new SerializableConfiguration(conf))
      new StreamingDataWriterFactory {
        override def createWriter(partitionId: Int, taskId: Long,
            epochId: Long): DataWriter[InternalRow] =
          // reuse the batch spool writer; the epoch lands in the part name
          // so concurrent epochs (continuous retries) never collide
          batchFactory.createWriter(partitionId, taskId) match {
            case w => new DataWriter[InternalRow] {
              override def write(r: InternalRow): Unit = w.write(r)
              override def commit(): WriterCommitMessage = w.commit() match {
                case OcfPartMsg(tmp, name, n) =>
                  OcfPartMsg(tmp, s"epoch-$epochId-$name", n)
                case m => m
              }
              override def abort(): Unit = w.abort()
              override def close(): Unit = w.close()
            }
          }
      }
    }

    private def epochsPath = new org.apache.hadoop.fs.Path(path, "_epochs")

    private def committedLines(fs: org.apache.hadoop.fs.FileSystem): Set[String] =
      if (!fs.exists(epochsPath)) Set.empty
      else {
        val in = fs.open(epochsPath)
        try scala.io.Source.fromInputStream(in).getLines()
          .map(_.trim).filter(_.nonEmpty).toSet
        finally in.close()
      }

    /** Epochs retained per query in the ledger. Batch ids are
      * checkpoint-monotone, so a replay can only target the recent
      * tail; without a bound a per-second micro-batch run re-reads and
      * rewrites an ever-growing file inside every driver commit —
      * O(epochs²) cumulative ledger I/O. */
    private val LedgerRetain = 4096

    /** Atomic, bounded ledger rewrite: per-query tail retention, write
      * to temp, FileContext OVERWRITE rename (a delete-then-rename pair
      * leaves a crash window in which the WHOLE committed-epoch record
      * is lost — and with it every dedupe/sweep protection). */
    private def writeLedger(dir: org.apache.hadoop.fs.Path,
        fs: org.apache.hadoop.fs.FileSystem, lines: Set[String]): Unit = {
      // toLongOption, NOT toLong: one corrupt/foreign ledger line with a
      // non-numeric suffix would otherwise throw inside every subsequent
      // commit() of every query on this path — a permanently wedged
      // sink. Unparsable lines sort oldest (MinValue) so retention drops
      // them first; they carry no skip decision anyway (the epoch-dir
      // rewrite is idempotent without them).
      val kept = lines.groupBy(l => l.substring(0, l.lastIndexOf(':')))
        .values.flatMap { ls =>
          ls.toSeq.sortBy(l => l.substring(l.lastIndexOf(':') + 1)
            .toLongOption.getOrElse(Long.MinValue))(Ordering[Long].reverse)
            .take(LedgerRetain)
        }.toSet
      val ledgerTmp = new org.apache.hadoop.fs.Path(dir, "_epochs.tmp")
      val out = fs.create(ledgerTmp, true)
      try out.write(kept.toSeq.sorted.mkString("", "\n", "\n")
        .getBytes("UTF-8"))
      finally out.close()
      org.apache.hadoop.fs.FileContext.getFileContext(dir.toUri, conf)
        .rename(ledgerTmp, epochsPath,
          org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }

    override def commit(epochId: Long,
        messages: Array[WriterCommitMessage]): Unit = {
      val dir = new org.apache.hadoop.fs.Path(path)
      val fs = dir.getFileSystem(conf)
      fs.mkdirs(dir)
      // cross-writer serialization: the incarnation sweep below deletes
      // UN-LEDGERED batch= dirs above this epoch — racing a concurrent
      // committer on a shared archive (parts renamed, ledger not yet
      // written) it would destroy that commit silently
      AvroTable.withArchiveLock(dir, fs) { commitLocked(dir, fs, epochId, messages) }
    }

    private def commitLocked(dir: org.apache.hadoop.fs.Path,
        fs: org.apache.hadoop.fs.FileSystem, epochId: Long,
        messages: Array[WriterCommitMessage]): Unit = {
      val parts = messages.collect { case m: OcfPartMsg => m }
      // QUERY-scoped ledger (r14, the KafkaReplay r13 fix applied to
      // this sink too): bare epoch ids made a fresh-checkpoint rerun
      // SILENTLY DROP its first epochs (its batch 0 matched the dead
      // run's ledgered 0). Unlike the append-log sink, THIS sink's
      // replay is idempotent WITHOUT the ledger — an epoch owns its
      // batch= dir and the commit rewrites it wholesale — so the skip
      // is purely a work-saver and bare legacy lines are never worth a
      // skip decision: they are IGNORED here (a legacy replay just
      // redundantly rewrites identical contents) and garbage-collected
      // by the next ledger rewrite. Claiming them under this queryId
      // instead would fabricate false self-history and re-create the
      // drop for every colliding epoch of the rerun.
      val ledgerKey = s"$queryId:$epochId"
      val scoped = committedLines(fs).filter(_.contains(':'))
      if (scoped.contains(ledgerKey)) {
        parts.foreach(m =>
          fs.delete(new org.apache.hadoop.fs.Path(m.tmpPath), false))
        return
      }
      // incarnation sweep — UN-LEDGERED dirs above this epoch only:
      // those are a dead incarnation's uncommitted leftovers (this
      // run's checkpoint guarantees ITS later epochs never committed),
      // and glob readers over the archive would double-count them. A
      // LEDGERED dir above belongs to another incarnation sharing the
      // archive — deleting it would destroy committed data. Non-numeric
      // batch= names (user artifacts) are left alone, not a crash.
      val committedNums = scoped.flatMap(l =>
        l.substring(l.lastIndexOf(':') + 1).toLongOption)
      fs.listStatus(dir).filter(_.isDirectory).map(_.getPath)
        .filter { d =>
          val n = d.getName
          n.startsWith("batch=") && n.stripPrefix("batch=").toLongOption
            .exists(x => x > epochId && !committedNums.contains(x))
        }
        .foreach(d => fs.delete(d, true))
      val epochDir = new org.apache.hadoop.fs.Path(dir, s"batch=$epochId")
      // a replay whose ORIGINAL attempt crashed between the renames and
      // the ledger write finds batch=<e> populated but un-ledgered: the
      // two attempts' parts carry different task ids (different final
      // names), so a bare re-rename would leave BOTH attempts' files —
      // duplicated rows. The epoch owns its directory: rewrite it
      // wholesale, exactly like the foreachBatch avroSink pattern.
      if (fs.exists(epochDir)) fs.delete(epochDir, true)
      fs.mkdirs(epochDir)
      parts.foreach { m =>
        val tmp = new org.apache.hadoop.fs.Path(m.tmpPath)
        if (m.rows > 0L) {
          val dst = new org.apache.hadoop.fs.Path(epochDir,
            m.finalName.stripPrefix(s"epoch-$epochId-"))
          // unchecked fs.rename silently loses the partition (the
          // classic Hadoop pitfall AvroFiles.write already guards)
          if (!fs.rename(tmp, dst) && !fs.exists(dst))
            throw new java.io.IOException(
              s"epoch commit rename failed: $tmp -> $dst")
        } else fs.delete(tmp, false)
      }
      writeLedger(dir, fs, scoped + ledgerKey)
    }

    override def abort(epochId: Long,
        messages: Array[WriterCommitMessage]): Unit = {
      val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
      messages.collect { case m: OcfPartMsg => m }
        .foreach(m => fs.delete(new org.apache.hadoop.fs.Path(m.tmpPath), false))
    }
  }

  final class OcfTable(path: String, readerSchemaJson: String)
      extends Table with SupportsRead
      with org.apache.spark.sql.connector.catalog.SupportsWrite {
    override def name(): String = s"$ShortName($path)"
    override def schema(): StructType = AvroCodec.sparkStructType(readerSchemaJson)
    override def capabilities(): java.util.Set[TableCapability] =
      Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
        TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE).asJava
    override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
      new OcfScan(path, readerSchemaJson,
        Option(o.get("splitBytes")).map(_.toLong)
          .getOrElse(AvroFiles.DefaultSplitBytes),
        Option(o.get("permissive")).exists(_.toBoolean))
    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
      new WriteBuilder
          with org.apache.spark.sql.connector.write.SupportsTruncate {
        private var doTruncate = false
        override def truncate(): WriteBuilder = { doTruncate = true; this }
        override def build(): Write = new Write {
          private def json = Option(info.options.get("avroSchema"))
            .getOrElse(AvroCodec.avroSchemaJson(info.schema(), "Record", "graft"))
          private def target = Option(info.options.get("path")).getOrElse(path)
          private def codec = Option(info.options.get("codec")).getOrElse("deflate")
          override def toBatch: BatchWrite =
            new OcfBatchWrite(target, json, codec, doTruncate)
          override def toStreaming
              : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
            new OcfStreamingWrite(target, json, codec, info.queryId())
        }
      }
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
  // writes (and user-supplied .schema(...)) hand their own schema to
  // getTable instead of forcing header inference on a possibly-empty dir
  override def supportsExternalMetadata(): Boolean = true
  // per-instance memo of the LAST inference (Spark creates one provider
  // instance per read): getTable would otherwise re-run the recursive
  // listing + header open inferSchema just performed — doubling
  // plan-time latency on exactly the large-prefix case (r14 review)
  @volatile private var lastInferred: Option[(String, StructType, String)] = None
  private def headerJson(path: String): Option[String] =
    lastInferred match {
      case Some((p, _, j)) if p == path => Some(j)
      case _ =>
        AvroFiles.firstWriterSchemaJson(
          SparkSession.active.sparkContext.hadoopConfiguration, path)
    }
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val json = AvroTable.resolveSchemaJson(options)
    val st = AvroCodec.sparkStructType(json)
    Option(options.get("path")).foreach(p => lastInferred = Some((p, st, json)))
    st
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException(s"${AvroTable.ShortName} requires option 'path'"))
    // Precedence (r13): an explicit avroSchema option wins; otherwise a
    // USER-SUPPLIED .schema(...) must be honored — the pre-r13 chain
    // preferred the header probe, silently ignoring the user's reader
    // schema on any non-empty dir. The inferred path is recognized by
    // shape: when the given schema is exactly the header schema's Spark
    // form, keep the richer header JSON (field defaults, record names);
    // anything else is the user's schema and drives the resolution.
    val json = Option(opts.get("avroSchema")).getOrElse {
      headerJson(path) match {
        case Some(hj) if AvroCodec.sparkStructType(hj) == schema => hj
        case _ => AvroCodec.avroSchemaJson(schema, "Record", "graft")
      }
    }
    new AvroTable.OcfTable(path, json)
  }
}
