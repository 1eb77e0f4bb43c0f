package graft.avro

import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter, FileReader}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.InternalDf

/** Avro Object Container File (OCF) source + sink over the plain
  * `org.apache.avro` runtime — the archival/file half of the Avro story
  * (the Confluent wire framing lives in [[AvroCodec]]/[[AvroExpressions]]).
  * The reference pipeline's sink family is format-pluggable
  * (`/root/reference/docker-compose.yml` format.class); OCF is the
  * format a Kafka->object-store pipeline conventionally archives to, so
  * the library reads and writes it natively.
  *
  * Scale design:
  *  - WRITE: one container file per upstream partition, streamed row by
  *    row through a reused DatumWriter — no driver collect, no shuffle;
  *    file sizing is controlled by partitioning the input (exactly the
  *    `flush.size` story, S8). Paths go through the Hadoop FileSystem
  *    API, so the same call sites write `s3a://` URIs; the session's
  *    Hadoop conf is broadcast to tasks.
  *  - READ: sync-marker splits, the same contract a built-in FileFormat
  *    gives parquet — each container is planned as `ceil(len /
  *    splitBytes)` byte ranges, a task seeks to the first Avro sync
  *    marker at-or-after its range start (`FileReader.sync`) and decodes
  *    blocks until `pastSync(end)`, so every block is read by exactly
  *    one task and a multi-GiB archival object parallelizes across the
  *    cluster instead of pinning (and OOMing) one task. Records stream
  *    from the FileSystem (`FsInput`) — no whole-file buffering — and
  *    decode straight to InternalRow with a single reused GenericRecord
  *    per split; schema-evolution reads resolve writer->reader by
  *    standard Avro resolution (the file header carries the writer
  *    schema). Small files are bin-packed several-to-a-task so a 100 TB
  *    prefix of tiny objects doesn't explode the task count.
  */
object AvroFiles {

  private[avro] def codecFactory(name: String): CodecFactory = name match {
    case "null"    => CodecFactory.nullCodec()
    case "deflate" => CodecFactory.deflateCodec(6)
    case "snappy"  => CodecFactory.snappyCodec()
    case "zstandard" => CodecFactory.zstandardCodec(3) // zstd-jni ships with Spark
    case other => throw new IllegalArgumentException(s"unsupported avro codec: $other")
  }

  /** Write `df` (whose schema must be the columnar layout of
    * `schemaJson`, i.e. `AvroCodec.sparkStructType(schemaJson)` modulo
    * nullability) as one `part-NNNNN.avro` container file per non-empty
    * partition under `outDir` (replaced if present). Returns the row
    * count written. */
  def write(df: DataFrame, schemaJson: String, outDir: String,
      codec: String = "deflate", syncIntervalBytes: Int = 64000): Long = {
    val spark = df.sparkSession
    val confAccess = InternalDf.hadoopConfAccessor(spark)
    val dirPath = new Path(outDir)
    val driverFs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (driverFs.exists(dirPath)) driverFs.delete(dirPath, true)
    driverFs.mkdirs(dirPath)
    val codecName = codec
    val counts = InternalDf.toInternalRdd(df).mapPartitionsWithIndex { (pid, rows) =>
      if (!rows.hasNext) Iterator.empty
      else {
        val schema = AvroCodec.parsedSchema(schemaJson)
        // task-commit protocol (r13): stream to an attempt-unique _tmp-
        // spool and atomically rename on completion — a retried or
        // speculative duplicate attempt writing the FINAL name directly
        // would interleave bytes with the original (corrupt container);
        // with the rename the last finisher wins wholesale, and readers
        // never see a half-written file (_tmp- is planner-excluded)
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val fs = new Path(outDir).getFileSystem(confAccess())
        val tmp = new Path(outDir, f"_tmp-part-$pid%05d-$attempt.avro")
        val fin = new Path(outDir, f"part-$pid%05d.avro")
        val out = fs.create(tmp, true)
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
        w.setCodec(codecFactory(codecName))
        w.setSyncInterval(syncIntervalBytes)
        w.create(schema, out)
        var n = 0L
        var ok = false
        try {
          while (rows.hasNext) {
            w.append(AvroCodec.rowToAvro(rows.next(), schema))
            n += 1
          }
          ok = true
        } finally {
          w.close()
          if (ok) {
            // first-finisher-wins (r14): no pre-delete — deleting then
            // renaming lets a speculative duplicate B delete A's
            // COMMITTED file and die before its own rename, silently
            // losing the partition while Spark records the task done.
            // Without the delete, a rename onto an existing final file
            // fails BENIGNLY (a sibling attempt already committed this
            // partition; our identical _tmp spool is just dropped). A
            // false return with NO committed file is a real commit
            // failure and must fail the task, not be ignored — the
            // classic unchecked-fs.rename Hadoop pitfall.
            if (!fs.rename(tmp, fin)) {
              fs.delete(tmp, false)
              if (!fs.exists(fin))
                throw new java.io.IOException(
                  s"avro task commit failed: rename $tmp -> $fin returned " +
                    "false and no committed file exists")
            }
            ()
          } else { fs.delete(tmp, false); () }
        }
        Iterator.single(n)
      }
    }.collect()
    counts.sum
  }

  /** Observable skip accounting for a [[read]] call — the r3 "silent
    * skip" fix. The accumulators fill as the scan executes, surfacing in
    * the Spark UI like any task metric.
    *
    * Validity: read them after exactly ONE successful action over the
    * returned DataFrame. Task retries, speculative duplicates, or a
    * second action re-executing the scan will increment again — this is
    * inherent to Spark accumulators in transformations; treat the values
    * as a per-run diagnostic, not an exactly-once ledger. Granularity:
    * `truncatedFiles` increments once per affected SPLIT — a corrupt
    * tail of a container planned as k byte-ranges can count up to k
    * (each range independently hits the mangled region), so read it as
    * "truncation events observed", not distinct files. */
  final case class ReadMetrics(
      corruptHeaderFiles: org.apache.spark.util.LongAccumulator,
      truncatedFiles: org.apache.spark.util.LongAccumulator)

  /** Target bytes per read task: a container larger than this is split
    * on Avro sync markers into multiple ranges; files (or ranges)
    * smaller than it are bin-packed several-to-a-task. Mirrors
    * `spark.sql.files.maxPartitionBytes`' default. */
  val DefaultSplitBytes: Long = 128L << 20

  /** One planned byte range of one container file. The reader seeks to
    * the first sync marker at-or-after `start` and stops once past
    * `start + length` — the canonical Avro split contract, so ranges
    * tile a file with every block decoded exactly once. */
  final case class OcfSplit(path: String, start: Long, length: Long)

  /** Plan the splits for every `*.avro` under `dir` (recursive),
    * bin-packed into task groups of ~`splitBytes`. Driver-side metadata
    * only. Exposed for tests/planning introspection. */
  def planSplits(spark: SparkSession, dir: String,
      splitBytes: Long): Seq[Seq[OcfSplit]] =
    planSplits(spark.sparkContext.hadoopConfiguration, dir, splitBytes)

  /** [[planSplits]] against an explicit Hadoop configuration (the DSv2
    * table path, where no session travels with the scan). */
  def planSplits(conf: org.apache.hadoop.conf.Configuration, dir: String,
      splitBytes: Long): Seq[Seq[OcfSplit]] = {
    require(splitBytes > 0, s"splitBytes must be positive: $splitBytes")
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf)
    val files = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val it = fs.listFiles(dirPath, true)
    while (it.hasNext) {
      val st = it.next()
      // _tmp- spools are in-flight (or orphaned by a hard-crashed task
      // that never reached abort): half-written containers that would
      // fail a strict read or inflate permissive corrupt counts — the
      // DSv2 commit explicitly excludes the prefix, so must the planner
      val name = st.getPath.getName
      if (st.isFile && name.endsWith(".avro") && !name.startsWith("_tmp-") &&
          st.getLen > 0)
        files += st.getPath.toString -> st.getLen
    }
    val splits = files.sortBy(_._1).flatMap { case (p, len) =>
      (0L until len by splitBytes).map(s => OcfSplit(p, s, math.min(splitBytes, len - s)))
    }
    // greedy pack in listing order: consecutive small files share a task,
    // a full-sized range fills its own
    val bins = scala.collection.mutable.ArrayBuffer.empty[Seq[OcfSplit]]
    var cur = scala.collection.mutable.ArrayBuffer.empty[OcfSplit]
    var curBytes = 0L
    splits.foreach { sp =>
      if (cur.nonEmpty && curBytes + sp.length > splitBytes) {
        bins += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer.empty; curBytes = 0L
      }
      cur += sp; curBytes += sp.length
    }
    if (cur.nonEmpty) bins += cur.toSeq
    bins.toSeq
  }

  /** Read every `*.avro` container file under `dir` (recursively, so
    * streaming-sink `batch=N/` layouts read directly) as a DataFrame
    * with `readerSchemaJson`'s columnar layout. The writer schema comes
    * from each file's header, so passing a DIFFERENT reader schema is
    * the schema-evolution read: reader-added fields take their
    * defaults, writer-only fields are skipped, fields match by name.
    *
    * Containers larger than `splitBytes` are split on sync markers and
    * read by multiple tasks in parallel (see [[planSplits]]); records
    * stream from the FileSystem, so file size never pressures task heap.
    *
    * `permissive = true` is the lake-robustness mode: a file with a
    * corrupt header is skipped entirely, and a file that breaks
    * mid-stream yields its rows up to the corruption — one bad object
    * in a 100 TB prefix must not kill the scan (the S6 malformed-skip
    * semantic applied at container granularity). Strict mode fails the
    * task, surfacing the bad path. Either way the skips are COUNTED —
    * see [[readWithMetrics]]; this overload discards the handle. */
  def read(spark: SparkSession, dir: String, readerSchemaJson: String,
      permissive: Boolean = false,
      splitBytes: Long = DefaultSplitBytes): DataFrame =
    readWithMetrics(spark, dir, readerSchemaJson, permissive, splitBytes)._1

  /** [[read]] plus its [[ReadMetrics]] handle (accumulators are live —
    * read them after an action has executed the scan). */
  def readWithMetrics(spark: SparkSession, dir: String, readerSchemaJson: String,
      permissive: Boolean = false,
      splitBytes: Long = DefaultSplitBytes): (DataFrame, ReadMetrics) = {
    val confAccess = InternalDf.hadoopConfAccessor(spark)
    val corruptHeaderFiles = spark.sparkContext.longAccumulator("ocfCorruptHeaderFiles")
    val truncatedFiles = spark.sparkContext.longAccumulator("ocfTruncatedFiles")
    val bins = planSplits(spark, dir, splitBytes)
    val schema = AvroCodec.sparkStructType(readerSchemaJson)
    val rdd = spark.sparkContext
      .parallelize(bins, math.max(1, bins.size))
      .mapPartitions { binIt =>
        binIt.flatMap(_.iterator).flatMap { sp =>
          decodeSplit(sp, confAccess(), readerSchemaJson, permissive,
            onCorruptHeader = () => corruptHeaderFiles.add(1L),
            onTruncated = () => truncatedFiles.add(1L))
        }
      }
    (InternalDf.fromInternalRdd(spark, rdd, schema),
      ReadMetrics(corruptHeaderFiles, truncatedFiles))
  }

  /** Decode one planned split to InternalRows: open, seek to the first
    * sync marker at-or-after the range start, stream blocks until past
    * the range end. Shared by the RDD read path and the `graft-avro`
    * DSv2 table's partition readers. Permissive-mode skips invoke the
    * callbacks (a corrupt header is attributed only to the split owning
    * byte 0, so a multi-split file counts once). */
  private[avro] def decodeSplit(sp: OcfSplit,
      conf: org.apache.hadoop.conf.Configuration,
      readerSchemaJson: String, permissive: Boolean,
      onCorruptHeader: () => Unit, onTruncated: () => Unit): Iterator[InternalRow] = {
    val readerSchema = AvroCodec.parsedSchema(readerSchemaJson)
    val opened: Option[FileReader[GenericRecord]] =
      try {
        val in = new FsInput(new Path(sp.path), conf)
        try Some(DataFileReader.openReader(in,
          new GenericDatumReader[GenericRecord](null, readerSchema)))
        catch { case scala.util.control.NonFatal(e) => in.close(); throw e }
      } catch { case scala.util.control.NonFatal(e) =>
        if (!permissive) throw e
        if (sp.start == 0L) onCorruptHeader()
        None
      }
    opened match {
      case None => Iterator.empty
      case Some(r) =>
        // early-terminated scans (limit(n), take, a failed downstream
        // task) abandon the iterator before exhaustion and the on-done
        // close below never runs — the task-completion listener closes
        // the reader (and its FS input stream) then; a second close
        // after normal exhaustion is a safe no-op
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            try r.close()
            catch { case scala.util.control.NonFatal(_) => }))
        val splitEnd = sp.start + sp.length
        // seek to the first block at-or-after our range start; a file
        // mangled badly enough that the seek itself fails is a
        // truncation in permissive mode
        val positioned =
          try { r.sync(sp.start); true }
          catch { case scala.util.control.NonFatal(e) =>
            r.close()
            if (!permissive) throw e
            onTruncated(); false
          }
        if (!positioned) Iterator.empty
        else new Iterator[InternalRow] {
          // one-row lookahead: decode happens inside hasNext so a
          // corrupt tail can end the iteration cleanly instead of
          // throwing after hasNext already promised an element
          private var rec: GenericRecord = null
          private var pending: InternalRow = null
          private var done = false
          private def advance(): Unit =
            try {
              if (r.hasNext && !r.pastSync(splitEnd)) {
                rec = r.next(rec)
                pending = AvroCodec.avroToRow(rec, readerSchema)
              } else { done = true; r.close() }
            } catch {
              // config-vs-data split (r14, mirroring AvroCodec
              // .decodeEvolved's wire-path discipline): a schema-
              // RESOLUTION failure is a CONFIGURATION error — an
              // incompatible reader schema fails every record of every
              // split, and swallowing it as "truncation" silently
              // returns an EMPTY dataset for the whole read. Only
              // data-shaped failures (torn blocks, mangled codecs) are
              // permissive-skippable.
              case e: org.apache.avro.AvroTypeException =>
                r.close(); throw e
              case scala.util.control.NonFatal(e) =>
                if (!permissive) throw e
                onTruncated()
                done = true; r.close()
            }
          def hasNext: Boolean = {
            if (pending == null && !done) advance()
            pending != null
          }
          def next(): InternalRow = {
            if (!hasNext) throw new java.util.NoSuchElementException
            val out = pending
            pending = null
            out
          }
        }
    }
  }

  /** Writer schema of the first container under `dir` — the DSv2
    * table's schema-inference probe (header-only read). */
  private[avro] def firstWriterSchemaJson(
      conf: org.apache.hadoop.conf.Configuration, dir: String): Option[String] = {
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf)
    if (!fs.exists(dirPath)) return None
    val it = fs.listFiles(dirPath, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".avro") &&
          !st.getPath.getName.startsWith("_tmp-") && st.getLen > 0) {
        val in = new FsInput(st.getPath, conf)
        try {
          val r = DataFileReader.openReader(in,
            new GenericDatumReader[GenericRecord]())
          try return Some(r.getSchema.toString) finally r.close()
        } catch { case scala.util.control.NonFatal(_) => in.close() }
      }
    }
    None
  }
}
