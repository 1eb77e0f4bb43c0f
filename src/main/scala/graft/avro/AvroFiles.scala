package graft.avro

import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions.col
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
  *  - READ: one task per file (`binaryFile` listing); records decode
  *    straight to InternalRow with a single reused GenericRecord per
  *    file, and schema-evolution reads resolve writer->reader by
  *    standard Avro resolution (the file header carries the writer
  *    schema). A 100 TB corpus of OCF files parallelizes by file count —
  *    the writer's one-file-per-partition contract keeps those sized.
  *    (Finer-than-file splits via Avro sync markers would need a full
  *    FileFormat implementation; per-file tasks are the public-API path.)
  */
object AvroFiles {

  private def codecFactory(name: String): CodecFactory = name match {
    case "null"    => CodecFactory.nullCodec()
    case "deflate" => CodecFactory.deflateCodec(6)
    case "snappy"  => CodecFactory.snappyCodec()
    case other => throw new IllegalArgumentException(s"unsupported avro codec: $other")
  }

  /** Write `df` (whose schema must be the columnar layout of
    * `schemaJson`, i.e. `AvroCodec.sparkStructType(schemaJson)` modulo
    * nullability) as one `part-NNNNN.avro` container file per non-empty
    * partition under `outDir` (replaced if present). Returns the row
    * count written. */
  def write(df: DataFrame, schemaJson: String, outDir: String,
      codec: String = "deflate"): Long = {
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
        val p = new Path(outDir, f"part-$pid%05d.avro")
        val out = p.getFileSystem(confAccess()).create(p, true)
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
        w.setCodec(codecFactory(codecName))
        w.create(schema, out)
        var n = 0L
        try {
          while (rows.hasNext) {
            w.append(AvroCodec.rowToAvro(rows.next(), schema))
            n += 1
          }
        } finally w.close()
        Iterator.single(n)
      }
    }.collect()
    counts.sum
  }

  /** Observable skip accounting for a [[read]] call — the r3 "silent
    * skip" fix. `oversizedSkipped` is resolved at plan time from the
    * file listing (metadata only — oversized content is never loaded);
    * the two accumulators fill as the scan executes, surfacing in the
    * Spark UI like any task metric. */
  final case class ReadMetrics(
      oversizedSkipped: Long,
      corruptHeaderFiles: org.apache.spark.util.LongAccumulator,
      truncatedFiles: org.apache.spark.util.LongAccumulator)

  /** Per-file on-heap ceiling for [[read]]: the whole-file `binaryFile`
    * path materializes each container in task memory, so a multi-GiB
    * object would OOM the task. Files above the cap are skipped (and
    * counted) in permissive mode, or fail fast with their paths in
    * strict mode — BEFORE any content is read. Finer-than-file sync-
    * marker splits need a full FileFormat; this is the public-API
    * guard. */
  val DefaultMaxFileBytes: Long = 512L << 20

  /** Read every `*.avro` container file under `dir` (recursively, so
    * streaming-sink `batch=N/` layouts read directly) as a DataFrame
    * with `readerSchemaJson`'s columnar layout. The writer schema comes
    * from each file's header, so passing a DIFFERENT reader schema is
    * the schema-evolution read: reader-added fields take their
    * defaults, writer-only fields are skipped, fields match by name.
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
      maxFileBytes: Long = DefaultMaxFileBytes): DataFrame =
    readWithMetrics(spark, dir, readerSchemaJson, permissive, maxFileBytes)._1

  /** [[read]] plus its [[ReadMetrics]] handle (accumulators are live —
    * read them after an action has executed the scan). */
  def readWithMetrics(spark: SparkSession, dir: String, readerSchemaJson: String,
      permissive: Boolean = false,
      maxFileBytes: Long = DefaultMaxFileBytes): (DataFrame, ReadMetrics) = {
    val listing = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro")
      .option("recursiveFileLookup", "true")
      .load(dir)
    // metadata-only pre-flight: binaryFile prunes `content` when it is
    // not selected and pushes the length filter, so oversized objects
    // cost a listing row, not a heap allocation
    val oversized = listing.filter(col("length") > maxFileBytes)
      .select("path").limit(21).collect().map(_.getString(0))
    if (oversized.nonEmpty && !permissive)
      throw new IllegalStateException(
        s"OCF file(s) exceed maxFileBytes=$maxFileBytes (whole-file read " +
          s"would OOM the task): ${oversized.take(3).mkString(", ")}" +
          (if (oversized.length > 3) s" … (${oversized.length}+ files)" else "") +
          " — raise maxFileBytes, re-shard the writer, or read permissive")
    val corruptHeaderFiles = spark.sparkContext.longAccumulator("ocfCorruptHeaderFiles")
    val truncatedFiles = spark.sparkContext.longAccumulator("ocfTruncatedFiles")
    val files = listing
      .filter(col("length") <= maxFileBytes)
      .select("content")
    val schema = AvroCodec.sparkStructType(readerSchemaJson)
    val rows = InternalDf.toInternalRdd(files).mapPartitions { parts =>
      parts.flatMap { fileRow =>
        val bytes = fileRow.getBinary(0)
        val readerSchema = AvroCodec.parsedSchema(readerSchemaJson)
        val opened =
          try Some(new DataFileReader[GenericRecord](
            new SeekableByteArrayInput(bytes),
            new GenericDatumReader[GenericRecord](null, readerSchema)))
          catch { case scala.util.control.NonFatal(e) =>
            if (permissive) { corruptHeaderFiles.add(1L); None } else throw e
          }
        opened match {
          case None => Iterator.empty
          case Some(r) => new Iterator[InternalRow] {
            // one-row lookahead: decode happens inside hasNext so a
            // corrupt tail can end the iteration cleanly instead of
            // throwing after hasNext already promised an element
            private var rec: GenericRecord = null
            private var pending: InternalRow = null
            private var done = false
            private def advance(): Unit =
              try {
                if (r.hasNext) {
                  rec = r.next(rec)
                  pending = AvroCodec.avroToRow(rec, readerSchema)
                } else { done = true; r.close() }
              } catch { case scala.util.control.NonFatal(e) =>
                if (!permissive) throw e
                truncatedFiles.add(1L)
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
    }
    (InternalDf.fromInternalRdd(spark, rows, schema),
      ReadMetrics(oversized.length.toLong, corruptHeaderFiles, truncatedFiles))
  }
}
