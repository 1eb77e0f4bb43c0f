package graft.avro

import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
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
    * task, surfacing the bad path. */
  def read(spark: SparkSession, dir: String, readerSchemaJson: String,
      permissive: Boolean = false): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro")
      .option("recursiveFileLookup", "true")
      .load(dir)
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
            if (permissive) None else throw e
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
    InternalDf.fromInternalRdd(spark, rows, schema)
  }
}
