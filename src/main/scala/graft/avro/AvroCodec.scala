package graft.avro

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericFixed, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.avro.util.Utf8

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro wire codec over the plain `org.apache.avro` runtime (avro-1.12.1
  * ships with Spark's jars; the `spark-avro` module does not, so the
  * Catalyst<->Avro bridge is implemented here from the public Avro API).
  *
  * Wire format is the Confluent framing the reference actually produces
  * (`/root/reference/producer/producer.py:40` AvroSerializer;
  * `/root/reference/docker-compose.yml` value.converter=AvroConverter):
  * one magic byte 0x00, a 4-byte big-endian schema id, then the Avro
  * binary body. The schema itself is a config input (the Schema-Registry
  * fetch is out of scope per SURVEY.md §1.2 — the id is carried, not
  * resolved).
  *
  * Scale design: these are static kernels shared by interpreted eval and
  * whole-stage codegen (the TextHashOps pattern — one static call per
  * row, no CodegenFallback). Parsed schemas are cached process-wide;
  * datum readers/writers and Avro binary decoders/encoders are reused
  * per thread, so the per-row cost is the Avro decode itself with zero
  * setup allocation. Supported type lattice: record, string, int, long,
  * float, double, boolean, bytes, fixed, enum, array, map(string->v),
  * 2-branch null unions (producer.py:18-19), and the logical types a
  * production registry estate carries — `date` (int),
  * `timestamp-micros`/`timestamp-millis` (long), `decimal`
  * (bytes/fixed) — the full surface the reference's schema can express
  * plus the usual evolution moves.
  */
object AvroCodec {

  val MagicByte: Byte = 0x00

  // ---- schema handling --------------------------------------------------

  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, Schema]()

  def parsedSchema(json: String): Schema =
    schemaCache.computeIfAbsent(json, j => new Schema.Parser().parse(j))

  /** The non-null branch of a `["null", X]` union (either order); identity
    * for non-unions. Unions with 2+ non-null branches are rejected — they
    * have no stable columnar rendering. */
  private def nonNull(s: Schema): Schema = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(branches.size == 1,
        s"unsupported union ${s}: exactly one non-null branch required")
      branches.head
    case _ => s
  }

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION &&
      s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  // ---- logical types (r15, VERDICT r14 ask #3) ---------------------------
  // The first real-estate gap a production registry hits: `date` (int),
  // `timestamp-micros`/`timestamp-millis` (long), and `decimal`
  // (bytes/fixed, two's-complement unscaled big-endian). Spark's
  // internal representations line up exactly for date (int days) and
  // timestamp-micros (long micros); millis scale by 1000; decimal
  // round-trips through the unscaled BigInteger.

  private def logicalName(s: Schema): String = {
    val lt = s.getLogicalType
    if (lt != null) lt.getName else ""
  }

  private def decimalOf(s: Schema): Option[(Int, Int)] = s.getLogicalType match {
    case d: org.apache.avro.LogicalTypes.Decimal => Some((d.getPrecision, d.getScale))
    case _ => None
  }

  // ---- multi-branch unions (r15, VERDICT r14 ask #6) ---------------------
  // Beyond ["null", T]: the spark-avro convention. The two numeric
  // widenings ([int,long] -> long, [float,double] -> double) collapse to
  // one column; anything else renders as a struct-of-branches
  // (member0..memberN-1, exactly one non-null per value). Encode is the
  // exact inverse: widened columns write the WIDE branch (long/double —
  // deterministic and lossless; narrowing back to int/float would be a
  // silent range gamble), struct-of-branches writes the single non-null
  // member's branch and rejects 0- or 2+-non-null structs loudly (no
  // silent branch-choice policy).

  /** Per-union dispatch info, computed ONCE per schema (the decode path
    * is per-row — rebuilding branch seqs/kind sets per value would break
    * the file-level zero-setup-allocation promise). `widen`: 1 =
    * [int,long]→long, 2 = [float,double]→double, 0 = struct-of-branches.
    * `memberOfUnionPos` maps Avro's resolveUnion index (over the FULL
    * union, null branch included) to the struct member position. */
  private final case class UnionInfo(widen: Int, branches: Array[Schema],
      memberOfUnionPos: Array[Int])

  // Avro Schema memoizes hashCode, so the per-row lookup is one hash map
  // probe — the same cost class as the thread-state reader cache
  private val unionInfoCache =
    new java.util.concurrent.ConcurrentHashMap[Schema, UnionInfo]()

  private def unionInfo(u: Schema): UnionInfo =
    unionInfoCache.computeIfAbsent(u, u => {
      val branches = u.getTypes.asScala
        .filter(_.getType != Schema.Type.NULL).toArray
      val kinds = branches.map(_.getType).toSet
      // widening is a RAW-number convenience only: a logical-typed branch
      // (date int, timestamp long) must keep its own column — collapsing
      // [date, long] to one long slot would silently strip the date
      // semantics on decode and guess them back on encode (r16)
      val anyLogical = branches.exists(b => b.getLogicalType != null)
      val widen =
        if (anyLogical) 0
        else if (kinds == Set(Schema.Type.INT, Schema.Type.LONG)) 1
        else if (kinds == Set(Schema.Type.FLOAT, Schema.Type.DOUBLE)) 2
        else 0
      val memberOf = u.getTypes.asScala
        .map(b => branches.indexWhere(_ eq b)).toArray
      UnionInfo(widen, branches, memberOf)
    })

  private def isMultiUnion(s: Schema): Boolean =
    s.getType == Schema.Type.UNION && unionInfo(s).branches.length > 1

  private def multiUnionSparkType(info: UnionInfo): DataType = info.widen match {
    case 1 => LongType
    case 2 => DoubleType
    case _ => StructType(info.branches.zipWithIndex.map { case (b, i) =>
      StructField(s"member$i", sparkType(b), nullable = true)
    })
  }

  private def multiUnionToCatalyst(v: AnyRef, union: Schema): Any = {
    val info = unionInfo(union)
    info.widen match {
      case 1 => v.asInstanceOf[Number].longValue()
      case 2 => v.asInstanceOf[Number].doubleValue()
      case _ =>
        // the datum's runtime type picks the branch (standard Avro
        // resolution); all other members stay null
        val idx = GenericData.get().resolveUnion(union, v)
        val member = info.memberOfUnionPos(idx)
        val out = new Array[Any](info.branches.length)
        out(member) = toCatalyst(v, info.branches(member))
        new GenericInternalRow(out)
    }
  }

  /** Avro schema -> Spark DataType (mirrors spark-avro's public mapping,
    * including its multi-branch union rendering). */
  def sparkType(s: Schema): DataType = if (isMultiUnion(s))
    multiUnionSparkType(unionInfo(s))
  else nonNull(s).getType match {
    case Schema.Type.RECORD =>
      StructType(nonNull(s).getFields.asScala.map { f =>
        StructField(f.name, sparkType(f.schema), nullable = isNullable(f.schema))
      }.toArray)
    case Schema.Type.STRING  => StringType
    case Schema.Type.ENUM    => StringType
    case Schema.Type.INT =>
      if (logicalName(nonNull(s)) == "date") DateType else IntegerType
    case Schema.Type.LONG => logicalName(nonNull(s)) match {
      case "timestamp-micros" | "timestamp-millis" => TimestampType
      // no-zone wire timestamps map to Spark's no-zone type — both are
      // "wall-clock micros", so the values pass through untouched
      case "local-timestamp-micros" | "local-timestamp-millis" => TimestampNTZType
      case _ => LongType
    }
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES =>
      decimalOf(nonNull(s)).map { case (p, sc) => DecimalType(p, sc) }
        .getOrElse(BinaryType)
    case Schema.Type.FIXED =>
      decimalOf(nonNull(s)).map { case (p, sc) => DecimalType(p, sc) }
        .getOrElse(BinaryType)
    case Schema.Type.ARRAY =>
      val el = nonNull(s).getElementType
      ArrayType(sparkType(el), containsNull = isNullable(el))
    case Schema.Type.MAP =>
      val v = nonNull(s).getValueType
      MapType(StringType, sparkType(v), valueContainsNull = isNullable(v))
    case t => throw new UnsupportedOperationException(s"avro type $t")
  }

  def sparkStructType(schemaJson: String): StructType =
    sparkType(parsedSchema(schemaJson)).asInstanceOf[StructType]

  /** Spark DataType -> Avro schema, the inverse of [[sparkType]] —
    * the derived-schema path for the `graft-avro` writer when a caller
    * hands a DataFrame without an explicit avroSchema. Nullability maps
    * to `["null", T]` unions; nested struct fields get record names
    * derived from their field path (Avro requires unique record names). */
  def avroType(dt: DataType, nullable: Boolean, recName: String,
      namespace: String): Schema = {
    val base = dt match {
      case StructType(fields) =>
        Schema.createRecord(recName, null, namespace, false,
          fields.toSeq.map { f =>
            new Schema.Field(f.name,
              avroType(f.dataType, f.nullable, recName + "_" + f.name, namespace),
              null,
              if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
          }.asJava)
      case StringType  => Schema.create(Schema.Type.STRING)
      case IntegerType => Schema.create(Schema.Type.INT)
      case DateType =>
        org.apache.avro.LogicalTypes.date()
          .addToSchema(Schema.create(Schema.Type.INT))
      case TimestampType =>
        org.apache.avro.LogicalTypes.timestampMicros()
          .addToSchema(Schema.create(Schema.Type.LONG))
      case TimestampNTZType =>
        org.apache.avro.LogicalTypes.localTimestampMicros()
          .addToSchema(Schema.create(Schema.Type.LONG))
      case dt: DecimalType =>
        org.apache.avro.LogicalTypes.decimal(dt.precision, dt.scale)
          .addToSchema(Schema.create(Schema.Type.BYTES))
      // Short/Byte must NOT silently map to Avro INT: the write path's
      // typed getters are driven by the AVRO type, so an INT-slot read
      // against a 2-byte UnsafeRow slot zero-extends (-1: Short becomes
      // 65535 on disk) — silent corruption. Fail loudly; callers cast.
      case ShortType | ByteType => throw new UnsupportedOperationException(
        s"avro encoding of ${dt.simpleString} is not supported: cast the " +
          "column to int first (a silent int-slot read would corrupt " +
          "negative values)")
      case LongType    => Schema.create(Schema.Type.LONG)
      case FloatType   => Schema.create(Schema.Type.FLOAT)
      case DoubleType  => Schema.create(Schema.Type.DOUBLE)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case BinaryType  => Schema.create(Schema.Type.BYTES)
      case ArrayType(el, containsNull) =>
        Schema.createArray(avroType(el, containsNull, recName + "_item", namespace))
      case MapType(StringType, v, valueContainsNull) =>
        Schema.createMap(avroType(v, valueContainsNull, recName + "_value", namespace))
      case t => throw new UnsupportedOperationException(
        s"cannot derive an avro schema for spark type ${t.simpleString}")
    }
    if (nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
  }

  /** Derive a record schema JSON for a whole DataFrame schema. */
  def avroSchemaJson(st: StructType, name: String = "Record",
      namespace: String = "graft"): String =
    avroType(st, nullable = false, name, namespace).toString

  // ---- per-thread runtime state ----------------------------------------

  private final class ThreadState {
    val readers = new java.util.HashMap[String, GenericDatumReader[GenericRecord]]()
    val writers = new java.util.HashMap[String, GenericDatumWriter[GenericRecord]]()
    var decoder: BinaryDecoder = _
    var encoder: BinaryEncoder = _
    val bytesOut = new ByteArrayOutputStream(256)
  }

  private val state = new ThreadLocal[ThreadState] {
    override def initialValue(): ThreadState = new ThreadState
  }

  // ---- decode -----------------------------------------------------------

  /** Confluent-framed bytes -> InternalRow. Strict mode throws on a bad
    * frame or truncated body; permissive mode returns null instead (the
    * S6 malformed-skip semantic — DROPMALFORMED via `.filter(isNotNull)`). */
  def decode(bytes: Array[Byte], schemaJson: String, permissive: Boolean): InternalRow =
    decodeEvolved(bytes, schemaJson, schemaJson, permissive)

  /** Schema-evolution read (the registry story): payloads written with
    * `writerJson` are resolved against `readerJson` by standard Avro
    * resolution — reader-added fields take their defaults, writer-only
    * fields are skipped, field order is matched by name. The columnar
    * layout is the READER schema's. */
  def decodeEvolved(bytes: Array[Byte], writerJson: String, readerJson: String,
      permissive: Boolean): InternalRow = {
    // schema parsing and reader construction live OUTSIDE the permissive
    // catch: a malformed reader/writer schema JSON is a CONFIGURATION
    // error, and swallowing it per-row would null every record — the
    // downstream malformed-skip filter then silently drops the whole
    // dataset instead of failing fast on the typo
    val st = state.get()
    val readerSchema = parsedSchema(readerJson)
    val cacheKey = writerJson + "\u0000" + readerJson
    var reader = st.readers.get(cacheKey)
    if (reader == null) {
      reader = new GenericDatumReader[GenericRecord](
        parsedSchema(writerJson), readerSchema)
      st.readers.put(cacheKey, reader)
    }
    try {
      if (bytes.length < 5 || bytes(0) != MagicByte)
        throw new IllegalArgumentException(
          s"not a Confluent-framed Avro payload (len=${bytes.length})")
      st.decoder = DecoderFactory.get().binaryDecoder(bytes, 5, bytes.length - 5, st.decoder)
      val rec = reader.read(null, st.decoder)
      toCatalyst(rec, readerSchema).asInstanceOf[InternalRow]
    } catch {
      case scala.util.control.NonFatal(_) if permissive => null
    }
  }

  /** The schema id from the Confluent frame header (S4 passthrough). */
  def frameSchemaId(bytes: Array[Byte]): Int = {
    require(bytes.length >= 5 && bytes(0) == MagicByte, "bad frame")
    ByteBuffer.wrap(bytes, 1, 4).getInt
  }

  /** A frame carries a schema id the registry map doesn't know — typed so
    * strict callers can catch it apart from data corruption, and so the
    * message names both the id and the known set (a consumer's first
    * question). Permissive mode nulls the row instead (the DLQ branch
    * keeps it addressable via `avro_schema_id`). */
  final class UnknownSchemaIdException(val id: Int, known: java.util.Set[Integer])
    extends RuntimeException(
      s"avro frame carries schema id $id, not in the registry map " +
        s"(known ids: ${new java.util.TreeSet[Integer](known)})")

  /** Per-record writer-schema dispatch (the reference's registry
    * AvroDeserializer behavior, `producer/verifier_ui.py:34,66`): each
    * Confluent frame's header id resolves its OWN writer schema from
    * `registry`, and the body decodes against the shared `readerJson`
    * layout — so one pass over a long-retention topic whose value schema
    * evolved mid-stream decodes every era's records, exactly like the
    * Confluent deserializer's id→schema cache. Per-row cost: one map
    * probe on top of [[decodeEvolved]]'s cached (writer, reader) datum
    * reader — the id dispatch adds no per-row allocation.
    *
    * Strict mode throws [[UnknownSchemaIdException]] on an unmapped id
    * (and propagates bad frames); permissive nulls the row either way,
    * leaving the frame id readable for the DLQ branch. */
  def decodeRegistry(bytes: Array[Byte],
      registry: java.util.Map[Integer, String], readerJson: String,
      permissive: Boolean): InternalRow = {
    if (bytes.length < 5 || bytes(0) != MagicByte) {
      if (permissive) return null
      throw new IllegalArgumentException(
        s"not a Confluent-framed Avro payload (len=${bytes.length})")
    }
    val id = ByteBuffer.wrap(bytes, 1, 4).getInt
    val writerJson = registry.get(id)
    if (writerJson == null) {
      if (permissive) return null
      throw new UnknownSchemaIdException(id, registry.keySet())
    }
    decodeEvolved(bytes, writerJson, readerJson, permissive)
  }

  /** Record -> InternalRow with the given (reader) schema's layout — the
    * container-file read path ([[AvroFiles]]). */
  private[avro] def avroToRow(rec: GenericRecord, schema: Schema): InternalRow =
    toCatalyst(rec, schema).asInstanceOf[InternalRow]

  /** InternalRow (layout = `sparkType(schema)`) -> Record — the
    * container-file write path ([[AvroFiles]]). */
  private[avro] def rowToAvro(row: InternalRow, schema: Schema): GenericRecord =
    toAvro(row, schema).asInstanceOf[GenericRecord]

  private def toCatalyst(v: AnyRef, s0: Schema): Any = {
    if (v == null) return null
    if (isMultiUnion(s0))
      return multiUnionToCatalyst(v, s0)
    val s = nonNull(s0)
    s.getType match {
      case Schema.Type.RECORD =>
        val rec = v.asInstanceOf[GenericRecord]
        val fields = s.getFields
        val out = new Array[Any](fields.size)
        var i = 0
        while (i < fields.size) {
          out(i) = toCatalyst(rec.get(i).asInstanceOf[AnyRef], fields.get(i).schema)
          i += 1
        }
        new GenericInternalRow(out)
      case Schema.Type.STRING | Schema.Type.ENUM =>
        UTF8String.fromString(v.toString)
      case Schema.Type.LONG if logicalName(s) == "timestamp-millis" ||
          logicalName(s) == "local-timestamp-millis" =>
        // Spark carries micros (both TZ flavors); the wire carries millis
        java.lang.Long.valueOf(v.asInstanceOf[java.lang.Long].longValue() * 1000L)
      case Schema.Type.INT | Schema.Type.LONG | Schema.Type.FLOAT |
           Schema.Type.DOUBLE | Schema.Type.BOOLEAN => v
      // date (int days) and timestamp-micros (long micros) pass through
      // the INT/LONG arms above — Spark's internal representations are
      // identical to the Avro wire values.
      case Schema.Type.BYTES =>
        val bb = v.asInstanceOf[ByteBuffer]
        val arr = new Array[Byte](bb.remaining())
        bb.duplicate().get(arr)
        decimalOf(s) match {
          case Some((p, sc)) => decimalFromUnscaled(arr, p, sc)
          case None => arr
        }
      case Schema.Type.FIXED =>
        val arr = v.asInstanceOf[GenericFixed].bytes().clone()
        decimalOf(s) match {
          case Some((p, sc)) => decimalFromUnscaled(arr, p, sc)
          case None => arr
        }
      case Schema.Type.ARRAY =>
        val el = s.getElementType
        val coll = v.asInstanceOf[java.util.Collection[AnyRef]]
        val out = new Array[Any](coll.size)
        val it = coll.iterator()
        var i = 0
        while (it.hasNext) { out(i) = toCatalyst(it.next(), el); i += 1 }
        new GenericArrayData(out)
      case Schema.Type.MAP =>
        val vt = s.getValueType
        val m = v.asInstanceOf[java.util.Map[AnyRef, AnyRef]]
        val ks = new Array[Any](m.size)
        val vs = new Array[Any](m.size)
        val it = m.entrySet().iterator()
        var i = 0
        while (it.hasNext) {
          val e = it.next()
          ks(i) = UTF8String.fromString(e.getKey.toString)
          vs(i) = toCatalyst(e.getValue, vt)
          i += 1
        }
        ArrayBasedMapData(ks, vs)
      case t => throw new UnsupportedOperationException(s"avro type $t")
    }
  }

  // ---- encode -----------------------------------------------------------

  /** InternalRow (whose layout is `sparkType(schema)`) -> Confluent-framed
    * Avro bytes carrying `schemaId` in the header. */
  def encode(row: InternalRow, schemaJson: String, schemaId: Int): Array[Byte] = {
    val st = state.get()
    val schema = parsedSchema(schemaJson)
    var writer = st.writers.get(schemaJson)
    if (writer == null) {
      writer = new GenericDatumWriter[GenericRecord](schema)
      st.writers.put(schemaJson, writer)
    }
    val rec = toAvro(row, schema).asInstanceOf[GenericRecord]
    val out = st.bytesOut
    out.reset()
    out.write(MagicByte.toInt)
    out.write((schemaId >>> 24) & 0xFF)
    out.write((schemaId >>> 16) & 0xFF)
    out.write((schemaId >>> 8) & 0xFF)
    out.write(schemaId & 0xFF)
    st.encoder = EncoderFactory.get().directBinaryEncoder(out, st.encoder)
    writer.write(rec, st.encoder)
    st.encoder.flush()
    out.toByteArray
  }

  /** Struct-of-branches InternalRow -> the single non-null member's Avro
    * datum. The datum's runtime class then drives the writer's standard
    * union resolution, so the wire branch index is exactly the member's
    * position in the full union. */
  private def multiUnionToAvro(v: Any, union: Schema): AnyRef = {
    val info = unionInfo(union)
    info.widen match {
      case 1 => v.asInstanceOf[AnyRef] // long slot -> long branch
      case 2 => v.asInstanceOf[AnyRef] // double slot -> double branch
      case _ =>
        val row = v.asInstanceOf[InternalRow]
        var member = -1
        var i = 0
        while (i < info.branches.length) {
          if (!row.isNullAt(i)) {
            require(member < 0, s"union encode: struct-of-branches value " +
              s"has members $member and $i both set for $union — exactly " +
              "one non-null member required")
            member = i
          }
          i += 1
        }
        require(member >= 0, s"union encode: struct-of-branches value has " +
          s"no non-null member for $union (a null UNION value must be a " +
          "null STRUCT, not a struct of nulls)")
        val branch = info.branches(member)
        toAvro(getMulti(row, member, branch), branch)
    }
  }

  /** Typed slot getter that also understands union-typed slots: a
    * multi-branch union reads per its rendered Spark slot (long / double /
    * struct-of-branches), a plain nullable union reads its non-null
    * branch's slot, anything else is [[get]]. */
  private def getMulti(row: InternalRow, i: Int, s: Schema): Any =
    if (isMultiUnion(s)) unionInfo(s).widen match {
      case 1 => row.getLong(i)
      case 2 => row.getDouble(i)
      case _ => row.getStruct(i, unionInfo(s).branches.length)
    } else get(row, i, nonNull(s))

  /** [[getMulti]] over an ArrayData slot. */
  private def getMultiArray(arr: ArrayData, i: Int, s: Schema): Any =
    if (isMultiUnion(s)) unionInfo(s).widen match {
      case 1 => arr.getLong(i)
      case 2 => arr.getDouble(i)
      case _ => arr.getStruct(i, unionInfo(s).branches.length)
    } else getArray(arr, i, nonNull(s))

  private def toAvro(v: Any, s0: Schema): AnyRef = {
    if (v == null) return null
    if (isMultiUnion(s0)) return multiUnionToAvro(v, s0)
    val s = nonNull(s0)
    s.getType match {
      case Schema.Type.RECORD =>
        val row = v.asInstanceOf[InternalRow]
        val fields = s.getFields
        val rec = new GenericData.Record(s)
        var i = 0
        while (i < fields.size) {
          val fs = fields.get(i).schema
          val fv =
            if (row.isNullAt(i)) null
            else toAvro(getMulti(row, i, fs), fs)
          rec.put(i, fv)
          i += 1
        }
        rec
      case Schema.Type.STRING => new Utf8(v.asInstanceOf[UTF8String].getBytes)
      case Schema.Type.ENUM =>
        new GenericData.EnumSymbol(s, v.asInstanceOf[UTF8String].toString)
      case Schema.Type.LONG if logicalName(s) == "timestamp-millis" ||
          logicalName(s) == "local-timestamp-millis" =>
        // Spark carries micros; the wire wants millis. Sub-ms precision
        // is truncated (floorDiv: toward negative infinity, so pre-1970
        // instants truncate the same direction as post-1970).
        java.lang.Long.valueOf(java.lang.Math.floorDiv(v.asInstanceOf[Long], 1000L))
      case Schema.Type.INT | Schema.Type.LONG | Schema.Type.FLOAT |
           Schema.Type.DOUBLE | Schema.Type.BOOLEAN => v.asInstanceOf[AnyRef]
      case Schema.Type.BYTES => decimalOf(s) match {
        case Some((_, sc)) => ByteBuffer.wrap(unscaledBytes(v, sc))
        case None => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      }
      case Schema.Type.FIXED => decimalOf(s) match {
        case Some((_, sc)) =>
          new GenericData.Fixed(s, signExtendTo(unscaledBytes(v, sc), s.getFixedSize))
        case None => new GenericData.Fixed(s, v.asInstanceOf[Array[Byte]])
      }
      case Schema.Type.ARRAY =>
        val el = s.getElementType
        val arr = v.asInstanceOf[ArrayData]
        val out = new java.util.ArrayList[AnyRef](arr.numElements())
        var i = 0
        while (i < arr.numElements()) {
          out.add(if (arr.isNullAt(i)) null
            else toAvro(getMultiArray(arr, i, el), el))
          i += 1
        }
        out
      case Schema.Type.MAP =>
        val vt = s.getValueType
        val m = v.asInstanceOf[MapData]
        val keys = m.keyArray()
        val vals = m.valueArray()
        val out = new java.util.HashMap[Utf8, AnyRef](m.numElements() * 2)
        var i = 0
        while (i < m.numElements()) {
          val mv = if (vals.isNullAt(i)) null
            else toAvro(getMultiArray(vals, i, vt), vt)
          out.put(new Utf8(keys.getUTF8String(i).getBytes), mv)
          i += 1
        }
        out
      case t => throw new UnsupportedOperationException(s"avro type $t")
    }
  }

  /** Typed InternalRow getter driven by the Avro (not Spark) type.
    * Logical types read the matching Spark slot: date is an int slot,
    * both timestamp flavors a long slot, decimal a Decimal slot. */
  private def get(row: InternalRow, i: Int, s: Schema): Any = s.getType match {
    case Schema.Type.RECORD  => row.getStruct(i, s.getFields.size)
    case Schema.Type.STRING | Schema.Type.ENUM => row.getUTF8String(i)
    case Schema.Type.INT     => row.getInt(i)
    case Schema.Type.LONG    => row.getLong(i)
    case Schema.Type.FLOAT   => row.getFloat(i)
    case Schema.Type.DOUBLE  => row.getDouble(i)
    case Schema.Type.BOOLEAN => row.getBoolean(i)
    case Schema.Type.BYTES | Schema.Type.FIXED => decimalOf(s) match {
      case Some((p, sc)) => row.getDecimal(i, p, sc)
      case None => row.getBinary(i)
    }
    case Schema.Type.ARRAY   => row.getArray(i)
    case Schema.Type.MAP     => row.getMap(i)
    case t => throw new UnsupportedOperationException(s"avro type $t")
  }

  private def getArray(arr: ArrayData, i: Int, s: Schema): Any = s.getType match {
    case Schema.Type.RECORD  => arr.getStruct(i, s.getFields.size)
    case Schema.Type.STRING | Schema.Type.ENUM => arr.getUTF8String(i)
    case Schema.Type.INT     => arr.getInt(i)
    case Schema.Type.LONG    => arr.getLong(i)
    case Schema.Type.FLOAT   => arr.getFloat(i)
    case Schema.Type.DOUBLE  => arr.getDouble(i)
    case Schema.Type.BOOLEAN => arr.getBoolean(i)
    case Schema.Type.BYTES | Schema.Type.FIXED => decimalOf(s) match {
      case Some((p, sc)) => arr.getDecimal(i, p, sc)
      case None => arr.getBinary(i)
    }
    case Schema.Type.ARRAY   => arr.getArray(i)
    case Schema.Type.MAP     => arr.getMap(i)
    case t => throw new UnsupportedOperationException(s"avro type $t")
  }

  // ---- decimal plumbing ---------------------------------------------------

  /** Avro decimal body (two's-complement unscaled big-endian) -> Spark
    * Decimal at the declared (precision, scale). */
  private def decimalFromUnscaled(bytes: Array[Byte], p: Int, sc: Int)
      : org.apache.spark.sql.types.Decimal =
    org.apache.spark.sql.types.Decimal(
      new java.math.BigDecimal(new java.math.BigInteger(bytes), sc), p, sc)

  /** Spark Decimal -> unscaled big-endian bytes at the schema's scale.
    * setScale is exact by construction (the Spark value's scale equals
    * the Avro schema's — both derive from the same DecimalType); a
    * mismatched writer schema fails loudly rather than rounding. */
  private def unscaledBytes(v: Any, sc: Int): Array[Byte] =
    v.asInstanceOf[org.apache.spark.sql.types.Decimal]
      .toJavaBigDecimal.setScale(sc).unscaledValue().toByteArray

  /** Sign-extend a two's-complement big-endian value to a fixed width. */
  private def signExtendTo(b: Array[Byte], size: Int): Array[Byte] = {
    require(b.length <= size,
      s"decimal unscaled value (${b.length} bytes) exceeds fixed($size)")
    if (b.length == size) b
    else {
      val out = new Array[Byte](size)
      val pad: Byte = if (b.nonEmpty && b(0) < 0) -1 else 0
      java.util.Arrays.fill(out, 0, size - b.length, pad)
      System.arraycopy(b, 0, out, size - b.length, b.length)
      out
    }
  }
}
