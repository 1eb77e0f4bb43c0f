package graft.avro

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ExprBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `from_avro`/`to_avro` equivalents for the reference's Confluent wire
  * format (the spark-avro module is absent from the runtime jars, so the
  * expressions are built directly on [[AvroCodec]]). Both participate in
  * whole-stage codegen via the static-call pattern — the generated code
  * calls `graft.avro.AvroCodec.decode/encode` once per row, so an
  * enclosing projection stays compiled.
  */
case class AvroDecode(child: Expression, schemaJson: String,
    permissive: Boolean = false,
    readerSchemaJson: Option[String] = None) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType =>
      // evolution pre-flight (r15): an incompatible reader schema is a
      // CONFIG error that would otherwise surface executor-side per
      // record — or, in permissive mode, not at all (the malformed-skip
      // catch nulls every row and the dataset silently vanishes
      // downstream). Gate it at analysis time with the paths named.
      // Strict mode gates on ANY incompatibility (it would fail at the
      // first affected record anyway — fail at the plan instead);
      // permissive mode gates only on TOTAL incompatibilities (fail
      // every record under any data): data-dependent ones like a
      // dropped union branch are exactly what its per-row
      // DROPMALFORMED contract exists to skip (r15 review).
      readerSchemaJson.filter(_ != schemaJson).map { r =>
        if (permissive) SchemaCompat.totalIncompatibilities(r, schemaJson)
        else SchemaCompat.incompatibilities(r, schemaJson)
      } match {
        case Some(bad) if bad.nonEmpty => TypeCheckResult.TypeCheckFailure(
          s"from_avro reader schema cannot read writer schema: ${bad.mkString("; ")}")
        case _ => TypeCheckResult.TypeCheckSuccess
      }
    case t => TypeCheckResult.TypeCheckFailure(
      s"from_avro expects binary, got ${t.simpleString}")
  }

  /** Output layout follows the READER schema when evolution is in play. */
  override lazy val dataType: DataType =
    AvroCodec.sparkStructType(readerSchemaJson.getOrElse(schemaJson))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    AvroCodec.decodeEvolved(input.asInstanceOf[Array[Byte]], schemaJson,
      readerSchemaJson.getOrElse(schemaJson), permissive)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sj = ctx.addReferenceObj("avroSchemaJson", schemaJson, "java.lang.String")
    val rj = ctx.addReferenceObj("avroReaderSchemaJson",
      readerSchemaJson.getOrElse(schemaJson), "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.avro.AvroCodec.decodeEvolved($c, $sj, $rj, $permissive);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "from_avro_confluent"
}

case class AvroEncode(child: Expression, schemaJson: String, schemaId: Int)
    extends UnaryExpression {

  /** The child struct must match the schema's columnar layout exactly
    * (ignoring nullability) — positional encoding reads fields by index. */
  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = AvroCodec.sparkStructType(schemaJson)
    def strip(dt: DataType): DataType = dt match {
      case s: StructType =>
        StructType(s.fields.map(f => StructField(f.name, strip(f.dataType))))
      case a: ArrayType => ArrayType(strip(a.elementType))
      case m: MapType => MapType(strip(m.keyType), strip(m.valueType))
      case other => other
    }
    child.dataType match {
      case s: StructType if strip(s) == strip(expected) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"to_avro: input ${t.simpleString} does not match schema " +
          s"layout ${expected.simpleString}")
    }
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    AvroCodec.encode(input.asInstanceOf[InternalRow], schemaJson, schemaId)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sj = ctx.addReferenceObj("avroSchemaJson", schemaJson, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.avro.AvroCodec.encode($c, $sj, $schemaId);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "to_avro_confluent"
}

/** Per-record writer-schema dispatch over a registry map (id → writer
  * schema JSON) — the reference's `AvroDeserializer` behavior
  * (`producer/verifier_ui.py:34,66`; `docker-compose.yml:63-64`): a batch
  * whose Confluent frames carry MULTIPLE writer-schema ids decodes in one
  * pass, each record resolved against its own header id and projected
  * onto the shared READER schema. Evolution pre-flight runs per writer
  * at analysis time: strict gates any incompatibility for any mapped
  * writer, permissive gates total ones — the same config-vs-data split
  * as [[AvroDecode]], with the offending id named. Participates in
  * whole-stage codegen via the static-call pattern.
  */
case class AvroDecodeRegistry(child: Expression, registry: Map[Int, String],
    readerSchemaJson: String, permissive: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType =>
      if (registry.isEmpty)
        return TypeCheckResult.TypeCheckFailure(
          "from_avro_registry: the id→writer-schema map is empty")
      val bad = registry.toSeq.sortBy(_._1).flatMap { case (id, writer) =>
        val viol =
          if (writer == readerSchemaJson) Seq.empty
          else if (permissive) SchemaCompat.totalIncompatibilities(readerSchemaJson, writer)
          else SchemaCompat.incompatibilities(readerSchemaJson, writer)
        viol.map(v => s"writer id $id: $v")
      }
      if (bad.nonEmpty) TypeCheckResult.TypeCheckFailure(
        s"from_avro_registry reader schema cannot read every mapped " +
          s"writer schema: ${bad.mkString("; ")}")
      else TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"from_avro_registry expects binary, got ${t.simpleString}")
  }

  override lazy val dataType: DataType =
    AvroCodec.sparkStructType(readerSchemaJson)
  override def nullable: Boolean = true

  /** The map in the shape the static kernel consumes, built once per
    * expression instance and shared by interpreted eval and the codegen
    * reference object. */
  @transient private lazy val javaRegistry: java.util.HashMap[Integer, String] = {
    val m = new java.util.HashMap[Integer, String](registry.size * 2)
    registry.foreach { case (k, v) => m.put(Integer.valueOf(k), v) }
    m
  }

  override def nullSafeEval(input: Any): Any =
    AvroCodec.decodeRegistry(input.asInstanceOf[Array[Byte]], javaRegistry,
      readerSchemaJson, permissive)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val reg = ctx.addReferenceObj("avroRegistry", javaRegistry, "java.util.Map")
    val rj = ctx.addReferenceObj("avroReaderSchemaJson", readerSchemaJson,
      "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.avro.AvroCodec.decodeRegistry($c, $reg, $rj, $permissive);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "from_avro_registry"
}

/** The schema id carried in a frame header (S4 passthrough — the registry
  * lookup itself is a config input, SURVEY.md §1.2). */
case class AvroFrameSchemaId(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"avro_schema_id expects binary, got ${t.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.length < 5 || bytes(0) != AvroCodec.MagicByte) null
    else java.lang.Integer.valueOf(AvroCodec.frameSchemaId(bytes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($c.length < 5 || $c[0] != (byte) 0x00) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.avro.AvroCodec.frameSchemaId($c);
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "avro_schema_id"
}

/** Column-level surface (the `org.apache.spark.sql.avro.functions`
  * analog). */
object functions {
  def from_avro_confluent(c: Column, schemaJson: String,
      permissive: Boolean = false): Column =
    ExprBridge.column(AvroDecode(ExprBridge.expression(c), schemaJson, permissive))

  /** Evolution read: payload written with `writerSchemaJson`, projected
    * onto `readerSchemaJson` (defaults filled, dropped fields skipped). */
  def from_avro_evolved(c: Column, writerSchemaJson: String,
      readerSchemaJson: String, permissive: Boolean = false): Column =
    ExprBridge.column(AvroDecode(ExprBridge.expression(c), writerSchemaJson,
      permissive, Some(readerSchemaJson)))

  /** Mixed-writer read: each record's frame id resolves its writer
    * schema from `registry`, the body projects onto `readerSchemaJson` —
    * one pass over a topic whose schema evolved mid-stream. */
  def from_avro_registry(c: Column, registry: Map[Int, String],
      readerSchemaJson: String, permissive: Boolean = false): Column =
    ExprBridge.column(AvroDecodeRegistry(ExprBridge.expression(c), registry,
      readerSchemaJson, permissive))

  def to_avro_confluent(c: Column, schemaJson: String, schemaId: Int = 1): Column =
    ExprBridge.column(AvroEncode(ExprBridge.expression(c), schemaJson, schemaId))

  def avro_schema_id(c: Column): Column =
    ExprBridge.column(AvroFrameSchemaId(ExprBridge.expression(c)))
}
