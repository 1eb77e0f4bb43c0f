package graft.avro

import scala.jdk.CollectionConverters._

import org.apache.avro.SchemaCompatibility
import org.apache.avro.SchemaCompatibility.SchemaCompatibilityType

/** Local Avro schema-compatibility checking over the runtime's own
  * resolver rules (`org.apache.avro.SchemaCompatibility`, in Spark's
  * avro-1.12.1 jar) — the enforcement a Confluent registry performs
  * server-side on register (reference analog: the compatibility surface
  * of the registry container in `/root/reference/docker-compose.yml`),
  * available HERE as pipeline pre-flight with no broker in the loop.
  *
  * Why a pre-flight matters: Avro resolution errors surface at RECORD
  * construction, i.e. executor-side, per task — and in permissive decode
  * mode they don't surface at all (the per-row malformed-skip catch
  * nulls every record, and the downstream `.filter(isNotNull)` silently
  * drops the whole dataset). An incompatible READER SCHEMA is a
  * configuration error, not a data error, so it must fail on the driver
  * at analysis time with the offending paths named. [[AvroDecode]] runs
  * this check whenever an evolution read is requested.
  */
object SchemaCompat {

  /** The incompatibility list for "can a reader with `readerJson` read
    * data written with `writerJson`" — empty means compatible. Each
    * entry names the type of mismatch, the schema location, and the
    * resolver's message (e.g. READER_FIELD_MISSING_DEFAULT_VALUE at
    * /fields/3: tier). Avro's checker implements the full resolution
    * spec: defaults, numeric promotions, union subsumption, aliases. */
  def incompatibilities(readerJson: String, writerJson: String): Seq[String] = {
    val result = SchemaCompatibility.checkReaderWriterCompatibility(
      AvroCodec.parsedSchema(readerJson), AvroCodec.parsedSchema(writerJson))
    if (result.getType == SchemaCompatibilityType.COMPATIBLE) Seq.empty
    else result.getResult.getIncompatibilities.asScala.toSeq.map(i =>
      s"${i.getType} at ${i.getLocation}: ${i.getMessage}")
  }

  /** True iff a reader with `readerJson` can read `writerJson` data. */
  def canRead(readerJson: String, writerJson: String): Boolean =
    incompatibilities(readerJson, writerJson).isEmpty

  /** BACKWARD compatibility (the registry default the reference estate
    * runs): consumers on the NEW schema must read data produced under
    * the OLD one. Returns the violation list; empty = safe to register. */
  def checkBackward(newJson: String, oldJson: String): Seq[String] =
    incompatibilities(readerJson = newJson, writerJson = oldJson)

  /** FORWARD compatibility: data produced under the NEW schema must
    * remain readable by consumers still on the OLD one. */
  def checkForward(newJson: String, oldJson: String): Seq[String] =
    incompatibilities(readerJson = oldJson, writerJson = newJson)

  /** FULL = backward ∧ forward. */
  def checkFull(newJson: String, oldJson: String): Seq[String] =
    (checkBackward(newJson, oldJson).map("backward: " + _) ++
      checkForward(newJson, oldJson).map("forward: " + _))

  /** True iff the resolver location sits inside a union branch. Avro's
    * incompatibility locations are JSON-pointer paths into the reader
    * schema (`/fields/2/type`, `/fields/3/type/1`); the only integer
    * segments are field indexes (directly after `fields`) and union
    * branch indexes — so any integer NOT preceded by `fields` marks a
    * union branch. */
  private def insideUnionBranch(location: String): Boolean = {
    val segs = location.split("/").filter(_.nonEmpty)
    segs.zipWithIndex.exists { case (s, i) =>
      s.nonEmpty && s.forall(_.isDigit) && (i == 0 || segs(i - 1) != "fields")
    }
  }

  /** The subset of [[incompatibilities]] that fail EVERY record — as
    * opposed to data-dependent ones (e.g. MISSING_UNION_BRANCH, which
    * only fails the records actually carrying the dropped branch and is
    * exactly what permissive mode's per-row DROPMALFORMED semantic is
    * for). A reader field without a default must be filled for every
    * record; a mismatched record name fails resolution outright; and a
    * non-union TYPE_MISMATCH (reader int vs writer string at a plain
    * record field) likewise fails every record — without gating it, a
    * permissive evolution read passes pre-flight and silently nulls the
    * whole dataset (r15 ADVICE). TYPE_MISMATCH *inside* a union branch
    * stays skippable: only the records carrying that branch fail.
    *
    * MISSING_UNION_BRANCH splits on the SAME location rule (r16,
    * measured against avro-1.12's checker): when the WRITER side is a
    * union the location carries the unmatched branch's index
    * (`/fields/0/type/1`) and only records carrying that branch fail —
    * the documented data-dependent case. But when the writer is a
    * PLAIN type that a reader union lacks (reader `["null","int"]` vs
    * writer `string`), the checker still says MISSING_UNION_BRANCH
    * while the location has no branch index (`/fields/0/type`) — and
    * every record carries that one concrete type, so a permissive read
    * drops the whole dataset. Gate it. These are config errors under
    * ANY data, so even a permissive read should refuse the plan. */
  def totalIncompatibilities(readerJson: String, writerJson: String): Seq[String] = {
    val result = SchemaCompatibility.checkReaderWriterCompatibility(
      AvroCodec.parsedSchema(readerJson), AvroCodec.parsedSchema(writerJson))
    if (result.getType == SchemaCompatibilityType.COMPATIBLE) Seq.empty
    else result.getResult.getIncompatibilities.asScala.toSeq.collect {
      case i if i.getType.name == "READER_FIELD_MISSING_DEFAULT_VALUE" ||
          i.getType.name == "NAME_MISMATCH" ||
          ((i.getType.name == "TYPE_MISMATCH" ||
            i.getType.name == "MISSING_UNION_BRANCH") &&
            !insideUnionBranch(i.getLocation)) =>
        s"${i.getType} at ${i.getLocation}: ${i.getMessage}"
    }
  }

  /** Throws with the named violations unless `readerJson` can read
    * `writerJson` data — the pre-flight gate for evolution reads. */
  def requireCanRead(readerJson: String, writerJson: String): Unit = {
    val bad = incompatibilities(readerJson, writerJson)
    require(bad.isEmpty,
      s"reader schema cannot read writer schema (${bad.size} " +
        s"incompatibilit${if (bad.size == 1) "y" else "ies"}):\n  " +
        bad.mkString("\n  "))
  }
}
