package graft.serde

import org.apache.avro.{Schema, SchemaCompatibility, SchemaValidationException, SchemaValidatorBuilder}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Pure compatibility predicates over Avro schemas — the callable gate
  * the reference's registry client exposes as `test_compatibility`
  * (/root/reference/src/utils/schema_registry.py:293-309). Built on
  * Avro's own SchemaValidatorBuilder, so the semantics are exactly the
  * resolution rules the decode path (AvroWire.fromAvroEvolved) follows.
  */
object SchemaCompat {
  private def validates(build: SchemaValidatorBuilder => SchemaValidatorBuilder,
      toValidate: Schema, existing: Seq[Schema]): Boolean =
    try {
      build(new SchemaValidatorBuilder()).validateAll()
        .validate(toValidate, existing.asJava)
      true
    } catch { case _: SchemaValidationException => false }

  /** BACKWARD: a reader using `newSchema` can read data written with
    * `oldSchema` (the Confluent default gate for producer upgrades).
    */
  def isBackwardCompatible(newSchema: Schema, oldSchema: Schema): Boolean =
    validates(_.canReadStrategy, newSchema, Seq(oldSchema))

  /** FORWARD: readers still on `oldSchema` can read data written with
    * `newSchema`.
    */
  def isForwardCompatible(newSchema: Schema, oldSchema: Schema): Boolean =
    validates(_.canBeReadStrategy, newSchema, Seq(oldSchema))

  /** FULL: both directions. */
  def isFullyCompatible(newSchema: Schema, oldSchema: Schema): Boolean =
    validates(_.mutualReadStrategy, newSchema, Seq(oldSchema))

  /** Human-readable incompatibility list (empty = reader reads writer). */
  def incompatibilities(reader: Schema, writer: Schema): Seq[String] = {
    val res = SchemaCompatibility.checkReaderWriterCompatibility(reader, writer)
    res.getResult.getIncompatibilities.asScala.toSeq
      .map(i => s"${i.getType} at ${i.getLocation}: ${i.getMessage}")
  }
}

/** In-process Schema Registry with the reference client's protocol
  * surface (/root/reference/src/utils/schema_registry.py:154-309):
  * idempotent registration, version listing, latest/by-version lookup,
  * per-subject or global compatibility levels, compatibility testing,
  * and subject/version deletion. Registration is COMPATIBILITY-GATED:
  * an incompatible schema is rejected with the violation list, exactly
  * the contract a wire-format producer relies on before rolling a new
  * writer schema. Ids are global (the Confluent frame's int32,
  * AvroWire.frameBytes); versions are per-subject and monotonic.
  *
  * In-process by design: the sandbox has no registry service, and the
  * protocol semantics (not the HTTP transport) are what the pipeline
  * depends on. Thread-safe via a single lock — registration volume is
  * human-scale (schema rollouts), never data-plane.
  */
class SchemaRegistry {
  import SchemaRegistry._

  /** BACKWARD | FORWARD | FULL | NONE (Confluent level names,
    * schema_registry.py:246 set_compatibility).
    */
  @volatile private var globalLevel: String = "BACKWARD"
  private val subjectLevel = mutable.Map.empty[String, String]
  private val bySubject = mutable.Map.empty[String, mutable.ArrayBuffer[Registered]]
  private val byId = mutable.Map.empty[Int, Registered]
  private var nextId = 1

  private def parse(json: String): Schema = new Schema.Parser().parse(json)

  private def compatible(level: String, newer: Schema, older: Schema): Boolean =
    level match {
      case "BACKWARD" => SchemaCompat.isBackwardCompatible(newer, older)
      case "FORWARD"  => SchemaCompat.isForwardCompatible(newer, older)
      case "FULL"     => SchemaCompat.isFullyCompatible(newer, older)
      case "NONE"     => true
      case other => throw new IllegalArgumentException(s"unknown level: $other")
    }

  def compatibilityLevel(subject: String): String = synchronized {
    subjectLevel.getOrElse(subject, globalLevel)
  }

  /** None subject = global level (schema_registry.py:244-265). */
  def setCompatibility(level: String, subject: Option[String] = None): Unit =
    synchronized {
      require(Levels.contains(level), s"unknown level: $level")
      subject match {
        case Some(s) => subjectLevel(s) = level
        case None    => globalLevel = level
      }
    }

  /** Idempotent, compatibility-gated registration: re-registering a
    * byte-identical schema returns the existing (id, version); an
    * incompatible one throws with Avro's violation list.
    */
  def register(subject: String, schemaJson: String): Registered = synchronized {
    val schema = parse(schemaJson)
    val versions = bySubject.getOrElseUpdate(subject, mutable.ArrayBuffer.empty)
    versions.find(r => parse(r.schemaJson) == schema) match {
      case Some(existing) => existing
      case None =>
        versions.lastOption.foreach { latest =>
          val level = compatibilityLevel(subject)
          if (!compatible(level, schema, parse(latest.schemaJson)))
            throw new SchemaValidationException(schema, parse(latest.schemaJson),
              new IllegalArgumentException(
                s"$level compatibility violated for $subject v${latest.version + 1}: " +
                  SchemaCompat.incompatibilities(schema, parse(latest.schemaJson))
                    .mkString("; ")))
        }
        val reg = Registered(nextId, versions.size + 1, subject, schemaJson)
        nextId += 1
        versions += reg
        byId(reg.id) = reg
        reg
    }
  }

  /** test_compatibility: would this schema register under the subject's
    * current level? (No mutation.)
    */
  def checkCompatibility(subject: String, schemaJson: String): Boolean =
    synchronized {
      bySubject.get(subject).flatMap(_.lastOption) match {
        case None => true
        case Some(latest) =>
          compatible(compatibilityLevel(subject), parse(schemaJson),
            parse(latest.schemaJson))
      }
    }

  def latest(subject: String): Option[Registered] = synchronized {
    bySubject.get(subject).flatMap(_.lastOption)
  }

  def version(subject: String, v: Int): Option[Registered] = synchronized {
    bySubject.get(subject).flatMap(_.find(_.version == v))
  }

  def versions(subject: String): Seq[Int] = synchronized {
    bySubject.get(subject).map(_.map(_.version).toSeq).getOrElse(Seq.empty)
  }

  def subjects: Seq[String] = synchronized { bySubject.keys.toSeq.sorted }

  /** The decode path's id → schema lookup (the Confluent frame carries
    * only the id).
    */
  def schemaById(id: Int): Option[Registered] = synchronized { byId.get(id) }

  /** delete_schema: one version or the whole subject
    * (schema_registry.py:268-290). Ids of deleted versions stay retired.
    */
  def delete(subject: String, version: Option[Int] = None): Boolean =
    synchronized {
      bySubject.get(subject) match {
        case None => false
        case Some(vs) =>
          version match {
            case Some(v) =>
              val before = vs.size
              vs.filterInPlace { r =>
                if (r.version == v) { byId.remove(r.id); false } else true
              }
              if (vs.isEmpty) bySubject.remove(subject)
              vs.size != before
            case None =>
              vs.foreach(r => byId.remove(r.id))
              bySubject.remove(subject).isDefined
          }
      }
    }
}

object SchemaRegistry {
  case class Registered(id: Int, version: Int, subject: String, schemaJson: String)
  val Levels: Set[String] = Set("BACKWARD", "FORWARD", "FULL", "NONE")
}
