package graft.sources

import org.apache.avro.{Schema, SchemaNormalization}

/** In-memory Confluent Schema Registry emulation.
  *
  * The reference wires every producer/consumer to a registry
  * (producer KafkaWeatherProducer.scala:50 `schema.registry.url`;
  * ksqldb-consumer register-schemas.sh POSTs to
  * `/subjects/<subject>/versions` and reads back a global `id`), and
  * frames each Kafka message with that id ([[AvroWire]]). This class
  * reproduces the registry CONTRACT those clients rely on, without the
  * HTTP server:
  *
  *  - **Global schema identity**: ids are per-schema, not per-subject —
  *    registering a semantically identical schema (Avro parsing
  *    fingerprint, `SchemaNormalization.parsingFingerprint64`) under
  *    any subject returns the same id.
  *  - **Idempotent registration**: re-registering a subject's existing
  *    schema returns the old id and creates no new version (the
  *    "Schema may already exist - this is OK" branch of
  *    register-schemas.sh).
  *  - **Per-subject versions**: a genuinely new schema under a subject
  *    appends version `latest+1`.
  *  - **`getById`**: the consumer-side writer-schema lookup that
  *    KafkaAvroDeserializer performs for each framed message.
  *
  * Driver-side object; executors never talk to it. [[resolver]] snaps
  * the id→schema table into an immutable Map for broadcasting — the
  * shape [[AvroWire.decodeWeatherDynamic]] consumes per partition.
  * Thread-safe (synchronized mutation, immutable snapshots out).
  */
final class SchemaRegistry {
  private[this] val lock = new Object
  private[this] var idByFp = Map.empty[Long, Int]
  private[this] var schemaById = Map.empty[Int, String]
  // subject -> versions in order; element i is (version i+1, schema id)
  private[this] var subjectVersions = Map.empty[String, Vector[Int]]
  private[this] var nextId = 1

  private def canonicalFp(schemaJson: String): (Long, String) = {
    val parsed = new Schema.Parser().parse(schemaJson)
    // identity = parsing fingerprint (field defaults/docs don't fork
    // ids — matches registry dedupe); stored text keeps defaults,
    // which evolution decode needs
    (SchemaNormalization.parsingFingerprint64(parsed), parsed.toString)
  }

  /** Register `schemaJson` under `subject`; returns the global id. */
  def register(subject: String, schemaJson: String): Int = lock.synchronized {
    val (fp, canonical) = canonicalFp(schemaJson)
    val id = idByFp.getOrElse(fp, {
      val i = nextId; nextId += 1
      idByFp += fp -> i
      schemaById += i -> canonical
      i
    })
    val versions = subjectVersions.getOrElse(subject, Vector.empty)
    if (!versions.contains(id)) subjectVersions += subject -> (versions :+ id)
    id
  }

  /** Writer-schema lookup for a framed message's schema id. */
  def getById(id: Int): Option[String] = lock.synchronized(schemaById.get(id))

  /** Latest (id, version, schema) for a subject. */
  def latest(subject: String): Option[(Int, Int, String)] = lock.synchronized {
    subjectVersions.get(subject).filter(_.nonEmpty).map { vs =>
      (vs.last, vs.length, schemaById(vs.last))
    }
  }

  /** Version numbers registered under a subject (1-based). */
  def versions(subject: String): Seq[Int] = lock.synchronized {
    subjectVersions.get(subject).map(vs => 1 to vs.length).getOrElse(Nil)
  }

  def subjects: Seq[String] = lock.synchronized(subjectVersions.keys.toSeq.sorted)

  /** Immutable id→schema snapshot — broadcast this to executors. */
  def resolver: Map[Int, String] = lock.synchronized(schemaById)
}
