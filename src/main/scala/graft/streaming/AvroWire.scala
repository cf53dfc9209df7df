package graft.streaming

import java.io.ByteArrayOutputStream
import java.sql.Timestamp

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Dataset

import StreamingDutyCycle.PowerReading

/** Binary-Avro wire serde for the reference's `powerraw.valueall` record
  * (`/root/reference/ingestion/schema.avsc:1-27`) using Avro core (the only
  * Avro artifact shipped with Spark's jars here — the spark-avro SQL module's
  * `from_avro`/`to_avro` would replace this one-for-one when the deployment
  * provides it).
  *
  * Implemented as `mapPartitions` so the datum reader/writer and decoder are
  * allocated once per partition and reused across rows — the per-record cost
  * is one buffer wrap, which is what a 100k msg/s ingest path needs.
  */
object AvroWire {

  /** Byte-equivalent of the reference's schema: epoch-millisecond long event
    * time, float power.
    */
  val SchemaJson: String =
    """{
      |  "namespace": "powerraw",
      |  "type": "record",
      |  "name": "valueall",
      |  "fields": [
      |    {"name": "house_id", "type": "string"},
      |    {"name": "appliance_name", "type": "string"},
      |    {"name": "appliance_id", "type": "string"},
      |    {"name": "timestamp", "type": "long"},
      |    {"name": "power", "type": "float"}
      |  ]
      |}""".stripMargin

  /** One-per-partition encoder closure: reader/writer/buffer allocated once,
    * reused across rows (call inside `mapPartitions`).
    */
  def partitionEncoder(): PowerReading => Array[Byte] = {
    val schema = new Schema.Parser().parse(SchemaJson)
    val writer = new GenericDatumWriter[GenericRecord](schema)
    val out = new ByteArrayOutputStream(64)
    var encoder: BinaryEncoder = null
    (r: PowerReading) => {
      out.reset()
      encoder = EncoderFactory.get().binaryEncoder(out, encoder)
      val rec = new GenericData.Record(schema)
      rec.put("house_id", r.house_id)
      rec.put("appliance_name", r.appliance_name)
      rec.put("appliance_id", r.appliance_id)
      rec.put("timestamp", r.time.getTime)
      rec.put("power", r.power.toFloat)
      writer.write(rec, encoder)
      encoder.flush()
      out.toByteArray
    }
  }

  def encodeReadings(readings: Dataset[PowerReading]): Dataset[Array[Byte]] = {
    import readings.sparkSession.implicits._
    readings.mapPartitions { rows =>
      val codec = partitionEncoder()
      rows.map(codec)
    }
  }

  def decodeReadings(bytes: Dataset[Array[Byte]]): Dataset[PowerReading] = {
    import bytes.sparkSession.implicits._
    bytes.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(SchemaJson)
      val reader = new GenericDatumReader[GenericRecord](schema)
      var decoder: BinaryDecoder = null
      var reuse: GenericRecord = null
      rows.map { b =>
        decoder = DecoderFactory.get().binaryDecoder(b, decoder)
        reuse = reader.read(reuse, decoder)
        PowerReading(
          // millis → timestamp, the duty_cycle_avro.py:72-73 cast
          new Timestamp(reuse.get("timestamp").asInstanceOf[Long]),
          reuse.get("house_id").toString,
          reuse.get("appliance_name").toString,
          reuse.get("appliance_id").toString,
          reuse.get("power").asInstanceOf[Float].toDouble)
      }
    }
  }
}
