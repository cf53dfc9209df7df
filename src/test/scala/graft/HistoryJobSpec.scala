package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.HistoryJob

class HistoryJobSpec extends AnyFunSuite with SharedSpark {

  test("history run emits keyed JSON with the reference's field order and injected clock") {
    val jobTime = 1706572800123L
    val rows = HistoryJob.run(spark, sfDir, jobTime).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val key = r.getString(0)
      val json = r.getString(1)
      assert(json.startsWith("""{"house_id":"""))
      assert(json.contains(s""""timestamp":$jobTime"""))
      // field order pinned: house_id, appliance_id, avg_power, timestamp
      val idx = Seq("house_id", "appliance_id", "avg_power", "timestamp").map(json.indexOf)
      assert(idx == idx.sorted && idx.forall(_ >= 0))
      assert(json.contains(s""""house_id":"$key""""))
    }
  }

  test("scheduled run executes under AvailableNow and writes one batch") {
    val out = java.nio.file.Files.createTempDirectory("history").toString
    val q = HistoryJob.scheduled(spark, sfDir, out, clock = () => 42L)
    q.awaitTermination(60000)
    val batches = new java.io.File(out).listFiles().filter(_.getName.startsWith("batch_"))
    assert(batches.nonEmpty)
    val raw = spark.read.json(batches.head.getPath) // columns: key, value(json string)
    assert(raw.count() > 0)
    import spark.implicits._
    val inner = spark.read.json(raw.select("value").as[String])
    assert(inner.select("timestamp").distinct().head().getLong(0) == 42L)
  }
}
