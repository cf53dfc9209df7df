package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{GridConfig, StreamingDutyCycle}

/** Streaming fault-tolerance semantics: checkpoint recovery (T3) and
  * streaming deduplication (T7's effective-exactly-once via content keys).
  */
class RecoverySpec extends AnyFunSuite with SharedSpark {

  test("streaming query resumes from its checkpoint without reprocessing") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("recov_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("recov_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("recov_out").toString

    def readings(from: Int, until: Int) =
      (from until until).map { i =>
        StreamingDutyCycle.PowerReading(
          new java.sql.Timestamp(i * 1000L), "h0", "lamp", s"h0_a${i % 3}", (i % 10).toDouble)
      }
    // batch 1 on disk
    spark.createDataset(readings(0, 500)).toDF()
      .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema

    def start() =
      StreamingDutyCycle
        .plan(spark.readStream.schema(schema).parquet(src),
          GridConfig(windowMin = 2, playbackSpeed = 12, watermarkSec = 2))
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .start()

    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    val afterFirst = spark.read.parquet(outDir).count()

    // more data lands while the query is down; restart from the checkpoint
    spark.createDataset(readings(500, 1000)).toDF()
      .write.mode("append").parquet(src)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val out = spark.read.parquet(outDir)
    val total = out.count()
    assert(total > afterFirst, "restart must process the new files")
    // no duplicated windows: each (window_end, appliance) appears once
    val dupes = out.groupBy("time_end", "appliance_id").count().filter(col("count") > 1).count()
    assert(dupes == 0, "recovery must not re-emit closed windows")
  }

  test("RocksDB state at 10x key cardinality survives a restart without dupes or loss") {
    // the bench's state-scale probe measures throughput at 10x keys; this
    // pins its correctness side — grown RocksDB state reloads from the
    // checkpoint and closed windows are not re-emitted
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("recov_rocks_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("recov_rocks_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("recov_rocks_out").toString
    def readings(from: Int, until: Int) =
      (from until until).map { i =>
        StreamingDutyCycle.PowerReading(
          new java.sql.Timestamp(i * 1000L), s"h${i % 30}", "lamp",
          s"h${i % 30}_a${i % 3}", (i % 10).toDouble)
      }
    spark.createDataset(readings(0, 500)).toDF().write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def start() =
        StreamingDutyCycle
          .plan(spark.readStream.schema(schema).parquet(src),
            GridConfig(windowMin = 2, playbackSpeed = 12, watermarkSec = 2))
          .writeStream
          .format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", ckpt)
          .outputMode(OutputMode.Append)
          .start()
      val q1 = start(); q1.processAllAvailable(); q1.stop()
      val afterFirst = spark.read.parquet(outDir).count()
      spark.createDataset(readings(500, 1000)).toDF().write.mode("append").parquet(src)
      val q2 = start(); q2.processAllAvailable(); q2.stop()
      val out = spark.read.parquet(outDir)
      assert(out.count() > afterFirst, "restart must process the new files")
      assert(out.select("house_id").distinct().count() == 30,
        "every key must surface")
      val dupes = out.groupBy("time_end", "appliance_id", "house_id")
        .count().filter(col("count") > 1).count()
      assert(dupes == 0, "recovery must not re-emit closed windows")
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("foreachBatch batchId-keyed overwrite: crash after write, before commit — no dupes") {
    // The T7 exactly-once proof: foreachBatch is at-least-once (the side
    // effect can land, then the query die before the offset commit), so the
    // sink must be idempotent PER BATCH ID. The deterministic-overwrite
    // discipline (one dir per batch id, mode=overwrite — writeSegment's
    // pattern) makes the replay rewrite the same dir with the same content.
    // This test injects exactly that crash window: the batch-1 side effect
    // completes, THEN the sink throws, so batch 1's offsets never commit and
    // the restart replays it.
    import org.apache.spark.sql.DataFrame
    val src = java.nio.file.Files.createTempDirectory("eo_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("eo_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("eo_out").toString
    (0 until 4).foreach { f =>
      spark.range(f * 10L, f * 10L + 10L).toDF("v")
        .repartition(1).write.mode("append").parquet(src)
    }
    val schema = spark.read.parquet(src).schema
    val crashOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def start() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch.write.mode("overwrite").parquet(s"$out/batch=$id")
        if (id == 1L && crashOnce.getAndSet(false))
          throw new RuntimeException("injected crash: side effect done, commit not")
      }
      .start()
    val q1 = start()
    val died = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
      q1.awaitTermination()
    }
    assert(died.getMessage.contains("injected crash"))
    q1.stop()
    // the at-least-once hazard is real: batch 1's output exists although its
    // offsets never committed
    assert(new java.io.File(s"$out/batch=1").exists, "crash must land after the write")
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    // replay overwrote batch=1 instead of appending: every value exactly once
    val result = spark.read.parquet(out)
    assert(result.count() == 40, s"expected 40 rows, got ${result.count()}")
    val dupes = result.groupBy("v").count().filter(col("count") > 1).count()
    assert(dupes == 0, "batch replay duplicated rows — sink not idempotent")
    assert(result.select("batch").distinct().count() == 4)
  }

  test("streaming dropDuplicates dedups across micro-batches within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val deduped = input.toDF().toDF("ts_s", "key")
      .withColumn("time", timestamp_seconds(col("ts_s")))
      .withWatermark("time", "10 seconds")
      .dropDuplicates("key", "time")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((100L, "a"), (100L, "a"), (101L, "b"))
      q.processAllAvailable()
      input.addData((100L, "a"), (102L, "b"))
      q.processAllAvailable()
      val rows = spark.table("dedup_out").select("key", "ts_s").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      // the duplicate (100,a) from batch 2 is suppressed by state
      assert(rows.count(_ == ("a", 100L)) == 1)
      assert(rows.toSet == Set(("a", 100L), ("b", 101L), ("b", 102L)))
    } finally q.stop()
  }
}
