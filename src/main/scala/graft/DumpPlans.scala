package graft

/** Builder-side plan dumper: write `.explain("formatted")` for named catalog
  * queries to `OUT_DIR/<name><SUFFIX>.txt` — the before/after plan evidence
  * the optimization rounds commit under `plans/`. No timing, no actions (the
  * formatted plan is the pre-execution adaptive plan, same as an `explain`
  * call before the first action).
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, OUT_DIR (default plans/r16),
  * SUFFIX (default `_after`), CONFS (comma-separated `key=value` session
  * confs set before planning — dump `_before` plans by flipping the
  * plan-time graft confs off); args = query names (empty = whole catalog).
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("OUT_DIR", "plans/r16")
    val suffix = sys.env.getOrElse("SUFFIX", "_after")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.tune(spark)
    sys.env.get("CONFS").foreach(_.split(',').filter(_.nonEmpty).foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })
    new java.io.File(outDir).mkdirs()
    val names = if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted else args.toSeq
    // fail fast on unknown names BEFORE writing any file (ADVICE r16 #3: a
    // raw NoSuchElementException mid-loop left a partial dump)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    names.foreach { n =>
      val plan = SparkEntry.queries(n)(spark, sfDir)
        .queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$n$suffix.txt"), plan)
      println(s"[plans] wrote $outDir/$n$suffix.txt")
    }
    spark.stop()
  }
}
