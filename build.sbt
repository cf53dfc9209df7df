ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "insight_de_smart_gridspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Run the test suites in a FEW FORKED JVMS CONCURRENTLY instead of one
// sequential forked JVM (VERDICT r16 #2: the full sequential suite outran
// the verification window — 21.6 min on a quiet 32-core box; the longest
// pole, StreamingSpec, was cut off mid-run and read as a failure).
// Parallelism INSIDE one JVM is unsafe here — suites share one SparkSession
// and several mutate global session confs (autoBroadcastJoinThreshold, AQE
// skew thresholds, the streaming state-store provider) around their tests —
// but separate JVMs each get their own session, so groups are isolated by
// construction. Suites are bin-packed greedily by measured wall-clock so the
// groups finish together (~3x wall-clock reduction at 3 groups).
val testGroupCount = sys.env.getOrElse("TEST_GROUPS", "3").toInt
Test / testGrouping := {
  // measured seconds on a quiet 32-core box (2026-08, r17); unknown → 15
  val weight = Map(
    "graft.ScaleSpec" -> 235, "graft.IvfIndexSpec" -> 220,
    "graft.AdmissionPipelineSpec" -> 135, "graft.StreamingSpec" -> 90,
    "graft.IngestSpec" -> 90, "graft.ExtensionsSpec" -> 89,
    "graft.RollupRewriteSpec" -> 53, "graft.ShingleIndexSpec" -> 34,
    "graft.DedupSpec" -> 32, "graft.SimilaritySpec" -> 31,
    "graft.TextAndMediaSpec" -> 31, "graft.PairStoreSpec" -> 28,
    "graft.CurationSpec" -> 28, "graft.RecoverySpec" -> 23,
    "graft.FingerprintIndexSpec" -> 20, "graft.LshIndexSpec" -> 19)
  val forkOpts = ForkOptions().withRunJVMOptions((Test / javaOptions).value.toVector)
  val buckets = Array.fill(testGroupCount)(
    (scala.collection.mutable.ListBuffer.empty[TestDefinition], Array(0L)))
  (Test / definedTests).value
    .sortBy(t => -weight.getOrElse(t.name, 15))
    .foreach { t =>
      val (buf, w) = buckets.minBy(_._2(0))
      buf += t; w(0) += weight.getOrElse(t.name, 15)
    }
  buckets.toSeq.zipWithIndex.map { case ((buf, _), i) =>
    Tests.Group(s"g$i", buf.toSeq, Tests.SubProcess(forkOpts))
  }
}
// sbt's defaults cap concurrent forked test groups at 1; lift it to the
// group count (and keep the global task-parallelism cap).
Global / concurrentRestrictions := Seq(
  Tags.limitAll(java.lang.Runtime.getRuntime.availableProcessors()),
  Tags.limit(Tags.ForkedTestGroup, testGroupCount))
// The bench contract is ONE machine-parseable JSON line on stdout. With
// fork:=true sbt routes the child's stdout through its logger, prefixing
// every line with "[info] " — which makes `json.loads(line)` fail for any
// line-based consumer. StdoutOutput hands the child the real stdout instead
// (sbt's own [success]/[error] framing lines are unaffected).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g default (was 8g): the bench's stateful-streaming sections run with
  // 32 executor threads in one JVM and sat within one GC cycle of the 8g
  // ceiling on EVERY observed run (dozens of "Failed to allocate a page"
  // warnings per run; one run died at stage ~7961 with heap OOM). The
  // sandbox has 128 GiB; 16g removes the cliff without changing any plan.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // deep-but-legal Catalyst plans (PQ encode = 72 derived columns feeding
  // joins) recurse in the planner; the default 1M thread stack is tight
  "-Xss32m",
)
