ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "insightspark"
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
// Pass the forked process's stdout through verbatim instead of routing it
// via sbt's logger, which prefixes every line with "[info] ". Bench's
// contract is ONE machine-parseable JSON line on stdout; the prefix broke
// the driver's parser in rounds 1-2 (BENCH_r0{1,2}.json: "parsed": null).
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// ---------------------------------------------------------------------
// Parallel forked test groups (round 12, VERDICT r11 item 2: the full
// suite must finish inside the grading driver's wall window — the
// sequential single-JVM run measured 1902 s healthy and was cut off at
// ~21 min two driver rounds running). The suite's wall is per-job
// scheduling latency on a local[2] session (~1.4 cores busy over 32
// minutes), so the fix is parallelism ACROSS isolated JVMs, not bigger
// sessions: five groups balanced by measured suite seconds
// (target/test-reports, 2026-08-18 healthy run), each group a separate
// forked JVM with its OWN SparkSession, warehouse dir and tmpdir — so
// the suites that write warehouse tables / tmpdir ETLs (layout keys)
// can't collide across JVMs, and the two timing suites (JobCapSpec's
// job-counting windows, BudgetSpec's canary-normalized bands) keep
// their "suites run sequentially in MY JVM" invariant per group.
// GRAFT_SUITE_SERIAL=1 restores the old single-group sequential run
// (for local timing work where cross-JVM CPU contention matters).
def graftTestGroup(suite: String): String = suite match {
  case "graft.DeterminismSpec" | "graft.CacheSpec"        => "det-a"
  case "graft.DeterminismBSpec" | "graft.JobCapSpec"      => "det-b"
  case "graft.StreamingSpec" | "graft.WeatherSpec"        => "stream"
  case "graft.OperatorEdgeSpec" | "graft.RetrievalR7Spec"
     | "graft.ScaleTechniqueSpec"                         => "edge"
  case _                                                  => "rest"
}
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val baseOpts = (Test / javaOptions).value
  val baseDir = baseDirectory.value
  if (sys.env.get("GRAFT_SUITE_SERIAL").contains("1"))
    (Test / testGrouping).value
  else {
    tests.groupBy(t => graftTestGroup(t.name)).toSeq.sortBy(_._1).map {
      case (group, groupTests) =>
        val tmp = baseDir / "target" / "test-tmp" / group
        val wh = baseDir / "target" / "test-warehouse" / group
        // Fresh scratch per run: a stale warehouse dir from a previous
        // run fails saveAsTable with LOCATION_ALREADY_EXISTS (the new
        // JVM's in-memory catalog has no table to DROP, but the files
        // are still there).
        IO.delete(tmp); IO.delete(wh)
        java.nio.file.Files.createDirectories(tmp.toPath)
        java.nio.file.Files.createDirectories(wh.toPath)
        Tests.Group(
          group,
          groupTests,
          Tests.SubProcess(ForkOptions().withRunJVMOptions(
            (baseOpts ++ Seq(
              s"-Djava.io.tmpdir=${tmp.getAbsolutePath}",
              s"-Dspark.sql.warehouse.dir=${wh.getAbsolutePath}",
              // lets layout-sensitive specs (BudgetSpec) know sibling
              // JVMs are computing concurrently
              "-Dgraft.suite.layout=parallel",
              // Each forked JVM otherwise sizes GC/JIT/common pools for
              // all 32 host cores; five such JVMs spawn ~300 service
              // threads and futex-thrash (first parallel run: sys 83 m
              // > user 66 m, suites 3-8× their solo walls). The session
              // is local[2] — 6 claimed cores is plenty.
              "-XX:ActiveProcessorCount=6"
            )).toVector)))
    }
  }
}
// Allow the five groups to actually run concurrently. REPLACE the
// default restrictions: sbt ships `Tags.limit(Tags.ForkedTestGroup, 1)`
// in the default set, and restrictions compose as AND — appending a
// looser limit changes nothing (observed: one test JVM at a time).
Global / concurrentRestrictions := Seq(
  Tags.limitAll(12),
  Tags.limit(Tags.ForkedTestGroup, 5))
