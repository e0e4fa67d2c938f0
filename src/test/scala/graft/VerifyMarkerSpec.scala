package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** A deliberately-broken key must produce an explicit failure record —
  * the round-5 q_events_churn incident: a throwing query left NO trace in
  * CORRECTNESS_r05.json (neither pass nor fail). Verify.runOne now owns
  * that contract. */
class VerifyMarkerSpec extends SparkSpec {

  test("a throwing key leaves a _FAILED marker and no stale dump") {
    val out = Files.createTempDirectory("graft-verify").toString
    // seed a stale dump as if a previous run had succeeded
    spark.range(3).toDF("x").coalesce(1)
      .write.parquet(s"$out/q_boom")
    val err = Verify.runOne(spark, sfDir, out, "q_boom",
      (_, _) => sys.error("deliberate failure"))
    assert(err.isDefined && err.get.contains("deliberate failure"))
    assert(!new java.io.File(s"$out/q_boom").exists(),
      "stale dump must be removed so the oracle can't false-PASS on it")
    val marker = new java.io.File(s"$out/q_boom._FAILED")
    assert(marker.exists(), "attempted-and-failed record must exist")
    assert(Files.readString(marker.toPath).contains("deliberate failure"))
  }

  test("a healthy key dumps parquet and leaves no marker") {
    val out = Files.createTempDirectory("graft-verify").toString
    val err = Verify.runOne(spark, sfDir, out, "q_ok",
      (s, d) => Tables.region(s, d).orderBy("r_regionkey"))
    assert(err.isEmpty)
    assert(new java.io.File(s"$out/q_ok").exists())
    assert(!new java.io.File(s"$out/q_ok._FAILED").exists())
    assert(spark.read.parquet(s"$out/q_ok").count() === 5)
  }
}
