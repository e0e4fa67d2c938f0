package graft

/** Every declared query must be run-to-run deterministic including row
  * order — Verify's coalesce(1) parquet is hash-compared by the driver, so
  * a nondeterministic plan is a coin-flip failure (SURVEY.md §5.2). */
class DeterminismSpec extends SparkSpec {

  test("all declared queries produce identical results on repeated runs") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val r1 = fn(spark, sfDir).collect().map(_.toString).toSeq
      val r2 = fn(spark, sfDir).collect().map(_.toString).toSeq
      assert(r1 === r2, s"$name is not run-to-run deterministic")
    }
  }
}
