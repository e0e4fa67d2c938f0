package graft

class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects functions at builder time (newSession)") {
    // newSession() rebuilds SessionState from defaults + injected
    // extensions; runtime-registered functions from the parent session do
    // NOT carry over — so resolution here proves the builder-time
    // injection path works on its own.
    val fresh = spark.newSession()
    val dot = fresh.sql(
      "SELECT graft_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(dot === 4.0)
    val inter = fresh.sql(
      "SELECT graft_bitmap_inter(array(7L), array(5L)) AS i")
      .head().getInt(0)
    assert(inter === 2)
  }
}
