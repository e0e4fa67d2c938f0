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

  test("registered functions reject wrong arity with a named error") {
    // zero args must not surface an opaque NoSuchElementException, and
    // surplus args must not be silently dropped (ADVICE r3)
    for (bad <- Seq(
        "SELECT graft_nfc()", "SELECT graft_nfc('a', 'b')",
        "SELECT graft_dot(array(CAST(1.0 AS FLOAT)))",
        "SELECT graft_bitmap_inter(array(1L))",
        "SELECT graft_kmv()")) {
      val e = intercept[Exception](spark.sql(bad).collect())
      def names(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getClass.getName +: names(t.getCause)
      assert(!names(e).exists(_.contains("NoSuchElementException")),
        s"opaque error for: $bad")
      def msgs(t: Throwable): String =
        if (t == null) "" else t.getMessage + " " + msgs(t.getCause)
      assert(msgs(e).contains("expects"), s"no arity message for: $bad")
    }
  }
}
