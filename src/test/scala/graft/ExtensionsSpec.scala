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

  test("optimizer rule rewrites graft_dot(x, x) to graft_norm2") {
    // non-foldable input (a parquet column) so the expression survives
    // constant folding and the rewrite is visible in the optimized plan
    val emb = s"$sfDir/embeddings.parquet"
    // builder-time path (injectOptimizerRule via extensions)
    val fresh = spark.newSession()
    val self = fresh.read.parquet(emb)
      .selectExpr("vec_id", "graft_dot(embedding, embedding) AS n2")
    val opt = self.queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_norm2") && !opt.contains("graft_dot"), opt)
    // rewrite is result-identical to the unoptimized dot
    val viaDot = fresh.read.parquet(emb).orderBy("vec_id")
      .selectExpr("graft_norm2(embedding) AS n2").head().getDouble(0)
    assert(self.orderBy("vec_id").head().getDouble(1) === viaDot)
    // a genuine two-argument dot must NOT be rewritten
    val two = fresh.read.parquet(emb).as("a")
      .crossJoin(fresh.read.parquet(emb).limit(1).as("b"))
      .selectExpr("graft_dot(a.embedding, b.embedding) AS d")
    assert(two.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    // runtime path (Tables.configure → experimental.extraOptimizations)
    val rt = spark.read.parquet(emb)
      .selectExpr("graft_dot(embedding, embedding) AS n2")
    assert(rt.queryExecution.optimizedPlan.toString.contains("graft_norm2"))
    // direct registration of graft_norm2 itself
    val arr = "array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT))"
    assert(spark.sql(s"SELECT graft_norm2($arr) AS n")
      .head().getDouble(0) === 6.25)
  }

  test("TopKPerGroup executes the custom operator and matches row_number") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(1000).select(
      (col("id") % 37).as("g"), col("id"),
      (col("id") * 7 % 101).as("v"))
    val native = graft.plans.TopKPerGroup(df, 3, Seq("g"),
      Seq(("v", false), ("id", true)), "rn")
    // plan shape: the custom exec replaces WindowExec entirely
    val physical = native.queryExecution.executedPlan.toString
    assert(physical.contains("TopKPerGroup"),
      s"custom exec missing from plan:\n$physical")
    assert(!physical.contains("WindowExec"))
    val expected = df.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("v").desc, col("id")))
        .cast("long"))
      .filter(col("rn") <= 3)
      .collect().map(_.toSeq).toSet
    assert(native.collect().map(_.toSeq).toSet === expected,
      "bounded-heap result must equal the window form bit for bit")
    // and across a different parallelism (group hash exchange both ways)
    val rep = graft.plans.TopKPerGroup(df.repartition(7), 3, Seq("g"),
      Seq(("v", false), ("id", true)), "rn")
    assert(rep.collect().map(_.toSeq).toSet === expected)
    // k larger than some group sizes: groups emit all their rows, ranked
    val small = graft.plans.TopKPerGroup(
      df.filter(col("id") < 5), 10, Seq("g"),
      Seq(("v", false), ("id", true)), "rn")
    assert(small.collect().length === 5)
    // two-phase contract (round 8): a map-side partial heap must run
    // BEFORE the group exchange, so only groups·k rows shuffle — the
    // partial-aggregation shape applied to the custom operator
    assert(physical.contains("TopKPerGroupPartial"),
      s"map-side partial heap missing from plan:\n$physical")
    assert(physical.indexOf("TopKPerGroupPartial") >
      physical.indexOf("TopKPerGroup"),
      "partial phase must sit below the final (post-exchange) phase")
  }

  test("noAqeCheckpoint scope restores the session AQE conf") {
    // the scoped AQE-off materializer (closeness/reach/hits/
    // assortativity) must never leak its conf mutation — a leaked
    // 'false' would silently deoptimize every later query in the
    // session (perf, not correctness, which is why a spec pins it)
    val key = "spark.sql.adaptive.enabled"
    val before = spark.conf.get(key, "true")
    operators.GraphOps.queries("q_graph_assortativity")(spark, sfDir)
      .count()
    assert(spark.conf.get(key, "true") === before)
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
