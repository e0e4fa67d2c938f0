package graft

import org.apache.spark.sql.SparkSession

/** Records the per-key isolated warm floor of EVERY registry key at the
  * bench config (VERDICT r9 item 5): standard Bench warmup untimed,
  * then per key two timed evaluations, keep the min (run 1 absorbs the
  * key's own codegen/JIT; run 2 is the warm steady state — min of the
  * two is the isolated floor TimeOne would report). Emits
  *   target/isolated_floors.json   — committed as FLOORS_r{N}.json
  *   target/floors_data.scala      — paste into FloorsData.scala
  * Both carry the run's own job canary so a reader can judge whether
  * the recording host was healthy.
  *
  * Weather gating (round 11, VERDICT r10 item 3): the round-10 floors
  * were recorded on a degraded host (canary_10jobs_post 5.01 s — ~10×
  * the healthy band), inflating ~20 floors 2-6× and blunting the
  * ratio-ordered bench re-time those floors feed. This recorder now
  * (a) REFUSES to start when its pre-canary reads degraded (override
  * with GRAFT_FLOORS_FORCE=1 — the output is then explicitly tagged
  * degraded), (b) interleaves a one-job micro-canary every 10 keys so
  * stall windows inside the run are attributable (Weather.suspects,
  * the same logic Bench trusts), (c) automatically re-records keys
  * bracketed by a degraded canary — up to 2 extra bracketed attempts,
  * keeping the per-key min — and (d) emits any key whose every attempt
  * was degraded-bracketed under "_degraded_keys" so a committed floors
  * file discloses its own residual weather exposure key-by-key.
  * Run: sbt "runMain graft.FloorRecord" (~3× one bench loop). */
object FloorRecord {

  /** Upper edge of the healthy canary_10jobs band ever recorded on this
    * VM class (BASELINE.md: 0.37-0.88 healthy); the refusal gate sits
    * at 1.5× that so normal jitter never blocks a recording. */
  val healthyCanary10: Double = 0.88

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val force = sys.env.get("GRAFT_FLOORS_FORCE").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Tables.configure(spark)
    spark.sparkContext.setLogLevel("ERROR")
    Bench.warmupKeys.foreach { k =>
      try SparkEntry.queries.get(k).foreach(_(spark, sfDir).count())
      catch { case _: Throwable => () }
    }
    val canaryPre = Budget.canary10(spark)
    if (canaryPre > healthyCanary10 * 1.5 && !force) {
      System.err.println(
        f"FLOORS REFUSED: pre-canary $canaryPre%.3f s > gate " +
          f"${healthyCanary10 * 1.5}%.3f s (healthy band ≤ " +
          f"$healthyCanary10%.2f). Floors recorded on a degraded host " +
          "are 2-6× inflated (round-10 lesson) — retry on a healthy " +
          "window, or GRAFT_FLOORS_FORCE=1 to record tagged-degraded.")
      spark.stop()
      sys.exit(2)
    }
    // one-job micro-canary (same primitive as Bench's weather timeline:
    // an RDD action = exactly 1 job, ~11-25 ms healthy)
    def micro(): Double = {
      val t0 = System.nanoTime()
      spark.sparkContext.parallelize(1 to 1, 1).count()
      (System.nanoTime() - t0) / 1e9
    }
    val keys = SparkEntry.queries.toSeq.sortBy(_._1)
    val weather = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    val timed = keys.zipWithIndex.flatMap { case ((name, fn), i) =>
      if (i % 10 == 0) weather += i -> micro()
      try {
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        Some(name -> times.min)
      } catch {
        case t: Throwable =>
          System.err.println(s"FLOOR $name failed: " +
            t.getClass.getSimpleName)
          None
      }
    }
    weather += keys.size -> micro()
    var best = timed.toMap
    // re-record keys bracketed by a degraded canary: each retry is
    // bracketed by its OWN fresh micro-canaries, so a still-degraded
    // attempt is detected and the key stays flagged rather than
    // absorbing a stall reading into a committed floor
    val (_, _, suspects0) =
      Weather.suspects(weather.toSeq, keys.map(_._1))
    var stillDegraded = suspects0.toSet.intersect(best.keySet)
    (1 to 2).foreach { pass =>
      if (stillDegraded.nonEmpty) {
        System.err.println(s"FLOORS re-record pass $pass: " +
          s"${stillDegraded.size} degraded-bracketed keys")
        stillDegraded = stillDegraded.toSeq.sorted.filter { name =>
          val pre = micro()
          val t = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            SparkEntry.queries(name)(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }.min
          val post = micro()
          val clean = math.max(pre, post) < 0.1
          if (clean) best += name -> math.min(best(name), t)
          !clean
        }.toSet
      }
    }
    val canaryPost = Budget.canary10(spark)
    val rows = keys.map(_._1).filter(best.contains).map(k => k -> best(k))
    val r3 = (v: Double) => math.floor(v * 1000 + 0.5) / 1000
    val degradedJson = stillDegraded.toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val weatherJson = weather
      .map { case (p, v) => s"[$p,${r3(v)}]" }.mkString("[", ",", "]")
    val json = rows.map { case (k, v) => s"""  "$k": ${r3(v)}""" }
      .mkString("{\n", ",\n", ",\n") +
      s"""  "_canary_10jobs_pre_sec": ${r3(canaryPre)},\n""" +
      s"""  "_canary_10jobs_post_sec": ${r3(canaryPost)},\n""" +
      s"""  "_weather": $weatherJson,\n""" +
      s"""  "_degraded_keys": $degradedJson,\n""" +
      s"""  "_forced_degraded_start": $force,\n""" +
      s"""  "_config": "local[$cpus] $sfDir min-of-2-warm"\n}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("target/isolated_floors.json"),
      json.getBytes("UTF-8"))
    val scalaSrc = rows.grouped(3).map(_.map { case (k, v) =>
      s""""$k" -> ${r3(v)}""" }.mkString(", ")).mkString(
      "package graft\n\n/** Generated by graft.FloorRecord — see " +
        "Floors.scala for semantics.\n  * Recorded at local[" + cpus +
        "] " + sfDir + f", canary10 pre/post $canaryPre%.3f/" +
        f"$canaryPost%.3f. */%nobject FloorsData {%n" +
        "  val bench: Map[String, Double] = Map(\n    ",
      ",\n    ", ")\n}\n")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("target/floors_data.scala"),
      scalaSrc.getBytes("UTF-8"))
    println(f"FLOORS recorded ${rows.size} keys, sum ${rows.map(_._2).sum}%.1f s, " +
      f"canary10 pre/post $canaryPre%.3f/$canaryPost%.3f, " +
      s"residual degraded keys: ${stillDegraded.size} -> " +
      "target/isolated_floors.json, target/floors_data.scala")
    spark.stop()
  }
}
