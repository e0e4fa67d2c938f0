package graft

import org.apache.spark.sql.SparkSession

/** Isolates the per-job fixed cost the canary_10jobs reads: raw RDD
  * job submission vs DataFrame count (SQL planning + AQE) vs cached-
  * plan re-execution. Run: sbt "runMain graft.ProbeOverhead". */
object ProbeOverhead {
  private def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext
    def time(n: Int)(f: => Unit): Seq[Double] =
      (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
    // warm
    sc.parallelize(1 to 1, 1).count()
    spark.range(1).count()
    val rdd1 = time(30)(sc.parallelize(1 to 1, 1).count(): Unit)
    val rdd32 = time(30)(sc.parallelize(1 to 32, 32).count(): Unit)
    val df1 = time(30)(spark.range(1).count(): Unit)
    val cached = spark.range(1)
    val dfReuse = time(30)(cached.count(): Unit)
    val agg = time(20)(
      spark.range(1000).selectExpr("id % 7 AS k").groupBy("k").count()
        .count(): Unit)
    println(f"PROBE rdd_1task_ms=${med(rdd1)}%.1f rdd_32task_ms=" +
      f"${med(rdd32)}%.1f df_range1_ms=${med(df1)}%.1f " +
      f"df_reused_ms=${med(dfReuse)}%.1f df_1shuffle_ms=${med(agg)}%.1f")
    println("RDD1 dist: " + rdd1.sorted.map(v => f"$v%.1f")
      .mkString(" "))
    spark.stop()
  }
}
