package graft

import graft.operators.Dist
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dist primitives must equal the single-partition window forms they
  * replace — bit-for-bit, across partition counts and tie patterns. */
class DistSpec extends SparkSpec {
  import spark.implicits._

  // keys with heavy ties (k = id % 7) + unique tie-break id
  private lazy val df = spark.range(1000)
    .select((col("id") % 7).as("k"), col("id"), (col("id") % 13).as("g"))

  test("withRankAndCount equals global row_number for every partitioning") {
    val expected = df
      .withColumn("rn", row_number().over(
        Window.orderBy(col("k"), col("id"))).cast("long"))
      .select("id", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    for (parts <- Seq(1, 3, 8)) {
      val got = Dist.withRankAndCount(df, "rn", "n", Nil,
          Seq(col("k"), col("id")), numParts = parts)
        .select("id", "rn", "n").collect()
      assert(got.map(r => (r.getLong(0), r.getLong(1))).toMap === expected,
        s"parts=$parts")
      assert(got.forall(_.getLong(2) === 1000L))
    }
  }

  test("withNtile equals SQL ntile for n in 2..7 including N < n") {
    for (n <- Seq(2, 3, 5, 7); rows <- Seq(3L, 1000L)) {
      val d = spark.range(rows).select((col("id") % 5).as("k"), col("id"))
      val expected = d.withColumn("b", ntile(n).over(
          Window.orderBy(col("k"), col("id"))))
        .select("id", "b").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      val got = Dist.withNtile(d, "b", n, Nil, Seq(col("k"), col("id")),
          numParts = 4)
        .select("id", "b").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      assert(got === expected, s"n=$n rows=$rows")
    }
  }

  test("per-group withNtile equals partitioned ntile") {
    val expected = df.withColumn("b", ntile(4).over(
        Window.partitionBy("g").orderBy(col("k"), col("id"))))
      .select("id", "b").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val got = Dist.withNtile(df, "b", 4, Seq(col("g")),
        Seq(col("k"), col("id")), numParts = 4)
      .select("id", "b").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got === expected)
  }

  test("withPrefixSumsLong equals window running sums (two columns)") {
    val d = df.withColumn("v", col("id") * 3 + 1)
      .withColumn("w", col("id") % 11)
    val win = Window.orderBy(col("k"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = d
      .withColumn("cv", sum(col("v")).over(win))
      .withColumn("cw", sum(col("w")).over(win))
      .select("id", "cv", "cw").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val got = Dist.withPrefixSumsLong(d,
        Seq("cv" -> col("v"), "cw" -> col("w")),
        Seq(col("k"), col("id")), numParts = 5)
      .select("id", "cv", "cw").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
  }

  test("withPrefixMaxLong equals window running max across partitionings") {
    // a value that oscillates so the running max has long flat stretches
    // (late events) and jumps — the watermark shape
    val d = df.withColumn("v",
      when(col("id") % 17 === 0, col("id") * 5).otherwise(col("id")))
    val win = Window.orderBy(col("k"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = d.withColumn("m", max(col("v")).over(win))
      .select("id", "m").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    for (parts <- Seq(1, 4, 9)) {
      val got = Dist.withPrefixMaxLong(d, "m", col("v"),
          Seq(col("k"), col("id")), numParts = parts)
        .select("id", "m").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got === expected, s"parts=$parts")
    }
  }

  test("descending sort keys rank correctly") {
    val expected = df.withColumn("rn", row_number().over(
        Window.orderBy(col("k").desc, col("id"))).cast("long"))
      .select("id", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = Dist.withRankAndCount(df, "rn", "n", Nil,
        Seq(col("k").desc, col("id")), numParts = 4)
      .select("id", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === expected)
  }
}
