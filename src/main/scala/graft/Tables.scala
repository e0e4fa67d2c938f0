package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declared schemas + loaders for the driver testdata
  * (`/root/testdata/sf*`; see TESTDATA.md / FIXTURES.md).
  *
  * Design notes (SURVEY.md §1):
  *  - Schemas are declared, never inferred, so plans are stable across scale
  *    factors and the parquet footer read is skipped on the hot path.
  *  - `events.ts` is parquet INT64 TIMESTAMP(NANOS) which Spark 4 refuses to
  *    read unless `spark.sql.legacy.parquet.nanosAsLong=true`; we read it as
  *    ns-since-epoch LongType and convert to TIMESTAMP_NTZ with integer
  *    microsecond truncation (ts div 1000) — identical to how DuckDB (the
  *    correctness oracle) truncates the same column (SURVEY.md §1.4).
  *  - ms timestamps (l_shipdate, o_orderdate) are TIMESTAMP_NTZ in Spark 4
  *    and naive TIMESTAMP in DuckDB; both sessions run pinned-UTC so the
  *    wall-clock values agree.
  *
  * At 100 TB these would be partitioned/bucketed table reads; the loaders
  * keep all filtering/projection declarative so Catalyst pushes predicates
  * and prunes columns into the parquet scan regardless of layout.
  */
object Tables {

  val regionSchema = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nationSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customerSchema = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplierSchema = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val partSchema = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampNTZType),
    StructField("o_orderpriority", StringType)))

  val lineitemSchema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampNTZType)))

  /** ts declared as LongType: raw ns-since-epoch (requires nanosAsLong). */
  val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documentsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddingsSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private val schemas: Map[String, StructType] = Map(
    "region" -> regionSchema, "nation" -> nationSchema,
    "customer" -> customerSchema, "supplier" -> supplierSchema,
    "part" -> partSchema, "orders" -> ordersSchema,
    "lineitem" -> lineitemSchema, "documents" -> documentsSchema,
    "embeddings" -> embeddingsSchema)

  /** Session settings every entry point must apply. Safe to call repeatedly. */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    graft.functions.GraftFunctions.register(spark)
    spark
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    configure(spark)
    spark.read.schema(schemas(name)).parquet(s"$sfDir/$name.parquet")
  }

  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** Events with `ts` converted ns→µs (floor, matching DuckDB) as
    * TIMESTAMP_NTZ, plus the raw ns long as `ts_ns` for callers that want
    * exact integer time arithmetic (window frames, gaps). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    configure(spark)
    spark.read.schema(eventsRawSchema).parquet(s"$sfDir/events.parquet")
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
  }
}
