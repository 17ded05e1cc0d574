package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders mapping the driver testdata (TESTDATA.md) onto the engine's
  * data model (SURVEY §1): `events` → activity stream, `customer` →
  * employee dimension. Every derived column here is mirrored verbatim in
  * the DuckDB oracle CTEs (see [[Oracles.activitiesCte]] /
  * [[Oracles.employeesCte]]) — keep the two in lockstep.
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Scale-adaptive re-split for CPU-heavy downstream work (r20
    * optimization round, guide §2: "make partitioning scale-adaptive …
    * rather than a constant tuned for either local mode or the
    * cluster").
    *
    * Through r19 the embedding/doc pipelines opened with an
    * UNCONDITIONAL `repartition(defaultParallelism)`: correct at gate
    * scale (the corpus is ONE small single-row-group parquet file, so
    * the scan yields ~1 partition and the assignment/quantization work
    * below needs the cores), but a 100 TB corpus scans as tens of
    * thousands of natural splits — there the same line is a full-corpus
    * round-robin EXCHANGE (with its sort-before-repartition pass,
    * SPARK-23207) that moves every byte to buy parallelism the scan
    * already has. The fix is conditional: re-split only when the
    * planned scan parallelism is actually below the session's target.
    * At gate scale the branch always fires (plans and bench identical
    * to r19's shape); at scale it never does, and the exchange
    * disappears. `df.rdd.getNumPartitions` plans the frame but runs no
    * job.
    */
  implicit class Resplit(private val df: DataFrame) extends AnyVal {
    def resplit(spark: SparkSession): DataFrame = {
      val target = spark.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
    }
  }

  /** events with `ts` as a usable µs timestamp, adaptive to the file's
    * physical encoding (the driver has regenerated the testdata with
    * different encodings across rounds):
    *  - parquet TIMESTAMP(NANOS) → Spark reads long (nanosAsLong config,
    *    see [[GraftSession]]); integer-divide to µs — same
    *    floor-truncation DuckDB applies casting TIMESTAMP_NS → TIMESTAMP;
    *  - parquet timestamp[us] → Spark reads TIMESTAMP_NTZ; cast to
    *    session-local TimestampType (session tz pinned UTC, so values
    *    are identical to DuckDB's native read).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = table(spark, sfDir, "events")
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => timestamp_micros(expr("ts div 1000"))
      case _                                   => col("ts").cast("timestamp")
    }
    raw.withColumn("ts", ts)
  }

  /** events → activity rows (FIXTURES.md §5 mapping).
    * Deterministic derivations only (no rand/current_*), so the DuckDB
    * twin produces identical rows.
    */
  def activities(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir).select(
      col("event_id").cast("string").as("id"),
      col("user_id").as("employee_id"),
      col("event_type").as("activity_type"),
      concat(lit("/page/"), get_json_object(col("props"), "$.k")).as("page_url"),
      floor(col("value")).cast("int").as("duration_seconds"),
      concat(lit("10.0."), col("user_id") % 256, lit("."), col("event_id") % 256)
        .as("ip_address"),
      lit("Mozilla/5.0").as("user_agent"),
      col("ts").as("activity_timestamp"),
      concat(col("user_id"), lit("-"), to_date(col("ts")).cast("string")).as("session_id"),
      when(col("user_id") % 3 === 0, "mobile")
        .when(col("user_id") % 3 === 1, "tablet")
        .otherwise("desktop").as("device_type"),
      when(col("event_id") % 3 === 0, "Chrome")
        .when(col("event_id") % 3 === 1, "Firefox")
        .otherwise("Safari").as("browser"),
      col("ts").as("created_at"))

  /** customer → employee rows. Department from market segment; seniority
    * markers injected into the email deterministically by key.
    */
  def employees(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "customer").select(
      col("c_custkey").as("id"),
      col("c_name").as("name"),
      concat(
        lower(col("c_name")),
        when(col("c_custkey") % 7 === 0, ".senior")
          .when(col("c_custkey") % 7 === 1, ".lead")
          .otherwise(""),
        lit("@corp.com")).as("email"),
      when(col("c_mktsegment") === "BUILDING", "Engineering")
        .when(col("c_mktsegment") === "AUTOMOBILE", "IT")
        .when(col("c_mktsegment") === "MACHINERY", "Sales")
        .when(col("c_mktsegment") === "HOUSEHOLD", "Marketing")
        .otherwise("HR").as("department"),
      lit("2024-01-01 00:00:00").cast("timestamp").as("created_at"))
}
