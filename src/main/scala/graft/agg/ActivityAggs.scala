package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed activity aggregations.
  *
  * Semantics from the reference's `create_activity_aggregations`
  * (spark-streaming/multi_source_streaming_processor.py:201-240):
  *
  *  - hourly:  groupBy(window(activity_timestamp, 1 h), employee_id,
  *             activity_type) → count, sum/avg(duration), set of pages,
  *             first device (py:205-221)
  *  - daily:   groupBy(window(activity_timestamp, 1 d), activity_type,
  *             device_category) → count, distinct employees, avg duration
  *             (py:224-238)
  *
  * Fixes we apply to the reference's latent defects (SURVEY §2.10):
  *  - B3: `countDistinct` is unsupported on a streaming aggregation — the
  *    streaming path uses `approx_count_distinct` (HLL++); the batch twin
  *    keeps exact `countDistinct`.
  *  - ST4: the reference has no watermark (state grows forever); the
  *    streaming path takes a watermark delay.
  *  - A5: `first(device_category)` is order-nondeterministic; we keep it
  *    in the API but note groups keyed by employee make it stable when
  *    device is a function of the employee.
  *
  * Scale notes (100 TB): one hash-exchange per agg on (window, keys) with
  * map-side partial aggregation — the canonical Spark shape. The hourly
  * `collect_set` is the risk at scale (unbounded per-group state,
  * ObjectHashAggregate); `maxPagesPerGroup` bounds the emitted array via
  * `slice` post-agg, and callers needing hard state bounds should prefer
  * `approx_count_distinct(page_url)`.
  */
object ActivityAggs {

  /** Hourly per-employee per-activity-type aggregation (batch twin). */
  def hourly(enriched: DataFrame, maxPagesPerGroup: Int = 1000): DataFrame =
    enriched
      .groupBy(
        window(col("activity_timestamp"), "1 hour"),
        col("employee_id"),
        col("activity_type"))
      .agg(
        count(lit(1)).as("activity_count"),
        sum(col("duration_seconds")).as("total_duration"),
        avg(col("duration_seconds")).as("avg_duration"),
        slice(sort_array(collect_set(col("page_url"))), 1, maxPagesPerGroup).as("unique_pages"),
        first(col("device_category")).as("primary_device"))
      .withColumn("aggregation_type", lit("hourly"))
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** Daily per-activity-type per-device aggregation (batch twin, exact
    * distinct). (Reference names it "daily by department" but groups by
    * device — code is authoritative, SURVEY §2.5.)
    */
  def daily(enriched: DataFrame): DataFrame =
    enriched
      .groupBy(
        window(col("activity_timestamp"), "1 day"),
        col("activity_type"),
        col("device_category"))
      .agg(
        count(lit(1)).as("activity_count"),
        countDistinct(col("employee_id")).as("unique_employees"),
        avg(col("duration_seconds")).as("avg_duration"))
      .withColumn("aggregation_type", lit("daily_device"))
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** Streaming hourly aggregation: watermarked (fix for ST4). Use with
    * outputMode("update") as the reference intends (py:338).
    */
  def hourlyStreaming(enriched: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    enriched
      .withWatermark("activity_timestamp", watermarkDelay)
      .groupBy(
        window(col("activity_timestamp"), "1 hour"),
        col("employee_id"),
        col("activity_type"))
      .agg(
        count(lit(1)).as("activity_count"),
        sum(col("duration_seconds")).as("total_duration"),
        avg(col("duration_seconds")).as("avg_duration"),
        approx_count_distinct(col("page_url")).as("unique_pages_approx"),
        first(col("device_category")).as("primary_device"))
      .withColumn("aggregation_type", lit("hourly"))
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** Streaming daily aggregation: watermarked, HLL++ distinct (fix for
    * B3 — exact distinct is unsupported on streams).
    */
  def dailyStreaming(enriched: DataFrame, watermarkDelay: String = "25 hours"): DataFrame =
    enriched
      .withWatermark("activity_timestamp", watermarkDelay)
      .groupBy(
        window(col("activity_timestamp"), "1 day"),
        col("activity_type"),
        col("device_category"))
      .agg(
        count(lit(1)).as("activity_count"),
        approx_count_distinct(col("employee_id")).as("unique_employees"),
        avg(col("duration_seconds")).as("avg_duration"))
      .withColumn("aggregation_type", lit("daily_device"))
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")
}
