package graft

/** DuckDB oracle SQL (driver runs these over the same parquet tables and
  * hash-compares with our parquet output — the correctness gate).
  *
  * Invariants that keep the hash compare honest:
  *  - every derived column mirrors [[Tables]] / [[graft.enrich.Enrichments]]
  *    exactly (same CASE branches, same thresholds);
  *  - aggregate outputs are aliased to the same names as the Spark side;
  *  - integer sums are CAST to BIGINT (DuckDB sums INTEGER into HUGEINT);
  *  - double aggregates are ROUNDed identically on both sides;
  *  - every query has a total-order ORDER BY.
  */
object Oracles {

  /** events → activity mapping; mirror of [[Tables.activities]]. */
  val activitiesCte: String =
    """activities AS (
      |  SELECT CAST(event_id AS VARCHAR) AS id,
      |         user_id AS employee_id,
      |         event_type AS activity_type,
      |         '/page/' || json_extract_string(props, '$.k') AS page_url,
      |         CAST(FLOOR("value") AS INTEGER) AS duration_seconds,
      |         '10.0.' || (user_id % 256) || '.' || (event_id % 256) AS ip_address,
      |         'Mozilla/5.0' AS user_agent,
      |         ts AS activity_timestamp,
      |         user_id || '-' || CAST(CAST(ts AS DATE) AS VARCHAR) AS session_id,
      |         CASE WHEN user_id % 3 = 0 THEN 'mobile'
      |              WHEN user_id % 3 = 1 THEN 'tablet'
      |              ELSE 'desktop' END AS device_type,
      |         CASE WHEN event_id % 3 = 0 THEN 'Chrome'
      |              WHEN event_id % 3 = 1 THEN 'Firefox'
      |              ELSE 'Safari' END AS browser,
      |         ts AS created_at,
      |         event_id
      |  FROM events)""".stripMargin

  /** activity enrichment; mirror of [[graft.enrich.Enrichments.enrichActivities]]
    * with the clock pinned to 2024-02-01 (see Queries.fixedNow).
    */
  val enrichedCte: String =
    """enriched AS (
      |  SELECT a.*,
      |         CAST(hour(activity_timestamp) AS INTEGER) AS activity_hour,
      |         CAST(activity_timestamp AS DATE) AS activity_date,
      |         CASE WHEN duration_seconds < 30 THEN 'short'
      |              WHEN duration_seconds < 300 THEN 'medium'
      |              ELSE 'long' END AS session_duration_category,
      |         COALESCE(hour(activity_timestamp) >= 9
      |                  AND hour(activity_timestamp) <= 17, false)
      |           AS is_business_hours,
      |         CASE WHEN device_type = 'mobile' THEN 'Mobile'
      |              WHEN device_type = 'tablet' THEN 'Tablet'
      |              ELSE 'Desktop' END AS device_category,
      |         'postgresql' AS data_source,
      |         DATE '2024-02-01' AS processing_date
      |  FROM activities a)""".stripMargin

  /** customer → employee mapping; mirror of [[Tables.employees]]. */
  val employeesCte: String =
    """employees AS (
      |  SELECT c_custkey AS id,
      |         c_name AS name,
      |         lower(c_name)
      |           || CASE WHEN c_custkey % 7 = 0 THEN '.senior'
      |                   WHEN c_custkey % 7 = 1 THEN '.lead'
      |                   ELSE '' END
      |           || '@corp.com' AS email,
      |         CASE c_mktsegment WHEN 'BUILDING' THEN 'Engineering'
      |                           WHEN 'AUTOMOBILE' THEN 'IT'
      |                           WHEN 'MACHINERY' THEN 'Sales'
      |                           WHEN 'HOUSEHOLD' THEN 'Marketing'
      |                           ELSE 'HR' END AS department,
      |         TIMESTAMP '2024-01-01 00:00:00' AS created_at
      |  FROM customer)""".stripMargin

  def withActivities(body: String): String =
    s"WITH $activitiesCte\n$body"

  def withEnriched(body: String): String =
    s"WITH $activitiesCte,\n$enrichedCte\n$body"

  def withEmployees(body: String): String =
    s"WITH $employeesCte\n$body"
}
