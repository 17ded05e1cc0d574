package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Operational profiling for large tables — the checks a pipeline runs
  * BEFORE trusting or joining 100 TB of input:
  *
  *  - [[dqReport]]: a data-quality audit (null/range/domain violations
  *    in ONE conditional-aggregate pass over the fact table, plus a
  *    referential-integrity orphan count as an anti-join) — the
  *    expectation-suite shape (cf. Deequ/Great Expectations) expressed
  *    as plain Spark aggregates;
  *  - [[keySkew]]: a join-key skew profile (per-key counts → heaviest
  *    keys with share, key cardinality, max/avg skew factor) — the
  *    number that decides between a plain shuffle join, AQE skew
  *    splitting, or an explicit salt BEFORE the job runs.
  *
  * Scale shape: every rule in the audit is a conditional sum riding one
  * scan (no per-rule passes); the orphan check is a key-only anti-join
  * whose strategy is left to the planner (broadcast at small dims, AQE
  * otherwise). The skew profile is a partial-aggregated groupBy count,
  * a metadata-scale stats row, and a bounded TakeOrdered top-k — no
  * global sort, no collect.
  */
object Profiling {

  /** One row per rule: (rule, n_violations, n_rows, frac). Scalar rules
    * share a single pass; `orphans` (child → parent key) adds one
    * anti-join counted against the same total.
    */
  def dataQuality(child: DataFrame, scalarRules: Seq[(String, Column)],
      orphanRule: Option[(String, Column, DataFrame, Column)]): DataFrame = {
    val aggs = count(lit(1)).cast("long").as("n_rows") +:
      scalarRules.zipWithIndex.map { case ((_, cond), i) =>
        sum(when(cond, 1L).otherwise(0L)).as(s"v$i")
      }
    // ONE row, materialized once: both the stack projection and the
    // orphan branch's n_rows read the checkpointed scalar instead of
    // re-running the fact-table scan
    val base = child.agg(aggs.head, aggs.tail: _*).localCheckpoint(true)
    val stackArgs = scalarRules.zipWithIndex
      .map { case ((name, _), i) => s"'$name', v$i" }
      .mkString(", ")
    val scalar = base.selectExpr(
      s"stack(${scalarRules.size}, $stackArgs) AS (rule, n_violations)", "n_rows")
    val allRules = orphanRule match {
      case Some((name, childKey, parent, parentKey)) =>
        val orphanCount = child
          .join(parent.select(parentKey.as("__pk")), childKey === col("__pk"), "left_anti")
          .agg(count(lit(1)).cast("long").as("n_violations"))
          .withColumn("rule", lit(name))
          .crossJoin(base.select(col("n_rows"))) // 1×1 rows: metadata scale
          .select(col("rule"), col("n_violations"), col("n_rows"))
        scalar.unionByName(orphanCount)
      case None => scalar
    }
    allRules
      .withColumn("frac", round(col("n_violations") / col("n_rows"), 6))
      .orderBy(col("rule"))
  }

  /** Heaviest `k` keys of `key` in `df` with count, corpus share, key
    * cardinality, and the max/avg skew factor. Deterministic output
    * order (count desc, key asc).
    */
  def keySkew(df: DataFrame, key: Column, k: Int = 10): DataFrame = {
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(
      count(lit(1)).cast("long").as("n_keys"),
      sum(col("cnt")).cast("long").as("n_rows"),
      max(col("cnt")).as("max_cnt"),
      avg(col("cnt")).as("avg_cnt"))
    counts
      .orderBy(col("cnt").desc, col("key")) // bounded: TakeOrdered k
      .limit(k)
      .crossJoin(stats) // k×1 rows: metadata scale
      .select(col("key"), col("cnt"),
        round(col("cnt") / col("n_rows"), 6).as("share"),
        col("n_keys"),
        round(col("max_cnt") / col("avg_cnt"), 4).as("skew"))
      .orderBy(col("cnt").desc, col("key"))
  }

  // ——— registered queries ———

  /** DQ audit of `orders`: date range, status domain, non-positive
    * price (one pass) + customer-key orphans (anti-join).
    */
  def dqReport(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.table(spark, sfDir, "orders")
    val customer = Tables.table(spark, sfDir, "customer")
    dataQuality(orders,
      Seq(
        "orderdate_out_of_range" ->
          (col("o_orderdate") < lit("1992-01-01").cast("date") ||
            col("o_orderdate") > lit("1998-12-31").cast("date")),
        "status_domain" -> !col("o_orderstatus").isin("O", "F", "P"),
        "totalprice_nonpositive" -> (col("o_totalprice") <= 0)),
      Some(("custkey_orphan", col("o_custkey"), customer, col("c_custkey"))))
  }

  val dqReportSql: String =
    """SELECT rule, n_violations, n_rows,
      |       round(n_violations * 1.0 / n_rows, 6) AS frac
      |FROM (
      |  SELECT 'orderdate_out_of_range' AS rule,
      |         CAST(sum(CASE WHEN o_orderdate < DATE '1992-01-01'
      |                         OR o_orderdate > DATE '1998-12-31'
      |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
      |         count(*) AS n_rows
      |  FROM orders
      |  UNION ALL
      |  SELECT 'status_domain',
      |         CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
      |                       THEN 1 ELSE 0 END) AS BIGINT),
      |         count(*)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'totalprice_nonpositive',
      |         CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT),
      |         count(*)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'custkey_orphan',
      |         (SELECT count(*) FROM orders o
      |          LEFT JOIN customer c ON c.c_custkey = o.o_custkey
      |          WHERE c.c_custkey IS NULL),
      |         (SELECT count(*) FROM orders)
      |)
      |ORDER BY rule""".stripMargin

  /** Skew profile of the `events.user_id` join key. */
  def eventKeySkew(spark: SparkSession, sfDir: String): DataFrame =
    keySkew(Tables.events(spark, sfDir), col("user_id"))
      .withColumnRenamed("key", "user_id")

  val eventKeySkewSql: String =
    """WITH counts AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
      |stats AS (SELECT count(*) AS n_keys,
      |                 CAST(sum(cnt) AS BIGINT) AS n_rows,
      |                 max(cnt) AS max_cnt, avg(cnt) AS avg_cnt
      |          FROM counts)
      |SELECT c.user_id, c.cnt,
      |       round(c.cnt * 1.0 / s.n_rows, 6) AS share,
      |       s.n_keys,
      |       round(s.max_cnt * 1.0 / s.avg_cnt, 4) AS skew
      |FROM counts c CROSS JOIN stats s
      |ORDER BY c.cnt DESC, c.user_id
      |LIMIT 10""".stripMargin
}
