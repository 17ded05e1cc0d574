package graft

import org.apache.spark.sql.functions._

import graft.ext.Profiling

/** Data-quality audit + join-key skew profile on synthetic dirty data
  * (the sf tables are clean by construction, so violations there are
  * all-zero — these fixtures prove the rules actually fire).
  */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("dataQuality counts each rule's violations independently") {
    val child = Seq(
      (1L, 10.0, "ok"), (2L, -5.0, "ok"), (3L, 0.0, "bad"),
      (4L, 7.5, "ok"), (99L, -1.0, "bad")
    ).toDF("fk", "amount", "status")
    val parent = Seq(1L, 2L, 3L, 4L).toDF("pk")
    val report = Profiling.dataQuality(child,
      Seq(
        "amount_nonpositive" -> (col("amount") <= 0),
        "status_domain" -> !col("status").isin("ok")),
      Some(("fk_orphan", col("fk"), parent, col("pk"))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(report == Seq(
      ("amount_nonpositive", 3L, 5L, 0.6),
      ("fk_orphan", 1L, 5L, 0.2),
      ("status_domain", 2L, 5L, 0.4)))
  }

  test("keySkew ranks heavy keys with share and skew factor") {
    // key 7 appears 6 times, key 8 thrice, keys 1..3 once: 10 rows, 5 keys
    val df = (Seq.fill(6)(7L) ++ Seq.fill(3)(8L) ++ Seq(1L, 2L, 3L))
      .toDF("k") // 12 rows, 5 keys, avg 2.4, max 6 -> skew 2.5
    val rows = Profiling.keySkew(df, col("k"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(rows == Seq(
      (7L, 6L, 0.5, 5L, 2.5),
      (8L, 3L, 0.25, 5L, 2.5),
      (1L, 1L, round(1.0 / 12, 6), 5L, 2.5)))
  }

  private def round(v: Double, p: Int): Double =
    BigDecimal(v).setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble
}
