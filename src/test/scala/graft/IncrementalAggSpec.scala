package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.{IncrementalAgg, ParquetUpsertSink}

/** Partition-grain incremental aggregate maintenance: refresh must
  * equal a full recompute after updates, key tombstones, and whole
  * partitions vanishing — while reading only touched partitions.
  */
case class Fact(id: Int, grp: String, amount: Double, precombine: Long,
    day: String)

case class FactD(id: Int, grp: String, amount: Double, precombine: Long,
    day: String, is_delete: Boolean)

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def stateContent(agg: IncrementalAgg) =
    spark.read.parquet(agg.statePath)
      .select("day", "grp", "n_rows", "sum_v")
      .collect()
      .map(r => (r.getAs[String]("day"), r.getAs[String]("grp"),
        r.getAs[Long]("n_rows"), r.getAs[Double]("sum_v")))
      .toSet

  private def fullContent(agg: IncrementalAgg) =
    agg.fullState(spark).collect()
      .map(r => (r.getAs[String]("day"), r.getAs[String]("grp"),
        r.getAs[Long]("n_rows"), r.getAs[Double]("sum_v")))
      .toSet

  test("refresh tracks updates, tombstones, and vanished partitions exactly") {
    val base = Files.createTempDirectory("ivm").toString
    // keepVersions deep enough to retain every commit's manifest
    val source = ParquetUpsertSink(s"$base/src", Seq("id"), "precombine", "day",
      deleteCol = Some("is_delete"), keepVersions = 10)
    val agg = IncrementalAgg(source, s"$base/state", "grp", "amount")

    // commit 0: two partitions, two groups
    source.upsert(Seq(
      FactD(1, "a", 10.0, 1, "d1", false),
      FactD(2, "a", 5.0, 1, "d1", false),
      FactD(3, "b", 7.0, 1, "d1", false),
      FactD(4, "a", 2.0, 1, "d2", false)).toDF(), 0)
    agg.refresh(spark, "", 0)
    assert(stateContent(agg) == fullContent(agg))
    assert(stateContent(agg) == Set(
      ("d1", "a", 2L, 15.0), ("d1", "b", 1L, 7.0), ("d2", "a", 1L, 2.0)))

    val commits0 = ParquetUpsertSink.listArchivedCommits(spark, source.path)

    // commit 1: update one row's amount and tombstone group b's only
    // row in d1; d2 untouched
    source.upsert(Seq(
      FactD(1, "a", 100.0, 2, "d1", false),
      FactD(3, "b", 7.0, 2, "d1", true)).toDF(), 1)
    agg.refresh(spark, commits0.last, 1)
    assert(stateContent(agg) == fullContent(agg))
    assert(stateContent(agg) == Set(
      ("d1", "a", 2L, 105.0), ("d2", "a", 1L, 2.0)))

    val commits1 = ParquetUpsertSink.listArchivedCommits(spark, source.path)

    // commit 2: tombstone ALL of d2 — the partition vanishes and so
    // must its state rows
    source.upsert(Seq(FactD(4, "a", 2.0, 3, "d2", true)).toDF(), 2)
    agg.refresh(spark, commits1.last, 2)
    assert(stateContent(agg) == fullContent(agg))
    assert(stateContent(agg) == Set(("d1", "a", 2L, 105.0)))

    // the maintained global aggregate rolls up from state alone
    val global = agg.globalAgg(spark).collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Long]("n_rows"),
        r.getAs[Double]("sum_v"))).toSet
    assert(global == Set(("a", 2L, 105.0)))
  }

  test("refresh replays idempotently and no-ops on an empty change set") {
    val base = Files.createTempDirectory("ivm2").toString
    val source = ParquetUpsertSink(s"$base/src", Seq("id"), "precombine", "day",
      keepVersions = 10)
    val agg = IncrementalAgg(source, s"$base/state", "grp", "amount")
    source.upsert(Seq(
      Fact(1, "a", 1.0, 1, "d1"), Fact(2, "b", 2.0, 1, "d1")).toDF(), 0)
    agg.refresh(spark, "", 0)
    val once = stateContent(agg)
    agg.refresh(spark, "", 0) // replay the same refresh
    assert(stateContent(agg) == once)
    // nothing newer than the last commit → no state write at all
    val commits = ParquetUpsertSink.listArchivedCommits(spark, source.path)
    agg.refresh(spark, commits.last, 1)
    assert(stateContent(agg) == once)
  }
}
