package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.ParquetUpsertSink

/** Merge-on-read mode for the upsert table: delta-append commits,
  * real-time read (base ∪ deltas merged by key), compaction fold,
  * COW-equivalence over the same commit sequence, O(delta) write cost,
  * and the loud guards that keep base-only readers from serving stale
  * rows.
  */
class UpsertMorSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  /** The shared commit sequence: seed, update+insert wave, tombstone
    * wave — monotone precombine per key (the CDC-normal case where
    * MOR ≡ COW is exact).
    */
  private def commits: Seq[DataFrame] = Seq(
    Seq((1L, 1L, "eng", 10.0, false), (2L, 1L, "ops", 20.0, false),
        (3L, 1L, "eng", 30.0, false))
      .toDF("id", "seq", "dept", "amount", "gone"),
    Seq((2L, 2L, "ops", 25.0, false), (4L, 2L, "hr", 40.0, false))
      .toDF("id", "seq", "dept", "amount", "gone"),
    Seq((1L, 3L, "eng", 0.0, true), (4L, 3L, "hr", 44.0, false))
      .toDF("id", "seq", "dept", "amount", "gone"))

  private def mkSink(dir: String, mode: String): ParquetUpsertSink =
    ParquetUpsertSink(dir, Seq("id"), "seq", "dept",
      deleteCol = Some("gone"), writeMode = mode)

  private def contents(df: DataFrame): Set[(Long, Long, String, Double)] =
    df.select($"id", $"seq", $"dept", $"amount")
      .as[(Long, Long, String, Double)].collect().toSet

  test("MOR read equals COW read over the same commit sequence") {
    val cowDir = tmp("morcow"); val morDir = tmp("mormor")
    val cow = mkSink(cowDir, ParquetUpsertSink.ModeCow)
    val mor = mkSink(morDir, ParquetUpsertSink.ModeMor)
    commits.zipWithIndex.foreach { case (b, i) =>
      cow.upsert(b, i); mor.upsert(b, i)
    }
    val expected = Set((2L, 2L, "ops", 25.0), (3L, 1L, "eng", 30.0),
      (4L, 3L, "hr", 44.0)) // id 1 tombstoned; id 4's later version wins
    assert(contents(spark.read.format("graft-upsert").load(cowDir)) == expected)
    assert(contents(mor.readMor(spark)) == expected)
    // each MOR commit is one delta dir; the base holds nothing
    assert(ParquetUpsertSink.listDeltaCommits(spark, morDir).size == 3)
  }

  test("a small MOR upsert writes O(delta) bytes; the base never moves") {
    val dir = tmp("morbytes")
    val mor = mkSink(dir, ParquetUpsertSink.ModeMor)
    // seed a big-ish base the COW way, then switch the writer to MOR —
    // the realistic migration: existing table, new write mode
    val seed = (0L until 20000L).map(i => (i, 1L, s"d${i % 4}", i.toDouble, false))
    mkSink(dir, ParquetUpsertSink.ModeCow)
      .upsert(seed.toDF("id", "seq", "dept", "amount", "gone"), 0)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def baseFiles: Seq[(String, Long, Long)] =
      fs.globStatus(new org.apache.hadoop.fs.Path(s"$dir/dept=*/part-*"))
        .map(st => (st.getPath.toString, st.getLen, st.getModificationTime))
        .toSeq.sortBy(_._1)
    val before = baseFiles
    val baseBytes = before.map(_._2).sum
    mor.upsert(Seq((7L, 2L, "d3", 777.0, false))
      .toDF("id", "seq", "dept", "amount", "gone"), 1)
    // base files byte-identical and untouched — the commit was a delta
    assert(baseFiles == before)
    val deltas = ParquetUpsertSink.listDeltaCommits(spark, dir)
    assert(deltas.size == 1)
    val deltaBytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(
      s"$dir/${ParquetUpsertSink.DeltaDirName}/${deltas.head}")).getLength
    // O(delta), not O(partition): one row's delta is a sliver of the base
    assert(deltaBytes < baseBytes / 10,
      s"delta $deltaBytes bytes vs base $baseBytes")
    // and the real-time view serves the update
    val row7 = mor.readMor(spark).filter($"id" === 7L)
      .select($"amount").as[Double].collect().toSeq
    assert(row7 == Seq(777.0))
  }

  test("compactMor folds deltas into the base; connector read matches the real-time view") {
    val dir = tmp("morfold")
    val mor = mkSink(dir, ParquetUpsertSink.ModeMor)
    commits.zipWithIndex.foreach { case (b, i) => mor.upsert(b, i) }
    val rt = contents(mor.readMor(spark))
    val folded = mor.compactMor(spark)
    assert(folded.size == 3)
    assert(ParquetUpsertSink.listDeltaCommits(spark, dir).isEmpty)
    assert(contents(mor.readMor(spark)) == rt) // fold is a no-op for readers
    assert(contents(spark.read.format("graft-upsert").load(dir)) == rt)
    // idempotent: nothing left to fold
    assert(mor.compactMor(spark).isEmpty)
  }

  test("base-only readers fail loudly while deltas are unmerged") {
    val dir = tmp("morguard")
    val mor = mkSink(dir, ParquetUpsertSink.ModeMor)
    mor.upsert(commits.head, 0)
    val e = intercept[Exception] {
      spark.read.format("graft-upsert").load(dir).collect()
    }
    assert(e.getMessage.contains("unmerged MOR delta"))
    val e2 = intercept[Exception] { mor.delete(spark, $"id" === 1L) }
    assert(e2.getMessage.contains("unmerged MOR delta"))
    // after compaction the guards lift
    mor.compactMor(spark)
    assert(spark.read.format("graft-upsert").load(dir).count() == 3)
  }

  test("MOR replay is idempotent through the read merge") {
    val dir = tmp("morreplay")
    val mor = mkSink(dir, ParquetUpsertSink.ModeMor)
    mor.upsert(commits.head, 0)
    mor.upsert(commits.head, 0) // at-least-once replay
    assert(ParquetUpsertSink.listDeltaCommits(spark, dir).size == 2)
    assert(contents(mor.readMor(spark)) == Set(
      (1L, 1L, "eng", 10.0), (2L, 1L, "ops", 20.0), (3L, 1L, "eng", 30.0)))
    // compaction folds both replica deltas to the same rows
    mor.compactMor(spark)
    assert(contents(spark.read.format("graft-upsert").load(dir)) == Set(
      (1L, 1L, "eng", 10.0), (2L, 1L, "ops", 20.0), (3L, 1L, "eng", 30.0)))
  }

  test("randomized MOR ≡ COW over arbitrary commit sequences (monotone precombine)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // per round: a batch of (key, op) where op upserts a fresh amount
    // or tombstones; seq = commit index (monotone per key — the CDC
    // contract under which MOR's event-time merge is exactly COW)
    val batchGen: Gen[List[(Long, Boolean, Double)]] =
      Gen.listOfN(12, Gen.zip(
        Gen.chooseNum(1L, 15L),
        Gen.frequency(4 -> false, 1 -> true),
        Gen.chooseNum(1, 999).map(_ * 1.0)))
    (0 until 8).foreach { trial =>
      val cowDir = tmp(s"propcow$trial"); val morDir = tmp(s"propmor$trial")
      val cow = mkSink(cowDir, ParquetUpsertSink.ModeCow)
      val mor = mkSink(morDir, ParquetUpsertSink.ModeMor)
      val nCommits = 3
      (0 until nCommits).foreach { c =>
        val rows = batchGen(Gen.Parameters.default, Seed(trial * 100L + c)).get
          .map { case (k, del, amt) =>
            (k, c.toLong, s"d${k % 3}", amt, del) }
        val df = rows.toDF("id", "seq", "dept", "amount", "gone")
        cow.upsert(df, c); mor.upsert(df, c)
      }
      val a = contents(spark.read.format("graft-upsert").load(cowDir))
      val b = contents(mor.readMor(spark))
      assert(a == b, s"trial $trial: COW $a vs MOR $b")
      // and the fold materializes the same rows
      mor.compactMor(spark)
      assert(contents(spark.read.format("graft-upsert").load(morDir)) == a,
        s"trial $trial post-fold")
    }
  }

  test("re-folding an already-folded delta is idempotent (crash between fold and delta delete)") {
    val dir = tmp("morcrash")
    val mor = mkSink(dir, ParquetUpsertSink.ModeMor)
    commits.zipWithIndex.foreach { case (b, i) => mor.upsert(b, i) }
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // save a copy of the last delta commit, as if the fold crashed
    // AFTER the base rewrite but BEFORE removing this delta dir
    val deltas = ParquetUpsertSink.listDeltaCommits(spark, dir)
    val saved = new org.apache.hadoop.fs.Path(s"$dir/.saved_delta")
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(s"$dir/${ParquetUpsertSink.DeltaDirName}/${deltas.last}"),
      fs, saved, false, fs.getConf)
    mor.compactMor(spark)
    val folded = contents(spark.read.format("graft-upsert").load(dir))
    // "crash replay": the folded delta reappears; a second fold must
    // converge to the same table (its rows are already in the base)
    org.apache.hadoop.fs.FileUtil.copy(fs, saved, fs,
      new org.apache.hadoop.fs.Path(s"$dir/${ParquetUpsertSink.DeltaDirName}/${deltas.last}"),
      false, fs.getConf)
    assert(mor.compactMor(spark).nonEmpty)
    assert(contents(spark.read.format("graft-upsert").load(dir)) == folded)
  }

  test("an empty MOR batch writes no delta; the real-time view keeps working") {
    val dir = tmp("morempty")
    val mor = mkSink(dir, ParquetUpsertSink.ModeMor)
    mor.upsert(commits.head, 0)
    mor.upsert(commits.head.limit(0), 1) // routine empty micro-batch
    assert(ParquetUpsertSink.listDeltaCommits(spark, dir).size == 1)
    assert(mor.readMor(spark).count() == 3)
    // a fully-quarantined batch is empty AFTER screening, same path
    val screened = ParquetUpsertSink(dir, Seq("id"), "seq", "dept",
      deleteCol = Some("gone"), writeMode = ParquetUpsertSink.ModeMor,
      expectations = Seq("never" -> org.apache.spark.sql.functions.lit(false)))
    screened.upsert(Seq((9L, 9L, "zz", 1.0, false))
      .toDF("id", "seq", "dept", "amount", "gone"), 2)
    assert(ParquetUpsertSink.listDeltaCommits(spark, dir).size == 1)
    assert(mor.readMor(spark).count() == 3)
  }

  test("time travel stays readable while MOR deltas are pending (history is delta-independent)") {
    val dir = tmp("morasof")
    // COW phase with retention builds history, then the writer switches
    // to MOR and leaves a pending delta
    val cow = ParquetUpsertSink(dir, Seq("id"), "seq", "dept",
      deleteCol = Some("gone"), keepVersions = 4)
    cow.upsert(commits.head, 0)
    cow.upsert(commits(1), 1)
    val firstCommit = ParquetUpsertSink.listArchivedCommits(spark, dir).head
    mkSink(dir, ParquetUpsertSink.ModeMor).upsert(commits(2), 2)
    assert(ParquetUpsertSink.listDeltaCommits(spark, dir).nonEmpty)
    // live read fails loudly, but VERSION AS OF still answers
    intercept[Exception] { spark.read.format("graft-upsert").load(dir).collect() }
    val asOf = spark.read.format("graft-upsert").option("asOf", firstCommit).load(dir)
    assert(asOf.select($"id").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("MOR inline compaction cadence folds every Nth commit") {
    val dir = tmp("morinline")
    val mor = ParquetUpsertSink(dir, Seq("id"), "seq", "dept",
      deleteCol = Some("gone"), writeMode = ParquetUpsertSink.ModeMor,
      compactEvery = 2, keepVersions = 4)
    commits.zipWithIndex.foreach { case (b, i) => mor.upsert(b, i) }
    // batches 0,1,2: fold fires after batch 1 (2 deltas -> base),
    // batch 2's delta remains live
    assert(ParquetUpsertSink.listDeltaCommits(spark, dir).size == 1)
    // the fold archived pre-images: it is a time-travel-visible commit
    assert(ParquetUpsertSink.listArchivedCommits(spark, dir).nonEmpty)
    // real-time view unchanged by the fold
    assert(contents(mor.readMor(spark)) == Set(
      (2L, 2L, "ops", 25.0), (3L, 1L, "eng", 30.0), (4L, 3L, "hr", 44.0)))
    // an EMPTY batch landing on the cadence slot still folds — the
    // schedule is positional, not data-driven
    mor.upsert(commits.head.limit(0), 3)
    assert(ParquetUpsertSink.listDeltaCommits(spark, dir).isEmpty)
  }

  test("MOR rides the DSv2 write path via the writeMode option") {
    val dir = tmp("mordsv2")
    Seq((1L, 1L, "a", 1.0, false), (2L, 1L, "b", 2.0, false))
      .toDF("id", "seq", "dept", "amount", "gone")
      .write.format("graft-upsert")
      .option("recordKeys", "id").option("precombine", "seq")
      .option("partitionCol", "dept").option("deleteCol", "gone")
      .option("writeMode", "mor")
      .mode("append").save(dir)
    assert(ParquetUpsertSink.listDeltaCommits(spark, dir).size == 1)
    val mor = mkSink(dir, ParquetUpsertSink.ModeMor)
    assert(contents(mor.readMor(spark)) == Set((1L, 1L, "a", 1.0), (2L, 1L, "b", 2.0)))
  }

  test("CALL graft.system.compact folds MOR deltas via the persisted table config") {
    val dir = tmp("morproc")
    val mor = mkSink(dir, ParquetUpsertSink.ModeMor)
    commits.take(2).zipWithIndex.foreach { case (b, i) => mor.upsert(b, i) }
    // persistWriteConfig ran on the first commit: the procedure can
    // reconstruct merge semantics from _table.properties alone
    val out = spark.sql(s"CALL graft.system.compact('$dir')")
      .as[String].collect().toSeq
    assert(out.count(_.startsWith("delta:")) == 2)
    assert(ParquetUpsertSink.listDeltaCommits(spark, dir).isEmpty)
    assert(contents(spark.read.format("graft-upsert").load(dir)) == Set(
      (1L, 1L, "eng", 10.0), (2L, 2L, "ops", 25.0),
      (3L, 1L, "eng", 30.0), (4L, 2L, "hr", 40.0)))
  }
}
