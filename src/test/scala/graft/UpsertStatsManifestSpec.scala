package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.io.{ParquetUpsertSink, UpsertDataSkipping, UpsertStatsManifest}

/** The persisted file-statistics manifest (`_stats.manifest`) — the
  * Delta/Iceberg-style "stats in metadata" move that lets planning
  * prune files without opening one parquet footer per file per driver
  * lifetime.
  *
  * Contract under test: manifest-served and footer-served statistics
  * are IDENTICAL (they share the resolve path; the manifest stores raw
  * physical values); the manifest is written lazily by the first
  * planning pass and then serves later passes with zero footer opens;
  * stale entries (rewritten files) fall back to footers and repair;
  * the rename lineage resolves against manifest entries exactly as
  * against footers; the conf kills the whole feature.
  */
class UpsertStatsManifestSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def clearInMemory(): Unit = {
    UpsertDataSkipping.clearStatsCacheForTesting()
    UpsertStatsManifest.clearCachesForTesting()
  }

  /** A one-partition table covering the stat-type matrix: numerics,
    * date/timestamp, string, binary, array, an all-null column, and a
    * column with nulls mixed in.
    */
  private def typedTable(prefix: String): String = {
    val dir = tmp(prefix)
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
    val df = spark.range(0, 100).select(
      col("id"), lit(0L).as("seq"), lit("a").as("p"),
      col("id").cast("int").as("i"),
      (col("id") * 2).as("l"),
      col("id").cast("float").as("f"),
      (col("id") * 1.5).as("d"),
      date_add(lit(java.sql.Date.valueOf("2024-01-01")), col("id").cast("int")).as("dt"),
      timestamp_seconds(col("id") * 60).as("ts"),
      concat(lit("s"), col("id")).as("s"),
      encode(concat(lit("b"), col("id")), "UTF-8").as("bin"),
      array(col("id"), col("id") + 1).as("arr"),
      lit(null).cast("double").as("allnull"),
      when(col("id") % 3 === 0, col("id").cast("double")).as("somenull"))
    sink.upsert(df, 0)
    dir
  }

  test("manifest round-trip: served stats are IDENTICAL to footer stats") {
    val dir = typedTable("mfrt")
    val fs = fsOf(dir)
    val schema = spark.read.format("graft-upsert").load(dir).schema
    val file = fs.listStatus(new Path(s"$dir/p=a")).map(_.getPath)
      .filter(_.getName.startsWith("part-")).head

    clearInMemory()
    val fromFooter = UpsertDataSkipping.fileStatsAll(fs, Seq(file), schema, fs.getConf)
    // the pass wrote the manifest
    assert(fs.exists(new Path(s"$dir/p=a/${UpsertStatsManifest.ManifestFileName}")))

    clearInMemory()
    val before = UpsertStatsManifest.footerReads.get()
    val fromManifest = UpsertDataSkipping.fileStatsAll(fs, Seq(file), schema, fs.getConf)
    assert(UpsertStatsManifest.footerReads.get() == before,
      "second pass must serve from the manifest, zero footer opens")
    assert(fromManifest == fromFooter,
      "manifest-served statistics must equal footer-served statistics")
    // sanity on content: exact min/max for each numeric kind
    val st = fromManifest(file.toString)
    assert(st.rowCount.contains(100L))
    assert(st.cols("i").min.contains(0) && st.cols("i").max.contains(99))
    assert(st.cols("l").min.contains(0L) && st.cols("l").max.contains(198L))
    assert(st.cols("f").max.contains(99.0f))
    assert(st.cols("d").max.contains(148.5))
    assert(st.cols("dt").decodable && st.cols("ts").decodable)
    assert(!st.cols("s").decodable && !st.cols("bin").decodable) // truncatable
    assert(st.cols("allnull").nullCount.contains(100L) &&
      st.cols("allnull").decodable && st.cols("allnull").min.isEmpty)
    assert(st.cols("somenull").nullCount.contains(66L))
  }

  test("planning prunes from the manifest with zero footer opens") {
    val dir = tmp("mfplan")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
    val rows = (0 until 400).map(n => (n.toLong, 0L, n.toLong, s"p${n / 100}"))
    sink.upsert(rows.toDF("id", "seq", "v", "p"), 0)
    // first planning pass: footers read, manifests written per dir
    def planned(hi: Long): Int = spark.read.format("graft-upsert").load(dir)
      .where(col("v") < hi).rdd.getNumPartitions
    clearInMemory()
    assert(planned(100L) == 1) // v ranges align with partitions: only p0
    (0 to 3).foreach(i =>
      assert(fsOf(dir).exists(
        new Path(s"$dir/p=p$i/${UpsertStatsManifest.ManifestFileName}"))))
    // a fresh "driver" (in-memory caches dropped): same plan, manifest-only
    clearInMemory()
    val before = UpsertStatsManifest.footerReads.get()
    assert(planned(100L) == 1)
    assert(planned(1000L) == 4)
    assert(UpsertStatsManifest.footerReads.get() == before,
      "re-planning after a cache wipe must not open footers")
  }

  test("rewritten files fall back to footers and the manifest repairs") {
    val dir = tmp("mfstale")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
    sink.upsert(Seq((1L, 0L, 10.0, "a")).toDF("id", "seq", "v", "p"), 0)
    clearInMemory()
    def maxV(): Double = spark.read.format("graft-upsert").load(dir)
      .where(col("v") > 0.0).agg(max("v")).as[Double].head()
    assert(maxV() == 10.0)
    // rewrite the partition (new file name/mtime): stale entry must not serve
    sink.upsert(Seq((1L, 1L, 99.0, "a")).toDF("id", "seq", "v", "p"), 1)
    clearInMemory()
    assert(maxV() == 99.0)
    // and pruning against the REPAIRED manifest stays sound
    clearInMemory()
    assert(spark.read.format("graft-upsert").load(dir)
      .where(col("v") > 100.0).rdd.getNumPartitions == 0)
    assert(spark.read.format("graft-upsert").load(dir)
      .where(col("v") > 50.0).count() == 1)
  }

  test("rename lineage resolves against manifest entries like footers") {
    val dir = tmp("mfren")
    val t = s"graft.`$dir`"
    spark.sql(
      s"""CREATE TABLE $t (id BIGINT, seq BIGINT, dept STRING, amount DOUBLE)
         |PARTITIONED BY (dept)
         |TBLPROPERTIES ('recordKeys'='id', 'precombine'='seq', 'keepVersions'='5')
         |""".stripMargin)
    spark.sql(s"INSERT INTO $t VALUES (1, 1, 'eng', 10.0), (2, 1, 'ops', 20.0)")
    Thread.sleep(5)
    spark.sql(s"INSERT INTO $t VALUES (3, 1, 'hr', 30.0)")
    val commits = ParquetUpsertSink.listArchivedCommits(spark, dir)
    spark.sql(s"ALTER TABLE $t RENAME COLUMN amount TO price")
    def timeTravel(): Seq[(Long, Double)] = spark.sql(
      s"SELECT id, price FROM $t VERSION AS OF '${commits(0)}' WHERE price > 15.0")
      .as[(Long, Double)].collect().toSeq
    clearInMemory()
    assert(timeTravel() == Seq((2L, 20.0))) // footers + manifest write
    clearInMemory()
    val before = UpsertStatsManifest.footerReads.get()
    assert(timeTravel() == Seq((2L, 20.0))) // manifest-served, alias-resolved
    assert(UpsertStatsManifest.footerReads.get() == before)
  }

  test("manifestRowCount answers from manifests alone, None on any gap") {
    val dir = tmp("mfrows")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
    val rows = (0 until 300).map(n => (n.toLong, 0L, n.toLong, s"p${n % 3}"))
    sink.upsert(rows.toDF("id", "seq", "v", "p"), 0)
    val fs = fsOf(dir)
    def files: Seq[Path] = (0 to 2).flatMap(i =>
      fs.listStatus(new Path(s"$dir/p=p$i")).map(_.getPath)
        .filter(_.getName.startsWith("part-")))
    // before any planning pass: no manifests yet → None, zero footers
    clearInMemory()
    val before = UpsertStatsManifest.footerReads.get()
    assert(UpsertStatsManifest.manifestRowCount(fs, files).isEmpty)
    assert(UpsertStatsManifest.footerReads.get() == before,
      "the costing path must NEVER open footers")
    // one planning pass persists the manifests → exact count, no footers
    spark.read.format("graft-upsert").load(dir).where(col("v") > -1).count()
    clearInMemory()
    val mid = UpsertStatsManifest.footerReads.get()
    assert(UpsertStatsManifest.manifestRowCount(fs, files).contains(300L))
    assert(UpsertStatsManifest.footerReads.get() == mid)
    // a rewritten partition invalidates its entries → None again (no
    // partial answers), until the next pass repairs it
    sink.upsert(Seq((0L, 1L, 99L, "p0")).toDF("id", "seq", "v", "p"), 1)
    clearInMemory()
    assert(UpsertStatsManifest.manifestRowCount(fs, files).isEmpty)
  }

  test("CALL graft.system.collect_stats warms every directory's manifest") {
    val dir = tmp("mfwarm")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
    val rows = (0 until 200).map(n => (n.toLong, 0L, n.toLong, s"p${n % 2}"))
    sink.upsert(rows.toDF("id", "seq", "v", "p"), 0)
    clearInMemory()
    val out = spark.sql(s"CALL graft.system.collect_stats('$dir')")
      .as[(String, Int, Long)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._1) == Seq("p0", "p1"))
    assert(out.map(_._3).sum == 200L) // exact footer row counts reported
    val fs = fsOf(dir)
    (0 to 1).foreach(i => assert(fs.exists(
      new Path(s"$dir/p=p$i/${UpsertStatsManifest.ManifestFileName}"))))
    // a fresh "driver" now costs the table without a single footer open
    clearInMemory()
    val before = UpsertStatsManifest.footerReads.get()
    val files = (0 to 1).flatMap(i =>
      fs.listStatus(new Path(s"$dir/p=p$i")).map(_.getPath)
        .filter(_.getName.startsWith("part-")))
    assert(UpsertStatsManifest.manifestRowCount(fs, files).contains(200L))
    assert(UpsertStatsManifest.footerReads.get() == before)
  }

  test("the conf switch disables manifest reads AND writes") {
    val dir = tmp("mfoff")
    spark.conf.set(UpsertStatsManifest.EnabledConfKey, "false")
    try {
      val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
      sink.upsert(Seq((1L, 0L, 10.0, "a")).toDF("id", "seq", "v", "p"), 0)
      clearInMemory()
      assert(spark.read.format("graft-upsert").load(dir)
        .where(col("v") > 50.0).rdd.getNumPartitions == 0)
      assert(!fsOf(dir).exists(
        new Path(s"$dir/p=a/${UpsertStatsManifest.ManifestFileName}")))
    } finally spark.conf.unset(UpsertStatsManifest.EnabledConfKey)
  }

  test("resolve applies the widening promotions and the date gate") {
    import graft.io.UpsertStatsManifest.{RawColStats, RawFileStats}
    val raw = RawFileStats(10L, Seq("n", "d"), Map(
      "n" -> RawColStats("INT32", "-", 10L, Some(0L), hadNonNull = true,
        structOk = true, Some(1), Some(9)),
      "d" -> RawColStats("INT32", "date", 10L, Some(0L), hadNonNull = true,
        structOk = true, Some(1), Some(9))))
    // INT32 under a widened LONG column promotes ...
    val widened = UpsertStatsManifest.resolve(raw,
      StructType(Seq(StructField("n", LongType))), Map.empty)
    assert(widened.cols("n").decodable &&
      widened.cols("n").min.contains(1L) && widened.cols("n").max.contains(9L))
    // ... but a DATE-annotated INT32 under an integral type must NOT
    // (days-since-epoch is a different quantity)
    val dated = UpsertStatsManifest.resolve(raw,
      StructType(Seq(StructField("d", LongType))), Map.empty)
    assert(!dated.cols("d").decodable)
  }
}
