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

  private def readManifestText(fs: org.apache.hadoop.fs.FileSystem,
      mf: Path): String = {
    val in = fs.open(mf)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private def withConf[A](key: String, value: String)(body: => A): A = {
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Most tests here assert that a write-then-plan sequence persists
    * the manifest immediately; the racy-write window (which exists
    * precisely to DELAY that persistence until the file's mtime tick
    * has closed) is pinned by its own tests below and zeroed for the
    * rest.
    */
  private def noRacyWindow[A](body: => A): A =
    withConf(UpsertStatsManifest.RacyWindowConfKey, "0")(body)

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

  test("manifest round-trip: served stats are IDENTICAL to footer stats") { noRacyWindow {
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
  } }

  test("planning prunes from the manifest with zero footer opens") { noRacyWindow {
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
  } }

  test("rewritten files fall back to footers and the manifest repairs") { noRacyWindow {
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
  } }

  test("rename lineage resolves against manifest entries like footers") { noRacyWindow {
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
  } }

  test("manifestRowCount answers from manifests alone, None on any gap") { noRacyWindow {
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
  } }

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

  // ——— staleness soundness: the (mtime, len) key's two nets ———

  test("flush never resurrects a directory deleted under pending entries") {
    val dir = tmp("mfdrop")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
    sink.upsert(Seq((1L, 0L, 10.0, "a")).toDF("id", "seq", "v", "p"), 0)
    val fs = fsOf(dir)
    val part = new Path(s"$dir/p=a")
    // an open-tick entry WITHOUT a real fingerprint stays in `pending`
    // across flushes (never persisted inside the tick) — exactly the
    // state a DROP TABLE can race: Hadoop create() makes parent dirs,
    // so an unguarded flush would recreate p=a and tableExists would
    // see a live table again
    UpsertStatsManifest.recordFresh(fs, part, "part-zombie.parquet",
      System.currentTimeMillis(), 123L,
      UpsertStatsManifest.RawFileStats(1L, Seq.empty, Map.empty),
      UpsertStatsManifest.FpUnreadable, enabled = true)
    fs.delete(new Path(dir), true) // DROP TABLE
    UpsertStatsManifest.flush(fs)
    assert(!fs.exists(part) && !fs.exists(new Path(dir)),
      "flush must not recreate a dropped table's partition directories")
    // terminal: the dropped dir's entries are gone, not re-offered
    UpsertStatsManifest.flush(fs)
    assert(!fs.exists(part))
  }

  test("racy-write window: open-tick entries persist FLAGGED and self-heal once ripe") {
    val dir = tmp("mfracy")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
    sink.upsert(Seq((1L, 0L, 10.0, "a")).toDF("id", "seq", "v", "p"), 0)
    val fs = fsOf(dir)
    val mf = new Path(s"$dir/p=a/${UpsertStatsManifest.ManifestFileName}")
    withConf(UpsertStatsManifest.RacyWindowConfKey, "600") {
      clearInMemory()
      spark.read.format("graft-upsert").load(dir).where(col("v") > 0.0).count()
      // the entry's mtime tick is still open, but it carries a real
      // footer fingerprint — it persists IMMEDIATELY, flagged
      // verifyOnRead, so a one-shot maintenance JVM's warm is durable
      // without sleeping the tick out
      assert(fs.exists(mf),
        "an open-tick entry with a real fingerprint must persist flagged")
      assert(readManifestText(fs, mf).linesIterator
        .exists(l => l.startsWith("f ") && l.endsWith(" 1")),
        "the open-tick entry must carry the verifyOnRead flag")
      // a fresh driver plans from the flagged manifest with zero
      // footer PARSES — the flag costs one tail read, not a re-read
      clearInMemory()
      val before = UpsertStatsManifest.footerReads.get()
      spark.read.format("graft-upsert").load(dir).where(col("v") > 0.0).count()
      assert(UpsertStatsManifest.footerReads.get() == before,
        "a flagged entry must serve (verified) without a footer re-read")
      // the verified serve self-heals: once the tick has closed, the
      // next pass's verified serve re-records the entry and its flush
      // persists it unflagged
      Thread.sleep(700)
      clearInMemory()
      spark.read.format("graft-upsert").load(dir).where(col("v") > 0.0).count()
      assert(readManifestText(fs, mf).linesIterator
        .forall(l => !l.startsWith("f ") || l.endsWith(" 0")),
        "a verified flagged entry must self-heal to unflagged once ripe")
    }
  }

  test("racy-write window: a same-tick in-place rewrite never serves the flagged stale entry") {
    def build(v: Double): String = {
      val dir = tmp("mfracyrw")
      val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
      sink.upsert(Seq((1L, 0L, v, "a")).toDF("id", "seq", "v", "p"), 0)
      dir
    }
    val dir = build(10.0); val donor = build(99.0)
    val fs = fsOf(dir)
    def partFile(d: String): Path = fs.listStatus(new Path(s"$d/p=a"))
      .map(_.getPath).filter(_.getName.startsWith("part-")).head
    val victim = partFile(dir); val src = partFile(donor)
    val st0 = fs.getFileStatus(victim)
    assert(fs.getFileStatus(src).getLen == st0.getLen)
    // a LONG open tick: the rewrite below lands inside it, so only the
    // flagged entry's fingerprint check stands between the pruner and
    // the stale max
    withConf(UpsertStatsManifest.RacyWindowConfKey, "60000") {
      clearInMemory()
      assert(spark.read.format("graft-upsert").load(dir)
        .where(col("v") > 50.0).count() == 0)
      assert(fs.exists(new Path(s"$dir/p=a/${UpsertStatsManifest.ManifestFileName}")),
        "the open-tick entry must have persisted flagged")
      // same-tick in-place rewrite: same name, mtime, len
      val bytes = {
        val in = fs.open(src)
        try { val b = new Array[Byte](st0.getLen.toInt); in.readFully(0, b, 0, b.length); b }
        finally in.close()
      }
      val out = fs.create(victim, true)
      try out.write(bytes) finally out.close()
      fs.setTimes(victim, st0.getModificationTime, -1)
      // DEFAULT conf: the flagged entry's fingerprint mismatches the
      // rewritten footer → refused → footer re-read sees max 99.0
      clearInMemory()
      assert(spark.read.format("graft-upsert").load(dir)
        .where(col("v") > 50.0).count() == 1,
        "default-mode planning must refuse the flagged stale entry")
    }
  }

  test("in-place rewrite preserving (name, mtime, len): verified mode refuses stale stats") {
    // two tables identical but for one double value; their single part
    // files must be byte-length-identical so the copy below is a true
    // same-name+len in-place rewrite
    def build(v: Double): String = {
      val dir = tmp("mfinplace")
      val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
      sink.upsert(Seq((1L, 0L, v, "a")).toDF("id", "seq", "v", "p"), 0)
      dir
    }
    val dir = build(10.0); val donor = build(99.0)
    val fs = fsOf(dir)
    def partFile(d: String): Path = fs.listStatus(new Path(s"$d/p=a"))
      .map(_.getPath).filter(_.getName.startsWith("part-")).head
    val victim = partFile(dir); val src = partFile(donor)
    val st0 = fs.getFileStatus(victim)
    assert(fs.getFileStatus(src).getLen == st0.getLen,
      "fixture: donor and victim files must be length-identical")
    noRacyWindow {
      clearInMemory()
      assert(spark.read.format("graft-upsert").load(dir)
        .where(col("v") > 50.0).count() == 0)
      assert(fs.exists(new Path(s"$dir/p=a/${UpsertStatsManifest.ManifestFileName}")))
    }
    // the rewrite: donor bytes over the victim, mtime forced back — the
    // granularity collision (S3-style whole-second LastModified) in
    // miniature
    val bytes = {
      val in = fs.open(src)
      try { val b = new Array[Byte](st0.getLen.toInt); in.readFully(0, b, 0, b.length); b }
      finally in.close()
    }
    val out = fs.create(victim, true)
    try out.write(bytes) finally out.close()
    fs.setTimes(victim, st0.getModificationTime, -1)
    val st1 = fs.getFileStatus(victim)
    assert(st1.getModificationTime == st0.getModificationTime && st1.getLen == st0.getLen)
    // the (mtime, len) key alone cannot tell — pinned here so the
    // verified mode's reason to exist stays visible
    clearInMemory()
    assert(UpsertStatsManifest.lookup(fs, victim.getParent, victim.getName,
      st1.getModificationTime, st1.getLen)
      .exists(_.cols("v").max.contains(10.0)), "unverified key serves the stale raw")
    // verified mode: footer fingerprint mismatch → entry refused →
    // footer re-read → the file with max 99.0 survives the pruner
    clearInMemory()
    withConf(UpsertStatsManifest.VerifyContentConfKey, "true") {
      assert(spark.read.format("graft-upsert").load(dir)
        .where(col("v") > 50.0).count() == 1,
        "verified planning must see the rewritten 99.0, not prune on stale 10.0")
    }
  }

  test("the in-JVM stats cache's racy guard compares on the PROBED storage clock") {
    // same same-name+mtime+len rewrite fixture as the verified-mode
    // test, but aimed at the in-JVM statsCache: with the STORAGE clock
    // 60 s behind the driver, a just-written file's mtime already looks
    // 60 s old to the driver's wall clock — the raw-wall-clock guard
    // would cache it inside its open storage tick and serve the stale
    // stats for the driver's lifetime. The guard must compare against
    // the probed storage-clock estimate instead. Manifests are OFF so
    // the statsCache is the only caching layer in play.
    def build(v: Double): String = {
      val dir = tmp("mfcacheclk")
      val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
      sink.upsert(Seq((1L, 0L, v, "a")).toDF("id", "seq", "v", "p"), 0)
      dir
    }
    val dir = build(10.0); val donor = build(99.0)
    val fs = fsOf(dir)
    def partFile(d: String): Path = fs.listStatus(new Path(s"$d/p=a"))
      .map(_.getPath).filter(_.getName.startsWith("part-")).head
    val victim = partFile(dir); val src = partFile(donor)
    assert(fs.getFileStatus(src).getLen == fs.getFileStatus(victim).getLen,
      "fixture: donor and victim files must be length-identical")
    // what a 60s-behind storage clock would have stamped on the write
    val skew = 60000L
    fs.setTimes(victim, System.currentTimeMillis() - skew, -1)
    val st0 = fs.getFileStatus(victim)
    try {
      UpsertStatsManifest.recordClockOffset(fs, System.currentTimeMillis() - skew)
      withConf(UpsertStatsManifest.EnabledConfKey, "false") {
        clearInMemory()
        assert(spark.read.format("graft-upsert").load(dir)
          .where(col("v") > 50.0).count() == 0)
        // in-place rewrite inside the (still open) storage-mtime tick
        val bytes = {
          val in = fs.open(src)
          try { val b = new Array[Byte](st0.getLen.toInt); in.readFully(0, b, 0, b.length); b }
          finally in.close()
        }
        val out = fs.create(victim, true)
        try out.write(bytes) finally out.close()
        fs.setTimes(victim, st0.getModificationTime, -1)
        // NO clearInMemory here — the statsCache surviving the rewrite
        // is exactly what's under test
        assert(spark.read.format("graft-upsert").load(dir)
          .where(col("v") > 50.0).count() == 1,
          "a skew-aware racy guard must refuse to cache inside the open " +
            "storage tick and re-read the rewritten footer")
      }
    } finally
      UpsertStatsManifest.recordClockOffset(fs, System.currentTimeMillis())
  }

  test("foreign files verify by default; sink-written files stay on the cheap path") { noRacyWindow {
    // FOREIGN = not part-*-named: outside the sink's authorship, an
    // external rewriter can restore mtime AND length, so default-mode
    // planning must fingerprint-verify its stats on every pass — while
    // a pure sink-written table pays zero tail reads once healed.
    val dir = tmp("mfforeign")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
    sink.upsert(Seq((1L, 0L, 10.0, "a")).toDF("id", "seq", "v", "p"), 0)
    val donor = tmp("mfforeignd")
    ParquetUpsertSink(donor, Seq("id"), "seq", "p")
      .upsert(Seq((1L, 0L, 99.0, "a")).toDF("id", "seq", "v", "p"), 0)
    val fs = fsOf(dir)
    def partFile(d: String): Path = fs.listStatus(new Path(s"$d/p=a"))
      .map(_.getPath).filter(_.getName.startsWith("part-")).head
    // stage the foreign file: same bytes as the victim-to-be, foreign name
    val foreign = new Path(s"$dir/p=a/ext-0.parquet")
    org.apache.hadoop.fs.FileUtil.copy(fs, partFile(dir), fs, foreign,
      false, fs.getConf)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("seq", "long").add("v", "double").add("p", "string")
    val st0 = fs.getFileStatus(foreign)
    clearInMemory()
    // pass 1 records + flushes both entries (ripe: window is zeroed)
    UpsertDataSkipping.fileStatsAll(fs, Seq(partFile(dir), foreign),
      schema, fs.getConf)
    // mtime-restoring in-place rewrite of the FOREIGN file (donor is
    // byte-length-identical: same writer, same shape)
    val src = partFile(donor)
    assert(fs.getFileStatus(src).getLen == st0.getLen)
    val bytes = {
      val in = fs.open(src)
      try { val b = new Array[Byte](st0.getLen.toInt); in.readFully(0, b, 0, b.length); b }
      finally in.close()
    }
    val out = fs.create(foreign, true)
    try out.write(bytes) finally out.close()
    fs.setTimes(foreign, st0.getModificationTime, -1)
    assert(fs.getFileStatus(foreign).getModificationTime == st0.getModificationTime &&
      fs.getFileStatus(foreign).getLen == st0.getLen)
    // pass 2, DEFAULT conf: the foreign entry's auto-armed fingerprint
    // mismatches → stats re-read from the rewritten footer (max 99),
    // while the sink-written twin serves from cache/manifest
    clearInMemory()
    val stats2 = UpsertDataSkipping.fileStatsAll(fs, Seq(partFile(dir), foreign),
      schema, fs.getConf)
    assert(stats2(foreign.toString).cols("v").max.contains(99.0),
      "a foreign mtime-restoring rewrite must be refused under DEFAULT conf")
    assert(stats2(partFile(dir).toString).cols("v").max.contains(10.0))
    // cheap path: re-planning the pure sink-written table costs zero
    // fingerprint tail reads (entries ripe, unflagged, part-*-named)
    clearInMemory()
    UpsertDataSkipping.fileStatsAll(fs, Seq(partFile(dir)), schema, fs.getConf)
    val before = UpsertStatsManifest.fpReads.get()
    UpsertDataSkipping.fileStatsAll(fs, Seq(partFile(dir)), schema, fs.getConf)
    assert(UpsertStatsManifest.fpReads.get() == before,
      "sink-written files must pay zero fingerprint reads on the default path")
  } }

  test("contentFingerprint: stable, stats-sensitive, sentinel-free") {
    val dir = tmp("mffp")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
    sink.upsert(Seq((1L, 0L, 10.0, "a"), (2L, 0L, 20.0, "b"))
      .toDF("id", "seq", "v", "p"), 0)
    val fs = fsOf(dir)
    def partFile(p: String): Path = fs.listStatus(new Path(s"$dir/p=$p"))
      .map(_.getPath).filter(_.getName.startsWith("part-")).head
    val a = partFile("a"); val b = partFile("b")
    val fpA = UpsertStatsManifest.contentFingerprint(fs, a, fs.getFileStatus(a).getLen)
    val fpB = UpsertStatsManifest.contentFingerprint(fs, b, fs.getFileStatus(b).getLen)
    assert(fpA != UpsertStatsManifest.FpUnchecked && fpA != UpsertStatsManifest.FpUnreadable)
    assert(fpA == UpsertStatsManifest.contentFingerprint(fs, a, fs.getFileStatus(a).getLen))
    assert(fpA != fpB, "different footer statistics must fingerprint differently")
    // not a parquet tail → unreadable sentinel, which never matches
    val junk = new Path(s"$dir/junk.bin")
    val o = fs.create(junk, true); try o.write(Array.fill(64)(7.toByte)) finally o.close()
    assert(UpsertStatsManifest.contentFingerprint(fs, junk, 64L) ==
      UpsertStatsManifest.FpUnreadable)
  }

  // ——— write-back durability and cost discipline ———

  test("torn manifest write-back: footer fallback, lazy repair, no partial serve") { noRacyWindow {
    val dir = tmp("mftorn")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
    sink.upsert(Seq((1L, 0L, 10.0, "a")).toDF("id", "seq", "v", "p"), 0)
    val fs = fsOf(dir)
    val mf = new Path(s"$dir/p=a/${UpsertStatsManifest.ManifestFileName}")
    def maxV(): Double = spark.read.format("graft-upsert").load(dir)
      .where(col("v") > 0.0).agg(max("v")).as[Double].head()
    clearInMemory()
    assert(maxV() == 10.0)
    assert(fs.exists(mf))
    // crash window between the write-back's delete and rename: the
    // manifest is GONE and only an orphan tmp remains
    org.apache.hadoop.fs.FileUtil.copy(fs, mf, fs,
      new Path(s"$dir/p=a/${UpsertStatsManifest.ManifestFileName}.tmp.dead"),
      false, fs.getConf)
    fs.delete(mf, false)
    clearInMemory()
    val before = UpsertStatsManifest.footerReads.get()
    assert(maxV() == 10.0, "planning degrades to footers, results exact")
    assert(UpsertStatsManifest.footerReads.get() > before,
      "the fallback really was footer-served")
    assert(fs.exists(mf), "the same pass lazily repairs the manifest")
    // corrupt manifest bytes: parse failure → footers → repair by replace
    val o = fs.create(mf, true)
    try o.write("graft-stats v2\nnot a manifest at all".getBytes("UTF-8"))
    finally o.close()
    clearInMemory()
    assert(maxV() == 10.0)
    clearInMemory()
    assert(maxV() == 10.0) // the repaired manifest parses again
  } }

  test("flush resolves each directory's own filesystem, never the caller's") { noRacyWindow {
    val dir = tmp("mfwrongfs")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
    sink.upsert(Seq((1L, 0L, 10.0, "a")).toDF("id", "seq", "v", "p"), 0)
    val fs = fsOf(dir)
    val schema = spark.read.format("graft-upsert").load(dir).schema
    val file = fs.listStatus(new Path(s"$dir/p=a")).map(_.getPath)
      .filter(_.getName.startsWith("part-")).head
    clearInMemory()
    // populate `pending` without flushing (fileStats records, only
    // fileStatsAll flushes)
    UpsertDataSkipping.fileStats(fs, file, schema, fs.getConf)
    // a caller FileSystem that cannot touch the directory's files: if
    // flush used it for I/O, the write-back would throw and re-offer
    // instead of persisting
    val broken = new org.apache.hadoop.fs.RawLocalFileSystem() {
      override def getFileStatus(p: Path) =
        throw new java.io.IOException("caller fs must not be used")
      override def listStatus(p: Path) =
        throw new java.io.IOException("caller fs must not be used")
      override def create(p: Path, overwrite: Boolean) =
        throw new java.io.IOException("caller fs must not be used")
    }
    broken.setConf(fs.getConf)
    UpsertStatsManifest.flush(broken)
    assert(fs.exists(new Path(s"$dir/p=a/${UpsertStatsManifest.ManifestFileName}")),
      "the directory's own filesystem must carry the write-back")
  } }

  test("a new-file miss wave costs one manifest probe per directory") { noRacyWindow {
    val dir = tmp("mfprobe")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
    sink.upsert(Seq((1L, 0L, 10.0, "a")).toDF("id", "seq", "v", "p"), 0)
    val fs = fsOf(dir)
    spark.read.format("graft-upsert").load(dir).where(col("v") > 0.0).count()
    val dirPath = new Path(s"$dir/p=a")
    val file = fs.listStatus(dirPath).map(_.getPath)
      .filter(_.getName.startsWith("part-")).head
    val st = fs.getFileStatus(file)
    clearInMemory()
    val p0 = UpsertStatsManifest.manifestProbes.get()
    assert(UpsertStatsManifest.lookup(fs, dirPath, file.getName,
      st.getModificationTime, st.getLen).isDefined)
    assert(UpsertStatsManifest.manifestProbes.get() == p0 + 1)
    // 20 misses against the now-cached manifest: zero further probes
    (0 until 20).foreach(i => assert(UpsertStatsManifest.lookup(
      fs, dirPath, s"part-new-$i", 1L, 1L).isEmpty))
    assert(UpsertStatsManifest.manifestProbes.get() == p0 + 1,
      "a miss wave must not re-probe the directory within the TTL")
    // an absent-manifest directory memoizes the same way
    val bare = new Path(tmp("mfprobe_bare"))
    fs.mkdirs(bare)
    val p1 = UpsertStatsManifest.manifestProbes.get()
    (0 until 20).foreach(i => assert(UpsertStatsManifest.lookup(
      fs, bare, s"part-x-$i", 1L, 1L).isEmpty))
    assert(UpsertStatsManifest.manifestProbes.get() == p1 + 1)
  } }

  test("invalidate drops the disk manifest, the caches, and pending") { noRacyWindow {
    val dir = tmp("mfinval")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
    sink.upsert(Seq((1L, 0L, 10.0, "a")).toDF("id", "seq", "v", "p"), 0)
    val fs = fsOf(dir)
    val dirPath = new Path(s"$dir/p=a")
    val mf = new Path(dirPath, UpsertStatsManifest.ManifestFileName)
    clearInMemory()
    spark.read.format("graft-upsert").load(dir).where(col("v") > 0.0).count()
    assert(fs.exists(mf))
    val file = fs.listStatus(dirPath).map(_.getPath)
      .filter(_.getName.startsWith("part-")).head
    val st = fs.getFileStatus(file)
    assert(UpsertStatsManifest.lookup(fs, dirPath, file.getName,
      st.getModificationTime, st.getLen).isDefined)
    UpsertStatsManifest.invalidate(fs, dirPath)
    assert(!fs.exists(mf), "the on-disk manifest is gone")
    assert(UpsertStatsManifest.lookup(fs, dirPath, file.getName,
      st.getModificationTime, st.getLen).isEmpty,
      "the cached copy must not survive invalidation")
    // and a subsequent flush must not resurrect pre-invalidate entries
    UpsertStatsManifest.flush(fs)
    assert(!fs.exists(mf))
  } }

  test("above the footer cap, costing answers from manifests alone and the plan flips to broadcast") {
    // cap forced to 4 so a 9-file table exercises the ≥5k-file branch
    System.setProperty("graft.stats.maxFooterFiles", "4")
    try {
      val dir = tmp("mfcost")
      val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
      val rows = (0 until 300).map(n => (n.toLong, 0L, n.toLong, s"p${n % 6}"))
      sink.upsert(rows.toDF("id", "seq", "v", "p"), 0) // 6 partition files > cap 4
      val fs = fsOf(dir)
      // fact side sized past the broadcast threshold below, so the only
      // broadcastable side is the costed dimension
      val fact = spark.range(0, 1000000).select(col("id").as("fid"),
        (col("id") % 300).as("k"))
      def dim = spark.read.format("graft-upsert").load(dir)
      def join = { val d = dim; fact.join(d, col("k") === d("id")) }
      def leafRowCount: Option[BigInt] = dim.queryExecution.optimizedPlan
        .collectLeaves().head.stats.rowCount
      // un-warmed: the capped path must refuse row estimation rather
      // than storm footers (exact-size reporting still broadcasts here,
      // so assert on the ROW count, the manifest's contribution)
      clearInMemory()
      val b0 = UpsertStatsManifest.footerReads.get()
      assert(leafRowCount.isEmpty,
        "above the cap with no manifests, rows must be unknown")
      assert(UpsertStatsManifest.footerReads.get() == b0,
        "the capped branch must never open footers")
      // explicit ANALYZE warms every directory manifest ...
      spark.sql(s"CALL graft.system.collect_stats('$dir')")
      clearInMemory()
      val b1 = UpsertStatsManifest.footerReads.get()
      assert(leafRowCount.contains(BigInt(300)),
        "manifests alone must yield the exact row count")
      withConf("spark.sql.autoBroadcastJoinThreshold", "1048576") {
        val plan = join.queryExecution.executedPlan.toString
        assert(plan.contains("BroadcastHashJoin"),
          s"costed dimension must broadcast, got:\n$plan")
        assert(UpsertStatsManifest.footerReads.get() == b1,
          "costing and planning above the cap must be footer-free")
        // ... and with reporting OFF the same join degrades to a
        // shuffle join: the flip IS the stats' doing, not a coincidence
        withConf(graft.io.UpsertTableSource.ReportStatsConfKey, "false") {
          val off = join.queryExecution.executedPlan.toString
          assert(!off.contains("BroadcastHashJoin"),
            s"without reported stats the dimension must not broadcast:\n$off")
        }
      }
      // below-cap control: the footer branch agrees exactly
      System.setProperty("graft.stats.maxFooterFiles", "4096")
      (0 to 5).foreach(i => fs.delete(new Path(
        s"$dir/p=p$i/${UpsertStatsManifest.ManifestFileName}"), false))
      clearInMemory()
      val b2 = UpsertStatsManifest.footerReads.get()
      assert(leafRowCount.contains(BigInt(300)))
      assert(UpsertStatsManifest.footerReads.get() > b2,
        "control: below the cap with no manifests, footers were the source")
    } finally System.clearProperty("graft.stats.maxFooterFiles")
  }

  test("maintenance rewrites re-warm their manifests: post-rewrite planning is footer-free") { noRacyWindow {
    val dir = tmp("mfmaint")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
    sink.upsert(Seq((1L, 0L, 10.0, "a"), (2L, 0L, 99.0, "b"))
      .toDF("id", "seq", "v", "p"), 0)
    val fs = fsOf(dir)
    clearInMemory()
    spark.read.format("graft-upsert").load(dir).where(col("v") > 0.0).count()
    assert(fs.exists(new Path(s"$dir/p=a/${UpsertStatsManifest.ManifestFileName}")))
    // the layout rewrite deletes each partition dir (and its manifest)
    // via dynamic overwrite — the maintenance JOB must re-warm, not
    // leave the first post-rewrite query to pay the footer storm
    sink.optimizeSort(spark, Seq(col("v")))
    (Seq("a", "b")).foreach(p => assert(
      fs.exists(new Path(s"$dir/p=$p/${UpsertStatsManifest.ManifestFileName}")),
      s"optimize_sort must re-warm p=$p's manifest inside the job"))
    clearInMemory()
    val before = UpsertStatsManifest.footerReads.get()
    assert(spark.read.format("graft-upsert").load(dir)
      .where(col("v") > 50.0).count() == 1)
    assert(UpsertStatsManifest.footerReads.get() == before,
      "post-maintenance planning must be footer-free")
  } }

  test("invalidate qualifies its key: an unqualified sink path evicts the planner's qualified slot") { noRacyWindow {
    val dir = tmp("mfqual")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
    sink.upsert(Seq((1L, 0L, 10.0, "a")).toDF("id", "seq", "v", "p"), 0)
    val fs = fsOf(dir)
    clearInMemory()
    // fill the cache + manifest under the planner's QUALIFIED key
    spark.read.format("graft-upsert").load(dir).where(col("v") > 0.0).count()
    assert(fs.exists(new Path(s"$dir/p=a/${UpsertStatsManifest.ManifestFileName}")))
    // sink rewrite paths hand invalidate a PLAIN `new Path(tablePath+…)`
    // — it must still evict the qualified slot, or the documented net
    // is a no-op and a stale cached manifest keeps serving
    UpsertStatsManifest.invalidate(fs, new Path(s"$dir/p=a"))
    assert(!fs.exists(new Path(s"$dir/p=a/${UpsertStatsManifest.ManifestFileName}")),
      "the on-disk manifest must delete")
    // drop ONLY the per-file stats cache (it may legitimately serve an
    // unchanged file); the manifest dirCache slot is what invalidate
    // must have evicted — if it survived, the next lookup serves it
    // footer-free and the assert below catches the no-op
    UpsertDataSkipping.clearStatsCacheForTesting()
    val before = UpsertStatsManifest.footerReads.get()
    spark.read.format("graft-upsert").load(dir).where(col("v") > 50.0).count()
    assert(UpsertStatsManifest.footerReads.get() > before,
      "post-invalidate planning must re-read footers, not serve the evicted slot")
  } }

  test("maintenance warm persists before the job returns, without a settle sleep") {
    withConf(UpsertStatsManifest.RacyWindowConfKey, "700") {
      val dir = tmp("mfsettle")
      val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
      sink.upsert(Seq((1L, 0L, 10.0, "a")).toDF("id", "seq", "v", "p"), 0)
      val fs = fsOf(dir)
      // the rewrite's files are seconds-fresh: their open-tick entries
      // must persist IMMEDIATELY (flagged verifyOnRead) so a one-shot
      // maintenance JVM exits with the warm durable — and without the
      // former ≤window settle sleep on the job tail
      val t0 = System.currentTimeMillis()
      sink.optimizeSort(spark, Seq(col("v")))
      val took = System.currentTimeMillis() - t0
      assert(fs.exists(new Path(s"$dir/p=a/${UpsertStatsManifest.ManifestFileName}")),
        "optimize_sort's warm must persist before the job returns")
      // generous bound: the point is that no deliberate ≥700 ms settle
      // sleep rides the tail (the rewrite itself is sub-second here,
      // but CI boxes stall — compare against the window, not zero)
      assert(took < 10000, s"optimize_sort took ${took}ms — settle sleep resurrected?")
    }
  }

  test("row-level rewrites re-warm their manifests: post-DML planning is footer-free") { noRacyWindow {
    val dir = tmp("mfdml")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
    sink.upsert(Seq((1L, 0L, 10.0, "a"), (2L, 0L, 99.0, "b"))
      .toDF("id", "seq", "v", "p"), 0)
    val fs = fsOf(dir)
    clearInMemory()
    // a first planning pass persists both partitions' manifests (the
    // untouched p=b must stay warm across the DML below)
    spark.read.format("graft-upsert").load(dir).where(col("v") > 0.0).count()
    assert(fs.exists(new Path(s"$dir/p=b/${UpsertStatsManifest.ManifestFileName}")))
    // replaceGroups is the shared rewrite body under SQL
    // DELETE/UPDATE/MERGE, dynamic overwrite, and restore — it
    // rewrites whole partitions, so it must re-warm like maintenance
    sink.replaceGroups(spark,
      Seq("a"), Seq((1L, 1L, 20.0, "a")).toDF("id", "seq", "v", "p"))
    assert(fs.exists(new Path(s"$dir/p=a/${UpsertStatsManifest.ManifestFileName}")),
      "replaceGroups must re-warm the rewritten partition's manifest")
    clearInMemory()
    val before = UpsertStatsManifest.footerReads.get()
    assert(spark.read.format("graft-upsert").load(dir)
      .where(col("v") > 50.0).count() == 1)
    assert(UpsertStatsManifest.footerReads.get() == before,
      "post-DML planning must be footer-free")
  } }

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
