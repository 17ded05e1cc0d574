package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.ParquetUpsertSink

/** Single-writer commit fence: interleaved writers fail loudly instead
  * of last-writer-winning, crashed writers' orphan locks break after
  * the staleness timeout, and the fence is reentrant for inline
  * maintenance.
  */
class CommitLockSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  private def fsOf(dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeLock(dir: String, token: String, since: Long): Unit = {
    val fs = fsOf(dir)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    val out = fs.create(new org.apache.hadoop.fs.Path(
      s"$dir/${ParquetUpsertSink.CommitLockFileName}"), true)
    try out.write(s"$token $since".getBytes("UTF-8")) finally out.close()
  }

  test("a second writer fails loudly while the lock is held — no lost commit") {
    val dir = tmp("lockheld")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "dept")
    sink.upsert(Seq((1L, 1L, "a")).toDF("id", "seq", "dept"), 0)
    // another driver's live lock
    writeLock(dir, "otherwriter", System.currentTimeMillis())
    val e = intercept[java.util.ConcurrentModificationException] {
      sink.upsert(Seq((2L, 1L, "a")).toDF("id", "seq", "dept"), 1)
    }
    assert(e.getMessage.contains("otherwriter"))
    // the table still holds exactly the committed state
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSeq == Seq(1L))
    // holder releases -> the writer proceeds
    fsOf(dir).delete(new org.apache.hadoop.fs.Path(
      s"$dir/${ParquetUpsertSink.CommitLockFileName}"), false)
    sink.upsert(Seq((2L, 1L, "a")).toDF("id", "seq", "dept"), 1)
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("a stale lock (crashed writer) is broken and the commit proceeds") {
    val dir = tmp("lockstale")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "dept")
    writeLock(dir, "deadwriter",
      System.currentTimeMillis() - ParquetUpsertSink.LockTimeoutMs - 1000)
    sink.upsert(Seq((1L, 1L, "a")).toDF("id", "seq", "dept"), 0)
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSeq == Seq(1L))
    // and the fence released cleanly after the commit
    assert(!fsOf(dir).exists(new org.apache.hadoop.fs.Path(
      s"$dir/${ParquetUpsertSink.CommitLockFileName}")))
  }

  test("the fence is reentrant: inline compaction runs inside the upsert's lock") {
    val dir = tmp("lockreent")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "dept", compactEvery = 1)
    sink.upsert(Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("id", "seq", "dept"), 0)
    assert(spark.read.parquet(dir).count() == 2)
    assert(!fsOf(dir).exists(new org.apache.hadoop.fs.Path(
      s"$dir/${ParquetUpsertSink.CommitLockFileName}")))
  }

  // the lock FILE becomes visible at create() before its token bytes
  // land (production readers tolerate the torn window via Try and fail
  // conservatively); a raw read here can see "" or a token-only prefix
  // — retry until the content is well-formed, like production does
  private def readLockWellFormedOpt(dir: String, deadlineMs: Long): Option[(String, Long)] = {
    val fs = fsOf(dir)
    val p = new org.apache.hadoop.fs.Path(
      s"$dir/${ParquetUpsertSink.CommitLockFileName}")
    val deadline = System.currentTimeMillis() + deadlineMs
    var out: Option[(String, Long)] = None
    while (out.isEmpty && System.currentTimeMillis() < deadline) {
      out = scala.util.Try {
        val in = fs.open(p)
        val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        val parts = s.split(' ')
        (parts(0), parts(1).toLong)
      }.toOption.filter(_._1.nonEmpty)
      if (out.isEmpty) Thread.sleep(2)
    }
    out
  }

  private def readLockTs(dir: String): Long =
    readLockWellFormedOpt(dir, 10000)
      .getOrElse(fail(s"lock file in $dir never became well-formed"))._2

  test("heartbeat refreshes a held lock: long commits are never broken as stale") {
    val dir = tmp("lockhb")
    // sub-second staleness so the commit below legitimately OUTLIVES the
    // timeout — the exact scenario that silently lost commits before the
    // heartbeat (a second writer would break the still-held lock)
    System.setProperty("graft.lock.timeout.ms", "900")
    try {
      // a slow expectation stretches the commit (screen runs inside the
      // fence) well past the timeout
      val slowCheck = udf { (_: Long) => Thread.sleep(30); true }
      val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "dept",
        expectations = Seq("slow" -> slowCheck(col("id"))))
      val lockP = new org.apache.hadoop.fs.Path(
        s"$dir/${ParquetUpsertSink.CommitLockFileName}")
      val fs = fsOf(dir)
      @volatile var err: Throwable = null
      val t = new Thread(() => {
        // coalesce(1): the sleeps must run SEQUENTIALLY (one task) so the
        // commit reliably outlives the 900ms timeout on any core count
        try sink.upsert((1L to 100L).map(i => (i, 1L, "a"))
          .toDF("id", "seq", "dept").coalesce(1), 0)
        catch { case e: Throwable => err = e }
      }, "slow-committer")
      t.start()
      val deadline = System.currentTimeMillis() + 30000
      while (!fs.exists(lockP) && System.currentTimeMillis() < deadline)
        Thread.sleep(5)
      assert(fs.exists(lockP), "commit never acquired the lock")
      val ts1 = readLockTs(dir)
      Thread.sleep(1300) // > timeout; heartbeat period is timeout/3 = 300ms
      if (t.isAlive) {
        // mid-commit, past the nominal staleness bound: the lock must
        // still be held AND its timestamp refreshed (i.e. NOT breakable
        // as stale by a rival's staleness check)
        assert(fs.exists(lockP), "lock vanished while the commit was running")
        val ts2 = readLockTs(dir)
        assert(ts2 > ts1, s"heartbeat never refreshed the lock ($ts1 -> $ts2)")
        assert(System.currentTimeMillis() - ts2 <= 900,
          "refreshed timestamp is itself stale")
      }
      t.join(120000)
      assert(err == null, s"commit failed: $err")
      assert(spark.read.parquet(dir).count() == 100)
      assert(!fs.exists(lockP)) // released cleanly, not resurrected by a late beat
    } finally System.clearProperty("graft.lock.timeout.ms")
  }

  test("heartbeat refresh is rename-CAS: a token re-taken AFTER the read survives") {
    val dir = tmp("lockcas")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "dept")
    val fs = fsOf(dir)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    val lockP = new org.apache.hadoop.fs.Path(
      s"$dir/${ParquetUpsertSink.CommitLockFileName}")
    // reality: a breaker already re-took the lock ...
    writeLock(dir, "breaker", System.currentTimeMillis())
    // ... but the stalled holder's beat READ the lock an instant
    // earlier and still believes it owns it. A lying-reader FS pins
    // that exact interleaving deterministically: every open of the
    // lock file serves the HOLDER's stale view, while every mutation
    // (rename / create / delete) hits reality. A blind
    // read-check-then-overwrite beat clobbers the breaker here; the
    // rename-CAS beat must not.
    val shadow = new org.apache.hadoop.fs.Path(s"$dir/.shadow_stale_read")
    val out = fs.create(shadow, true)
    try out.write(
      s"${sink.lockTokenForTesting} ${System.currentTimeMillis()}".getBytes("UTF-8"))
    finally out.close()
    val lying = new org.apache.hadoop.fs.FilterFileSystem(fs) {
      override def open(f: org.apache.hadoop.fs.Path, bufferSize: Int)
          : org.apache.hadoop.fs.FSDataInputStream =
        if (f.getName == ParquetUpsertSink.CommitLockFileName)
          super.open(shadow, bufferSize)
        else super.open(f, bufferSize)
    }
    sink.refreshLockOnce(lying)
    // the breaker's token survived the beat that "knew" it owned the lock
    val after = readLockWellFormedOpt(dir, 5000)
    assert(after.exists(_._1 == "breaker"),
      s"rename-CAS must restore the re-taken token, got $after")
    // and the beat left no claim/fresh droppings behind
    val leftovers = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.startsWith("._commit.lock.hb."))
    assert(leftovers.isEmpty, s"heartbeat droppings: ${leftovers.mkString(",")}")
    fs.delete(shadow, false)
    fs.delete(lockP, false)
  }

  test("a transient throw mid-CAS restores the claimed lock instead of stranding it") {
    val dir = tmp("lockcasthrow")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "dept")
    val fs = fsOf(dir)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    writeLock(dir, sink.lockTokenForTesting, System.currentTimeMillis())
    // the refresh rename THROWS (S3A can, instead of returning false):
    // without the restore, the lock stays renamed aside forever — every
    // later beat reads an absent lock and skips, and the commit dies at
    // its next verifyLockOwnership despite no real contention
    val lying = new org.apache.hadoop.fs.FilterFileSystem(fs) {
      override def rename(src: org.apache.hadoop.fs.Path,
          dst: org.apache.hadoop.fs.Path): Boolean =
        if (src.getName.endsWith(".fresh"))
          throw new java.io.IOException("injected rename failure")
        else super.rename(src, dst)
    }
    intercept[java.io.IOException] { sink.refreshLockOnce(lying) }
    val after = readLockWellFormedOpt(dir, 5000)
    assert(after.exists(_._1 == sink.lockTokenForTesting),
      s"the claimed lock must be restored, got $after")
    val leftovers = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.startsWith("._commit.lock.hb."))
    assert(leftovers.isEmpty, s"heartbeat droppings: ${leftovers.mkString(",")}")
  }

  test("a refresh rename returning FALSE restores the claim instead of erasing the lock") {
    val dir = tmp("lockcasfalse")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "dept")
    val fs = fsOf(dir)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    writeLock(dir, sink.lockTokenForTesting, System.currentTimeMillis())
    // the refresh rename returns FALSE without throwing (a transient
    // FS refusal — HDFS does this instead of raising): the content is
    // ours and the slot is empty, so this is NOT an acquirer slipping
    // in. Deleting claim+fresh here erases the lock file entirely and
    // the healthy holder aborts at its next verifyLockOwnership with
    // no real contention — the claim must be restored like the
    // exception path does.
    val lying = new org.apache.hadoop.fs.FilterFileSystem(fs) {
      override def rename(src: org.apache.hadoop.fs.Path,
          dst: org.apache.hadoop.fs.Path): Boolean =
        if (src.getName.endsWith(".fresh")) false
        else super.rename(src, dst)
    }
    sink.refreshLockOnce(lying)
    val after = readLockWellFormedOpt(dir, 5000)
    assert(after.exists(_._1 == sink.lockTokenForTesting),
      s"the lock must survive a rename-returned-false beat, got $after")
    val leftovers = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.startsWith("._commit.lock.hb."))
    assert(leftovers.isEmpty, s"heartbeat droppings: ${leftovers.mkString(",")}")
  }

  test("sweep_staging age-gates heartbeat files: a live beat's CAS state survives") {
    val dir = tmp("sweephb")
    val fs = fsOf(dir)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    val young = new org.apache.hadoop.fs.Path(s"$dir/._commit.lock.hb.tok.claim")
    fs.create(young, true).close()
    val old = new org.apache.hadoop.fs.Path(s"$dir/._commit.lock.hb.tok2.fresh")
    fs.create(old, true).close()
    fs.setTimes(old,
      System.currentTimeMillis() - ParquetUpsertSink.LockTimeoutMs - 60000, -1)
    ParquetUpsertSink.sweepStaging(spark, dir)
    assert(fs.exists(young),
      "a live beat's in-flight claim/fresh is protocol state, not an orphan")
    assert(!fs.exists(old), "a crashed beat's stranded hb file must sweep")
  }

  test("a late heartbeat never clobbers a re-taken lock (TOCTOU fence)") {
    val dir = tmp("lockhbtoctou")
    // sub-second staleness: the heartbeat fires every 300ms while the
    // slow commit runs, against a lock a "breaker" has already re-taken
    System.setProperty("graft.lock.timeout.ms", "900")
    try {
      val slowCheck = udf { (_: Long) => Thread.sleep(30); true }
      val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "dept",
        expectations = Seq("slow" -> slowCheck(col("id"))))
      val fs = fsOf(dir)
      // seed first: only a commit that must MERGE into existing
      // partitions reaches the destructive phase whose ownership check
      // the stalled holder is expected to fail
      sink.upsert(Seq((0L, 1L, "a")).toDF("id", "seq", "dept"), 0)
      @volatile var err: Throwable = null
      val t = new Thread(() => {
        try sink.upsert((1L to 100L).map(i => (i, 1L, "a"))
          .toDF("id", "seq", "dept").coalesce(1), 1)
        catch { case e: Throwable => err = e }
      }, "stalled-holder")
      t.start()
      // once the holder's lock is fully written, model a breaker that
      // re-took it (the exact TOCTOU victim: the old blind-overwrite
      // beat would periodically replace this token with the holder's)
      readLockWellFormedOpt(dir, 30000)
        .getOrElse(fail("commit never acquired the lock"))
      writeLock(dir, "breaker", System.currentTimeMillis())
      // watch across >4 beat periods: the breaker's token must survive
      // every beat (brief absence windows during a beat's rename-CAS
      // read as None and are fine; the holder's token must never land)
      val until = System.currentTimeMillis() + 1400
      while (System.currentTimeMillis() < until) {
        readLockWellFormedOpt(dir, 50).foreach { case (tok, _) =>
          assert(tok == "breaker",
            s"a late heartbeat clobbered the new holder's token with '$tok'")
        }
        Thread.sleep(40)
      }
      t.join(120000)
      // and the stalled holder aborted LOUDLY before its destructive phase
      assert(err != null &&
        err.isInstanceOf[java.util.ConcurrentModificationException],
        s"stalled holder should have aborted on lost ownership, got: $err")
      fsOf(dir).delete(new org.apache.hadoop.fs.Path(
        s"$dir/${ParquetUpsertSink.CommitLockFileName}"), false)
    } finally System.clearProperty("graft.lock.timeout.ms")
  }

  test("a commit whose lock is stolen mid-flight aborts before the destructive phase") {
    val dir = tmp("locktheft")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "dept")
    sink.upsert(Seq((1L, 1L, "a")).toDF("id", "seq", "dept"), 0)
    val fs = fsOf(dir)
    val lockP = new org.apache.hadoop.fs.Path(
      s"$dir/${ParquetUpsertSink.CommitLockFileName}")
    // rival thread: the moment the commit's lock is FULLY WRITTEN,
    // replace it with a foreign token (models a failed lock-break
    // restore / a GC-stalled holder whose lock was legitimately broken
    // and re-taken). Waiting for well-formed content matters: stealing
    // inside the create→write window would race the committer's own
    // still-open stream, whose 22-byte payload then exactly covers the
    // theft — the scenario under test is a steal of a HELD lock, not a
    // torn acquire
    val thief = new Thread(() => {
      readLockWellFormedOpt(dir, 30000) // wait out the acquire's write window
      writeLock(dir, "thief", System.currentTimeMillis())
    }, "lock-thief")
    thief.start()
    val e = intercept[java.util.ConcurrentModificationException] {
      sink.upsert(Seq((1L, 2L, "a"), (2L, 1L, "a")).toDF("id", "seq", "dept"), 1)
    }
    thief.join(30000)
    assert(e.getMessage.contains("lost the commit lock"))
    // the aborted commit changed NOTHING: no merge, no archive churn
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSeq == Seq(1L))
    // and it did not delete the thief's lock on the way out
    assert(fs.exists(lockP))
    fs.delete(lockP, false)
  }

  // a writer that dies between creating the lock file and writing its
  // content leaves a PERMANENTLY unparseable lock — content-based
  // staleness can never break it, so the table would wedge behind a
  // file nobody can read. mtime is the only signal left.
  test("a torn orphan lock (writer died mid-write) is broken by mtime, not wedged") {
    val dir = tmp("locktorn")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "dept")
    val fs = fsOf(dir)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    val lockP = new org.apache.hadoop.fs.Path(
      s"$dir/${ParquetUpsertSink.CommitLockFileName}")
    fs.create(lockP, true).close() // empty: unparseable forever
    fs.setTimes(lockP,
      System.currentTimeMillis() - ParquetUpsertSink.LockTimeoutMs - 1000, -1)
    sink.upsert(Seq((1L, 1L, "a")).toDF("id", "seq", "dept"), 0)
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSeq == Seq(1L))
    assert(!fs.exists(lockP)) // broken, used, released
  }

  test("a torn FRESH lock (rival mid-acquire) still blocks — and is left intact") {
    val dir = tmp("locktornfresh")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "dept")
    val fs = fsOf(dir)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    val lockP = new org.apache.hadoop.fs.Path(
      s"$dir/${ParquetUpsertSink.CommitLockFileName}")
    fs.create(lockP, true).close() // fresh mtime: a rival's write window
    val e = intercept[java.util.ConcurrentModificationException] {
      sink.upsert(Seq((1L, 1L, "a")).toDF("id", "seq", "dept"), 0)
    }
    assert(e.getMessage.contains("unreadable lock file"))
    assert(fs.exists(lockP))
    fs.delete(lockP, false)
  }

  test("delete and maintenance honor the fence too") {
    val dir = tmp("lockdel")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "dept")
    sink.upsert(Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("id", "seq", "dept"), 0)
    writeLock(dir, "otherwriter", System.currentTimeMillis())
    intercept[java.util.ConcurrentModificationException] {
      sink.delete(spark, col("id") === 1L)
    }
    intercept[java.util.ConcurrentModificationException] {
      sink.compactPartitions(spark)
    }
    fsOf(dir).delete(new org.apache.hadoop.fs.Path(
      s"$dir/${ParquetUpsertSink.CommitLockFileName}"), false)
    assert(sink.delete(spark, col("id") === 1L) == Seq("a"))
  }
}
