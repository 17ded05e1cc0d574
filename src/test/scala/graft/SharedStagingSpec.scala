package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

/** Persisted staging mode of [[graft.ext.Shared]]: write-once parquet
  * under `spark.graft.shared.dir`, reused by LATER SESSIONS without
  * re-running the build, crash-safe via `_SUCCESS` detection, and
  * result-identical to the in-process localCheckpoint mode.
  */
class SharedStagingSpec extends SparkSpec {

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft_shared").toString

  test("second session reuses the staged parquet without rebuilding") {
    val dir = tempDir()
    val builds = new AtomicInteger(0)
    val s1 = spark.newSession()
    s1.conf.set("spark.graft.shared.dir", dir)
    val df1 = ext.Shared.memoClustered(s1, sf0001, "staging_spec_a", Some("v" -> 2)) {
      builds.incrementAndGet()
      s1.range(100).toDF("v")
    }
    assert(df1.count() === 100)
    assert(builds.get() === 1)

    // a NEW session (fresh memo map) must read the committed parquet —
    // a rebuild here would return the poisoned 5-row frame
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.shared.dir", dir)
    val df2 = ext.Shared.memoClustered(s2, sf0001, "staging_spec_a", Some("v" -> 2)) {
      builds.incrementAndGet()
      s2.range(5).toDF("v")
    }
    assert(df2.count() === 100, "staged relation must be served from parquet")
    assert(builds.get() === 1, "build thunk must not run in the second session")
    // clustering spec produced committed files + _SUCCESS
    val staged = new java.io.File(s"$dir/${sf0001.replaceAll("[^A-Za-z0-9._-]+", "_").replaceAll("^_+|_+$", "")}/staging_spec_a")
    assert(new java.io.File(staged, "_SUCCESS").exists())
  }

  test("uncommitted staging (no _SUCCESS) is re-staged, not served") {
    val dir = tempDir()
    val slugged = sf0001.replaceAll("[^A-Za-z0-9._-]+", "_").replaceAll("^_+|_+$", "")
    val partial = new java.io.File(s"$dir/$slugged/staging_spec_crash")
    assert(partial.mkdirs())
    // a crashed writer's leftovers: data files but no _SUCCESS marker
    java.nio.file.Files.write(
      new java.io.File(partial, "part-garbage.parquet").toPath,
      Array[Byte](1, 2, 3))
    val s = spark.newSession()
    s.conf.set("spark.graft.shared.dir", dir)
    val df = ext.Shared.memo(s, sf0001, "staging_spec_crash") {
      s.range(7).toDF("v")
    }
    assert(df.count() === 7, "must overwrite the partial table and serve the rebuild")
  }

  test("staged results match the in-process mode on a real shared relation") {
    // in-process (default) mode
    val sA = spark.newSession()
    val inProc = ext.Dedup.ngramJaccard(sA, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // persisted mode, two sessions: the writer and a cold reader
    val dir = tempDir()
    val sB = spark.newSession()
    sB.conf.set("spark.graft.shared.dir", dir)
    ext.Dedup.ngramJaccard(sB, sf0001).count()
    val sC = spark.newSession()
    sC.conf.set("spark.graft.shared.dir", dir)
    val staged = ext.Dedup.ngramJaccard(sC, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(staged === inProc)
    assert(staged.nonEmpty)
  }

  test("clear() evicts the memo so the next call rebuilds") {
    val s = spark.newSession()
    val builds = new AtomicInteger(0)
    ext.Shared.memo(s, sf0001, "staging_spec_clear") {
      builds.incrementAndGet(); s.range(3).toDF("v")
    }.count()
    assert(builds.get() === 1)
    ext.Shared.clear(s)
    val again = ext.Shared.memo(s, sf0001, "staging_spec_clear") {
      builds.incrementAndGet(); s.range(4).toDF("v")
    }
    assert(again.count() === 4)
    assert(builds.get() === 2, "clear() must force a rebuild")
  }
}
