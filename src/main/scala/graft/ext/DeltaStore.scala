package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The crash-safe parquet delta-store protocol shared by the streaming
  * operators that keep first-occurrence registries on disk
  * ([[StreamFunnel]]'s key store, [[StreamLineDedup]]'s line registry):
  * per-batch delta dirs committed by `_SUCCESS`, folded periodically
  * into a `base_<batch>` dir by an ASSOCIATIVE, duplicate-idempotent
  * fold. One definition of the listing and the fold-guard/cleanup
  * choreography, so the crash-window reasoning lives in one place.
  */
object DeltaStore {

  /** Batch-0 stale-run guard, shared by every delta-store streaming
    * operator: a stream restarted at batch 0 (fresh checkpoint)
    * against a dir holding state from a PREVIOUS run would fold the
    * dead run's registry into the new one — fail fast instead. Two
    * stale markers: any `b<N>` delta with N > 0, and any compacted
    * `base_<N>` with N > 0 (a prior run whose deltas were already
    * folded leaves no b* dirs at all — the hole the original
    * b*-only probe had). `b0`/`base_0` stay ALLOWED: a legitimate
    * same-run replay of batch 0 (crash after the batch-0 write — or
    * after a compactEvery=1 fold of it — but before the offset
    * commit) re-enters here with exactly those on disk, and failing
    * it would break recovery; the residual prior-run-died-at-batch-0
    * ambiguity is inherent to listing-based detection.
    */
  def requireFreshRun(dir: String, subdirs: Seq[String]): Unit =
    subdirs.foreach { sub =>
      val entries = Option(new java.io.File(s"$dir/$sub").list())
        .getOrElse(Array.empty[String])
      val stale = entries.exists(n =>
        (n.startsWith("b") && !n.startsWith("base_") && n != "b0") ||
          (n.startsWith("base_") && n != "base_0"))
      require(!stale,
        s"$dir/$sub holds state from a previous run but the stream " +
          "restarted at batch 0 (fresh checkpoint?) — use a fresh output " +
          "dir or keep dir and checkpoint together")
    }

  /** Committed delta dirs under `root` (those with `_SUCCESS`), sorted.
    * Uncommitted leftovers of a crashed writer are invisible. Local-FS
    * listing — these stores are driver-local fixtures; an object-store
    * deployment would list through the Hadoop FileSystem instead.
    */
  def committed(root: String): Seq[String] = {
    val dirs = Option(new java.io.File(root).listFiles())
      .getOrElse(Array.empty[java.io.File])
    dirs.toSeq
      .filter(d => d.isDirectory && new java.io.File(d, "_SUCCESS").exists())
      .map(_.getAbsolutePath).sorted
  }

  /** Fold every committed delta (and any previous base — its rows fold
    * identically) into `<root>/base_<upToBatch>`, then drop the folded
    * inputs. Crash-safe by construction, provided `fold` is the same
    * associative min/merge the readers compute:
    *  - a replay that crashed between base-write and cleanup must NOT
    *    re-fold (the committed target would be both input and
    *    overwrite target) — the guard skips straight to cleanup;
    *  - the base is written BEFORE the inputs are dropped, so the
    *    crash window leaves duplicates, which the idempotent fold
    *    absorbs on read.
    */
  def compact(spark: SparkSession, root: String, upToBatch: Long)(
      fold: DataFrame => DataFrame): Unit = {
    val target = new java.io.File(s"$root/base_$upToBatch").getAbsolutePath
    if (!new java.io.File(target, "_SUCCESS").exists()) {
      val folded = committed(root)
      if (folded.isEmpty) return
      fold(spark.read.parquet(folded: _*))
        .write.mode("overwrite").parquet(target)
    }
    committed(root).filterNot(_ == target).foreach { p =>
      val fs = new org.apache.hadoop.fs.Path(p)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(p), true)
    }
  }
}
