package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Process-wide staging of expensive derived relations that multiple
  * operators consume — the near-dup edge set, the BM25 scored
  * relation, the exact ANN baseline, the IVF cell assignment. Each is
  * the classic "compute once per corpus, derive many" asset: a
  * production 100 TB run stages it as a key-clustered parquet table
  * and every downstream job reads the staged copy instead of
  * re-running the generating pipeline.
  *
  * Two modes, selected by [[stagingDir]]:
  *
  *  - '''In-process (default)''': a lazily-materialized
  *    `localCheckpoint` memoized per (session, sfDir, key) — the first
  *    consumer pays construction, the rest read the checkpointed
  *    blocks. `spark.catalog.clearCache()` does NOT drop these blocks
  *    (localCheckpoint storage is not the relation cache).
  *  - '''Persisted''' (`spark.graft.shared.dir` conf or
  *    `SPARK_GRAFT_SHARED_DIR` env): write-once parquet under
  *    `<dir>/<sfDir-slug>/<key>`, committed-write detected via
  *    `_SUCCESS`, reused across SESSIONS and PROCESSES — the true
  *    cluster staging shape. With a cluster spec the files are
  *    hash-clustered and sorted on the staging key (on a real cluster
  *    the same write registers as a bucketed table so the reader also
  *    gets shuffle-free joins from the metadata; path-parquet is the
  *    portable subset that needs no metastore). A crashed writer
  *    leaves no `_SUCCESS`, so the next session re-stages with
  *    mode=overwrite instead of serving a partial table.
  *
  * Correctness is unaffected — every consumer already assumes the one
  * shared definition (the DuckDB oracles replay it as a shared CTE),
  * and the driver's per-query verify still executes each consumer
  * end-to-end.
  *
  * Invalidation contract (both modes): staged content is keyed by
  * (sfDir, key) only — regenerating the sfDir's parquet files
  * mid-session (or changing a generator's definition between processes
  * sharing one staging dir) serves stale data until the entry is
  * dropped ([[clear]]) or the staging dir is deleted. The round driver
  * regenerates testdata only BETWEEN rounds, and a staging dir belongs
  * to one code version; both assumptions are asserted nowhere and
  * documented here.
  *
  * Sessions are keyed by REFERENCE identity (a java.util.IdentityHashMap
  * of live sessions — no hash-collision can serve one session's relation
  * to another), and every call first drops entries whose SparkContext
  * has stopped, so a session cycle neither leaks checkpointed plans nor
  * resurrects a dead session's DataFrame.
  *
  * Concurrency: the whole lookup-or-build runs under one lock, so the
  * build thunk executes at most once per key even under concurrent
  * first access (the round-8 advisory race). In persisted mode that
  * lock is held across the staging write job — concurrent sessions
  * serialize on staging, which is the intended "one staging job"
  * semantics, not a defect.
  *
  * Bench-timing note: memoized consumers time a checkpoint/parquet
  * read; whoever materializes first pays construction. Bench stages
  * every registry key up front (untimed per-query, reported as
  * `staging_sec`), so per-query numbers describe steady-state reads —
  * the production accounting, where the staging job runs once.
  */
object Shared {
  private val cache = new java.util.IdentityHashMap[
    SparkSession,
    scala.collection.concurrent.TrieMap[(String, String), DataFrame]]()

  // roots of staged ON-DISK structures that aren't single relations
  // (the versioned PQ index pair) — same keying discipline as `cache`,
  // but the memoized value is a directory path whose CONTENTS the
  // build callback wrote, not a DataFrame
  private val pathCache = new java.util.IdentityHashMap[
    SparkSession,
    scala.collection.concurrent.TrieMap[(String, String), String]]()

  /** The configured cross-session staging root, if any. */
  def stagingDir(spark: SparkSession): Option[String] =
    spark.conf.getOption("spark.graft.shared.dir")
      .orElse(sys.env.get("SPARK_GRAFT_SHARED_DIR"))
      .filter(_.nonEmpty)

  /** The memoized staged result of `build` (no clustering key). */
  def memo(spark: SparkSession, sfDir: String, key: String)(
      build: => DataFrame): DataFrame =
    memoClustered(spark, sfDir, key, None)(build)

  /** As [[memo]], with an optional (column, nFiles) clustering spec
    * applied when the relation is persisted: rows are hash-clustered
    * into `nFiles` files, sorted within each, on the staging key the
    * downstream joins/probes use.
    */
  def memoClustered(spark: SparkSession, sfDir: String, key: String,
      cluster: Option[(String, Int)])(build: => DataFrame): DataFrame =
    cache.synchronized {
      val it = cache.entrySet().iterator()
      while (it.hasNext) {
        if (it.next().getKey.sparkContext.isStopped) it.remove()
      }
      var m = cache.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
        cache.put(spark, m)
      }
      m.getOrElseUpdate((sfDir, key), stagingDir(spark) match {
        case Some(dir) => persisted(spark, dir, sfDir, key, cluster, build)
        case None =>
          System.err.println(s"[shared] building $key for $sfDir")
          build.localCheckpoint(false)
      })
    }

  /** Memoized root directory of a staged on-disk STRUCTURE (multiple
    * sibling tables versioning together — the PQ index's
    * (codes, codebook) pair): the r20 serving-unification primitive.
    * Persisted mode roots under `<sharedDir>/<sfDir-slug>/<key>` (so
    * the structure is reused across sessions/processes like [[memo]]);
    * in-process mode roots in a per-(session, sfDir, key) temp dir.
    * `build` runs under the same lock as [[memo]] (at most once per
    * key per session even under concurrent first access) and is
    * responsible for its OWN committed-content detection — in
    * persisted mode a prior process may already have written the
    * structure, and a crashed writer may have left a partial one.
    */
  def memoPath(spark: SparkSession, sfDir: String, key: String)(
      build: String => Unit): String =
    pathCache.synchronized {
      val it = pathCache.entrySet().iterator()
      while (it.hasNext) {
        if (it.next().getKey.sparkContext.isStopped) it.remove()
      }
      var m = pathCache.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[(String, String), String]
        pathCache.put(spark, m)
      }
      m.getOrElseUpdate((sfDir, key), {
        val root = stagingDir(spark) match {
          case Some(dir) => s"$dir/${slug(sfDir)}/$key"
          case None =>
            java.nio.file.Files.createTempDirectory(s"graft_$key").toString
        }
        System.err.println(s"[shared] structure root $key at $root")
        build(root)
        root
      })
    }

  private def slug(s: String): String =
    s.replaceAll("[^A-Za-z0-9._-]+", "_").replaceAll("^_+|_+$", "")

  private def persisted(spark: SparkSession, dir: String, sfDir: String,
      key: String, cluster: Option[(String, Int)],
      build: => DataFrame): DataFrame = {
    val path = s"$dir/${slug(sfDir)}/$key"
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(new org.apache.hadoop.fs.Path(hPath, "_SUCCESS"))) {
      System.err.println(s"[shared] reusing staged $key from $path")
    } else {
      System.err.println(s"[shared] staging $key to $path")
      val df = cluster match {
        case Some((c, n)) => build.repartition(n, col(c)).sortWithinPartitions(c)
        case None         => build
      }
      df.write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }

  /** Drop this session's memoized entries and free their checkpointed
    * blocks. DataFrames previously returned by [[memo]] for this
    * session are INVALID afterwards (a localCheckpoint truncates
    * lineage, so an unpersisted one cannot recompute) — call only when
    * every consumer is done (end of suite / before session stop), or
    * to force re-staging after the sfDir's contents changed.
    * Persisted parquet stays on disk; only the in-session handle drops.
    */
  def clear(spark: SparkSession): Unit = cache.synchronized {
    val m = cache.remove(spark)
    if (m != null) m.values.foreach { df =>
      try df.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case _ => () // persisted-mode parquet scan: nothing cached
      } catch { case _: Throwable => () }
    }
  }

  /** Every known shared relation, in build-dependency order (the LSH
    * pair set feeds nothing here but is listed before its own
    * consumers' keys are requested). Bench warms these up front so
    * per-query timings measure steady-state staged reads.
    */
  def registry: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "ngram_jaccard"       -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "minhash_lsh_pairs"   -> ((s, d) => Dedup.minhashLshPairs(s, d)),
    "contamination_pairs" -> ((s, d) => Dedup.contaminationPairs(s, d)),
    "bm25_scored"         -> ((s, d) => Retrieval.scoredBm25(s, d)),
    "ann_bruteforce_top5" -> ((s, d) => Similarity.bruteForceTop5(s, d)),
    "ivf_cells"           -> ((s, d) => Similarity.ivfCells(s, d)),
    // pq_codes' build reads pq_codebook — listed after it so the
    // up-front staging pass materializes each exactly once
    "pq_codebook"         -> ((s, d) => Similarity.pqCodebookStaged(s, d)),
    "pq_codes"            -> ((s, d) => Similarity.pqCodesStaged(s, d)),
    // r20: the versioned commit-path serving pair, built from the two
    // build-cache keys above — listed after them so the v0 write reads
    // staged relations, and the benched searches measure steady-state
    // serving reads (the production accounting: the index build job
    // runs once)
    "pq_index"            -> ((s, d) => {
      val (codes, _) = Similarity.pqServingPair(s, d); codes
    }),
    // r19: the media component assignment feeds three caller-session
    // consumers (both keeper gates + the combined-rates budget)
    "media_dedup_assignments" -> ((s, d) => Clusters.mediaAssignmentsStaged(s, d)),
  )

  /** Materialize every registry relation (build + checkpoint/write, or
    * a cheap re-read if already staged). Returns per-key wall seconds.
    */
  def stageAll(spark: SparkSession, sfDir: String): Seq[(String, Double)] =
    registry.map { case (key, gen) =>
      val t0 = System.nanoTime()
      try {
        gen(spark, sfDir).queryExecution.toRdd.count()
        key -> (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        System.err.println(
          s"[shared] staging $key FAILED: ${msg.linesIterator.nextOption().getOrElse("")}")
        key -> -1.0
      }
    }
}
