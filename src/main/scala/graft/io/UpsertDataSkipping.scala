package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Min/max data skipping for the `graft-upsert` scan — residual
  * (non-partition) predicates pruning I/O at two levels:
  *
  *  1. **File level, at planning time** (driver): each candidate file's
  *     parquet footer column statistics decide whether the file MIGHT
  *     contain a matching row; provably-empty files never become input
  *     partitions. Footer reads are cached per (path, mtime, length),
  *     so a table scanned repeatedly under changing predicates pays
  *     one footer read per file version, not per query.
  *  2. **Row-group level, at read time** (executor): the same
  *     predicates translate to parquet-mr `FilterPredicate`s
  *     ([[FilterApi]]) handed to the reader, which then skips whole
  *     row groups whose statistics cannot match (plus dictionary-page
  *     and record-level filtering for free).
  *
  * Together these are what make `optimize_zorder`'s layout real at
  * read time: Morton order gives every row group a tight 2-D min/max
  * tile, and a selective predicate on either Z-order column now skips
  * the row groups (and whole files) outside its range instead of
  * decoding them. At 100 TB this is the difference between reading a
  * partition and reading three row groups of it.
  *
  * Correctness stance: skipping is advisory-only — every residual
  * predicate is ALSO returned to Spark (`pushFilters` keeps them as
  * post-scan filters), so a conservative "might match" here can never
  * change an answer, only cost. All pruning decisions follow the same
  * rule: prune only what the footer statistics PROVE empty; any
  * missing/undecodable statistic keeps the file/row group. A column
  * absent from a file's schema (written before an additive evolution)
  * is all-null in that file, which IS provable: value predicates on it
  * match nothing, `IsNull` matches everything.
  *
  * Supported predicate shapes: =, <, <=, >, >=, IN, IS [NOT] NULL and
  * AND/OR combinations, over the footer-stat type set
  * ([[UpsertAggPushdown.statType]]: int, long, float, double, date,
  * timestamp). Strings are excluded deliberately — parquet writers may
  * truncate binary statistics, and a truncated max would make an
  * equality prune unsound.
  */
object UpsertDataSkipping {

  /** Per-column footer statistics of ONE file, aggregated over its row
    * groups: decoded min/max (None = no non-null value or undecodable),
    * null count (None = some chunk did not record it), total values.
    */
  final case class ColStats(min: Option[Any], max: Option[Any],
      nullCount: Option[Long], valueCount: Long, decodable: Boolean)

  /** Everything the file-level pruner knows about one file. `absent`
    * columns (not in the file schema) are all-null by construction.
    * `present` is ALIAS-RESOLVED: a column an archived pre-rename file
    * stores under a historical name counts as present under its
    * CURRENT name (with the historical chunk's statistics — a rename
    * is value-preserving), so time-travel reads across a rename prune
    * exactly like current reads instead of wrongly treating the
    * renamed column as all-null. `rowCount` (sum of row-group row
    * counts) feeds the scan's
    * [[org.apache.spark.sql.connector.read.SupportsReportStatistics]]
    * estimate; None = the footer was unreadable.
    */
  final case class FileStats(cols: Map[String, ColStats], present: Set[String],
      rowCount: Option[Long] = None)

  // ——— shape support (drives both capture and translation) ———

  /** Is `f` a predicate data skipping can use? Range comparisons need
    * a stat-decodable column type; null tests only consult NULL COUNTS
    * (never the possibly-truncated binary min/max), so they are sound
    * on EVERY non-partition column type — including strings. EQUALITY
    * additionally admits STRING and BINARY columns: the min/max path
    * keeps them conservatively (truncatable byte-string stats stay
    * untouched), but the bloom-filter pruner ([[fileMightMatchBlooms]])
    * and parquet-mr's own row-group bloom/dictionary filtering both
    * prove equality emptiness without ever consulting a truncatable
    * statistic — the record-key point-lookup path at 100 TB, and the
    * payload-fingerprint lookup path for binary media columns.
    */
  def supportedShape(f: Filter, schema: StructType,
      partitionCol: Option[String]): Boolean = {
    def field(a: String): Option[StructField] =
      schema.fields.find(_.name.equalsIgnoreCase(a))
        .filterNot(fd => partitionCol.exists(_.equalsIgnoreCase(fd.name)))
    def ok(a: String): Boolean = field(a).exists(fd => UpsertAggPushdown.statType(fd.dataType))
    def eqOk(a: String): Boolean = field(a).exists(fd =>
      UpsertAggPushdown.statType(fd.dataType) ||
        fd.dataType == StringType || fd.dataType == BinaryType)
    def anyCol(a: String): Boolean = field(a).isDefined
    f match {
      case EqualTo(a, v) => v != null && eqOk(a)
      // null-safe equality: the null case is a pure null-count test,
      // the non-null case prunes exactly like EqualTo
      case EqualNullSafe(a, null) => anyCol(a)
      case EqualNullSafe(a, _) => eqOk(a)
      case GreaterThan(a, v) => v != null && ok(a)
      case GreaterThanOrEqual(a, v) => v != null && ok(a)
      case LessThan(a, v) => v != null && ok(a)
      case LessThanOrEqual(a, v) => v != null && ok(a)
      case In(a, vs) => vs != null && vs.nonEmpty && vs.forall(_ != null) && eqOk(a)
      case IsNull(a) => anyCol(a)
      case IsNotNull(a) => anyCol(a)
      case And(l, r) => supportedShape(l, schema, partitionCol) &&
        supportedShape(r, schema, partitionCol)
      case Or(l, r) => supportedShape(l, schema, partitionCol) &&
        supportedShape(r, schema, partitionCol)
      case _ => false
    }
  }

  // ——— value conversion: Spark filter literal → internal stat value ———

  /** Spark hands filter literals in external form (java.sql.Date /
    * LocalDate, java.sql.Timestamp / Instant, boxed numerics); stats
    * compare in Spark's internal form (days-since-epoch Int, micros
    * Long). None = a literal this column type cannot compare.
    */
  def toInternal(v: Any, dt: DataType): Option[Any] = (v, dt) match {
    case (x: java.lang.Integer, IntegerType) => Some(x.intValue())
    case (x: java.lang.Long, LongType) => Some(x.longValue())
    case (x: java.lang.Float, FloatType) => Some(x.floatValue())
    case (x: java.lang.Double, DoubleType) => Some(x.doubleValue())
    case (x: java.sql.Date, DateType) =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(x))
    case (x: java.time.LocalDate, DateType) =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.localDateToDays(x))
    case (x: java.sql.Timestamp, TimestampType | TimestampNTZType) =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(x))
    case (x: java.time.Instant, TimestampType | TimestampNTZType) =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(x))
    case (x: java.time.LocalDateTime, TimestampNTZType) =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.localDateTimeToMicros(x))
    case _ => None
  }

  // ——— file-level pruning (driver, planning time) ———

  /** Might `stats`'s file contain a row satisfying ALL of `filters`?
    * Conservative: true unless some conjunct is PROVABLY empty.
    */
  def fileMightMatch(stats: FileStats, filters: Seq[Filter],
      schema: StructType): Boolean =
    filters.forall(f => mightMatch(stats, f, schema))

  private def mightMatch(stats: FileStats, f: Filter, schema: StructType): Boolean = {
    def dtOf(a: String): Option[DataType] =
      schema.fields.find(_.name.equalsIgnoreCase(a)).map(_.dataType)
    def col(a: String): Option[ColStats] =
      stats.cols.find { case (n, _) => n.equalsIgnoreCase(a) }.map(_._2)
    def absent(a: String): Boolean = !stats.present.exists(_.equalsIgnoreCase(a))
    // range test against the file's [min, max]; unknown stats → true
    def range(a: String)(test: (Any, Any, DataType) => Boolean): Boolean = {
      if (absent(a)) return false // all-null: no value predicate matches
      (col(a), dtOf(a)) match {
        case (Some(cs), Some(dt)) if cs.decodable =>
          (cs.min, cs.max) match {
            case (Some(mn), Some(mx)) => test(mn, mx, dt)
            case _ => cs.nullCount match {
              // no non-null value in the file — provably empty for a
              // value predicate only when the null count confirms it
              case Some(n) if n == cs.valueCount => false
              case _ => true
            }
          }
        case _ => true
      }
    }
    // float/double semantics guards: Spark compares PRIMITIVES
    // (-0.0 == 0.0; NaN never pushed by Spark's own ParquetFilters
    // either), while the stat comparator is a total order that
    // distinguishes the zeros and sorts NaN largest. Normalize zeros
    // on BOTH sides, and never prune on a NaN literal (a conforming
    // parquet writer omits min/max when a page holds NaN, but external
    // files aren't guaranteed conforming — match Spark and refuse).
    def fpNorm(x: Any): Any = x match {
      case d: java.lang.Double if d.doubleValue() == 0.0 =>
        java.lang.Double.valueOf(0.0)
      case fl: java.lang.Float if fl.floatValue() == 0.0f =>
        java.lang.Float.valueOf(0.0f)
      case other => other
    }
    def litNaN(x: Any): Boolean = x match {
      case d: java.lang.Double => d.isNaN
      case fl: java.lang.Float => fl.isNaN
      case _ => false
    }
    def cmp(a: Any, b: Any, dt: DataType) =
      UpsertAggPushdown.cmpStat(fpNorm(a), fpNorm(b), dt)
    // a NaN literal maps to None → forall(true) → never pruned on
    def lit(a: String, v: Any): Option[Any] =
      dtOf(a).flatMap(toInternal(v, _)).filterNot(litNaN).map(fpNorm)
    f match {
      case EqualTo(a, v) => range(a) { (mn, mx, dt) =>
        lit(a, v).forall(x => cmp(x, mn, dt) >= 0 && cmp(x, mx, dt) <= 0) }
      case EqualNullSafe(a, null) => // `col <=> null` ≡ IS NULL
        mightMatch(stats, IsNull(a), schema)
      case EqualNullSafe(a, v) => // non-null rhs prunes exactly like =
        mightMatch(stats, EqualTo(a, v), schema)
      case GreaterThan(a, v) => range(a) { (_, mx, dt) =>
        lit(a, v).forall(x => cmp(mx, x, dt) > 0) }
      case GreaterThanOrEqual(a, v) => range(a) { (_, mx, dt) =>
        lit(a, v).forall(x => cmp(mx, x, dt) >= 0) }
      case LessThan(a, v) => range(a) { (mn, _, dt) =>
        lit(a, v).forall(x => cmp(mn, x, dt) < 0) }
      case LessThanOrEqual(a, v) => range(a) { (mn, _, dt) =>
        lit(a, v).forall(x => cmp(mn, x, dt) <= 0) }
      case In(a, vs) => range(a) { (mn, mx, dt) =>
        vs.exists(v => lit(a, v).forall(x => cmp(x, mn, dt) >= 0 && cmp(x, mx, dt) <= 0)) }
      case IsNull(a) =>
        if (absent(a)) true // evolved-in column: all null in this file
        else col(a) match {
          case Some(cs) => cs.nullCount.forall(_ > 0)
          case None => true
        }
      case IsNotNull(a) =>
        if (absent(a)) false
        else col(a) match {
          case Some(cs) => cs.nullCount.forall(_ < cs.valueCount)
          case None => true
        }
      case And(l, r) => mightMatch(stats, l, schema) && mightMatch(stats, r, schema)
      case Or(l, r) => mightMatch(stats, l, schema) || mightMatch(stats, r, schema)
      case _ => true // unsupported shape: never prune on it
    }
  }

  /** The column names a set of skip filters references. */
  def referencedColumns(filters: Seq[Filter]): Set[String] =
    filters.flatMap(_.references).map(_.toLowerCase(java.util.Locale.ROOT)).toSet

  // footer-stat cache: (path, mtime, len) → FileStats over EVERY table
  // column (extraction per extra column is a metadata walk — the footer
  // open dominates — so caching the full set means a later query on a
  // DIFFERENT column never re-reads the footer). Bounded LRU — at
  // 100 TB a driver plans millions of files over a session; the cache
  // trades one footer read per file VERSION for O(1) re-planning, and
  // the bound keeps the driver heap flat.
  // aliasKey: the canonical rename-lineage string — a NEW rename must
  // not serve a pre-rename cache entry whose `present` set could not
  // resolve it (archived files keep their mtime across renames)
  // schemaKey: the table schema participates in decoding (widening
  // promotions, timestamp modes) — a metadata-only ALTER that widens a
  // column must not serve a cache entry decoded under the OLD type
  // (the comparison layer would cast boxed values to the new type)
  private final case class CacheKey(path: String, mtime: Long, len: Long,
      fp: Long, aliasKey: String, schemaKey: Int)

  private def schemaKeyOf(schema: StructType): Int =
    schema.fields.toSeq.map(f => (f.name, f.dataType)).hashCode()

  /** Canonical cache-key form of a rename-lineage map. */
  private def aliasKeyOf(aliases: Map[String, List[String]]): String =
    if (aliases.isEmpty) ""
    else aliases.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k>${v.mkString(",")}" }.mkString(";")
  private[graft] def clearStatsCacheForTesting(): Unit = statsCache.clear()
  private val MaxCacheEntries = 65536
  private val statsCache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[CacheKey, FileStats](1024, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[CacheKey, FileStats]): Boolean =
          size() > MaxCacheEntries
      })

  /** Manifest-related session conf, captured ONCE on the calling
    * (planning) thread. The footer pool's threads are JVM-lifetime and
    * inherit `SparkSession.active` from whichever thread first grew
    * the pool — a streaming fixture's micro-batch thread runs under a
    * CLONED session, so a conf read on a pool thread can see a stale
    * snapshot forever after. Reading here and passing down makes the
    * conf the caller's, deterministically.
    */
  private[graft] final case class ManifestCtx(enabled: Boolean, verify: Boolean,
      racyWindow: Long)
  private def currentManifestCtx: ManifestCtx =
    ManifestCtx(UpsertStatsManifest.manifestEnabled,
      UpsertStatsManifest.verifyContent,
      UpsertStatsManifest.racyWindowMillis)

  /** Footer statistics of `file` for every column of `schema`, via the
    * cache. Any footer-read failure degrades to "no stats" (never
    * prunes) rather than failing the plan.
    */
  def fileStats(fs: FileSystem, file: Path,
      schema: StructType, conf: Configuration,
      aliases: Map[String, List[String]] = Map.empty): FileStats =
    fileStatsCtx(fs, file, schema, conf, aliases, currentManifestCtx)

  private def fileStatsCtx(fs: FileSystem, file: Path,
      schema: StructType, conf: Configuration,
      aliases: Map[String, List[String]], ctx: ManifestCtx): FileStats = {
    val st =
      try fs.getFileStatus(file)
      catch { case _: java.io.IOException =>
        return FileStats(Map.empty, schema.fieldNames.toSet) }
    // content-verified mode: a real footer-bytes fingerprint read per
    // planning pass, keyed into BOTH caches — an in-place rewrite that
    // preserves (name, mtime, len) then misses everywhere and re-reads.
    // AUTO-ARMED for FOREIGN files (externally added, not part-*): the
    // sink never rewrites its own files in place, but an external
    // writer can restore mtime AND length (`cp -p` style), which the
    // (mtime, len) key cannot see — so files outside the sink's
    // authorship pay the one tail read per pass by default, while
    // sink-written files stay on the cheap path.
    val vfp =
      if (ctx.verify || !UpsertStatsManifest.sinkWrittenName(file.getName))
        UpsertStatsManifest.contentFingerprint(fs, file, st.getLen)
      else UpsertStatsManifest.FpUnchecked
    val key = CacheKey(file.toString, st.getModificationTime, st.getLen,
      vfp, aliasKeyOf(aliases), schemaKeyOf(schema))
    val cached = statsCache.get(key)
    if (cached != null) return cached
    // raw physical stats: the persisted per-directory manifest first
    // (one small read per DIR, not one footer per file — the 100 TB
    // planning path), footer fallback for missing/stale entries, which
    // then write back via the manifest's lazy repair. Both sources
    // resolve through the SAME conversion — they cannot disagree.
    val computed =
      try {
        val raw = UpsertStatsManifest.lookup(fs, file.getParent, file.getName,
          st.getModificationTime, st.getLen, vfp, ctx.enabled, ctx.racyWindow)
          .getOrElse {
            // record the REAL fingerprint (one tail read, trivial next
            // to the footer parse) so a later verified lookup — this
            // driver or the next — has something sound to compare.
            // Read BEFORE the footer parse: taken after, an in-place
            // rewrite landing between the two reads would pair a fp
            // certifying the NEW content with stats describing the OLD
            // — and the verified mode would then trust the stale entry
            // forever. fp-first, the same race records a MISmatching
            // fp and the verified lookup refuses it. Skipped entirely
            // when manifests are OFF: recordFresh no-ops then, so the
            // tail read would be pure waste.
            val fp =
              if (!ctx.enabled) UpsertStatsManifest.FpUnreadable
              else if (vfp != UpsertStatsManifest.FpUnchecked) vfp
              else UpsertStatsManifest.contentFingerprint(fs, file, st.getLen)
            val r = UpsertStatsManifest.readRaw(file, conf)
            UpsertStatsManifest.recordFresh(fs, file.getParent, file.getName,
              st.getModificationTime, st.getLen, r, fp, ctx.enabled)
            r
          }
        UpsertStatsManifest.resolve(raw, schema, aliases)
      } catch { case _: Exception =>
        FileStats(Map.empty, schema.fieldNames.toSet) }
    // same net as the manifest's racy window, for the in-JVM cache: an
    // entry whose mtime tick is still open could be rewritten in place
    // (same name/mtime/len) and then served stale for the driver's
    // lifetime — recompute until the tick closes. Compared on the
    // STORAGE clock estimate (driver clock + the offset probed by the
    // last manifest flush on this fs), not the raw driver wall clock:
    // a storage clock behind the driver by more than the window would
    // otherwise admit a just-written file immediately. Before the
    // first flush the offset is unknown (0) — that single cold pass
    // carries the skew residual, and the pass itself ends in a flush.
    // The window comes from the ctx SNAPSHOT (planning thread), never
    // from session state on this (possibly pool) thread — the same
    // discipline as enabled/verify.
    if (UpsertStatsManifest.storageNowEstimate(fs) - st.getModificationTime >=
      ctx.racyWindow)
      statsCache.put(key, computed)
    computed
  }

  /** Fetch [[fileStats]] for many files CONCURRENTLY (bounded pool):
    * planning-time file pruning over a cold table is footer-I/O bound,
    * and serializing those reads on the driver would stall planning at
    * exactly the file counts the feature targets. Cache hits return
    * without touching the pool's queue semantics (fileStats itself
    * checks the cache).
    */
  // ONE JVM-lifetime daemon pool for footer I/O: planning may call
  // fileStatsAll several times per query (runtime filters re-plan), and
  // per-call pool churn on a busy driver is avoidable overhead. Daemon
  // threads never block JVM exit; idle threads cost nothing.
  private lazy val statsPool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, math.max(2, Runtime.getRuntime.availableProcessors())),
      new java.util.concurrent.ThreadFactory {
        private val n = new java.util.concurrent.atomic.AtomicInteger()
        override def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"graft-skip-stats-${n.incrementAndGet()}")
          t.setDaemon(true)
          t
        }
      })

  def fileStatsAll(fs: FileSystem, files: Seq[Path],
      schema: StructType, conf: Configuration,
      aliases: Map[String, List[String]] = Map.empty): Map[String, FileStats] = {
    if (files.isEmpty) return Map.empty
    // conf snapshot on THIS (planning) thread — pool threads must not
    // consult session state (see ManifestCtx)
    val ctx = currentManifestCtx
    if (files.lengthCompare(2) < 0) {
      val out = files.map(f =>
        f.toString -> fileStatsCtx(fs, f, schema, conf, aliases, ctx)).toMap
      UpsertStatsManifest.flush(fs)
      return out
    }
    val futures = files.map { f =>
      f.toString -> statsPool.submit(new java.util.concurrent.Callable[FileStats] {
        override def call(): FileStats = fileStatsCtx(fs, f, schema, conf, aliases, ctx)
      })
    }
    val out = futures.map { case (p, fut) => p -> fut.get() }.toMap
    // persist whatever this pass had to read from footers, so the NEXT
    // driver (or post-restart plan) reads one manifest per directory
    UpsertStatsManifest.flush(fs)
    out
  }

  /** [[fileMightMatchBlooms]] for many files CONCURRENTLY (same bounded
    * pool as the footer-stat fetch — bloom reads are footer-offset
    * seeks and must not serialize on the driver either).
    */
  def fileMightMatchBloomsAll(fs: FileSystem, files: Seq[Path], conf: Configuration,
      targets: Seq[(String, Seq[Any])], schema: StructType,
      aliases: Map[String, List[String]] = Map.empty): Map[String, Boolean] = {
    if (files.isEmpty || targets.isEmpty)
      return files.map(_.toString -> true).toMap
    if (files.lengthCompare(2) < 0)
      return files.map(f =>
        f.toString -> fileMightMatchBlooms(fs, f, conf, targets, schema, aliases)).toMap
    val futures = files.map { f =>
      f.toString -> statsPool.submit(new java.util.concurrent.Callable[Boolean] {
        override def call(): Boolean =
          fileMightMatchBlooms(fs, f, conf, targets, schema, aliases)
      })
    }
    futures.map { case (p, fut) => p -> fut.get() }.toMap
  }


  // ——— bloom-filter file pruning (driver, planning time) ———

  /** Equality conjuncts usable for bloom pruning: (column → candidate
    * values). Only top-level =, null-safe-= (non-null) and IN qualify —
    * OR/AND-nested equalities stay with the min/max walk, which is
    * already conservative for them.
    */
  def bloomEqTargets(filters: Seq[Filter], schema: StructType,
      partitionCol: Option[String]): Seq[(String, Seq[Any])] = {
    def dataCol(a: String): Boolean =
      schema.fields.exists(_.name.equalsIgnoreCase(a)) &&
        !partitionCol.exists(_.equalsIgnoreCase(a))
    filters.collect {
      case EqualTo(a, v) if v != null && dataCol(a) => a -> Seq(v)
      case EqualNullSafe(a, v) if v != null && dataCol(a) => a -> Seq(v)
      case In(a, vs) if vs != null && vs.nonEmpty && vs.forall(_ != null) &&
        dataCol(a) => a -> vs.toSeq
    }
  }

  /** One column's bloom filters, one per row group, plus the physical
    * type literals must hash as. Cached per file VERSION — a bloom read
    * is a footer-offset seek per row group, and point-lookup workloads
    * re-probe the same files with different literals.
    */
  private final case class ColBlooms(
      blooms: Seq[org.apache.parquet.column.values.bloomfilter.BloomFilter],
      prim: org.apache.parquet.schema.PrimitiveType)

  // aliasKey mirrors CacheKey's: a rename changes which physical chunk
  // a current-name probe resolves to in archived files, so entries
  // cached under the old lineage must not serve the new one
  private final case class BloomKey(path: String, mtime: Long, len: Long,
      col: String, aliasKey: String)

  // byte-budget LRU: one planning pass over a point lookup probes EVERY
  // file of the matched partitions (min/max cannot prune
  // high-cardinality keys), so the cache must hold a pass's working set
  // or it thrashes into per-query bloom re-reads. Entries are weighed
  // by their actual bitset bytes (~150 KB per chunk at the default
  // NDV); 256 MB ≈ ~1700 single-row-group files resident.
  private val MaxBloomCacheBytes = 256L * 1024 * 1024
  private object bloomCacheLock
  private val bloomCache =
    new java.util.LinkedHashMap[BloomKey, Option[ColBlooms]](256, 0.75f, true)
  private var bloomCacheBytes = 0L
  private def bloomWeight(v: Option[ColBlooms]): Long =
    v.map(_.blooms.iterator.map(_.getBitsetSize.toLong).sum).getOrElse(0L) + 64L
  private def bloomCacheGet(k: BloomKey): Option[Option[ColBlooms]] =
    bloomCacheLock.synchronized(Option(bloomCache.get(k)))
  private def bloomCachePut(k: BloomKey, v: Option[ColBlooms]): Unit =
    bloomCacheLock.synchronized {
      val prev = bloomCache.put(k, v)
      bloomCacheBytes += bloomWeight(v) - (if (prev != null) bloomWeight(prev) else 0L)
      val it = bloomCache.entrySet().iterator()
      while (bloomCacheBytes > MaxBloomCacheBytes && it.hasNext) {
        val e = it.next() // access-order iteration: least recent first
        if (e.getKey != k) { bloomCacheBytes -= bloomWeight(e.getValue); it.remove() }
      }
    }

  /** Might `file` contain a row satisfying EVERY (col = one-of-values)
    * conjunct, judged by the parquet bloom filters the sink writes on
    * its record-key columns? Conservative: a column with no bloom in
    * some row group, an unhashable physical layout, or any read failure
    * keeps the file. A definite prune needs EVERY candidate value to
    * miss in EVERY row group's bloom — exactly the Hudi bloom-index
    * contract, with the filters living in the standard parquet footer
    * instead of a sidecar.
    */
  def fileMightMatchBlooms(fs: FileSystem, file: Path, conf: Configuration,
      targets: Seq[(String, Seq[Any])], schema: StructType,
      aliases: Map[String, List[String]] = Map.empty): Boolean = {
    if (targets.isEmpty) return true
    val st =
      try fs.getFileStatus(file)
      catch { case _: java.io.IOException => return true }
    def key(c: String) = BloomKey(file.toString, st.getModificationTime,
      st.getLen, c.toLowerCase(java.util.Locale.ROOT), aliasKeyOf(aliases))
    // resolve against the LOADED values, not a cache re-get: an entry
    // evicted between load and probe must not silently weaken the prune
    val cols = targets.map(_._1).distinct
    val cached = cols.flatMap(c => bloomCacheGet(key(c)).map(c -> _)).toMap
    val missing = cols.filterNot(cached.contains)
    val resolved = cached ++
      (if (missing.isEmpty) Map.empty
       else loadBlooms(file, conf, missing, key, aliases))
    targets.forall { case (c, values) =>
      resolved.get(c).flatten match {
        case None => true // unusable: never prune on it
        case Some(cb) =>
          val hashed = values.map(bloomHash(cb, _, colType(schema, c)))
          if (hashed.exists(_.isEmpty)) true // some literal unhashable
          else hashed.flatten.exists(h => cb.blooms.exists(_.findHash(h)))
      }
    }
  }

  private def colType(schema: StructType, a: String): Option[DataType] =
    schema.fields.find(_.name.equalsIgnoreCase(a)).map(_.dataType)

  /** Load (and cache) the per-row-group blooms of `cols` in one footer
    * open. A column lacking a bloom in ANY row group caches as None —
    * unusable for file-level pruning (that row group could hold the
    * value).
    */
  private def loadBlooms(file: Path, conf: Configuration, cols: Seq[String],
      key: String => BloomKey,
      aliases: Map[String, List[String]] = Map.empty): Map[String, Option[ColBlooms]] = {
    try {
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
      try {
        val blocks = reader.getFooter.getBlocks
        cols.map { c =>
          var prim: org.apache.parquet.schema.PrimitiveType = null
          var ok = true
          val acc = Seq.newBuilder[org.apache.parquet.column.values.bloomfilter.BloomFilter]
          // rename lineage, like readFooterStats: a pre-rename archived
          // file stores the column under a historical name — probe the
          // current name first, then aliases newest-first
          val names = c :: aliases.getOrElse(c.toLowerCase(java.util.Locale.ROOT), Nil)
          val it = blocks.iterator()
          while (ok && it.hasNext) {
            val block = it.next()
            val chunks = block.getColumns
            var chunk: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData = null
            val ni = names.iterator
            while (ni.hasNext && chunk == null) {
              val n = ni.next()
              var i = 0
              while (i < chunks.size() && chunk == null) {
                val cc = chunks.get(i)
                if (cc.getPath.size() == 1 &&
                  cc.getPath.toDotString.equalsIgnoreCase(n)) chunk = cc
                i += 1
              }
            }
            val bf = if (chunk == null) null
              else reader.getBloomFilterDataReader(block).readBloomFilter(chunk)
            if (bf == null) ok = false
            else { prim = chunk.getPrimitiveType; acc += bf }
          }
          val v = if (ok && prim != null) Some(ColBlooms(acc.result(), prim)) else None
          bloomCachePut(key(c), v)
          c -> v
        }.toMap
      } finally reader.close()
    } catch {
      case _: Exception =>
        cols.map { c => bloomCachePut(key(c), None); c -> (None: Option[ColBlooms]) }.toMap
    }
  }

  /** Hash a Spark filter literal the way the WRITER hashed the column's
    * values — physical-layout-gated exactly like [[translate]]'s type
    * matrix, so a mismatched encoding (INT96 timestamps, MILLIS files)
    * degrades to "keep" instead of hashing the wrong representation.
    */
  private def bloomHash(cb: ColBlooms, v: Any, dt: Option[DataType]): Option[Long] = {
    val bf = cb.blooms.head
    (cb.prim.getPrimitiveTypeName, dt) match {
      case (PrimitiveTypeName.BINARY, Some(StringType)) => v match {
        case s: String =>
          Some(bf.hash(org.apache.parquet.io.api.Binary.fromString(s)))
        case u: org.apache.spark.unsafe.types.UTF8String =>
          Some(bf.hash(org.apache.parquet.io.api.Binary.fromConstantByteArray(u.getBytes)))
        case _ => None
      }
      case (PrimitiveTypeName.BINARY, Some(BinaryType)) => v match {
        case b: Array[Byte] =>
          Some(bf.hash(org.apache.parquet.io.api.Binary.fromConstantByteArray(b)))
        case _ => None
      }
      case (PrimitiveTypeName.INT32, Some(t @ (IntegerType | DateType))) =>
        toInternal(v, t).map(x => bf.hash(x.asInstanceOf[Int]))
      case (PrimitiveTypeName.INT64, Some(LongType)) =>
        toInternal(v, LongType).map(x => bf.hash(x.asInstanceOf[Long]))
      case (PrimitiveTypeName.INT64, Some(t @ (TimestampType | TimestampNTZType)))
          if (cb.prim.getLogicalTypeAnnotation match {
            case a: TimestampLogicalTypeAnnotation =>
              a.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS
            case _ => true // plain INT64 written as micros (our writer)
          }) =>
        toInternal(v, t).map(x => bf.hash(x.asInstanceOf[Long]))
      // the bloom hashes exact BIT PATTERNS while Spark equality is
      // primitive (-0.0 == 0.0; NaN has many encodings): refuse the
      // ambiguous literals, hash the rest (non-zero non-NaN doubles
      // are equal iff bit-identical)
      case (PrimitiveTypeName.FLOAT, Some(FloatType)) =>
        toInternal(v, FloatType).collect {
          case x: Float if x != 0.0f && !x.isNaN => bf.hash(x)
        }
      case (PrimitiveTypeName.DOUBLE, Some(DoubleType)) =>
        toInternal(v, DoubleType).collect {
          case x: Double if x != 0.0 && !x.isNaN => bf.hash(x)
        }
      // widened table (long) over a pre-widening INT32 file: the bloom
      // hashed int32 values, so probe with the int form when the long
      // literal fits — an unrepresentable literal keeps the file (the
      // min/max walk prunes it via the promoted stats instead)
      case (PrimitiveTypeName.INT32, Some(LongType))
          if !cb.prim.getLogicalTypeAnnotation
            .isInstanceOf[LogicalTypeAnnotation.DateLogicalTypeAnnotation] =>
        toInternal(v, LongType).collect {
          case x: Long if x >= Int.MinValue && x <= Int.MaxValue =>
            bf.hash(x.toInt)
        }
      case _ => None
    }
  }

  // ——— row-group filtering (executor, read time) ———

  /** Translate the skip filters into ONE parquet-mr [[FilterPredicate]]
    * over `fileSchema` — conjuncts that reference a column missing from
    * the file (or with an untranslatable physical layout) drop out
    * (Spark still evaluates them above the scan). None = nothing
    * translatable for this file.
    */
  def parquetPredicate(filters: Seq[Filter], fileSchema: MessageType,
      schema: StructType): Option[FilterPredicate] = {
    val parts = filters.flatMap(translate(_, fileSchema, schema))
    parts.reduceOption(FilterApi.and)
  }

  /** The physical column kind a filter literal can bind to, or None. */
  private def translate(f: Filter, fileSchema: MessageType,
      schema: StructType): Option[FilterPredicate] = {
    def prim(a: String) = {
      val name = (0 until fileSchema.getFieldCount)
        .map(fileSchema.getFieldName)
        .find(_.equalsIgnoreCase(a))
      // a GROUP field with the filter's name (externally-written nested
      // file) has no primitive layout to bind — skip the conjunct
      // rather than throw from asPrimitiveType
      name.map(n => n -> fileSchema.getType(fileSchema.getFieldIndex(n)))
        .collect { case (n, t) if t.isPrimitive => n -> t.asPrimitiveType() }
    }
    def dtOf(a: String): Option[DataType] =
      schema.fields.find(_.name.equalsIgnoreCase(a)).map(_.dataType)
    // bind (column, literal) → type-homogeneous ops; timestamps only
    // translate for MICROS INT64 layouts (our writer's layout) — a
    // MILLIS/NANOS file would need a different literal scale, so it
    // conservatively skips row-group filtering for that conjunct
    sealed trait Bound {
      def eq(): FilterPredicate; def gt(): FilterPredicate
      def gtEq(): FilterPredicate; def lt(): FilterPredicate
      def ltEq(): FilterPredicate
    }
    def bind(a: String, v: Any): Option[Bound] = {
      val p = prim(a)
      val dt = dtOf(a)
      if (p.isEmpty || dt.isEmpty) return None
      val (name, pt) = p.get
      (pt.getPrimitiveTypeName, dt.get) match {
        case (PrimitiveTypeName.INT32, IntegerType | DateType) =>
          toInternal(v, dt.get).map { x =>
            val c = FilterApi.intColumn(name)
            val l = java.lang.Integer.valueOf(x.asInstanceOf[Int])
            new Bound {
              def eq() = FilterApi.eq(c, l); def gt() = FilterApi.gt(c, l)
              def gtEq() = FilterApi.gtEq(c, l); def lt() = FilterApi.lt(c, l)
              def ltEq() = FilterApi.ltEq(c, l)
            }
          }
        case (PrimitiveTypeName.INT64, LongType) =>
          toInternal(v, dt.get).map { x =>
            val c = FilterApi.longColumn(name)
            val l = java.lang.Long.valueOf(x.asInstanceOf[Long])
            new Bound {
              def eq() = FilterApi.eq(c, l); def gt() = FilterApi.gt(c, l)
              def gtEq() = FilterApi.gtEq(c, l); def lt() = FilterApi.lt(c, l)
              def ltEq() = FilterApi.ltEq(c, l)
            }
          }
        case (PrimitiveTypeName.INT64, TimestampType | TimestampNTZType)
            if (pt.getLogicalTypeAnnotation match {
              case t: TimestampLogicalTypeAnnotation =>
                t.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS
              case _ => true // plain INT64 written as micros (our writer)
            }) =>
          toInternal(v, dt.get).map { x =>
            val c = FilterApi.longColumn(name)
            val l = java.lang.Long.valueOf(x.asInstanceOf[Long])
            new Bound {
              def eq() = FilterApi.eq(c, l); def gt() = FilterApi.gt(c, l)
              def gtEq() = FilterApi.gtEq(c, l); def lt() = FilterApi.lt(c, l)
              def ltEq() = FilterApi.ltEq(c, l)
            }
          }
        case (PrimitiveTypeName.BINARY, StringType) =>
          // equality only reaches here (supportedShape gates string
          // shapes to =/IN): parquet-mr evaluates it against row-group
          // statistics with truncation-aware bounds, the dictionary
          // page, AND the column's bloom filter — so a point lookup
          // inside a surviving file still skips every row group that
          // provably lacks the key
          v match {
            case s: String =>
              val c = FilterApi.binaryColumn(name)
              val l = org.apache.parquet.io.api.Binary.fromString(s)
              Some(new Bound {
                def eq() = FilterApi.eq(c, l); def gt() = FilterApi.gt(c, l)
                def gtEq() = FilterApi.gtEq(c, l); def lt() = FilterApi.lt(c, l)
                def ltEq() = FilterApi.ltEq(c, l)
              })
            case _ => None
          }
        case (PrimitiveTypeName.BINARY, BinaryType) =>
          // same =/IN-only gate as strings: row-group stats (with
          // truncation-aware bounds), dictionary page, and bloom filter
          // all prove equality emptiness for raw byte strings —
          // payload-fingerprint point lookups on media columns
          v match {
            case b: Array[Byte] =>
              val c = FilterApi.binaryColumn(name)
              val l = org.apache.parquet.io.api.Binary.fromConstantByteArray(b)
              Some(new Bound {
                def eq() = FilterApi.eq(c, l); def gt() = FilterApi.gt(c, l)
                def gtEq() = FilterApi.gtEq(c, l); def lt() = FilterApi.lt(c, l)
                def ltEq() = FilterApi.ltEq(c, l)
              })
            case _ => None
          }
        case (PrimitiveTypeName.FLOAT, FloatType) =>
          toInternal(v, dt.get).map { x =>
            val c = FilterApi.floatColumn(name)
            val l = java.lang.Float.valueOf(x.asInstanceOf[Float])
            new Bound {
              def eq() = FilterApi.eq(c, l); def gt() = FilterApi.gt(c, l)
              def gtEq() = FilterApi.gtEq(c, l); def lt() = FilterApi.lt(c, l)
              def ltEq() = FilterApi.ltEq(c, l)
            }
          }
        case (PrimitiveTypeName.DOUBLE, DoubleType) =>
          toInternal(v, dt.get).map { x =>
            val c = FilterApi.doubleColumn(name)
            val l = java.lang.Double.valueOf(x.asInstanceOf[Double])
            new Bound {
              def eq() = FilterApi.eq(c, l); def gt() = FilterApi.gt(c, l)
              def gtEq() = FilterApi.gtEq(c, l); def lt() = FilterApi.lt(c, l)
              def ltEq() = FilterApi.ltEq(c, l)
            }
          }
        case _ => None
      }
    }
    f match {
      case EqualTo(a, v) if v != null => bind(a, v).map(_.eq())
      // null-safe equality with a NON-null rhs matches exactly the rows
      // `=` matches (nulls fail both); the null-rhs case stays
      // driver-side (null-count file pruning)
      case EqualNullSafe(a, v) if v != null => bind(a, v).map(_.eq())
      case GreaterThan(a, v) if v != null => bind(a, v).map(_.gt())
      case GreaterThanOrEqual(a, v) if v != null => bind(a, v).map(_.gtEq())
      case LessThan(a, v) if v != null => bind(a, v).map(_.lt())
      case LessThanOrEqual(a, v) if v != null => bind(a, v).map(_.ltEq())
      case In(a, vs) if vs != null && vs.nonEmpty && vs.forall(_ != null) =>
        val eqs = vs.toSeq.map(v => bind(a, v).map(_.eq()))
        if (eqs.exists(_.isEmpty)) None
        else eqs.flatten.reduceOption(FilterApi.or)
      case And(l, r) =>
        // partial And is sound (a weaker predicate keeps more rows)
        (translate(l, fileSchema, schema), translate(r, fileSchema, schema)) match {
          case (Some(a), Some(b)) => Some(FilterApi.and(a, b))
          case (a, b) => a.orElse(b)
        }
      case Or(l, r) =>
        // partial Or is NOT sound — both branches or nothing
        for {
          a <- translate(l, fileSchema, schema)
          b <- translate(r, fileSchema, schema)
        } yield FilterApi.or(a, b)
      case _ => None // IsNull/IsNotNull stay driver-side (null-count pruning)
    }
  }
}
