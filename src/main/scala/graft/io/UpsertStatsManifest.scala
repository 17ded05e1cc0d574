package graft.io

import java.util.Locale

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.io.UpsertDataSkipping.{ColStats, FileStats}

/** PERSISTED file statistics for planning-time data skipping — the
  * piece that makes footer-based file pruning hold at 100 TB.
  *
  * The pruner ([[UpsertDataSkipping.fileStats]]) needs per-file
  * min/max/null-count statistics. Reading them from parquet footers is
  * correct but costs one footer open per file per driver lifetime: a
  * table with a million files pays a million small reads before the
  * FIRST query can prune, every time a driver starts. Delta and
  * Iceberg solve this by carrying file stats in the table metadata;
  * this is that move for the graft-upsert format, shaped as a CACHE,
  * never a source of truth:
  *
  *  - each partition directory may hold a `_stats.manifest` (an
  *    `_`-prefixed sidecar — invisible to Spark/parquet readers)
  *    mapping file name → (mtime, length, raw footer statistics);
  *  - planning consults the manifest first — ONE small read per
  *    DIRECTORY instead of one per file — and falls back to the
  *    footer for files that are missing or whose (mtime, length) no
  *    longer match;
  *  - footer reads record their result, and the planning pass REPAIRS
  *    the manifest afterwards (lazy write-back, tmp+delete+rename like
  *    `_table.properties`): the first scan after a commit pays footers
  *    for the new files only, and persists them for every later
  *    driver. No writer hook, no coupling to the commit protocol, and
  *    a lost/stale/corrupt manifest degrades to exactly the old
  *    footer-reading behavior.
  *
  * Statistics are stored in RAW PHYSICAL form (parquet primitive type
  * + logical-annotation tag + physical-domain min/max), not decoded
  * values: decoding depends on the CURRENT table schema (type
  * widening promotes, renames re-key), so the same manifest entry must
  * serve every future schema. [[resolve]] is the single decode path —
  * the live footer read goes through the same RawFileStats → FileStats
  * conversion, so manifest-served and footer-served pruning can never
  * disagree.
  */
object UpsertStatsManifest {

  val ManifestFileName = "_stats.manifest"
  val EnabledConfKey = "spark.graft.upsert.statsManifest.enabled"

  /** Staleness-soundness knobs. The entry key is (mtime, length) — an
    * in-place rewrite that lands the SAME name, length and mtime tick
    * (possible on coarse-granularity filesystems: S3 LastModified is
    * whole seconds) would otherwise serve stale min/max forever,
    * across drivers, with no self-heal. Two nets close it:
    *
    *  - the RACY WINDOW (git's "racily clean" move): an entry whose
    *    file mtime is within `racyWindowMillis` of the STORAGE clock
    *    at flush time is inside an OPEN tick — an in-place rewrite
    *    could still land the same (mtime, len). Such an entry persists
    *    FLAGGED `verifyOnRead` when it carries a real footer
    *    fingerprint (default-mode lookups then verify the fingerprint
    *    with one tail read before serving, and self-heal the flag off
    *    once the tick has closed), or — lacking a fingerprint — stays
    *    in `pending` until a later flush finds the tick closed. Once
    *    the tick has passed, any in-place rewrite necessarily lands a
    *    LATER mtime, so the (mtime, len) key can no longer falsely
    *    match. Covers every rewriter that lets the filesystem stamp
    *    mtime — without maintenance paths having to sleep the tick out
    *    before warming manifests.
    *  - CONTENT VERIFICATION: each entry carries a fingerprint of the
    *    file's serialized parquet footer (which embeds every
    *    row-group's min/max, so any stats change changes it). Lookups
    *    re-read the footer bytes and compare — one positioned tail
    *    read per file per planning pass, strictly cheaper than the
    *    footer parse it replaces, but no longer O(directories). It is
    *    AUTO-ARMED per entry where (mtime, len) alone is not trusted:
    *    `verifyOnRead`-flagged entries (above) and every FOREIGN file
    *    (externally added, not `part-*`-named — an external rewriter
    *    can restore mtime and length, `cp -p` style). The global
    *    opt-in ([[VerifyContentConfKey]]) remains the strict mode for
    *    tables whose SINK-WRITTEN files are also mutated in place by
    *    external tools.
    *
    * The graft sink itself never rewrites a data file in place
    * (DSv2 task files carry write UUIDs) and overwrite paths delete
    * whole partition directories and [[invalidate]] their manifests,
    * so the default (racy window + per-entry/foreign verification on,
    * global verification off) is sound for all sink-managed mutation
    * and for mtime-restoring rewrites of foreign files.
    */
  val RacyWindowConfKey = "spark.graft.upsert.statsManifest.racyWindowMillis"
  val VerifyContentConfKey = "spark.graft.upsert.statsManifest.verifyContent"

  /** Sentinel: caller did not compute a fingerprint — entry matches on
    * (mtime, len) alone. */
  val FpUnchecked: Long = Long.MinValue
  /** Sentinel: fingerprint read failed / not a parquet tail — never
    * matches under verification (conservative: footer fallback). */
  val FpUnreadable: Long = Long.MinValue + 1

  /** One column's footer statistics in physical form, aggregated over
    * the file's row groups. `structOk` = every row group had a usable
    * chunk + statistics (non-null-valued groups may still lack null
    * counts — mirrored by `nulls`=None); `hadNonNull` = some group
    * recorded a non-null value (then `min`/`max` hold the physical
    * extremes for numeric primitives, None for types whose stats the
    * pruner refuses — binary may truncate). Aggregating in the
    * physical domain commutes with [[resolve]]'s decode because every
    * decode step (int→long/double, float→double, timestamp unit
    * rescale) is monotone non-decreasing.
    */
  final case class RawColStats(ptype: String, lta: String, values: Long,
      nulls: Option[Long], hadNonNull: Boolean, structOk: Boolean,
      min: Option[Any], max: Option[Any])

  /** One file's footer statistics, schema-independent: row count, the
    * file's own top-level field names, per-primitive-column raw stats.
    */
  final case class RawFileStats(rows: Long, present: Seq[String],
      cols: Map[String, RawColStats])

  // footer opens observable for tests: the manifest's whole point is
  // that re-planning does NOT open footers
  private[graft] val footerReads = new java.util.concurrent.atomic.AtomicLong()

  // ——— raw extraction (the only footer-opening code path) ———

  /** Read `file`'s footer into [[RawFileStats]] — physical values
    * only, no schema in sight. Throws on unreadable footers (callers
    * degrade to "no stats").
    */
  def readRaw(file: Path, conf: Configuration): RawFileStats = {
    footerReads.incrementAndGet()
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val fileSchema = reader.getFooter.getFileMetaData.getSchema
      val present = (0 until fileSchema.getFieldCount)
        .map(i => fileSchema.getFieldName(i))
      val blocks = reader.getFooter.getBlocks
      var rows = 0L
      locally {
        val it = blocks.iterator()
        while (it.hasNext) rows += it.next().getRowCount
      }
      val cols = Map.newBuilder[String, RawColStats]
      (0 until fileSchema.getFieldCount).foreach { fi =>
        val n = fileSchema.getFieldName(fi)
        val t = fileSchema.getType(fi)
        if (t.isPrimitive) {
          val prim = t.asPrimitiveType()
          val ptype = prim.getPrimitiveTypeName.name()
          val lta = ltaTag(prim.getLogicalTypeAnnotation)
          val numeric = ptype == "INT32" || ptype == "INT64" ||
            ptype == "FLOAT" || ptype == "DOUBLE"
          var mn: Option[Any] = None
          var mx: Option[Any] = None
          var nulls: Option[Long] = Some(0L)
          var values = 0L
          var hadNonNull = false
          var structOk = true
          val it = blocks.iterator()
          while (it.hasNext) {
            // chunk by COLUMN PATH, never field index — leaf order
            // diverges from field order next to nested groups
            val chunks = it.next().getColumns
            var chunk: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData = null
            var i = 0
            while (i < chunks.size() && chunk == null) {
              val cc = chunks.get(i)
              if (cc.getPath.size() == 1 && cc.getPath.toDotString == n) chunk = cc
              i += 1
            }
            if (chunk == null) { structOk = false; nulls = None }
            else {
              values += chunk.getValueCount
              val s = chunk.getStatistics
              if (s == null || s.isEmpty) { structOk = false; nulls = None }
              else {
                nulls = (nulls, s.isNumNullsSet) match {
                  case (Some(acc), true) => Some(acc + s.getNumNulls)
                  case _ => None
                }
                if (s.hasNonNullValue) {
                  hadNonNull = true
                  if (numeric) {
                    val lo = s.genericGetMin().asInstanceOf[Any]
                    val hi = s.genericGetMax().asInstanceOf[Any]
                    mn = Some(mn.fold(lo)(a => if (physCmp(ptype, a, lo) <= 0) a else lo))
                    mx = Some(mx.fold(hi)(a => if (physCmp(ptype, a, hi) >= 0) a else hi))
                  }
                } else if (!s.isNumNullsSet || s.getNumNulls != chunk.getValueCount) {
                  structOk = false // cannot prove the chunk is all-null
                }
              }
            }
          }
          cols += n -> RawColStats(ptype, lta, values, nulls, hadNonNull,
            structOk, mn, mx)
        }
      }
      RawFileStats(rows, present, cols.result())
    } finally reader.close()
  }

  private def ltaTag(a: LogicalTypeAnnotation): String = a match {
    case null => "-"
    case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation => "date"
    case t: TimestampLogicalTypeAnnotation => t.getUnit match {
      case LogicalTypeAnnotation.TimeUnit.MILLIS => "ts_millis"
      case LogicalTypeAnnotation.TimeUnit.NANOS => "ts_nanos"
      case _ => "ts_micros"
    }
    case _ => "other"
  }

  private def physCmp(ptype: String, a: Any, b: Any): Int = ptype match {
    case "INT32" => java.lang.Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
    case "INT64" => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case "FLOAT" => java.lang.Float.compare(a.asInstanceOf[Float], b.asInstanceOf[Float])
    case "DOUBLE" => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case other => throw new IllegalStateException(s"non-numeric physical type $other")
  }

  // ——— resolve: RawFileStats → FileStats under the CURRENT schema ———

  /** Decode a raw physical stat value into the table column type over
    * the serialized (ptype, lta) pair, including the widening
    * promotions and the date-annotation gate — THE decode matrix for
    * every stats consumer (the skipping pruner AND the aggregate
    * pushdown resolve through here, so they cannot answer
    * differently). None = this (physical, table) pairing has no sound
    * stat comparison (the column keeps "no stats").
    */
  private def decodeRaw(ptype: String, lta: String, v: Any,
      dt: DataType): Option[Any] = (ptype, dt) match {
    // "other"-annotated ints (UINT32 etc. in external files) are
    // excluded everywhere: the reader decodes them UNSIGNED while the
    // raw stat is the signed reinterpretation — a negative "max" would
    // wrongly prune files whose unsigned values all match
    case ("INT32", IntegerType | DateType) if lta == "-" || lta == "date" =>
      Some(v.asInstanceOf[Int])
    case ("INT64", LongType) if lta != "other" => Some(v.asInstanceOf[Long])
    case ("INT64", TimestampType | TimestampNTZType) =>
      val x = v.asInstanceOf[Long]
      lta match {
        case "ts_millis" => Some(x * 1000L)
        case "ts_nanos" => Some(x / 1000L)
        case "ts_micros" | "-" => Some(x) // micros or plain INT64 (our writer)
        // "other" (UINT_64, TIME, …): the signed reinterpretation of
        // the raw stat is NOT epoch micros — the same exclusion the
        // LongType arm applies; a wrapped-negative "max" would wrongly
        // prune files whose actual values match
        case _ => None
      }
    case ("FLOAT", FloatType) => Some(v.asInstanceOf[Float])
    case ("DOUBLE", DoubleType) => Some(v.asInstanceOf[Double])
    // widened-table promotions, gated off date-annotated INT32 exactly
    // like the reader's value promotion
    case ("INT32", LongType | DoubleType) if lta == "-" =>
      val x = v.asInstanceOf[Int]
      Some(if (dt == LongType) x.toLong else x.toDouble)
    case ("FLOAT", DoubleType) => Some(v.asInstanceOf[Float].toDouble)
    case _ => None
  }

  /** Resolve raw per-file statistics against the current table schema
    * and rename lineage — THE conversion both the live footer path and
    * the manifest path share, so the two can never prune differently.
    * Mirrors the all-null/missing-chunk conservatism of the original
    * footer walk: an undecodable pairing or incomplete group
    * statistics yield `decodable = false` (never prunes).
    */
  def resolve(raw: RawFileStats, schema: StructType,
      aliases: Map[String, List[String]]): FileStats = {
    val rawPresent = raw.present.toSet
    // rename lineage: newest alias first, like the readers; `present`
    // gains the CURRENT name so value predicates never treat a
    // pre-rename column as all-null
    def resolveName(c: String): Option[String] =
      rawPresent.find(_.equalsIgnoreCase(c)).orElse(
        aliases.getOrElse(c, Nil).iterator
          .flatMap(h => rawPresent.find(_.equalsIgnoreCase(h)))
          .nextOption())
    val presentResolved = rawPresent ++
      schema.fieldNames.filter(n =>
        resolveName(n.toLowerCase(Locale.ROOT)).isDefined)
    val out = Map.newBuilder[String, ColStats]
    schema.fields.map(_.name.toLowerCase(Locale.ROOT)).foreach { c =>
      val name = resolveName(c)
      val dt = schema.fields.find(_.name.equalsIgnoreCase(c)).map(_.dataType)
      (name, dt) match {
        case (Some(n), Some(d)) =>
          raw.cols.get(n) match {
            case None =>
              // a GROUP field under this name: no single leaf chunk —
              // "no stats", never prunes
              out += c -> ColStats(None, None, None, 0L, decodable = false)
            case Some(rc) if !rc.structOk =>
              out += c -> ColStats(None, None, rc.nulls, rc.values, decodable = false)
            case Some(rc) if !rc.hadNonNull =>
              // every group proven all-null (structOk): min/max vacuous
              out += c -> ColStats(None, None, rc.nulls, rc.values, decodable = true)
            case Some(rc) =>
              val lo = rc.min.flatMap(decodeRaw(rc.ptype, rc.lta, _, d))
              val hi = rc.max.flatMap(decodeRaw(rc.ptype, rc.lta, _, d))
              (lo, hi) match {
                case (Some(a), Some(b)) =>
                  out += c -> ColStats(Some(a), Some(b), rc.nulls, rc.values,
                    decodable = true)
                case _ =>
                  out += c -> ColStats(None, None, rc.nulls, rc.values,
                    decodable = false)
              }
          }
        case _ => // column absent from the file: recorded via `present`
      }
    }
    FileStats(out.result(), presentResolved, Some(raw.rows))
  }

  // ——— manifest persistence ———

  private[graft] def manifestEnabled: Boolean =
    scala.util.Try(SparkSession.active.conf
      .get(EnabledConfKey, "true")).getOrElse("true") == "true"

  private[graft] def racyWindowMillis: Long =
    scala.util.Try(SparkSession.active.conf
      .get(RacyWindowConfKey, "2000").toLong).getOrElse(2000L)

  private[graft] def verifyContent: Boolean =
    scala.util.Try(SparkSession.active.conf
      .get(VerifyContentConfKey, "false")).getOrElse("false") == "true"

  /** FNV-1a-64 over the file's serialized parquet footer bytes (located
    * via the standard 8-byte tail: little-endian footer length +
    * "PAR1" magic). The footer embeds every row-group's statistics, so
    * any min/max/null-count/row-count change changes the hash —
    * exactly the staleness that matters to the pruner. Returns
    * [[FpUnreadable]] on anything that is not a well-formed parquet
    * tail or on I/O failure.
    */
  // fingerprint tail reads observable for tests: sink-written files on
  // the default path must pay ZERO of these once their entries are
  // ripe and healed (only foreign/flagged entries verify)
  private[graft] val fpReads = new java.util.concurrent.atomic.AtomicLong()

  def contentFingerprint(fs: FileSystem, file: Path, len: Long): Long = {
    if (len < 12) return FpUnreadable
    fpReads.incrementAndGet()
    try {
      val in = fs.open(file)
      try {
        val tail = new Array[Byte](8)
        in.readFully(len - 8, tail, 0, 8)
        if (!(tail(4) == 'P' && tail(5) == 'A' && tail(6) == 'R' && tail(7) == '1'))
          return FpUnreadable
        val flen = (tail(0) & 0xff) | ((tail(1) & 0xff) << 8) |
          ((tail(2) & 0xff) << 16) | ((tail(3) & 0xff) << 24)
        if (flen <= 0 || flen > len - 12) return FpUnreadable
        val foot = new Array[Byte](flen)
        in.readFully(len - 8 - flen, foot, 0, flen)
        var h = 0xcbf29ce484222325L
        var i = 0
        while (i < flen) { h ^= (foot(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
        h ^= flen.toLong
        // keep clear of the two sentinels (astronomically unlikely)
        if (h == FpUnchecked || h == FpUnreadable) h + 2 else h
      } finally in.close()
    } catch { case _: java.io.IOException => FpUnreadable }
  }

  /** `verifyOnRead`: the entry was persisted while its mtime tick was
    * still OPEN on the storage clock (see [[flushDir]]) — a same-tick
    * in-place rewrite preserving (name, mtime, len) could have landed
    * after the footer read, so a DEFAULT-mode lookup must re-verify
    * the stored footer fingerprint (one positioned tail read) before
    * serving it. Cleared by self-heal: a successful verified serve
    * re-records the entry, and the next flush persists it ripe and
    * unflagged.
    */
  private final case class Entry(mtime: Long, len: Long, fp: Long,
    raw: RawFileStats, verifyOnRead: Boolean = false)

  /** Files the sink itself writes are `part-*`; anything else the
    * format reads (externally added `*.parquet`) is FOREIGN — not
    * under the sink's exclusive authorship, so default-mode planning
    * verifies its manifest entries' footer fingerprints on every
    * serve (an external rewriter that restores mtime AND length
    * defeats the (mtime, len) key; sink-written files stay on the
    * cheap path because the sink never rewrites in place).
    */
  private[graft] def sinkWrittenName(n: String): Boolean = n.startsWith("part-")

  private def fpIsReal(fp: Long): Boolean =
    fp != FpUnchecked && fp != FpUnreadable
  private final case class DirManifest(mtime: Long, len: Long,
    entries: Map[String, Entry])

  // parsed-manifest cache, bounded LRU over DIRECTORIES (a 100 TB
  // table has many partitions; each parsed manifest is small). `None`
  // = checked and absent on disk — re-checked after CheckTtlMillis so
  // a manifest another driver writes is eventually picked up.
  private val MaxDirCacheEntries = 8192
  private val CheckTtlMillis = 60000L
  private object dirCacheLock
  private final case class CacheSlot(checkedAt: Long, manifest: Option[DirManifest])
  private val dirCache =
    new java.util.LinkedHashMap[String, CacheSlot](256, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, CacheSlot]): Boolean =
        size() > MaxDirCacheEntries
    }
  private def cacheGet(dir: String): Option[CacheSlot] =
    dirCacheLock.synchronized(Option(dirCache.get(dir)))
  private def cachePut(dir: String, slot: CacheSlot): Unit =
    dirCacheLock.synchronized { dirCache.put(dir, slot); () }
  private[graft] def clearCachesForTesting(): Unit = {
    dirCacheLock.synchronized(dirCache.clear())
    pending.clear()
  }

  // manifest-status probes (exists/getFileStatus RPCs) observable for
  // tests: an N-new-file wave must cost ONE probe per directory per
  // TTL, not one (or two) per file
  private[graft] val manifestProbes = new java.util.concurrent.atomic.AtomicLong()

  /** The manifest-served raw stats of `dir/name` at (mtime, len), or
    * None (absent, stale, unparseable, disabled) — the caller then
    * reads the footer. At most one manifest status PROBE per directory
    * per [[CheckTtlMillis]]: a recently-checked cached manifest (or
    * cached absence) that simply lacks the file is a genuine miss and
    * re-probes nothing, so an N-new-file wave costs one RPC per
    * directory, not N. (The flip side: a manifest another driver
    * writes is picked up within the TTL, not instantly — it is a
    * cache either way.)
    *
    * `expectFp`: [[FpUnchecked]] matches on (mtime, len) alone;
    * otherwise the entry's stored footer fingerprint must equal it
    * (content-verified mode — catches in-place rewrites that preserve
    * name, length and mtime). `enabled` lets planning-thread callers
    * pass a conf snapshot (pool threads must not consult session
    * state — see [[UpsertDataSkipping]]'s ManifestCtx).
    */
  /** One canonical cache key per directory: planning paths hand in
    * FULLY-QUALIFIED paths (listStatus/globStatus results) while sink
    * rewrite paths build plain `new Path(tablePath + ...)` strings —
    * without qualification an `invalidate` from the sink would MISS
    * the qualified slot a planner cached and the net would be a no-op.
    */
  private def keyOf(fs: FileSystem, dir: Path): String =
    try fs.makeQualified(dir).toString
    catch { case _: IllegalArgumentException => dir.toString }

  def lookup(fs: FileSystem, dir: Path, name: String, mtime: Long,
      len: Long, expectFp: Long = FpUnchecked,
      enabled: Boolean = manifestEnabled,
      racyWindow: Long = racyWindowMillis): Option[RawFileStats] = {
    if (!enabled) return None
    val key = keyOf(fs, dir)
    def entryOf(m: Option[DirManifest]): Option[RawFileStats] =
      m.flatMap(_.entries.get(name))
        .filter(e => e.mtime == mtime && e.len == len &&
          (expectFp == FpUnchecked ||
            (expectFp != FpUnreadable && e.fp == expectFp)))
        .filter { e =>
          // DEFAULT-mode content verification where (mtime, len) alone
          // is not trusted: entries persisted inside an open mtime tick
          // (verifyOnRead) and entries for FOREIGN files (externally
          // added — an external rewriter can restore mtime and length).
          // One positioned tail read; callers that already verified
          // (expectFp real) skip it. An entry whose stored fp is a
          // sentinel can never verify — refuse it, the footer re-read
          // records a real one.
          if (expectFp != FpUnchecked ||
            !(e.verifyOnRead || !sinkWrittenName(name))) true
          else if (!fpIsReal(e.fp)) false
          else if (contentFingerprint(fs, new Path(dir, name), len) == e.fp) {
            // self-heal a racy-persisted entry: re-record it so the
            // next flush persists it unflagged and later passes skip
            // the tail read — but ONLY once its mtime tick has closed.
            // Healing inside the open tick would re-persist the entry
            // STILL flagged (byte-identical manifest) on every
            // planning pass — a streaming query re-planning its dim
            // side per micro-batch would rewrite every manifest every
            // batch for nothing. Foreign entries stay verified-by-name
            // — no heal to record.
            if (e.verifyOnRead &&
              storageNowEstimate(fs) - mtime >= racyWindow)
              recordFresh(fs, dir, name, mtime, len, e.raw, e.fp, enabled)
            true
          } else false
        }
        .map(_.raw)
    val now = System.currentTimeMillis()
    val cached = cacheGet(key)
    cached.flatMap(s => entryOf(s.manifest)) match {
      case some @ Some(_) => some
      case None =>
        // miss in cache: is a newer (or first) manifest on disk?
        // Probe at most once per TTL regardless of whether the cached
        // state is "absent" or "present but lacks this file".
        if (cached.exists(s => now - s.checkedAt < CheckTtlMillis))
          return None // recently probed: genuine miss
        val mfPath = new Path(dir, ManifestFileName)
        manifestProbes.incrementAndGet()
        val st = try Some(fs.getFileStatus(mfPath))
        catch {
          case _: java.io.FileNotFoundException => None
          case _: java.io.IOException => None
        }
        st match {
          case None =>
            cachePut(key, CacheSlot(now, None)); None
          case Some(s)
              if cached.exists(_.manifest.exists(m =>
                m.mtime == s.getModificationTime && m.len == s.getLen)) =>
            // cached copy IS current: refresh the probe clock so the
            // rest of this wave skips the RPC, then a genuine miss
            cachePut(key, CacheSlot(now, cached.get.manifest))
            None
          case Some(s) =>
            val loaded =
              try Some(parseManifest(fs, mfPath, s.getModificationTime, s.getLen))
              catch { case _: Exception => None }
            cachePut(key, CacheSlot(now, loaded))
            entryOf(loaded)
        }
    }
  }

  /** Exact row count of `files` from MANIFESTS ALONE — one directory
    * listing per parent dir, zero footer opens, and NO fallback: None
    * the moment any file lacks a current manifest entry. This is the
    * costing path for file sets too large for a footer storm
    * ([[UpsertTableSource.MaxStatFooterFiles]]): after the first
    * planning pass persists the manifests, a million-file table costs
    * joins (broadcast decisions!) from per-directory metadata reads.
    */
  def manifestRowCount(fs: FileSystem, files: Seq[Path]): Option[Long] = {
    if (!manifestEnabled || files.isEmpty) return None
    var total = 0L
    files.groupBy(_.getParent).foreach { case (dir, inDir) =>
      val statuses =
        try fs.listStatus(dir).iterator.map(s => s.getPath.getName -> s).toMap
        catch { case _: java.io.IOException => return None }
      inDir.foreach { f =>
        val st = statuses.getOrElse(f.getName, return None)
        total += lookup(fs, dir, f.getName, st.getModificationTime, st.getLen)
          .map(_.rows).getOrElse(return None)
      }
    }
    Some(total)
  }

  // footer-read results awaiting write-back, per directory
  private val pending = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.ConcurrentHashMap[String, Entry]]()

  /** Record a fresh footer read for later [[flush]] into its
    * directory's manifest. No I/O here — safe from pool threads.
    */
  def recordFresh(fs: FileSystem, dir: Path, name: String, mtime: Long,
      len: Long, raw: RawFileStats, fp: Long = FpUnreadable,
      enabled: Boolean = manifestEnabled): Unit = {
    if (!enabled) return
    pending.computeIfAbsent(keyOf(fs, dir),
      _ => new java.util.concurrent.ConcurrentHashMap[String, Entry]())
      .put(name, Entry(mtime, len, fp, raw))
  }

  /** Drop every cached/pending/persisted statistic for `dir` — called
    * by sink paths that overwrite or restore a partition directory, so
    * neither this JVM's caches nor a leftover on-disk manifest can
    * serve statistics recorded against the replaced files.
    */
  def invalidate(fs: FileSystem, dir: Path): Unit = {
    val key = keyOf(fs, dir)
    dirCacheLock.synchronized { dirCache.remove(key); () }
    pending.remove(key)
    try {
      val mfPath = new Path(dir, ManifestFileName)
      fs.delete(mfPath, false)
      ()
    } catch { case _: java.io.IOException => }
  }

  /** Merge every pending footer-read result into its directory's
    * manifest (tmp + delete + rename — concurrent readers see
    * old-complete or absent, never truncated) and prune entries whose
    * files no longer exist. Failures are swallowed but RE-OFFERED to
    * `pending` (newer recordings win), so a transient I/O error delays
    * persistence instead of silently dropping it forever. Entries
    * still inside the racy window (file mtime within
    * [[racyWindowMillis]] of now — an in-place rewrite could still
    * land the same mtime tick) are retained for a later flush, never
    * persisted. Each directory is flushed through ITS OWN FileSystem
    * (resolved from the caller's Configuration), so one flush call
    * serves tables on several schemes.
    */
  def flush(fs: FileSystem): Unit = {
    if (!manifestEnabled) return
    val dirs = pending.keySet().toArray(Array.empty[String])
    dirs.foreach { d =>
      val fresh = pending.remove(d)
      if (fresh != null && !fresh.isEmpty) {
        def reoffer(m: java.util.concurrent.ConcurrentHashMap[String, Entry]): Unit =
          if (m != null && !m.isEmpty) {
            val slot = pending.computeIfAbsent(d,
              _ => new java.util.concurrent.ConcurrentHashMap[String, Entry]())
            // putIfAbsent: a recording that raced in since we drained
            // is newer than what we are putting back
            m.forEach { (n, e) => slot.putIfAbsent(n, e); () }
          }
        // the ripe/racy split happens INSIDE flushDir against the
        // STORAGE clock (probed from the tmp file's own mtime):
        // comparing the driver's wall clock to storage mtimes would
        // reopen the same-tick hole whenever the two clocks disagree
        // by more than the window. Racy entries come back for a later
        // flush. One dir's failure (transient I/O, caller's fs on the
        // wrong scheme) must not stop the others — and must not LOSE
        // the batch; a directory DELETED under us (overwrite/drop) is
        // the one terminal case: its entries can never flush.
        try reoffer(flushDir(fs, d, fresh))
        catch {
          case _: java.io.FileNotFoundException =>
          case scala.util.control.NonFatal(_) => reoffer(fresh)
        }
      }
    }
  }

  /** Per-filesystem storage-clock offset (`storage now − driver now`),
    * learned from each [[flushDir]] tmp probe and refreshed on every
    * flush. Lets OTHER racy-window guards (the in-JVM stats cache)
    * compare against an estimate of the storage clock instead of the
    * raw driver wall clock — the comparison flushDir itself rejects as
    * unsound. Before the first flush on a given filesystem the offset
    * is unknown (0 = assume clocks agree): that first planning pass
    * carries the documented skew residual, and every pass after the
    * pass that flushed is sound.
    */
  private val clockOffsets =
    new java.util.concurrent.ConcurrentHashMap[String, Long]()

  private def fsClockKey(fs: FileSystem): String = fs.getUri.toString

  // private[graft] so the spec can inject a skewed offset deterministically
  private[graft] def recordClockOffset(fs: FileSystem, storageNow: Long): Unit = {
    clockOffsets.put(fsClockKey(fs), storageNow - System.currentTimeMillis())
    ()
  }

  /** Best estimate of "now" on `fs`'s storage clock: driver wall clock
    * plus the last probed offset (0 until a flush has probed this fs).
    */
  private[graft] def storageNowEstimate(fs: FileSystem): Long =
    System.currentTimeMillis() + clockOffsets.getOrDefault(fsClockKey(fs), 0L)

  /** Persist `fresh`'s RIPE entries into the directory manifest and
    * return the RACY remainder (entries whose mtime tick is still open
    * on the STORAGE clock) for the caller to re-offer.
    */
  private def flushDir(callerFs: FileSystem, d: String,
      fresh: java.util.concurrent.ConcurrentHashMap[String, Entry])
      : java.util.concurrent.ConcurrentHashMap[String, Entry] = {
    val dir = new Path(d)
    // the directory's OWN filesystem: `pending` may hold directories
    // from tables on a different scheme than the caller's fs
    val fs = dir.getFileSystem(callerFs.getConf)
    // a directory deleted under us (DROP TABLE, overwrite) is the
    // terminal case the caller drops entries for — and it must be
    // checked EXPLICITLY: Hadoop create() makes parent directories, so
    // the tmp write below would otherwise RESURRECT the deleted
    // partition dir (tableExists sees a dir containing '=' again and
    // CREATE TABLE starts refusing). A delete racing in after this
    // probe still resurrects — the probe closes the systematic path
    // (pending entries surviving a DROP), not every interleaving.
    if (!fs.exists(dir))
      throw new java.io.FileNotFoundException(
        s"graft-upsert stats manifest: directory deleted under flush: $dir")
    val mfPath = new Path(dir, ManifestFileName)
    val tmp = new Path(dir, s"$ManifestFileName.tmp.${java.util.UUID.randomUUID()}")
    // probe the storage clock: the tmp's own mtime IS "storage now".
    // Git's racily-clean trick compares two mtimes stamped by ONE
    // clock; comparing the driver's wall clock against storage mtimes
    // would mis-classify whenever the clocks disagree by more than the
    // window (skew ahead: persist inside an open tick = the staleness
    // hole; skew behind: entries never ripen).
    fs.create(tmp, true).close()
    // any failure between here and the rename must not ORPHAN the
    // uuid-named tmp: nothing else ever matches or cleans those names,
    // so a long-lived driver with intermittent I/O errors would
    // accumulate one per failed flush per directory forever
    try flushDirBody(fs, dir, mfPath, tmp, d, fresh)
    catch {
      case t: Throwable =>
        scala.util.Try(fs.delete(tmp, false))
        throw t
    }
  }

  private def flushDirBody(fs: FileSystem, dir: Path, mfPath: Path,
      tmp: Path, d: String,
      fresh: java.util.concurrent.ConcurrentHashMap[String, Entry])
      : java.util.concurrent.ConcurrentHashMap[String, Entry] = {
    val storageNow =
      try {
        val t = fs.getFileStatus(tmp).getModificationTime
        recordClockOffset(fs, t)
        t
      }
      catch { case _: java.io.IOException => System.currentTimeMillis() }
    val window = racyWindowMillis
    val ripe = new java.util.concurrent.ConcurrentHashMap[String, Entry]()
    val racy = new java.util.concurrent.ConcurrentHashMap[String, Entry]()
    fresh.forEach { (n, e) =>
      if (storageNow - e.mtime >= window) ripe.put(n, e)
      else if (fpIsReal(e.fp))
        // open-tick entry WITH a real footer fingerprint: persist it
        // NOW, flagged verifyOnRead — a same-tick in-place rewrite is
        // caught by the fingerprint check on the next default-mode
        // lookup instead of by withholding the entry. This is what
        // lets maintenance paths warm manifests without sleeping out
        // the tick (the fp was read BEFORE the footer parse, so a
        // rewrite racing the recording yields a MISmatch, never a
        // false certify). Entries without a real fp (manifests were
        // off at record time, unreadable tail) keep the old net:
        // retained for a later flush, never persisted inside the tick.
        ripe.put(n, e.copy(verifyOnRead = true))
      else racy.put(n, e)
      ()
    }
    if (ripe.isEmpty) { fs.delete(tmp, false); return racy }
    val existing: Map[String, Entry] =
      try {
        val st = fs.getFileStatus(mfPath)
        parseManifest(fs, mfPath, st.getModificationTime, st.getLen).entries
      } catch { case scala.util.control.NonFatal(_) => Map.empty }
    val freshMap: Map[String, Entry] = {
      import scala.collection.JavaConverters._
      ripe.asScala.toMap
    }
    // prune to live files: a compacted-away file's entry can never
    // match again and would only grow the manifest
    val live: Set[String] = fs.listStatus(dir).iterator
      .map(_.getPath.getName).filter(dataFileName).toSet
    val merged = (existing ++ freshMap).filter { case (n, _) => live.contains(n) }
    if (merged.isEmpty) { fs.delete(tmp, false); return racy }
    // byte-identical rewrite elision: repeated planning passes over a
    // just-written table re-record the same (flagged) entries each
    // pass — persisting the same content again costs a tmp write +
    // rename + cache churn per directory per pass for nothing
    if (merged == existing) { fs.delete(tmp, false); return racy }
    val out = fs.create(tmp, true)
    try out.write(render(merged).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(mfPath)) fs.delete(mfPath, false)
    if (!fs.rename(tmp, mfPath)) { fs.delete(tmp, false); return racy }
    // the new manifest supersedes whatever this JVM cached
    val st = fs.getFileStatus(mfPath)
    cachePut(d, CacheSlot(System.currentTimeMillis(),
      Some(DirManifest(st.getModificationTime, st.getLen, merged))))
    racy
  }

  /** Names eligible for manifest entries: task-written `part-*` files
    * plus externally added parquet (the format reads both). Sidecars
    * (`_`-prefixed) and hidden files never qualify.
    */
  private def dataFileName(n: String): Boolean =
    !n.startsWith("_") && !n.startsWith(".") &&
      (n.startsWith("part-") || n.toLowerCase(Locale.ROOT).endsWith(".parquet"))

  // ——— wire format (line-oriented, UTF-8, URL-escaped names) ———
  //
  //   graft-stats v3
  //   f <name> <mtime> <len> <fp> <rows> <verifyOnRead 0|1>
  //   p <name1> <name2> ...
  //   c <name> <ptype> <lta> <values> <nulls|-> <hadNonNull> <structOk> <min|-> <max|->
  //
  // min/max encode per ptype: INT32/INT64 decimal, FLOAT/DOUBLE via
  // Float/Double.toString (exact round-trip, NaN/Infinity included).
  // v2 (no verifyOnRead flag on the f line — written when open-tick
  // entries were withheld from persistence entirely) still parses,
  // every entry unflagged: exactly what its delayed-persist semantics
  // guaranteed. v1 (no per-entry footer fingerprint, written before
  // the racy-write guard existed) is deliberately NOT parsed: its
  // entries may predate the staleness guarantees, and discarding a
  // cache only costs one footer pass.

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  private def renderStat(ptype: String, v: Option[Any]): String = v match {
    case None => "-"
    case Some(x) => ptype match {
      case "INT32" => x.asInstanceOf[Int].toString
      case "INT64" => x.asInstanceOf[Long].toString
      case "FLOAT" => x.asInstanceOf[Float].toString
      case "DOUBLE" => x.asInstanceOf[Double].toString
      case other => throw new IllegalStateException(s"unrenderable ptype $other")
    }
  }

  private def parseStat(ptype: String, s: String): Option[Any] =
    if (s == "-") None
    else Some(ptype match {
      case "INT32" => s.toInt
      case "INT64" => s.toLong
      case "FLOAT" => java.lang.Float.parseFloat(s)
      case "DOUBLE" => java.lang.Double.parseDouble(s)
      case other => throw new IllegalStateException(s"unparseable ptype $other")
    })

  private def render(entries: Map[String, Entry]): String = {
    val sb = new StringBuilder("graft-stats v3\n")
    entries.toSeq.sortBy(_._1).foreach { case (name, e) =>
      sb.append(s"f ${enc(name)} ${e.mtime} ${e.len} ${e.fp} ${e.raw.rows} " +
        s"${if (e.verifyOnRead) 1 else 0}\n")
      sb.append("p").append(e.raw.present.map(n => " " + enc(n)).mkString).append('\n')
      e.raw.cols.toSeq.sortBy(_._1).foreach { case (cn, rc) =>
        sb.append(s"c ${enc(cn)} ${rc.ptype} ${rc.lta} ${rc.values} " +
          s"${rc.nulls.map(_.toString).getOrElse("-")} " +
          s"${if (rc.hadNonNull) 1 else 0} ${if (rc.structOk) 1 else 0} " +
          s"${renderStat(rc.ptype, rc.min)} ${renderStat(rc.ptype, rc.max)}\n")
      }
    }
    sb.result()
  }

  private def parseManifest(fs: FileSystem, mfPath: Path, mtime: Long,
      len: Long): DirManifest = {
    val in = fs.open(mfPath)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val lines = text.split('\n').iterator.filter(_.nonEmpty)
    // v3 adds the per-entry verifyOnRead flag; v2 (written before
    // open-tick entries could persist at all) parses with every entry
    // unflagged, which is exactly what v2's delayed-persist semantics
    // guaranteed. v1 stays unparsed (predates the staleness guards).
    require(lines.hasNext, s"empty stats manifest $mfPath")
    val version = lines.next() match {
      case "graft-stats v3" => 3
      case "graft-stats v2" => 2
      case other => throw new IllegalStateException(
        s"unknown stats-manifest version '$other' in $mfPath")
    }
    val entries = Map.newBuilder[String, Entry]
    // name, mtime, len, fp, rows, verifyOnRead
    var cur: (String, Long, Long, Long, Long, Boolean) = null
    var present = Seq.empty[String]
    var cols = Map.newBuilder[String, RawColStats]
    def close(): Unit = if (cur != null) {
      entries += cur._1 -> Entry(cur._2, cur._3, cur._4,
        RawFileStats(cur._5, present, cols.result()), cur._6)
      cur = null
    }
    lines.foreach { line =>
      val parts = line.split(' ')
      parts(0) match {
        case "f" =>
          close()
          cur = (dec(parts(1)), parts(2).toLong, parts(3).toLong,
            parts(4).toLong, parts(5).toLong,
            version >= 3 && parts(6) == "1")
          present = Seq.empty
          cols = Map.newBuilder[String, RawColStats]
        case "p" => present = parts.iterator.drop(1).map(dec).toSeq
        case "c" =>
          val ptype = parts(2)
          cols += dec(parts(1)) -> RawColStats(ptype, parts(3),
            parts(4).toLong,
            if (parts(5) == "-") None else Some(parts(5).toLong),
            parts(6) == "1", parts(7) == "1",
            parseStat(ptype, parts(8)), parseStat(ptype, parts(9)))
        case other => throw new IllegalStateException(
          s"bad stats-manifest line kind '$other' in $mfPath")
      }
    }
    close()
    DirManifest(mtime, len, entries.result())
  }
}
