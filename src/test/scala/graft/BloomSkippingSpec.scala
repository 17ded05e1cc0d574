package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._

import graft.io.{ParquetUpsertSink, UpsertTableSource}

/** Record-key BLOOM skipping and filter-aware scan STATISTICS — the
  * two planning features that make point lookups and dimension joins
  * scale:
  *
  *  - the sink writes standard parquet bloom filters on its record-key
  *    columns, and the scan's planner probes them for equality
  *    predicates, pruning FILES min/max ranges cannot (a
  *    high-cardinality key spans every file's [min, max]; only a
  *    membership structure proves absence) — the Hudi bloom-index
  *    shape, stored in the standard footer instead of a sidecar;
  *  - the scan reports post-pruning sizeInBytes/numRows to Catalyst
  *    ([[org.apache.spark.sql.connector.read.SupportsReportStatistics]]),
  *    so a small (or selectively-filtered) graft-upsert table finally
  *    BROADCASTS instead of costing Long.MaxValue into a shuffle join.
  */
class BloomSkippingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  /** Four partitions, one file each, 100 string-keyed rows per file.
    * Keys are "doc_<n>" with n dense over the whole table, so every
    * file's binary [min, max] (if it were consulted) overlaps —
    * nothing but the blooms can prune an equality on `id`.
    */
  private def docTable(prefix: String): String = {
    val dir = tmp(prefix)
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
    // id endings interleave across partitions: p = n % 4
    val rows = (0 until 400).map(n => (f"doc_$n%04d", 1L, n.toLong, s"p${n % 4}"))
    sink.upsert(rows.toDF("id", "seq", "v", "p"), 0)
    dir
  }

  test("the sink writes parquet bloom filters on record-key columns") {
    val dir = docTable("bloomwrite")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val file = fs.listStatus(new Path(s"$dir/p=p0")).map(_.getPath)
      .filter(_.getName.startsWith("part-")).head
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(file, spark.sparkContext.hadoopConfiguration))
    try {
      val block = reader.getFooter.getBlocks.get(0)
      val idChunk = (0 until block.getColumns.size()).map(block.getColumns.get)
        .find(_.getPath.toDotString == "id").get
      val bf = reader.getBloomFilterDataReader(block).readBloomFilter(idChunk)
      assert(bf != null, "no bloom filter written for the record key")
      // non-key data column: no bloom (nothing configured it)
      val vChunk = (0 until block.getColumns.size()).map(block.getColumns.get)
        .find(_.getPath.toDotString == "v").get
      assert(reader.getBloomFilterDataReader(block).readBloomFilter(vChunk) == null)
    } finally reader.close()
  }

  test("string point lookup prunes to the single file holding the key") {
    val dir = docTable("bloompoint")
    val all = spark.read.format("graft-upsert").load(dir)
    assert(all.rdd.getNumPartitions == 4)
    // present key: exactly its file survives (string min/max is never
    // consulted — binary stats may truncate — so this IS the blooms)
    val hit = spark.read.format("graft-upsert").load(dir)
      .where($"id" === "doc_0250")
    assert(hit.rdd.getNumPartitions == 1)
    assert(hit.select("v").as[Long].collect().toSeq == Seq(250L))
    // absent key: provably nowhere — zero files planned
    val miss = spark.read.format("graft-upsert").load(dir)
      .where($"id" === "doc_9999")
    assert(miss.rdd.getNumPartitions == 0)
    assert(miss.count() == 0)
    // IN over keys from two files plans two
    val in2 = spark.read.format("graft-upsert").load(dir)
      .where($"id".isin("doc_0013", "doc_0102"))
    assert(in2.rdd.getNumPartitions == 2)
    assert(in2.select("v").as[Long].collect().toSet == Set(13L, 102L))
    // disabled: no file pruning, same answer
    spark.conf.set(UpsertTableSource.DataSkippingConfKey, "false")
    try {
      val off = spark.read.format("graft-upsert").load(dir)
        .where($"id" === "doc_0250")
      assert(off.rdd.getNumPartitions == 4)
      assert(off.select("v").as[Long].collect().toSeq == Seq(250L))
    } finally spark.conf.unset(UpsertTableSource.DataSkippingConfKey)
  }

  test("numeric keys with overlapping ranges prune by bloom where min/max cannot") {
    val dir = tmp("bloomnum")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
    // every file spans [0, 400): id ≡ partition (mod 4), so min/max
    // overlap fully and only the bloom can localize a point lookup
    val rows = (0L until 400L).map(n => (n, 1L, s"p${n % 4}"))
    sink.upsert(rows.toDF("id", "seq", "p"), 0)
    val hit = spark.read.format("graft-upsert").load(dir).where($"id" === 37L)
    assert(hit.rdd.getNumPartitions == 1)
    assert(hit.select("id").as[Long].collect().toSeq == Seq(37L))
    val miss = spark.read.format("graft-upsert").load(dir).where($"id" === 1037L)
    assert(miss.rdd.getNumPartitions == 0)
  }

  test("binary fingerprint point lookup prunes files by bloom") {
    val dir = tmp("bloombin")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(dir))
    // declare the bloom column set up front (the media-dedup shape: a
    // 16-byte payload fingerprint, where min/max can never localize)
    val props = new java.util.Properties()
    props.setProperty("bloomColumns", "fp")
    val out = fs.create(new Path(s"$dir/_table.properties"), true)
    try props.store(out, null) finally out.close()
    def fp(n: Int): Array[Byte] =
      java.security.MessageDigest.getInstance("MD5")
        .digest(BigInt(n).toByteArray)
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
    sink.upsert((0 until 400).map(n => (n.toLong, 1L, fp(n), s"p${n % 4}"))
      .toDF("id", "seq", "fp", "p"), 0)
    val hit = spark.read.format("graft-upsert").load(dir)
      .where($"fp" === lit(fp(37)))
    assert(hit.rdd.getNumPartitions == 1)
    assert(hit.select("id").as[Long].collect().toSeq == Seq(37L))
    val miss = spark.read.format("graft-upsert").load(dir)
      .where($"fp" === lit(fp(4037)))
    assert(miss.rdd.getNumPartitions == 0)
    assert(miss.count() == 0)
  }

  test("bloom columns follow the persisted table property through maintenance writers") {
    val dir = docTable("bloomprops")
    // the write persisted its key list as the bloom column set
    assert(graft.io.GraftUpsertCatalog.tableProps(dir)
      .get("bloomColumns").contains("id"))
    // a maintenance sink constructed WITHOUT key knowledge (SQL
    // DELETE's shape) still blooms the real keys on its rewrite
    val del = ParquetUpsertSink(dir, Seq("_unused"), "_unused", "p")
    del.delete(spark, col("id") === "doc_0000")
    val hit = spark.read.format("graft-upsert").load(dir)
      .where($"id" === "doc_0250")
    assert(hit.rdd.getNumPartitions == 1)
    assert(hit.count() == 1)
  }

  test("scan metrics surface the planning walk: partition, stats, and bloom pruning") {
    val dir = docTable("bloommetrics")
    def scanMetrics(df: org.apache.spark.sql.DataFrame): Map[String, Long] = {
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val node = plan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }.head
      node.metrics.map { case (k, m) => k -> m.value }
    }
    // point lookup: all 4 partitions match, blooms prune 3 of 4 files
    val m1 = scanMetrics(spark.read.format("graft-upsert").load(dir)
      .where($"id" === "doc_0250"))
    assert(m1("candidatePartitions") == 4 && m1("matchedPartitions") == 4)
    assert(m1("candidateFiles") == 4 && m1("bloomPrunedFiles") == 3 &&
      m1("plannedFiles") == 1)
    // partition predicate composes: one dir listed, its single file kept
    val m2 = scanMetrics(spark.read.format("graft-upsert").load(dir)
      .where($"p" === "p1" && $"id" === "doc_0013"))
    assert(m2("matchedPartitions") == 1 && m2("plannedFiles") == 1)
    // numeric range nothing matches: footer min/max prune every file
    val m3 = scanMetrics(spark.read.format("graft-upsert").load(dir)
      .where($"v" > 100000L))
    assert(m3("statsPrunedFiles") == 4 && m3("plannedFiles") == 0)
  }

  test("filter-aware statistics: post-pruning size, and unknown when disabled") {
    val dir = docTable("statsrep")
    def sizeOf(df: org.apache.spark.sql.DataFrame): BigInt =
      df.queryExecution.optimizedPlan.stats.sizeInBytes
    val full = sizeOf(spark.read.format("graft-upsert").load(dir))
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val onDisk = fs.listStatus(new Path(dir))
      .filter(_.getPath.getName.startsWith("p="))
      .flatMap(d => fs.listStatus(d.getPath)).map(_.getLen).sum
    assert(full > 0 && full <= BigInt(onDisk) * 2,
      s"full-scan estimate $full should track the $onDisk on-disk bytes")
    // partition predicate shrinks the estimate to ~1/4
    val pruned = sizeOf(spark.read.format("graft-upsert").load(dir)
      .where($"p" === "p1"))
    assert(pruned < full, s"pruned estimate $pruned should be < full $full")
    // a bloom-prunable point lookup on an ABSENT key estimates zero
    val none = sizeOf(spark.read.format("graft-upsert").load(dir)
      .where($"id" === "doc_9999"))
    assert(none <= 1, s"provably-empty scan should estimate ~0 bytes, got $none")
    // switched off: back to the unknowable default (never broadcasts)
    spark.conf.set(UpsertTableSource.ReportStatsConfKey, "false")
    try assert(sizeOf(spark.read.format("graft-upsert").load(dir)) > BigInt(onDisk) * 1000)
    finally spark.conf.unset(UpsertTableSource.ReportStatsConfKey)
  }

  test("reported statistics flip a dimension join to broadcast") {
    val dir = docTable("statsbhj")
    // big enough that the FACT side never broadcasts (the flip under
    // test is the dim side's estimate, not Spark picking the other one)
    val fact = spark.range(0, 3000000)
      .select(concat(lit("doc_"), format_string("%04d", ($"id" % 400))).as("id"),
        ($"id" * 3).as("m"))
    def joined = fact.join(
      spark.read.format("graft-upsert").load(dir).select("id", "v"), "id")
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
    // static planner decision (AQE off isolates it): with reported
    // stats the 4-file dim is far under the broadcast threshold
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      assert(planOf(joined).contains("BroadcastHashJoin"),
        "reported stats should let the dim side broadcast")
      spark.conf.set(UpsertTableSource.ReportStatsConfKey, "false")
      try {
        val p = planOf(joined)
        assert(!p.contains("BroadcastHashJoin") && p.contains("SortMergeJoin"),
          "without stats the relation costs Long.MaxValue and must shuffle")
      } finally spark.conf.unset(UpsertTableSource.ReportStatsConfKey)
      // and the broadcast answer matches the shuffle answer
      val a = joined.agg(sum($"m" * $"v")).as[Long].head()
      spark.conf.set(UpsertTableSource.ReportStatsConfKey, "false")
      val b = try joined.agg(sum($"m" * $"v")).as[Long].head()
        finally spark.conf.unset(UpsertTableSource.ReportStatsConfKey)
      assert(a == b)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }
}
