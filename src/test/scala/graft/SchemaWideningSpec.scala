package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.io.{ParquetUpsertSink, SchemaWidening}

/** Exact type widening as metadata-only schema evolution: a batch (or
  * ALTER TABLE) may promote a column int→long / float→double without
  * rewriting the files already on disk — readers promote the narrow
  * physical values — while every LOSSY change fails loudly instead of
  * falling through to union type-coercion's silent common types.
  */
class SchemaWideningSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  private def fsOf(dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("the lattice admits exactly the exact promotions") {
    assert(SchemaWidening.widen(IntegerType, LongType).contains(LongType))
    assert(SchemaWidening.widen(LongType, IntegerType).contains(LongType))
    assert(SchemaWidening.widen(ByteType, ShortType).contains(ShortType))
    assert(SchemaWidening.widen(FloatType, DoubleType).contains(DoubleType))
    assert(SchemaWidening.widen(IntegerType, DoubleType).contains(DoubleType))
    assert(SchemaWidening.widen(ShortType, FloatType).contains(FloatType))
    // int does not embed in float: they meet at double
    assert(SchemaWidening.widen(IntegerType, FloatType).contains(DoubleType))
    // nullability (incl. nested containsNull) is NOT a type change —
    // batches routinely carry non-nullable flavors of the table's type
    assert(SchemaWidening.widen(
      ArrayType(FloatType, containsNull = true),
      ArrayType(FloatType, containsNull = false))
      .contains(ArrayType(FloatType, containsNull = true)))
    // the lossy pairs union coercion would silently accept
    assert(SchemaWidening.widen(LongType, DoubleType).isEmpty)
    assert(SchemaWidening.widen(LongType, FloatType).isEmpty)
    assert(SchemaWidening.widen(IntegerType, StringType).isEmpty)
    assert(SchemaWidening.widen(DateType, TimestampType).isEmpty)
  }

  test("a long batch widens an int column in place; old int files promote on read") {
    val dir = tmp("widen1")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
    sink.upsert(Seq((1, 1L, 10, "a"), (2, 1L, 20, "b"))
      .toDF("id", "seq", "v", "p"), 0)
    // batch 2 carries BOTH columns wider (id int→long, v int→long)
    sink.upsert(Seq((2L, 2L, 5000000000L, "b"), (3L, 1L, 30L, "a"))
      .toDF("id", "seq", "v", "p"), 1)
    val back = spark.read.format("graft-upsert").load(dir)
    assert(back.schema("id").dataType == LongType)
    assert(back.schema("v").dataType == LongType)
    assert(back.select("id", "v").as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 5000000000L), (3L, 30L)))
    // partition "a" holds one pre-widening file (id=1 untouched by
    // batch 2's merge? no — "a" WAS touched; "b" too. Re-check via a
    // third partition instead: write narrow into "c", never touch it)
    sink.upsert(Seq((9L, 1L, 90L, "c")).toDF("id", "seq", "v", "p"), 2)
    val c = spark.read.format("graft-upsert").load(dir).where($"p" === "c")
    assert(c.select("v").as[Long].collect().toSeq == Seq(90L))
  }

  test("SUM/AVG pushdown across a widening promotes narrow footers (or scans) exactly") {
    // partition "a" keeps a PRE-widening int32 file (untouched by the
    // widening commit into "b"): the pushed SUM must fold that file's
    // stats/values in the WIDENED long domain — a footer decoded at the
    // file's physical type would wrap differently than the row scan
    val dir = tmp("widensum")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
    sink.upsert(Seq((1, 1L, 10, "a"), (2, 1L, 20, "a"))
      .toDF("id", "seq", "v", "p"), 0)
    sink.upsert(Seq((3L, 1L, 5000000000L, "b")).toDF("id", "seq", "v", "p"), 1)
    val t = spark.read.format("graft-upsert").load(dir)
    assert(t.schema("v").dataType == LongType)
    val agg = t.agg(sum($"v").as("s"), avg($"v").as("a"),
      min($"v").as("lo"), max($"v").as("hi"))
    assert(agg.queryExecution.optimizedPlan.toString.contains("agg_func_0"),
      s"sum/avg must push across the widening:\n${agg.queryExecution.optimizedPlan}")
    val r = agg.as[(Long, Double, Long, Long)].collect().head
    assert(r == ((5000000030L, 5000000030.0 / 3, 10L, 5000000000L)), r.toString)
  }

  test("untouched narrow partitions promote on read after a widening commit") {
    val dir = tmp("widen2")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
    sink.upsert(Seq((1, 1L, 10, "a"), (2, 1L, 20, "b"))
      .toDF("id", "seq", "v", "p"), 0)
    // widen via a batch touching ONLY partition b — partition a's file
    // stays physically int32 while the table schema becomes long
    sink.upsert(Seq((2L, 2L, 6000000000L, "b")).toDF("id", "seq", "v", "p"), 1)
    val back = spark.read.format("graft-upsert").load(dir)
    assert(back.schema("v").dataType == LongType)
    assert(back.where($"p" === "a").select("v").as[Long].collect().toSeq == Seq(10L))
    // and the plain-parquet merge path (next upsert touching a) reads
    // the int32 file with the widened long schema
    sink.upsert(Seq((5L, 1L, 50L, "a")).toDF("id", "seq", "v", "p"), 2)
    assert(spark.read.format("graft-upsert").load(dir).where($"p" === "a")
      .select("v").as[Long].collect().toSet == Set(10L, 50L))
  }

  test("maintenance reads spanning mixed narrow/wide partitions do not merge-clash") {
    val dir = tmp("widenmix")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
    sink.upsert(Seq((1, 1L, 10, "a"), (2, 1L, 20, "b"))
      .toDF("id", "seq", "v", "p"), 0)
    // widen via partition b only: the live tree now mixes an int32 dir
    // (a) with an int64 dir (b) — mergeSchema inference over both would
    // throw CANNOT_MERGE_SCHEMAS; the persisted-schema read must not
    sink.upsert(Seq((2L, 2L, 8000000000L, "b")).toDF("id", "seq", "v", "p"), 1)
    // compaction reads EVERY live dir in one pass
    sink.compactPartitions(spark)
    val back = spark.read.format("graft-upsert").load(dir)
    assert(back.select("id", "v").as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 8000000000L)))
  }

  test("MOR real-time read over mixed narrow/wide base partitions") {
    val dir = tmp("widenmixmor")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p",
      writeMode = ParquetUpsertSink.ModeMor)
    sink.upsert(Seq((1, 1L, 10, "a"), (2, 1L, 20, "b"))
      .toDF("id", "seq", "v", "p"), 0)
    sink.compactMor(spark) // int32 base, partitions a and b
    // widen partition b through a delta + compaction: base now mixed
    sink.upsert(Seq((2L, 2L, 8000000000L, "b")).toDF("id", "seq", "v", "p"), 1)
    sink.compactMor(spark)
    // a fresh delta: the real-time view reads the MIXED base + delta
    sink.upsert(Seq((3L, 1L, 30L, "a")).toDF("id", "seq", "v", "p"), 2)
    assert(sink.readMor(spark).select("id", "v").as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 8000000000L), (3L, 30L)))
  }

  test("a narrower batch into a widened table casts up silently") {
    val dir = tmp("widen3")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
    sink.upsert(Seq((1L, 1L, 1.5d, "a")).toDF("id", "seq", "v", "p"), 0)
    // int ids, float v: both narrower than the table's long/double
    sink.upsert(Seq((2, 1L, 2.5f, "a")).toDF("id", "seq", "v", "p"), 1)
    val back = spark.read.format("graft-upsert").load(dir)
    assert(back.schema("id").dataType == LongType)
    assert(back.schema("v").dataType == DoubleType)
    assert(back.select("id", "v").as[(Long, Double)].collect().toSet ==
      Set((1L, 1.5d), (2L, 2.5d)))
  }

  test("lossy type changes fail loudly instead of union-coercing") {
    val dir = tmp("widen4")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
    sink.upsert(Seq((1L, 1L, 10L, "a")).toDF("id", "seq", "v", "p"), 0)
    // long → double: representable only to 2^53, rejected
    val e1 = intercept[IllegalArgumentException] {
      sink.upsert(Seq((1L, 2L, 1.5d, "a")).toDF("id", "seq", "v", "p"), 1)
    }
    assert(e1.getMessage.contains("not an exact widening"))
    // long → string: rejected
    val e2 = intercept[IllegalArgumentException] {
      sink.upsert(Seq((1L, 2L, "x", "a")).toDF("id", "seq", "v", "p"), 1)
    }
    assert(e2.getMessage.contains("not an exact widening"))
    // the table is untouched by the rejected batches
    assert(spark.read.format("graft-upsert").load(dir)
      .select("v").as[Long].collect().toSeq == Seq(10L))
  }

  test("MOR: widened delta merges over the int base; compaction folds at the wide type") {
    val dir = tmp("widenmor")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p",
      writeMode = ParquetUpsertSink.ModeMor)
    sink.upsert(Seq((1, 1L, 10, "a"), (2, 1L, 20, "a"))
      .toDF("id", "seq", "v", "p"), 0) // first MOR commit compacts to base? no: delta
    sink.compactMor(spark) // establish an int32 BASE
    sink.upsert(Seq((2L, 2L, 7000000000L, "a")).toDF("id", "seq", "v", "p"), 1)
    // real-time view merges int base + long delta at long
    val rt = sink.readMor(spark)
    assert(rt.schema("v").dataType == LongType)
    assert(rt.select("id", "v").as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 7000000000L)))
    // compaction folds to a long base; the DSv2 read-optimized view
    // then serves the same rows
    sink.compactMor(spark)
    val ro = spark.read.format("graft-upsert").load(dir)
    assert(ro.select("id", "v").as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 7000000000L)))
  }

  test("ALTER TABLE ALTER COLUMN TYPE widens; narrowing and lossy changes are rejected") {
    val dir = tmp("widenddl")
    val t = s"graft.`$dir`"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(
      s"""CREATE TABLE $t (id INT, seq BIGINT, v FLOAT, p STRING)
         |USING `graft-upsert` PARTITIONED BY (p)
         |TBLPROPERTIES ('recordKeys'='id', 'precombine'='seq')""".stripMargin)
    spark.sql(s"INSERT INTO $t VALUES (1, 1, cast(1.5 as float), 'a')")
    spark.sql(s"ALTER TABLE $t ALTER COLUMN id TYPE BIGINT")
    spark.sql(s"ALTER TABLE $t ALTER COLUMN v TYPE DOUBLE")
    val back = spark.table(t)
    assert(back.schema("id").dataType == LongType)
    assert(back.schema("v").dataType == DoubleType)
    assert(back.select("id", "v").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 1.5d)))
    // post-widening DML sees the wide type end-to-end
    spark.sql(s"INSERT INTO $t VALUES (5000000000, 1, 2.5, 'a')")
    assert(spark.table(t).select("id").as[Long].collect().toSet ==
      Set(1L, 5000000000L))
    // narrowing: Spark's own AlterColumns analysis rejects it before
    // the catalog is consulted (canUpCast fails) — loud either way
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $t ALTER COLUMN id TYPE INT")
    }
    assert(e.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN") ||
      e.getMessage.contains("not an exact widening"))
    // long→double: Spark's canUpCast ACCEPTS it (its numeric precedence
    // ignores the 53-bit mantissa), so THIS catalog must be the gate
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $t ALTER COLUMN id TYPE DOUBLE")
    }
    assert(e2.getMessage.contains("not an exact widening"))
    spark.sql(s"DROP TABLE $t")
  }

  test("data skipping keeps pruning across a widening: promoted stats and blooms") {
    val dir = tmp("widenskip")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
    // int32 files, ids dense per partition: only stats/blooms localize
    sink.upsert((0 until 400).map(n => (n, 1L, s"p${n % 4}"))
      .toDF("id", "seq", "p"), 0)
    // widen id via a fresh partition (the four int32 files stay)
    sink.upsert(Seq((6000000000L, 1L, "p9")).toDF("id", "seq", "p"), 1)
    val table = spark.read.format("graft-upsert").load(dir)
    assert(table.schema("id").dataType == LongType)
    // present key: the long literal fits int → bloom probe localizes
    // to one of the five files
    val hit = spark.read.format("graft-upsert").load(dir).where($"id" === 37L)
    assert(hit.rdd.getNumPartitions == 1)
    assert(hit.select("id").as[Long].collect().toSeq == Seq(37L))
    // unrepresentable-in-int literal: promoted int32 min/max prove the
    // four narrow files empty; only the wide file survives
    val wide = spark.read.format("graft-upsert").load(dir)
      .where($"id" === 6000000000L)
    assert(wide.rdd.getNumPartitions == 1)
    assert(wide.select("id").as[Long].collect().toSeq == Seq(6000000000L))
    // absent key, in-range: blooms prove it nowhere
    val miss = spark.read.format("graft-upsert").load(dir).where($"id" === 1037L)
    assert(miss.rdd.getNumPartitions == 0)
  }

  test("time travel across the widening commit reads old commits at the wide type") {
    val dir = tmp("widentt")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p", keepVersions = 3)
    sink.upsert(Seq((1, 1L, 10, "a")).toDF("id", "seq", "v", "p"), 0)
    val commits0 = ParquetUpsertSink.listArchivedCommits(spark, dir)
    sink.upsert(Seq((1L, 2L, 9000000000L, "a")).toDF("id", "seq", "v", "p"), 1)
    // time travel serves the CURRENT (widened superset) schema with
    // the AS-OF values — the persisted schema is the one read schema
    // that can span pre- and post-widening file sets in one plan
    val asOf = sink.readAsOf(spark, commits0.last)
    assert(asOf.schema("v").dataType == LongType)
    assert(asOf.select("v").as[Long].collect().toSeq == Seq(10L))
    // change feed across the widening diff compares at one type
    val commits1 = ParquetUpsertSink.listArchivedCommits(spark, dir)
    val feed = sink.changeFeed(spark, commits0.last, commits1.last)
    assert(feed.where($"_change_type" === "update_postimage")
      .select("v").as[Long].collect().toSeq == Seq(9000000000L))
  }

  test("a creation-only batch (new partitions, narrower columns) never narrows the schema") {
    val dir = tmp("widenadd")
    val sink = ParquetUpsertSink(dir, Seq("id"), "seq", "p")
    sink.upsert(Seq((1L, 1L, "keep", "a")).toDF("id", "seq", "extra", "p"), 0)
    // new partition only, WITHOUT the extra column: must not shrink
    // `_schema.json` below partition a's columns
    sink.upsert(Seq((2L, 1L, "b")).toDF("id", "seq", "p"), 1)
    assert(spark.read.format("graft-upsert").load(dir).columns.toSet ==
      Set("id", "seq", "extra", "p"))
    // and a later merge into partition a still sees (and keeps) extra
    sink.upsert(Seq((3L, 1L, "a")).toDF("id", "seq", "p"), 2)
    val a = spark.read.format("graft-upsert").load(dir).where($"p" === "a")
    assert(a.where($"id" === 1L).select("extra").as[String].collect().toSeq ==
      Seq("keep"))
  }
}
