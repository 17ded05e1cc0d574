package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.AggregateFunctions._

/** Custom typed-imperative aggregates: batch equivalence and the
  * streaming-legality claim (exact distinct works where countDistinct
  * is rejected — SURVEY B3).
  */
class AggregatesSpec extends SparkSpec {
  import spark.implicits._

  test("exact_count_distinct equals countDistinct in batch") {
    val df = Seq((1, 10L), (1, 10L), (1, 11L), (2, 10L), (2, 12L), (1, 12L))
      .toDF("g", "v")
    val rows = df.groupBy($"g")
      .agg(exact_count_distinct($"v").as("custom"),
        countDistinct($"v").as("builtin"))
      .collect()
    rows.foreach(r => assert(r.getAs[Long]("custom") == r.getAs[Long]("builtin")))
  }

  test("bounded_collect_set keeps the N smallest distinct elements, sorted") {
    val df = Seq((1, "d"), (1, "b"), (1, "e"), (1, "b"), (1, "a"), (1, "c")).toDF("g", "s")
    val out = df.groupBy($"g").agg(bounded_collect_set($"s", 3).as("set"))
      .collect()(0).getAs[scala.collection.Seq[String]]("set")
    assert(out.toSeq == Seq("a", "b", "c")) // smallest 3, deterministic
  }

  test("bounded_collect_set cap bounds state even with many distinct values") {
    val df = (1 to 10000).map(i => (i % 4, f"v$i%05d")).toDF("g", "s")
    val out = df.groupBy($"g").agg(bounded_collect_set($"s", 5).as("set")).collect()
    out.foreach { r =>
      val set = r.getAs[scala.collection.Seq[String]]("set")
      assert(set.length == 5)
      assert(set.toSeq == set.toSeq.sorted)
    }
  }

  test("misra_gries keeps every item above the n/(k+1) support threshold across partition merges") {
    // skewed corpus: 2 heavy hitters + a long tail of singletons;
    // many partitions force the mergeable-summaries merge path
    val k = 9
    val tokens =
      Seq.fill(300)("h1") ++ Seq.fill(150)("h2") ++ (1 to 500).map(i => s"tail$i")
    val df = spark.sparkContext.parallelize(tokens, 13).toDF("token")
    val n = tokens.size // 950; threshold n/(k+1) = 95
    val cand = df.agg(misra_gries($"token", k).as("c"))
      .collect()(0).getAs[scala.collection.Seq[String]]("c")
    // MG guarantee: true count > n/(k+1) survives — regardless of
    // partitioning or merge order
    assert(cand.contains("h1") && cand.contains("h2"))
    // the k-bound is restored after every merge: never more than k candidates
    assert(cand.size <= k)
    assert(n / (k + 1) == 95) // fixture sanity: h1, h2 are the only heavy items
  }

  test("misra_gries candidate pass + exact recount equals the plain exact heavy-hitter query") {
    val k = 9
    val tokens =
      Seq.fill(300)("h1") ++ Seq.fill(150)("h2") ++ Seq.fill(96)("h3") ++
        (1 to 400).map(i => s"tail${i % 37}") // repeated tail below threshold
    val df = spark.sparkContext.parallelize(tokens, 11).toDF("token")
    // the wired operator shape: sketch → broadcast candidates → exact
    // recount → threshold (deterministic despite the raw candidate set
    // being merge-order dependent)
    val sketch = df.agg(misra_gries($"token", k).as("cand"), count(lit(1)).as("n"))
    val cands = sketch.select(explode($"cand").as("token"), $"n")
    val got = df.join(broadcast(cands), Seq("token"))
      .groupBy($"token", $"n").agg(count(lit(1)).as("freq"))
      .filter($"freq" * (k + 1) > $"n")
      .select($"token", $"freq")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val expected = df.groupBy($"token").agg(count(lit(1)).as("freq"))
      .filter($"freq" * (k + 1) > lit(tokens.size.toLong))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(got.map(_._1) == Set("h1", "h2", "h3"))
  }

  test("exact_count_distinct works in a streaming aggregation (countDistinct is rejected)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Act]
    // the built-in would throw: distinct aggregates unsupported on streams
    val streaming = mem.toDF()
      .withWatermark("activity_timestamp", "2 hours")
      .groupBy(window($"activity_timestamp", "1 hour"), $"activity_type")
      .agg(exact_count_distinct($"employee_id".cast("long")).as("uniq"))
    val q = streaming.writeStream.format("memory").queryName("exact_distinct_stream")
      .outputMode("update").start()
    try {
      def act(id: String, emp: Int, t: String) =
        Act(id, emp, "login", "/x", 1, Timestamp.valueOf(t), "mobile")
      mem.addData(act("1", 1, "2025-01-02 10:05:00"), act("2", 2, "2025-01-02 10:10:00"),
        act("3", 1, "2025-01-02 10:15:00"))
      q.processAllAvailable()
      mem.addData(act("4", 3, "2025-01-02 10:20:00")) // new distinct in same window
      q.processAllAvailable()
      val last = spark.table("exact_distinct_stream")
        .orderBy($"uniq".desc).collect()(0)
      assert(last.getAs[Long]("uniq") == 3)
    } finally q.stop()
  }

  test("misra_gries works as streaming state: heavy hitters survive across micro-batches") {
    import graft.functions.AggregateFunctions.misra_gries
    implicit val sqlCtx = spark.sqlContext
    // 30× "hot" among 20 distinct cold items, split across two batches:
    // true count 30 > n/(k+1) = 50/11 — MG guarantees survival however
    // the stream is batched
    val hot = Seq.fill(30)("hot")
    val cold = (1 to 20).map(i => s"cold$i")
    val acc = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val ckpt = java.nio.file.Files.createTempDirectory("mg_ckpt").toString
    val mem = MemoryStream[String]
    val q = mem.toDF().toDF("token")
      .groupBy()
      .agg(misra_gries($"token", 10).as("cands"))
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        acc += df.as[Seq[String]](implicitly).collect()(0).toSeq
        ()
      }
      .start()
    try {
      mem.addData(hot.take(15) ++ cold.take(10))
      q.processAllAvailable()
      mem.addData(hot.drop(15) ++ cold.drop(10))
      q.processAllAvailable()
    } finally q.stop()
    assert(acc.last.contains("hot")) // the guaranteed survivor
    assert(acc.last.size <= 10) // state bound holds as streaming state
  }

  test("dd_quantiles: relative error within the DDSketch guarantee vs exact percentiles") {
    import graft.functions.AggregateFunctions.dd_quantiles
    val gamma = queries.Advanced.ddGamma
    val qs = queries.Advanced.ddQs
    val vals = Tables.table(spark, sf0001, "events")
      .select($"value").as[Double].collect().sorted
    val est = Tables.table(spark, sf0001, "events")
      .agg(dd_quantiles($"value", gamma, qs).as("qv"))
      .select($"qv").as[Seq[Double]].collect()(0)
    val bound = (gamma - 1.0) / (gamma + 1.0) + 1e-9
    qs.zip(est).foreach { case (q, e) =>
      val exact = vals((math.ceil(q * vals.length) - 1).toInt)
      assert(math.abs(e - exact) / exact <= bound,
        s"q=$q est=$e exact=$exact rel=${math.abs(e - exact) / exact}")
    }
  }

  test("dd_quantiles works as streaming state and matches its batch result") {
    import graft.functions.AggregateFunctions.dd_quantiles
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.table(spark, sf0001, "events")
      .select($"event_type", $"value").as[(String, Double)]
    val batch = ev.groupBy($"event_type")
      .agg(dd_quantiles($"value", 1.02, Seq(0.5, 0.99)).as("qv"))
      .as[(String, Seq[Double])].collect().toMap
    val mem = MemoryStream[(String, Double)]
    // upsert each update-mode micro-batch into a map: batches arrive in
    // order, so the final entry per key is the full-history sketch
    val acc = scala.collection.mutable.Map.empty[String, Seq[Double]]
    val ckpt = java.nio.file.Files.createTempDirectory("dd_ckpt").toString
    val q = mem.toDF().toDF("event_type", "value")
      .groupBy($"event_type")
      .agg(dd_quantiles($"value", 1.02, Seq(0.5, 0.99)).as("qv"))
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.as[(String, Seq[Double])](implicitly).collect()
          .foreach { case (k, v) => acc(k) = v }
      }
      .start()
    try {
      val rows = ev.collect()
      val (a, b) = rows.splitAt(rows.length / 2)
      mem.addData(a.toSeq)
      q.processAllAvailable()
      mem.addData(b.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    assert(acc.toMap == batch) // exact merge ⇒ bit-identical to batch
  }

  test("dd_quantiles aggregates inside watermarked tumbling windows on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val q = mem.toDF().toDF("ts", "v")
      .withWatermark("ts", "2 hours")
      .groupBy(window($"ts", "1 hour"))
      .agg(dd_quantiles($"v", 1.02, Seq(0.5)).as("qv"))
      .writeStream.format("memory").queryName("dd_win")
      .outputMode("update").start()
    def t(s: String) = Timestamp.valueOf(s)
    try {
      mem.addData((t("2025-01-02 10:05:00"), 10.0), (t("2025-01-02 10:40:00"), 30.0),
        (t("2025-01-02 11:10:00"), 100.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("dd_win")
      .select($"window.start".cast("string"), element_at($"qv", 1))
      .as[(String, Double)].collect().toMap
    assert(rows.size == 2) // two tumbling windows saw data
    // p50 rank ⌈0.5·2⌉ = 1 → the 10-bucket for {10, 30}; {100} → 100
    val bound = (1.02 - 1.0) / (1.02 + 1.0) + 1e-9
    assert(math.abs(rows("2025-01-02 10:00:00") - 10.0) / 10.0 <= bound)
    assert(math.abs(rows("2025-01-02 11:00:00") - 100.0) / 100.0 <= bound)
  }

  test("dd_quantiles yields null, not a fake 0.0, when no positive value was seen") {
    import graft.functions.AggregateFunctions.dd_quantiles
    val row = Seq(-1.0, 0.0).toDF("v")
      .agg(dd_quantiles($"v", 1.02, Seq(0.5)).as("qv")).collect()(0)
    assert(row.isNullAt(0))
  }

  test("dd_quantiles is deterministic under repartitioning (exact merge)") {
    import graft.functions.AggregateFunctions.dd_quantiles
    val ev = Tables.table(spark, sf0001, "events").select($"event_type", $"value")
    def run(parts: Int): Map[String, Seq[Double]] =
      ev.repartition(parts)
        .groupBy($"event_type")
        .agg(dd_quantiles($"value", 1.02, Seq(0.5, 0.9, 0.99)).as("qv"))
        .as[(String, Seq[Double])].collect().toMap
    assert(run(1) == run(13)) // bit-identical, not approximately equal
  }
}
