package graft

import org.apache.spark.sql.functions._

/** Cross-cutting invariants of the dedup / similarity / text /
  * multimodal extensions on the sf0.001 corpus.
  */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("minhash LSH finds exactly the ground-truth near-dup pairs (recall check)") {
    val naive = ext.Dedup.ngramJaccard(spark, sf0001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = ext.Dedup.minhashLsh(spark, sf0001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(naive.nonEmpty) // corpus has planted near-dups
    assert(lsh == naive) // full recall + verification removes false positives
  }

  test("jaccard values are within [0,1] and symmetric formulation holds") {
    val rows = ext.Dedup.ngramJaccard(spark, sf0001).collect()
    rows.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0)
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
    }
  }

  test("exact dedup keeps every row when all texts are unique") {
    val n = Tables.table(spark, sf0001, "documents").count()
    val d = ext.Dedup.exact(spark, sf0001)
    assert(d.count() == n)
    assert(d.agg(sum("n_copies")).collect()(0).getLong(0) == n)
  }

  test("bag-of-words dedup collapses shuffled-word copies") {
    val n = Tables.table(spark, sf0001, "documents").count()
    val d = ext.Dedup.bagOfWords(spark, sf0001)
    assert(d.count() < n) // corpus plants shuffled copies
    assert(d.agg(sum("n_copies")).collect()(0).getLong(0) == n) // partition of the corpus
  }

  test("ANN brute force: top-1 neighbor has the max cosine; ranks are 1..5") {
    val out = ext.Similarity.annBruteForce(spark, sf0001)
    val byQuery = out.collect().groupBy(_.getAs[Long]("query_id"))
    byQuery.values.foreach { rows =>
      val ranked = rows.sortBy(_.getAs[Int]("rank"))
      assert(ranked.map(_.getAs[Int]("rank")).toSeq == (1 to ranked.length))
      val sims = ranked.map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("ANN LSH results are a subset of brute-force candidates with same scores") {
    val bf = ext.Similarity.annBruteForce(spark, sf0001)
      .select("query_id", "neighbor_id", "sim").as[(Long, Long, Double)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    val lsh = ext.Similarity.annLsh(spark, sf0001)
      .select("query_id", "neighbor_id", "sim").as[(Long, Long, Double)].collect()
    lsh.foreach { case (q, n, s) =>
      bf.get((q, n)).foreach(bfSim => assert(bfSim == s)) // same score where overlapping
    }
    assert(lsh.nonEmpty)
  }

  test("PQ rounds sweep: one row per swept round count, recall well-formed") {
    val out = ext.Similarity.annPqRounds(spark, sf0001).collect()
    assert(out.map(_.getAs[Int]("rounds")).toSeq ==
      ext.Similarity.pqRoundsSweep)
    out.foreach { r =>
      val recall = r.getAs[Double]("recall")
      assert(recall >= 0.0 && recall <= 1.0)
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_truth"))
    }
  }

  test("ANN recall@5 equals a hand-computed IVF-vs-brute-force overlap") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val bf = pairs(ext.Similarity.annBruteForce(spark, sf0001))
    val iv = pairs(ext.Similarity.annIvf(spark, sf0001))
    val expected = bf.groupBy(_._1).map { case (q, ps) =>
      q -> ps.count(iv.contains).toLong
    }
    val got = ext.Similarity.annRecall(spark, sf0001).collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("n_hits"), r.getAs[Double]("recall"))).toMap
    assert(got.keySet == expected.keySet) // every query scored, even 0-hit ones
    got.foreach { case (q, (hits, recall)) =>
      assert(hits == expected(q), s"query $q")
      assert(recall == hits.toDouble / 5)
      assert(recall >= 0.0 && recall <= 1.0)
    }
    // nprobe=1 IVF on a planted-cluster corpus should find most true neighbors
    assert(got.values.map(_._1).sum > 0)
  }

  test("tiled embedding pair join equals the naive all-pairs ground truth") {
    val vecs = Tables.table(spark, sf0001, "embeddings")
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val naive = (for {
      (ia, va) <- vecs; (ib, vb) <- vecs if ia < ib
      sim = r4(dot(va, vb) / (math.sqrt(dot(va, va)) * math.sqrt(dot(vb, vb))))
      if sim >= 0.4
    } yield (ia, ib, sim)).toSet
    val tiled = ext.Similarity.embeddingPairs(spark, sf0001)
      .as[(Long, Long, Double)].collect().toSet
    assert(naive.nonEmpty)
    assert(tiled == naive) // exact join: every unordered pair once, none twice
  }

  test("banded-LSH embedding dedup is consistent with the exact dedup") {
    val exact = ext.Similarity.dedupByEmbedding(spark, sf0001)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val lsh = ext.Similarity.dedupByEmbeddingLsh(spark, sf0001)
      .as[(Long, Long, Long, Double)].collect()
    assert(lsh.nonEmpty)
    lsh.foreach { case (dup, keeper, nDups, bestSim) =>
      // an LSH-found duplicate is a real duplicate: the exact op found
      // it too, with at-least-as-good keeper/count/sim (LSH may miss
      // candidates, never invent them)
      val (_, exKeeper, exN, exBest) = exact(dup)
      assert(keeper >= exKeeper)
      assert(nDups <= exN)
      assert(bestSim <= exBest)
    }
  }

  test("kmeans partitions the corpus; refinement does not reduce cohesion") {
    val n = Tables.table(spark, sf0001, "embeddings").count()
    val rows = ext.Clustering.kmeans(spark, sf0001)
      .as[(Long, Long, Double)].collect()
    assert(rows.map(_._2).sum == n) // every vector in exactly one cluster
    assert(rows.forall { case (_, sz, coh) => sz > 0 && coh >= -1.0 && coh <= 1.0 })
    // Lloyd refinement: mean assignment cosine must not drop vs the
    // zeroth (seed) assignment
    val emb = Tables.table(spark, sf0001, "embeddings")
    val seeds = emb.filter($"vec_id" % 25 === 0 && $"vec_id" < 800)
      .select($"vec_id".as("cent_id"), $"embedding".as("cv"))
    val seedCohesion = graft.plans.TopKPerGroup.topKPerGroup(
      emb.join(broadcast(seeds))
        .select($"vec_id", ext.Similarity.cosine($"embedding", $"cv").as("sim"), $"cent_id"),
      Seq($"vec_id"), Seq($"sim".desc, $"cent_id".asc), 1)
      .agg(avg($"sim")).as[Double].collect()(0)
    // refinedCohesion is rebuilt from round(.,4) per-cluster values
    // (up to ~5e-5 recombination error), and mean-update Lloyd only
    // guarantees cosine improvement for equal-norm members — 1e-3
    // slack covers both while still catching a real regression (the
    // measured margin on this fixture is ~0.08)
    val refinedCohesion = rows.map(r => r._3 * r._2).sum / n
    assert(refinedCohesion >= seedCohesion - 1e-3)
  }

  test("duplicated-span fractions are consistent with the near-dup pair set") {
    val rows = ext.Dedup.dupSpans(spark, sf0001)
      .as[(Long, Long, Int, Double)].collect()
    rows.foreach { case (_, nDup, nSpans, frac) =>
      assert(nDup >= 0 && nDup <= nSpans)
      assert(frac >= 0.0 && frac <= 1.0)
    }
    // the two signals overlap but neither implies the other: a j≥0.9
    // near-dup with evenly-spread edits can break every 20-token
    // window (observed in this corpus), and verbatim boilerplate can
    // sit in otherwise-different docs — assert a nonempty overlap, not
    // containment
    val withDups = rows.filter(_._4 > 0.0).map(_._1).toSet
    assert(withDups.nonEmpty)
    val nearDups = ext.Dedup.minhashLsh(spark, sf0001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
      .flatMap(p => Seq(p._1, p._2)).toSet
    assert(nearDups.nonEmpty)
    assert((withDups & nearDups).nonEmpty)
  }

  test("span removal excises exactly the flagged-window tokens") {
    val spans = ext.Dedup.dupSpans(spark, sf0001)
      .select($"doc_id", $"dup_frac").as[(Long, Double)].collect().toMap
    val removed = ext.Dedup.dupSpanRemoval(spark, sf0001)
      .as[(Long, Int, Int, String)].collect()
    assert(removed.length == spans.size) // every doc comes back, flagged or not
    removed.foreach { case (id, nTok, nRem, clean) =>
      assert(nRem >= 0 && nRem <= nTok)
      // output self-consistency: the cleaned text holds exactly the
      // surviving tokens (single-space join, mirroring tokenization)
      val cleanToks = if (clean.isEmpty) 0 else clean.split(" ", -1).length
      assert(cleanToks == nTok - nRem,
        s"doc $id: clean token count $cleanToks != $nTok - $nRem")
      // a doc loses tokens IFF the dup-span signal flags it: both
      // operators define "duplicated" as a window occurring in >1
      // distinct doc, so the removal acts on exactly the signal's docs
      assert((nRem > 0) == (spans(id) > 0.0),
        s"doc $id: n_removed=$nRem but dup_frac=${spans(id)}")
    }
    assert(removed.exists(_._3 > 0)) // fixture does contain duplicated text
  }

  test("line dedup keeps exactly the first occurrence of each duplicated line") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("linededup").toString
    // pseudo-lines are 12-token segments; build exact 12-token lines
    def line(p: String) = (1 to 12).map(i => s"$p$i").mkString(" ")
    val (la, lb, lc, ld) = (line("a"), line("b"), line("c"), line("d"))
    val rem = (1 to 6).map(i => s"r$i").mkString(" ") // 6-token remainder
    Seq(
      (0L, s"$la $lb"),   // keeper of la; untouched
      (1L, s"$la $lc"),   // loses la to doc 0
      (2L, line("e")),    // unique, untouched
      (3L, s"$ld $ld"),   // intra-doc dup: keeps first, loses second
      (4L, s"$la $rem"),  // loses la; keeper of the short remainder line
      (5L, rem)           // whole doc duplicates doc 4's remainder: emptied
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = ext.Dedup.lineDedup(spark, dir)
      .as[(Long, Int, Int, String)].collect().sortBy(_._1)
    assert(rows.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((0L, 2, 0), (1L, 2, 1), (2L, 1, 0), (3L, 2, 1), (4L, 2, 1), (5L, 1, 1)))
    val clean = rows.map(r => r._1 -> r._4).toMap
    assert(clean(0L) == s"$la $lb") // untouched docs pass through verbatim
    assert(clean(1L) == lc)
    assert(clean(3L) == ld)         // first intra-doc occurrence survives
    assert(clean(4L) == rem)        // keeper of the remainder line keeps it
    assert(clean(5L) == "")         // whole-doc duplicate excised to empty
  }

  test("source caps keep at most K docs per source via the native top-k plan") {
    val df = ext.Text.sourceCaps(spark, sf0001)
    // the bounded-per-partition TopKPerGroup exec must be in the plan
    assert(df.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    val perSource = df.groupBy("source").count().as[(String, Long)].collect()
    assert(perSource.nonEmpty)
    perSource.foreach { case (s, c) =>
      assert(c <= ext.Text.sourceCapK, s"source $s kept $c > cap")
    }
    // every kept doc's n_chars is >= every dropped doc's of the same
    // source, modulo the doc_id tie-break at the boundary value
    val keptMin = df.groupBy("source").agg(min("n_chars").as("m"))
      .as[(String, Long)].collect().toMap
    val all = Tables.table(spark, sf0001, "documents")
      .select("source", "n_chars").as[(String, Long)].collect()
    val keptCount = perSource.toMap
    all.groupBy(_._1).foreach { case (s, rows) =>
      if (rows.length > ext.Text.sourceCapK) {
        val strictlyAbove = rows.count(_._2 > keptMin(s))
        assert(strictlyAbove <= keptCount(s),
          s"source $s: ${strictlyAbove} docs above the kept floor ${keptMin(s)}")
      }
    }
  }

  test("int8 quantization error is bounded by half a quantization step") {
    val rows = ext.Similarity.quantizeInt8(spark, sf0001)
      .as[(Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, scale, rms, mx) =>
      assert(scale > 0)
      // symmetric rounding: per-element error ≤ scale/2 (plus round-6 slack)
      assert(mx <= scale / 2 + 1e-6)
      assert(rms <= mx + 1e-6)
    }
  }

  test("self-cosine is 1.0 for every embedding") {
    import graft.functions.VectorFunctions.vec_cosine
    val bad = Tables.table(spark, sf0001, "embeddings")
      .select(abs(vec_cosine(col("embedding"), col("embedding")) - 1.0).as("err"))
      .filter(col("err") > 1e-12).count()
    assert(bad == 0)
  }

  test("tfidf ranks hand-computable fixture terms correctly") {
    import java.nio.file.Files
    // 4 docs: "rare" appears in 1 doc, "mid" in 2, "the" in all 4
    // (idf = 0 ⇒ never a top term no matter how frequent)
    val dir = Files.createTempDirectory("tfidf").toString
    Seq(
      (0L, "the the the rare mid"),
      (1L, "the mid"),
      (2L, "the"),
      (3L, "the")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = ext.Text.tfidf(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("token"),
        r.getAs[Double]("tfidf"), r.getAs[Int]("rank")))
    val doc0 = rows.filter(_._1 == 0L)
    // doc 0: rare tf=1 idf=ln(4)≈1.3863; mid tf=1 idf=ln(2)≈0.6931;
    // the tf=3 idf=ln(1)=0 — rank must be rare > mid > the
    assert(doc0.map(t => (t._2, t._4)).toSeq ==
      Seq(("rare", 1), ("mid", 2), ("the", 3)))
    assert(doc0.find(_._2 == "rare").get._3 == 1.3863)
    assert(doc0.find(_._2 == "the").get._3 == 0.0)
    // every doc emits at most tfidfTopK rows with ranks 1..k
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.length <= ext.Text.tfidfTopK)
      assert(rs.map(_._4).sorted.toSeq == (1 to rs.length))
    }
  }

  test("quality scores are in (0,1]; token stats consistent") {
    val q = ext.Text.quality(spark, sf0001).collect()
    q.foreach { r =>
      assert(r.getAs[Double]("quality_score") > 0 && r.getAs[Double]("quality_score") <= 1)
      assert(r.getAs[Double]("type_token_ratio") <= 1.0)
      assert(r.getAs[Int]("n_words") > 0)
    }
    val t = ext.Text.tokenStats(spark, sf0001).collect()
    t.foreach { r =>
      assert(r.getAs[Int]("n_distinct_tokens") <= r.getAs[Int]("n_ws_tokens"))
    }
  }

  test("real image decode: PNG round-trips pixel-exact, JPEG decodes lossy-close") {
    import ext.Multimodal
    // PNG (lossless): the decoded statistics must equal the generating
    // formula exactly — same invariant the x_media_decode oracle pins
    val ids = Seq(0L, 5L, 123L, 9999L)
    ids.foreach { id =>
      val decoded = Multimodal.decodeImages(Iterator(
        Multimodal.MediaRecord(id, "image", Multimodal.syntheticPng(id), 0L))).next()
      var (sr, sg, sb, ck) = (0L, 0L, 0L, 0L)
      for (y <- 0 until 16; x <- 0 until 16) {
        val r = (id * 31 + x * 7 + y * 13) % 256
        val g = (id * 17 + x * 11 + y * 3) % 256
        val b = (id * 23 + x * 5 + y * 19) % 256
        sr += r; sg += g; sb += b
        ck += (x + 16L * y + 1) * (r + 2 * g + 3 * b)
      }
      assert(decoded.width == 16 && decoded.height == 16)
      assert((decoded.sum_r, decoded.sum_g, decoded.sum_b) == ((sr, sg, sb)),
        s"PNG decode must be pixel-exact for doc $id")
      assert(decoded.pix_checksum == ck,
        s"position-weighted checksum must survive the round-trip for doc $id")
    }
    // JPEG (lossy): dimensions exact, channel MEANS within codec noise
    ids.foreach { id =>
      val png = Multimodal.decodeImages(Iterator(
        Multimodal.MediaRecord(id, "image", Multimodal.syntheticPng(id), 0L))).next()
      val jpg = Multimodal.decodeImages(Iterator(
        Multimodal.MediaRecord(id, "image", Multimodal.syntheticJpeg(id), 0L))).next()
      assert(jpg.width == 16 && jpg.height == 16)
      def mean(s: Long) = s / 256.0
      assert(math.abs(mean(jpg.sum_r) - mean(png.sum_r)) < 16.0 &&
        math.abs(mean(jpg.sum_g) - mean(png.sum_g)) < 16.0 &&
        math.abs(mean(jpg.sum_b) - mean(png.sum_b)) < 16.0,
        s"JPEG means must land within codec noise for doc $id")
    }
  }

  test("multimodal mapPartitions features agree with the expression path") {
    val viaMap = ext.Multimodal.extractFeatures(spark, sf0001)
      .select("doc_id", "byte_len", "frame_count").as[(Long, Long, Int)]
      .collect().map(t => t._1 -> (t._2, t._3)).toMap
    val viaExpr = ext.Multimodal.mediaFeatures(spark, sf0001)
      .select("doc_id", "byte_len", "frame_count").as[(Long, Long, Int)].collect()
    viaExpr.foreach { case (id, len, fc) =>
      assert(viaMap(id) == ((len, fc)))
    }
  }

  test("real WAV decode reproduces the generating formula sample-for-sample") {
    import ext.Multimodal
    Seq(0L, 1L, 17L, 12345L).foreach { id =>
      val d = Multimodal.decodeAudio(Iterator(
        Multimodal.MediaRecord(id, "audio", Multimodal.syntheticWav(id), 0L))).next()
      val samples = (0 until 256).map(i =>
        ((id * 7919 + i.toLong * 104729) % 65536) - 32768)
      assert(d.n_samples == 256)
      assert(d.sample_rate == 8000)
      assert(d.sum_samples == samples.sum)
      assert(d.sum_abs == samples.map(math.abs).sum)
      assert(d.sample_checksum ==
        samples.zipWithIndex.map { case (s, i) => (i + 1) * s }.sum)
    }
  }

  test("real GIF framesample: strided frames reproduce the formula pixel-for-pixel") {
    import ext.Multimodal
    Seq(0L, 2L, 7L, 12347L).foreach { id =>
      val frames = Multimodal.decodeFrameSamples(Iterator(
        Multimodal.MediaRecord(id, "video", Multimodal.syntheticGif(id), 0L))).toSeq
      val n = 4 + (id % 5).toInt
      // sampling schedule: every FrameStride-th frame, container count exact
      assert(frames.map(_.frame_idx) == (0 until n by Multimodal.FrameStride))
      frames.foreach { fr =>
        assert(fr.n_frames == n)
        var (sr, sg, sb, ck) = (0L, 0L, 0L, 0L)
        for (y <- 0 until 16; x <- 0 until 16) {
          val idx = ((id * 31 + x * 7 + y * 13 + fr.frame_idx * 97) % 256).toInt
          val (r, g, b) = ((idx * 37) % 256, (idx * 59) % 256, (idx * 83) % 256)
          sr += r; sg += g; sb += b
          ck += (x + 16L * y + 1) * (r + 2L * g + 3L * b)
        }
        assert(fr.sum_r == sr && fr.sum_g == sg && fr.sum_b == sb &&
          fr.pix_checksum == ck, s"frame ${fr.frame_idx} of doc $id")
      }
    }
  }

  test("media feature pairs: forward-delta blocking is lossless and exactly-once") {
    val pairs = ext.Multimodal.mediaDedupPairs(spark, sf0001)
      .select("media_type", "doc_a", "doc_b").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // exactly-once: no duplicate emission without any distinct pass
    assert(pairs.length == pairs.distinct.length)
    pairs.foreach { case (_, a, b) => assert(a < b) }
    // lossless vs the brute-force predicate over ALL same-type pairs
    val eps = ext.Multimodal.featureEps
    val m = ext.Multimodal.mediaTable(spark, sf0001).toDF()
      .withColumn("txt", decode(col("payload"), "UTF-8"))
      .withColumn("f1", round(
        (length(col("txt")) - length(regexp_replace(col("txt"), " ", "")))
          .cast("double") / col("byte_len"), 4))
      .withColumn("f2", round(
        (length(col("txt")) - length(regexp_replace(col("txt"), "[0-9]", "")))
          .cast("double") / col("byte_len"), 4))
      .select($"doc_id", $"media_type", $"byte_len", $"f1", $"f2")
      .as[(Long, String, Long, Double, Double)].collect()
    val brute = (for {
      (ida, ta, la, f1a, f2a) <- m
      (idb, tb, lb, f1b, f2b) <- m
      if ta == tb && ida < idb
      if math.abs(f1a - f1b) <= eps && math.abs(f2a - f2b) <= eps / 2
      if math.min(la, lb).toDouble / math.max(la, lb) >= 0.98
    } yield (ta, ida, idb)).toSet
    assert(brute.nonEmpty)
    assert(pairs.toSet == brute)
  }

  test("media dedup groups equal doc-level CC over the verified pairs") {
    // the class-contracted path must reproduce the uncontracted
    // components exactly (same keepers, same sizes, same membership)
    val viaGroups = ext.Multimodal.mediaDedupGroups(spark, sf0001)
      .select("doc_id", "keeper_id", "cluster_size")
      .as[(Long, Long, Long)].collect().toSet
    val edges = ext.Multimodal.mediaDedupPairs(spark, sf0001)
      .select(col("doc_a"), col("doc_b"))
    val docLevel = ext.Clusters.connectedComponents(edges)
      .select(col("id").as("doc_id"), col("component").as("keeper_id"))
      .withColumn("cluster_size", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("keeper_id"))))
      .as[(Long, Long, Long)].collect().toSet
    assert(docLevel.nonEmpty)
    assert(viaGroups == docLevel)
    // keepers are component minima and members map to themselves once
    viaGroups.foreach { case (doc, keeper, size) =>
      assert(keeper <= doc); assert(size >= 2)
    }
  }

  test("media resize preserves aspect within integer truncation, never upscales") {
    val rows = ext.Multimodal.mediaResize(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, h) = (r.getAs[Long]("src_w"), r.getAs[Long]("src_h"))
      val (ow, oh) = (r.getAs[Long]("out_w"), r.getAs[Long]("out_h"))
      assert(r.getAs[String]("media_type") != "audio")
      if (r.getAs[Boolean]("resized")) {
        // the LONG edge lands exactly on target (it divides itself out)
        assert(math.max(ow, oh) == ext.Multimodal.resizeTarget)
        assert(ow <= w && oh <= h)
        // aspect preserved within the truncation of one integer division
        val want = math.min(w, h).toDouble * ext.Multimodal.resizeTarget / math.max(w, h)
        assert(math.abs(math.min(ow, oh) - want) <= 1.0, s"aspect drift: $r")
      } else {
        assert(ow == w && oh == h && math.max(w, h) <= ext.Multimodal.resizeTarget)
      }
    }
  }

  test("media-text alignment joins every embedded doc once; scores are cosines") {
    val rows = ext.Multimodal.mediaTextAlign(spark, sf0001).collect()
    assert(rows.length == 500) // sf0.001: every doc has an embedding
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    rows.foreach { r =>
      val s = r.getAs[Double]("align_score")
      assert(s >= -1.0001 && s <= 1.0001)
      assert(r.getAs[Boolean]("kept") == (s >= ext.Multimodal.alignThreshold))
    }
    // a cut at 0.1 over ~N(0, 1/4) scores keeps a meaningful MIDDLE
    // fraction — the gate is neither pass-all nor drop-all
    val kept = rows.count(_.getAs[Boolean]("kept"))
    assert(kept > rows.length / 10 && kept < rows.length * 9 / 10, s"kept=$kept")
  }

  test("fingerprint: rolling hash is order-sensitive, content hash stable") {
    val fp = ext.Text.fingerprint(spark, sf0001).limit(5).collect()
    fp.foreach { r =>
      assert(r.getAs[String]("content_md5").length == 32)
      val v = r.getAs[Long]("rolling_fp")
      assert(v >= 0 && v < 1000000007L)
    }
  }

  test("prefix-filtered jaccard equals the naive pairwise baseline (lossless filter)") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
        -> r.getAs[Double]("jaccard")).toMap
    val naive = pairs(ext.Dedup.ngramJaccard(spark, sf0001)) // capped at doc_id < 1000
    val pp = pairs(ext.Dedup.jaccardPrefix(spark, sf0001))
      .filter { case ((a, b), _) => a < 1000 && b < 1000 }
    assert(naive.nonEmpty)
    assert(pp == naive) // same pairs, same scores — nothing pruned that shouldn't be
  }

  test("fuzzy decontamination = LSH near-dup pairs restricted to the corpus split") {
    val expected = ext.Dedup.minhashLshPairs(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("jaccard")))
      .flatMap { case (a, b, j) =>
        if (a % 50 != 0 && b % 50 == 0) Some((a, b, j))
        else if (a % 50 == 0 && b % 50 != 0) Some((b, a, j))
        else None
      }.toSet
    val fuzzy = ext.Dedup.decontaminateFuzzy(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("train_doc"), r.getAs[Long]("bench_doc"),
        r.getAs[Double]("jaccard"))).toSet
    assert(fuzzy == expected)
  }

  test("containment matches the naive shingle-set ground truth exactly") {
    val out = ext.Dedup.containment(spark, sf0001)
      .collect().map(r => (r.getAs[Long]("contained_doc"),
        r.getAs[Long]("container_doc")) -> r.getAs[Double]("containment")).toMap
    // naive twin on the small corpus: per-doc distinct shingle sets,
    // stop-shingles dropped, every ordered pair checked
    val sets = Tables.table(spark, sf0001, "documents")
      .select(col("doc_id"), ext.Dedup.shingles(ext.Text.tokens(col("text"))).as("s"))
      .as[(Long, Seq[String])].collect().map { case (id, s) => id -> s.toSet }
    val df = sets.flatMap(_._2).groupBy(identity).map { case (s, o) => s -> o.length }
    val rare = sets.map { case (id, s) =>
      id -> s.filter(df(_) <= ext.Dedup.containmentDfCap)
    }.toMap
    val expected = (for {
      (a, sa) <- rare.toSeq; (b, sb) <- rare.toSeq
      if a != b && sa.nonEmpty
      c = BigDecimal(sa.intersect(sb).size.toDouble / sa.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if c >= ext.Dedup.containmentThreshold
    } yield (a, b) -> c).toMap
    assert(out == expected)
    assert(expected.nonEmpty) // corpus plants near-dups — the check is non-vacuous
  }

  test("unigram logprob: scores are negative, token counts exact, corpus non-degenerate") {
    val docs = Tables.table(spark, sf0001, "documents")
    val out = ext.Text.unigramLogprob(spark, sf0001)
    assert(out.count() == docs.count()) // every doc scored
    val expected = docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    val scores = out.collect().map { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_tokens") == expected(id))
      r.getAs[Double]("avg_logprob")
    }
    // MLE probabilities are < 1 (no token is the entire corpus) → ln < 0
    scores.foreach(s => assert(s < 0.0))
    assert(scores.max > scores.min) // common-token docs separate from rare-token ones
  }

  test("source weights: a partition of the corpus with weights summing to 1") {
    val out = ext.Text.sourceWeights(spark, sf0001).collect()
    val nDocs = Tables.table(spark, sf0001, "documents").count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == nDocs)
    val ws = out.map(_.getAs[Double]("weight"))
    ws.foreach(w => assert(w > 0.0 && w < 1.0))
    assert(math.abs(ws.sum - 1.0) < 1e-2) // per-source 4dp rounding slack
    // α < 1 compresses the mix: the largest source's weight share is
    // smaller than its token share
    val toks = out.map(_.getAs[Long]("n_tokens"))
    val big = toks.indices.maxBy(toks(_))
    assert(ws(big) < toks(big).toDouble / toks.sum)
  }

  test("funnel matches a brute-force per-user first-occurrence recomputation") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))
      .as[(Long, String, Long)].collect()
    val steps = queries.Advanced.funnelSteps
    val perUser = ev.groupBy(_._1).values.map { rows =>
      val first = steps.map(st =>
        rows.filter(_._2 == st) match {
          case e if e.isEmpty => None
          case e => Some(e.map(_._3).min)
        })
      var s = 0
      var prev = Long.MinValue
      var going = true
      first.foreach { t =>
        if (going) t match {
          case Some(x) if s == 0 || x > prev => s += 1; prev = x
          case _ => going = false
        }
      }
      s
    }.toSeq
    val expected = (1 to 4).map(k => k -> perUser.count(_ >= k).toLong)
      .filter(_._2 > 0).toMap
    val got = queries.Advanced.funnel(spark, sf0001).collect()
      .map(r => r.getAs[Int]("step") -> r.getAs[Long]("n_reached")).toMap
    assert(got == expected)
    assert(got(1) > got.getOrElse(4, 0L)) // the funnel narrows
  }

  test("event drift: non-negative KL per day, totals partition the log") {
    val out = queries.Advanced.eventDrift(spark, sf0001).collect()
    val total = Tables.events(spark, sf0001).count()
    assert(out.map(_.getAs[Long]("n_events")).sum == total)
    val kls = out.map(_.getAs[Double]("kl_overall"))
    kls.foreach(k => assert(k >= 0.0)) // Gibbs' inequality
    assert(out.length > 1) // the log spans multiple days
  }

  test("event anomaly matches a brute-force z-score recomputation") {
    val ev = Tables.events(spark, sf0001)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = ev.groupBy(_._2).flatMap { case (_, rows) =>
      val vs = rows.map(_._3)
      val mu = vs.sum / vs.length
      val sigma = math.sqrt(vs.map(v => (v - mu) * (v - mu)).sum / vs.length)
      if (sigma <= 0) Seq.empty[Long]
      else rows.filter(r => math.abs(round4((r._3 - mu) / sigma)) >= 3.0).map(_._1).toSeq
    }.toSet
    val got = queries.Advanced.eventAnomaly(spark, sf0001)
      .collect().map(_.getAs[Long]("event_id")).toSet
    assert(got == expected)
    assert(got.nonEmpty) // the log contains genuine outliers
  }

  test("bigram logprob scores a hand-computable fixture exactly") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("bigram").toString
    // corpus: tokens a,b,a,b,a,c — cu(a)=3 cu(b)=2 cu(c)=1, N=6;
    // bigrams (a,b)×2 (a,c)×1, c1(a)=3
    Seq((0L, "a b"), (1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = ext.Text.bigramLogprob(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logprob"))).toSeq
    // p(b|a) = .5·(2/3) + .5·(2/6) = 0.5 → ln = −0.6931
    // p(c|a) = .5·(1/3) + .5·(1/6) = 0.25 → ln = −1.3863
    assert(rows.sortBy(_._1) ==
      Seq((0L, 1L, -0.6931), (1L, 1L, -0.6931), (2L, 1L, -1.3863)))
  }

  test("bm25 scores a hand-computable fixture exactly; ranks well-formed on corpus") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("bm25").toString
    // doc 0 (id % 50 == 0) is the query; 1-4 the corpus. N=4,
    // df(apple)=2, avgdl=1.75, idf=ln 2. Hand scores: doc2 0.7936 > doc1 0.6549.
    Seq((0L, "apple"), (1L, "apple banana"), (2L, "apple apple banana"),
      (3L, "banana"), (4L, "cherry")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fix = ext.Retrieval.bm25(spark, dir)
      .collect().map(r => (r.getAs[Long]("query_doc"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("score"), r.getAs[Int]("rank"))).toSeq
    assert(fix == Seq((0L, 2L, 0.7936, 1), (0L, 1L, 0.6549, 2)))
    // corpus-level shape invariants
    val rows = ext.Retrieval.bm25(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("query_doc") % 50 == 0)
      assert(r.getAs[Long]("doc_id") % 50 != 0)
    }
    rows.groupBy(_.getAs[Long]("query_doc")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to rs.length))
      val scores = sorted.map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("IVF+int8 ANN: cell-local neighbors with exact float sims, well-formed ranks") {
    val emb = Tables.table(spark, sf0001, "embeddings")
    val centroids = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
    val cellOf = ext.Similarity.assignNearest(emb, centroids, keepEmbedding = false)
      .select("vec_id", "cent_id").as[(Long, Long)].collect().toMap
    val vecs = emb.collect().map(r => r.getAs[Long]("vec_id") ->
      r.getAs[scala.collection.Seq[Float]]("embedding").toArray).toMap
    def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val rows = ext.Similarity.annIvfInt8(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("sim"), r.getAs[Int]("rank")))
    assert(rows.nonEmpty)
    rows.foreach { case (q, n, sim, _) =>
      assert(cellOf(q) == cellOf(n)) // IVF pruning really is cell-local
      assert(sim == round4(cos(vecs(q), vecs(n)))) // rerank sims are exact
    }
    rows.groupBy(_._1).values.foreach { rs =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to rs.length))
      val sims = sorted.map(_._3)
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("hard negatives = bm25 candidates minus contaminated pairs, re-ranked") {
    val contaminated = ext.Dedup.decontaminate(spark, sf0001)
      .select($"bench_doc", $"train_doc").as[(Long, Long)].collect().toSet
    val hn = ext.Retrieval.hardNegatives(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("query_doc"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("score"), r.getAs[Int]("rank")))
    assert(hn.nonEmpty)
    // no contaminated pair survives
    hn.foreach { case (q, d, _, _) => assert(!contaminated.contains((q, d))) }
    // ranks are dense from 1 and scores non-increasing per query
    hn.groupBy(_._1).values.foreach { rs =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to rs.length))
      val scores = sorted.map(_._3)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // where bm25's top-k had no contaminated hits, the two queries agree
    val bm = ext.Retrieval.bm25(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("query_doc"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("score"), r.getAs[Int]("rank")))
    val cleanQueries = bm.groupBy(_._1).collect {
      case (q, rs) if rs.forall(r => !contaminated.contains((r._1, r._2))) => q
    }.toSet
    assert(cleanQueries.nonEmpty)
    assert(hn.filter(r => cleanQueries(r._1)).toSet ==
      bm.filter(r => cleanQueries(r._1)).toSet)
  }

  test("semantic dedup matches the brute-force intra-cell ground truth") {
    // cells come from the engine's own deterministic exemplar
    // assignment (its cross-engine parity is the DuckDB oracle's job);
    // this spec brute-forces the dedup DECISION layer within them
    val emb = Tables.table(spark, sf0001, "embeddings")
    val cellOf = ext.Similarity.assignNearest(
      emb.select(col("vec_id"), col("embedding")),
      emb.filter(col("vec_id") %
        ext.Clustering.semanticExemplarMod(emb.count()) === 0)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cv")),
      keepEmbedding = false)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cent_id")).toMap
    val vecs = emb
      .collect().map(r => (r.getAs[Long]("vec_id"),
        cellOf(r.getAs[Long]("vec_id")),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray))
    def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = (for {
      a <- vecs; b <- vecs
      if a._2 == b._2 && a._1 < b._1
      if round4(cos(a._3, b._3)) >= ext.Clustering.semanticDupThreshold
    } yield (b._1, a._1)).groupBy(_._1).map { case (drop, ps) =>
      (drop, ps.map(_._2).min)
    }.toSet
    val got = ext.Clustering.dedupSemantic(spark, sf0001)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("kept_by"))).toSet
    assert(got == expected)
    assert(got.nonEmpty) // the corpus has intra-cell near-dups
  }

  test("source KL: non-negative, zero iff source matches corpus, partition of tokens") {
    val out = ext.Text.sourceKl(spark, sf0001).collect()
    val corpusTokens = Tables.table(spark, sf0001, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(out.map(_.getAs[Long]("n_tokens")).sum == corpusTokens)
    val kls = out.map(_.getAs[Double]("kl_corpus"))
    kls.foreach(k => assert(k >= 0.0)) // Gibbs' inequality
    assert(kls.max > 0.0) // sources genuinely differ from the mix
  }

  test("source overlap matches a brute-force shingle-set recomputation") {
    def shingleSet(text: String): Set[String] = {
      val t = text.split(" ", -1)
      if (t.length >= 3) t.sliding(3).map(_.mkString(" ")).toSet
      else Set(t.mkString(" "))
    }
    val bySource = Tables.table(spark, sf0001, "documents")
      .select(col("source"), col("text")).as[(String, String)].collect()
      .groupBy(_._1).map { case (src, rows) =>
        src -> rows.map(r => shingleSet(r._2)).reduce(_ ++ _)
      }
    def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = (for {
      (sa, setA) <- bySource; (sb, setB) <- bySource
      if sa < sb
      shared = (setA & setB).size
      if shared > 0
    } yield (sa, sb, shared.toLong,
      round4(shared.toDouble / (setA.size + setB.size - shared)))).toSet
    val got = ext.Dedup.sourceOverlap(spark, sf0001).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b"),
        r.getAs[Long]("n_shared"), r.getAs[Double]("jaccard"))).toSet
    assert(got == expected)
    assert(got.nonEmpty) // planted near-dups cross source boundaries
  }

  test("length outliers match an exact replay of the sketch bucket math") {
    val gamma = queries.Advanced.ddGamma
    val lens = Tables.table(spark, sf0001, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .as[(Long, Int)].collect()
    val counts = lens.map { case (_, n) =>
      math.ceil(math.log(n.toDouble) / math.log(gamma)).toInt
    }.groupBy(identity).map { case (b, xs) => b -> xs.length.toLong }
    val m = lens.length.toLong
    val rank = math.ceil(0.99 * m).toLong
    var cum = 0L
    val bkt = counts.toSeq.sortBy(_._1).find { case (_, c) =>
      cum += c; cum >= rank
    }.get._1
    val p99 = BigDecimal(2.0 * math.pow(gamma, bkt) / (gamma + 1.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = lens.filter(_._2 > p99).map(_._1).toSet
    val got = ext.Text.lengthOutliers(spark, sf0001).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(got == expected)
    // a genuine tail: ~1% nominal, up to a few % at small corpus sizes
    // (bucket granularity + the ≤1% relative cutoff error)
    assert(got.nonEmpty && got.size < lens.length / 20)
  }

  test("zipf slope: negative for every source and matches least-squares recomputation") {
    val freqs = Tables.table(spark, sf0001, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .groupBy("source", "token").count()
      .as[(String, String, Long)].collect()
      .groupBy(_._1)
    val expected = freqs.map { case (src, rows) =>
      val ranked = rows.sortBy(r => (-r._3, r._2)).zipWithIndex
        .map { case (r, i) => (math.log((i + 1).toDouble), math.log(r._3.toDouble)) }
      val n = ranked.length
      val mx = ranked.map(_._1).sum / n
      val my = ranked.map(_._2).sum / n
      val cov = ranked.map { case (x, y) => (x - mx) * (y - my) }.sum / n
      val vx = ranked.map { case (x, _) => (x - mx) * (x - mx) }.sum / n
      src -> cov / vx
    }
    val got = ext.Text.zipfSlope(spark, sf0001).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("vocab_size"),
        r.getAs[Double]("zipf_slope")))
    assert(got.nonEmpty)
    got.foreach { case (src, vocab, slope) =>
      assert(vocab == freqs(src).length)
      assert(slope < 0.0) // frequency falls with rank
      assert(math.abs(slope - expected(src)) < 1e-3)
    }
  }

  test("PQ ANN: exact rerank sims, well-formed ranks, recall beats chance") {
    val emb = Tables.table(spark, sf0001, "embeddings")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = ext.Similarity.annPq(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("sim"), r.getAs[Int]("rank")))
    // 5 ranks per query, 1-based, sims are the EXACT float cosines
    // (the rerank stage guarantees quantization error never reaches the
    // reported score), descending within each query
    val perQ = got.groupBy(_._1)
    assert(perQ.nonEmpty)
    perQ.foreach { case (q, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1 to 5), s"query $q ranks")
      val byRank = rows.sortBy(_._4)
      assert(byRank.map(_._3).toSeq == byRank.map(_._3).sortBy(-(_: Double)).toSeq)
      rows.foreach { case (_, n, sim, _) =>
        assert(n != q)
        assert(sim == round4(cos(emb(q), emb(n))), s"($q,$n) sim not exact")
      }
    }
    // ADC shortlist quality: recall@5 vs brute force far above the
    // ~0.01 chance level (deterministic 0.4 on this corpus — aggressive
    // 4-byte codes; the measurement the rerank/eval stages exist for)
    val bf = ext.Similarity.annBruteForce(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val hits = got.count { case (q, n, _, _) => bf((q, n)) }
    assert(hits.toDouble / bf.size >= 0.3, s"recall ${hits.toDouble / bf.size}")
  }

  test("linreg quality fit matches a brute-force normal-equations recomputation") {
    val rows = Tables.table(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (_, text) =>
        val t = text.split(" ", -1)
        val n = t.length.toDouble
        val score = BigDecimal(math.min(n / 100.0, 1.0) * 0.5 + (t.distinct.length / n) * 0.5)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (t.length.toLong, text.length.toLong, math.round(score * 10000))
      }
    // exact integer moments, then the same Cramer solve as the operator
    val (s00, s01, s02) = (rows.length.toDouble, rows.map(_._1).sum.toDouble, rows.map(_._2).sum.toDouble)
    val s11 = rows.map(r => r._1 * r._1).sum.toDouble
    val s12 = rows.map(r => r._1 * r._2).sum.toDouble
    val s22 = rows.map(r => r._2 * r._2).sum.toDouble
    val t0 = rows.map(_._3).sum.toDouble / 10000.0
    val t1 = rows.map(r => r._1 * r._3).sum.toDouble / 10000.0
    val t2 = rows.map(r => r._2 * r._3).sum.toDouble / 10000.0
    val tt = rows.map(r => r._3 * r._3).sum.toDouble / 1e8
    val det = s00 * (s11 * s22 - s12 * s12) - s01 * (s01 * s22 - s12 * s02) +
      s02 * (s01 * s12 - s11 * s02)
    val b0 = (t0 * (s11 * s22 - s12 * s12) - s01 * (t1 * s22 - s12 * t2) +
      s02 * (t1 * s12 - s11 * t2)) / det
    val b1 = (s00 * (t1 * s22 - s12 * t2) - t0 * (s01 * s22 - s12 * s02) +
      s02 * (s01 * t2 - t1 * s02)) / det
    val b2 = (s00 * (s11 * t2 - t1 * s12) - s01 * (s01 * t2 - t1 * s02) +
      t0 * (s01 * s12 - s11 * s02)) / det
    val r2 = 1.0 - (tt - (b0 * t0 + b1 * t1 + b2 * t2)) / (tt - t0 * t0 / s00)
    val got = ext.Text.linregQuality(spark, sf0001).collect().head
    assert(got.getAs[Long]("n") == rows.length)
    assert(math.abs(got.getAs[Double]("beta_intercept") - b0) <= 1e-6)
    assert(math.abs(got.getAs[Double]("beta_n_words") - b1) <= 1e-6)
    assert(math.abs(got.getAs[Double]("beta_n_chars") - b2) <= 1e-6)
    assert(math.abs(got.getAs[Double]("r2") - r2) <= 1e-4)
    // the fit must actually explain something: longer docs saturate the
    // length term, so words carry positive weight and R² is substantial
    assert(got.getAs[Double]("beta_n_words") > 0)
    assert(got.getAs[Double]("r2") > 0.3 && got.getAs[Double]("r2") <= 1.0)
  }

  test("quality model matches a brute-force recomputation of the logistic score") {
    def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val stop = ext.Text.stopwords("en").toSet
    val expected = Tables.table(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, text) =>
        val t = text.split(" ", -1)
        val n = t.length.toDouble
        val z = ext.Text.qmBias +
          ext.Text.qmWLenSat * math.min(n / 100.0, 1.0) +
          ext.Text.qmWTtr * (t.distinct.length / n) +
          ext.Text.qmWStop * (t.count(stop) / n) +
          ext.Text.qmWWordLen * (text.length / n / 10.0)
        val s = round4(1.0 / (1.0 + math.exp(-z)))
        (id, s, s >= 0.5)
      }.toSet
    val got = ext.Text.qualityModel(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"),
        r.getAs[Boolean]("keep"))).toSet
    assert(got == expected)
    assert(got.exists(_._3) && got.exists(!_._3)) // the cut separates the corpus
  }

  test("dsir weights: target-language docs score higher and the weight matches a replay") {
    def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = ext.Text.dsirWeights(spark, sf0001).collect()
    val n = Tables.table(spark, sf0001, "documents").count()
    assert(rows.length == n) // every document is scored
    val byLang = rows.groupBy(_.getAs[String]("lang"))
      .view.mapValues(rs => rs.map(_.getAs[Double]("log_weight")).sum / rs.length)
    // the target language's docs must be markedly more target-like on
    // average than every other language's
    val tgtMean = byLang(ext.Text.dsirTargetLang)
    byLang.filterKeys(_ != ext.Text.dsirTargetLang)
      .foreach { case (_, m) => assert(tgtMean > m + 1.0) }
    rows.foreach { r =>
      assert((r.getAs[Int]("selected") == 1) == (r.getAs[Double]("log_weight") > 0))
    }
    // exact replay of the smoothed bucket math for one document
    val docs = Tables.table(spark, sf0001, "documents")
      .select("doc_id", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def buckets(text: String): Seq[Long] = {
      val t = text.split(" ").toSeq
      val feats = t ++ t.zip(t.tail).map { case (a, b) => s"$a $b" }
      feats.map { f =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
        java.lang.Long.parseLong(hex, 16) % ext.Text.dsirBuckets
      }
    }
    val tgtCounts = docs.filter(_._2 == ext.Text.dsirTargetLang)
      .flatMap(d => buckets(d._3)).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val propCounts = docs.flatMap(d => buckets(d._3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nt = tgtCounts.values.sum
    val np = propCounts.values.sum
    val d0 = docs.minBy(_._1)
    val expected = round4(buckets(d0._3).map { b =>
      math.log((tgtCounts.getOrElse(b, 0L) + 1).toDouble / (nt + ext.Text.dsirBuckets)) -
        math.log((propCounts(b) + 1).toDouble / (np + ext.Text.dsirBuckets))
    }.sum)
    val got = rows.find(_.getAs[Long]("doc_id") == d0._1).get.getAs[Double]("log_weight")
    assert(got == expected)
  }

  test("semantic decontamination flags are sound and high-sim cross pairs are caught") {
    val emb = Tables.table(spark, sf0001, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val bench = emb.filter(_._1 % 50 == 0)
    val train = emb.filter(_._1 % 50 != 0)
    val truth = (for {
      (tid, tv) <- train; (bid, bv) <- bench
      s = cos(tv, bv) if s >= 0.4
    } yield (tid, bid, s)).toSeq
    val flagged = ext.Similarity.decontaminateSemantic(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("train_id"), r.getAs[Double]("best_sim"))).toMap
    assert(flagged.nonEmpty) // the corpus plants at least one cross leak
    // soundness: every flagged train vector has a true benchmark
    // neighbor at the threshold (the exact-verify step guarantees it)
    flagged.keys.foreach(tid => assert(truth.exists(_._1 == tid)))
    // recall guarantee in the paraphrase regime: banding at these
    // parameters is near-certain at cosine >= 0.9
    truth.filter(_._3 >= 0.9).foreach { case (tid, _, _) =>
      assert(flagged.contains(tid))
    }
  }

  test("apply mix: kept counts track the planned per-source budget") {
    val rows = ext.Text.applyMix(spark, sf0001).collect()
    val weights = ext.Text.sourceWeights(spark, sf0001).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("weight")).toMap
    assert(rows.map(_.getAs[String]("source")).toSet == weights.keySet)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val n = r.getAs[Long]("n_docs")
      val kept = r.getAs[Long]("n_kept")
      val rate = r.getAs[Double]("rate")
      assert(rate > 0.0 && rate <= 1.0)
      assert(kept <= n)
      // the planned budget for this source, saturated at the population
      val planned = math.min(n.toDouble, weights(src) * ext.Text.mixTargetDocs)
      // hash-mod sampling binomial tolerance (populations are ~25 docs
      // at sf0.001 — allow generous slack, determinism is the point)
      assert(math.abs(kept - planned) <= math.max(5.0, 0.5 * planned),
        s"$src kept=$kept planned=$planned")
    }
    // deterministic: identical on re-run
    val again = ext.Text.applyMix(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("epoch plan: repeats bracket the planned target and totals approximate the budget") {
    val rows = ext.Text.epochPlan(spark, sf0001).collect()
    val weights = ext.Text.sourceWeights(spark, sf0001).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("weight")).toMap
    var effectiveTotal = 0L
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val base = r.getAs[Long]("base_repeats")
      val eff = r.getAs[Long]("effective_docs")
      val target = weights(r.getAs[String]("source")) * ext.Text.epochTargetDocs
      assert(base == math.floor(target / n).toLong)
      // effective docs sit between whole-epoch floors and ceilings
      assert(eff >= n * base && eff <= n * (base + 1))
      effectiveTotal += eff
    }
    // hash-cut noise aside, the schedule delivers roughly the budget
    assert(math.abs(effectiveTotal - ext.Text.epochTargetDocs)
      <= ext.Text.epochTargetDocs / 10)
  }

  test("count-min estimates never under-count and respect the width error bound") {
    val rows = ext.Text.tokenCms(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val n = Tables.table(spark, sf0001, "documents")
      .select(explode(split(col("text"), " "))).count()
    // CMS over-estimates only, and by at most 2N/width with high
    // probability (depth 4 ⇒ all 25 probes holding it is the expected
    // case, and deterministic here since the hashes are fixed)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_n")
      val est = r.getAs[Long]("cms_n")
      assert(est >= exact)
      assert(est - exact <= 2 * n / ext.Text.cmsWidth)
    }
    // the probe set includes genuinely present and absent tokens
    assert(rows.exists(_.getAs[Long]("exact_n") > 0))
  }

  test("count-min sketches merge cell-wise: sketch(A ∪ B) = sketch(A) ⊎ sketch(B)") {
    val toks = Tables.table(spark, sf0001, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    def cells(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), Long] =
      ext.Text.cmsSketch(df).collect()
        .map(r => (r.getAs[Int]("d"), r.getAs[Long]("b")) -> r.getAs[Long]("n"))
        .toMap
    val whole = cells(toks)
    val a = cells(toks.filter(col("doc_id") % 2 === 0))
    val b = cells(toks.filter(col("doc_id") % 2 =!= 0))
    val merged = (a.keySet ++ b.keySet)
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged == whole)
  }

  test("zorder layout: buckets are 2-D tiles and the morton kernel matches a bit replay") {
    // bit-by-bit reference interleave vs the shift-mask kernel
    def naiveMorton(x: Long, y: Long): Long = {
      var z = 0L
      var i = 0
      while (i < 31) {
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
        i += 1
      }
      z
    }
    for (x <- Seq(0L, 1L, 149L, 490L, 12345L, 0x7FFFFFFFL);
         y <- Seq(0L, 1L, 63L, 490L, 0x7FFFFFFFL)) {
      assert(functions.ZOrderKernels.morton(x, y) == naiveMorton(x, y))
    }
    // every Z-prefix bucket is a tile: with shift=12, 6 free bits per
    // dimension → both extents < 64 in EVERY bucket (a 1-D sort cannot
    // bound the second dimension)
    val rows = ext.Layout.zorderLayout(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val free = ext.Layout.zorderShift / 2
    rows.foreach { r =>
      assert(r.getAs[Long]("x_max") - r.getAs[Long]("x_min") < (1L << free))
      assert(r.getAs[Long]("y_max") - r.getAs[Long]("y_min") < (1L << free))
    }
    // buckets partition the table
    val n = Tables.table(spark, sf0001, "events").count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == n)
  }

  test("z-clustered files keep a cross-dimension predicate local; a 1-D sort cannot") {
    import org.apache.spark.sql.functions.input_file_name
    // sf0.01: 150 distinct x and ~490 distinct y — real 2-D geometry
    // (sf0.001 has only 15 users, so any x predicate is degenerate)
    val ev = Tables.table(spark, "/root/testdata/sf0.01", "events")
      .select(col("user_id").as("x"), floor(col("value")).cast("long").as("y"))
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    val nFiles = 16
    ev.repartitionByRange(nFiles,
        functions.ZOrderExpressions.mortonCode(col("x"), col("y")))
      .write.parquet(s"$base/zsort")
    ev.repartitionByRange(nFiles, col("x")).write.parquet(s"$base/xsort")
    // files containing rows matching a predicate = the lower bound any
    // min/max-stats pruner must read; clustering quality IS this count
    def touched(layout: String, pred: org.apache.spark.sql.Column): Long =
      spark.read.parquet(s"$base/$layout").filter(pred)
        .select(input_file_name()).distinct().count()
    // a y-only predicate: the x-sorted layout smears it across every
    // file (no pruning power in the second dimension); the Z layout
    // keeps it inside the low-y tiles
    // y<=30 holds ~46% of rows (value is skewed low), so even perfect
    // clustering needs ~7 of 16 equi-count files — the assertion is the
    // qualitative gap, not a tile-perfect bound
    val yPred = col("y").between(0, 30)
    assert(touched("xsort", yPred) == nFiles)
    assert(touched("zsort", yPred) < touched("xsort", yPred))
    assert(touched("zsort", yPred) <= nFiles * 3 / 4)
    // a 2-D point-range lookup stays local under Z too
    val both = col("x").between(0, 15) && yPred
    assert(touched("zsort", both) <= nFiles / 4)
  }

  test("label outliers: bottom-k per label, ascending by centroid cosine") {
    val nLabels = Tables.table(spark, sf0001, "embeddings")
      .select(col("label")).distinct().count()
    val byLabel = ext.Clustering.labelOutliers(spark, sf0001)
      .collect().groupBy(_.getAs[Int]("label"))
    assert(byLabel.size == nLabels)
    byLabel.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq ==
        (1 to ext.Clustering.outliersPerLabel))
      val cos = sorted.map(_.getAs[Double]("cos_centroid"))
      cos.foreach(c => assert(c >= -1.0001 && c <= 1.0001))
      assert(cos.zip(cos.tail).forall { case (a, b) => a <= b }) // least central first
    }
  }

  test("hybrid RRF scores decompose into reciprocal ranks of the two sides") {
    val k = ext.Retrieval.rrfK
    val topK = ext.Retrieval.bm25TopK
    // every legal fused score: lex-only, dense-only, or both
    val singles = (1 to topK).map(r => BigDecimal(1.0 / (k + r))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val legal = (singles ++ (for (a <- 1 to topK; b <- 1 to topK)
      yield BigDecimal(1.0 / (k + a) + 1.0 / (k + b))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    val rows = ext.Retrieval.hybridRrf(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("query_doc")).values.foreach { rs =>
      val ranked = rs.sortBy(_.getAs[Int]("rank"))
      assert(ranked.map(_.getAs[Int]("rank")).toSeq == (1 to ranked.length))
      val scores = ranked.map(_.getAs[Double]("rrf"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      scores.foreach(s => assert(legal.contains(s), s"illegal RRF value $s"))
    }
    // the lexical side really participates: every BM25 top hit for the
    // shared queries must be present in the fused candidate pool means
    // rank-1 lex docs appear unless pushed out by dense-agreement —
    // check the weaker, exact property that some fused score exceeds
    // the single-side maximum only when both sides retrieved the doc
    val bothMax = BigDecimal(2.0 / (k + 1))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach(r => assert(r.getAs[Double]("rrf") <= bothMax))
  }

  test("contrastive pairs: positive is the min near-dup partner, negatives never near-dups") {
    val pairs = ext.Dedup.minhashLsh(spark, sf0001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val sym = (pairs ++ pairs.map(_.swap)).toSet
    val out = ext.Retrieval.contrastivePairs(spark, sf0001).collect()
    assert(out.nonEmpty)
    val anchors = out.map(_.getAs[Long]("anchor")).toSet
    assert(anchors.subsetOf(sym.map(_._1))) // only near-dup docs anchor
    out.groupBy(_.getAs[Long]("anchor")).foreach { case (a, rows) =>
      val pos = rows.map(_.getAs[Long]("positive")).distinct
      assert(pos.length == 1)
      assert(pos.head == sym.collect { case (x, p) if x == a => p }.min)
      assert(rows.length <= ext.Retrieval.contrastiveK)
      assert(rows.map(_.getAs[Int]("neg_rank")).sorted.toSeq == (1 to rows.length))
      rows.foreach { r =>
        val n = r.getAs[Long]("negative")
        assert(n != a && n != pos.head)
        assert(!sym.contains((a, n))) // a negative is never a near-dup of its anchor
      }
    }
  }

  test("cohortRetention matches a brute-force per-user recomputation") {
    import java.time.{DayOfWeek, LocalDate}
    import java.time.temporal.TemporalAdjusters
    def week(d: java.sql.Timestamp): LocalDate =
      d.toLocalDateTime.toLocalDate.`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
    val ev = Tables.events(spark, sf0001)
      .select("user_id", "ts").as[(Long, java.sql.Timestamp)].collect()
    val firsts = ev.groupBy(_._1).map { case (u, rows) => u -> rows.map(r => week(r._2)).min }
    val active = ev.map { case (u, ts) => (u, week(ts)) }.distinct
    val expected = active
      .map { case (u, w) =>
        (firsts(u), java.time.temporal.ChronoUnit.WEEKS.between(firsts(u), w).toInt) }
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val got = queries.Advanced.cohortRetention(spark, sf0001).collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_week").toLocalDate,
        r.getAs[Int]("week_offset")) ->
        (r.getAs[Long]("n_users"), r.getAs[Double]("retention"))).toMap
    assert(got.keySet == expected.keySet && got.nonEmpty)
    got.foreach { case (k @ (cw, off), (n, ret)) =>
      assert(n == expected(k), s"cohort $cw offset $off")
      val base = expected((cw, 0))
      assert(ret == BigDecimal(n.toDouble / base)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      if (off == 0) assert(ret == 1.0) // everyone is active in their first week
    }
  }

  test("lshRecall: config sweep is monotone and reconciles with the truth set") {
    val nTruth = ext.Dedup.ngramJaccard(spark, sf0001).count()
    val rows = ext.Dedup.lshRecall(spark, sf0001).collect()
      .map(r => r.getAs[Int]("r") ->
        (r.getAs[Int]("b"), r.getAs[Long]("n_truth"), r.getAs[Long]("n_candidates"),
          r.getAs[Long]("n_detected"), r.getAs[Double]("recall"),
          r.getAs[Double]("theory_recall"))).toMap
    assert(rows.keySet == ext.Dedup.lshSweepConfigs.map(_._1).toSet)
    rows.foreach { case (r, (b, truth, cand, det, recall, theory)) =>
      assert(r * b == ext.Dedup.mhErrorSeeds) // the sweep splits one signature
      assert(truth == nTruth)
      assert(det <= math.min(truth, cand)) // detected pairs are candidates AND true
      assert(recall == BigDecimal(det.toDouble / truth)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      // with n_truth ~25 pairs, binomial σ ≤ 0.1 — measured recall within
      // a few σ of theory; a gross gap means a broken signature/banding
      assert(math.abs(recall - theory) < 0.3, s"r=$r recall=$recall theory=$theory")
    }
    // the knob trades candidates for recall: both shrink as r grows
    val byR = rows.toSeq.sortBy(_._1).map(_._2)
    assert(byR.sliding(2).forall { case Seq((_, _, c1, _, re1, t1), (_, _, c2, _, re2, t2)) =>
      c2 <= c1 && re2 <= re1 && t2 <= t1 })
    // the sweep must actually span the curve: full recall at r=1, a real
    // collapse by r=16 (else the sweep measures nothing)
    assert(rows(1)._5 == 1.0)
    assert(rows(16)._5 < 1.0)
  }

  test("minhashError: estimate bounded, error consistent, pairs = verified LSH pairs") {
    val verified = ext.Dedup.minhashLshPairs(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jaccard")).toMap
    val rows = ext.Dedup.minhashError(spark, sf0001).collect()
    val got = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
      (r.getAs[Double]("jaccard"), r.getAs[Double]("est"), r.getAs[Double]("abs_err"))).toMap
    assert(got.keySet == verified.keySet && got.nonEmpty)
    got.foreach { case (pair, (j, est, err)) =>
      assert(j == verified(pair))
      // est is a fraction of k matching components: in [0,1] on the 1/k grid
      assert(est >= 0.0 && est <= 1.0)
      assert(math.abs(est * ext.Dedup.mhErrorSeeds -
        math.round(est * ext.Dedup.mhErrorSeeds)) < 1e-6)
      assert(math.abs(err - math.abs(j - est)) <= 1e-4)
    }
    // k=16 ⇒ σ ≈ √(j(1−j)/16) ≤ 0.125; planted pairs sit at j ≥ 0.6 so the
    // MEAN |error| must land well under 2σ — a broken hash family (est ~ U[0,1])
    // would blow far past this
    val meanErr = got.values.map(_._3).sum / got.size
    assert(meanErr < 0.15, s"mean |jaccard - est| = $meanErr")
  }

  test("thresholdSweep: cumulative, monotone, floor bucket = all verified pairs") {
    val verified = ext.Dedup.minhashLshPairs(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jaccard")).toMap
    val sweep = ext.Dedup.thresholdSweep(spark, sf0001).collect()
      .map(r => r.getAs[Double]("threshold") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_docs"))).toMap
    assert(sweep.keySet == Set(0.6, 0.7, 0.8, 0.9))
    // every bucket reconciles against an independent recount of the pair set
    sweep.foreach { case (t, (nPairs, nDocs)) =>
      val passing = verified.filter(_._2 >= t)
      assert(nPairs == passing.size, s"threshold $t")
      assert(nDocs == passing.keySet.flatMap(p => Set(p._1, p._2)).size, s"threshold $t")
    }
    // cumulative semantics: counts non-increasing in the threshold, and the
    // floor bucket (= jaccardThreshold) captures the whole verified set
    val ordered = sweep.toSeq.sortBy(_._1).map(_._2)
    assert(ordered.sliding(2).forall { case Seq((p1, d1), (p2, d2)) => p2 <= p1 && d2 <= d1 })
    assert(sweep(ext.Dedup.jaccardThreshold)._1 == verified.size)
  }
}
