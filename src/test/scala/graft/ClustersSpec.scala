package graft

import org.apache.spark.sql.functions._

import graft.ext.Clusters

/** Connected-components closure over near-dup candidate pairs
  * (alternating large-star/small-star rewrites).
  */
class ClustersSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: (Long, Long)*): Map[Long, Long] =
    Clusters.connectedComponents(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap

  test("a transitive chain collapses to one component rooted at the min id") {
    // a~b, b~c, c~d with ids out of order: pairwise min-neighbor keeper
    // assignment would split this; closure must not
    val m = cc((7L, 3L), (3L, 9L), (9L, 5L))
    assert(m == Map(3L -> 3L, 5L -> 3L, 7L -> 3L, 9L -> 3L))
  }

  test("disjoint components keep separate roots; duplicate and self edges are ignored") {
    val m = cc((1L, 2L), (2L, 1L), (4L, 4L), (5L, 6L))
    assert(m == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L))
    // 4's only edge is a self-loop — it never appears
  }

  test("a long path converges (log-round star contraction, not diameter-bound)") {
    // 64-node path with shuffled ids: diameter 63 must converge well
    // inside maxIter=25 rounds, which only O(log n) contraction can do
    val ids = scala.util.Random.shuffle((100L to 163L).toVector)
    val edges = ids.sliding(2).map(p => (p(0), p(1))).toSeq
    val m = cc(edges: _*)
    assert(m.keySet == ids.toSet)
    assert(m.values.toSet == Set(ids.min))
  }

  test("star and clique shapes resolve to the hub/min id") {
    val star = cc((10L, 11L), (10L, 12L), (10L, 13L))
    assert(star.values.toSet == Set(10L))
    val clique = cc((20L, 21L), (20L, 22L), (21L, 22L))
    assert(clique.values.toSet == Set(20L))
  }

  test("dedupClusters emits one keeper per component with consistent sizes") {
    val rows = Clusters.dedupClusters(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty) // corpus has planted near-dups
    val byKeeper = rows.groupBy(_._2)
    byKeeper.foreach { case (keeper, members) =>
      // keeper is a member of its own cluster and the smallest id in it
      assert(members.exists(_._1 == keeper))
      assert(members.map(_._1).min == keeper)
      // the window-computed cluster_size matches the actual group size
      assert(members.map(_._3).toSet == Set(members.length.toLong))
    }
    // closure is consistent with the pairwise edge set: every LSH pair
    // lands in the same cluster
    val keeperOf = rows.map(r => r._1 -> r._2).toMap
    ext.Dedup.minhashLsh(spark, sf0001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
      .foreach { case (a, b) => assert(keeperOf(a) == keeperOf(b)) }
  }

  test("leakage-safe split: near-dup pairs never straddle splits; totals partition the corpus") {
    // reconstruct each doc's assignment with the same keeper-hash rule
    val keeperOf = Clusters.dedupClusters(spark, sf0001)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    def bucket(key: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(key.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % 100
    }
    def splitOf(doc: Long): String = {
      val b = bucket(keeperOf.getOrElse(doc, doc))
      if (b < 80) "train" else if (b < 90) "validation" else "test"
    }
    // no LSH near-dup pair crosses a split boundary
    ext.Dedup.minhashLsh(spark, sf0001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
      .foreach { case (a, b) => assert(splitOf(a) == splitOf(b)) }
    // per-split doc counts match the brute-force assignment
    val docs = Tables.table(spark, sf0001, "documents")
      .select("doc_id").as[Long].collect()
    val expected = docs.groupBy(splitOf).map { case (s, ds) => s -> ds.length.toLong }
    val got = Clusters.leakageSafeSplit(spark, sf0001)
      .select("split", "n_docs").as[(String, Long)].collect().toMap
    assert(got == expected)
    assert(got.values.sum == docs.length)
  }

  test("dup pagerank matches a brute-force power-iteration recomputation") {
    val pairs = ext.Dedup.minhashLsh(spark, sf0001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    var pr = adj.keys.map(_ -> 1.0).toMap
    for (_ <- 1 to Clusters.prIterations) {
      // incoming mass: each neighbor m sends pr(m)/deg(m) along its edge
      pr = adj.map { case (n, ns) =>
        n -> (0.15 + 0.85 * ns.toSeq.map(m => pr(m) / adj(m).size).sum)
      }
    }
    def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Clusters.dupPageRank(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("pagerank"))).toMap
    assert(got.keySet == pr.keySet)
    got.foreach { case (n, v) => assert(math.abs(v - round4(pr(n))) <= 1e-4, s"doc $n") }
    // teleport + conservation on a symmetric graph: total mass stays |V|
    assert(math.abs(got.values.sum - got.size) < 0.01 * got.size)
  }

  test("dedupKeep keeps exactly one member per cluster; min-id when no media marks apply") {
    val all = Tables.table(spark, sf0001, "documents")
      .select("doc_id").as[Long].collect().toSet
    val comp = Clusters.dedupClusters(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    val members = comp.map(_._1).toSet
    val nComponents = comp.map(_._2).toSet.size
    val kept = Clusters.dedupKeep(spark, sf0001)
      .select("doc_id").as[Long].collect().toSet
    assert(members.nonEmpty && members.size > nComponents)
    // one survivor per component, every unclustered doc untouched —
    // invariant under ANY keeper choice (media-aware or min-id)
    assert(kept.size == all.size - (members.size - nComponents))
    assert((all -- members).subsetOf(kept))
    val keptMembers = kept.intersect(members)
    assert(keptMembers.size == nComponents)
    // the media-dropped set decides keeper ELIGIBILITY, not membership:
    // a kept member that is media-dropped is only legal when its whole
    // component is media-dropped
    val mediaDropped = ext.Multimodal.mediaDedupAssignments(spark, sf0001)
      .filter(col("doc_id") =!= col("keeper_id"))
      .select("doc_id").as[Long].collect().toSet
    val byComp = comp.groupBy(_._2)
    keptMembers.foreach { k =>
      if (mediaDropped.contains(k)) {
        val mates = byComp(comp.find(_._1 == k).get._2).map(_._1)
        assert(mates.forall(mediaDropped.contains),
          s"media-dropped doc $k kept while a clean component mate existed")
      }
    }
  }

  test("media-aware keeper selection: dropped docs are ineligible unless the whole component is") {
    // component 10: mixed eligibility — 10 (dropped) loses keeper to 12
    // (clean) despite the smaller id; component 20: all dropped — plain
    // min-id fallback; component 30: none dropped — plain min-id
    val member = Seq(
      (10L, 10L, true), (11L, 10L, true), (12L, 10L, false),
      (20L, 20L, true), (21L, 20L, true),
      (30L, 30L, false), (31L, 30L, false))
      .toDF("doc_id", "component", "mdrop")
    val got = Clusters.mediaAwareKeepers(member)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 12L, 20L -> 20L, 30L -> 30L))
  }

  test("dedupRates reconciles with the documents table and the survivor corpus") {
    val rates = Clusters.dedupRates(spark, sf0001).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_dropped"),
          r.getAs[Long]("n_kept"), r.getAs[Double]("dup_rate"))).toMap
    // per-source totals are exactly the raw corpus counts
    val raw = Tables.table(spark, sf0001, "documents")
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(rates.keySet == raw.keySet)
    rates.foreach { case (src, (nDocs, nDropped, nKept, rate)) =>
      assert(nDocs == raw(src))
      assert(nKept == nDocs - nDropped)
      assert(rate == BigDecimal(nDropped.toDouble / nDocs)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // summed survivors equal the materialized survivor corpus, and the
    // per-source survivor counts match exactly — rates and dedupKeep
    // share ONE media-aware drop list (r19 review: with the rule only
    // in dedupKeep, a component whose min-id member was media-dropped
    // made the two surfaces disagree per source)
    val keptBySource = Clusters.dedupKeep(spark, sf0001)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(rates.values.map(_._3).sum == keptBySource.values.sum)
    rates.foreach { case (src, (_, _, nKept, _)) =>
      assert(keptBySource.getOrElse(src, 0L) == nKept, s"source $src") }
    // the corpus plants near-dups, so at least one source shrinks
    assert(rates.values.exists(_._2 > 0))
  }

  test("clusterStats histogram reconciles with the component assignment") {
    val comp = Clusters.dedupClusters(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("keeper_id"))
    val sizes = comp.groupBy(_._2).map(_._2.size)
    val expected = sizes.groupBy(identity).map { case (sz, g) => sz.toLong -> g.size.toLong }
    val got = Clusters.clusterStats(spark, sf0001).collect()
      .map(r => r.getAs[Long]("cluster_size") ->
        (r.getAs[Long]("n_clusters"), r.getAs[Long]("n_docs"))).toMap
    assert(got.keySet == expected.keySet && got.nonEmpty)
    got.foreach { case (sz, (nClusters, nDocs)) =>
      assert(nClusters == expected(sz))
      assert(nDocs == sz * nClusters)
      assert(sz >= 2) // an edge-derived component always has ≥ 2 members
    }
    // histogram covers every clustered document exactly once
    assert(got.values.map(_._2).sum == comp.length)
  }
}
