package graft

import org.apache.spark.sql.functions._

/** Invariants of the lexical-layer operators ([[ext.Lexical]]) on the
  * sf0.001 corpus.
  */
class LexicalSpec extends SparkSpec {
  import spark.implicits._

  test("collocations: ranks are 1..k, PMI non-increasing, counts above floor") {
    val rows = ext.Lexical.collocations(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= ext.Lexical.collocTopK)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length))
    val pmis = rows.map(_.getAs[Double]("pmi"))
    assert(pmis.zip(pmis.tail).forall { case (a, b) => a >= b })
    assert(rows.forall(_.getAs[Long]("pair_count") >= ext.Lexical.collocMinCount))
  }

  test("ccnet buckets: per-source doc counts partition the corpus, thirds balanced") {
    val out = ext.Lexical.ccnetBuckets(spark, sf0001).collect()
    val perSource = out.groupBy(_.getAs[String]("source"))
    val total = out.map(_.getAs[Long]("n_docs")).sum
    // every scored doc (≥2 tokens → has bigrams) lands in exactly one bucket
    val scored = ext.Text.bigramLogprob(spark, sf0001).count()
    assert(total == scored)
    perSource.values.foreach { bs =>
      assert(bs.map(_.getAs[String]("bucket")).toSet.subsetOf(Set("head", "middle", "tail")))
      val counts = bs.map(_.getAs[Long]("n_docs"))
      // ⌈3·rn/cnt⌉ cuts are balanced within one doc
      assert(counts.max - counts.min <= 1)
      // head is the most fluent third: its floor is above tail's
      val by = bs.map(r => r.getAs[String]("bucket") -> r.getAs[Double]("min_logprob")).toMap
      for (h <- by.get("head"); t <- by.get("tail")) assert(h >= t)
    }
  }

  test("mlm masking conserves token positions and extracts exactly the masked ones") {
    val docs = Tables.table(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val out = ext.Lexical.mlmMasking(spark, sf0001)
      .join(docs, Seq("doc_id"))
      .collect()
    assert(out.nonEmpty)
    var anyMasked = false
    out.foreach { r =>
      val orig = r.getAs[String]("text").split(" ")
      val masked = r.getAs[String]("masked_text").split(" ")
      val targets = r.getAs[String]("targets")
      val tgt = if (targets.isEmpty) Array.empty[String] else targets.split(" ")
      assert(masked.length == orig.length) // corruption is positional, not destructive
      assert(tgt.length == r.getAs[Long]("n_masked"))
      // masked positions carry the marker; unmasked positions are untouched;
      // targets are the original tokens at masked positions, in order
      val maskedPos = masked.zipWithIndex.collect {
        case (t, i) if t == ext.Lexical.mlmMaskToken => i
      }
      assert(maskedPos.map(orig(_)).toSeq == tgt.toSeq)
      orig.indices.filterNot(maskedPos.contains).foreach(i => assert(masked(i) == orig(i)))
      anyMasked ||= maskedPos.nonEmpty
    }
    assert(anyMasked) // the 1/7 rate masks something in a 500-doc corpus
  }

  test("compression ratio: one row per source, estimates bounded by chars and words") {
    val out = ext.Lexical.compressionRatio(spark, sf0001).collect()
    val nSources = Tables.table(spark, sf0001, "documents")
      .select(col("source")).distinct().count()
    assert(out.length == nSources)
    out.foreach { r =>
      // a subword token is ≥1 char and a word is ≥1 subword token
      assert(r.getAs[Long]("bpe_tokens") <= r.getAs[Long]("n_chars"))
      assert(r.getAs[Long]("bpe_tokens") >= r.getAs[Long]("ws_tokens"))
      assert(r.getAs[Double]("chars_per_token") > 0.0)
      assert(r.getAs[Double]("fertility") >= 1.0)
    }
  }
}
