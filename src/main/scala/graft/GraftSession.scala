package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory — every entrypoint (Verify, Bench, tests)
  * builds its session here so configs stay consistent.
  *
  * Scale-relevant settings:
  *  - shuffle.partitions sized to local cores (the 100 TB deployment
  *    overrides this; AQE coalescing handles the variance);
  *  - AQE on: runtime partition coalescing + skew-join splitting;
  *  - nanosAsLong: some driver testdata generations store `events.ts`
  *    as parquet TIMESTAMP(NANOS), which Spark's vectorized reader
  *    refuses — read as long; [[Tables.events]] adapts to whichever
  *    encoding (int64-nanos or timestamp[us]) the current files use.
  */
object GraftSession {
  def build(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
            shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // name-based SQL surface for graft-upsert tables (CREATE/INSERT/
      // DELETE/VERSION AS OF against `graft.`<path>``)
      .config("spark.sql.catalog.graft", "graft.io.GraftUpsertCatalog")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // INT64 micros, not legacy INT96: INT96 carries NO usable footer
      // statistics, which blanks min/max data skipping and aggregate
      // pushdown on every timestamp column the engine writes (the
      // read path still decodes INT96 for externally-written files)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
