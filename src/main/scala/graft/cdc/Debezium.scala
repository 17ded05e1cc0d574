package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType, TimestampType}

import graft.model.Schemas

/** Debezium CDC envelope ingestion.
  *
  * Semantics from the reference (spark-streaming/
  * multi_source_streaming_processor.py:98-171): a Kafka-shaped input with
  * binary `key`/`value` columns is parsed in two phases —
  *
  *   1. `value` (JSON string) → envelope struct `payload{after, op, ts_ms}`
  *      where `after` stays a STRING;
  *   2. ops filtered to inserts+updates (`op ∈ {c, u}`) — deletes (`d`) and
  *      snapshot reads (`r`) are dropped (py:119, :166);
  *   3. `after` re-parsed against the declared row schema and flattened to
  *      top level, with `ts_ms` lifted to `event_timestamp` and the Kafka
  *      ingest `timestamp` to `processing_timestamp` (py:120-124).
  *
  * Everything here is pure Column expressions — identical code path in
  * batch and streaming, fully whole-stage-codegen'd, no UDFs. At 100 TB
  * this stage is a narrow projection+filter that pipelines inside the scan
  * stage with zero shuffles.
  */
object Debezium {

  /** Ops the engine keeps. Deletes are unrepresentable downstream (the
    * envelope drops `before`), matching the reference's insert/update-only
    * design (PROJECT_DOCUMENTATION.md:668).
    */
  val keptOps: Seq[String] = Seq("c", "u")

  /** Phase-1 parse of a Kafka-shaped frame: requires `value` (string or
    * binary) and optionally `topic`, `key`, `timestamp`.
    */
  def parseEnvelope(raw: DataFrame): DataFrame = {
    val base = raw
      .withColumn("value", col("value").cast("string"))
      .withColumn("parsed_value", from_json(col("value"), Schemas.cdcEnvelope))
    base
  }

  /** Filter to kept CDC operations (reference py:119). */
  def filterOps(parsed: DataFrame): DataFrame =
    parsed.filter(col("parsed_value.payload.op").isin(keptOps: _*))

  /** JSON options that keep timestamps lossless through a to_json /
    * from_json round trip (default JSON format drops sub-millisecond
    * precision).
    */
  val microsJsonOptions: Map[String, String] =
    Map("timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")

  /** Phase-2 parse + flatten against a declared row schema.
    *
    * Emits `rowSchema.*` + `event_timestamp` (epoch millis from the
    * envelope) + `processing_timestamp` (Kafka ingest time if present,
    * else current_timestamp).
    */
  def extractRows(
      filtered: DataFrame,
      rowSchema: StructType,
      structAlias: String,
      jsonOptions: Map[String, String] = Map.empty): DataFrame = {
    val procTs: Column =
      if (filtered.columns.contains("timestamp")) col("timestamp")
      else current_timestamp()
    filtered
      .select(
        from_json(col("parsed_value.payload.after"), rowSchema, jsonOptions).as(structAlias),
        col("parsed_value.payload.ts_ms").as("event_timestamp"),
        procTs.as("processing_timestamp"))
      .select(col(s"$structAlias.*"), col("event_timestamp"), col("processing_timestamp"))
  }

  /** Full pipeline: envelope parse → op filter → row extraction. */
  def parse(
      raw: DataFrame,
      rowSchema: StructType,
      structAlias: String = "row",
      jsonOptions: Map[String, String] = Map.empty): DataFrame =
    extractRows(filterOps(parseEnvelope(raw)), rowSchema, structAlias, jsonOptions)

  // ——— Debezium-faithful epoch-micros wire ———
  //
  // Real Debezium serializes Postgres TIMESTAMP columns as epoch-MICROS
  // longs (io.debezium.time.MicroTimestamp), not formatted strings
  // (PROJECT_DOCUMENTATION.md:246-262 shows the envelope; the `after`
  // payload carries numeric timestamps). Parsing longs also skips the
  // per-value DateTimeFormatter work of a string timestamp format.

  /** True when a (possibly nested) type contains a timestamp. */
  private def containsTimestamp(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case TimestampType => true
    case s: StructType => s.fields.exists(f => containsTimestamp(f.dataType))
    case a: org.apache.spark.sql.types.ArrayType => containsTimestamp(a.elementType)
    case m: org.apache.spark.sql.types.MapType =>
      containsTimestamp(m.keyType) || containsTimestamp(m.valueType)
    case _ => false
  }

  /** The micros-wire conversion handles TOP-LEVEL timestamp fields only;
    * a timestamp buried in a nested struct/array/map would silently
    * null out on parse (long vs timestamp mismatch) — fail fast instead.
    */
  private def requireFlatTimestamps(rowSchema: StructType): Unit =
    rowSchema.fields.foreach { f =>
      require(f.dataType == TimestampType || !containsTimestamp(f.dataType),
        s"micros-wire conversion supports top-level timestamps only; " +
          s"field '${f.name}' nests one inside ${f.dataType.simpleString}")
    }

  /** Wire form of a declared row schema: TimestampType → LongType
    * (epoch micros), everything else unchanged.
    */
  def wireSchema(rowSchema: StructType): StructType = {
    requireFlatTimestamps(rowSchema)
    StructType(rowSchema.fields.map { f =>
      if (f.dataType == TimestampType) f.copy(dataType = LongType) else f
    })
  }

  /** Projection serializing a logical row to its wire form (for fixture
    * generators / the Kafka producer side): timestamps → epoch micros.
    */
  def toWireCols(rowSchema: StructType): Seq[Column] = {
    requireFlatTimestamps(rowSchema)
    rowSchema.fields.toSeq.map { f =>
      if (f.dataType == TimestampType) unix_micros(col(f.name)).as(f.name)
      else col(f.name)
    }
  }

  /** Full pipeline over the epoch-micros wire: envelope parse → op
    * filter → row extraction against [[wireSchema]] → restore
    * TimestampType columns from their micros longs.
    *
    * `headerOpCol`: name of a wire column carrying the CDC op OUTSIDE
    * the JSON value — what Debezium's standard ExtractNewRecordState
    * SMT emits with `add.headers=op`. When present, dropped records are
    * filtered before ANY JSON parse (the predicate pushes to the scan);
    * without it the op filter's pushed-down form re-derives the op from
    * the envelope, parsing the JSON a second time per input row.
    */
  def parseWire(
      raw: DataFrame,
      rowSchema: StructType,
      structAlias: String = "row",
      headerOpCol: Option[String] = None): DataFrame = {
    val filtered = headerOpCol match {
      // The header is AUTHORITATIVE for the op (it comes from the same
      // Debezium record). payload.after.isNotNull then closes every
      // all-null-row path the envelope-derived filter would have
      // dropped: corrupt values (from_json yields a non-null struct
      // with a null payload — probe the field, not the struct) and
      // disagreeing headers on deletes/snapshot tombstones (their
      // `after` is null). An honest c/u record always carries `after`.
      case Some(h) =>
        parseEnvelope(raw.filter(col(h).isin(keptOps: _*)))
          .filter(col("parsed_value.payload.after").isNotNull)
      case None => filterOps(parseEnvelope(raw))
    }
    val extracted = extractRows(filtered, wireSchema(rowSchema), structAlias)
    val restored = rowSchema.fields.toSeq.map { f =>
      if (f.dataType == TimestampType) timestamp_micros(col(f.name)).as(f.name)
      else col(f.name)
    }
    extracted.select(restored :+ col("event_timestamp") :+ col("processing_timestamp"): _*)
  }
}
