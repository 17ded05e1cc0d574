package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pushed-down aggregate shapes the upsert table can answer from
  * parquet FOOTER metadata — `COUNT(*)` from block row counts,
  * `COUNT(col)` from row counts minus null counts, `MIN/MAX(col)` from
  * column-chunk statistics. At 100 TB this is the difference between a
  * full scan and a metadata pass: one footer read per live file.
  */
sealed trait PushedAgg { def resultField: StructField }
/** COUNT(*) — always answerable from block metadata. */
case object AggRowCount extends PushedAgg {
  val resultField = StructField("cnt", LongType)
}
/** COUNT(col): rows minus nulls (footer null counts). */
final case class AggColCount(col: String) extends PushedAgg {
  val resultField = StructField(s"cnt_$col", LongType)
}
/** COUNT(partitionCol): the dir value decides null-ness for the whole
  * file, no footer stat involved.
  */
case object AggPartitionCount extends PushedAgg {
  val resultField = StructField("cnt_part", LongType)
}
final case class AggMin(col: String, dt: DataType) extends PushedAgg {
  val resultField = StructField(s"min_$col", dt)
}
final case class AggMax(col: String, dt: DataType) extends PushedAgg {
  val resultField = StructField(s"max_$col", dt)
}
/** SUM(col) partial, in Spark's sum result domain (integral → long,
  * fractional → double). Parquet footers carry no sums, so the footer
  * path answers only the exact cases — all-null chunks and
  * constant INTEGRAL chunks (min == max ⇒ sum = min × non-nulls,
  * overflow-checked); everything else takes the single-column per-file
  * scan. The partial is NULL when the file has no non-null value
  * (Spark's fold ignores null partials, so an all-null file must not
  * contribute a spurious 0). This is what makes AVG a metadata-family
  * aggregate: Spark decomposes partial-pushdown AVG into SUM + COUNT
  * (SPARK-37839) and folds the partials exactly.
  */
final case class AggSum(col: String, dt: DataType, resultDt: DataType)
    extends PushedAgg {
  val resultField = StructField(s"sum_$col", resultDt)
}

object UpsertAggPushdown {

  /** Files answered by the per-file SCAN fallback instead of footer
    * statistics — test-observable (same trick as
    * `UpsertStatsManifest.footerReads`): the footer fast paths' whole
    * point is that they do NOT read data pages, and a regression that
    * silently declines them to the scan produces identical answers.
    * local-mode only (executors share the JVM in every spec).
    */
  private[graft] val scanFallbackFiles =
    new java.util.concurrent.atomic.AtomicLong()

  /** Column types whose footer min/max we trust and can decode:
    * numerics, date, timestamp. Strings are excluded (parquet writers
    * may truncate binary statistics), booleans add nothing.
    */
  def statType(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | FloatType | DoubleType | DateType |
         TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** SUM's result domain per Spark's `Sum.resultType`: integral → long,
    * fractional → double; None = not summable (dates/timestamps/strings
    * decline and the row scan answers).
    */
  def sumResultType(dt: DataType): Option[DataType] = dt match {
    case IntegerType | LongType => Some(LongType)
    case FloatType | DoubleType => Some(DoubleType)
    case _ => None
  }

  /** Footer statistic value → Spark internal value; None = a physical
    * layout whose stats we do not decode (e.g. INT96 timestamps).
    * Shared by the aggregate pushdown and the data-skipping planner —
    * min/max must decode identically wherever they are consulted.
    */
  private def plainOrDate(prim: org.apache.parquet.schema.PrimitiveType): Boolean =
    prim.getLogicalTypeAnnotation == null ||
      prim.getLogicalTypeAnnotation
        .isInstanceOf[LogicalTypeAnnotation.DateLogicalTypeAnnotation]

  private def plainOrTs(prim: org.apache.parquet.schema.PrimitiveType): Boolean =
    prim.getLogicalTypeAnnotation == null ||
      prim.getLogicalTypeAnnotation.isInstanceOf[TimestampLogicalTypeAnnotation]

  private[io] def decodeStat(raw: Comparable[_],
      prim: org.apache.parquet.schema.PrimitiveType, dt: DataType): Option[Any] =
    (prim.getPrimitiveTypeName, dt) match {
      // unknown/unsigned annotations (UINT32 etc. in external files)
      // never decode: the reader reads them unsigned, the stat is the
      // signed reinterpretation — mirrored in the manifest's decodeRaw
      // so the two paths cannot prune differently
      case (PrimitiveTypeName.INT32, IntegerType | DateType)
          if plainOrDate(prim) =>
        Some(raw.asInstanceOf[java.lang.Integer].intValue())
      case (PrimitiveTypeName.INT64, LongType) if plainOrTs(prim) =>
        Some(raw.asInstanceOf[java.lang.Long].longValue())
      case (PrimitiveTypeName.INT64, TimestampType | TimestampNTZType) =>
        val v = raw.asInstanceOf[java.lang.Long].longValue()
        prim.getLogicalTypeAnnotation match {
          case t: TimestampLogicalTypeAnnotation
              if t.getUnit == LogicalTypeAnnotation.TimeUnit.MILLIS => Some(v * 1000L)
          case t: TimestampLogicalTypeAnnotation
              if t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS => Some(v / 1000L)
          case _: TimestampLogicalTypeAnnotation | null => Some(v) // micros / our writer
          // UINT_64, TIME(…), other annotations: the signed raw stat is
          // not epoch micros — same exclusion as the LongType arm (and
          // as the manifest's decodeRaw twin)
          case _ => None
        }
      case (PrimitiveTypeName.FLOAT, FloatType) =>
        Some(raw.asInstanceOf[java.lang.Float].floatValue())
      case (PrimitiveTypeName.DOUBLE, DoubleType) =>
        Some(raw.asInstanceOf[java.lang.Double].doubleValue())
      // widened-table promotions (files written before an exact type
      // widening): promote the stat the way the reader promotes the
      // values, so min/max pruning keeps working across the evolution.
      // Gated off date-annotated INT32 — days-since-epoch under an
      // integral table type would compare a different quantity.
      case (PrimitiveTypeName.INT32, LongType | DoubleType)
          if prim.getLogicalTypeAnnotation == null =>
        val v = raw.asInstanceOf[java.lang.Integer].intValue()
        Some(if (dt == LongType) v.toLong else v.toDouble)
      case (PrimitiveTypeName.FLOAT, DoubleType) =>
        Some(raw.asInstanceOf[java.lang.Float].doubleValue())
      case _ => None
    }

  /** Ordering for decoded stat values (only the [[statType]] set). */
  private[io] def cmpStat(a: Any, b: Any, dt: DataType): Int = dt match {
    case IntegerType | DateType =>
      java.lang.Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
    case LongType | TimestampType | TimestampNTZType =>
      java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case FloatType => java.lang.Float.compare(a.asInstanceOf[Float], b.asInstanceOf[Float])
    case DoubleType => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case other => throw new IllegalStateException(s"unexpected stat type $other")
  }
}

/** The aggregate-pushdown scan: one input partition per live file;
  * each reader emits ONE row of per-file partial aggregates computed
  * from the footer (falling back to scanning just that file's needed
  * columns when a statistic is absent), and Spark's final aggregation
  * folds them (SUM of counts, MIN of mins, MAX of maxes). Partition
  * pruning composes — pushed partition predicates restrict the file
  * set exactly as in the row scan.
  */
final class UpsertAggScan(path: String, tableSchema: StructType,
    partitionCol: Option[String], partitionFilters: Array[Filter],
    aggs: Seq[PushedAgg], groupByPartition: Boolean) extends Scan with Batch {

  override def readSchema(): StructType = {
    val aggFields = aggs.map(_.resultField)
    StructType(
      if (groupByPartition) StructField(partitionCol.get, StringType) +: aggFields
      else aggFields)
  }

  override def toBatch: Batch = this

  override def description(): String =
    s"graft-upsert $path [pushed aggregates: ${aggs.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    // same MOR guard as the row scan: footer aggregates over the base
    // alone would silently miss unmerged delta commits
    UpsertTableSource.requireNoLiveDeltas(spark, path)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the row scan's planning walk and predicate semantics, verbatim —
    // pushed aggregates must prune exactly like the row scan would
    UpsertTableSource.planFilePartitions(fs, new Path(path), partitionCol,
      partitionFilters)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new UpsertAggReaderFactory(tableSchema, partitionCol, aggs, groupByPartition,
      UpsertTableSource.serializableConf(),
      // captured driver-side: long-SUM overflow must throw under ANSI
      // (like Spark's Sum) and wrap under legacy semantics
      SparkSession.active.sessionState.conf.ansiEnabled)
}

final class UpsertAggReaderFactory(tableSchema: StructType,
    partitionCol: Option[String], aggs: Seq[PushedAgg], groupByPartition: Boolean,
    conf: org.apache.spark.util.SerializableConfiguration, ansi: Boolean)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new UpsertAggReader(partition.asInstanceOf[UpsertFilePartition],
      tableSchema, partitionCol, aggs, groupByPartition, conf.value, ansi)
}

/** Executor-side: aggregate ONE file from its footer; scan the file's
  * needed columns only if a required statistic is missing.
  */
final class UpsertAggReader(part: UpsertFilePartition, tableSchema: StructType,
    partitionCol: Option[String], aggs: Seq[PushedAgg], groupByPartition: Boolean,
    conf: Configuration, ansi: Boolean) extends PartitionReader[InternalRow] {

  private var done = false

  override def next(): Boolean = !done

  override def get(): InternalRow = {
    done = true
    val values = computeFromFooter().getOrElse(computeByScan())
    val out =
      if (groupByPartition)
        (if (part.partValue == null) null else UTF8String.fromString(part.partValue)) +: values
      else values
    new GenericInternalRow(out.toArray)
  }

  override def close(): Unit = ()

  /** All aggregates from the footer; None when any needed statistic is
    * absent or untrustworthy (then the per-file scan path answers).
    */
  private def computeFromFooter(): Option[Seq[Any]] = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(part.filePath), conf))
    try {
      val blocks = reader.getFooter.getBlocks
      val schema = reader.getFooter.getFileMetaData.getSchema
      val rowCount: Long = {
        var s = 0L; val it = blocks.iterator(); while (it.hasNext) s += it.next().getRowCount; s
      }
      // absent = the column is not in this file's schema (evolved-in:
      // all-null by construction); chunks = its per-block leaf chunks,
      // resolved by COLUMN PATH, never by top-level field index —
      // getColumns is in LEAF order, and any multi-leaf group column
      // (struct, map — including one written externally into the table
      // path) earlier in the schema shifts leaf positions, so a
      // positional lookup would aggregate the WRONG column's
      // statistics: a silent wrong answer, not a slow one. A field
      // with no single top-level leaf (a group) yields Left and the
      // per-file scan answers.
      def chunks(col: String): Either[Unit, Option[Seq[
          org.apache.parquet.hadoop.metadata.ColumnChunkMetaData]]] = {
        if (!schema.containsField(col)) return Right(None)
        val cs = new Array[org.apache.parquet.hadoop.metadata.ColumnChunkMetaData](blocks.size())
        var i = 0; val it = blocks.iterator()
        while (it.hasNext) {
          val cols = it.next().getColumns
          var chunk: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData = null
          var j = 0
          while (j < cols.size() && chunk == null) {
            val cc = cols.get(j)
            if (cc.getPath.size() == 1 && cc.getPath.toDotString == col) chunk = cc
            j += 1
          }
          if (chunk == null) return Left(()) // group field: no usable stats
          cs(i) = chunk; i += 1
        }
        Right(Some(cs.toSeq))
      }
      def nonNullCount(col: String): Option[Long] = chunks(col) match {
        case Left(_) => None
        case Right(None) => Some(0L) // column absent from this file = all null
        case Right(Some(cs)) =>
          var n = 0L
          for (c <- cs) {
            val st = c.getStatistics
            if (st == null || !st.isNumNullsSet) return None
            n += c.getValueCount - st.getNumNulls
          }
          Some(n)
      }
      def minMax(col: String, dt: DataType, wantMin: Boolean): Option[Option[Any]] = chunks(col) match {
        case Left(_) => None
        case Right(None) => Some(None) // all null -> no value contributes
        case Right(Some(cs)) =>
          var acc: Option[Any] = None
          for (c <- cs) {
            val st = c.getStatistics
            if (st == null || st.isEmpty) return None
            if (st.hasNonNullValue) {
              val raw = if (wantMin) st.genericGetMin() else st.genericGetMax()
              val v = UpsertAggPushdown.decodeStat(raw, c.getPrimitiveType, dt)
                .getOrElse(return None)
              acc = Some(acc match {
                case None => v
                case Some(a) =>
                  val keepA = if (wantMin) cmp(a, v, dt) <= 0 else cmp(a, v, dt) >= 0
                  if (keepA) a else v
              })
            } else if (!st.isNumNullsSet || st.getNumNulls != c.getValueCount) {
              return None // can't prove the chunk is all-null
            }
          }
          Some(acc)
      }
      // SUM from footers is exact in precisely two cases: an all-null
      // column (partial = NULL) and constant INTEGRAL chunks (min == max
      // ⇒ chunk sum = min × non-nulls, overflow-checked — overflow falls
      // back to the scan, which carries the configured ANSI semantics).
      // Fractional constants are deliberately excluded: v×n and Spark's
      // fold v+v+…+v differ in final ulps, and a metadata path must
      // never answer differently than the scan it replaces.
      def sumFromStats(col: String, dt: DataType): Option[Option[Any]] = chunks(col) match {
        case Left(_) => None
        case Right(None) => Some(None) // column absent = all null -> NULL partial
        case Right(Some(cs)) =>
          if (dt != IntegerType && dt != LongType) return None
          var acc = 0L
          var saw = false
          for (c <- cs) {
            val st = c.getStatistics
            if (st == null || st.isEmpty || !st.isNumNullsSet) return None
            val nonNull = c.getValueCount - st.getNumNulls
            if (nonNull > 0) {
              if (!st.hasNonNullValue) return None
              val mn = UpsertAggPushdown.decodeStat(st.genericGetMin(), c.getPrimitiveType, dt)
                .getOrElse(return None)
              val mx = UpsertAggPushdown.decodeStat(st.genericGetMax(), c.getPrimitiveType, dt)
                .getOrElse(return None)
              if (UpsertAggPushdown.cmpStat(mn, mx, dt) != 0) return None
              val v = dt match {
                case IntegerType => mn.asInstanceOf[Int].toLong
                case _ => mn.asInstanceOf[Long]
              }
              try acc = Math.addExact(acc, Math.multiplyExact(v, nonNull))
              catch { case _: ArithmeticException => return None }
              saw = true
            }
          }
          Some(if (saw) Some(acc) else None)
      }
      val out = aggs.map {
        case AggRowCount => rowCount
        case AggPartitionCount => if (part.partValue == null) 0L else rowCount
        case AggColCount(col) => nonNullCount(col).getOrElse(return None)
        case AggMin(col, dt) => minMax(col, dt, wantMin = true).getOrElse(return None).orNull
        case AggMax(col, dt) => minMax(col, dt, wantMin = false).getOrElse(return None).orNull
        case AggSum(col, dt, _) => sumFromStats(col, dt).getOrElse(return None).orNull
      }
      Some(out)
    } finally reader.close()
  }

  private def cmp(a: Any, b: Any, dt: DataType): Int =
    UpsertAggPushdown.cmpStat(a, b, dt)

  /** Fallback: scan only the aggregated columns of THIS file and fold
    * the partials in a tight loop — still never reads unrelated
    * columns, and only files with unusable statistics pay it.
    */
  private def computeByScan(): Seq[Any] = {
    UpsertAggPushdown.scanFallbackFiles.incrementAndGet()
    val needed = aggs.collect {
      case AggColCount(c) => c
      case AggMin(c, _) => c
      case AggMax(c, _) => c
      case AggSum(c, _, _) => c
    }.distinct
    // min/max folding must run ONLY for min/max columns: a count-only
    // column may be a string, and cmp() (rightly) has no ordering for
    // types the pushdown never allows into AggMin/AggMax
    val mmCols = aggs.collect {
      case AggMin(c, _) => c
      case AggMax(c, _) => c
    }.toSet
    // sum accumulation domain per column (long for integral, double for
    // fractional — Spark's Sum result types); the SAME column can also
    // be a min/max target, the accumulators are independent
    val sumDts: Map[String, DataType] = aggs.collect {
      case AggSum(c, _, rdt) => c -> rdt
    }.toMap
    val projected = StructType(tableSchema.fields.filter(f => needed.contains(f.name)))
    val idx = projected.fieldNames.zipWithIndex.toMap
    val counts = new java.util.HashMap[String, Long]()
    val mins = new java.util.HashMap[String, Any]()
    val maxs = new java.util.HashMap[String, Any]()
    val sumL = new java.util.HashMap[String, java.lang.Long]()
    val sumD = new java.util.HashMap[String, java.lang.Double]()
    var rowCount = 0L
    val reader = new UpsertPartitionReader(part, projected, None, conf)
    try {
      while (reader.next()) {
        val row = reader.get()
        rowCount += 1
        for (c <- needed; i = idx(c) if !row.isNullAt(i)) {
          counts.merge(c, 1L, (a, b) => a + b)
          val dt = projected.fields(i).dataType
          if (mmCols.contains(c)) {
            val v = row.get(i, dt)
            val curMin = mins.get(c)
            if (curMin == null || cmp(v, curMin, dt) < 0) mins.put(c, v)
            val curMax = maxs.get(c)
            if (curMax == null || cmp(v, curMax, dt) > 0) maxs.put(c, v)
          }
          sumDts.get(c) match {
            case Some(LongType) =>
              val v = dt match {
                case IntegerType => row.getInt(i).toLong
                case _ => row.getLong(i)
              }
              val cur = sumL.get(c)
              val prev = if (cur == null) 0L else cur.longValue()
              // ANSI: overflow throws with Spark's ARITHMETIC_OVERFLOW
              // error class (same surface as the row scan's Sum, incl.
              // the try_sum hint); legacy: wraps
              val next =
                if (ansi) {
                  try Math.addExact(prev, v)
                  catch { case _: ArithmeticException =>
                    throw org.apache.spark.sql.GraftBridge.longSumOverflow()
                  }
                } else prev + v
              sumL.put(c, next)
            case Some(_) =>
              val v = dt match {
                case FloatType => row.getFloat(i).toDouble
                case _ => row.getDouble(i)
              }
              val cur = sumD.get(c)
              sumD.put(c, if (cur == null) v else cur.doubleValue() + v)
            case None => ()
          }
        }
      }
    } finally reader.close()
    aggs.map {
      case AggRowCount => rowCount
      case AggPartitionCount => if (part.partValue == null) 0L else rowCount
      case AggColCount(c) => counts.getOrDefault(c, 0L)
      case AggMin(c, _) => mins.get(c)
      case AggMax(c, _) => maxs.get(c)
      // .get returns null when the file had no non-null value — the
      // NULL partial Spark's final Sum fold ignores
      case AggSum(c, _, rdt) =>
        if (rdt == LongType) sumL.get(c) else sumD.get(c)
    }
  }
}
