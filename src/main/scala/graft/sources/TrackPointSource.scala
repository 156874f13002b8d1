package graft.sources

import java.util

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 implementation of the reference's REST polling
  * source (`/root/reference/task.ts:175-205`): a directory of
  * JSON-lines track points read as a typed table, with the
  * `noEarlierThan` time filter (`task.ts:177`) realized as REAL
  * source-side pushdown — `SupportsPushDownFilters` hands the
  * predicate to the reader, which drops rows before they ever become
  * Spark rows, and `SupportsPushDownRequiredColumns` prunes parsing
  * to the projected fields (`task.ts` reads a subset of the payload;
  * here the scan never materializes unused columns at all).
  *
  * Scale: one `InputPartition` per file — parallelism follows the
  * file layout exactly like Spark's own file sources, no driver-side
  * data movement; each reader streams its file.
  *
  * Usage: `spark.read.format("graft.sources.TrackPointSource")
  * .option("path", dir).load()`.
  */
class TrackPointSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TrackPointSource.schema
  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TrackPointTable(properties.get("path"))
}

object TrackPointSource {
  /** Normalized track-point record (webhook/poll union, SURVEY §1.1):
    * ids, display name, epoch-ms time, position, emergency flag.
    */
  val schema: StructType = StructType(Seq(
    StructField("entity_id", LongType, nullable = false),
    StructField("event_id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("ts", LongType, nullable = true),
    StructField("lon", DoubleType, nullable = true),
    StructField("lat", DoubleType, nullable = true),
    StructField("emergency", BooleanType, nullable = true)))

  private[sources] val numericCols = Set("entity_id", "event_id", "ts")

  /** Which filters the source accepts: numeric comparisons on the id
    * and time columns — exactly the family the reference pushes into
    * its API query string.
    */
  private[sources] def supported(f: Filter): Boolean = f match {
    case GreaterThanOrEqual(a, _: java.lang.Number) => numericCols(a)
    case GreaterThan(a, _: java.lang.Number) => numericCols(a)
    case LessThanOrEqual(a, _: java.lang.Number) => numericCols(a)
    case LessThan(a, _: java.lang.Number) => numericCols(a)
    case EqualTo(a, _: java.lang.Number) => numericCols(a)
    case _ => false
  }
}

class TrackPointTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"trackpoints($path)"
  override def schema(): StructType = TrackPointSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new TrackPointScanBuilder(path)
}

class TrackPointScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = TrackPointSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition(TrackPointSource.supported)
    pushed = ok
    rest // residual: Spark re-applies anything we can't evaluate
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new TrackPointScan(path, required, pushed)
}

class TrackPointScan(path: String, required: StructType,
    pushed: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"TrackPointScan ReadSchema: ${required.catalogString}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val files = Option(new java.io.File(path).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("part-"))
      .sortBy(_.getName)
    files.map(f => TrackFilePartition(f.getAbsolutePath): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new TrackPointReaderFactory(required, pushed)
}

case class TrackFilePartition(file: String) extends InputPartition

class TrackPointReaderFactory(required: StructType,
    pushed: Array[Filter]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new TrackPointReader(p.asInstanceOf[TrackFilePartition].file,
      required, pushed)
}

/** Streams one JSONL file; evaluates the pushed predicates on the
  * parsed record BEFORE building a Spark row, and materializes only
  * the pruned columns.
  */
class TrackPointReader(file: String, required: StructType,
    pushed: Array[Filter]) extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val in = new java.io.BufferedReader(
    new java.io.InputStreamReader(
      new java.io.FileInputStream(file), "UTF-8"))
  private var row: InternalRow = _

  private def num(node: JsonNode, field: String): Double =
    node.get(field).asDouble()

  private def keep(node: JsonNode): Boolean = pushed.forall {
    case GreaterThanOrEqual(a, v: java.lang.Number) =>
      num(node, a) >= v.doubleValue()
    case GreaterThan(a, v: java.lang.Number) => num(node, a) > v.doubleValue()
    case LessThanOrEqual(a, v: java.lang.Number) =>
      num(node, a) <= v.doubleValue()
    case LessThan(a, v: java.lang.Number) => num(node, a) < v.doubleValue()
    case EqualTo(a, v: java.lang.Number) => num(node, a) == v.doubleValue()
    case _ => true
  }

  private def project(node: JsonNode): InternalRow = {
    val out = new GenericInternalRow(required.length)
    var i = 0
    while (i < required.length) {
      val f = required(i)
      val v = node.get(f.name)
      if (v == null || v.isNull) out.setNullAt(i)
      else f.dataType match {
        case LongType => out.setLong(i, v.asLong())
        case DoubleType => out.setDouble(i, v.asDouble())
        case BooleanType => out.setBoolean(i, v.asBoolean())
        case StringType => out.update(i, UTF8String.fromString(v.asText()))
        case dt => throw new IllegalStateException(s"unsupported $dt")
      }
      i += 1
    }
    out
  }

  override def next(): Boolean = {
    var line = in.readLine()
    while (line != null) {
      if (line.nonEmpty) {
        val node = mapper.readTree(line)
        if (keep(node)) { row = project(node); return true }
      }
      line = in.readLine()
    }
    false
  }
  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}

/** Deterministic JSONL fixture for the DSv2 source, derived from the
  * `events` table (TESTDATA.md) so the DuckDB oracle can recompute
  * the same result straight from the parquet: entity/event ids, a
  * derived callsign, epoch-ms time, a position derived from `value`,
  * and the emergency flag. Written once per scale factor under
  * `target/fixtures` (inside the repo), then reused.
  */
object TrackPointFixture {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._

  private val done = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def ensure(s: SparkSession, dir: String): String =
    done.computeIfAbsent(dir, { _ =>
      val out = new java.io.File(
        s"target/fixtures/trackpoints_${new java.io.File(dir).getName}")
        .getAbsolutePath
      if (!new java.io.File(out, "_SUCCESS").exists()) {
        graft.Tables(s, dir, "events")
          .select(to_json(struct(
            col("user_id").as("entity_id"),
            col("event_id"),
            concat(lit("u"), col("user_id")).as("name"),
            unix_millis(col("ts")).as("ts"),
            col("value").as("lon"),
            (-col("value")).as("lat"),
            (col("event_type") === "error").as("emergency"))).as("value"))
          .write.mode("overwrite").text(out)
      }
      out
    })
}

/** Deterministic CSV fixture (header + explicit schema read-back),
  * derived from `events` like [[TrackPointFixture]] — covers the
  * delimited-text leg of the source matrix.
  */
object CsvFixture {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions._

  private val done = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def ensure(s: SparkSession, dir: String): String =
    done.computeIfAbsent(dir, { _ =>
      val out = new java.io.File(
        s"target/fixtures/events_csv_${new java.io.File(dir).getName}")
        .getAbsolutePath
      if (!new java.io.File(out, "_SUCCESS").exists()) {
        graft.Tables(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            unix_millis(col("ts")).as("t"),
            col("event_type"), col("value"))
          .write.mode("overwrite").option("header", "true").csv(out)
      }
      out
    })
}
