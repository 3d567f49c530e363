package graft.sources

import java.util

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.io.Rest

/** DataSource V2 connector for the reference's REST bar feed.
  *
  * The reference fetches symbols *serially on the driver* — a `for symbol
  * in SYMBOLS` loop (`symbols(historical)/ingest_massive.py:106`), ≥12 s
  * per page, so 193 symbols floor at 77 min/run (BASELINE.md). This
  * connector makes the extract a *table*: one `InputPartition` per
  * symbol, so a cluster fetches the universe concurrently and the rows
  * land directly in Spark's row format — `spark.read.format("graft-bars")
  * .option("symbols", "A,AA,…").load()` then the normal normalize
  * pipeline (ops/BarOps). Rate limits shift from per-process to
  * per-executor, which is what the API's per-key limits actually meter.
  *
  * Reads emit the RAW wire schema (SURVEY §1.2) plus the symbol tag;
  * normalization stays in `ops` (same separation as the reference).
  *
  * Transport: executors construct the real `JavaHttp` from options; tests
  * register an in-JVM stub under a `transportKey` (valid in local mode,
  * where executors share the driver JVM).
  */
class BarsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-bars"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BarsSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new BarsTable(new CaseInsensitiveStringMap(properties))
}

object BarsSource {
  /** symbol tag + raw wire fields (all nullable, as declared by the
    * reference's RAW_SCHEMA — schemas.py both files). */
  val schema: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("t", LongType),
    StructField("o", DoubleType), StructField("h", DoubleType),
    StructField("l", DoubleType), StructField("c", DoubleType),
    StructField("v", DoubleType), StructField("vw", DoubleType),
    StructField("n", DoubleType)))

  /** In-JVM transport registry for tests (local mode only). */
  val transports: TrieMap[String, Rest.Http] = TrieMap.empty
}

final class BarsTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"graft-bars(${options.get("symbols")})"
  override def schema(): StructType = BarsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new BarsScan(options)
}

final class BarsScan(options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan with Batch {
  private def required(key: String): String = {
    val v = options.get(key)
    require(v != null && v.nonEmpty,
      s"graft-bars requires option '$key' (symbols, baseUrl, start, end)")
    v
  }
  private val symbols = required("symbols").split(",").map(_.trim).filter(_.nonEmpty)
  require(symbols.nonEmpty, "graft-bars: 'symbols' must name at least one ticker")
  private val cfg = BarsReaderConfig(
    baseUrl = required("baseUrl"),
    start = required("start"),
    end = required("end"),
    session = Option(options.get("session")),
    timespan = Option(options.get("timespan")).getOrElse("minute"),
    transportKey = Option(options.get("transportKey")),
    interPageDelaySec = Option(options.get("interPageDelaySec"))
      .map(_.toDouble).getOrElse(12.0))
  require(cfg.timespan == "minute" || cfg.timespan == "day",
    s"graft-bars: unsupported timespan '${cfg.timespan}' (minute|day)")

  override def build(): Scan = this
  override def readSchema(): StructType = BarsSource.schema
  override def toBatch: Batch = this
  override def description(): String = s"graft-bars[${symbols.length} symbols]"

  /** One partition per symbol: the unit the reference serialized on. */
  override def planInputPartitions(): Array[InputPartition] =
    symbols.map(s => BarsPartition(s): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new BarsReaderFactory(cfg)
}

final case class BarsPartition(symbol: String) extends InputPartition

final case class BarsReaderConfig(baseUrl: String, start: String, end: String,
    session: Option[String], timespan: String, transportKey: Option[String],
    interPageDelaySec: Double) extends Serializable

final class BarsReaderFactory(cfg: BarsReaderConfig)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new BarsReader(p.asInstanceOf[BarsPartition].symbol, cfg)
}

final class BarsReader(symbol: String, cfg: BarsReaderConfig)
    extends PartitionReader[InternalRow] {
  private lazy val rows: Iterator[graft.model.RawBar] = {
    val http = cfg.transportKey.flatMap(BarsSource.transports.get).getOrElse(
      new Rest.RetryingHttp(new Rest.JavaHttp()))
    Rest.decodeRaw(Rest.fetchAggregates(http, cfg.baseUrl, symbol,
      cfg.start, cfg.end, cfg.session, cfg.timespan,
      interPageDelaySec = cfg.interPageDelaySec)).iterator
  }
  private var current: graft.model.RawBar = _

  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false

  override def get(): InternalRow = {
    def d(v: Option[Double]): Any = v.map(Double.box).orNull
    InternalRow(UTF8String.fromString(symbol),
      current.t.map(Long.box).orNull,
      d(current.o), d(current.h), d(current.l), d(current.c),
      d(current.v), d(current.vw), d(current.n))
  }

  override def close(): Unit = ()
}
