package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** OHLCV bar data model, ported from the reference's declared schemas.
  *
  * RAW wire schema: `symbols(historical)/schemas.py:6-15` and
  * `1m-seesion-pipeline/schemas.py:10-21` — short API field names, all
  * nullable. AGG lake schema: `1m-seesion-pipeline/schemas.py:29-41` —
  * `ts`/`symbol` non-null. The reference declares `volume`/`trades` as Long
  * but never enforces it at write time (it writes the raw Doubles through —
  * SURVEY.md §1.2); we implement the *declared* contract and cast at the
  * aggregation boundary.
  */
final case class RawBar(
    t: Option[Long],      // epoch millis
    o: Option[Double],
    h: Option[Double],
    l: Option[Double],
    c: Option[Double],
    v: Option[Double],    // volume (Double on the wire)
    vw: Option[Double],   // vwap
    n: Option[Double])    // trade count (Double on the wire)

final case class Bar(
    ts: Timestamp,
    symbol: String,
    open: Option[Double],
    high: Option[Double],
    low: Option[Double],
    close: Option[Double],
    volume: Option[Long],
    vwap: Option[Double],
    trades: Option[Long])

object Schemas {
  /** Wire schema — explicit, never inferred (reference passes
    * `schema=RAW_SCHEMA` to both `createDataFrame` calls). */
  val raw: StructType = StructType(Seq(
    StructField("t", LongType, nullable = true),
    StructField("o", DoubleType, nullable = true),
    StructField("h", DoubleType, nullable = true),
    StructField("l", DoubleType, nullable = true),
    StructField("c", DoubleType, nullable = true),
    StructField("v", DoubleType, nullable = true),
    StructField("vw", DoubleType, nullable = true),
    StructField("n", DoubleType, nullable = true)))

  /** Lake contract with the Long volume/trades columns enforced. */
  val agg: StructType = StructType(Seq(
    StructField("ts", TimestampType, nullable = false),
    StructField("symbol", StringType, nullable = false),
    StructField("open", DoubleType, nullable = true),
    StructField("high", DoubleType, nullable = true),
    StructField("low", DoubleType, nullable = true),
    StructField("close", DoubleType, nullable = true),
    StructField("volume", LongType, nullable = true),
    StructField("vwap", DoubleType, nullable = true),
    StructField("trades", LongType, nullable = true)))
}

/** ET trading-session buckets. Inclusive `hhmm` bounds, exactly as the
  * reference classifies them (`1m-seesion-pipeline/utils.py:7-19`): note
  * 16:00 belongs to *regular*, afterhours starts 16:01. */
sealed abstract class TradingSession(val name: String, val lo: Int, val hi: Int)

object TradingSession {
  case object Premarket extends TradingSession("premarket", 400, 929)
  case object Regular extends TradingSession("regular", 930, 1600)
  case object AfterHours extends TradingSession("afterhours", 1601, 2000)

  val all: Seq[TradingSession] = Seq(Premarket, Regular, AfterHours)

  def forName(name: String): Option[TradingSession] = all.find(_.name == name)
}
