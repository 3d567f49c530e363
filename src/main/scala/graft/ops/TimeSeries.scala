package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Recurrent time-series features — operators whose row t depends on row
  * t-1's OUTPUT, which no window frame expresses (a frame sees inputs,
  * not prior outputs). Kept in fixed-point integer arithmetic so the
  * recurrence is bit-reproducible and exactly replayable in ANSI SQL
  * (a recursive CTE), the same determinism contract as [[Graph]].
  */
object TimeSeries {

  val SCALE: Long = 1000000L

  /** Input doubles → fixed-point units on a 1e-6 grid. `floor(x·1e6+0.5)`
    * rather than round(): floor on a double is exact and identical in
    * every engine, while round()'s tie behavior differs across engines. */
  def toUnits(c: Column): Column =
    floor(c * SCALE + lit(0.5)).cast("long")

  /** Exponentially weighted moving average per key, ordered by
    * (tsCol, idCol): y_1 = x_1, y_t = (α·x_t + (100−α)·y_{t−1}) div 100
    * in integer units — the classic smoothing/decay feature (EMA price,
    * decayed engagement, drift baseline) with a replayable recurrence.
    *
    * Output: (keyCol, idCol, ewma_units), one row per input row.
    *
    * Scale shape: ONE keyed shuffle (groupBy key); the fold runs in-row
    * over the key's sorted events via the aggregate HOF — parallelism =
    * key count, state = one key's rows. The recurrence is inherently
    * sequential per key (y_t needs y_{t−1}), so per-key linearity is the
    * floor any engine pays; for keys too hot to hold in one task, bound
    * the series first (segment by day and chain boundary states — the
    * q82 incremental-state shape). */
  def ewma(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valueCol: String, alphaNum: Int): DataFrame = {
    require(alphaNum > 0 && alphaNum < 100, "alphaNum is a percentage")
    val a = alphaNum
    val b = 100 - alphaNum
    df.select(col(keyCol), struct(col(tsCol).as("ts"), col(idCol).as("id"),
        toUnits(col(valueCol)).as("xu")).as("r"))
      .groupBy(keyCol)
      .agg(sort_array(collect_list(col("r"))).as("rs"))
      .select(col(keyCol), explode(expr(
        s"""aggregate(rs,
           |  CAST(array() AS ARRAY<STRUCT<id: BIGINT, y: BIGINT>>),
           |  (acc, r) -> concat(acc, array(named_struct(
           |    'id', r.id,
           |    'y', CASE WHEN size(acc) = 0 THEN r.xu
           |         ELSE ($a * r.xu + $b * element_at(acc, -1).y) div 100
           |         END))))""".stripMargin)).as("e"))
      .select(col(keyCol), col("e.id").as(idCol), col("e.y").as("ewma_units"))
  }

  /** The recursive-CTE ANSI SQL replay of [[ewma]] for a DuckDB oracle:
    * `rowsSql` must produce (key, id, xu, rn) with rn = row_number per
    * key in (ts, id) order and xu already in units. */
  def ewmaOracleSql(rowsSql: String, alphaNum: Int): String = {
    val a = alphaNum
    val b = 100 - alphaNum
    s"WITH RECURSIVE x AS ($rowsSql), w AS (" +
      "SELECT key, id, rn, xu AS y FROM x WHERE rn = 1 " +
      "UNION ALL " +
      s"SELECT x.key, x.id, x.rn, ($a * x.xu + $b * w.y) // 100 " +
      "FROM x JOIN w ON x.key = w.key AND x.rn = w.rn + 1) " +
      "SELECT key, id, y AS ewma_units FROM w"
  }
}
