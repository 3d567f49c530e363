package graft.pipeline

import java.sql.Timestamp
import java.time.{Instant, LocalDate, ZoneOffset}

/** A22: load-window planner, ported from `symbols(historical)/utils.py:25-58`.
  *
  * Full load: the user window if given, else the default backfill start
  * (2015-01-01 for 1m bars, 2000-01-01 for 1d) through today. Incremental:
  * (lake max_ts - 1 day) through today — the 1-day overlap is deliberately
  * re-fetched and deduped downstream by the strict `ts >` watermark filter
  * (BarOps.newerThan).
  */
object Windows {

  /** Bar granularity: carries the REST path segment (`/range/1/<timespan>/`,
    * polygon_client.py:57-69) and the lake's `source=` level
    * (ingest_massive.py:90-92) alongside the default backfill start. */
  sealed trait Granularity {
    def defaultStart: String
    def timespan: String
    def sourceName: String
  }
  case object OneMinute extends Granularity {
    val defaultStart = "2015-01-01"; val timespan = "minute"; val sourceName = "minute"
  }
  case object OneDay extends Granularity {
    val defaultStart = "2000-01-01"; val timespan = "day"; val sourceName = "daily"
  }

  final case class LoadWindow(start: String, end: String)

  def determine(fullLoad: Boolean, granularity: Granularity,
      userWindow: Option[(String, String)], lakeMaxTs: => Option[Timestamp],
      today: LocalDate = LocalDate.now(ZoneOffset.UTC)): LoadWindow = {
    if (fullLoad) {
      userWindow match {
        case Some((s, e)) => LoadWindow(s, e)
        case None         => LoadWindow(granularity.defaultStart, today.toString)
      }
    } else {
      lakeMaxTs match {
        case Some(ts) =>
          val start = Instant.ofEpochMilli(ts.getTime)
            .atZone(ZoneOffset.UTC).toLocalDate.minusDays(1)
          LoadWindow(start.toString, today.toString)
        case None => // empty lake: incremental degenerates to full
          LoadWindow(granularity.defaultStart, today.toString)
      }
    }
  }
}
