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

  sealed trait Granularity { def defaultStart: String }
  case object OneMinute extends Granularity { val defaultStart = "2015-01-01" }
  case object OneDay extends Granularity { val defaultStart = "2000-01-01" }

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
