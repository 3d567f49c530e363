package graft.ops

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Randomized bit-equality evidence for the hot-key-bounded segmented
  * folds: for ANY event set and ANY ts-monotone segmentation, a left
  * fold seeded with the previous segment's final accumulator equals
  * the whole-series fold. Sampled adversarially: heavy timestamp ties
  * (small ts domain), events exactly ON segment boundaries, keys
  * absent from middle segments, single-event keys. Seeded, so
  * failures reproduce. */
class SegmentedFoldProperties extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val rnd = new Random(0x5E6F01DL)

  private def randomEvents(n: Int, users: Int, tsDomain: Int) =
    (1 to n).map { i =>
      (rnd.nextInt(users).toLong + 1L,
        new Timestamp(rnd.nextInt(tsDomain).toLong * 1000L),
        i.toLong,
        Seq("view", "click", "purchase", "other")(rnd.nextInt(4)))
    }.toDF("user_id", "ts", "event_id", "event_type")

  test("funnelSegmented ≡ funnel for random events and random segment widths") {
    for (trial <- 1 to 8) {
      val df = randomEvents(n = 40 + rnd.nextInt(160), users = 1 + rnd.nextInt(8),
        tsDomain = 50 + rnd.nextInt(200)).cache()
      val widthS = 7 + rnd.nextInt(60) // segment width in seconds
      val seg = floor(unix_micros($"ts") / lit(widthS * 1000000L))
      val whole = Funnel.funnel(df, Seq("view", "click", "purchase"))
        .collect().map(_.toSeq).toSeq
      val segd = Funnel.funnelSegmented(df, Seq("view", "click", "purchase"), seg)
        .collect().map(_.toSeq).toSeq
      assert(segd == whole, s"trial $trial width $widthS")
      df.unpersist()
    }
  }

  test("sessionStatsSegmented ≡ sessionStats for random events and random gaps") {
    for (trial <- 1 to 8) {
      val df = randomEvents(n = 40 + rnd.nextInt(160), users = 1 + rnd.nextInt(8),
        tsDomain = 50 + rnd.nextInt(400)).cache()
      val gapUs = (3 + rnd.nextInt(60)).toLong * 1000000L
      val widthS = 7 + rnd.nextInt(60)
      val seg = floor(unix_micros($"ts") / lit(widthS * 1000000L))
      val whole = Sessions.sessionStats(df, gapUs)
        .orderBy("user_id").collect().map(_.toSeq).toSeq
      val segd = Sessions.sessionStatsSegmented(df, gapUs, seg)
        .orderBy("user_id").collect().map(_.toSeq).toSeq
      assert(segd == whole, s"trial $trial gap $gapUs width $widthS")
      df.unpersist()
    }
  }
}
