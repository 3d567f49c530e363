package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** t1 smoke (SURVEY.md §5.1): every declared query runs end-to-end at
  * sf0.001 with a plausible shape, plus streaming/batch equivalence. */
class QueriesSpec extends AnyFunSuite with SparkTest {

  // near-dup pair queries may legitimately be empty on the small corpus
  private val mayBeEmpty = Set("q20_dedup_minhash_lsh", "q21_dedup_simhash",
    "q22_dedup_ngram_jaccard", "q23_dedup_embedding")

  Queries.all.foreach { case (name, q) =>
    test(s"$name runs at sf0.001") {
      val df = q.fn(spark, sf0001)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
      assert(df.columns.nonEmpty)
    }
  }

  test("oracle SQL exists for every query that claims one, with no blanks") {
    Queries.all.foreach { case (name, q) =>
      q.oracle.foreach(sql => assert(sql.trim.nonEmpty, name))
    }
    assert(Queries.all.count(_._2.oracle.isDefined) >= 30)
  }

  test("q19 streaming output equals the batch aggregation (D19 equivalence)") {
    val streamed = Queries.all("q19_stream_tumbling").fn(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val ev = Queries.table(spark, sf0001, "events")
    val batch = ev
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), graft.ops.BarOps.moneySum(col("value")).as("val_sum"))
      .select(col("window.start").as("bucket"), col("event_type"), col("n"), col("val_sum"))
      .orderBy("bucket", "event_type")
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
  }

  test("q32 stateful streaming sessions equal the batch window formulation") {
    val streamed = Queries.all("q32_stream_sessionize").fn(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val batch = graft.streaming.Sessionize.batch(
      Queries.table(spark, sf0001, "events"), gapMinutes = 30)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("q65 left-outer streaming join equals the batch left join, incl. unmatched") {
    val streamed = Queries.all("q65_stream_left_join").fn(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val ev = Queries.table(spark, sf0001, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("pts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("cts"),
        col("value").as("cval"))
    val batch = p.join(c,
        expr("user_id = c_user AND cts >= pts - INTERVAL 1 HOUR AND cts < pts"),
        "left_outer")
      .groupBy(col("purchase_id"))
      .agg(count(col("cval")).as("n_clicks"),
        graft.ops.BarOps.moneySum(col("cval")).as("click_val"))
      .orderBy("purchase_id")
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    // the left-outer semantics must actually surface unmatched purchases
    assert(batch.exists(_(1) == 0L),
      "fixture has no unmatched purchase — outer emission untested")
  }

  test("streamingClosed emits exactly the sessions the final watermark can close") {
    import spark.implicits._
    val gapMin = 30
    val gapUs = gapMin * 60L * 1000000L
    val stream = Queries.stagedEventStream(spark, sf0001, "closed-sess")
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[graft.streaming.Sessionize.EvT]
    val closed = Queries.runToMemorySink(
      graft.streaming.Sessionize.streamingClosed(stream, gapMin).toDF(),
      "closedsess", "append")
      .select("user_id", "session_start", "session_end", "n")
      .collect().map(_.toSeq).toSet

    // expected: every batch session except each user's LAST one when the
    // final watermark (max event ts, 0s delay, ms precision) has not yet
    // passed its end + gap
    val ev = Queries.table(spark, sf0001, "events")
    val wmMs = ev.agg(max(unix_micros(col("ts")))).head().getLong(0) / 1000L
    val batch = graft.streaming.Sessionize.batch(ev, gapMin)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    val expected = batch
      .withColumn("is_last",
        col("session_start") === max(col("session_start")).over(w))
      .filter(!col("is_last") ||
        lit(wmMs) > floor(unix_micros(col("session_end")) / 1000L) + gapUs / 1000L)
      .select("user_id", "session_start", "session_end", "n")
      .collect().map(_.toSeq).toSet

    assert(closed.nonEmpty, "fixture must close at least one session")
    assert(closed == expected)
  }

  test("built-in session_window equals the window-function formulation") {
    val ev = Queries.table(spark, sf0001, "events")
    val viaBuiltin = graft.streaming.Sessionize.sessionWindow(ev, gapMinutes = 30)
      .collect().map(_.toSeq).toSeq
    val viaWindowFns = graft.streaming.Sessionize.batch(ev, gapMinutes = 30)
      .collect().map(_.toSeq).toSeq
    assert(viaBuiltin == viaWindowFns)
    assert(viaBuiltin.nonEmpty)
  }

  test("entry returns rows (driver smoke contract)") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("q99 histogram degenerate all-equal span bins to 0, not NaN-floor") {
    import spark.implicits._
    // vmax == vmin -> width 0 -> 0/0 = NaN without the guard; Spark's
    // floor->bigint maps NaN to 0 while DuckDB's least() yields 19 — the
    // guard pins bin 0 identically on both sides (ADVICE r10)
    val dir = java.nio.file.Files.createTempDirectory("q99deg").toString
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "click", 5.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 2L, "view", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Queries.all("q99_histogram").fn(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("click", 0L, 1L), ("view", 0L, 1L)))
  }

  test("q17 top-k neighbors are genuinely the nearest (spot check one query)") {
    val out = Queries.all("q17_knn_cosine").fn(spark, sf0001)
    val firstQ = out.filter(col("qid") === 0L).orderBy("rnk")
      .select("sim").collect().map(_.getDouble(0)).toSeq
    assert(firstQ.size == 5)
    assert(firstQ == firstQ.sorted.reverse) // descending similarity
  }
}
