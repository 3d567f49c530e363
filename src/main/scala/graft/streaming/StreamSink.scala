package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.io.Lake

/** Streaming → lake bridge: lands a micro-batched stream in the same
  * partitioned columnar layout the batch pipeline writes
  * (`symbol=`/Hive-style dirs, append mode, optional within-task sort for
  * row-group stats — [[graft.io.Lake.append]]), turning the reference's
  * batch-only ingest into a continuous one without changing the lake's
  * readers.
  *
  * Semantics: at-least-once. `foreachBatch` replays a batch after a
  * failure, and a plain parquet append cannot detect the replay, so a
  * crash between write and checkpoint commit can duplicate rows — the
  * same contract as the reference's re-runnable batch append, and the
  * reason its watermark dedup (strict `ts >`) sits downstream. Upgrading
  * to exactly-once needs a transactional table format (the Delta path
  * Lake documents) or an idempotent overwrite keyed by `batchId`.
  */
object StreamSink {

  /** Start appending `stream` to the lake at `path`, partitioned by
    * `partitionCols`. `checkpoint` must be a durable location unique to
    * this query (it holds offsets + commit log — losing it reprocesses
    * the source from its starting offsets). */
  def toLake(stream: DataFrame, path: String, partitionCols: Seq[String],
      checkpoint: String, sortCols: Seq[String] = Nil,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Lake.append(batch, path, partitionCols, sortCols = sortCols)
      }
      .start()
}
