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
  * Semantics: [[toLake]] is at-least-once. `foreachBatch` replays a
  * batch after a failure, and a plain parquet append cannot detect the
  * replay, so a crash between write and checkpoint commit can duplicate
  * rows — the same contract as the reference's re-runnable batch append,
  * and the reason its watermark dedup (strict `ts >`) sits downstream.
  * [[toLakeIdempotent]] upgrades to effective exactly-once without a
  * transactional format: each micro-batch lands in its own `batch=<id>`
  * partition via staging dir + atomic rename, so a replay overwrites its
  * own previous landing instead of appending twice.
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

  /** Exactly-once streaming→lake landing keyed by `batchId`: replaying a
    * micro-batch (crash between write and checkpoint commit) re-lands
    * the SAME `batch=<id>` directory instead of appending a duplicate.
    * Readers see an extra `batch` partition column (drop it, or use it —
    * it is also the natural incremental-processing cursor). Within-batch
    * layout still supports Hive partitioning + within-task sort, same as
    * [[toLake]]. */
  def toLakeIdempotent(stream: DataFrame, path: String,
      partitionCols: Seq[String], checkpoint: String,
      sortCols: Seq[String] = Nil,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        landBatch(batch, path, batchId, partitionCols, sortCols)
      }
      .start()

  /** Continuous maintenance of the durable ANN index
    * ([[graft.ops.Similarity.writeIndex]] layout): each micro-batch of
    * (vec_id, embedding) rows is assigned with the index's STORED
    * codebook and appended partition-wise — the streaming form of
    * [[graft.ops.Similarity.appendToIndex]], so a search served from the
    * index stays exact as vectors stream in (admissibility holds for any
    * codebook; radii are recomputed from the live assignment at serving
    * time). Same at-least-once contract as [[toLake]]: a replayed batch
    * appends its vectors twice — dedup upstream (stream `dropDuplicates`
    * on vec_id with a watermark) or rebuild via `writeIndex` to compact.
    * Prefer [[toIvfLandings]] (r14) when replays must not duplicate:
    * it lands per-batch partitions idempotently (exactly-once) at the
    * cost of a union read at serve; this in-place append keeps the
    * single-directory layout `appendToIndex` readers already use. */
  def toIndex(stream: DataFrame, indexPath: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) graft.ops.Similarity.appendToIndex(batch, indexPath)
      }
      .start()

  /** Continuous maintenance of the durable IVF-PQ index
    * ([[graft.ops.Similarity.writePqIndex]] layout): each micro-batch of
    * (vec_id, embedding) rows is assigned AND PQ-encoded with the index's
    * stored codebooks and appended partition-wise — the streaming form of
    * [[graft.ops.Similarity.appendToPqIndex]]. Full vectors exist only in
    * the micro-batch; the lake copy stays (cell, codes). Same
    * at-least-once contract as [[toIndex]]. */
  def toPqIndex(stream: DataFrame, indexPath: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) graft.ops.Similarity.appendToPqIndex(batch, indexPath)
      }
      .start()

  /** Continuous maintenance of the durable dedup index
    * ([[graft.ops.Dedup.writeShingleIndex]] layout): each micro-batch of
    * documents is shingled/banded with the index's stored parameters and
    * appended — the streaming form of
    * [[graft.ops.Dedup.appendToShingleIndex]]. Pair searches served from
    * the index ([[graft.ops.Dedup.minhashNearDupsFromIndex]]) stay equal
    * to a from-scratch build over everything that has streamed in. Same
    * at-least-once contract as [[toIndex]]. */
  def toShingleIndex(stream: DataFrame, indexPath: String,
      checkpoint: String, idCol: String = "doc_id", textCol: String = "text",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          graft.ops.Dedup.appendToShingleIndex(batch, indexPath, idCol, textCol)
      }
      .start()

  /** Idempotent micro-batch landing (exposed for direct replay testing):
    * write the batch to a dot-prefixed staging dir — invisible to
    * Spark's file index, so readers never see in-flight data — then
    * atomically rename it to `batch=<id>`. A replay of batch N drops any
    * previous `batch=N` landing before its rename, so the final state
    * after any crash/replay interleaving equals exactly-once. The
    * non-atomic delete+rename window exists only while batch N's
    * checkpoint commit is missing, i.e. while N is not yet committed for
    * any reader that keys off the checkpoint. On object stores without
    * atomic rename, point `path` at a rename-capable layer (HDFS,
    * cluster FS) or use a transactional table format instead. */
  /** Compaction cadence hook (VERDICT r15 #5): when `every > 0`, fold
    * the landing directory after batches every−1, 2·every−1, … —
    * default OFF (0), preserving manual-OPTIMIZE behavior. Runs inside
    * the foreachBatch callback, so a fold can never race its own
    * stream's landings (single-maintainer discipline holds by
    * construction); cadence applies on EVERY batch id, including
    * all-filtered empty ones, so a quiet stream still folds. Any
    * cadence value serves identical results — each family's read is
    * fold-invariant (LandingsSpec + the q124 gate query exercise a
    * mid-stream fold). */
  private def maybeCompact(every: Int, batchId: Long)
      (fold: => Boolean): Unit =
    if (every > 0 && (batchId + 1) % every == 0) { fold; () }

  def landBatch(batch: DataFrame, path: String, batchId: Long,
      partitionCols: Seq[String] = Nil, sortCols: Seq[String] = Nil): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(batch.sparkSession.sessionState.newHadoopConf())
    val staging = new Path(root, s".staging-batch-$batchId")
    val target = new Path(root, s"batch=$batchId")
    val src =
      if (sortCols.nonEmpty)
        batch.sortWithinPartitions(
          sortCols.map(org.apache.spark.sql.functions.col): _*)
      else batch
    var w = src.write.mode("overwrite").format("parquet")
    if (partitionCols.nonEmpty) w = w.partitionBy(partitionCols: _*)
    w.save(staging.toString)
    if (fs.exists(target)) fs.delete(target, true)
    if (!fs.rename(staging, target))
      throw new java.io.IOException(
        s"streaming lake commit failed: rename $staging -> $target")
  }

  /** Continuous Count-Min sketch maintenance
    * ([[graft.ops.Sketches.cmSketch]]): each micro-batch's cell table
    * lands in its own `batch=<id>` partition via the idempotent
    * [[landBatch]] rename protocol, and the LIVE sketch is recovered at
    * read time by [[readCmSketch]]'s cell-wise sum — sound because
    * Count-Min merge is associative and commutative, so "merge at
    * serve" equals "merge per batch" equals the direct batch sketch
    * over everything that streamed in (spec-asserted). Landing
    * per-batch cells instead of read-modify-writing a merged table is
    * what makes this EXACTLY-ONCE on plain parquet: a replayed batch
    * overwrites its own previous landing, where an in-place merge would
    * double-count it. Each landed batch is ≤ groups·depth·width cell
    * rows regardless of batch size; compact with [[graft.io.Lake
    * .compact]] when batch count grows. */
  def toCmSketch(stream: DataFrame, path: String, checkpoint: String,
      grpCol: String, keyCol: String, depth: Int, width: Int,
      trigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Int = 0): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          landBatch(graft.ops.Sketches.cmSketch(batch,
            org.apache.spark.sql.functions.col(grpCol),
            org.apache.spark.sql.functions.col(keyCol), depth, width),
            path, batchId)
        maybeCompact(compactEvery, batchId)(
          compactCmSketch(batch.sparkSession, path))
      }
      .start()

  /** Continuous TREND maintenance ([[graft.ops.TimeSeries
    * .trendStatsTime]] — the [[toCmSketch]] landing protocol applied to
    * OLS sufficient statistics): each micro-batch is collapsed to ≤
    * |keys| exact-integer moment rows (n, Σx, Σy, Σxy, Σx²; x = event
    * time, so moments are order-free pure sums) landed in a
    * `batch=<id>` partition via the idempotent [[landBatch]] rename,
    * and the live fit is recovered at read time by [[readTrend]]'s
    * per-key moment SUM + rational epilogue. Exactly-once for the
    * [[toCmSketch]] reason (a replayed batch overwrites its own
    * landing); batch-split invariant because integer moments merge by
    * addition — the read-back fit hash-matches the direct batch
    * [[graft.ops.TimeSeries.trendFitTime]] whatever the trigger
    * cadence. */
  def toTrendStats(stream: DataFrame, path: String, checkpoint: String,
      keyCol: String, tsCol: String, valueCol: String, originMicros: Long,
      trigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Int = 0): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          landBatch(graft.ops.TimeSeries.trendStatsTime(batch, keyCol,
            tsCol, valueCol, originMicros), path, batchId)
        maybeCompact(compactEvery, batchId)(
          compactTrendStats(batch.sparkSession, path, keyCol))
      }
      .start()

  /** EXACTLY-ONCE continuous ANN-index maintenance ([[toIndex]]'s
    * at-least-once append upgraded to the [[landBatch]] rename
    * protocol): each micro-batch of (vec_id, embedding) rows is
    * assigned with the base index's STORED codebook
    * ([[graft.ops.Similarity.assignmentForIndex]] — a narrow per-row
    * argmax, no shuffle) and landed in its own `batch=<id>` partition,
    * sub-partitioned by `cell` so index readers partition-prune
    * landings exactly like base cell directories. A replayed batch
    * overwrites its own landing — no upstream dedup or compaction
    * needed for exactness. Serving reads base ∪ landings with radii
    * recomputed over the union
    * ([[graft.ops.Similarity.cosinePairsBlockedFromIndexWithLandings]]),
    * so served pairs stay equal to a from-scratch search over
    * everything ever admitted, under any batch split or crash/replay
    * interleaving. */
  def toIvfLandings(stream: DataFrame, indexPath: String, landPath: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Int = 0): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          landBatch(graft.ops.Similarity.assignmentForIndex(batch, indexPath),
            landPath, batchId, partitionCols = Seq("cell"))
        maybeCompact(compactEvery, batchId)(
          compactIvfLandings(batch.sparkSession, landPath))
      }
      .start()

  /** Continuous BPE pair-statistics maintenance
    * ([[graft.ops.TextAnalysis.bpeMergeStats]]' incremental twin — the
    * tokenizer-learning statistics kept live as the corpus streams in):
    * each micro-batch is collapsed to its own (pair, cnt) partial —
    * ≤ |charset|² rows regardless of batch size, the [[toCmSketch]]
    * bound — landed in a `batch=<id>` partition via the idempotent
    * [[landBatch]] rename, so replays overwrite their own landing
    * (exactly-once on plain parquet). Pair counts are distributive
    * sums, so the read-side merge equals the whole-corpus statistics
    * under any batch split. */
  def toBpePairs(stream: DataFrame, path: String, checkpoint: String,
      textCol: String = "text",
      trigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Int = 0): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          landBatch(graft.ops.TextAnalysis.bpePairCounts(batch, textCol),
            path, batchId)
        maybeCompact(compactEvery, batchId)(
          compactBpePairs(batch.sparkSession, path))
      }
      .start()

  /** The live top-`m` merge list from a [[toBpePairs]] landing: sum the
    * per-batch partials, rank — same rows as a direct batch
    * [[graft.ops.TextAnalysis.bpeMergeStats]] over everything that
    * streamed in. */
  def readBpeMerges(spark: org.apache.spark.sql.SparkSession, path: String,
      m: Int): org.apache.spark.sql.DataFrame = {
    // Zero servable landings (empty corpus / all-empty micro-batches
    // never create the path — the !batch.isEmpty guard — and a crash
    // can leave a data-file-less tree) read as an empty merge list,
    // not a missing-path/schema-inference failure (ADVICE r13/r14).
    val counts = graft.io.Landings.readLandings(spark, path) match {
      case Some(df) => df.drop("batch")
      case None =>
        import spark.implicits._
        Seq.empty[(String, Long)].toDF("pair", "cnt")
    }
    graft.ops.TextAnalysis.bpeMergesFromCounts(counts, m)
  }

  /** Landing `OPTIMIZE` for [[toBpePairs]] partials: fold every landed
    * (pair, cnt) partial into ONE summed table —
    * [[graft.io.Landings.compactLandings]] with the pair-count sum as
    * the algebraic reduce. [[readBpeMerges]] is fold-invariant because
    * pair counts are distributive sums. */
  def compactBpePairs(spark: org.apache.spark.sql.SparkSession,
      path: String): Boolean = {
    import org.apache.spark.sql.functions._
    graft.io.Landings.compactLandings(spark, path, reduce = df =>
      df.groupBy(col("pair")).agg(sum(col("cnt")).as("cnt")))
  }

  /** Exactly-once streaming co-visitation index maintenance — the
    * [[graft.ops.Recs.writeCoVisitIndex]] durable index kept live as
    * baskets stream in (the [[toIvfLandings]] convention applied to the
    * recommendation family): each micro-batch collapses to its own
    * symmetric (part, rec, cooc) pair-count partial and lands in a
    * `batch=<id>` partition via the idempotent [[landBatch]] rename, so
    * a replayed batch overwrites its own landing instead of
    * double-counting — the additive-delta trap [[graft.ops.Recs
    * .appendToCoVisitIndex]]'s read-modify-write merge has under
    * replay, solved the landing way. Counts are distributive sums, so
    * [[readCoVisitTopK]]'s read-side merge equals the whole-corpus mine
    * under any batch split ([[maybeCompact]]-fold-invariant too).
    *
    * CONTRACT: a basket must not span micro-batches — the per-batch
    * pair kernel only sees the rows in its batch, so a split basket
    * would miss its cross-batch pairs. Partition the source by the
    * basket key (q210 stages slices cut by the basket id); a source
    * that cannot guarantee this needs the [[graft.streaming
    * .CoVisitStream]] state machine, which tracks basket growth across
    * batches and emits each pair exactly once. */
  def toCoVisitPairs(stream: DataFrame, path: String, checkpoint: String,
      basketCol: String, itemCol: String, maxBasket: Int = 10000,
      trigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Int = 0): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          landBatch(graft.ops.Recs.coVisitationPairs(batch, basketCol,
            itemCol, maxBasket), path, batchId)
        maybeCompact(compactEvery, batchId)(
          compactCoVisitLandings(batch.sparkSession, path))
      }
      .start()

  /** Top-`k` recommendations from the durable co-visitation index PLUS
    * the live [[toCoVisitPairs]] landings: base counts and landed
    * partials sum per (part, rec) — distributive, so the result equals
    * a from-scratch [[graft.ops.Recs.coVisitation]] over everything
    * ever admitted — then rank through the bounded TopKPerGroup
    * operator. A missing landing path (nothing streamed yet) serves the
    * base index alone. */
  def readCoVisitTopK(spark: org.apache.spark.sql.SparkSession,
      baseTable: String, landPath: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val base = spark.table(baseTable)
    val counts = graft.io.Landings.readLandings(spark, landPath) match {
      case Some(l) => base.unionByName(l.drop("batch"))
        .groupBy(col("part"), col("rec")).agg(sum(col("cooc")).as("cooc"))
      case None => base
    }
    graft.plans.TopKPerGroup.topKPerGroup(counts, Seq("part"),
      Seq(col("cooc").desc, col("rec").asc), k)
  }

  /** Landing `OPTIMIZE` for [[toCoVisitPairs]] partials: fold every
    * landed (part, rec, cooc) partial into ONE summed generation —
    * [[readCoVisitTopK]] is fold-invariant because pair counts are
    * distributive sums (the q210 oracle compare proves it mid-stream,
    * the q124 pattern). */
  def compactCoVisitLandings(spark: org.apache.spark.sql.SparkSession,
      path: String): Boolean = {
    import org.apache.spark.sql.functions._
    graft.io.Landings.compactLandings(spark, path, reduce = df =>
      df.groupBy(col("part"), col("rec")).agg(sum(col("cooc")).as("cooc")))
  }

  /** Fold the landed streaming partials INTO the durable base index and
    * retire the landing directory — the landing `OPTIMIZE` taken to its
    * conclusion (VERDICT r17 #1): base ∪ landings re-sum per
    * (part, rec) and publish as a bucketed index table, then a
    * data-less covering generation commits in the landing dir
    * ([[graft.io.Landings.retireLandings]]) so [[readCoVisitTopK]]
    * serves the bucketed base ALONE — the zero-exchange
    * [[graft.ops.Recs.serveCoVisitTopK]] plan — with no per-read
    * base∪landings re-sum, while a replayed covered batch stays
    * ignored. Fold-invariant by the same distributive-sum argument as
    * [[compactCoVisitLandings]] (StreamSinkSpec proves serve-before ==
    * serve-after row-for-row).
    *
    * `into` defaults to an in-place swap of `baseTable`; pass a
    * different name to keep the old base immutable (crash-safe publish
    * — see [[graft.ops.Graph.appendToWeightedEdgeIndex]]'s recovery
    * contract). Single-maintainer, stream-quiescent: the base publish
    * and the landing retirement are two commits in two stores — a crash
    * between them double-serves the folded landings until the
    * retirement is re-issued (the fold itself is already durable, so
    * recovery is exactly that re-issue); a transactional table format
    * would carry both legs in one commit (Delta — environment-absent,
    * A21). */
  def compactCoVisitIntoIndex(spark: org.apache.spark.sql.SparkSession,
      baseTable: String, landPath: String, buckets: Int,
      into: String = ""): Boolean = {
    import org.apache.spark.sql.functions._
    graft.io.Landings.readLandings(spark, landPath) match {
      case Some(l) =>
        val target = if (into.isEmpty) baseTable else into
        // BUCKET-LEVEL fold (guide §6; VERDICT r18 #1): the landings
        // collapse to per-(part, rec) deltas first (metadata-sized next
        // to the index), their bucket ids name the touched buckets, and
        // ONLY those buckets re-merge and republish — every other
        // bucket's file is reused as-is, so the publish leg costs
        // O(touched buckets), not O(index). The merged frame enters the
        // bucket partitioning with ONE exchange (the groupBys below are
        // keyed on supersets of {part}, so the placement survives them
        // and each touched bucket lands as one file). The staging-table
        // materialization inside rewriteBuckets replaces the old eager
        // localCheckpoint (nothing reads a dropped table anymore).
        val delta = l.drop("batch").groupBy(col("part"), col("rec"))
          .agg(sum(col("cooc")).as("cooc")).localCheckpoint()
        val touched = delta
          .select(graft.io.Lake.bucketIdColumn(col("part"), buckets).as("b"))
          .distinct().collect().map(_.getInt(0)).toSeq
        val merged = graft.io.Lake.readBuckets(spark, baseTable, touched)
          .unionByName(delta)
          .repartition(buckets, col("part"))
          .groupBy(col("part"), col("rec")).agg(sum(col("cooc")).as("cooc"))
        graft.io.Lake.rewriteBuckets(spark, baseTable, target, merged,
          touched, "part", buckets, Some("part"))
        graft.io.Landings.retireLandings(spark, landPath)
        true
      case None => false
    }
  }

  /** Exactly-once streaming weighted-edge index maintenance — the
    * [[toCoVisitPairs]] convention on the graph family
    * ([[graft.ops.Graph.writeWeightedEdgeIndex]] kept live as edge
    * observations stream in): each micro-batch collapses to its own
    * per-(src, dst) weight-sum partial and lands in a `batch=<id>`
    * partition via the idempotent [[landBatch]] rename, so a replayed
    * batch overwrites its own landing instead of double-counting — the
    * additive-delta trap [[graft.ops.Graph.appendToWeightedEdgeIndex]]'s
    * read-modify-write merge has under replay. Weights are distributive
    * sums PER ROW, so unlike baskets there is NO cross-batch contract:
    * any split of the edge log into micro-batches sums back to the same
    * totals ([[readWeightedPageRank]] proves it against the whole-corpus
    * oracle; [[maybeCompact]]-fold-invariant too). */
  def toWeightedEdges(stream: DataFrame, path: String, checkpoint: String,
      srcCol: String, dstCol: String, wCol: String,
      trigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Int = 0): StreamingQuery = {
    import org.apache.spark.sql.functions._
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          landBatch(batch.select(col(srcCol).cast("long").as("src"),
              col(dstCol).cast("long").as("dst"),
              col(wCol).cast("long").as("w"))
            .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w")),
            path, batchId)
        maybeCompact(compactEvery, batchId)(
          compactWeightedEdges(batch.sparkSession, path))
      }
      .start()
  }

  /** The weighted walk over the durable edge index PLUS the live
    * [[toWeightedEdges]] landings: base edge rows (sentinels dropped —
    * they re-derive from the merged endpoints) and landed partials sum
    * per (src, dst), totals and sentinels rebuild via the shared
    * relation builder, the merged relation materializes ONCE
    * (localCheckpoint — five iterations must not re-aggregate
    * base∪landings five times) and re-checks the overflow bound (landed
    * deltas could breach what the base build admitted). Equal to
    * [[graft.ops.Graph.weightedPageRankFromIndex]] over a from-scratch
    * index of everything ever admitted. A missing landing path serves
    * the base index alone. */
  def readWeightedPageRank(spark: org.apache.spark.sql.SparkSession,
      baseTable: String, landPath: String, iterations: Int,
      alphaNum: Long = 85L): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    graft.io.Landings.readLandings(spark, landPath) match {
      case Some(l) =>
        val baseEdges = spark.table(baseTable)
          .filter(col("sw") =!= Long.MaxValue)
          .select(col("src"), col("dst"), col("w"))
        val edges = baseEdges.unionByName(l.drop("batch"))
        // place by src BEFORE the pin: localCheckpoint preserves the
        // partitioning/ordering it captures, so all `iterations` SMJ
        // rounds stream against the placed relation with ZERO edge-side
        // exchanges — the property the bucketed table gives the durable
        // path, bought here with one exchange instead of one per
        // iteration
        val rel = graft.ops.Graph.placedBySrc(
          graft.ops.Graph.buildWeightedRelation(edges)).localCheckpoint()
        graft.ops.Graph.requireWeightedBound(rel)
        graft.ops.Graph.weightedPageRankOverRelation(rel, iterations, alphaNum)
      case None =>
        // nothing landed (or everything folded into the base by
        // [[compactWeightedEdgesIntoIndex]]): the bucketed base IS the
        // complete placed relation — serve the durable-index walk
        // directly, no relation rebuild, no checkpoint pass
        graft.ops.Graph.weightedPageRankFromIndex(spark, baseTable,
          iterations, alphaNum)
    }
  }

  /** Landing `OPTIMIZE` for [[toWeightedEdges]] partials: fold every
    * landed (src, dst, w) partial into ONE summed generation —
    * [[readWeightedPageRank]] is fold-invariant because edge weights
    * are distributive sums. */
  def compactWeightedEdges(spark: org.apache.spark.sql.SparkSession,
      path: String): Boolean = {
    import org.apache.spark.sql.functions._
    graft.io.Landings.compactLandings(spark, path, reduce = df =>
      df.groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w")))
  }

  /** [[compactCoVisitIntoIndex]] for the weighted-edge family: fold the
    * landed (src, dst, Σw) partials into the durable edge index through
    * [[graft.ops.Graph.appendToWeightedEdgeIndex]] (per-(src,dst)
    * re-sum, totals + sentinels rebuilt, overflow bound re-checked) and
    * retire the landing directory, so [[readWeightedPageRank]] serves
    * the bucketed base alone — the durable-index walk with no
    * base∪landings relation rebuild per read. Same fold-invariance,
    * single-maintainer, and two-store-commit recovery contract as the
    * co-visitation form. */
  def compactWeightedEdgesIntoIndex(spark: org.apache.spark.sql.SparkSession,
      baseTable: String, landPath: String, buckets: Int,
      into: String = ""): Boolean =
    graft.io.Landings.readLandings(spark, landPath) match {
      case Some(l) =>
        graft.ops.Graph.appendToWeightedEdgeIndex(l.drop("batch"),
          "src", "dst", "w", baseTable, buckets, into)
        graft.io.Landings.retireLandings(spark, landPath)
        true
      case None => false
    }

  /** The live per-key trend from a [[toTrendStats]] landing: moment
    * sums over the batch partitions, then the exact rational fit —
    * same row schema as a direct [[graft.ops.TimeSeries
    * .trendFitTime]] call. */
  def readTrend(spark: org.apache.spark.sql.SparkSession, path: String,
      keyCol: String): org.apache.spark.sql.DataFrame =
    graft.ops.TimeSeries.trendFromStats(
      graft.io.Landings.readLandings(spark, path)
        .getOrElse(spark.read.parquet(path)).drop("batch"), keyCol)

  /** Landing `OPTIMIZE` for [[toTrendStats]] moments: per-key moment
    * sums are the algebraic reduce — [[readTrend]] is fold-invariant
    * because integer moments merge by addition. */
  def compactTrendStats(spark: org.apache.spark.sql.SparkSession,
      path: String, keyCol: String): Boolean = {
    import org.apache.spark.sql.functions._
    graft.io.Landings.compactLandings(spark, path, reduce = df =>
      df.groupBy(col(keyCol)).agg(sum(col("n")).as("n"),
        sum(col("sk")).as("sk"), sum(col("sy")).as("sy"),
        sum(col("sky")).as("sky"), sum(col("skk")).as("skk")))
  }

  /** Continuous HEAVY-HITTER maintenance
    * ([[graft.ops.Sketches.heavyHitters]] — the [[toCmSketch]] landing
    * protocol applied to the sketch family's top-k member): each
    * micro-batch is summarized by its own SpaceSaving sketch (≤
    * `capacity` (item, cnt, err) rows regardless of batch size) landed
    * in a `batch=<id>` partition via the idempotent [[landBatch]]
    * rename, and the LIVE top-k is recovered at read time by
    * [[readHeavyHitters]]'s relational merge
    * ([[graft.ops.Sketches.ssMerge]]) — the Agarwal et al. mergeable-
    * summaries construction, exact whenever each batch summary is
    * exact (capacity ≥ per-batch distinct items), never-undercounting
    * with a summed error bound otherwise. Exactly-once on plain
    * parquet for the same reason as [[toCmSketch]]: a replayed batch
    * overwrites its own landing, where an in-place merged table would
    * double-count it. */
  def toHeavyHitters(stream: DataFrame, path: String, checkpoint: String,
      itemCol: String, capacity: Int,
      trigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Int = 0): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          landBatch(graft.ops.Sketches.heavyHitters(batch, itemCol, capacity),
            path, batchId)
        maybeCompact(compactEvery, batchId)(
          compactHeavyHitters(batch.sparkSession, path, capacity))
      }
      .start()

  /** The live merged heavy-hitter summary from a [[toHeavyHitters]]
    * landing: [[graft.ops.Sketches.ssMerge]] over the batch partitions —
    * same row schema as a direct batch [[graft.ops.Sketches
    * .heavyHitters]] call. */
  def readHeavyHitters(spark: org.apache.spark.sql.SparkSession,
      path: String, capacity: Int): DataFrame =
    graft.ops.Sketches.ssMerge(
      graft.io.Landings.readLandings(spark, path)
        .getOrElse(spark.read.parquet(path)).select(
        org.apache.spark.sql.functions.col("batch"),
        org.apache.spark.sql.functions.col("item"),
        org.apache.spark.sql.functions.col("cnt"),
        org.apache.spark.sql.functions.col("err")),
      "batch", capacity)

  /** Landing `OPTIMIZE` for [[toHeavyHitters]] summaries: the reduce is
    * the SpaceSaving relational merge itself (per-member identity comes
    * from the `batch` column the fold input carries), so the landed
    * generation is ONE ≤`capacity`-row summary and [[readHeavyHitters]]
    * is fold-invariant by merge associativity (Agarwal et al.
    * mergeable summaries). */
  def compactHeavyHitters(spark: org.apache.spark.sql.SparkSession,
      path: String, capacity: Int): Boolean = {
    import org.apache.spark.sql.functions._
    graft.io.Landings.compactLandings(spark, path, reduce = df =>
      graft.ops.Sketches.ssMerge(df.select(col("batch"), col("item"),
        col("cnt"), col("err")), "batch", capacity))
  }

  /** Continuous QUANTILE-sketch maintenance
    * ([[graft.ops.Sketches.sampleSketch]] — the [[toCmSketch]] landing
    * protocol applied to the sketch family's quantile member): each
    * micro-batch's bottom-k sample rows land in their own `batch=<id>`
    * partition via the idempotent [[landBatch]] rename, and the LIVE
    * sketch is recovered at read time by [[readSampleSketch]]'s
    * re-take-bottom-k — sound because bottom-k merge is associative and
    * commutative (bottom-k of a union is bottom-k of the members'
    * bottom-k's), so "merge at serve" equals the direct batch sketch
    * over everything that streamed in. Exactly-once on plain parquet
    * for the same reason as [[toCmSketch]]: a replayed batch overwrites
    * its own landing. Each landing is ≤ groups·k rows regardless of
    * batch size. */
  def toSampleSketch(stream: DataFrame, path: String, checkpoint: String,
      grpCol: String, idCol: String, valueCol: String, k: Int,
      trigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Int = 0): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          landBatch(graft.ops.Sketches.sampleSketch(batch,
            org.apache.spark.sql.functions.col(grpCol),
            org.apache.spark.sql.functions.col(idCol),
            org.apache.spark.sql.functions.col(valueCol), k),
            path, batchId)
        maybeCompact(compactEvery, batchId)(
          compactSampleSketch(batch.sparkSession, path, k))
      }
      .start()

  /** The live merged sample sketch from a [[toSampleSketch]] landing:
    * re-take the k smallest (h, v) per group across batch partitions —
    * same row schema as a direct [[graft.ops.Sketches.sampleSketch]]. */
  def readSampleSketch(spark: org.apache.spark.sql.SparkSession,
      path: String, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    graft.io.Landings.readLandings(spark, path)
      .getOrElse(spark.read.parquet(path))
      .select(col("grp"), col("h"), col("v"))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("h"), col("v"))))
      .filter(col("r") <= k)
  }

  /** Landing `OPTIMIZE` for [[toSampleSketch]] partials: re-take the k
    * smallest (h, v) per group as the reduce — sound because bottom-k
    * merge is associative (bottom-k of a union equals bottom-k of the
    * members' bottom-k's), so [[readSampleSketch]] is fold-invariant. */
  def compactSampleSketch(spark: org.apache.spark.sql.SparkSession,
      path: String, k: Int): Boolean = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    graft.io.Landings.compactLandings(spark, path, reduce = df =>
      df.select(col("grp"), col("h"), col("v"))
        .withColumn("r", row_number().over(
          Window.partitionBy(col("grp")).orderBy(col("h"), col("v"))))
        .filter(col("r") <= k).drop("r"))
  }

  /** Continuous GDPR/takedown processing (the 11th streaming query's
    * sink — [[graft.io.Versioned.deleteKeys]] +
    * [[graft.ops.Dedup.deleteFromShingleIndex]] per micro-batch): each
    * batch of forget-requests (a `keyCol` column of ids) is applied as
    * ONE atomic copy-on-write commit against the versioned lake, and
    * the forgotten ids' shingle rows + LSH postings are purged from
    * the durable dedup index, so a forgotten document stops existing
    * AND stops surfacing as anyone's near-dup candidate — continuously,
    * as requests arrive.
    *
    * Exactly-once on plain foreachBatch BY CONSTRUCTION, no landing
    * protocol needed: deleteKeys is idempotent (a replayed batch's
    * keys are already gone — matches nothing, consumes no version),
    * and the index purge is an anti-join that removes nothing the
    * second time. The lake's version history is the takedown audit
    * trail (one version per effective batch), reclaimed by `vacuum`
    * per the retention policy. `indexPath = None` runs lake-only. */
  def toTakedowns(requests: DataFrame, lakePath: String, keyCol: String,
      checkpoint: String, indexPath: Option[String] = None,
      coalesceTo: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    requests.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val ids = batch.select(
            org.apache.spark.sql.functions.col(keyCol)).localCheckpoint()
          graft.io.Versioned.deleteKeys(batch.sparkSession, lakePath, ids,
            keyCol, coalesceTo)
          indexPath.foreach(p => graft.ops.Dedup.deleteFromShingleIndex(
            batch.sparkSession, p, ids, keyCol))
        }
      }
      .start()

  /** Continuous CDC PIPELINE (the 21st streaming query's sink — the
    * change-data-feed consumer loop, VERDICT r15 #7): each micro-batch
    * of change rows (keys + after-image values + an insert/update/
    * delete op column) MERGEs into the versioned lake as ONE atomic
    * copy-on-write commit ([[graft.io.Versioned.applyChanges]]), and
    * the row-level change feed since the consumer's durable cursor is
    * drained ([[graft.io.Versioned.changesSince]]) and landed under
    * `batch=<maxVersion>` via the idempotent [[landBatch]] rename.
    *
    * Exactly-once with NO markers, from two compositional facts:
    *  - applyChanges is CONTENT-idempotent (delete-then-upsert of the
    *    same changeset reproduces the snapshot bit-for-bit), so a
    *    crash-replayed batch re-commits a version whose DIFF IS EMPTY;
    *  - the feed cursor is derived from the LANDED state itself
    *    (max covered/live landing id = max consumed version — landing
    *    ids ARE version numbers), so a replayed consumer re-derives
    *    the same feed rows and overwrites its own landing.
    * Every crash point therefore leaves the feed equal to what a
    * single clean run produces — the landing read rule, carried over
    * versioned commits.
    *
    * OWNERSHIP CONTRACT: `feedPath` must be EXCLUSIVELY owned by this
    * pipeline — its landing ids ARE `lakePath` version numbers, so a
    * feed dir that already holds unrelated landings (or is folded by a
    * [[graft.io.Landings]] caller with different id semantics) would
    * skip or freeze the feed. The failure is loud, not silent:
    * [[graft.io.Versioned.changesSince]] throws when the derived
    * cursor exceeds the lake's latest committed version (foreign ids)
    * or predates retention (vacuum outran the consumer). */
  def toCdcPipeline(changes: DataFrame, lakePath: String, feedPath: String,
      checkpoint: String, keyCols: Seq[String], valueCols: Seq[String],
      opCol: String = "change",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        if (!batch.isEmpty)
          graft.io.Versioned.applyChanges(spark, lakePath, batch,
            keyCols, opCol)
        val st = graft.io.Landings.landingState(spark, feedPath)
        val cursor = (st.covered ++ st.live.map(_._1) + 0L).max
        graft.io.Versioned.changesSince(spark, lakePath, cursor,
          keyCols, valueCols).foreach { case (feed, newCursor) =>
          landBatch(feed, feedPath, newCursor)
        }
      }
      .start()

  /** Reconstruct the LATEST table state from a [[toCdcPipeline]] feed
    * alone — the downstream-mirror consumer (and the feed-completeness
    * proof: the result must equal the lake's latest snapshot, which is
    * exactly what q205's oracle hash-checks): per key, the change with
    * the highest `_commit_version` wins; keys whose last op is delete
    * are gone. */
  def cdcMirror(spark: org.apache.spark.sql.SparkSession, feedPath: String,
      keyCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val feed = graft.io.Landings.readLandings(spark, feedPath)
      .getOrElse(spark.read.parquet(feedPath))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_commit_version").desc)
    feed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("change") =!= "delete")
      .select((keyCols ++ valueCols).map(col): _*)
  }

  /** The live merged Count-Min sketch from a [[toCmSketch]] landing:
    * cell-wise sum across batch partitions — same cell schema as a
    * direct [[graft.ops.Sketches.cmSketch]] build. */
  def readCmSketch(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.io.Landings.readLandings(spark, path)
      .getOrElse(spark.read.parquet(path))
      .groupBy(col("grp"), col("row"), col("cell"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Landing `OPTIMIZE` for [[toCmSketch]] cell tables: the cell-wise
    * sum is the reduce — Count-Min merge is associative and
    * commutative, so [[readCmSketch]] is fold-invariant. */
  def compactCmSketch(spark: org.apache.spark.sql.SparkSession,
      path: String): Boolean = {
    import org.apache.spark.sql.functions._
    graft.io.Landings.compactLandings(spark, path, reduce = df =>
      df.groupBy(col("grp"), col("row"), col("cell"))
        .agg(sum(col("cnt")).as("cnt")))
  }

  /** Landing `OPTIMIZE` for [[toIvfLandings]] assignments: a pure
    * union fold keeping the `cell=` sub-partitioning, so index readers
    * keep partition-pruning the generation exactly like base cell
    * directories and
    * [[graft.ops.Similarity.cosinePairsBlockedFromIndexWithLandings]]
    * serves the identical pair set before and after. */
  def compactIvfLandings(spark: org.apache.spark.sql.SparkSession,
      landPath: String): Boolean =
    graft.io.Landings.compactLandings(spark, landPath,
      subPartitionCols = Seq("cell"))

  /** Continuous distribution-drift MONITORING
    * ([[graft.ops.Quality.driftAudit]] per micro-batch): every batch is
    * audited against the fixed `ref` snapshot and its per-column report
    * (row/null counts + the exact cross-multiplied L1 histogram
    * distance) lands in a `batch=<id>` partition via [[landBatch]] —
    * idempotent under replay, and the landed table IS the drift time
    * series an alerting job reads (`batch` partition column = the
    * cursor). The reference snapshot is deliberately pinned: drift is
    * measured against the distribution the model/pipeline was built on,
    * not against a moving window. Reports are |cols| rows per batch —
    * metadata-sized however large the batches. */
  def toDriftReports(stream: DataFrame, path: String, checkpoint: String,
      ref: DataFrame, cols: Seq[String], bins: Int = 20,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          landBatch(graft.ops.Quality.driftAudit(ref, batch, cols, bins),
            path, batchId)
      }
      .start()
}
