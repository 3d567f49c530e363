package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.queries.Queries

class StreamSinkSpec extends AnyFunSuite with SparkTest {

  test("toLake lands a stream in the batch lake layout; restart appends only new data") {
    val root = Files.createTempDirectory("graft-streamsink").toString
    val lake = s"$root/lake"
    val ckpt = s"$root/ckpt"

    val stream = Queries.stagedEventStream(spark, sf0001, "streamsink")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
    val q1 = StreamSink.toLake(stream, lake, Seq("event_type"), ckpt,
      sortCols = Seq("ts"))
    q1.awaitTermination()

    val ev = Queries.table(spark, sf0001, "events")
    val landed = spark.read.parquet(lake)
    assert(landed.count() == ev.count())
    // Hive-style partition layout, same as the batch writer's
    assert(landed.schema.fieldNames.contains("event_type"))
    assert(new java.io.File(lake).listFiles().exists(_.getName.startsWith("event_type=")))

    // restart against the same checkpoint: source exhausted, nothing new lands
    val q2 = StreamSink.toLake(
      Queries.stagedEventStream(spark, sf0001, "streamsink")
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
          col("value")),
      lake, Seq("event_type"), ckpt, sortCols = Seq("ts"))
    q2.awaitTermination()
    assert(spark.read.parquet(lake).count() == ev.count(),
      "checkpointed restart must not re-append already-committed batches")
  }

  test("toIndex: streamed vectors keep the durable ANN index exact") {
    val root = Files.createTempDirectory("graft-streamsink-idx").toString
    val idx = s"$root/index"
    val ckpt = s"$root/ckpt"
    val srcDir = s"$root/src"
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    // index built on 6/7 of the corpus; the rest arrives as a stream
    graft.ops.Similarity.writeIndex(emb.filter(col("vec_id") % 7 =!= 0), idx,
      nCells = 16)
    emb.filter(col("vec_id") % 7 === 0).write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(emb.schema).parquet(srcDir)
    StreamSink.toIndex(stream, idx, ckpt).awaitTermination()
    val served = graft.ops.Similarity.cosinePairsBlockedFromIndex(spark, idx, 0.4)
      .collect().map(_.toSeq).toSeq
    val brute = graft.ops.Similarity.cosinePairs(emb, 0.4)
      .collect().map(_.toSeq).toSeq
    assert(served.nonEmpty && served == brute,
      "index must stay exact as vectors stream in")
  }

  test("toPqIndex: streamed vectors are encoded with the stored codebooks") {
    val root = Files.createTempDirectory("graft-streamsink-pqidx").toString
    val idx = s"$root/index"
    val ckpt = s"$root/ckpt"
    val srcDir = s"$root/src"
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    graft.ops.Similarity.clearIndexCaches()
    // index built on 6/7 of the corpus; the rest arrives as a stream and
    // must be assigned + PQ-encoded with the STORED codebooks
    graft.ops.Similarity.writePqIndex(emb.filter(col("vec_id") % 7 =!= 0), idx,
      nCells = 16, m = 8, ks = 16)
    emb.filter(col("vec_id") % 7 === 0).write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(emb.schema).parquet(srcDir)
    StreamSink.toPqIndex(stream, idx, ckpt).awaitTermination()
    // coverage: every corpus vector is in the combined assignment
    val n = spark.read.parquet(s"$idx/assignment").count()
    val expected = graft.ops.Similarity.withNorm(emb).filter(col("nrm") > 0).count()
    assert(n == expected, "streamed vectors missing from the PQ assignment")
    // streamed-batch codes equal a driver-side append with the same
    // stored codebooks (appendToPqIndex is the batch twin of this sink)
    val idx2 = s"$root/index2"
    graft.ops.Similarity.writePqIndex(emb.filter(col("vec_id") % 7 =!= 0), idx2,
      nCells = 16, m = 8, ks = 16)
    graft.ops.Similarity.appendToPqIndex(
      emb.filter(col("vec_id") % 7 === 0), idx2)
    val a = spark.read.parquet(s"$idx/assignment")
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    val b = spark.read.parquet(s"$idx2/assignment")
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(a == b, "streaming and batch append must produce identical indexes")
  }

  test("toShingleIndex: streamed documents keep the durable dedup index exact") {
    val root = Files.createTempDirectory("graft-streamsink-shidx").toString
    val idx = s"$root/index"
    val ckpt = s"$root/ckpt"
    val srcDir = s"$root/src"
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    // index built on 6/7 of the corpus; the rest arrives as a stream
    graft.ops.Dedup.writeShingleIndex(docs.filter(col("doc_id") % 7 =!= 0), idx)
    docs.filter(col("doc_id") % 7 === 0).write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(docs.schema).parquet(srcDir)
    StreamSink.toShingleIndex(stream, idx, ckpt).awaitTermination()
    val served = graft.ops.Dedup.minhashNearDupsFromIndex(spark, idx, 0.8)
      .collect().map(_.toSeq).toSeq
    val scratch = graft.ops.Dedup.minhashNearDups(docs, "doc_id", "text",
        threshold = 0.8)
      .collect().map(_.toSeq).toSeq
    assert(served.nonEmpty && served == scratch,
      "dedup index must stay exact as documents stream in")
  }

  test("toLakeIdempotent: a replayed batch overwrites its own landing (no duplicates)") {
    val root = Files.createTempDirectory("graft-streamsink-ido").toString
    val lake = s"$root/lake"
    val ckpt = s"$root/ckpt"

    val stream = Queries.stagedEventStream(spark, sf0001, "streamsink-ido")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
    val q1 = StreamSink.toLakeIdempotent(stream, lake, Seq("event_type"), ckpt,
      sortCols = Seq("ts"))
    q1.awaitTermination()

    val ev = Queries.table(spark, sf0001, "events")
    val landed = spark.read.parquet(lake)
    assert(landed.count() == ev.count())
    // batchId partition column + Hive layout inside each batch dir
    assert(landed.schema.fieldNames.contains("batch"))
    assert(new java.io.File(lake).listFiles().exists(_.getName.startsWith("batch=")))

    assert(landed.select("batch").distinct().count() == 1,
      "single staged file => single micro-batch (precondition for the replay below)")

    // simulate the crash-replay: re-land batch 0 directly (the exact call
    // foreachBatch would repeat after a failure before checkpoint commit)
    val batch0 = Queries.table(spark, sf0001, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
    StreamSink.landBatch(batch0, lake, 0L, Seq("event_type"), Seq("ts"))
    StreamSink.landBatch(batch0, lake, 0L, Seq("event_type"), Seq("ts"))
    assert(spark.read.parquet(lake).count() == ev.count(),
      "replaying a batch must overwrite its previous landing, not append")
    // no staging leftovers visible or present
    assert(!new java.io.File(lake).listFiles()
      .exists(_.getName.startsWith(".staging")), "staging dir must be renamed away")
  }

  test("toCmSketch landings: multi-batch cell sum equals the direct sketch; replay is idempotent") {
    import graft.ops.Sketches
    import spark.implicits._
    val d = 3; val w = 64
    val path = java.nio.file.Files.createTempDirectory("cmstream").toString + "/cells"
    val all = (1L to 300L).map(i => (s"g${i % 3}", i % 29)).toDF("g", "id")
    // three "micro-batches" landed through the same protocol the sink uses
    val parts = Seq(all.filter($"id" % 3 === 0), all.filter($"id" % 3 === 1),
      all.filter($"id" % 3 === 2))
    parts.zipWithIndex.foreach { case (b, i) =>
      StreamSink.landBatch(Sketches.cmSketch(b, $"g", $"id", d, w), path, i.toLong)
    }
    // replay of batch 1 must not double-count
    StreamSink.landBatch(Sketches.cmSketch(parts(1), $"g", $"id", d, w), path, 1L)
    val merged = StreamSink.readCmSketch(spark, path)
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2, r._3)).toSeq
    val direct = Sketches.cmSketch(all, $"g", $"id", d, w)
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2, r._3)).toSeq
    assert(merged == direct && direct.nonEmpty)
  }

  test("toHeavyHitters landings: multi-batch merge equals the direct sketch; replay idempotent") {
    import graft.ops.Sketches
    import spark.implicits._
    val cap = 32 // > 26 distinct items => every batch summary exact
    val path = java.nio.file.Files.createTempDirectory("hhstream").toString + "/hh"
    val all = (1L to 500L).map(i => s"w${(i * 7) % 26}").toDF("item")
    val parts = Seq(all.filter(pmod(xxhash64($"item"), lit(3)) === 0),
      all.filter(pmod(xxhash64($"item"), lit(3)) === 1),
      all.filter(pmod(xxhash64($"item"), lit(3)) === 2))
    parts.zipWithIndex.foreach { case (b, i) =>
      StreamSink.landBatch(Sketches.heavyHitters(b, "item", cap), path, i.toLong)
    }
    // replay of batch 1 must not change the served summary
    StreamSink.landBatch(Sketches.heavyHitters(parts(1), "item", cap), path, 1L)
    val merged = StreamSink.readHeavyHitters(spark, path, cap)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val direct = Sketches.heavyHitters(all, "item", cap)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(merged == direct && direct.nonEmpty)
  }

  test("toBpePairs landings: multi-batch pair sums equal the batch learner; replay idempotent") {
    import graft.ops.TextAnalysis
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("bpestream").toString + "/pairs"
    val all = (1L to 120L).map { i =>
      (i, Seq("alpha", "beta", "gamma", "delta", "ee")((i % 5).toInt) + " " +
        Seq("join", "scan", "sort")((i % 3).toInt))
    }.toDF("doc_id", "text")
    val parts = Seq(all.filter($"doc_id" % 3 === 0),
      all.filter($"doc_id" % 3 === 1), all.filter($"doc_id" % 3 === 2))
    parts.zipWithIndex.foreach { case (b, i) =>
      StreamSink.landBatch(TextAnalysis.bpePairCounts(b), path, i.toLong)
    }
    // replay of batch 1 must overwrite its own landing, never double-count
    StreamSink.landBatch(TextAnalysis.bpePairCounts(parts(1)), path, 1L)
    val merged = StreamSink.readBpeMerges(spark, path, m = 100)
      .as[(Long, String, String, String, Long)].collect().sortBy(_._1).toSeq
    val direct = TextAnalysis.bpeMergeStats(all, m = 100)
      .as[(Long, String, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(merged == direct && direct.nonEmpty)
  }

  test("toCoVisitPairs protocol: base + landed batches serve the from-scratch mine; replay idempotent; fold-invariant; no landings = base alone") {
    import graft.ops.Recs
    val root = Files.createTempDirectory("graft-cvstream").toString
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val land = s"$root/landings"
    try {
      Recs.writeCoVisitIndex(li.filter(col("l_orderkey") % 3 === 0),
        "l_orderkey", "l_partkey", "covisit_stream_spec", buckets = 4)
      def served = StreamSink.readCoVisitTopK(spark, "covisit_stream_spec",
          land, k = 5).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      // nothing streamed yet: the base index serves alone
      val baseDirect = Recs.coVisitation(
          li.filter(col("l_orderkey") % 3 === 0),
          "l_orderkey", "l_partkey", k = 5).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(served == baseDirect && served.nonEmpty)
      // two basket-complete batches land; a replayed batch overwrites
      // its own landing (exactly-once), never double-counts its pairs
      val b1 = li.filter(col("l_orderkey") % 3 === 1)
      val b2 = li.filter(col("l_orderkey") % 3 === 2)
      def pairs(b: org.apache.spark.sql.DataFrame) =
        Recs.coVisitationPairs(b, "l_orderkey", "l_partkey", 10000)
      StreamSink.landBatch(pairs(b1), land, 0L)
      StreamSink.landBatch(pairs(b2), land, 1L)
      StreamSink.landBatch(pairs(b2), land, 1L) // replay
      val full = Recs.coVisitation(li, "l_orderkey", "l_partkey", k = 5)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(served == full && full.nonEmpty)
      // landing OPTIMIZE: the fold changes the layout, never the serve
      assert(StreamSink.compactCoVisitLandings(spark, land))
      assert(served == full)
      // fold INTO the index (in-place): the base absorbs the landings,
      // the landing dir retires — the serve is unchanged and now reads
      // the bucketed index ALONE
      assert(StreamSink.compactCoVisitIntoIndex(spark,
        "covisit_stream_spec", land, buckets = 4))
      assert(graft.io.Landings.readLandings(spark, land).isEmpty,
        "retired landings must serve nothing")
      assert(served == full)
      // a replayed covered batch re-lands AFTER retirement: its id is in
      // the covering manifest, so it stays ignored — the exactly-once
      // guarantee survives the fold
      StreamSink.landBatch(pairs(b2), land, 1L)
      assert(graft.io.Landings.readLandings(spark, land).isEmpty)
      assert(served == full)
    } finally spark.sql("DROP TABLE IF EXISTS covisit_stream_spec")
  }

  test("toWeightedEdges protocol: base + landed batches serve the " +
    "from-scratch weighted walk under an ARBITRARY batch split; replay " +
    "idempotent; fold-invariant; no landings = base alone") {
    import graft.ops.Graph
    val root = Files.createTempDirectory("graft-westream").toString
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    def edges(f: org.apache.spark.sql.DataFrame) = f
      .select((col("l_suppkey") * 2 + 1).as("src"), (col("l_partkey") * 2).as("dst"))
      .unionAll(f.select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst")))
      .withColumn("w", lit(1L))
    val land = s"$root/landings"
    def ranks(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    try {
      Graph.writeWeightedEdgeIndex(edges(li.filter(col("l_orderkey") % 3 === 0)),
        "src", "dst", "w", "wedge_stream_spec", buckets = 4)
      def served = ranks(StreamSink.readWeightedPageRank(spark,
        "wedge_stream_spec", land, iterations = 3))
      // nothing streamed yet: the base index serves alone
      val baseDirect = ranks(Graph.weightedPageRankFromIndex(spark,
        "wedge_stream_spec", iterations = 3))
      assert(served == baseDirect && served.nonEmpty)
      // batches cut by LINE NUMBER — they split orders mid-basket, which
      // is legal here (weights sum per ROW, no cross-batch contract)
      val rest = li.filter(col("l_orderkey") % 3 =!= 0)
      def partial(b: org.apache.spark.sql.DataFrame) = edges(b)
        .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
      StreamSink.landBatch(partial(rest.filter(col("l_linenumber") % 2 === 0)),
        land, 0L)
      StreamSink.landBatch(partial(rest.filter(col("l_linenumber") % 2 === 1)),
        land, 1L)
      StreamSink.landBatch(partial(rest.filter(col("l_linenumber") % 2 === 1)),
        land, 1L) // replay overwrites its own landing, never double-counts
      Graph.writeWeightedEdgeIndex(edges(li), "src", "dst", "w",
        "wedge_stream_whole", buckets = 4)
      val full = ranks(Graph.weightedPageRankFromIndex(spark,
        "wedge_stream_whole", iterations = 3))
      assert(served == full && full.nonEmpty)
      // landing OPTIMIZE: the fold changes the layout, never the serve
      assert(StreamSink.compactWeightedEdges(spark, land))
      assert(served == full)
      // fold INTO the index (in-place): base absorbs the landings, the
      // landing dir retires, the serve is unchanged and is now the
      // durable-index walk alone
      assert(StreamSink.compactWeightedEdgesIntoIndex(spark,
        "wedge_stream_spec", land, buckets = 4))
      assert(graft.io.Landings.readLandings(spark, land).isEmpty,
        "retired landings must serve nothing")
      assert(served == full)
    } finally Seq("wedge_stream_spec", "wedge_stream_whole").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("toWeightedEdges drives a REAL streaming query end to end: " +
    "foreachBatch wiring (casts, per-batch pre-agg, empty-batch skip, " +
    "compaction cadence), then the fold into the index") {
    // ADVICE r17 #2: the protocol test above exercises landBatch/read/
    // compact directly — this one goes through an actual file-source
    // streaming query so the sink wiring itself is unit-covered
    import graft.ops.Graph
    val root = Files.createTempDirectory("graft-we-e2e").toString
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    def edges(f: org.apache.spark.sql.DataFrame) = f
      .select((col("l_suppkey") * 2 + 1).as("src"), (col("l_partkey") * 2).as("dst"))
      .unionAll(f.select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst")))
      .withColumn("w", lit(1L))
    val srcDir = s"$root/src"
    val rest = li.filter(col("l_orderkey") % 3 =!= 0)
    // three slice files (one micro-batch each under maxFilesPerTrigger=1)
    // + one EMPTY slice to exercise the empty-batch skip;
    // w as INT so the sink's cast-to-long wiring is observable
    (0 until 3).foreach { i =>
      edges(rest.filter(pmod(col("l_linenumber"), lit(3)) === i))
        .withColumn("w", col("w").cast("int"))
        .coalesce(1).write.mode("append").parquet(srcDir)
    }
    edges(rest.filter(lit(false))).withColumn("w", col("w").cast("int"))
      .coalesce(1).write.mode("append").parquet(srcDir)
    val sch = spark.read.parquet(srcDir).schema
    val q = StreamSink.toWeightedEdges(
      spark.readStream.schema(sch).option("maxFilesPerTrigger", "1")
        .parquet(srcDir),
      s"$root/landings", s"$root/ckpt", "src", "dst", "w",
      compactEvery = 2) // cadence fires mid-stream
    q.processAllAvailable(); q.stop()
    try {
      Graph.writeWeightedEdgeIndex(edges(li.filter(col("l_orderkey") % 3 === 0)),
        "src", "dst", "w", "wedge_e2e_spec", buckets = 4)
      def ranks(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val served = ranks(StreamSink.readWeightedPageRank(spark,
        "wedge_e2e_spec", s"$root/landings", iterations = 3))
      Graph.writeWeightedEdgeIndex(edges(li), "src", "dst", "w",
        "wedge_e2e_whole", buckets = 4)
      val full = ranks(Graph.weightedPageRankFromIndex(spark,
        "wedge_e2e_whole", iterations = 3))
      assert(served == full && full.nonEmpty)
      // fold into the index; the streamed state must survive unchanged
      assert(StreamSink.compactWeightedEdgesIntoIndex(spark,
        "wedge_e2e_spec", s"$root/landings", buckets = 4))
      assert(ranks(StreamSink.readWeightedPageRank(spark, "wedge_e2e_spec",
        s"$root/landings", iterations = 3)) == full)
    } finally Seq("wedge_e2e_spec", "wedge_e2e_whole").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("toIvfLandings protocol: base + landed batches serve the from-scratch pair set; replay idempotent; no landings = base alone") {
    import graft.ops.Similarity
    val root = Files.createTempDirectory("graft-ivfstream").toString
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    Similarity.writeIndex(emb.filter(col("vec_id") % 3 === 0),
      s"$root/base", nCells = 8)
    // nothing streamed yet: serving falls back to the base index alone
    val baseOnly = Similarity.cosinePairsBlockedFromIndexWithLandings(
      spark, s"$root/base", s"$root/landings", threshold = 0.3).collect()
    val baseDirect = Similarity.cosinePairsBlockedFromIndex(
      spark, s"$root/base", threshold = 0.3).collect()
    assert(baseOnly.toSeq == baseDirect.toSeq)
    // two streamed batches, landed with the exactly-once rename protocol
    val b1 = emb.filter(col("vec_id") % 3 === 1)
    val b2 = emb.filter(col("vec_id") % 3 === 2)
    StreamSink.landBatch(Similarity.assignmentForIndex(b1, s"$root/base"),
      s"$root/landings", 0L, partitionCols = Seq("cell"))
    StreamSink.landBatch(Similarity.assignmentForIndex(b2, s"$root/base"),
      s"$root/landings", 1L, partitionCols = Seq("cell"))
    // a replay of batch 1 must overwrite its own landing, never duplicate
    StreamSink.landBatch(Similarity.assignmentForIndex(b2, s"$root/base"),
      s"$root/landings", 1L, partitionCols = Seq("cell"))
    val served = Similarity.cosinePairsBlockedFromIndexWithLandings(
      spark, s"$root/base", s"$root/landings", threshold = 0.3)
      .collect().toSeq
    val scratch = Similarity.cosinePairsBlocked(emb, threshold = 0.3,
      nCells = 8).collect().toSeq
    assert(served.nonEmpty && served == scratch)
  }

  test("toSampleSketch landings: re-take-bottom-k across batches equals the direct sketch; replay idempotent") {
    import graft.ops.Sketches
    import spark.implicits._
    val k = 8
    val path = java.nio.file.Files.createTempDirectory("qstream").toString + "/sk"
    val rnd = new scala.util.Random(0x5AFE5L)
    val all = (1L to 300L).map(i => (s"g${i % 3}", i, rnd.nextDouble() * 50))
      .toDF("g", "id", "v")
    val parts = Seq(all.filter($"id" % 3 === 0), all.filter($"id" % 3 === 1),
      all.filter($"id" % 3 === 2))
    parts.zipWithIndex.foreach { case (b, i) =>
      StreamSink.landBatch(
        Sketches.sampleSketch(b, $"g", $"id", $"v", k), path, i.toLong)
    }
    // replay of batch 1 must not change the served sketch
    StreamSink.landBatch(
      Sketches.sampleSketch(parts(1), $"g", $"id", $"v", k), path, 1L)
    val merged = StreamSink.readSampleSketch(spark, path, k)
      .select($"grp", $"h", $"v").as[(String, Long, Double)]
      .collect().sortBy(r => (r._1, r._2, r._3)).toSeq
    val direct = Sketches.sampleSketch(all, $"g", $"id", $"v", k)
      .select($"grp", $"h", $"v").as[(String, Long, Double)]
      .collect().sortBy(r => (r._1, r._2, r._3)).toSeq
    assert(merged == direct && direct.nonEmpty)
  }
}
