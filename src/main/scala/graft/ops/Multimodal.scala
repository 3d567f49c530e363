package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media travel as opaque `binary` columns with
  * a typed metadata struct; decode/feature-extract runs per partition so
  * batches amortize any codec setup cost.
  *
  * The decode step is a clearly-marked deterministic STUB — this
  * environment has no image/audio codecs, so "decoding" computes byte
  * statistics. The Spark-side plumbing (schema, binary column, partition
  * batching, feature output shape) is the real, tested part: a production
  * deployment swaps `decodeStub` for a codec call without touching the
  * plan shape.
  */
object Multimodal {

  final case class MediaFeatures(doc_id: Long, n_bytes: Long, first_byte: Int,
      checksum: Long)

  /** STUB for media decode: deterministic byte-level features standing in
    * for (width, height, duration, …). Same rolling hash as
    * TextFunctions.polyHash so the oracle can replay it over ASCII text. */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaFeatures = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    MediaFeatures(id, bytes.length.toLong,
      if (bytes.nonEmpty) bytes(0) & 0xff else -1, acc)
  }

  /** Attach an opaque binary payload + typed metadata to each document.
    * (Test corpus has no real media, so the payload is the UTF-8 text.) */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"),
      struct(lit("text/plain").as("mime"), length(col("text")).as("n_chars")).as("meta"))

  /** Feature extraction over the binary column as pure column expressions
    * (the [[decodeStub]] features are all expressible declaratively):
    * stays inside whole-stage codegen, no encoder/object boundary, no
    * shuffle. `first_byte` reads the payload's first octet unsigned via
    * substr→hex→conv (all codegen'd, O(1)); the checksum is the compiled
    * BytePolyHash expression. This is the default path; [[extractFeatures]]
    * keeps the mapPartitions shape for real codecs that force imperative
    * per-batch decode. */
  def extractFeaturesDeclarative(docs: DataFrame): DataFrame = {
    graft.functions.CatalystExpressions.register(docs.sparkSession)
    withPayload(docs).select(
      col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      when(length(col("payload")) === 0, lit(-1))
        .otherwise(conv(hex(col("payload").substr(1, 1)), 16, 10).cast("int"))
        .as("first_byte"),
      call_function("graft_bytehash", col("payload")).as("checksum"))
  }

  /** Distributed feature extraction over the binary column: mapPartitions
    * keeps decode batched per task (the Scala analogue of mapInPandas) —
    * the shape a real codec needs; for stub-expressible features prefer
    * [[extractFeaturesDeclarative]]. */
  def extractFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    withPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
      .toDF()
  }

  /** STUB for media resize/downsample: keep every `stride`-th byte. A real
    * deployment swaps the body for an image scaler; the contract —
    * binary in, smaller binary out, schema unchanged — is what the
    * pipeline depends on. */
  def resizeStub(bytes: Array[Byte], stride: Int): Array[Byte] = {
    val out = new Array[Byte]((bytes.length + stride - 1) / stride)
    var i = 0
    while (i < out.length) { out(i) = bytes(i * stride); i += 1 }
    out
  }

  /** Batched resize over the payload column (same mapPartitions shape as
    * [[extractFeatures]]). Returns (doc_id, payload); re-derive or re-join
    * metadata downstream — the payload change invalidates size-dependent
    * meta anyway. */
  def resize(spark: SparkSession, payloaded: DataFrame, stride: Int): DataFrame = {
    import spark.implicits._
    payloaded.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => (id, resizeStub(b, stride)) })
      .toDF("doc_id", "payload")
  }

  /** Frame sampling: one output row per sampled fixed-width frame of the
    * payload — frame i covers bytes [i·stride, i·stride + frameSize).
    * Fully declarative (sequence → transform → posexplode over binary
    * substring), so it stays inside whole-stage codegen and needs no
    * shuffle: the 1→N row expansion every video/audio pipeline starts
    * with. A real deployment replaces "fixed stride" with codec keyframe
    * offsets from the metadata struct. */
  def frameSample(payloaded: DataFrame, frameSize: Int, stride: Int): DataFrame = {
    val n = length(col("payload"))
    val nFrames = expr(s"(length(payload) - $frameSize) div $stride") + 1
    payloaded
      .filter(n >= frameSize)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), (nFrames - 1).cast("int")),
          i => col("payload").substr(i * stride + 1, lit(frameSize)))))
      .select(col("doc_id"), col("pos").cast("long").as("frame_no"),
        col("col").as("frame"))
  }
}
