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

  /** Distributed feature extraction over the binary column: mapPartitions
    * keeps decode batched per task (the Scala analogue of mapInPandas). */
  def extractFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    withPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
      .toDF()
  }
}
