package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store provider selection for the stateful streaming operators.
  *
  * The default (HDFS-backed) provider keeps every key's state in executor
  * heap between micro-batches — fine for bounded keyspaces, but open-
  * session state at 100-TB stream scale must spill: RocksDB keeps state
  * off-heap on local disk with incremental checkpointing, bounding heap
  * by the working set instead of the keyspace.
  *
  * Spark reads `spark.sql.streaming.stateStore.providerClass` when a
  * streaming query STARTS, so selection is per-query-start: call
  * [[configure]] (honoring the `spark.graft.streaming.stateStore` switch)
  * or [[withProvider]] before `.writeStream.start()`. Output is provider-
  * independent — SessionizeStateSpec replays the same stream under both
  * providers and asserts identical sessions.
  */
object StateStores {

  /** Friendly switch: set `spark.graft.streaming.stateStore` to `memory`
    * (default provider), `rocksdb`, or a fully-qualified provider class. */
  val SwitchKey = "spark.graft.streaming.stateStore"

  val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  val MemoryProvider =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  val RocksDBProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def resolve(switch: String): String = switch.trim.toLowerCase match {
    case "memory" | "hdfs" | "default" => MemoryProvider
    case "rocksdb"                     => RocksDBProvider
    case _                             => switch // assume a provider class
  }

  /** Apply the graft switch (if set) to the session's provider conf.
    * Call before starting stateful streaming queries. */
  def configure(spark: SparkSession): Unit =
    spark.conf.getOption(SwitchKey).foreach { s =>
      spark.conf.set(ProviderKey, resolve(s))
    }

  /** Run `body` (typically "start + drain a streaming query") with the
    * given provider, restoring the previous conf afterwards. */
  def withProvider[T](spark: SparkSession, provider: String)(body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, resolve(provider))
    try body
    finally prev match {
      case Some(p) => spark.conf.set(ProviderKey, p)
      case None    => spark.conf.unset(ProviderKey)
    }
  }
}
