package org.apache.spark.sql.graft

import org.apache.hadoop.conf.Configuration

/** Serializable carrier for the session's Hadoop configuration, for
  * executor-side `FileSystem` access (the deep-clone distributed file
  * copy). Spark's own `org.apache.spark.util.SerializableConfiguration`
  * is `private[spark]`, so the wrap lives in this package — the same
  * namespace placement as the DSv2 bridge beside it — and exposes only
  * the `Configuration`.
  */
final class SerializableHadoopConf(conf: Configuration) extends Serializable {
  private val inner = new org.apache.spark.util.SerializableConfiguration(conf)
  def value: Configuration = inner.value
}
