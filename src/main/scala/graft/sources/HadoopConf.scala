package graft.sources

import org.apache.hadoop.conf.Configuration

/** Serializable carrier for the SESSION's Hadoop configuration, for tasks
  * that open filesystems themselves (exact-name file sinks). A bare
  * `new Configuration()` on an executor loads only classpath defaults and
  * silently drops every `spark.hadoop.*` session setting — credentials,
  * `fs.defaultFS`, endpoint overrides — so writes target the wrong or an
  * unauthenticated filesystem on real clusters. (`Configuration` itself is
  * Writable but not java-Serializable; Spark's own wrapper is
  * `private[spark]`.)
  */
final class HadoopConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

object HadoopConf {
  /** Capture the active session's Hadoop configuration. */
  def of(df: org.apache.spark.sql.Dataset[_]): HadoopConf =
    new HadoopConf(df.sparkSession.sparkContext.hadoopConfiguration)
}
