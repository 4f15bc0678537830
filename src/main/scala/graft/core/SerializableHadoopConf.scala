package graft.core

import org.apache.hadoop.conf.Configuration

/** Serializable carrier shipping the DRIVER's resolved Hadoop
  * configuration into executor-side closures.
  *
  * `Configuration` itself is not `java.io.Serializable`, and rebuilding
  * one on the executor with `new Configuration()` loads only the
  * classpath core-site/hdfs-site — none of the `spark.hadoop.*` settings
  * the session carries (object-store credentials and endpoints, custom
  * `fs.<scheme>.impl` bindings). On exactly the deployments where
  * executor-side filesystem access matters, a bare executor
  * Configuration would resolve paths through the wrong (or no)
  * filesystem. Same shape as Spark's internal
  * `org.apache.spark.util.SerializableConfiguration` (private[spark]):
  * the property set round-trips through Hadoop's own Writable encoding.
  */
final class SerializableHadoopConf(@transient private var conf: Configuration)
    extends Serializable {

  def value: Configuration = conf

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    // no-defaults: the driver side already resolved and serialized every
    // effective property; re-layering executor-local defaults underneath
    // could differ from what the driver planned against
    conf = new Configuration(false)
    conf.readFields(in)
  }
}
