package graft.sinks

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Java-serializable wrapper for a Hadoop `Configuration`, for shipping
  * the session's filesystem settings into executor closures (custom FS
  * implementations, credentials providers, endpoint overrides). Spark's
  * own `org.apache.spark.util.SerializableConfiguration` is
  * `private[spark]`; this is the same three-line idea.
  */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
