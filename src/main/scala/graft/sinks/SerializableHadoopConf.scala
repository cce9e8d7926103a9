package graft.sinks

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Java-serializable wrapper for a Hadoop `Configuration`, for shipping
  * the session's filesystem settings into executor closures (custom FS
  * implementations, credentials providers, endpoint overrides). Spark's
  * own `org.apache.spark.util.SerializableConfiguration` is
  * `private[spark]`; this is the same idea with a FASTER wire format:
  * `Configuration.write`/`readFields` gzip-wrap EVERY key and value
  * (`WritableUtils.writeCompressedString` — one `GZIPInputStream` plus
  * an internally-thrown `EOFException` per entry on read), which
  * jstack-sampled as ~35-40 ms of pure deserialization in EVERY task
  * whose closure carries the conf (~1000 entries in a live session).
  * Plain string pairs deserialize the same conf in ~1 ms.
  */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    val entries = {
      val it = value.iterator()
      val buf = scala.collection.mutable.ArrayBuffer[(String, String)]()
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf
    }
    out.writeInt(entries.size)
    // writeObject, not writeUTF: conf values (classpaths, serializer
    // lists) can exceed writeUTF's 64 KB modified-UTF limit
    entries.foreach { case (k, v) => out.writeObject(k); out.writeObject(v) }
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    var n = in.readInt()
    while (n > 0) {
      value.set(in.readObject().asInstanceOf[String],
        in.readObject().asInstanceOf[String])
      n -= 1
    }
  }
}
