package graft.pipeline

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Java-serializable carrier for a Hadoop `Configuration` (which is a
  * `Writable`, not `Serializable`), so executor-side file access sees
  * the SESSION's configuration — `spark.hadoop.*` keys, object-store
  * credentials and endpoints, custom `fs.*.impl` registrations —
  * instead of a default-constructed one. Serialization uses the
  * Writable wire format (`write`/`readFields`), the same mechanism
  * Spark's own internal wrapper uses; defined here because that
  * wrapper is `private[spark]`. Broadcast it once and read `.value`
  * once per task. */
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
