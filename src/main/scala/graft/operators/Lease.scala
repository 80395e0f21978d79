package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** WRITER LEASE for the journey-owned state directories (growing
  * index tiers, accepted/, the mergeable states): turns the
  * "single-writer by convention" quiesce rule into an enforced
  * contract. Without it, two concurrent `RunIntake` steps against one
  * stateDir can interleave their probe-then-append windows and BOTH
  * admit the same duplicate, and a reader during `replaceTable`'s
  * two-rename swap can observe a missing table. With it, every
  * state-mutating journey brackets its run in
  * [[withLease]] — one writer at a time, crash-safe via TTL expiry.
  *
  * Mechanics (single small file, `<stateDir>/_lease`):
  *  - ACQUIRE = atomic create-if-absent (`FileSystem.create` with
  *    overwrite = false — atomic on HDFS and local filesystems; on an
  *    object store use the conditional-put equivalent). The file
  *    carries (owner, fencing token, expiry wall-clock ms).
  *  - A held, unexpired lease makes acquire throw [[LeaseHeld]] with
  *    the holder's identity — the caller's move is back-off/retry or
  *    fail the run, never proceed.
  *  - STEAL-AFTER-EXPIRY: an expired lease (crashed holder — the TTL
  *    is the crash detector) is deleted and re-acquired through the
  *    same atomic create, so racing stealers still serialize: whoever
  *    wins the create owns it.
  *  - FENCING: [[renew]] and [[release]] verify the file still holds
  *    OUR token. A holder that overran its TTL and was stolen from
  *    gets [[LeaseLost]] — abort, don't write (the classic stale-
  *    leaseholder fence; losing the lease mid-run means another
  *    writer may already be mutating the state).
  *
  * What the lease does NOT do: it cannot fence a writer that ignores
  * it (plain parquet has no server to reject stale writers — that is
  * the transactional-format gap SCALE.md documents); every
  * state-mutating entry point in THIS engine takes it, which closes
  * the race between well-behaved writers. Readers stay lease-free:
  * probes are read-only and the swap windows they could observe are
  * repaired by [[Compaction.recoverTable]].
  */
object Lease {

  /** Another live writer holds the lease — back off or fail the run. */
  final class LeaseHeld(val dir: String, val holder: String,
      val expiresMs: Long)
    extends RuntimeException(
      s"state dir $dir is lease-held by $holder until epoch-ms " +
        s"$expiresMs — concurrent state mutation is a double-admit " +
        s"race; retry after it releases or expires")

  /** Our lease vanished or was stolen (we overran the TTL and a new
    * writer fenced us out) — the state may already be mutating under
    * someone else: abort without writing. */
  final class LeaseLost(val dir: String, val detail: String)
    extends RuntimeException(
      s"lease on $dir lost: $detail — aborting (another writer may " +
        s"own the state now)")

  /** A held lease. `token` is the fencing identity; all mutation of
    * the lease file verifies it. */
  final case class Handle(dir: String, owner: String, token: String,
      ttlMs: Long, conf: SerializableConf) {
    def renew(): Unit = Lease.renew(this)
    def release(): Unit = Lease.release(this)
  }

  /** Hadoop Configuration is not serializable/case-class friendly —
    * tiny wrapper so Handle stays a plain value. */
  final class SerializableConf(@transient val conf: Configuration)

  private def leasePath(dir: String) = new Path(dir, "_lease")

  private def fsOf(dir: String, conf: Configuration): FileSystem =
    new Path(dir).getFileSystem(conf)

  private def writeBody(h: Handle, fs: FileSystem, p: Path,
      overwrite: Boolean, expiresMs: Long): Unit = {
    val out = fs.create(p, overwrite)
    try out.write(
      s"""{"owner":"${h.owner}","token":"${h.token}","expires_ms":$expiresMs}"""
        .getBytes("UTF-8"))
    finally out.close()
  }

  private def readBody(fs: FileSystem, p: Path): Option[(String, String, Long)] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text =
        try new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        finally in.close()
      def field(k: String): Option[String] = {
        val m = ("\"" + k + "\":\"?([^\",}]*)\"?").r
          .findFirstMatchIn(text)
        m.map(_.group(1))
      }
      for {
        o <- field("owner"); t <- field("token"); e <- field("expires_ms")
      } yield (o, t, e.toLong)
    }

  /** Acquire the writer lease on `dir`, stealing an EXPIRED one.
    * Throws [[LeaseHeld]] if a live writer owns it. `owner` is
    * diagnostic (shown to the loser); the `token` uuid is the fence. */
  def acquire(conf: Configuration, dir: String, owner: String,
      ttlMs: Long = 30 * 60 * 1000L): Handle = {
    val fs = fsOf(dir, conf)
    fs.mkdirs(new Path(dir))
    val p = leasePath(dir)
    val h = Handle(dir, owner, java.util.UUID.randomUUID().toString,
      ttlMs, new SerializableConf(conf))
    val now = System.currentTimeMillis()
    readBody(fs, p) match {
      case Some((holder, _, exp)) if exp > now =>
        throw new LeaseHeld(dir, holder, exp)
      case Some(_) =>
        // expired: steal. delete + atomic re-create; racing stealers
        // serialize on the create — exactly one wins, losers throw
        fs.delete(p, false)
        try writeBody(h, fs, p, overwrite = false, now + ttlMs)
        catch { case _: java.io.IOException =>
          val w = readBody(fs, p)
          throw new LeaseHeld(dir, w.map(_._1).getOrElse("?"),
            w.map(_._3).getOrElse(0L))
        }
        h
      case None =>
        try writeBody(h, fs, p, overwrite = false, now + ttlMs)
        catch { case _: java.io.IOException =>
          val w = readBody(fs, p)
          throw new LeaseHeld(dir, w.map(_._1).getOrElse("?"),
            w.map(_._3).getOrElse(0L))
        }
        h
    }
  }

  /** Extend our lease by its TTL. [[LeaseLost]] if the file no longer
    * carries our token (stolen after expiry) or vanished. */
  def renew(h: Handle): Unit = {
    val fs = fsOf(h.dir, h.conf.conf)
    val p = leasePath(h.dir)
    readBody(fs, p) match {
      case Some((_, tok, _)) if tok == h.token =>
        writeBody(h, fs, p, overwrite = true,
          System.currentTimeMillis() + h.ttlMs)
      case Some((holder, _, _)) =>
        throw new LeaseLost(h.dir, s"now held by $holder")
      case None => throw new LeaseLost(h.dir, "lease file vanished")
    }
  }

  /** Release our lease. Quietly ignores an already-stolen/expired
    * lease (the work is done either way; the successor owns the dir). */
  def release(h: Handle): Unit = {
    val fs = fsOf(h.dir, h.conf.conf)
    val p = leasePath(h.dir)
    readBody(fs, p) match {
      case Some((_, tok, _)) if tok == h.token => fs.delete(p, false)
      case _ => ()
    }
  }

  /** Bracket a state-mutating block in acquire/release — the form
    * every journey uses. The lease releases on success AND on failure
    * (a crashed JVM can't release — that is what the TTL is for). */
  def withLease[T](conf: Configuration, dir: String, owner: String,
      ttlMs: Long = 30 * 60 * 1000L)(f: Handle => T): T = {
    val h = acquire(conf, dir, owner, ttlMs)
    try f(h) finally release(h)
  }

  /** Default diagnostic owner string: pid@host. */
  def defaultOwner(): String = {
    val pid = ProcessHandle.current().pid()
    val host =
      try java.net.InetAddress.getLocalHost.getHostName
      catch { case _: Exception => "localhost" }
    s"$pid@$host"
  }
}
