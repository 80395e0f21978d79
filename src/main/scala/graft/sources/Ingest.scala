package graft.sources

/** Ingest connector boundary (SURVEY §2 S1/S2; reference:
  * `src/unpacked_to_raw.py:32-87`).
  *
  * The engine proper starts at the bronze lake; everything upstream —
  * requesting an export from a provider, polling until the file is
  * ready, rate limits — is a CONNECTOR concern. The reference's
  * GEODAIR flow is: POST an export request (S1), then poll the
  * download endpoint with a fixed delay until the payload appears
  * (S2), under a hard 15-requests/hour API cap. This file documents
  * that boundary as a trait with the reference's retry/backoff
  * semantics implemented once, connector-independently, plus a
  * local-file connector for tests and air-gapped runs. A real HTTP
  * connector would implement [[ExportConnector]] and nothing else
  * (no HTTP client ships in this library).
  */
trait ExportConnector {

  /** S1: request an export for one (pollutant, date) slice; returns an
    * opaque export id the provider will serve the file under. */
  def requestExport(pollutantCode: String, date: String): String

  /** S2 probe: one download attempt. `None` = not ready yet (the
    * reference's empty-response case); `Some(bytes)` = the CSV payload. */
  def download(exportId: String): Option[Array[Byte]]
}

/** Sliding-window rate limiter for provider request caps (reference:
  * 15 requests/hour, `src/unpacked_to_raw.py:77-78`). `acquire`
  * returns the milliseconds the caller must wait before the next
  * request is allowed (0 = go now) — the caller owns the sleeping, so
  * the limiter is deterministic and testable with an injected clock. */
final class RateLimiter(maxRequests: Int, perMillis: Long,
    now: () => Long = () => System.currentTimeMillis()) {
  require(maxRequests >= 1, s"maxRequests must be >= 1, got $maxRequests")
  private val stamps = scala.collection.mutable.Queue[Long]()

  def acquire(): Long = synchronized {
    val t = now()
    while (stamps.nonEmpty && t - stamps.head >= perMillis) stamps.dequeue()
    if (stamps.size < maxRequests) { stamps.enqueue(t); 0L }
    else stamps.head + perMillis - t
  }
}

object Ingest {

  /** Outcome of one slice fetch: the payload, or why it was skipped. */
  sealed trait FetchResult
  final case class Fetched(exportId: String, bytes: Array[Byte]) extends FetchResult
  final case class NotReady(exportId: String, polls: Int) extends FetchResult

  /** S2: request + poll-with-delay until the export is downloadable —
    * the reference's loop (`unpacked_to_raw.py:50-58`): an initial
    * delay before the first attempt, then up to `maxPolls` attempts
    * `pollDelayMs` apart. `sleep` is injected so tests run in zero
    * wall-clock time. */
  def fetchWithRetry(connector: ExportConnector, pollutantCode: String,
      date: String, initialDelayMs: Long = 2000, pollDelayMs: Long = 2000,
      maxPolls: Int = 5, sleep: Long => Unit = Thread.sleep): FetchResult = {
    val id = connector.requestExport(pollutantCode, date)
    sleep(initialDelayMs)
    var attempt = 0
    while (attempt < maxPolls) {
      connector.download(id) match {
        case Some(bytes) => return Fetched(id, bytes)
        case None =>
          attempt += 1
          if (attempt < maxPolls) sleep(pollDelayMs)
      }
    }
    NotReady(id, maxPolls)
  }

  /** Fetch a batch of (pollutant, date) slices under a provider rate
    * cap, in order. Returns per-slice results; a rate-cap wait sleeps
    * (injected) rather than dropping the slice. */
  def fetchBatch(connector: ExportConnector,
      slices: Seq[(String, String)], limiter: RateLimiter,
      initialDelayMs: Long = 2000, pollDelayMs: Long = 2000,
      maxPolls: Int = 5,
      sleep: Long => Unit = Thread.sleep): Seq[((String, String), FetchResult)] =
    slices.map { case (code, date) =>
      var wait = limiter.acquire()
      while (wait > 0) { sleep(wait); wait = limiter.acquire() }
      (code, date) -> fetchWithRetry(connector, code, date,
        initialDelayMs, pollDelayMs, maxPolls, sleep)
    }
}

/** Local-file connector: serves the filename contract
  * `polluant-{code}_{date}.csv` from a directory — the test/air-gapped
  * stand-in for the provider. `readyAfterPolls` simulates S2's
  * not-ready-yet window (the nth download succeeds). */
final class LocalFileConnector(dir: String, readyAfterPolls: Int = 0)
    extends ExportConnector {
  private val attempts = scala.collection.mutable.Map[String, Int]()

  override def requestExport(pollutantCode: String, date: String): String =
    s"polluant-${pollutantCode}_$date.csv"

  override def download(exportId: String): Option[Array[Byte]] = {
    val n = attempts.getOrElse(exportId, 0)
    attempts(exportId) = n + 1
    val f = java.nio.file.Paths.get(dir, exportId)
    if (n < readyAfterPolls || !java.nio.file.Files.exists(f)) None
    else Some(java.nio.file.Files.readAllBytes(f))
  }
}
