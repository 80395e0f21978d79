package graft.sources

import graft.operators.TxLog

/** [[graft.operators.TxLog.ConditionalPutStore]] over the S3 HTTP
  * wire shape — the client half of the object-store commit claim
  * (TxLog's scheme allowlist refuses s3a/gcs/abfs rename-claims and
  * points HERE): one `PUT` carrying `If-None-Match: *`, the store
  * arbitrating atomically — `200` = this writer created the object,
  * `412 Precondition Failed` = the name is already claimed. This is
  * S3's published conditional-write contract (PutObject with
  * If-None-Match, added 2024 and the basis of Delta's S3 "coordinated
  * commits" successor designs; MinIO and GCS/Azure expose the same
  * create-iff-absent under their own header spellings).
  *
  * Deliberately carries NO auth signing: request signing (SigV4) is
  * deployment glue that varies per store and credential source, and
  * an endpoint fronted by anonymous-write policy (MinIO dev, IRSA
  * sidecar proxies, signed-URL brokers) needs none. A deployment that
  * signs wraps [[put]]'s request the same way it signs everything
  * else; the CLAIM SEMANTICS — one 200 per key, everyone else 412 —
  * are what the tx layer needs and what
  * [[graft.tools.S3ClaimProbe]] races for real over TCP.
  *
  * `endpoint` example: `http://127.0.0.1:9000` (path-style; the
  * object key is the claim path verbatim, so the same string names
  * the manifest for HTTP writers and filesystem readers). */
final class S3ConditionalPutStore(endpoint: String)
    extends TxLog.ConditionalPutStore {

  private val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10)).build()

  private def uriFor(path: String): java.net.URI = {
    require(path.startsWith("/"),
      s"S3ConditionalPutStore: claim paths are absolute, got $path")
    // encode each segment; keep the '/' structure (S3 path-style keys)
    val enc = path.split("/", -1).map(seg =>
      java.net.URLEncoder.encode(seg, "UTF-8").replace("+", "%20"))
      .mkString("/")
    java.net.URI.create(s"$endpoint$enc")
  }

  override def putIfNoneMatch(path: String,
      bytes: Array[Byte]): Boolean = {
    // 409 (ConditionalRequestConflict) means the race is UNRESOLVED —
    // the competing upload may still fail, so treating it as a loss
    // can leave the name never claimed (a version gap: this writer
    // bumps to v+1 while v's manifest doesn't exist). Re-probe and
    // retry the PUT with backoff until a DEFINITIVE outcome: 200 (we
    // claimed), 412 or the key observably existing (someone else
    // claimed).
    var attempt = 0
    while (true) {
      val req = java.net.http.HttpRequest.newBuilder(uriFor(path))
        .header("If-None-Match", "*")
        .PUT(java.net.http.HttpRequest.BodyPublishers.ofByteArray(bytes))
        .build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      resp.statusCode() match {
        case 200 => return true
        case 412 => return false // Precondition Failed: name is held
        case 409 =>
          if (get(path).isDefined) return false // now observably held
          attempt += 1
          if (attempt > 8) throw new java.io.IOException(
            s"S3 conditional put of $path: HTTP 409 on every attempt " +
              s"($attempt) and the key never materialized — the race " +
              "never resolved; refusing to guess (a guessed claim can " +
              "lose commits)")
          Thread.sleep(math.min(50L << (attempt - 1), 2000L))
        case other => throw new java.io.IOException(
          s"S3 conditional put of $path: unexpected HTTP $other " +
            s"(${resp.body().take(200)}) — neither created nor " +
            "precondition-failed; refusing to guess (a guessed claim " +
            "can lose commits)")
      }
    }
    false // unreachable
  }

  /** GET an object's bytes (None = 404 NoSuchKey) — the read half a
    * pure-HTTP deployment would use; the probe asserts read-your-
    * claim through it. */
  def get(path: String): Option[Array[Byte]] = {
    val req = java.net.http.HttpRequest.newBuilder(uriFor(path))
      .GET().build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofByteArray())
    resp.statusCode() match {
      case 200 => Some(resp.body())
      case 404 => None
      case other => throw new java.io.IOException(
        s"S3 get of $path: unexpected HTTP $other")
    }
  }
}
