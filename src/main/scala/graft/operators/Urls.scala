package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL CANONICALIZATION — the first dedup key of every web-crawl
  * corpus (CommonCrawl-derived pipelines collapse scheme/case/port/
  * tracking-param variants before any content dedup runs; C4 and
  * CCNet both key their first pass on the normalized URL). Pure
  * column algebra over Spark's codegen'd string builtins — no UDF,
  * no driver round-trip — so the whole normalization runs inside
  * whole-stage codegen and replays in any SQL engine:
  *
  *   1. drop the fragment (`#…` — client-side only),
  *   2. lowercase the scheme and the host (NOT the path — paths are
  *      case-sensitive),
  *   3. strip a leading `www.`,
  *   4. strip the scheme's default port (`:80` http, `:443` https),
  *   5. collapse trailing slashes on a non-root path; empty path → `/`,
  *   6. drop tracking parameters (`utm_*`, `fbclid`, `gclid`, `ref`),
  *   7. sort the surviving query parameters (order never changes the
  *      resource; sorting makes equal resources string-equal).
  */
object Urls {

  private val trackingParam = "^(utm_[^=]*|fbclid|gclid|ref)="

  /** The canonical form of `url` (steps above). Input is expected to
    * carry a `scheme://` prefix; anything else passes through the
    * same algebra unharmed (no nulls introduced). */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostPort = regexp_replace(lower(regexp_extract(rest, "^([^/?]*)", 1)),
      "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val pathQ = regexp_replace(rest, "^[^/?]*", "")
    val rawPath = regexp_extract(pathQ, "^([^?]*)", 1)
    val path = when(rawPath === "", lit("/"))
      .otherwise(regexp_replace(rawPath, "(.)/+$", "$1"))
    val query = regexp_extract(pathQ, "\\?(.*)$", 1)
    val kept = filter(split(query, "&"),
      p => !(p.rlike(trackingParam)) && p =!= "")
    val sorted = array_join(array_sort(kept), "&")
    concat(scheme, lit("://"), host, path,
      when(sorted === "", lit("")).otherwise(concat(lit("?"), sorted)))
  }
}
