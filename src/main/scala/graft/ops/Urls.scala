package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + canonical-URL dedup — the first dedup pass
  * of every web-crawl training pipeline (CCNet/RefinedWeb drop exact
  * URL re-crawls before any content hashing): the same page is
  * fetched as `http://` and `https://`, with and without `www.`,
  * with tracking query params (`utm_*`, `fbclid`, `gclid`, `ref`)
  * and fragments appended, and with or without a trailing slash.
  * Canonicalizing first makes the later (much more expensive)
  * content-level dedup see each page once.
  *
  * Everything here is a row-local projection + one hash aggregate on
  * the canonical key — the corpus shuffles exactly once, on a key
  * that is near-unique after canonicalization, so the aggregate is
  * as skew-free as the crawl itself. Scan-scales to 100 TB.
  *
  * All steps are plain `regexp_replace`/`lower` over the URL string
  * (codegen'd, no UDFs) with RE2-safe patterns, so the identical
  * semantics are expressible in any engine's regex dialect — which
  * is what makes the gate oracle-able bit-for-bit.
  */
object Urls {

  /** Tracking query parameters stripped during canonicalization.
    * Matched as whole `key=value` pairs; `ref` is intentionally NOT
    * here (it is meaningful on many forums) — this is the common
    * cross-site analytics set.
    */
  val trackingParams = Seq("utm_[a-z]+", "fbclid", "gclid", "msclkid")

  /** Canonical form of a URL column:
    *   1. lowercase (hosts are case-insensitive; paths on the big
    *      CDNs effectively are, and crawls mix cases freely)
    *   2. drop the scheme (`http://` vs `https://` re-crawl twins)
    *   3. drop a leading `www.`
    *   4. drop the `#fragment` (never sent to the server)
    *   5. drop tracking params wherever they sit in the query
    *   6. drop a now-empty `?` / a dangling `?`/`&` left by (5)
    *   7. drop a trailing `/` — at the end of the URL or at the end
    *      of the path right before `?` (`/p/1/?id=1` ≡ `/p/1?id=1`).
    *      Known approximation: a literal `/?` INSIDE a query value is
    *      also collapsed; that never identifies two genuinely
    *      different pages in practice, and dedup keys only need to be
    *      stable, not parse-perfect.
    */
  def canonicalize(url: Column): Column = {
    val lowered = lower(url)
    val noScheme = regexp_replace(lowered, "^[a-z][a-z0-9+.-]*://", "")
    val noWww = regexp_replace(noScheme, "^www\\.", "")
    val noFrag = regexp_replace(noWww, "#.*$", "")
    // a tracking pair is removed TOGETHER WITH its following `&` if it
    // has one (keeps `a=1&utm_x=2&b=3` → `a=1&b=3` in one pass);
    // a pair that was last in the query leaves a dangling `?`/`&`
    // swept by the next step
    val noTrack = regexp_replace(noFrag,
      s"(${trackingParams.mkString("|")})=[^&#]*&?", "")
    val noDangle = regexp_replace(noTrack, "[?&]+$", "")
    val noSlashQ = regexp_replace(noDangle, "/\\?", "?")
    regexp_replace(noSlashQ, "/$", "")
  }

  /** Keep one row per canonical URL — the one with the smallest
    * `idCol` (first-crawled wins, deterministic). One min_by hash
    * aggregate on the canonical key; no window, no sort.
    */
  def dedupByUrl(df: DataFrame, urlCol: String, idCol: String,
                 canonCol: String = "canonical_url"): DataFrame =
    df.withColumn(canonCol, canonicalize(col(urlCol)))
      .groupBy(col(canonCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_variants"))
}
