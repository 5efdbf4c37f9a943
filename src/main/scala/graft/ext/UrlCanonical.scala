package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the FIRST dedup pass of a CommonCrawl-style
  * curation pipeline: before any content fingerprinting, crawls are
  * collapsed by canonical URL, because the same page is fetched under
  * scheme/case/port/tracking-parameter variants many times over.
  *
  * Canonical form (the conservative, widely-used subset of RFC 3986 §6
  * normalization plus tracking-param stripping):
  *   - scheme and host lowercased; a leading `www.` label dropped
  *   - default ports removed (`:80` for http, `:443` for https); any
  *     other explicit port kept (a different port IS a different origin).
  *     Port = the text after the LAST colon in the authority (and the
  *     oracle replays the same rule) — bracketed IPv6 literals and
  *     `user:pass@` userinfo are NOT parsed; an authority containing
  *     either keeps whatever the last colon segment is. Crawl pipelines
  *     normally reject both classes upstream.
  *   - path: trailing slashes collapsed (empty path → `/`); lowercased
  *     only when `foldPathCase` is set — RFC 3986 paths are
  *     case-sensitive, so the default keeps case (fold it for crawls
  *     known to serve case-insensitively, e.g. Windows-backed sites)
  *   - query parameters: tracking params dropped ([[TrackingPrefixes]]),
  *     the rest SORTED and re-joined — parameter order does not change
  *     the resource, so it must not split a dup cluster
  *   - fragments discarded (never sent to the server)
  *
  * Registrable domain ("site" granularity for per-domain stats and crawl
  * budgets): resolved against the committed public-suffix-list fixture
  * via [[PublicSuffix.withRegistrableDomain]] — longest-matching-suffix
  * semantics including wildcard (`*.ck`), exception (`!www.ck`) and
  * private-section rules (`github.io`), applied as `maxLabels` broadcast
  * probes with zero shuffles. Callers can inject a different rule table
  * (e.g. a full PSL snapshot, or ICANN-only) through the `psl` parameter.
  *
  * Scale shape: every step is a built-in string/array expression plus the
  * broadcast PSL probes — scan-side whole-stage codegen, NO shuffle, no
  * UDF. At 100 TB the canonicalization itself is free relative to the
  * scan; the dup-cluster groupBy shuffles once on canonical_url (a key
  * far smaller than the payload after projection).
  */
object UrlCanonical {

  /** Query-parameter prefixes that identify tracking noise. */
  val TrackingPrefixes: Seq[String] =
    Seq("utm_", "fbclid", "gclid", "msclkid", "ref=")

  /** Adds `url_host`, `registrable_domain`, `canonical_url` next to
    * `urlCol`. Pure built-in expressions + broadcast PSL probes
    * (codegen, scan-side). `psl` defaults to the committed fixture table
    * ([[PublicSuffix.loadRules]]).
    */
  def canonicalize(df: DataFrame, urlCol: String,
                   foldPathCase: Boolean = false,
                   psl: Option[DataFrame] = None): DataFrame = {
    val url = col(urlCol)
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(url, "^[^/]*//([^/?#]*)", 1))
    val hasPort = instr(hostport, ":") > 0
    val host0 = when(hasPort, substring_index(hostport, ":", 1))
      .otherwise(hostport)
    val port = when(hasPort, substring_index(hostport, ":", -1)).otherwise(lit(""))
    val host = regexp_replace(host0, "^www\\.", "")
    val portOut = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val rawPath = regexp_extract(url, "^[^/]*//[^/?#]*([^?#]*)", 1)
    val cased = if (foldPathCase) lower(rawPath) else rawPath
    val path0 = regexp_replace(cased, "/+$", "")
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val rawQ = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = filter(split(rawQ, "&"), p =>
      p =!= "" && TrackingPrefixes.map(t => !p.startsWith(t)).reduce(_ && _))
    val qc = array_join(array_sort(kept), "&")
    val canonical = concat(scheme, lit("://"), host, portOut, path,
      when(qc === "", lit("")).otherwise(concat(lit("?"), qc)))
    val rules = psl.getOrElse(PublicSuffix.loadRules(df.sparkSession))
    val withHost = df.withColumn("url_host", host)
      .withColumn("canonical_url", canonical)
    PublicSuffix.withRegistrableDomain(withHost, "url_host", rules)
      .select(df.columns.map(col) ++
        Seq(col("url_host"), col("registrable_domain"), col("canonical_url")): _*)
  }

  /** Canonical-URL dup clusters: one row per canonical URL fetched under
    * ≥ `minSize` raw variants — cluster id = min doc id (equality clusters
    * are transitive, so a groupBy IS the connected component).
    */
  def dupClusters(df: DataFrame, urlCol: String, idCol: String,
                  minSize: Int = 2, foldPathCase: Boolean = false,
                  psl: Option[DataFrame] = None): DataFrame =
    canonicalize(df, urlCol, foldPathCase, psl)
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("cluster_size"),
        countDistinct(col(urlCol)).as("n_raw_variants"),
        min(col(idCol)).as("cluster_id"),
        max(col(idCol)).as("max_id"))
      .filter(col("cluster_size") >= minSize)

  /** Per-registrable-domain crawl stats: docs, distinct raw URLs,
    * distinct canonical URLs, and the dup rate canonicalization exposes.
    */
  def domainStats(df: DataFrame, urlCol: String,
                  foldPathCase: Boolean = false,
                  psl: Option[DataFrame] = None): DataFrame =
    canonicalize(df, urlCol, foldPathCase, psl)
      .groupBy(col("registrable_domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col(urlCol)).as("n_raw_urls"),
        countDistinct(col("canonical_url")).as("n_canonical"),
        countDistinct(col("url_host")).as("n_hosts"))
      .select(col("registrable_domain"), col("n_docs"), col("n_raw_urls"),
        col("n_canonical"), col("n_hosts"),
        round(lit(1.0) - col("n_canonical").cast("double") /
          col("n_raw_urls"), 6).as("dup_rate"))
}
