package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-domain web-corpus operators — the first stage of every public
  * web-pretraining pipeline (C4, RefinedWeb): extract the host /
  * registered domain from each document's URL, profile the corpus per
  * domain, and drop documents from blocklisted domains. No reference
  * anchor (beyond log2ck's scope); brief anchor: the LLM-pipeline
  * family (SURVEY §2.B).
  *
  * Scale shape: host/domain extraction is row-local codegen'd string
  * work (`parse_url` + `regexp_extract`) — zero shuffles; the profile
  * is one domain-keyed grouped pass (domains ≪ docs); the blocklist is
  * a literal-array suffix scan per row (blocklists are KB-scale driver
  * data — the broadcast-set regime), never a join.
  */
object WebDomains {

  /** Hostname of `url`, without scheme/port/path/query — row-local
    * (`parse_url` is the codegen'd built-in; invalid URLs → null).
    */
  def host(url: Column): Column = parse_url(url, lit("HOST"))

  /** Registered domain = the last two dot-labels of the host
    * (`www.news.example.com` → `example.com`). A public-suffix-list
    * lookup (co.uk etc.) would ride the same regexp/broadcast shape;
    * the two-label rule is the deterministic engine-reproducible core.
    */
  def registeredDomain(host: Column): Column =
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)

  /** First blocklist entry that matches `host` (exact host match, or
    * the host is a subdomain of the entry — the C4 semantics: blocking
    * `spam.com` blocks `www.spam.com` but NOT `notspam.com`, which a
    * substring scan would false-positive on); null when unblocked.
    * The blocklist inlines as a literal array (driver-sized by
    * contract), so the scan is row-local with no join; "first entry"
    * in list order makes the attribution deterministic.
    */
  def blockedBy(host: Column, blocklist: Seq[String]): Column = {
    require(blocklist.nonEmpty, "empty blocklist")
    val arr = array(blocklist.map(lit(_)): _*)
    // try_element_at: ANSI element_at throws on the empty (unblocked)
    // filter result instead of returning null
    try_element_at(
      filter(arr, b => host === b || host.endsWith(concat(lit("."), b))), lit(1))
  }

  /** Canonical URL for dedup keys (the C4/CCNet URL-dedup
    * preprocessing): drop the fragment, strip tracking parameters
    * (`utm_*`, `ref`, `fbclid`, `gclid`), strip the scheme's DEFAULT
    * port (`:80` for http, `:443` for https — non-default ports are
    * identity), and trim a trailing path slash. An ordered
    * `regexp_replace` chain of RE2-compatible patterns (no lookahead —
    * RE2 has none; the Redact discipline), so the identical chain runs
    * in the DuckDB oracle; order is contract (fragment first, so
    * tracking params never hide behind `#`; separators repaired after
    * param removal). Host lowercasing is NOT applied (a whole-URL
    * `lower()` would fold the path too; the synthesized corpus is
    * lowercase-host by construction — a general pipeline would
    * lowercase the host at extraction).
    */
  def canonicalize(url: Column): Column = {
    val noFragment = regexp_replace(url, "#.*$", "")
    // leading [?&] in the match keeps `href=` safe from the `ref=` rule
    val noTracking = regexp_replace(noFragment,
      "[?&](utm_[a-z]+|ref|fbclid|gclid)=[^&]*", "")
    // stripping a leading `?param` leaves the next param with `&`:
    // promote the FIRST separator back to `?` ([^?&]* stops at the
    // first separator, so greedy backtracking can't pick a later `&`)
    val repairedSep = regexp_replace(noTracking, "^([^?&]*)&", "$1?")
    val noDangling = regexp_replace(repairedSep, "\\?$", "")
    // `:80` only as the WHOLE port (group 2 demands [/?#] or end), so
    // `:8080` never matches a prefix
    val noHttpPort = regexp_replace(noDangling,
      "^(http://[^/:?#]+):80([/?#].*)?$", "$1$2")
    val noHttpsPort = regexp_replace(noHttpPort,
      "^(https://[^/:?#]+):443([/?#].*)?$", "$1$2")
    regexp_replace(noHttpsPort, "/$", "")
  }

  /** `df` + (host, domain) derived from `urlCol` — row-local. */
  def withUrlParts(df: DataFrame, urlCol: String = "url"): DataFrame =
    df.withColumn("host", host(col(urlCol)))
      .withColumn("domain", registeredDomain(col("host")))

  /** Per-domain corpus profile (the per-source `corpus_profile` row at
    * domain granularity): doc volume, distinct hosts, token volume,
    * exact-dup count and rate. One grouped pass over the corpus — the
    * two distinct-aggregates ride Spark's two-phase distinct expansion
    * on the same shuffle (the B45 discipline); the result relation is
    * domains-sized.
    */
  def profile(docs: DataFrame, urlCol: String = "url",
              textCol: String = "text"): DataFrame =
    withUrlParts(docs, urlCol)
      .groupBy(col("domain"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"),
        sum(size(split(col(textCol), " ")).cast("long")).as("n_tokens"),
        (count(lit(1)) - countDistinct(col(textCol))).as("n_exact_dups"))
      .withColumn("dup_rate",
        round(col("n_exact_dups").cast("double") / col("n_docs"), 4))
      .orderBy("domain")

  /** Documents whose host falls under a blocklisted domain, with the
    * matching entry attributed — the audit view of the filter (the
    * keep-side is `where(blockedBy(...).isNull)` on the same
    * expression, one row-local pass either way).
    */
  def blocked(docs: DataFrame, blocklist: Seq[String],
              urlCol: String = "url"): DataFrame =
    withUrlParts(docs, urlCol)
      .withColumn("blocked_by", blockedBy(col("host"), blocklist))
      .where(col("blocked_by").isNotNull)
}
