package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Web-corpus URL hygiene — the first stage of every crawl-derived
  * training pipeline: canonicalize URLs so that exact-dedup and
  * per-domain policy decisions see one key per logical page, roll up
  * per-domain inventory, and drop blocklisted domains before any
  * expensive text processing runs.
  *
  * Every transform is a chain of engine-portable string/regex steps
  * (no lookaround — RE2-safe; no group references in replacements —
  * Spark `$1` vs DuckDB `\1` divergence avoided), so the whole family
  * oracle-checks hash-exact.
  */
object Web {

  /** Canonicalize a URL column. Steps, in order:
    *  1. strip the fragment (`#…` never reaches the server);
    *  2. remove tracking parameters (`utm_*`, `gclid`, `fbclid`) and any
    *     dangling `?`/`&` they leave behind;
    *  3. lowercase the scheme and host;
    *  4. drop default ports (`:80`, `:443`);
    *  5. collapse a slash that directly precedes the query and any
    *     trailing slashes (plain `replace` — no regex group refs).
    *
    * Adds `url_norm`, `host`, `domain` (last two host labels — the
    * registrable-domain simplification), and `path` (path + surviving
    * query). Pure narrow projection: no shuffle, whole-stage codegen.
    */
  def normalizeUrls(df: DataFrame, urlCol: String = "url"): DataFrame = {
    val noFrag = regexp_replace(col(urlCol), "#.*", "")
    val noTrack = regexp_replace(
      regexp_replace(noFrag, "(utm_[a-zA-Z]+|gclid|fbclid)=[^&]*&?", ""),
      "[?&]+$", "")
    df.withColumn("_u", noTrack)
      .withColumn("host",
        regexp_replace(
          lower(regexp_extract(col("_u"), "^[A-Za-z]+://([^/?#]+)", 1)),
          ":(80|443)$", ""))
      .withColumn("path",
        regexp_replace(
          expr("replace(regexp_extract(_u, '^[A-Za-z]+://[^/?#]+(.*)', 1), '/?', '?')"),
          "/+$", ""))
      .withColumn("url_norm",
        concat(lower(regexp_extract(col("_u"), "^([A-Za-z]+)://", 1)),
          lit("://"), col("host"), col("path")))
      .withColumn("domain",
        regexp_extract(col("host"), "([^.]+\\.[^.]+)$", 1))
      .drop("_u")
  }

  /** Per-domain inventory over normalized URLs: row count, distinct
    * canonical URLs (the post-normalization dedup key), and distinct
    * hosts (subdomain spread). One partial-aggregated shuffle on
    * `domain`; output is domain-count-sized.
    */
  def domainStats(urls: DataFrame): DataFrame =
    urls.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("url_norm")).as("n_unique_urls"),
        countDistinct(col("host")).as("n_hosts"))

  /** Drop rows whose `domain` appears in `blocked` (one `domain`
    * column). The blocklist is policy-sized — always broadcast — so the
    * corpus side never shuffles: a broadcast LEFT ANTI join.
    */
  def filterBlocked(urls: DataFrame, blocked: DataFrame): DataFrame =
    urls.join(broadcast(blocked.select(col("domain")).distinct()),
      Seq("domain"), "left_anti")
}
