package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** HTML main-content extraction — the crawl front door everything
    * downstream (dedup, quality, tokenization) assumes has already run.
    * A trafilatura-class extractor needs a DOM; at corpus scale the
    * standard first pass is exactly this shape (C4/CCNet): strip the
    * non-content machinery, split into blocks, keep the paragraph-like
    * blocks. Steps, in order, every one an RE2-safe regex or plain
    * replace (no lookaround, no backreferences — the
    * [[normalizeUrls]]/text_pii portability recipe):
    *
    *  1. drop `<!-- -->` comments, `<script>`/`<style>` blocks (with
    *     their contents);
    *  2. capture `<title>` before tags are stripped;
    *  3. block-level closers (`</p> </div> </hN> </li> </tr> </table>
    *     </ul> </ol> </blockquote> </title> </head>`) and `<br>`/`<hr>`
    *     become newlines — the block structure the boilerplate filter
    *     operates on (title/head count so head text never fuses into the
    *     first body block);
    *  4. every remaining tag becomes a space; the five standard entities
    *     and `&nbsp;` decode; horizontal whitespace collapses;
    *  5. boilerplate-block heuristic: a trimmed block survives when it
    *     has >= `minChars` characters AND >= `minWords`
    *     space-separated words — nav bars ("Home | About"), cookie
    *     banners, and footer fragments are short and link-dense, real
    *     paragraphs are not (the C4 "at least N words per line" rule).
    *
    * Adds `title`, `content` (kept blocks joined by newline), and
    * `n_blocks` (kept-block count). Pure narrow projection — zero
    * shuffles, tracks the scan at any corpus size.
    */
  def extractMainContent(df: DataFrame, htmlCol: String = "html",
                         minChars: Int = 30, minWords: Int = 5): DataFrame = {
    val noComment = regexp_replace(col(htmlCol), "(?s)<!--.*?-->", "")
    val noScript = regexp_replace(noComment,
      "(?is)<script[^>]*>.*?</script>", "")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", "")
    val blocks = regexp_replace(
      regexp_replace(noStyle,
        "(?i)</(p|div|h1|h2|h3|h4|h5|h6|li|tr|table|ul|ol|blockquote|title|head)>",
        "\n"),
      "(?i)<(br|hr)[^>]*>", "\n")
    val untagged = regexp_replace(blocks, "(?s)<[^>]*>", " ")
    // entity decode: a plain (non-regex) replace chain — both engines
    // have byte-identical `replace`, no regex-dialect risk at all
    val entity = Seq("&nbsp;" -> " ", "&amp;" -> "&", "&lt;" -> "<",
      "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'")
      .foldLeft(untagged) { case (c, (from, to)) =>
        call_function("replace", c, lit(from), lit(to))
      }
    val collapsed = regexp_replace(entity, "[ \\t\\r]+", " ")
    df.withColumn("title",
        trim(regexp_extract(col(htmlCol), "(?is)<title[^>]*>(.*?)</title>", 1)))
      .withColumn("_clean", collapsed)
      .withColumn("_kept",
        filter(transform(split(col("_clean"), "\n"), b => trim(b)),
          b => length(b) >= minChars && size(split(b, " ")) >= minWords))
      .withColumn("content", array_join(col("_kept"), "\n"))
      .withColumn("n_blocks", size(col("_kept")).cast("long"))
      .drop("_clean", "_kept")
  }

  /** WARC-record parser — the crawl-archive front door ahead of
    * [[extractMainContent]]. A record is a version line, CRLF-separated
    * `Name: value` headers, a blank CRLF line, then the payload. The
    * header block ends at the FIRST CRLFCRLF (payloads may contain
    * their own blank lines); header fields are picked by prefix match
    * over the CRLF split (no regex — prefix semantics are identical in
    * every engine). Emits the fields a crawl pipeline routes on
    * (type, target URI, declared length) plus the actual payload
    * length and a declared==actual validity flag, so truncated or
    * mis-framed records are flagged at ingest instead of corrupting
    * downstream text ops. Zero shuffles, narrow projection.
    */
  def parseWarc(records: DataFrame, recordCol: String = "record"): DataFrame = {
    val crlf2 = "\r\n\r\n"
    def header(prefix: String): Column = {
      val p = prefix + ": "
      expr(s"""substring(element_at(filter(split(hdr, chr(13) || chr(10)),
        l -> startswith(l, '$prefix: ')), 1), ${p.length + 1})""")
    }
    records
      .withColumn("cut", instr(col(recordCol), crlf2))
      .filter(col("cut") > 0)
      .withColumn("hdr", expr(s"substring($recordCol, 1, cut - 1)"))
      .withColumn("payload", expr(s"substring($recordCol, cut + 4)"))
      .select(col("*"),
        header("WARC-Type").as("warc_type"),
        header("WARC-Target-URI").as("uri"),
        header("Content-Length").cast("long").as("declared_len"),
        length(col("payload")).cast("long").as("payload_len"))
      .withColumn("len_ok",
        (col("declared_len") === col("payload_len")).cast("long"))
      .drop(recordCol, "cut", "hdr", "payload")
  }

  /** Robots-style longest-prefix path rules: every URL gets the verdict
    * of the MOST SPECIFIC matching rule (longest prefix; allow beats
    * deny on equal length — the REP tie-break), default-allow when
    * nothing matches. The crawl-pipeline gate that [[filterBlocked]]'s
    * whole-domain blocklist can't express: "/private/ is off limits
    * except /private/share/".
    *
    * Scale shape: the rule table is a policy artifact (dozens–
    * thousands of rows) broadcast against the URL stream — the match
    * is a prefix theta-join (whitelisted bounded broadcast, the
    * ann_brute class), and the per-URL election is one rank window
    * keyed on the URL. Prefixes are matched with `startswith` (literal
    * semantics — no LIKE/regex metacharacter hazards in either
    * engine).
    */
  /** Crawl-frontier scheduling — per-domain politeness batching: each
    * domain may contribute at most `perDomainBudget` URLs per crawl
    * round (the rate limit every polite crawler owes a host), and
    * within a round URLs are ordered by priority. The schedule is a
    * SORT KEY `(round, priority desc, url_id)`, never a materialized
    * global sequence — a corpus-wide row_number would funnel the whole
    * frontier through one reducer; readers ORDER BY the emitted
    * columns instead. URLs past `maxRounds` are reported `scheduled =
    * false` (frontier overflow is a visible number, not silent
    * truncation).
    *
    * One domain-keyed window (rank by priority) + narrow math — a
    * single shuffle on domain. Input: `(url_id, domain, priority)`.
    */
  def crawlFrontier(urls: DataFrame, perDomainBudget: Int = 3,
                    maxRounds: Int = 10): DataFrame = {
    require(perDomainBudget >= 1 && maxRounds >= 1)
    import org.apache.spark.sql.expressions.Window
    urls
      .withColumn("domain_rank", row_number().over(
        Window.partitionBy("domain")
          .orderBy(desc("priority"), asc("url_id"))).cast("long"))
      .withColumn("round",
        expr(s"(domain_rank - 1) div ${perDomainBudget}L"))
      .withColumn("scheduled", col("round") < maxRounds)
      .select(col("url_id"), col("domain"), col("priority"),
        col("domain_rank"), col("round"), col("scheduled"))
  }

  def robotsFilter(urls: DataFrame, rules: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val matched = urls
      .join(broadcast(rules.select(col("prefix"), col("allow"))),
        expr("startswith(path, prefix)"), "left")
    val pick = Window.partitionBy("url_id").orderBy(
      length(col("prefix")).desc, col("allow").desc, col("prefix").asc)
    matched
      .withColumn("rk", row_number().over(pick))
      .filter(col("rk") === 1)
      .select(col("url_id"), col("path"),
        coalesce(col("prefix"), lit("")).as("rule_prefix"),
        coalesce(col("allow"), lit(true)).as("allowed"))
      .orderBy("url_id")
  }
}
