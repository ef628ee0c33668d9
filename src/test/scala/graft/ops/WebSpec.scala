package graft.ops

import graft.SparkSpec

class WebSpec extends SparkSpec {
  import spark.implicits._

  test("extractMainContent keeps paragraphs, drops nav/footer/script/style boilerplate") {
    val para = "This is a long enough paragraph about distributed systems " +
      "and data processing that clearly qualifies as main content."
    val html =
      s"""<html><!-- build 1234 --><head>
         |<title>My &amp; Page</title>
         |<script type="text/javascript">var nav = "<p>fake</p>"; if (1 < 2) {}</script>
         |<style>.nav { display: none; }</style>
         |</head><body>
         |<div class="nav">Home | About | Contact</div>
         |<h1>Heading</h1>
         |<p>$para</p>
         |<p>Too short.</p>
         |<ul><li>item one</li><li>item two</li></ul>
         |<div class="footer">Copyright 2026</div>
         |</body></html>""".stripMargin
    val out = Web.extractMainContent(Seq((1L, html)).toDF("doc_id", "html"))
      .select("title", "content", "n_blocks").collect().head
    assert(out.getAs[String]("title") == "My &amp; Page")
    val content = out.getAs[String]("content")
    assert(content.contains("distributed systems"), s"main paragraph kept: $content")
    assert(!content.contains("Home | About"), s"nav dropped: $content")
    assert(!content.contains("Copyright"), s"footer dropped: $content")
    assert(!content.contains("var nav"), s"script contents dropped: $content")
    assert(!content.contains("display"), s"style contents dropped: $content")
    assert(!content.contains("Too short"), s"short block dropped: $content")
    assert(!content.contains("<"), s"no tags survive: $content")
    assert(out.getAs[Long]("n_blocks") == 1L)
  }

  test("extractMainContent decodes entities and collapses whitespace in kept blocks") {
    val html = "<html><body><p>Ben &amp; Jerry say   1 &lt; 2 &nbsp; and " +
      "2 &gt; 1 every single day</p></body></html>"
    val out = Web.extractMainContent(Seq((1L, html)).toDF("doc_id", "html"))
      .select("content").collect().head.getString(0)
    assert(out == "Ben & Jerry say 1 < 2 and 2 > 1 every single day", out)
  }

  test("extractMainContent is a narrow zero-shuffle projection") {
    val df = Web.extractMainContent(
      Seq((1L, "<p>x</p>")).toDF("doc_id", "html"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"must not shuffle:\n$plan")
  }

  test("parseWarc frames at the FIRST CRLFCRLF and validates lengths") {
    val crlf = "\r\n"
    val good = "WARC/1.0" + crlf + "WARC-Type: response" + crlf +
      "WARC-Target-URI: https://a.example/x" + crlf +
      "Content-Length: 11" + crlf + crlf + "hello world"
    // payload contains its own blank CRLF line — framing must not split
    // there; declared length lies (20 vs actual 14)
    val tricky = "WARC/1.0" + crlf + "WARC-Type: request" + crlf +
      "WARC-Target-URI: https://b.example/y" + crlf +
      "Content-Length: 20" + crlf + crlf + "ab" + crlf + crlf + "stuff!"
    val out = Web.parseWarc(
      Seq((1L, good), (2L, tricky)).toDF("doc_id", "record"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("warc_type") == "response")
    assert(out(1L).getAs[String]("uri") == "https://a.example/x")
    assert(out(1L).getAs[Long]("declared_len") == 11L)
    assert(out(1L).getAs[Long]("payload_len") == 11L)
    assert(out(1L).getAs[Long]("len_ok") == 1L)
    assert(out(2L).getAs[String]("warc_type") == "request")
    assert(out(2L).getAs[Long]("payload_len") == 12L) // ab\r\n\r\nstuff!
    assert(out(2L).getAs[Long]("len_ok") == 0L)
  }

  test("robotsFilter: longest prefix wins, allow beats deny on ties") {
    val urls = Seq(
      (1L, "/public/a"),          // matches only '/'
      (2L, "/private/a"),         // '/private/' deny beats '/'
      (3L, "/private/share/a"),   // longest '/private/share/' re-allows
      (4L, "nohit")               // no rule at all → default allow
    ).toDF("url_id", "path")
    val rules = Seq(("/", true), ("/private/", false),
      ("/private/share/", true)).toDF("prefix", "allow")
    val out = Web.robotsFilter(urls, rules).collect()
      .map(r => r.getAs[Long]("url_id") ->
        (r.getAs[String]("rule_prefix"), r.getAs[Boolean]("allowed")))
      .toMap
    assert(out(1L) == (("/", true)))
    assert(out(2L) == (("/private/", false)))
    assert(out(3L) == (("/private/share/", true)))
    assert(out(4L) == (("", true)))
  }

  test("robotsFilter: equal-length conflicting rules resolve to allow") {
    val urls = Seq((1L, "/x/a")).toDF("url_id", "path")
    val rules = Seq(("/x/", false), ("/x/", true)).toDF("prefix", "allow")
    val out = Web.robotsFilter(urls, rules).collect().head
    assert(out.getAs[Boolean]("allowed"))
  }

  test("crawlFrontier batches per-domain, priority first, overflow visible") {
    // domain a: 5 urls, budget 2 → rounds 0,0,1,1,2; maxRounds 2 drops
    // the last; domain b: 1 url
    val urls = Seq(
      (1L, "a", 50L), (2L, "a", 40L), (3L, "a", 30L), (4L, "a", 20L),
      (5L, "a", 10L), (9L, "b", 99L))
      .toDF("url_id", "domain", "priority")
    val r = Web.crawlFrontier(urls, perDomainBudget = 2, maxRounds = 2)
      .collect()
      .map(x => x.getAs[Long]("url_id") ->
        (x.getAs[Long]("round"), x.getAs[Boolean]("scheduled"))).toMap
    assert(r(1L) == ((0L, true)) && r(2L) == ((0L, true)))
    assert(r(3L) == ((1L, true)) && r(4L) == ((1L, true)))
    assert(r(5L) == ((2L, false)), "overflow past maxRounds is visible")
    assert(r(9L) == ((0L, true)))
  }
}
