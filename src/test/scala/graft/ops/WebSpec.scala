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
}
