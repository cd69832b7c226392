package graft.layout

/** Deterministic HTML fixture corpus for the boilerplate-strip operator.
  *
  * Each document exercises one published failure mode of main-content
  * extraction (link farms, attribute-marked chrome, headline rescue,
  * sandwiched shorts, raw-text elements, entities, media placement).
  * The corpus is FROZEN: golden VALUES in FixtureGoldens pin both the
  * per-block classification (x17) and the emitted main-content span
  * sequence (x18); regenerating them requires re-review (see
  * tools.GenGoldens).
  */
object HtmlFixtures {

  import Boilerplate.HtmlDoc

  private val longPara =
    "The evaluation found that the project was well aligned with the " +
      "strategic priorities of the organization and that the outcomes " +
      "were largely achieved across all of the regions that were covered " +
      "by the programme during the reporting period under review."

  private val secondPara =
    "Financial management was rated satisfactory because the procedures " +
      "were adhered to throughout the implementation period and the " +
      "co-financing that was committed by the partners materialized in " +
      "line with the budget that was approved at the inception stage."

  private val thirdPara =
    "Sustainability of the results is considered likely since the " +
      "national institutions have taken ownership of the outputs and the " +
      "funding that is required for the continuation of the activities " +
      "has been secured from the government and from the donors involved."

  val docs: Seq[HtmlDoc] = Seq(
    // h01: plain article — nav + footer stripped, headline rescued,
    // two good paragraphs kept
    HtmlDoc("h01_article.html",
      s"""<html><head><title>Site</title><style>p{color:red}</style></head>
         |<body>
         |<nav><ul><li><a href="/">Home</a></li><li><a href="/about">About</a></li></ul></nav>
         |<h1>Terminal Evaluation Findings</h1>
         |<p>$longPara</p>
         |<p>$secondPara</p>
         |<footer><p>Copyright 2024 Example Org. <a href="/terms">Terms</a></p></footer>
         |</body></html>""".stripMargin),
    // h02: link farm — high link-density list dropped even outside nav
    HtmlDoc("h02_linkfarm.html",
      s"""<body>
         |<p>$longPara</p>
         |<div><a href="/1">Read more</a> <a href="/2">Next story</a> <a href="/3">Archive</a></div>
         |<p>$secondPara</p>
         |</body>""".stripMargin),
    // h03: attribute-marked chrome — class/id signals drop the subtree
    HtmlDoc("h03_attrs.html",
      s"""<body>
         |<div class="sidebar-widget"><p>Top stories curated for you today by our editors.</p></div>
         |<div id="main-content"><p>$longPara</p></div>
         |<div class="comments"><p>Great article, thanks for sharing all of this.</p></div>
         |<div class="social-share"><a href="/tw">Tweet</a></div>
         |</body>""".stripMargin),
    // h04: media placement — figure image inside good content kept (alt
    // preserved), ad image in marked chrome dropped
    HtmlDoc("h04_media.html",
      s"""<body>
         |<div class="banner-ad"><img src="ads/top.png" alt="Buy now"></div>
         |<p>$longPara</p>
         |<figure><img src="figures/chart1.png" alt="Ratings by criterion"/><figcaption>Figure 1. Ratings by criterion across the portfolio under review.</figcaption></figure>
         |<p>$secondPara</p>
         |</body>""".stripMargin),
    // h05: headline rescue — h2 before good text kept; trailing orphan
    // heading (no content after) dropped
    HtmlDoc("h05_headings.html",
      s"""<body>
         |<h2>Effectiveness</h2>
         |<p>$longPara</p>
         |<h2>Orphan heading at the end</h2>
         |</body>""".stripMargin),
    // h06: sandwiched short — a short plain block between two good
    // paragraphs is kept; a leading short before any good is dropped
    HtmlDoc("h06_sandwich.html",
      s"""<body>
         |<p>Posted on 12 March 2021 by the editorial desk.</p>
         |<p>$longPara</p>
         |<p>Rated Highly Satisfactory overall.</p>
         |<p>$secondPara</p>
         |</body>""".stripMargin),
    // h07: raw-text elements + entities — script/style bodies never leak;
    // &amp;-family entities decoded in the kept text
    HtmlDoc("h07_script.html",
      s"""<body>
         |<script>var x = "<p>not content</p>";</script>
         |<p>Monitoring &amp; Reporting was rated &quot;satisfactory&quot; &#39;overall&#39; &lt;with caveats&gt; given that the systems were maintained and the reports were submitted on time by the teams involved.</p>
         |<noscript><p>Enable javascript to view charts.</p></noscript>
         |</body>""".stripMargin),
    // h08: table layout — td-held prose is still segmented and kept;
    // the chrome row is dropped by link density
    HtmlDoc("h08_table.html",
      s"""<body>
         |<table>
         |<tr><td><a href="/a">Section A</a> | <a href="/b">Section B</a></td></tr>
         |<tr><td>$longPara</td></tr>
         |<tr><td>$thirdPara</td></tr>
         |</table>
         |</body>""".stripMargin),
    // h09: header/aside structural ancestors — dropped regardless of the
    // text inside them (even long prose)
    HtmlDoc("h09_structural.html",
      s"""<body>
         |<header><p>$longPara</p></header>
         |<article><p>$secondPara</p></article>
         |<aside><p>$thirdPara</p></aside>
         |</body>""".stripMargin),
    // h10: no markup at all — the whole input is one block; long prose is
    // kept (plain-text passthrough)
    HtmlDoc("h10_plaintext.html", s"$longPara $secondPara"))
}
