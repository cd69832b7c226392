package graft.layout

/** Deterministic synthetic fixture corpus.
  *
  * The reference ships no PDFs (its ROOT_PATH points at the author's
  * machine, src/config.py:5), so all inputs are synthesized as span-sequence
  * documents, one per documented bad case (docs/analysis.md:16-185) — see
  * FIXTURES.md. The renderers here and [[TableDetector]] share one span
  * grammar; round-trip equality is property-tested.
  */
object FixtureCorpus {

  // ------------------------------------------------------------- renderers

  /** Render cells as an ASCII grid (the ruled-line path). Cells may contain
    * "\n" for wrapped text. A '=' separator follows the header row. */
  def renderGrid(cells: Seq[Seq[String]]): Vector[(String, String)] = {
    require(cells.nonEmpty && cells.head.nonEmpty)
    val nCols = cells.head.length
    val cellLines: Seq[Seq[Array[String]]] =
      cells.map(_.map(c => Option(c).getOrElse("").split("\n", -1)))
    val widths = (0 until nCols).map { c =>
      math.max(1, cellLines.map(_(c).map(_.length).max).max)
    }
    def ruleLine(fill: Char): String =
      widths.map(w => fill.toString * (w + 2)).mkString("+", "+", "+")
    val out = Vector.newBuilder[(String, String)]
    out += (("rule", ruleLine('-')))
    cells.indices.foreach { r =>
      val lines = cellLines(r)
      val height = lines.map(_.length).max
      (0 until height).foreach { h =>
        val segs = (0 until nCols).map { c =>
          val t = if (h < lines(c).length) lines(c)(h) else ""
          " " + t.padTo(widths(c) + 1, ' ')
        }
        out += (("text", segs.mkString("|", "|", "|")))
      }
      out += (("rule", ruleLine(if (r == 0) '=' else '-')))
    }
    out.result()
  }

  /** Render cells as space-aligned columns (the whitespace-gap path).
    * Single-line cells only; 2-space column separator. */
  def renderAligned(cells: Seq[Seq[String]]): Vector[String] = {
    require(cells.nonEmpty && cells.head.nonEmpty)
    val nCols = cells.head.length
    val widths = (0 until nCols).map(c => cells.map(r => Option(r(c)).getOrElse("").length).max)
    cells.map { r =>
      (0 until nCols).map { c =>
        val t = Option(r(c)).getOrElse("")
        if (c == nCols - 1) t else t.padTo(widths(c) + 2, ' ')
      }.mkString("").replaceAll("\\s+$", "")
    }.toVector
  }

  // ------------------------------------------------------------ doc builder

  final class DocBuilder(docId: String) {
    private var off = 0
    private val spans = Vector.newBuilder[Span]
    private def add(kind: String, text: String, ref: String = null): this.type = {
      spans += Span(kind, text, ref, off); off += 1; this
    }
    def page(n: Int): this.type = add("page", n.toString)
    def text(lines: String*): this.type = { lines.foreach(add("text", _)); this }
    def media(ref: String, alt: String = ""): this.type = add("media", alt, ref)
    def grid(cells: Seq[Seq[String]]): this.type = {
      renderGrid(cells).foreach { case (k, t) => add(k, t) }; this
    }
    def aligned(cells: Seq[Seq[String]]): this.type = {
      renderAligned(cells).foreach(add("text", _)); this
    }
    def build: DocRow = DocRow(docId, spans.result())
  }

  def doc(id: String)(f: DocBuilder => Unit): DocRow = {
    val b = new DocBuilder(id); f(b); b.build
  }

  // ------------------------------------------------------------- vocabulary

  val Ratings: Vector[String] = Vector("HS", "S", "MS", "MU", "ML", "L", "U", "HU")

  /** Criterion vocabulary from the reference corpus (docs/notes.md:12-48). */
  val CriterionRows: Vector[(String, String)] = Vector(
    "Strategic Relevance" -> "Overall rating for Strategic Relevance",
    "1. Alignment to UNEP MTS, POW and strategic priorities" -> "Closely aligned with UNEP MTS",
    "2. Alignment to Donor/Partner strategic priorities" -> "Aligned with GEF strategic priorities",
    "Quality of Project Design" -> "The project design was robust",
    "Nature of External Context" -> "The external context was favourable",
    "Effectiveness" -> "Overall rating for Effectiveness",
    "1. Availability of outputs" -> "Outputs were delivered on time",
    "2. Achievement of project outcomes" -> "Outcomes largely achieved",
    "3. Likelihood of impact" -> "Impact is likely",
    "Financial Management" -> "Financial procedures were adhered to",
    "Efficiency" -> "The project was cost-effective",
    "Monitoring and Reporting" -> "Monitoring design was adequate",
    "1. Monitoring design and budgeting" -> "Budgeting for monitoring was sufficient",
    "Sustainability" -> "Overall rating for Sustainability",
    "1. Socio-political sustainability" -> "Socio-political support is strong",
    "2. Financial sustainability" -> "Funding is expected to continue",
    "Factors Affecting Performance" -> "Performance factors were managed",
    "1. Preparation and readiness" -> "Preparation was thorough",
    "Overall Project Performance Rating" -> "The overall performance is rated")

  private val prose = Vector(
    "This Terminal Evaluation Report assesses the project outcomes",
    "and provides ratings across the standard evaluation criteria.",
    "The evaluation was conducted in line with UNEP guidance notes,",
    "drawing on document review and stakeholder interviews held",
    "during the field mission and subsequent validation workshop.")

  private def header3 = Vector("Criterion", "Summary Assessment", "Rating")

  private def rows(slice: Range, rating: Int => String): Vector[Vector[String]] =
    slice.map { i =>
      val (c, s) = CriterionRows(i % CriterionRows.length)
      Vector(c, s, rating(i))
    }.toVector

  private def rat(i: Int): String = Ratings(i % Ratings.length)

  // ------------------------------------------------------------ fixtures

  /** F01 — clean single-page criterion table + caption + month. The header
    * row carries bold emphasis (`**..**` span-grammar marks): the detector
    * strips the marks from the cell text (so every downstream golden is
    * untouched) and records the positions in CandidateTable.bold (P6). */
  def f01: DocRow = doc("1.f01_clean.pdf") { b =>
    b.page(1).text("Terminal Evaluation Report", "GEF Project 4711", "December 2024")
    b.page(2).text(prose: _*)
    b.page(3).text("Table 9: Summary of project findings and ratings")
      .grid(header3.map(h => s"**$h**") +: rows(0 to 5, rat))
      .text("The ratings above are explained in Annex II.")
  }

  /** F02 — cross-page table, pages 4..7, header repeated each page. */
  def f02: DocRow = doc("2.f02_crosspage.pdf") { b =>
    b.page(1).text("Terminal Evaluation Report", "March, 2021")
    b.page(2).text(prose: _*)
    b.page(3).text(prose.take(3): _*)
    var i = 0
    (4 to 7).foreach { p =>
      b.page(p)
      if (p == 4) b.text("Table 5: Summary of project findings and ratings")
      b.grid(header3 +: rows(i until (i + 4), rat))
      i += 4
    }
    b.page(8).text("Annex I follows.")
  }

  /** F03 — empty aux columns (pymupdf would name them Col1/Col3) dropped. */
  def f03: DocRow = doc("3.f03_auxcols.pdf") { b =>
    b.page(1).text("Terminal Evaluation", "Oct, 2018")
    b.page(2).text("Table 2: Summary of project findings and ratings")
      .grid(Vector(
        Vector("Criterion", "", "Summary Assessment", "", "Rating"),
        Vector("Strategic Relevance", "", "Overall rating for Strategic Relevance", "", "HS"),
        Vector("Effectiveness", "", "Outcomes largely achieved", "", "S"),
        Vector("Efficiency", "", "The project was cost-effective", "", "MS")))
  }

  /** F04 — a NON-first aux column with content fills the right non-aux
    * neighbor's blanks (preprocess_table.py:134-148). The leading empty aux
    * column (Col1, all-empty) keeps Col2 out of the first-aux combine_first
    * path so the right-fill branch is the one exercised. */
  def f04: DocRow = doc("4.f04_auxfill.pdf") { b =>
    b.page(1).text("Terminal Evaluation", "May 2019")
    b.page(2).text("Table 3: Summary of project findings and ratings")
      .grid(Vector(
        Vector("Criterion", "", "", "Summary Assessment", "Rating"),
        Vector("Strategic Relevance", "", "Overall rating for Strategic Relevance", "", "HS"),
        Vector("Effectiveness", "", "", "Outcomes largely achieved", "S"),
        Vector("Sustainability", "", "Overall rating for Sustainability", "", "ML")))
  }

  /** F05 — unnamed FIRST column holding the criterion values (combine_first
    * path, docstring worked example preprocess_table.py:32-58). */
  def f05: DocRow = doc("5.f05_firstcol.pdf") { b =>
    b.page(1).text("Terminal Evaluation", "June 2022")
    b.page(2).text("Table 4: Summary of project findings and ratings")
      .grid(Vector(
        Vector("", "Criterion", "Summary Assessment", "Rating"),
        Vector("Strategic Relevance", "", "Overall rating for Strategic Relevance", "HS"),
        Vector("1. Alignment to UNEP MTS, POW and strategic priorities", "",
          "Closely aligned with UNEP MTS", "HS"),
        Vector("2. Alignment to Donor/Partner strategic priorities", "",
          "Aligned with GEF strategic priorities", "S")))
  }

  /** F06 — definition-table false positive early (page 3) + the real table
    * later on consecutive pages 40-41: the longest run wins. */
  def f06: DocRow = doc("6.f06_falsepositive.pdf") { b =>
    b.page(1).text("Terminal Evaluation", "January 2020")
    b.page(2).text(prose: _*)
    b.page(3).text("Table 1: Rating definitions")
      .grid(Vector(
        Vector("Criterion", "Rating"),
        Vector("Highly Satisfactory", "HS"),
        Vector("Satisfactory", "S")))
    (4 to 39).foreach(p => b.page(p).text(prose((p - 4) % prose.length)))
    b.page(40).text("Table 8: Summary of project findings and ratings")
      .grid(header3 +: rows(0 to 3, rat))
    b.page(41).grid(header3 +: rows(4 to 7, rat))
  }

  /** F07 — two same-header groups far apart, equal run lengths: FIRST wins. */
  def f07: DocRow = doc("7.f07_tworuns.pdf") { b =>
    b.page(1).text("Terminal Evaluation", "August 2017")
    b.page(10).text("Table 6: Summary of project findings and ratings")
      .grid(header3 +: rows(0 to 2, _ => "S"))
    b.page(11).grid(header3 +: rows(3 to 5, _ => "S"))
    (12 to 63).foreach(p => b.page(p).text(prose(p % prose.length)))
    b.page(64).text("Table 6 repeated in annex")
      .grid(header3 +: rows(6 to 8, _ => "MS"))
    b.page(65).grid(header3 +: rows(9 to 11, _ => "MS"))
  }

  /** F08 — split header "S ummary Assessment" normalized by C1. */
  def f08: DocRow = doc("8.f08_splitheader.pdf") { b =>
    b.page(1).text("Terminal Evaluation", "February 2016")
    b.page(2).text("Table 7: Summary of project findings and ratings")
      .grid(Vector(
        Vector("Criterion", "S ummary Assessment", "Rating"),
        Vector("Strategic Relevance", "Overall rating for Strategic Relevance", "HS"),
        Vector("Efficiency", "The project was cost-effective", "MS")))
  }

  /** F09 — header variants "summary assessment/comments" (NOT normalized,
    * ratio 0.77 < 0.8) and "Rating (achievement)" (startswith rating). */
  def f09: DocRow = doc("9.f09_headervariants.pdf") { b =>
    b.page(1).text("Terminal Evaluation", "July 2015")
    b.page(2).text("Table 2: Summary of project findings and ratings")
      .grid(Vector(
        Vector("Criterion", "Summary assessment/comments", "Rating (achievement)"),
        Vector("Strategic Relevance", "Overall rating for Strategic Relevance", "HS"),
        Vector("Sustainability", "Overall rating for Sustainability", "ML")))
  }

  /** F10 — continuation page WITHOUT a header row: its fragment lacks the
    * "criterion" header so the run breaks (docs/analysis.md:145-165). */
  def f10: DocRow = doc("10.f10_headerless.pdf") { b =>
    b.page(1).text("Terminal Evaluation", "September 2014")
    b.page(2).text("Table 3: Summary of project findings and ratings")
      .grid(header3 +: rows(0 to 2, rat))
    // page 3 fragment has no header row -> not a candidate -> run = [2]
    b.page(3).grid(rows(3 to 5, rat))
  }

  /** F11 — media spans interleaved; one media-only page ("not a textpage"). */
  def f11: DocRow = doc("11.f11_media.pdf") { b =>
    b.page(1).text("Terminal Evaluation", "November 2013")
      .media("img://11/cover.png", "cover photo")
    b.page(2).media("img://11/map.png", "country map") // media-only page
    b.page(3).text("Table 4: Summary of project findings and ratings")
      .media("img://11/chart.png", "ratings chart")
      .grid(header3 +: rows(0 to 4, rat))
      .media("img://11/annex.png", "annex figure")
  }

  /** F12 — publish-month variants are covered by f01 (December 2024),
    * f02 (March, 2021), f03 (Oct, 2018 -> October, 2018); this one has NO
    * month on page 1 (month appears on page 2 only -> not found). */
  def f12: DocRow = doc("12.f12_nomonth.pdf") { b =>
    b.page(1).text("Terminal Evaluation Report", "GEF project")
    b.page(2).text("Published April 2012") // wrong page: must NOT be found
      .text("Table 5: Summary of project findings and ratings")
      .grid(header3 +: rows(5 to 8, rat))
  }

  /** F13 — numbered criteria with prefixes for cleanCriterion + L1 ffill. */
  def f13: DocRow = doc("13.f13_numbered.pdf") { b =>
    b.page(1).text("Terminal Evaluation", "May, 2023")
    b.page(2).text("Table 9: Summary of project findings and ratings")
      .grid(Vector(
        header3,
        Vector("Strategic Relevance", "Overall rating for Strategic Relevance", "HS"),
        Vector("1. Alignment to UNEP MTS, POW and strategic priorities",
          "Closely aligned with UNEP MTS", "HS"),
        Vector("2.1 Partners/Executing Agency:", "Execution was satisfactory", "S"),
        Vector("Sustainability", "Overall rating for Sustainability", "ML"),
        Vector("2. Financial sustainability", "Funding is expected to continue", "L")))
  }

  /** F14 — oversized doc (200 pages of prose) with one table region near the
    * end: the skew/bounded-memory path. */
  def f14: DocRow = doc("14.f14_oversized.pdf") { b =>
    b.page(1).text("Terminal Evaluation", "December 2011")
    (2 to 199).foreach { p =>
      b.page(p).text(prose(p % prose.length), prose((p + 1) % prose.length))
      if (p % 17 == 0) b.media(s"img://14/fig$p.png", s"figure $p")
    }
    b.page(200).text("Table 12: Summary of project findings and ratings")
      .grid(header3 +: rows(0 to 9, rat))
  }

  /** F15 — zero candidate tables (count=0 excluded from merge). */
  def f15: DocRow = doc("15.f15_notables.pdf") { b =>
    b.page(1).text("Inception Report", "October 2010")
    b.page(2).text(prose: _*)
    b.page(3).text("Table 1: Workplan") // caption but no criterion table
      .grid(Vector(
        Vector("Activity", "Deadline"),
        Vector("Inception workshop", "Q1"),
        Vector("Final report", "Q4")))
  }

  /** F16 — whitespace-aligned (un-ruled) criterion table: the text-strategy
    * detection path (v1 table_finder.py:119-128). */
  def f16: DocRow = doc("16.f16_aligned.pdf") { b =>
    b.page(1).text("Terminal Evaluation", "June 2009")
    b.page(2).text("Table 2: Summary of project findings and ratings")
      .text("") // blank line separates caption from the aligned block
      .aligned(Vector(
        Vector("Criterion", "Summary Assessment", "Rating"),
        Vector("Strategic Relevance", "Overall rating for Strategic Relevance", "HS"),
        Vector("Effectiveness", "Outcomes largely achieved", "S"),
        Vector("Efficiency", "The project was cost-effective", "MS")))
  }

  /** The fixed hand-verified corpus (used by the driver-facing queries). */
  def fixtureDocs: Vector[DocRow] =
    Vector(f01, f02, f03, f04, f05, f06, f07, f08, f09, f10,
      f11, f12, f13, f14, f15, f16)

  /** One synthetic benchmark document, generated INDEPENDENTLY per index
    * (seeded by (seed, i)) so the corpus can be built distributedly on
    * executors — the generator never becomes a single-partition bottleneck
    * in a timed run. ~5% of docs are oversized (100+ pages) to exercise the
    * skew/salting path at scale. */
  def scaledDoc(i: Int, seed: Long): DocRow = {
    val rnd = new scala.util.Random(seed * 1000003L + i)
    val month = MonthVocab(rnd.nextInt(MonthVocab.length))
    val oversized = rnd.nextInt(20) == 0
    val nPages = if (oversized) 100 + rnd.nextInt(100) else 3 + rnd.nextInt(8)
    val tablePage = 2 + rnd.nextInt(nPages - 1)
    val fragPages = 1 + rnd.nextInt(3)
    val rowsPerFrag = 3 + rnd.nextInt(4)
    var r = rnd.nextInt(CriterionRows.length)
    doc(s"${i + 100}.gen$i.pdf") { b =>
      b.page(1).text(s"Terminal Evaluation Report $i", month)
      (2 until tablePage).foreach { p =>
        b.page(p).text(prose(p % prose.length))
        if (oversized && p % 13 == 0) b.media(s"img://$i/fig$p.png", s"figure $p")
      }
      (0 until fragPages).foreach { f =>
        b.page(tablePage + f)
        if (f == 0) b.text("Table 9: Summary of project findings and ratings")
        b.grid(header3 +: rows(r until (r + rowsPerFrag), rat))
        r += rowsPerFrag
      }
      (tablePage + fragPages to nPages + 1).foreach(p =>
        b.page(p).text(prose(p % prose.length)))
    }
  }

  /** Seeded scale-out corpus for benchmarks (deterministic in seed). */
  def scaled(n: Int, seed: Long): Vector[DocRow] =
    Vector.tabulate(n)(i => scaledDoc(i, seed))

  private val MonthVocab = Vector(
    "December 2024", "March, 2021", "Oct, 2018", "May 2019", "June 2022",
    "January 2020", "August 2017", "February 2016", "July 2015", "no month here")
}
