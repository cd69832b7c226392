package graft.io

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

class WarcSpec extends AnyFunSuite {
  import Warc.WarcRecord

  test("round trip preserves every record byte-for-byte") {
    val recs = Seq(
      WarcRecord("response", "doc1.html", "text/html",
        "<p>hello</p>".getBytes(StandardCharsets.UTF_8)),
      WarcRecord("response", "doc2.html", "text/html",
        "with\r\nCRLFs\r\n\r\ninside".getBytes(StandardCharsets.UTF_8)))
    val parsed = Warc.parse(Warc.write(recs))
    // write() prepends a warcinfo record; parse returns it too
    assert(parsed.length == 3 && parsed.head.warcType == "warcinfo")
    val back = parsed.tail
    assert(back.map(_.targetUri) == recs.map(_.targetUri))
    assert(back.zip(recs).forall { case (a, b) => a.payload.sameElements(b.payload) })
  }

  test("payload containing a fake record start cannot confuse the parser") {
    // Content-Length delimiting is the point: scanning for "WARC/1.0"
    // would split this payload in half
    val evil = "prefix\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nbody"
    val recs = Seq(WarcRecord("response", "evil.bin", "application/octet-stream",
      evil.getBytes(StandardCharsets.UTF_8)))
    val back = Warc.parse(Warc.write(recs)).tail
    assert(back.length == 1)
    assert(new String(back.head.payload, StandardCharsets.UTF_8) == evil)
  }

  test("responses() skips warcinfo and other non-response records") {
    val mixed = Warc.write(Seq(
      WarcRecord("request", "r.html", "application/http", "GET /".getBytes),
      WarcRecord("response", "r.html", "text/html", "<p>x</p>".getBytes),
      WarcRecord("metadata", "r.html", "application/warc-fields", "k: v".getBytes)))
    val got = Warc.responses(mixed)
    assert(got == Seq(("r.html", "<p>x</p>")))
  }

  test("truncated file errors instead of fabricating NUL-padded payload") {
    val full = Warc.write(Seq(
      WarcRecord("response", "t.html", "text/html",
        ("x" * 100).getBytes(StandardCharsets.UTF_8))))
    val truncated = java.util.Arrays.copyOfRange(full, 0, full.length - 60)
    val e = intercept[IllegalArgumentException](Warc.parse(truncated))
    assert(e.getMessage.contains("truncated"))
  }

  test("header line without a colon errors with position context") {
    val bad = ("WARC/1.0\r\nWARC-Type: response\r\nnocolonhere\r\n" +
      "Content-Length: 1\r\n\r\nx\r\n\r\n").getBytes(StandardCharsets.UTF_8)
    val e = intercept[IllegalArgumentException](Warc.parse(bad))
    assert(e.getMessage.contains("no colon"))
  }

  test("random payload property: arbitrary bytes survive (as latin-1-safe strings)") {
    val rnd = new scala.util.Random(33)
    for (_ <- 1 to 20) {
      val payloads = Seq.fill(1 + rnd.nextInt(4))(
        Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte))
      val recs = payloads.zipWithIndex.map { case (p, i) =>
        WarcRecord("response", s"u$i", "application/octet-stream", p)
      }
      val back = Warc.parse(Warc.write(recs)).tail
      assert(back.length == recs.length)
      assert(back.zip(recs).forall { case (a, b) => a.payload.sameElements(b.payload) })
    }
  }
}
