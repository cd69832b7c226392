package graft.io

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Minimal WARC/1.0 container reader/writer — the format web crawls
  * actually arrive in (ISO 28500): each record is a version line, CRLF
  * header fields, a blank line, then EXACTLY Content-Length payload
  * bytes, then two CRLFs. The parser is byte-accurate (payload length
  * comes from the header, never from scanning — binary payloads may
  * contain anything, including "WARC/1.0"), tolerant of header order and
  * case, and skips non-response records (warcinfo, request, metadata)
  * the way a corpus reader must.
  *
  * No reference counterpart (the reference reads local PDFs); engine-only
  * addition: WARC → HTML payloads → Boilerplate main-content spans is the
  * web-scale ingestion path of the north rule, and x36 runs exactly that
  * chain against x18's golden oracle.
  */
object Warc {

  final case class WarcRecord(
      warcType: String, targetUri: String, contentType: String,
      payload: Array[Byte])

  private val Crlf = "\r\n"

  /** Serialize records (a warcinfo header record is prepended, as real
    * crawler output always carries one — readers must skip it). */
  def write(records: Seq[WarcRecord]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def emit(s: String): Unit = out.write(s.getBytes(StandardCharsets.UTF_8))
    def rec(r: WarcRecord): Unit = {
      emit("WARC/1.0" + Crlf)
      emit(s"WARC-Type: ${r.warcType}" + Crlf)
      if (r.targetUri != null) emit(s"WARC-Target-URI: ${r.targetUri}" + Crlf)
      emit(s"Content-Type: ${r.contentType}" + Crlf)
      emit(s"Content-Length: ${r.payload.length}" + Crlf)
      emit(Crlf)
      out.write(r.payload)
      emit(Crlf + Crlf)
    }
    rec(WarcRecord("warcinfo", null, "application/warc-fields",
      ("software: graft" + Crlf).getBytes(StandardCharsets.UTF_8)))
    records.foreach(rec)
    out.toByteArray
  }

  /** Parse every record. Content-Length-delimited: after the blank line,
    * exactly that many payload bytes are taken verbatim. */
  def parse(bytes: Array[Byte]): Seq[WarcRecord] = {
    val recs = Vector.newBuilder[WarcRecord]
    var i = 0
    def lineEnd(from: Int): Int = {
      var j = from
      while (j + 1 < bytes.length &&
        !(bytes(j) == '\r' && bytes(j + 1) == '\n')) j += 1
      j
    }
    while (i < bytes.length) {
      // skip inter-record CRLFs
      while (i + 1 < bytes.length && bytes(i) == '\r' && bytes(i + 1) == '\n') i += 2
      if (i >= bytes.length - 1) return recs.result()
      val vEnd = lineEnd(i)
      val version = new String(bytes, i, vEnd - i, StandardCharsets.UTF_8)
      require(version.startsWith("WARC/"), s"bad record start at $i: $version")
      i = vEnd + 2
      var warcType: String = null
      var uri: String = null
      var ctype: String = null
      var clen: Long = -1
      var blank = false
      while (!blank) {
        val e = lineEnd(i)
        val line = new String(bytes, i, e - i, StandardCharsets.UTF_8)
        i = e + 2
        if (line.isEmpty) blank = true
        else {
          val colon = line.indexOf(':')
          require(colon > 0, s"malformed WARC header line (no colon) at byte ${e - line.length}: '$line'")
          val k = line.substring(0, colon).trim.toLowerCase
          val v = line.substring(colon + 1).trim
          k match {
            case "warc-type" => warcType = v
            case "warc-target-uri" => uri = v
            case "content-type" => ctype = v
            case "content-length" => clen = v.toLong
            case _ => // tolerated
          }
        }
      }
      require(clen >= 0, "record without Content-Length")
      // copyOfRange would silently NUL-pad past the end — a truncated
      // crawl file must be an error, not fabricated payload bytes
      require(i + clen <= bytes.length,
        s"truncated record: Content-Length $clen but only ${bytes.length - i} bytes remain")
      val payload = java.util.Arrays.copyOfRange(bytes, i, i + clen.toInt)
      i += clen.toInt
      recs += WarcRecord(warcType, uri, ctype, payload)
    }
    recs.result()
  }

  /** Response-record payloads only, as (uri, utf8 text). */
  def responses(bytes: Array[Byte]): Seq[(String, String)] =
    parse(bytes).filter(_.warcType == "response")
      .map(r => (r.targetUri, new String(r.payload, StandardCharsets.UTF_8)))
}
