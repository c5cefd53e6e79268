package graft.serve

import java.nio.charset.StandardCharsets
import scala.collection.mutable.ArrayBuffer

/** Minimal `multipart/form-data` parser (RFC 7578 subset) for the
  * upload ingest route (SURVEY §2.A18; reference
  * `response/handler/data_source.rs:70-134`). Operates on the raw
  * body bytes; no temp files, no external deps.
  */
object Multipart {

  final case class Part(
      name: Option[String],
      filename: Option[String],
      contentType: Option[String],
      body: Array[Byte])

  /** Extract `boundary=` from a Content-Type header. */
  def boundaryOf(contentType: String): Option[String] =
    contentType.split(';').map(_.trim).collectFirst {
      case p if p.toLowerCase.startsWith("boundary=") =>
        p.substring("boundary=".length).stripPrefix("\"").stripSuffix("\"")
    }

  def parse(body: Array[Byte], boundary: String): Seq[Part] = {
    val delim = ("--" + boundary).getBytes(StandardCharsets.US_ASCII)
    val parts = ArrayBuffer.empty[Part]
    var pos = indexOf(body, delim, 0)
    while (pos >= 0) {
      val afterDelim = pos + delim.length
      // terminal delimiter: "--boundary--"
      if (afterDelim + 1 < body.length &&
          body(afterDelim) == '-' && body(afterDelim + 1) == '-') {
        pos = -1
      } else {
        val headerStart = skipCrlf(body, afterDelim)
        val headerEnd = indexOf(body, "\r\n\r\n".getBytes, headerStart)
        if (headerEnd < 0) { pos = -1 }
        else {
          val headers = new String(body, headerStart, headerEnd - headerStart,
            StandardCharsets.UTF_8).split("\r\n").toSeq
          val bodyStart = headerEnd + 4
          val next = indexOf(body, delim, bodyStart)
          val bodyEnd = if (next >= 0) next - 2 else body.length // strip trailing CRLF
          val content = java.util.Arrays.copyOfRange(body, bodyStart, math.max(bodyStart, bodyEnd))
          parts += toPart(headers, content)
          pos = next
        }
      }
    }
    parts.toSeq
  }

  private def toPart(headers: Seq[String], content: Array[Byte]): Part = {
    val disp = headers.find(_.toLowerCase.startsWith("content-disposition:"))
    def dispParam(key: String): Option[String] =
      disp.flatMap(_.split(';').map(_.trim).collectFirst {
        case p if p.toLowerCase.startsWith(s"$key=") =>
          p.substring(key.length + 1).stripPrefix("\"").stripSuffix("\"")
      })
    val ct = headers.find(_.toLowerCase.startsWith("content-type:"))
      .map(_.split(':')(1).trim)
    Part(dispParam("name"), dispParam("filename"), ct, content)
  }

  private def skipCrlf(b: Array[Byte], at: Int): Int = {
    var i = at
    if (i + 1 < b.length && b(i) == '\r' && b(i + 1) == '\n') i += 2
    i
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(0, from)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }
}
