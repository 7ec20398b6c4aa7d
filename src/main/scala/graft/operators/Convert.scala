package graft.operators

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Real text extraction for the structured text formats the reference
  * converts through MarkItDown (converter.py:44): HTML → markdown-ish
  * text, CSV → a markdown pipe table, JSON → an indented key/value
  * outline, XML → tag-stripped text. Plain text and markdown pass
  * through. All pure JVM string processing (Jackson, which ships with
  * Spark, covers JSON) — deterministic, no network, no native libs.
  *
  * Genuinely BINARY formats (pdf/docx/pptx/xlsx/media) still return
  * the documented deterministic stub — their parsers are not in this
  * container; [[Ingest.convert]] dispatches here per file_type, so
  * plugging a real pdf extractor in later changes one case, no plan.
  *
  * Runs ONCE per ingested file (bounded by file count, not corpus
  * rows), so a scalar function over the converted column is the right
  * shape; there is nothing for codegen to win on a recursive-descent
  * parse.
  */
object Convert {

  /** Named + numeric HTML entity decoding (the common set). */
  private val Entities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "mdash" -> "—", "ndash" -> "–",
    "hellip" -> "…", "copy" -> "©", "reg" -> "®", "trade" -> "™")

  private def decodeEntities(s: String): String = {
    val m = java.util.regex.Pattern.compile("&(#x?[0-9A-Fa-f]+|[A-Za-z]+);").matcher(s)
    val sb = new java.lang.StringBuilder
    while (m.find()) {
      val body = m.group(1)
      val rep =
        if (body.startsWith("#x") || body.startsWith("#X"))
          new String(Character.toChars(Integer.parseInt(body.drop(2), 16)))
        else if (body.startsWith("#"))
          new String(Character.toChars(body.drop(1).toInt))
        else Entities.getOrElse(body, m.group(0))
      m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(rep))
    }
    m.appendTail(sb)
    sb.toString
  }

  /** Collapse intra-line whitespace runs, trim lines, drop blank runs
    * to single blank lines, trim the ends.
    */
  private def tidy(s: String): String =
    s.linesIterator
      .map(_.replaceAll("[ \\t\\u00a0]+", " ").trim)
      .mkString("\n")
      .replaceAll("\n{3,}", "\n\n")
      .stripPrefix("\n").stripSuffix("\n")
      .trim

  /** HTML → markdown-ish text: drop script/style/comments, map
    * h1..h6 to `#` headings and `<li>` to `- ` bullets, break on
    * block-level tags, strip the rest, decode entities, tidy
    * whitespace. Same spirit as MarkItDown's HTML conversion.
    */
  def htmlToText(html: String): String = {
    var s = html
    s = s.replaceAll("(?is)<(script|style)[^>]*>.*?</\\1>", " ")
    s = s.replaceAll("(?s)<!--.*?-->", " ")
    for (i <- 1 to 6)
      s = s.replaceAll(s"(?is)<h$i[^>]*>(.*?)</h$i>", "\n" + ("#" * i) + " $1\n")
    s = s.replaceAll("(?is)<li[^>]*>", "\n- ")
    s = s.replaceAll("(?is)<br\\s*/?\\s*>", "\n")
    s = s.replaceAll("(?is)</?(p|div|tr|table|thead|tbody|ul|ol|blockquote|section|article|header|footer)[^>]*>", "\n")
    s = s.replaceAll("(?is)</(td|th)>", " ")
    s = s.replaceAll("(?s)<[^>]+>", "")
    tidy(decodeEntities(s))
  }

  /** XML → text: the HTML path without markdown structure is exactly
    * tag-strip + entity decode, which htmlToText already is.
    */
  def xmlToText(xml: String): String = htmlToText(xml)

  /** RFC-4180-ish CSV parse: quoted fields, escaped quotes (""),
    * embedded commas and newlines; rows split on LF/CRLF outside
    * quotes. Trailing empty line dropped.
    */
  def parseCsv(s: String): Seq[Seq[String]] = {
    val rows = Seq.newBuilder[Seq[String]]
    var row = Seq.newBuilder[String]
    val cell = new StringBuilder
    var inQuotes = false
    var i = 0
    var sawAny = false
    def endCell(): Unit = { row += cell.toString; cell.clear(); sawAny = true }
    def endRow(): Unit = { endCell(); rows += row.result(); row = Seq.newBuilder[String] }
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < s.length && s.charAt(i + 1) == '"') { cell.append('"'); i += 1 }
          else inQuotes = false
        } else cell.append(c)
      } else c match {
        case '"' => inQuotes = true
        case ',' => endCell()
        case '\r' => if (i + 1 < s.length && s.charAt(i + 1) == '\n') { endRow(); i += 1 } else endRow()
        case '\n' => endRow()
        case other => cell.append(other)
      }
      i += 1
    }
    if (cell.nonEmpty || row.result().nonEmpty) endRow()
    rows.result().filter(_.exists(_.nonEmpty))
  }

  /** CSV → markdown pipe table (first row = header), pipes escaped. */
  def csvToMarkdown(s: String): String = {
    val rows = parseCsv(s)
    if (rows.isEmpty) ""
    else {
      def line(r: Seq[String]) = r.map(_.replace("|", "\\|")).mkString("| ", " | ", " |")
      (line(rows.head) +:
        rows.head.map(_ => "---").mkString("| ", " | ", " |") +:
        rows.tail.map(line)).mkString("\n")
    }
  }

  private val mapper = new ObjectMapper()

  /** JSON → an indented outline (objects as `key: value` lines, arrays
    * as `- ` items), preserving object key order. Invalid JSON falls
    * back to the raw text — ingest should never drop a file over a
    * parse error, it should surface the payload.
    */
  def jsonToText(s: String): String = {
    def render(n: JsonNode, indent: Int): Seq[String] = {
      val pad = "  " * indent
      if (n.isObject)
        n.fields().asScala.toSeq.flatMap { e =>
          val (k, v) = (e.getKey, e.getValue)
          if (v.isValueNode) Seq(s"$pad$k: ${v.asText()}")
          else s"$pad$k:" +: render(v, indent + 1)
        }
      else if (n.isArray)
        n.asScala.toSeq.flatMap { v =>
          if (v.isValueNode) Seq(s"$pad- ${v.asText()}")
          else s"$pad-" +: render(v, indent + 1)
        }
      else Seq(s"$pad${n.asText()}")
    }
    try render(mapper.readTree(s), 0).mkString("\n")
    catch { case _: Exception => s }
  }

  /** Stub payload for formats whose parsers are not in this container
    * (same shape the stub converter always produced).
    */
  def stub(sourceBasename: String, fileType: String, nBytes: Long): String =
    s"# $sourceBasename\n[stub-converted $fileType $nBytes bytes]"

  /** Dispatch per file_type over decoded UTF-8 bytes (structured text
    * formats) or the stub (binary formats).
    */
  def convert(source: String, fileType: String, bytes: Array[Byte], nBytes: Long): String = {
    def text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    fileType match {
      case "txt" | "md"   => text
      case "html" | "htm" => htmlToText(text)
      case "xml"          => xmlToText(text)
      case "csv"          => csvToMarkdown(text)
      case "json"         => jsonToText(text)
      case _ =>
        stub(source.replaceAll("^.*[/\\\\]", ""), fileType, nBytes)
    }
  }
}
