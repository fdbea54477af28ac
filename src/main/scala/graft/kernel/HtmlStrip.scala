package graft.kernel

import scala.collection.mutable

/** DOM/heuristic boilerplate stripping for HTML spans (the graft's F17,
  * BASELINE.json north_star). Public-algorithm lineage: block
  * segmentation + link-density classification in the style of
  * jusText (Pomikálek 2011) / Readability — no reference-code heritage
  * (the reference has no HTML handling; this is the graft-mandated
  * extension, SURVEY.md §2.5 F17).
  *
  * Pipeline: minimal tokenizer → drop script/style/comments → segment
  * into blocks at block-level tags → per block compute text, length and
  * link density → keep blocks that are (a) not inside a
  * nav/header/footer/aside container, (b) link density < 0.33,
  * (c) ≥ 25 chars of content. Output = kept blocks joined by "\n",
  * entity-decoded, whitespace-normalized.
  */
object HtmlStrip {

  private val BlockTags = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "td", "tr", "table", "section", "article", "main", "br", "blockquote",
    "pre", "body", "nav", "header", "footer", "aside")

  private val BoilerplateContainers = Set("nav", "header", "footer", "aside")

  private val MinBlockChars = 25
  private val MaxLinkDensity = 0.33

  private case class Block(
      text: StringBuilder = new StringBuilder,
      var linkChars: Int = 0,
      var inBoilerplate: Boolean = false)

  /** Extract main content text from an HTML string. */
  def strip(html: String): String = {
    val blocks = mutable.ArrayBuffer[Block]()
    var current = Block()
    var boilerplateDepth = 0
    var linkDepth = 0
    var skipDepth = 0 // inside script/style
    var i = 0
    val n = html.length

    def flush(): Unit = {
      if (current.text.nonEmpty) blocks += current
      current = Block()
      current.inBoilerplate = boilerplateDepth > 0
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val end = html.indexOf('>', i)
          if (end < 0) { i = n }
          else {
            val rawTag = html.substring(i + 1, end)
            val isClose = rawTag.startsWith("/")
            val selfClose = rawTag.endsWith("/")
            val name = rawTag.stripPrefix("/").takeWhile(ch =>
              ch.isLetterOrDigit).toLowerCase
            if (name == "script" || name == "style") {
              if (isClose) skipDepth = math.max(0, skipDepth - 1)
              else if (!selfClose) {
                // jump to the matching close tag
                val close = html.toLowerCase.indexOf(s"</$name", end)
                i = if (close < 0) n else html.indexOf('>', close) + 1
                if (i == 0) i = n
                skipDepth = 0
                // skip the normal advance below
                // (continue outer loop)
              }
            } else if (skipDepth == 0) {
              if (BlockTags.contains(name)) flush()
              if (BoilerplateContainers.contains(name) && !selfClose) {
                if (isClose) boilerplateDepth = math.max(0, boilerplateDepth - 1)
                else boilerplateDepth += 1
                current.inBoilerplate = boilerplateDepth > 0
              }
              if (name == "a") {
                if (isClose) linkDepth = math.max(0, linkDepth - 1)
                else if (!selfClose) linkDepth += 1
              }
            }
            if (i < end + 1) i = end + 1
          }
        }
      } else {
        if (skipDepth == 0) {
          current.text.append(c)
          if (linkDepth > 0 && !c.isWhitespace) current.linkChars += 1
        }
        i += 1
      }
    }
    flush()

    val kept = blocks.iterator.map { b =>
      val text = normalize(decodeEntities(b.text.toString))
      (text, b)
    }.filter { case (text, b) =>
      !b.inBoilerplate &&
        text.length >= MinBlockChars &&
        (if (text.isEmpty) true
         else b.linkChars.toDouble / math.max(1, text.count(!_.isWhitespace)) < MaxLinkDensity)
    }.map(_._1).toSeq

    kept.mkString("\n")
  }

  /** Decode the basic named/numeric entities fixtures use. */
  def decodeEntities(s: String): String = {
    if (!s.contains('&')) return s
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i)
        if (semi > i && semi - i <= 10) {
          s.substring(i + 1, semi) match {
            case "amp" => out.append('&'); i = semi + 1
            case "lt" => out.append('<'); i = semi + 1
            case "gt" => out.append('>'); i = semi + 1
            case "quot" => out.append('"'); i = semi + 1
            case "apos" | "#39" => out.append('\''); i = semi + 1
            case "nbsp" => out.append(' '); i = semi + 1
            case e if e.startsWith("#") =>
              try { out.append(Integer.parseInt(e.drop(1)).toChar); i = semi + 1 }
              catch { case _: NumberFormatException => out.append(c); i += 1 }
            case _ => out.append(c); i += 1
          }
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Collapse whitespace runs to single spaces and trim. */
  def normalize(s: String): String =
    s.replaceAll("\\s+", " ").trim
}
