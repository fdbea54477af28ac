package graft.kernel

import java.time.LocalDate
import java.util.regex.Pattern
import scala.util.matching.Regex

/** Date extraction cascade — a JVM re-derivation of the reference's
  * dateparser-based cascade (reference app/utils/data_extractor.py:38-192,
  * 194-232). There is no `dateparser` on the JVM, so the per-string
  * parser is a hand-rolled stand-in ([[parseWithOrder]]) covering every
  * format the cascade's regexes can capture; priority order of the
  * cascade itself is preserved exactly:
  *
  *  (a) entity dates (`invoice_date:` / `date:` prefixes);
  *  (b) 12 keyword contexts × 11 date regexes within 50 chars after the
  *      keyword, orders tried DMY → MDY → YMD;
  *  (c) the same regexes over the whole text;
  *  (d) 8-digit YYYYMMDD then DDMMYYYY with day/month swap rescue;
  *  (e) month-name table jan..dec, both orders, whole text;
  *  (f) dotted `d.m.yy` with century inference (asOf year + 20 rollback);
  *  (g) whole-text last-resort parse.
  *
  * Determinism: the reference uses `datetime.now()` as RELATIVE_BASE /
  * century base (data_extractor.py:84, 166-170) — a noted determinism
  * hazard; we pin an as-of date (the reference snapshot date) instead
  * (SURVEY.md §1.2).
  *
  * Documented divergences from dateparser (never exercised by fixtures):
  * PREFER_DATES_FROM past/current_period only affects incomplete dates,
  * which our regexes cannot capture; locale month names beyond English
  * are not recognized.
  */
object DateExtract {

  /** Pinned as-of date = reference snapshot date (FIXTURES.md). */
  val DefaultAsOf: LocalDate = LocalDate.of(2025, 4, 18)

  // data_extractor.py:44-56 — order matters.
  private val datePatterns: Seq[Pattern] = Seq(
    "\\b(\\d{1,2}[/\\.-]\\d{1,2}[/\\.-]\\d{2,4})\\b",
    "\\b(\\d{4}[/\\.-]\\d{1,2}[/\\.-]\\d{1,2})\\b",
    "\\b(\\d{8})\\b",
    "\\b(\\d{1,2}\\s+[A-Za-z]{3,9}\\.?\\s+\\d{2,4})\\b",
    "\\b([A-Za-z]{3,9}\\.?\\s+\\d{1,2},?\\s+\\d{2,4})\\b",
    "\\b([A-Za-z]{3}\\.?\\s+[A-Za-z]{3}\\.?\\s+\\d{2,4})\\b",
    "\\b(\\d{1,2}\\.\\d{1,2}\\.\\d{2,4})\\b",
    "\\b(\\d{1,2}-\\d{1,2}-\\d{2,4})\\b",
    "\\b(\\d{1,2}\\s+\\d{1,2}\\s+\\d{2,4})\\b",
    "\\b(\\d{4}\\d{2}\\d{2})\\b",
    "\\b(\\d{2}\\d{2}\\d{4})\\b"
  ).map(Pattern.compile)

  // data_extractor.py:58-62 — order matters ('date' first).
  private val dateKeywords: Seq[String] = Seq(
    "date", "invoice date", "issue date", "dated", "invoice",
    "issued", "due date", "billing date", "transaction date",
    "document date", "statement date", "posting date")

  private val keywordPatterns: Seq[Pattern] =
    dateKeywords.map(k => Pattern.compile("(?i)" + Regex.quote(k) + "[:\\s]*(.{0,50})"))

  private val orders = Seq("DMY", "MDY", "YMD")

  private val monthNames: Seq[(String, Int)] = Seq(
    "jan" -> 1, "feb" -> 2, "mar" -> 3, "apr" -> 4, "may" -> 5, "jun" -> 6,
    "jul" -> 7, "aug" -> 8, "sep" -> 9, "oct" -> 10, "nov" -> 11, "dec" -> 12)

  private val monthByName: Map[String, Int] = monthNames.toMap

  // precompiled hot-path patterns (compiled-per-call was a measured
  // bottleneck in the invoice kernel stage)
  private val ymd8Pattern = Pattern.compile("(\\d{4})(\\d{2})(\\d{2})")
  private val dmy8Pattern = Pattern.compile("(\\d{2})(\\d{2})(\\d{4})")
  private val dottedPattern =
    Pattern.compile("\\b(\\d{1,2})\\.(\\d{1,2})\\.(\\d{2})\\b")
  private val monthPatterns: Seq[(Int, Pattern, Pattern)] =
    monthNames.map { case (name, num) =>
      (num,
        Pattern.compile("(?i)" + name + "\\S*\\.?\\s+(\\d{1,2})\\S*\\.?\\s+(\\d{4})"),
        Pattern.compile("(?i)(\\d{1,2})\\S*\\.?\\s+" + name + "\\S*\\.?\\s+(\\d{4})"))
    }

  def extractDate(
      text: String,
      entities: Seq[String] = Nil,
      asOf: LocalDate = DefaultAsOf): Option[LocalDate] = {
    // (a) entity dates first (data_extractor.py:39-42)
    extractDateFromEntities(entities, asOf).orElse(extractDateFromText(text, asOf))
  }

  /** Branches (b)..(g) over raw text. */
  def extractDateFromText(text: String, asOf: LocalDate = DefaultAsOf)
      : Option[LocalDate] = {
    // (b) keyword proximity (data_extractor.py:64-91)
    for (kp <- keywordPatterns) {
      val km = kp.matcher(text)
      while (km.find()) {
        val nearby = km.group(1)
        for (p <- datePatterns) {
          val dm = p.matcher(nearby)
          while (dm.find()) {
            for (order <- orders) {
              parseWithOrder(dm.group(0), order, asOf) match {
                case Some(d) => return Some(d)
                case None =>
              }
            }
          }
        }
      }
    }
    // (c) whole text, same patterns (data_extractor.py:93-113)
    for (p <- datePatterns) {
      val dm = p.matcher(text)
      while (dm.find()) {
        for (order <- orders) {
          parseWithOrder(dm.group(0), order, asOf) match {
            case Some(d) => return Some(d)
            case None =>
          }
        }
      }
    }
    // (d) special 8-digit forms — NOTE: unanchored, like the reference's
    // finditer without \b (data_extractor.py:115-137)
    val ymd8 = ymd8Pattern.matcher(text)
    while (ymd8.find()) {
      mkDate(ymd8.group(1).toInt, ymd8.group(2).toInt, ymd8.group(3).toInt)
        .foreach(d => return Some(d))
    }
    val dmy8 = dmy8Pattern.matcher(text)
    while (dmy8.find()) {
      val (first, second, year) =
        (dmy8.group(1).toInt, dmy8.group(2).toInt, dmy8.group(3).toInt)
      mkDate(year, second, first).orElse(mkDate(year, first, second))
        .foreach(d => return Some(d))
    }
    // (e) month-name table, jan..dec, both orders (data_extractor.py:139-159)
    for ((num, mdPat, dmPat) <- monthPatterns) {
      val p1 = mdPat.matcher(text)
      while (p1.find()) {
        mkDate(p1.group(2).toInt, num, p1.group(1).toInt)
          .foreach(d => return Some(d))
      }
      val p2 = dmPat.matcher(text)
      while (p2.find()) {
        mkDate(p2.group(2).toInt, num, p2.group(1).toInt)
          .foreach(d => return Some(d))
      }
    }
    // (f) dotted d.m.yy century inference (data_extractor.py:161-177)
    dottedTwoDigitYear(text, asOf).orElse {
      // (g) last-resort whole-text parse (data_extractor.py:179-190)
      lastResort(text.trim, asOf)
    }
  }

  /** Entity path (data_extractor.py:194-232). */
  def extractDateFromEntities(entities: Seq[String], asOf: LocalDate = DefaultAsOf)
      : Option[LocalDate] = {
    entities.iterator.flatMap { entity =>
      if (entity.startsWith("invoice_date:") || entity.startsWith("date:")) {
        val dateStr = entity.split(":", 2)(1).trim
        orders.iterator.flatMap(parseWithOrder(dateStr, _, asOf)).nextOption()
          .orElse(dottedTwoDigitYear(dateStr, asOf))
      } else None
    }.nextOption()
  }

  /** Dotted `d.m.yy` with century inference: century of asOf year,
    * rolled back one century if the result lands > asOf.year + 20;
    * (y, m, d) tried before the (y, d, m) swap rescue.
    */
  private def dottedTwoDigitYear(text: String, asOf: LocalDate): Option[LocalDate] = {
    val m = dottedPattern.matcher(text)
    while (m.find()) {
      val (day, month, yearShort) = (m.group(1).toInt, m.group(2).toInt, m.group(3).toInt)
      val century = asOf.getYear / 100
      var year = century * 100 + yearShort
      if (year > asOf.getYear + 20) year = (century - 1) * 100 + yearShort
      mkDate(year, month, day).orElse(mkDate(year, day, month))
        .foreach(d => return Some(d))
    }
    None
  }

  private def mkDate(y: Int, m: Int, d: Int): Option[LocalDate] =
    try Some(LocalDate.of(y, m, d)) catch { case _: java.time.DateTimeException => None }

  // -------------------------------------------------------------------------
  // dateparser stand-in for one captured date string + DATE_ORDER.
  // -------------------------------------------------------------------------

  private val numericThree = Pattern.compile(
    "^\\s*(\\d{1,4})\\s*[/\\.\\-\\s]\\s*(\\d{1,4})\\s*[/\\.\\-\\s]\\s*(\\d{1,4})\\s*$")
  private val dayMonthName = Pattern.compile(
    "^\\s*(\\d{1,2})\\s+([A-Za-z]{3,9})\\.?,?\\s+(\\d{2,4})\\s*$")
  private val monthNameDay = Pattern.compile(
    "^\\s*([A-Za-z]{3,9})\\.?\\s+(\\d{1,2})\\s*,?\\s+(\\d{2,4})\\s*$")
  private val digits8 = Pattern.compile("^\\s*(\\d{8})\\s*$")

  /** Parse a single date string honoring a DATE_ORDER, mimicking
    * dateparser's behaviour on the formats our regexes capture:
    *   - a 4-digit component is always the year, wherever it sits;
    *   - remaining components take the order's day/month sequence;
    *   - 2-digit years resolve into the asOf century;
    *   - English month names accepted (full or ≥3-char prefix);
    *   - 8 digits: YYYYMMDD if the head looks like a year, else the
    *     order decides DDMM/MMDD + YYYY.
    * Returns None for impossible calendar dates (caller advances to the
    * next DATE_ORDER, like the reference's try/except).
    */
  def parseWithOrder(s: String, order: String, asOf: LocalDate): Option[LocalDate] = {
    val mn = numericThree.matcher(s)
    if (mn.matches()) {
      val parts = Seq(mn.group(1), mn.group(2), mn.group(3))
      return parseNumericParts(parts, order, asOf)
    }
    val md8 = digits8.matcher(s)
    if (md8.matches()) {
      val d = md8.group(1)
      val head = d.substring(0, 4).toInt
      if (head >= 1900 && head <= 2099) {
        return mkDate(head, d.substring(4, 6).toInt, d.substring(6, 8).toInt)
      }
      val (a, b, y) = (d.substring(0, 2).toInt, d.substring(2, 4).toInt,
        d.substring(4, 8).toInt)
      return order match {
        case "MDY" => mkDate(y, a, b)
        case _ => mkDate(y, b, a) // DMY and YMD fall back to ddmmyyyy
      }
    }
    val m1 = dayMonthName.matcher(s)
    if (m1.matches()) {
      return monthFromName(m1.group(2)).flatMap(mon =>
        mkDate(resolveYear(m1.group(3), asOf), mon, m1.group(1).toInt))
    }
    val m2 = monthNameDay.matcher(s)
    if (m2.matches()) {
      return monthFromName(m2.group(1)).flatMap(mon =>
        mkDate(resolveYear(m2.group(3), asOf), mon, m2.group(2).toInt))
    }
    None
  }

  private def parseNumericParts(parts: Seq[String], order: String, asOf: LocalDate)
      : Option[LocalDate] = {
    val fourIdx = parts.indexWhere(_.length == 4)
    if (fourIdx >= 0) {
      val year = parts(fourIdx).toInt
      val rest = parts.zipWithIndex.filter(_._2 != fourIdx).map(_._1.toInt)
      val (d, m) = order match {
        case "MDY" => (rest(1), rest(0))
        case "YMD" => (rest(1), rest(0))
        case _ => (rest(0), rest(1)) // DMY
      }
      // dateparser places the 4-digit year wherever found; for YMD the
      // remaining two read month-then-day, for DMY day-then-month, MDY
      // month-then-day.
      mkDate(year, m, d)
    } else {
      val nums = parts.map(_.toInt)
      val (d, m, y) = order match {
        case "DMY" => (nums(0), nums(1), nums(2))
        case "MDY" => (nums(1), nums(0), nums(2))
        case "YMD" => (nums(2), nums(1), nums(0))
      }
      mkDate(resolveYear2(y, asOf), m, d)
    }
  }

  private def resolveYear(s: String, asOf: LocalDate): Int =
    if (s.length == 4) s.toInt else resolveYear2(s.toInt, asOf)

  /** Two-digit year → POSIX strptime convention (00-68 → 20xx,
    * 69-99 → 19xx), matching dateparser's two-digit-year resolution.
    */
  private def resolveYear2(y: Int, asOf: LocalDate): Int =
    if (y >= 100) y else if (y <= 68) 2000 + y else 1900 + y

  private def monthFromName(name: String): Option[Int] = {
    val low = name.toLowerCase
    monthByName.get(low.take(3)).filter { _ =>
      // full names must actually be month prefixes ("March" ok, "Marble" no)
      val full = Seq("january", "february", "march", "april", "may", "june",
        "july", "august", "september", "october", "november", "december")
      full.exists(f => f.startsWith(low) || low.startsWith(f.take(3)) && low.length <= 3 || f == low)
    }
  }

  /** Last-resort whole-text parse stand-in: ISO yyyy-MM-dd anywhere the
    * trimmed text IS a date, else None. The reference hands the entire
    * text to dateparser here (data_extractor.py:179-190); fixtures never
    * rely on this branch.
    */
  private def lastResort(trimmed: String, asOf: LocalDate): Option[LocalDate] = {
    orders.iterator.flatMap(parseWithOrder(trimmed, _, asOf)).nextOption()
  }
}
