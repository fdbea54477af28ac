package graft.kernel

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite

class DateExtractSpec extends AnyFunSuite {
  private def d(s: String) = LocalDate.parse(s)
  private def ex(text: String) = DateExtract.extractDate(text)

  test("keyword proximity: slash DMY") {
    assert(ex("Invoice Date: 31/12/2024").contains(d("2024-12-31")))
  }

  test("keyword proximity: US-style picked up via MDY fallback") {
    assert(ex("Invoice Date: 12/31/2024").contains(d("2024-12-31")))
  }

  test("ISO date") {
    assert(ex("Date: 2024-12-31").contains(d("2024-12-31")))
  }

  test("8-digit YYYYMMDD after keyword") {
    assert(ex("Invoice Date: 20241231").contains(d("2024-12-31")))
  }

  test("8-digit DDMMYYYY day/month swap rescue") {
    assert(ex("Date: 31122024").contains(d("2024-12-31")))
  }

  test("month names both orders") {
    assert(ex("Dated: 3 Mar 2024").contains(d("2024-03-03")))
    assert(ex("Issued: Mar 3, 2024").contains(d("2024-03-03")))
    assert(ex("Due Date: March 15, 2024").contains(d("2024-03-15")))
    assert(ex("15 March 2024 was the issue date").contains(d("2024-03-15")))
  }

  test("dotted two-digit year with century inference") {
    // asOf pinned to 2025-04-18: 24 -> 2024 (<= 2045)
    assert(ex("see note 3.3.24 thanks").contains(d("2024-03-03")))
    // 99 -> 2099 > 2045 -> rollback to 1999
    assert(ex("archived 5.6.99 end").contains(d("1999-06-05")))
  }

  test("whole-text fallback without keyword") {
    assert(ex("random header\n31/12/2024\nmore").contains(d("2024-12-31")))
  }

  test("two-digit year slash date") {
    assert(ex("Date: 31/12/24").contains(d("2024-12-31")))
  }

  test("keyword wins over later dates; 'date' keyword scans 50 chars") {
    val t = "Posted 01/01/2000 blah\nInvoice Date: 31/12/2024"
    // keyword pass runs before whole-text pass, so the keyword-adjacent
    // date wins even though another date appears earlier in the text
    assert(ex(t).contains(d("2024-12-31")))
  }

  test("no date -> None") {
    assert(ex("nothing to see here 12345").isEmpty)
  }

  test("entities take priority over text") {
    val got = DateExtract.extractDate(
      "Invoice Date: 31/12/2024",
      entities = Seq("invoice_date: 15/06/2023"))
    assert(got.contains(d("2023-06-15")))
  }

  test("entity dotted-year rescue") {
    val got = DateExtract.extractDateFromEntities(Seq("date: 3.3.24"))
    assert(got.contains(d("2024-03-03")))
  }

  test("invalid calendar dates advance the order cascade") {
    // 13/13/2024 invalid in all orders -> falls through this pattern
    assert(ex("Date: 13/13/2024").isEmpty)
  }

  test("dotted d.m.yyyy full year via pattern 7") {
    assert(ex("Date: 31.12.2024").contains(d("2024-12-31")))
  }
}
