package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

class HtmlStripSpec extends AnyFunSuite {

  test("keeps main paragraphs, drops nav/footer") {
    val html =
      """<html><head><title>x</title><style>p{color:red}</style></head>
        |<body>
        |<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact page link</a></nav>
        |<div><p>This is the main content paragraph with enough characters.</p>
        |<p>Second paragraph of real article text, also long enough to keep.</p></div>
        |<footer>Copyright 2024 Example Inc. All rights reserved worldwide.</footer>
        |</body></html>""".stripMargin
    val out = HtmlStrip.strip(html)
    assert(out ==
      "This is the main content paragraph with enough characters.\n" +
        "Second paragraph of real article text, also long enough to keep.")
  }

  test("drops link farms by link density") {
    val html = "<body><div><a href='1'>one link here okay</a> <a href='2'>two links again more</a></div>" +
      "<p>Real content sentence that is long enough to be retained fully.</p></body>"
    val out = HtmlStrip.strip(html)
    assert(out == "Real content sentence that is long enough to be retained fully.")
  }

  test("drops short fragments") {
    val html = "<body><p>tiny</p><p>A sufficiently long paragraph that clears the threshold.</p></body>"
    assert(HtmlStrip.strip(html) ==
      "A sufficiently long paragraph that clears the threshold.")
  }

  test("script content never leaks") {
    val html = "<body><script>var x = 'leaky string that is quite long indeed';</script>" +
      "<p>Visible paragraph content long enough to be kept around here.</p></body>"
    val out = HtmlStrip.strip(html)
    assert(!out.contains("leaky"))
    assert(out.contains("Visible paragraph"))
  }

  test("entities decoded and whitespace normalized") {
    val html = "<body><p>Fish &amp; Chips &lt;daily&gt;   special&nbsp;menu offering today</p></body>"
    assert(HtmlStrip.strip(html) ==
      "Fish & Chips <daily> special menu offering today")
  }

  test("empty and tag-only input") {
    assert(HtmlStrip.strip("") == "")
    assert(HtmlStrip.strip("<div><br/></div>") == "")
  }
}
