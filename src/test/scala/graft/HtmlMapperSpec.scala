package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.html.{DefaultMapper, IdentityMapper, MappedXhtml}

/** HtmlMapper strategies (reference HtmlMapper/IdentityHtmlMapper +
  * DefaultHtmlMapper whitelists): safe-element markup, per-element safe
  * attributes, markup-preserving identity mode.
  */
class HtmlMapperSpec extends AnyFunSuite {

  val html =
    """<html><head><title>T</title><style>.x{}</style></head>
      |<body onload="evil()">
      |<p class="intro">Hello <span data-x="1">world</span></p>
      |<a href="/next" onclick="evil()" rel="nofollow">link</a>
      |<img src="pic.png" alt="a pic" border="9">
      |<menu><li>item</li></menu>
      |<script>tracker();</script>
      |<blockquote cite="src">quoted</blockquote>
      |</body></html>""".stripMargin

  test("default mapper: whitelisted markup only, text always passes") {
    val out = MappedXhtml.serialize(html, DefaultMapper)
    assert(out.contains("""<a href="/next" rel="nofollow">link</a>"""))
    assert(!out.contains("onclick")) // unsafe attribute dropped
    assert(!out.contains("onload"))
    assert(out.contains("""<img src="pic.png" alt="a pic"/>"""))
    assert(!out.contains("border")) // img border not in the safe set
    assert(out.contains("<p>Hello world</p>")) // span dropped, text kept; class unsafe
    assert(out.contains("<ul><li>item</li></ul>")) // MENU renames to ul
    assert(out.contains("""<blockquote cite="src">quoted</blockquote>"""))
    assert(!out.contains("tracker")) // script content discarded
    assert(!out.contains(".x{}"))    // style content discarded
    assert(!out.contains("<html") && !out.contains("<body")) // unmapped
  }

  test("identity mapper preserves all markup and attributes") {
    val out = MappedXhtml.serialize(html, IdentityMapper)
    assert(out.contains("""<span data-x="1">world</span>"""))
    assert(out.contains("""<body onload="evil()">"""))
    assert(out.contains("<menu>")) // no renaming in identity mode
    assert(out.contains("tracker();")) // nothing discarded
  }

  test("end tags close by name: omitted/stray close tags stay balanced") {
    // omitted </li> (valid HTML): EndTag(ul) must close the open li's
    // and then ul itself — not pop an unrelated element
    val out = MappedXhtml.serialize("<ul><li>a<li>b</ul>", DefaultMapper)
    val opens = "<li>".r.findAllIn(out).length + "<ul>".r.findAllIn(out).length
    val closes = "</li>".r.findAllIn(out).length + "</ul>".r.findAllIn(out).length
    assert(opens == closes, out)
    assert(out.endsWith("</ul>"), out)
    // stray end tag with no matching open element is ignored
    val stray = MappedXhtml.serialize("<p>x</div></p>", DefaultMapper)
    assert(stray == "<p>x</p>", stray)
    // EOF closes what the input left open
    val eof = MappedXhtml.serialize("<p>unclosed", DefaultMapper)
    assert(eof == "<p>unclosed</p>", eof)
  }

  test("serializer escapes text and attribute values") {
    val out = MappedXhtml.serialize(
      """<p>a &lt; b &amp; c</p><a href="x?a=1&amp;b=2">t</a>""", DefaultMapper)
    assert(out.contains("<p>a &lt; b &amp; c</p>"))
    assert(out.contains("href=\"x?a=1&amp;b=2\""))
  }
}
