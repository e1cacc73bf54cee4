"""HTML content-extraction unit tests (SURVEY P1 semantics,
reference scrapers/utils.py:120-246)."""

from __future__ import annotations

from ai_intel_web_scraper_spark.operators.html import (extract_content,
                                                       parse_html,
                                                       select_one)


def test_title_fallback_to_h1():
    assert extract_content(
        "<html><head><title>T</title></head><body><article>x</article>"
        "</body></html>")[0] == "T"
    assert extract_content(
        "<html><body><h1>H</h1><article>x</article></body></html>")[0] == "H"
    assert extract_content("<body><p>x</p></body>")[0] == ""


def test_selector_fallback_chain_order():
    # custom selector miss -> main wins over .content later in the document
    html = ("<body><div class='content'>c</div><main>m</main>"
            "<article>a</article></body>")
    _, text = extract_content(html, content_selector="#nope")
    assert text == "m"
    # the requested selector wins when present
    _, text = extract_content(html, content_selector=".content")
    assert text == "c"
    # [role='main'] selector form
    root = parse_html("<body><div role='main' id='r'>x</div></body>")
    assert select_one(root, "[role='main']").attrs["id"] == "r"


def test_chrome_and_class_strip():
    html = ("<article><nav>n</nav><p>keep</p>"
            "<div class='newsletter popup'>p</div>"
            "<div class='CookieBar'>c</div><script>s</script></article>")
    _, text = extract_content(html)
    assert text == "keep"


def test_code_fence_language_and_table():
    html = ("<article><pre class='language-py'>x = 1</pre>"
            "<table><tr><th>a</th></tr><tr><td>b</td></tr></table>"
            "</article>")
    _, text = extract_content(html)
    assert "\n```py\nx = 1\n```\n" in text
    assert "| a |" in text and "| --- |" in text and "| b |" in text


def test_headings_lists_and_recursion():
    html = ("<article><h3>Deep</h3><ul><li>one</li><li>two</li></ul>"
            "<section><blockquote><p>inner</p></blockquote></section>"
            "</article>")
    _, text = extract_content(html)
    assert "\n### Deep\n" in text
    assert "- one" in text and "- two" in text
    assert text.rstrip().endswith("inner")


def test_malformed_html_does_not_crash():
    title, text = extract_content(
        "<body><article><p>open para<div>nested</article> trailing")
    assert "open para" in text
    assert title == ""
    assert extract_content("") == ("", "")


def test_body_fallback_when_no_content_area():
    _, text = extract_content("<html><body><p>just text</p></body></html>")
    assert text == "just text"


def test_malformed_corners_entities_comments_scripts():
    """bs4-parity corners on REAL-WEB malformations (reference
    scrapers/utils.py:120-246 relies on bs4's recovery): bare ampersands
    and entities decode, comments and script/style bodies never leak into
    text, void elements don't push tree depth."""
    title, text = extract_content(
        "<html><head><title>A &amp; B</title>"
        "<style>p{color:red}</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<body><article><!-- hidden comment -->"
        "<p>Q&amp;A costs &lt;5&gt; &euro; & more</p>"
        "<p>line<br>break<img src=x><hr></p>"
        "<p>last</p></article></body>")
    assert title == "A & B"
    assert "Q&A costs <5>" in text and "& more" in text
    assert "hidden comment" not in text
    assert "not text" not in text and "color:red" not in text
    assert "last" in text


def test_misnested_inline_tags_and_stray_closers():
    """</b> closing an unopened tag and b/i misnesting must not drop
    text or crash (the unclosed-tag pop rule)."""
    _, text = extract_content(
        "<body><article><p>plain</em> <b>bold <i>both</b> italic?</i>"
        " tail</p><p>next</p></article></body>")
    for frag in ("plain", "bold", "both", "italic?", "tail", "next"):
        assert frag in text, frag


def test_attribute_quoting_variants_and_case():
    """Unquoted/single-quoted attrs, uppercase tag names, duplicate
    attrs — all must parse to the same selections."""
    html = ("<BODY><ARTICLE CLASS=docs-content>"
            "<P id=one class='a b'>x</P><DIV class=sidebar>chrome</DIV>"
            "</ARTICLE></BODY>")
    _, text = extract_content(html)
    assert "x" in text and "chrome" not in text
