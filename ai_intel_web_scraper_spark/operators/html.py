"""HTML content extraction (SURVEY P1).

Reference semantics: scrapers/utils.py:120-246 — `extract_content` picks a
main content area (CSS-ish selector with fallbacks), strips chrome
(nav/header/footer/aside/script/style/noscript plus cookie/banner/popup/
modal/overlay/sidebar/toc class patterns), then extracts structured text
preserving code fences (```lang), tables (markdown), headings (#-prefixed),
and lists ("- item"), recursing through p/div/section/article/main/
blockquote.

bs4/lxml are not available in this container, so the DOM is built with the
stdlib `html.parser` — same observable behavior for well-formed HTML. All
rows are processed inside ONE Arrow-batched pandas UDF (the parse is
inherently per-row Python; only (title, text) strings cross back).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# reference scrapers/utils.py:157 (tag strip) and :162 (class strip)
STRIP_TAGS = ("nav", "header", "footer", "aside", "script", "style",
              "noscript")
STRIP_CLASS_RX = re.compile(
    "cookie|banner|popup|modal|overlay|sidebar|toc", re.I)
# reference scrapers/utils.py:145 fallback selector chain
FALLBACK_SELECTORS = ("main", "article", "[role='main']", ".content",
                      "#content")
VOID_TAGS = {"area", "base", "br", "col", "embed", "hr", "img", "input",
             "link", "meta", "param", "source", "track", "wbr"}
_RECURSE_TAGS = ("p", "div", "section", "article", "main", "blockquote")


class _Node:
    """Minimal DOM element: tag, attrs dict, ordered children (str|_Node)."""

    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict[str, str] | None = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list = []

    # --- bs4-alike accessors used by the extractor -----------------------

    def get_text(self, strip: bool = False) -> str:
        parts: list[str] = []
        stack = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, str):
                s = c.strip() if strip else c
                if s:
                    parts.append(s)
            else:
                stack.extend(reversed(c.children))
        return "".join(parts)

    def iter_elements(self):
        """All descendant elements in document order (excluding self)."""
        stack = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, _Node):
                yield c
                stack.extend(reversed(c.children))

    def classes(self) -> list[str]:
        return self.attrs.get("class", "").split()


class _DomBuilder:
    """html.parser -> _Node tree. Tolerates unclosed tags by popping until
    a matching open tag is found (well-formed input never hits that)."""

    def __init__(self):
        from html.parser import HTMLParser

        builder = self

        class P(HTMLParser):
            def handle_starttag(self, tag, attrs):
                builder._open(tag, attrs)

            def handle_startendtag(self, tag, attrs):
                builder._open(tag, attrs)
                builder._close(tag)

            def handle_endtag(self, tag):
                builder._close(tag)

            def handle_data(self, data):
                if data:
                    builder.stack[-1].children.append(data)

        self.root = _Node("[document]")
        self.stack = [self.root]
        self.parser = P(convert_charrefs=True)

    def _open(self, tag, attrs):
        node = _Node(tag, {k: (v or "") for k, v in attrs})
        self.stack[-1].children.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def _close(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def feed(self, html: str) -> _Node:
        self.parser.feed(html or "")
        self.parser.close()
        return self.root


def parse_html(html: str) -> _Node:
    return _DomBuilder().feed(html)


def _find_first(root: _Node, tag: str) -> _Node | None:
    for el in root.iter_elements():
        if el.tag == tag:
            return el
    return None


def select_one(root: _Node, selector: str) -> _Node | None:
    """The selector subset the reference exercises: tag, [role='x'],
    .class, #id (scrapers/utils.py:142-148)."""
    m = re.fullmatch(r"\[(\w+)='([^']*)'\]", selector)
    for el in root.iter_elements():
        if m:
            if el.attrs.get(m.group(1)) == m.group(2):
                return el
        elif selector.startswith("."):
            if selector[1:] in el.classes():
                return el
        elif selector.startswith("#"):
            if el.attrs.get("id") == selector[1:]:
                return el
        elif el.tag == selector:
            return el
    return None


def _strip_chrome(area: _Node) -> None:
    """Remove unwanted elements in place (reference utils.py:156-164)."""
    def keep(c) -> bool:
        if not isinstance(c, _Node):
            return True
        if c.tag in STRIP_TAGS:
            return False
        return not any(STRIP_CLASS_RX.search(cls) for cls in c.classes())

    stack = [area]
    while stack:
        n = stack.pop()
        n.children = [c for c in n.children if keep(c)]
        stack.extend(c for c in n.children if isinstance(c, _Node))


def _table_md(table: _Node) -> str:
    """Table -> markdown (reference utils.py:227-246)."""
    rows = []
    for tr in (el for el in table.iter_elements() if el.tag == "tr"):
        cells = [c.get_text(strip=True)
                 for c in tr.iter_elements() if c.tag in ("th", "td")]
        if cells:
            rows.append("| " + " | ".join(cells) + " |")
    if not rows:
        return ""
    if len(rows) > 1:
        num_cols = rows[0].count("|") - 1
        rows.insert(1, "| " + " | ".join(["---"] * num_cols) + " |")
    return "\n" + "\n".join(rows) + "\n"


def _structured_text(element: _Node) -> str:
    """reference utils.py:171-224 — preserve code/table/heading/list
    structure, recurse through block containers."""
    parts: list[str] = []
    for child in element.children:
        if isinstance(child, str):
            text = child.strip()
            if text:
                parts.append(text)
            continue
        tag = child.tag
        if tag == "pre":
            lang = ""
            for cls in child.classes():
                if cls.startswith("language-"):
                    lang = cls.replace("language-", "")
                    break
            parts.append(f"\n```{lang}\n{child.get_text()}\n```\n")
        elif tag == "table":
            md = _table_md(child)
            if md:
                parts.append(md)
        elif tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            parts.append(f"\n{'#' * int(tag[1])} {child.get_text(strip=True)}\n")
        elif tag in ("ul", "ol"):
            for li in (c for c in child.children
                       if isinstance(c, _Node) and c.tag == "li"):
                parts.append(f"- {li.get_text(strip=True)}")
        elif tag in _RECURSE_TAGS:
            inner = _structured_text(child)
            if inner.strip():
                parts.append(inner)
        else:
            text = child.get_text(strip=True)
            if text:
                parts.append(text)
    return "\n".join(parts)


def extract_content(html: str,
                    content_selector: str = "article") -> tuple[str, str]:
    """HTML -> (title, structured text). Reference utils.py:120-168."""
    root = parse_html(html)
    title = ""
    title_tag = _find_first(root, "title")
    if title_tag:
        title = title_tag.get_text(strip=True)
    if not title:
        h1 = _find_first(root, "h1")
        if h1:
            title = h1.get_text(strip=True)

    area = select_one(root, content_selector)
    if area is None:
        for fb in FALLBACK_SELECTORS:
            area = select_one(root, fb)
            if area is not None:
                break
    if area is None:
        area = _find_first(root, "body")
    if area is None:
        return title, ""
    _strip_chrome(area)
    return title, _structured_text(area)


def html_extract(df: DataFrame, html_col: str,
                 content_selector: str = "article") -> DataFrame:
    """Batched extraction: adds (title, text) from an HTML column. One
    Arrow round-trip; only the two result strings cross back per row."""
    @F.pandas_udf(T.StructType([T.StructField("title", T.StringType()),
                                T.StructField("text", T.StringType())]))
    def extract(html: pd.Series) -> pd.DataFrame:
        pairs = [extract_content(h or "", content_selector) for h in html]
        return pd.DataFrame(pairs, columns=["title", "text"])

    return (df.withColumn("_ex", extract(F.col(html_col)))
            .withColumn("title", F.col("_ex.title"))
            .withColumn("text", F.col("_ex.text"))
            .drop("_ex"))
