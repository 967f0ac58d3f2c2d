"""HTML main-content extraction (boilerplate strip), from scratch.

The north rule's web-page half: given raw HTML bytes, produce the main
body text with navigation/footer/sidebar boilerplate removed. No HTML
library exists in this runtime, so this implements the whole chain:

1. a tolerant HTML tokenizer (tags, attributes, comments, CDATA,
   script/style/noscript raw-text skipping, numeric + named entities),
2. block segmentation at block-level tags (p, div, li, h1-6, td, ...),
3. per-block signals: text length, anchor-text length, link density,
   tag density — the jusText/Boilerpipe family of features (public
   literature: Kohlschütter et al. 2010, Pomikálek 2011),
4. classification: long low-link-density blocks are content; short or
   link-dense blocks are boilerplate; short headline blocks survive if
   a content block follows nearby; <nav>/<header>/<footer>/<aside>
   subtrees are always boilerplate (HTML5 semantics).

Deterministic and dependency-free: same bytes -> same text everywhere,
which is what the per-url byte-identity contract requires.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_BLOCK_TAGS = frozenset(
    "p div section article main li dd dt blockquote pre h1 h2 h3 h4 h5 h6 "
    "td th caption figcaption summary center".split()
)
_SKIP_SUBTREES = frozenset("nav header footer aside form".split())
_RAWTEXT = frozenset("script style noscript template svg".split())
_HEADING = frozenset("h1 h2 h3 h4 h5 h6".split())

_ENTITIES = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": " ", "copy": "©", "reg": "®",
    "mdash": "—", "ndash": "–", "hellip": "…",
    "lsquo": "‘", "rsquo": "’", "ldquo": "“",
    "rdquo": "”", "middot": "·", "bull": "•",
    "laquo": "«", "raquo": "»", "times": "×",
    "shy": "", "eacute": "é", "egrave": "è",
    "agrave": "à", "uuml": "ü", "ouml": "ö",
    "auml": "ä", "szlig": "ß", "ccedil": "ç",
}

_ENT_RE = re.compile(r"&(#x?[0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]*);")
_WS_RE = re.compile(r"[ \t\r\n\f\v ]+")
_TAG_RE = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9:-]*)((?:[^>'\"]|\"[^\"]*\"|'[^']*')*)(/?)>",
    re.S,
)


# Inert regions for the regex-scanning extractors (links/meta/tables/
# headings): HTML comments, CDATA sections, and the raw-text elements
# whose contents are never markup (script/style/template).  An
# unterminated opener consumes to EOF, matching the HTML5 parsing spec
# (and matching what _segment() above does tag-by-tag).  noscript and
# svg are deliberately NOT inert here: noscript bodies are real indexed
# markup when JS is off, and SVG2 <a href> anchors are real links.
# JSON-LD extraction must NOT use this — it reads <script
# type="application/ld+json"> payloads (see htmlmeta._page_jsonld).
_INERT_RE = re.compile(
    rb"<!--.*?(?:-->|$)"
    rb"|<!\[CDATA\[.*?(?:\]\]>|$)"
    rb"|<(script|style|template)(?=[\s/>])[^>]*>.*?(?:</\1\s*>|$)",
    re.I | re.S,
)


def strip_inert_bytes(html: bytes) -> bytes:
    """Blank comments, CDATA, and script/style/template raw text.

    The structural extractors (graphs._page_links, htmlmeta._page_meta,
    htmltables._page_tables, htmlmeta._page_headings) regex-scan raw
    bytes; without this, an anchor inside ``<!-- commented-out nav -->``
    or an ``<a href>`` string literal inside a ``<script>`` body becomes
    a phantom edge/cell on real crawl HTML (VERDICT r6 finding #1).
    Replacement is a single space so adjacent text never fuses.
    ``<script/>`` self-closing is treated as an open raw-text tag, the
    same error-recovery browsers apply (script is never void in HTML).
    """
    return _INERT_RE.sub(b" ", html)


def _decode_entities(s: str) -> str:
    def sub(m):
        e = m.group(1)
        if e[0] == "#":
            try:
                cp = int(e[2:], 16) if e[1] in "xX" else int(e[1:])
                return chr(cp) if 0 < cp < 0x110000 else ""
            except ValueError:
                return m.group(0)
        return _ENTITIES.get(e, _ENTITIES.get(e.lower(), m.group(0)))

    return _ENT_RE.sub(sub, s)


@dataclass
class Block:
    texts: list = field(default_factory=list)
    anchor_chars: int = 0
    tags: int = 0
    heading: bool = False

    def text(self) -> str:
        t = _WS_RE.sub(" ", "".join(self.texts)).strip()
        return t

    def n_chars(self) -> int:
        return len(self.text())

    def link_density(self) -> float:
        n = self.n_chars()
        return (self.anchor_chars / n) if n else 1.0


def _segment(html: str) -> tuple[str, list[Block]]:
    """Tokenize + segment into text blocks. Returns (title, blocks)."""
    title = ""
    blocks: list[Block] = [Block()]
    skip_depth = 0  # inside nav/header/footer/aside/form
    raw_until: str | None = None  # inside script/style/...
    anchor_depth = 0
    in_title = False
    pos = 0
    n = len(html)

    def flush(heading: bool = False):
        if blocks[-1].texts or blocks[-1].tags:
            blocks.append(Block())
        blocks[-1].heading = heading

    while pos < n:
        lt = html.find("<", pos)
        if lt < 0:
            lt = n
        if lt > pos:  # text run
            if raw_until is None and skip_depth == 0:
                txt = _decode_entities(html[pos:lt])
                if in_title:
                    title += txt
                elif txt and not txt.isspace():
                    blocks[-1].texts.append(txt)
                    if anchor_depth > 0:
                        blocks[-1].anchor_chars += len(
                            _WS_RE.sub(" ", txt).strip()
                        )
            pos = lt
            continue
        if html.startswith("<!--", pos):
            end = html.find("-->", pos + 4)
            pos = (end + 3) if end >= 0 else n
            continue
        if html.startswith("<![CDATA[", pos):
            end = html.find("]]>", pos + 9)
            pos = (end + 3) if end >= 0 else n
            continue
        if html.startswith("<!", pos) or html.startswith("<?", pos):
            end = html.find(">", pos)
            pos = (end + 1) if end >= 0 else n
            continue
        m = _TAG_RE.match(html, pos)
        if m is None:
            # stray '<' treated as text, like browsers do
            if raw_until is None and skip_depth == 0 and not in_title:
                blocks[-1].texts.append("<")
            pos += 1
            continue
        closing, name, _attrs, selfclose = m.groups()
        name = name.lower()
        pos = m.end()
        if raw_until is not None:
            if closing and name == raw_until:
                raw_until = None
            continue
        if not closing and name in _RAWTEXT:
            if not selfclose:
                raw_until = name
            continue
        if name == "title":
            in_title = not closing and not selfclose
            continue
        if name in _SKIP_SUBTREES:
            if closing:
                skip_depth = max(0, skip_depth - 1)
            elif not selfclose:
                skip_depth += 1
            continue
        if skip_depth:
            continue
        if name == "a":
            if closing:
                anchor_depth = max(0, anchor_depth - 1)
            elif not selfclose:
                anchor_depth += 1
            blocks[-1].tags += 0 if closing else 1
            continue
        if name == "br":
            blocks[-1].texts.append(" ")
            continue
        if name in _BLOCK_TAGS or name == "body":
            flush(heading=(not closing and name in _HEADING))
        elif not closing:
            blocks[-1].tags += 1  # inline tags do NOT split words
    title = _WS_RE.sub(" ", _decode_entities(title)).strip()
    return title, [b for b in blocks if b.n_chars() > 0]


def extract_main_content(
    html: bytes | str,
    min_content_chars: int = 60,
    max_link_density: float = 0.33,
) -> dict:
    """-> {title, text, n_blocks, n_content_blocks}.

    Classification: a block is CONTENT if it has >= min_content_chars
    of text at link density <= max_link_density; a short heading block
    is kept when one of the next two blocks is content; everything else
    is boilerplate.
    """
    if isinstance(html, (bytes, bytearray)):
        try:
            s = bytes(html).decode("utf-8")
        except UnicodeDecodeError:
            s = bytes(html).decode("latin-1")
    else:
        s = html
    title, blocks = _segment(s)
    content = [False] * len(blocks)
    for i, b in enumerate(blocks):
        if b.n_chars() >= min_content_chars and (
            b.link_density() <= max_link_density
        ):
            content[i] = True
    # second pass: keep headings / short lead-ins adjacent to content
    for i, b in enumerate(blocks):
        if content[i]:
            continue
        if b.link_density() > max_link_density:
            continue
        nearby = content[i + 1 : i + 3]
        if b.heading and any(nearby):
            content[i] = True
        elif b.n_chars() >= 25 and (i + 1 < len(blocks) and content[i + 1]):
            content[i] = True
    text = "\n".join(b.text() for i, b in enumerate(blocks) if content[i])
    return {
        "title": title,
        "text": text,
        "n_blocks": len(blocks),
        "n_content_blocks": sum(content),
    }
