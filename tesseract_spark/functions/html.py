"""Main-content extraction: HTML boilerplate stripping via DOM heuristics.

Block-level text-density segmentation in the style of the published
jusText / Readability / Boilerpipe families (public algorithms): parse the
DOM with the stdlib HTMLParser, segment at block-level tags, score each
block by link density and stopword/text density, and keep content blocks
while dropping chrome (nav/header/footer/aside/script/style) and
link-dense lists.  Semantic containers (<main>, <article>) get a content
prior; <nav> etc. get a boilerplate prior.

This is the extraction-tier counterpart of the OCR pipeline: documents
arrive as interleaved text+media; textual spans that are HTML pass through
``strip_boilerplate`` inside the same vectorized pandas UDF stage that
OCRs media spans — no per-row Python at the Spark level.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

BLOCK_TAGS = {
    "p", "div", "section", "article", "main", "li", "td", "th",
    "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre",
    "ul", "ol", "table", "tr", "body", "header", "footer", "nav", "aside",
}
DROP_TAGS = {"script", "style", "noscript", "template", "svg", "iframe"}
BOILER_TAGS = {"nav", "header", "footer", "aside"}
CONTENT_TAGS = {"main", "article"}

MAX_LINK_DENSITY = 0.33  # jusText default link-density ceiling
MIN_CONTENT_CHARS = 20  # short stand-alone blocks are chrome unless
#                         inside a semantic content container


HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}


@dataclass
class Block:
    """One DOM text block with the densities the classifier scores."""

    text: str
    link_chars: int
    in_content: bool  # under <main>/<article>
    in_boiler: bool  # under <nav>/<header>/<footer>/<aside>
    is_heading: bool = False  # any text collected inside <h1>..<h6>

    @property
    def link_density(self) -> float:
        n = len(self.text.strip())
        return (self.link_chars / n) if n else 1.0

    @property
    def is_content(self) -> bool:
        if self.in_boiler:
            return False
        if self.link_density > MAX_LINK_DENSITY:
            return False
        if self.in_content:
            return len(self.text.strip()) > 0
        return len(self.text.strip()) >= MIN_CONTENT_CHARS


@dataclass
class _DomState(HTMLParser):
    blocks: list[Block] = field(default_factory=list)
    _buf: list[str] = field(default_factory=list)
    _link_chars: int = 0
    _depth_drop: int = 0
    _depth_link: int = 0
    _depth_content: int = 0
    _depth_boiler: int = 0
    _depth_heading: int = 0
    _saw_heading: bool = False

    def __post_init__(self) -> None:
        HTMLParser.__init__(self, convert_charrefs=True)

    def _flush(self) -> None:
        text = "".join(self._buf)
        if text.strip():
            self.blocks.append(
                Block(
                    " ".join(text.split()),
                    self._link_chars,
                    self._depth_content > 0,
                    self._depth_boiler > 0,
                    self._saw_heading,
                )
            )
        self._buf.clear()
        self._link_chars = 0
        self._saw_heading = False

    def handle_starttag(self, tag, attrs):
        if tag in DROP_TAGS:
            self._depth_drop += 1
        if tag == "a":
            self._depth_link += 1
        if tag in BLOCK_TAGS:  # includes h1..h6
            self._flush()
        if tag in HEADING_TAGS:
            self._depth_heading += 1
        if tag in CONTENT_TAGS:
            self._depth_content += 1
        if tag in BOILER_TAGS:
            self._depth_boiler += 1

    def handle_endtag(self, tag):
        if tag in DROP_TAGS and self._depth_drop:
            self._depth_drop -= 1
        if tag == "a" and self._depth_link:
            self._depth_link -= 1
        if tag in BLOCK_TAGS:  # includes h1..h6
            self._flush()
        if tag in HEADING_TAGS and self._depth_heading:
            self._depth_heading -= 1
        if tag in CONTENT_TAGS and self._depth_content:
            self._depth_content -= 1
        if tag in BOILER_TAGS and self._depth_boiler:
            self._depth_boiler -= 1

    def handle_data(self, data):
        if self._depth_drop:
            return
        self._buf.append(data)
        if self._depth_heading:
            self._saw_heading = True
        if self._depth_link:
            self._link_chars += len(data.strip())


def dom_blocks(html: str) -> list[Block]:
    """Parse HTML into scored text blocks (the DOM-heuristic unit)."""
    p = _DomState()
    p.feed(html)
    p.close()
    p._flush()
    return p.blocks


def strip_boilerplate(html: str) -> str:
    """Main content of an HTML document: content blocks joined by \\n."""
    return "\n".join(b.text for b in dom_blocks(html) if b.is_content)


def boilerplate_stats(html: str) -> tuple[int, int, int]:
    """(content_chars, boiler_chars, n_blocks) — per-doc QA counters."""
    blocks = dom_blocks(html)
    content = sum(len(b.text) for b in blocks if b.is_content)
    boiler = sum(len(b.text) for b in blocks if not b.is_content)
    return content, boiler, len(blocks)


# ---------------------------------------------------------------------------
# jusText (Pomikálek 2011, "Removing boilerplate and duplicate content
# from web corpora", PhD thesis, Masaryk U.; published reference
# implementation defaults).  Two passes: a context-free classification
# of each block into good/bad/short/neargood by link density, copyright
# marks, length and stopword density; then a context-sensitive revision
# where short/neargood blocks take their final label from their nearest
# classified neighbours (revised in place, in document order, exactly
# like the published implementation — earlier revisions are visible to
# later blocks on the prev side only).
# ---------------------------------------------------------------------------

JT_LENGTH_LOW = 70
JT_LENGTH_HIGH = 200
JT_STOPWORDS_LOW = 0.30
JT_STOPWORDS_HIGH = 0.32
JT_MAX_LINK_DENSITY = 0.2


def justext_classify(
    block: Block,
    stoplist: frozenset[str] | set[str],
    length_low: int = JT_LENGTH_LOW,
    length_high: int = JT_LENGTH_HIGH,
    stopwords_low: float = JT_STOPWORDS_LOW,
    stopwords_high: float = JT_STOPWORDS_HIGH,
    max_link_density: float = JT_MAX_LINK_DENSITY,
) -> str:
    """Context-free block class: good / bad / short / neargood."""
    text = block.text.strip()
    if block.link_density > max_link_density:
        return "bad"
    # the parser decodes &copy; to U+00A9 (convert_charrefs), so the
    # single code-point test covers the published raw-entity check too
    if "\xa9" in text:
        return "bad"
    if len(text) < length_low:
        return "bad" if block.link_chars > 0 else "short"
    words = text.split()
    sd = sum(w in stoplist for w in words) / max(len(words), 1)
    if sd >= stopwords_high:
        return "good" if len(text) > length_high else "neargood"
    if sd >= stopwords_low:
        return "neargood"
    return "bad"


def _neighbour(classes: list[str], i: int, step: int, ignore_neargood: bool) -> str:
    j = i + step
    while 0 <= j < len(classes):
        c = classes[j]
        if c in ("good", "bad") or (c == "neargood" and not ignore_neargood):
            return c
        j += step
    return "bad"  # document edges count as boilerplate


MAX_HEADING_DISTANCE = 200


def justext_revise(
    classes: list[str],
    texts: list[str] | None = None,
    headings: list[bool] | None = None,
) -> list[str]:
    """Context-sensitive pass, revised in place in document order.

    When heading flags are supplied, the published heading promotion
    runs first: a short heading with a good block within
    MAX_HEADING_DISTANCE chars below it becomes neargood (so the main
    loop keeps the headline above its article)."""
    cls = list(classes)
    if headings is not None and texts is not None:
        for i in range(len(cls)):
            if not (headings[i] and cls[i] == "short"):
                continue
            dist = 0
            for j in range(i + 1, len(cls)):
                if dist > MAX_HEADING_DISTANCE:
                    break
                if cls[j] == "good":
                    cls[i] = "neargood"
                    break
                dist += len(texts[j])
    for i in range(len(cls)):
        c = cls[i]
        if c == "short":
            prev = _neighbour(cls, i, -1, ignore_neargood=True)
            nxt = _neighbour(cls, i, +1, ignore_neargood=True)
            if prev == "good" and nxt == "good":
                cls[i] = "good"
            elif prev == "bad" and nxt == "bad":
                cls[i] = "bad"
            elif (
                prev == "bad"
                and _neighbour(cls, i, -1, ignore_neargood=False) == "neargood"
            ) or (
                nxt == "bad"
                and _neighbour(cls, i, +1, ignore_neargood=False) == "neargood"
            ):
                cls[i] = "good"
            else:
                cls[i] = "bad"
        elif c == "neargood":
            prev = _neighbour(cls, i, -1, ignore_neargood=True)
            nxt = _neighbour(cls, i, +1, ignore_neargood=True)
            cls[i] = "bad" if (prev, nxt) == ("bad", "bad") else "good"
    return cls


def justext_blocks(
    html: str, stoplist: frozenset[str] | set[str], **params
) -> list[tuple[str, str, str]]:
    """[(text, ctx_free_class, final_class)] for every DOM block."""
    blocks = dom_blocks(html)
    ctx = [justext_classify(b, stoplist, **params) for b in blocks]
    final = justext_revise(
        ctx,
        texts=[b.text for b in blocks],
        headings=[b.is_heading for b in blocks],
    )
    return [(b.text, c, f) for b, c, f in zip(blocks, ctx, final)]


def justext_extract(
    html: str, stoplist: frozenset[str] | set[str], **params
) -> str:
    """Main content: final-good blocks joined by newline."""
    return "\n".join(
        t for t, _c, f in justext_blocks(html, stoplist, **params)
        if f == "good"
    )
