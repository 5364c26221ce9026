"""P3 — HTML main-content extraction (SURVEY.md §2.2).

This is the A-axis generalization mandated by BASELINE.json `north_star`: an
incremental DOM tokenizer + text-density / link-density boilerplate scoring +
block-level main-content selection (boilerpipe / readability family of heuristics —
Kohlschütter et al., "Boilerplate Detection using Shallow Text Features", WSDM 2010).

Not present in the reference (janet handles PDFs); the *shape* of the output mirrors
the reference's span concept (apps/search/src/types/Match.ts:9-19 — character offsets
into extracted text): each kept block contributes a span (start, end, kind=tag) into
the final text, computed in the same pass that builds the text (SURVEY.md §7.4).

Pinned byte-level semantics (golden-tested):
  * within a block, runs of whitespace collapse to a single space, then strip;
  * entities are decoded (html.unescape) before collapsing;
  * kept blocks join with "\\n\\n" (the reference's OCR page joiner,
    apps/legacy/src/services/ocr.ts:60, adopted as THE document joiner for multi-part
    text in this engine);
  * a block is *content* iff len(text) >= MIN_CONTENT_CHARS and
    link_density <= MAX_LINK_DENSITY;
  * an h1..h6 block with zero link chars is kept iff the next kept block follows it
    immediately (headings ride along with their section).

The tokenizer is hand-rolled (no lxml/bs4 in this sandbox — SURVEY.md §7.0): a single
forward scan producing text blocks delimited by block-level tags, skipping comments /
script / style / CDATA, tracking anchor depth to count link characters.
"""

from __future__ import annotations

import html as _htmlmod
import re

MIN_CONTENT_CHARS = 60
MAX_LINK_DENSITY = 0.33

BLOCK_TAGS = frozenset(
    """p div article section header footer nav aside main h1 h2 h3 h4 h5 h6 li ul ol
    table thead tbody tr td th blockquote pre br hr figure figcaption dl dt dd form
    fieldset address center html head body title""".split()
)
HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
RAWTEXT_TAGS = frozenset({"script", "style", "noscript", "template", "textarea", "svg"})

_WS_RE = re.compile(r"\s+")
_TAGNAME_RE = re.compile(r"[a-zA-Z][a-zA-Z0-9:-]*")
# case-insensitive close-tag finders for rawtext elements — compiled once; a
# naive html_str.lower().find() would copy the WHOLE document per <script> tag
_RAWTEXT_CLOSE_RE = {t: re.compile("</" + t, re.IGNORECASE) for t in
                     ("script", "style", "noscript", "template", "textarea", "svg")}


class Block:
    __slots__ = ("tag", "text", "link_chars")

    def __init__(self, tag: str, text: str, link_chars: int):
        self.tag = tag
        self.text = text
        self.link_chars = link_chars

    @property
    def link_density(self) -> float:
        return self.link_chars / len(self.text) if self.text else 0.0


def _find_tag_end(s: str, i: int) -> int:
    """Index just past the '>' closing the tag starting at s[i]=='<', honoring
    quoted attribute values. Returns -1 if unterminated.

    Fast path (C-speed find + substring scan): if the span up to the first '>'
    holds no quote char, that '>' closes the tag — identical semantics, ~2×
    tokenizer throughput vs the per-char loop (the loop remains as the slow
    path for quoted attributes containing '>')."""
    gt = s.find(">", i + 1)
    if gt == -1:
        return -1
    seg = s[i + 1:gt]
    if '"' not in seg and "'" not in seg:
        return gt + 1
    n = len(s)
    j = i + 1
    quote = ""
    while j < n:
        c = s[j]
        if quote:
            if c == quote:
                quote = ""
        elif c in "\"'":
            quote = c
        elif c == ">":
            return j + 1
        j += 1
    return -1


def tokenize_blocks(html_str: str) -> list[Block]:
    """Single forward scan → list of text blocks with per-block link-char counts."""
    blocks: list[Block] = []
    buf: list[str] = []  # raw text fragments of the current block
    buf_link = 0
    cur_tag = "div"  # block-level tag that opened the current block
    anchor_depth = 0
    i, n = 0, len(html_str)

    def flush(next_tag: str) -> None:
        nonlocal buf, buf_link, cur_tag
        if buf:
            raw = "".join(buf)
            text = _WS_RE.sub(" ", raw).strip()
            if text:
                # link char count scales with the collapsed text proportionally to
                # the raw counts (exact per-char tracking through unescape+collapse
                # is not needed — density is a ratio)
                link = min(buf_link, len(text))
                blocks.append(Block(cur_tag, text, link))
        buf = []
        buf_link = 0
        cur_tag = next_tag

    while i < n:
        lt = html_str.find("<", i)
        if lt == -1:
            _append_text(buf, html_str[i:], anchor_depth)
            if anchor_depth:
                buf_link += _text_len(html_str[i:])
            break
        if lt > i:
            frag = html_str[i:lt]
            _append_text(buf, frag, anchor_depth)
            if anchor_depth:
                buf_link += _text_len(frag)
        # at a '<'
        if html_str.startswith("<!--", lt):
            end = html_str.find("-->", lt + 4)
            i = n if end == -1 else end + 3
            continue
        if html_str.startswith("<![CDATA[", lt):
            end = html_str.find("]]>", lt + 9)
            i = n if end == -1 else end + 3
            continue
        if lt + 1 < n and html_str[lt + 1] in "!?":
            end = html_str.find(">", lt + 1)
            i = n if end == -1 else end + 1
            continue
        closing = lt + 1 < n and html_str[lt + 1] == "/"
        m = _TAGNAME_RE.match(html_str, lt + (2 if closing else 1))
        if not m:
            # literal '<' in text
            _append_text(buf, "<", anchor_depth)
            if anchor_depth:
                buf_link += 1
            i = lt + 1
            continue
        tag = m.group(0).lower()
        end = _find_tag_end(html_str, lt)
        if end == -1:
            break  # unterminated tag: drop the tail
        i = end
        if not closing and tag in RAWTEXT_TAGS:
            cm = _RAWTEXT_CLOSE_RE[tag].search(html_str, i)
            if cm is None:
                break
            i = _find_tag_end(html_str, cm.start())
            if i == -1:
                break
            continue
        if tag == "a":
            if closing:
                anchor_depth = max(0, anchor_depth - 1)
            else:
                anchor_depth += 1
            continue
        if tag in BLOCK_TAGS:
            flush(tag if not closing else "div")
    flush("div")
    return blocks


def _append_text(buf: list[str], frag: str, anchor_depth: int) -> None:
    if frag:
        buf.append(_htmlmod.unescape(frag))


def _text_len(frag: str) -> int:
    return len(_WS_RE.sub(" ", _htmlmod.unescape(frag)).strip())


def select_main(blocks: list[Block]) -> list[int]:
    """Indices of kept blocks: content blocks by density thresholds, plus headings
    immediately preceding a kept block (chained, so stacked headings survive)."""
    keep = [
        bool(b.text)
        and len(b.text) >= MIN_CONTENT_CHARS
        and b.link_density <= MAX_LINK_DENSITY
        and b.tag not in HEADING_TAGS
        for b in blocks
    ]
    for idx in range(len(blocks) - 1, -1, -1):
        b = blocks[idx]
        if b.tag in HEADING_TAGS and b.link_chars == 0 and b.text:
            if idx + 1 < len(blocks) and keep[idx + 1]:
                keep[idx] = True
    return [i for i, k in enumerate(keep) if k]


def extract_html(payload: bytes) -> tuple[str, list[dict]]:
    """binary html → (main text, spans). Span: {page, start, end, kind} with
    page=block ordinal, offsets into the returned text, kind=originating tag."""
    html_str = payload.decode("utf-8", errors="replace")
    blocks = tokenize_blocks(html_str)
    kept = select_main(blocks)
    parts: list[str] = []
    spans: list[dict] = []
    pos = 0
    for ordinal, idx in enumerate(kept):
        b = blocks[idx]
        if parts:
            pos += 2  # the "\n\n" joiner
        spans.append(
            {"page": ordinal, "start": pos, "end": pos + len(b.text), "kind": b.tag}
        )
        parts.append(b.text)
        pos += len(b.text)
    return "\n\n".join(parts), spans
