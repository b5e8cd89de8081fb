"""HTML main-content extraction via text-density DOM heuristics.

A from-scratch boilerplate stripper in the spirit of the text-density /
link-density family (Boilerpipe, Readability, trafilatura — public
literature; see PAPERS.md). No reference analogue exists: the reference
wraps OCR providers; here the "provider" for Common-Crawl-style pages is
this kernel (BASELINE.json north_star: "HTML boilerplate stripping via
text-density DOM heuristics").

Algorithm (regex tokenizer, no external parser):
1. drop <script>/<style>/<template>/<noscript> subtrees and comments
2. segment the byte stream into text blocks at block-level tag boundaries
3. per block: text length, link-text length, tag count
4. score = content iff len >= MIN_BLOCK_CHARS and link_density <= MAX_LINK_DENSITY
5. main content = the contiguous run of content blocks (gap tolerance 1)
   with the largest total text length
"""

from __future__ import annotations

import html as _html
import re

BLOCK_TAGS = (
    "div|p|nav|header|footer|aside|main|section|article|ul|ol|li|table|tr|td|th|"
    "h1|h2|h3|h4|h5|h6|blockquote|pre|br|hr|form|fieldset"
)

_RE_STRIP = re.compile(
    r"<(script|style|template|noscript)\b[^>]*>.*?</\1\s*>|<!--.*?-->",
    re.IGNORECASE | re.DOTALL,
)
_RE_BLOCK_SPLIT = re.compile(rf"<\s*/?\s*(?:{BLOCK_TAGS})\b[^>]*>", re.IGNORECASE)
_RE_A = re.compile(r"<\s*a\b[^>]*>(.*?)<\s*/\s*a\s*>", re.IGNORECASE | re.DOTALL)
_RE_TAG = re.compile(r"<[^>]+>")
_RE_WS = re.compile(r"\s+")

MIN_BLOCK_CHARS = 25
MAX_LINK_DENSITY = 0.33
GAP_TOLERANCE = 1


def _block_stats(segment: str) -> tuple[str, int, int]:
    """Returns (clean_text, n_chars, n_link_chars) for one inter-tag segment.

    Fast paths: after the block-tag split most segments are plain text
    (no '<', no '&'), so the tag/anchor regexes and entity unescape are
    skipped unless their trigger characters appear.
    ``' '.join(s.split())`` is the whitespace normalization (identical
    result to the regex collapse + strip, measurably faster)."""
    if "<" not in segment:
        if "&" in segment:
            segment = _html.unescape(segment)  # before ws-normalize (&nbsp; -> space)
        text = " ".join(segment.split())
        return text, len(text), 0

    link_chars = 0
    for m in _RE_A.finditer(segment):
        inner = _RE_TAG.sub(" ", m.group(1))
        link_chars += len(" ".join(inner.split()))
    no_tags = _RE_TAG.sub(" ", segment)
    if "&" in no_tags:
        no_tags = _html.unescape(no_tags)
    text = " ".join(no_tags.split())
    return text, len(text), link_chars


def extract_main_text(html_bytes: bytes | str) -> str:
    """Main content of an HTML page as a single-space-joined token string."""
    if isinstance(html_bytes, (bytes, bytearray)):
        raw = html_bytes.decode("utf-8", errors="replace")
    else:
        raw = html_bytes
    raw = _RE_STRIP.sub(" ", raw)

    blocks: list[tuple[str, int, float]] = []  # (text, n_chars, link_density)
    for segment in _RE_BLOCK_SPLIT.split(raw):
        if not segment or segment.isspace():
            continue
        text, n_chars, link_chars = _block_stats(segment)
        if n_chars == 0:
            continue
        blocks.append((text, n_chars, link_chars / n_chars))

    if not blocks:
        return ""

    content = [
        n_chars >= MIN_BLOCK_CHARS and ld <= MAX_LINK_DENSITY
        for (_, n_chars, ld) in blocks
    ]

    # best contiguous run of content blocks, tolerating GAP_TOLERANCE
    # non-content blocks inside a run
    best_score, best_range = 0, (0, 0)
    i = 0
    nb = len(blocks)
    while i < nb:
        if not content[i]:
            i += 1
            continue
        j = i
        score = 0
        gap = 0
        last_content = i
        while j < nb:
            if content[j]:
                score += blocks[j][1]
                gap = 0
                last_content = j
            else:
                gap += 1
                if gap > GAP_TOLERANCE:
                    break
            j += 1
        if score > best_score:
            best_score = score
            best_range = (i, last_content + 1)
        i = last_content + 1

    if best_score == 0:
        return ""
    parts = [
        blocks[k][0]
        for k in range(best_range[0], best_range[1])
        if content[k]
    ]
    return " ".join(parts)
