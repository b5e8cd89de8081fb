"""Deterministic word-layout engine.

Maps a token sequence onto synthetic page geometry (pixel-space word
boxes). Used by

* the HTML branch of the extractor — extracted main-content tokens get
  a synthesized layout so that downstream geometry operators (normalize,
  reading order, assembly) run the exact same path as the PDF branch;
* the synthetic pages generator — PDF-like payloads embed these boxes.

The geometry is intentionally simple (monospace flow layout) but fully
deterministic: same tokens -> same boxes, bit for bit.
"""

from __future__ import annotations

import numpy as np

PAGE_WIDTH = 1224
PAGE_HEIGHT = 1584
MARGIN = 60
CHAR_W = 7.0
FONT_H = 14.0
LINE_H = 22.0


def layout_words(
    words: list[str],
    rtl: bool = False,
    tilt_fraction: float = 0.0,
    page_width: int = PAGE_WIDTH,
) -> tuple[np.ndarray, int, int]:
    """Flow-layout words onto a page; returns (coords_px (n,8), width, height).

    Boxes are emitted in reading order with orientation-preserving corners
    (TL is the start-of-word corner in the flow direction). ``tilt_fraction``
    shears line y by ``-tilt * x_center`` so the reading-order kernel's tilt
    scan (order.py) recovers the angle exactly when the fraction lies on its
    scan grid.
    """
    n = len(words)
    if n == 0:
        return np.zeros((0, 8), dtype=np.float64), page_width, PAGE_HEIGHT

    usable = page_width - 2 * MARGIN
    xs0 = np.empty(n, dtype=np.float64)
    ys0 = np.empty(n, dtype=np.float64)
    lens = np.fromiter(map(len, words), count=n, dtype=np.int64)
    widths = np.maximum(1, lens) * CHAR_W

    # greedy line wrap, vectorized per LINE instead of per word: within a
    # line the cursor positions are the exclusive prefix sums of
    # (width + CHAR_W tracking); the break is the first word whose
    # start + width exceeds `usable`. np.cumsum accumulates sequentially
    # (same op order as the old per-word loop), and the break test uses
    # the identical expression (prev_cursor + width), so the geometry is
    # bit-for-bit unchanged. ~10x fewer Python iterations (lines, not
    # words) — layout runs per document in the extraction hot path.
    ext = widths + CHAR_W
    # every word consumes >= 2*CHAR_W px (1-char word + tracking), so no
    # line holds more than usable/(2*CHAR_W) words — bounding the cumsum
    # window keeps the wrap O(n) instead of O(n * lines) (a 780k-word
    # page was 67 s with unbounded slices, 1.5 s bounded)
    max_per_line = int(usable // (2 * CHAR_W)) + 2
    start = 0
    line = -1
    while start < n:
        line += 1
        c = np.cumsum(ext[start : start + max_per_line])
        # exclusive prefix sums via shift (NOT c - ext: subtraction would
        # reassociate the float ops; the shift reproduces the old loop's
        # partial sums bit-for-bit)
        cursors = np.empty_like(c)
        cursors[0] = 0.0
        cursors[1:] = c[:-1]
        end = start + len(c)
        fits = cursors + widths[start:end] <= usable
        fits[0] = True  # the first word of a line is always placed
        bad = np.nonzero(~fits)[0]
        # when the whole window fits, the break can only be beyond the
        # window, which the per-word capacity bound rules out unless the
        # window already reaches n
        k = int(bad[0]) if bad.size else end - start
        xs0[start : start + k] = cursors[:k]
        ys0[start : start + k] = line
        start += k

    height = max(PAGE_HEIGHT, int(MARGIN * 2 + (line + 1) * LINE_H))

    if rtl:
        # mirror: first word on a line sits rightmost
        x_left = page_width - MARGIN - xs0 - widths
    else:
        x_left = MARGIN + xs0
    y_top = MARGIN + ys0 * LINE_H

    if tilt_fraction != 0.0:
        x_center = (x_left + widths / 2) - page_width / 2
        y_top = y_top - tilt_fraction * x_center

    coords = np.empty((n, 8), dtype=np.float64)
    coords[:, 0] = x_left  # TLx
    coords[:, 1] = y_top
    coords[:, 2] = x_left + widths  # TRx
    coords[:, 3] = y_top
    coords[:, 4] = x_left + widths  # BRx
    coords[:, 5] = y_top + FONT_H
    coords[:, 6] = x_left  # BLx
    coords[:, 7] = y_top + FONT_H
    if rtl:
        # orientation-preserving: TL is the start-of-word corner in flow
        # direction, so for RTL the raw quad leads with the right edge.
        coords = coords[:, [2, 3, 0, 1, 6, 7, 4, 5]]
    return coords, page_width, height


def rotate_raw_quads(coords: np.ndarray, k: int) -> np.ndarray:
    """Rotate raw normalized quads k x 90 deg CCW about the origin without
    canonicalization: (x, y) -> (y, 1 - x). Preserves vertex order, hence
    text-flow orientation (used to synthesize rotated documents)."""
    out = np.asarray(coords, dtype=np.float64).reshape(-1, 4, 2).copy()
    for _ in range(k % 4):
        x = out[:, :, 0].copy()
        out[:, :, 0] = out[:, :, 1]
        out[:, :, 1] = 1.0 - x
    return out.reshape(-1, 8)
