"""Reading-order kernel — the flagship per-document operator (SURVEY.md §2.5 O1).

Re-implements the semantics of the reference's line finder
(`_extract_properties` bbox_order.py:133-220 and `_order_boxes_fast`
bbox_order.py:223-368) as array code over the (n, 8) coordinate layout:

* per-box geometry + bidi character class vote
* global writing-direction majority vote (rtl iff #R > #L)
* x-stable-sort (reversed for rtl)
* parabola-weighted scatter-add line-gain histogram over a tilt scan of
  +-11 deg in 21 steps, squared-gain argmax picks the tilt
* neighbor-compare peak detection -> line centers; boxes assigned to the
  nearest line center; empty lines compacted

All math is float64 numpy with the same operations as the reference, so
results are bit-reproducible (SURVEY.md §7 watch-list item 1).
"""

from __future__ import annotations

from unicodedata import bidirectional

import numpy as np

from . import bbox_core as bc

DEGREE2RADIAN = 2 * np.pi / 360
# tilt scan range/steps (reference bbox_order.py:21-25)
MAX_TILT_ANGLE = 11
NB_TILT = 21
MAX_TILT_FRACTION = np.tan(MAX_TILT_ANGLE * DEGREE2RADIAN)
# the scan grid is fixed — precompute once (identical to the reference's
# per-call linspace, bbox_order.py:252)
TILT_FRACTIONS = np.linspace(-MAX_TILT_FRACTION, MAX_TILT_FRACTION, NB_TILT, dtype=float)

# bidi class -> dominance code; lowest code wins within a box
# (reference bbox_order.py:27-40)
TYPE_CODES = {"ON": 5, "ET": 4, "AN": 3, "EN": 2, "R": 1, "AL": 1, "L": 0}
_CODE_L, _CODE_R, _CODE_EN, _CODE_AN, _CODE_ET, _CODE_ON = 0, 1, 2, 3, 4, 5

# cutoff for reliable word statistics (reference bbox_order.py:194)
MIN_WORDS_FOR_STATS = 10

# fused edge-midpoint projection: coords (n,8) @ (8,4) ->
# [(TLx+BLx)/2, (TRx+BRx)/2, (TLy+TRy)/2, (BLy+BRy)/2]
_EDGE_MID = np.zeros((8, 4))
_EDGE_MID[[0, 6], 0] = 0.5  # TLx, BLx -> left
_EDGE_MID[[2, 4], 1] = 0.5  # TRx, BRx -> right
_EDGE_MID[[1, 3], 2] = 0.5  # TLy, TRy -> top
_EDGE_MID[[5, 7], 3] = 0.5  # BLy, BRy -> bottom

_char_code_cache: dict[str, int] = {}

# per-token memo: token -> (type_code, is_word, n_chars). Web-scale corpora
# repeat tokens heavily (Zipf), so this converts the per-char unicodedata
# walk into a dict hit; bounded to keep worker memory flat.
_token_cache: dict[str, tuple[int, bool, int]] = {}
_TOKEN_CACHE_MAX = 200_000


def _char_code(ch: str) -> int:
    code = _char_code_cache.get(ch)
    if code is None:
        code = TYPE_CODES.get(bidirectional(ch), _CODE_ON)
        _char_code_cache[ch] = code
    return code


def box_type(text: str) -> int:
    """Dominant bidi class of a box's text; empty text -> L
    (reference bbox_order.py:176-179)."""
    if not text:
        return _CODE_L
    return min(_char_code(c) for c in set(text))


def token_props(text: str) -> tuple[int, bool, int]:
    """(bidi type code, is_word, len) per box text, memoized.
    is_word = isalpha and len > 1 (reference bbox_order.py:184)."""
    t = text or ""
    props = _token_cache.get(t)
    if props is None:
        props = (box_type(t), t.isalpha() and len(t) > 1, len(t))
        if len(_token_cache) < _TOKEN_CACHE_MAX:
            _token_cache[t] = props
    return props


class DocumentGeometry:
    """Derived per-document values (reference DocumentProperties,
    bbox_order.py:55-73) — intermediate only, never materialized as columns."""

    __slots__ = (
        "full_width",
        "full_height",
        "half_width",
        "median_height",
        "median_char_width",
        "writing_direction",
        "is_bidirectional",
        "tilt_factor",
    )

    def __init__(self):
        self.median_height = None
        self.median_char_width = None
        self.writing_direction = "ltr"
        self.is_bidirectional = False
        self.tilt_factor = 0.0


def _median(a: np.ndarray) -> float:
    """np.median minus its dispatch overhead: same partition indices,
    same (lo + hi) / 2 even-count arithmetic, and the same NaN contract
    (np.median returns NaN when any element is NaN — hostile payloads
    can push NaN coords through clip/matmul into the heights), so the
    result stays bit-identical."""
    if np.isnan(a).any():
        return float("nan")
    n = a.size
    h = n >> 1
    if n & 1:
        return float(np.partition(a, h)[h])
    p = np.partition(a, [h - 1, h])
    return float((p[h - 1] + p[h]) / 2)


def extract_properties(
    coords: np.ndarray,
    texts: list[str],
    document_width: int,
    document_height: int,
):
    """Per-box geometry + document stats (reference bbox_order.py:133-220).

    ``coords`` must be normalized (n, 8). Returns
    (geom, order, left, right, width, x_center, top, bottom, height, y,
     int_top, int_height, types) where ``order`` is the x-stable-sorted box
    index array (reversed for rtl documents).
    """
    n = coords.shape[0]
    geom = DocumentGeometry()
    geom.full_height = max(200, document_height)
    geom.full_width = max(200, document_width)
    geom.half_width = document_width / 2

    # edge midpoints via one fused matmul: columns = (left, right, top,
    # bottom) halves -> clip -> scale (identical arithmetic to the
    # per-column chains, ~4x fewer numpy dispatches)
    g = np.clip(coords @ _EDGE_MID, 0.0, 1.0)
    left = geom.full_width * g[:, 0]
    right = geom.full_width * g[:, 1]
    width = np.maximum(1.0, right - left)
    x = (right + left) / 2
    x_center = x - geom.half_width
    top = geom.full_height * g[:, 2]
    bottom = np.maximum(top + 1, geom.full_height * g[:, 3])
    height = np.maximum(1.0, bottom - top)
    y = (top + bottom) / 2
    # int(round(.)) in the reference is banker's rounding (Python round);
    # np.rint matches round-half-to-even
    ints = np.rint(np.stack([top, bottom], axis=0)).astype(np.int64)
    int_top = ints[0]
    int_height = np.maximum(1, ints[1] - ints[0])

    props = [token_props(t) for t in texts]
    types = np.array([p[0] for p in props], dtype=np.int64)
    type_count = np.bincount(types, minlength=6)

    # word stats for the median height / char width (bbox_order.py:183-197):
    # the reference extends char_width_lst with nb_char copies of the
    # average char width per word -> np.repeat
    is_word = np.array([p[1] for p in props], dtype=bool)
    n_chars = np.array([p[2] for p in props], dtype=np.int64)
    nb_words = int(is_word.sum())
    if nb_words > MIN_WORDS_FOR_STATS:
        word_heights = height[is_word]
        word_chars = n_chars[is_word]
        avg_widths = width[is_word] / word_chars
        geom.median_height = _median(word_heights)
        geom.median_char_width = _median(np.repeat(avg_widths, word_chars))

    # writing-direction majority vote (bbox_order.py:198-208)
    geom.writing_direction = "rtl" if type_count[_CODE_R] > type_count[_CODE_L] else "ltr"
    ltr = int(type_count[_CODE_L] + type_count[_CODE_EN] + type_count[_CODE_ET])
    rtl = int(type_count[_CODE_R])
    geom.is_bidirectional = min(ltr, rtl) > 1

    # one stable sort by x frees us from per-line sorts (bbox_order.py:210-218)
    if geom.writing_direction == "rtl":
        order = np.argsort(-x, kind="stable")
    else:
        order = np.argsort(x, kind="stable")

    return geom, order, left, right, width, x_center, top, bottom, height, y, int_top, int_height, types


def order_boxes(
    coords: np.ndarray,
    texts: list[str],
    document_width: int,
    document_height: int,
) -> tuple[np.ndarray, float, np.ndarray, DocumentGeometry]:
    """Full reading-order computation.

    Returns (ordered_idx, tilt_angle_deg, line_id_per_ordered_box, geom):
    ``ordered_idx[k]`` is the original index of the k-th box in reading
    order (reference get_ordered_bboxes_idxs, bbox_order.py:371-382).
    """
    n = coords.shape[0]
    geom = DocumentGeometry()
    if n == 0:
        return np.zeros(0, dtype=np.int64), 0.0, np.zeros(0, dtype=np.int64), geom

    (geom, order, left, right, width, x_center, top, bottom, height, y, int_top, int_height, types) = (
        extract_properties(coords, texts, document_width, document_height)
    )

    # reorder per-box arrays into x-sorted order (the reference sorts box_lst)
    xs_x_center = x_center[order]
    xs_int_height = int_height[order]
    xs_int_top = int_top[order]
    xs_width = width[order]
    xs_y = y[order]

    max_tilt_pixel = int(np.ceil(MAX_TILT_FRACTION * geom.half_width))
    tilt_fraction = TILT_FRACTIONS

    # Gains are zero outside the content's y-extent, and the neighbor-compare
    # peak test can never fire on an all-zero plateau, so restricting the
    # histogram to [y_lo, y_hi] + tilt margin is output-identical to the
    # full-page scan while cutting the per-doc allocation ~4x (the page is
    # mostly empty margin). y indices below are shifted by y_lo.
    y_lo = int(xs_int_top.min())
    y_hi = int((xs_int_top + xs_int_height).max())
    y_range = (y_hi - y_lo + 1) + 2 * max_tilt_pixel + 2

    half_height = xs_int_height.astype(float) / 2
    if geom.median_height is not None:
        height_factor = np.minimum(1, xs_int_height / geom.median_height)
    else:
        height_factor = np.ones_like(xs_width)
    weight = xs_width * height_factor
    nb_y = xs_int_height + 1

    # parabola-weighted gains per y pixel of each box (bbox_order.py:271-295).
    # Flat per-pixel arrays built with repeat/arange directly — no
    # (n, max_height) rectangle or boolean-mask gathers, so memory is
    # O(sum of box heights) even when one hostile box reports a huge
    # height, and each array is one pass instead of build-mask + gather.
    px_per_box = nb_y  # steps 0..h inclusive = h+1 pixels per box
    offsets = np.cumsum(px_per_box) - px_per_box
    total_px = int(offsets[-1] + px_per_box[-1])
    # one repeat builds the box-index map; every other per-pixel array is
    # a gather through it (measured ~25% cheaper than per-array repeats
    # with identical element values, so bincount in-bin order — hence
    # bit-reproducibility — is unchanged)
    box_idx = np.repeat(np.arange(px_per_box.shape[0]), px_per_box)
    steps_flat = np.arange(total_px, dtype=float) - offsets.astype(float)[box_idx]
    w_flat = weight[box_idx]
    hh_flat = half_height[box_idx]
    parabolae = (1 - ((steps_flat - hh_flat) / np.maximum(0.5, hh_flat)) ** 2) * w_flat
    y_pos = steps_flat.astype(int) + (xs_int_top - y_lo)[box_idx]
    base = max_tilt_pixel + y_pos

    # scatter-add via one bincount per tilt over the SHARED parabola
    # weights (tiling the weights NB_TILT-wide for a single flattened
    # bincount doubled the memory traffic for no fewer element ops; the
    # per-tilt element order equals the flattened row-major order, so
    # in-bin summation — hence bit-reproducibility — is unchanged).
    # The tilt shift int(tf * x_center) is constant for every pixel of a
    # box, so compute it per (tilt, box) and expand with repeat — same
    # truncation, ~height-times fewer multiplies than the per-pixel form.
    shifts = (tilt_fraction[:, None] * xs_x_center[None, :]).astype(int)
    # pages narrower than the reference's 200px floor make |x_center|
    # exceed half_width (ref bbox_order.py:147-149 floors full_width but
    # not half_width), so the tilt shift can leave [0, y_range). The
    # reference's np.add.at silently WRAPS those negative indices into
    # the other end of the histogram; clipping to the edge bins instead
    # is a no-op for every in-range page (byte-identity preserved) and
    # keeps hostile tiny-page boxes from corrupting/crashing the scan.
    # The O(n) bound check below proves the no-op case so the in-range
    # path never pays the full-size clip write.
    needs_clip = (int(base.min()) + int(shifts.min()) < 0) or (
        int(base.max()) + int(shifts.max()) > y_range - 1
    )
    all_gains = np.empty((NB_TILT, y_range))
    for t in range(NB_TILT):
        idx = base + shifts[t][box_idx]
        if needs_clip:
            np.clip(idx, 0, y_range - 1, out=idx)
        all_gains[t] = np.bincount(idx, weights=parabolae, minlength=y_range)

    # squared-gain argmax picks the best tilt (bbox_order.py:296-309)
    best_tilt = int(np.argmax((all_gains**2).sum(axis=1)))
    tilt_factor = float(tilt_fraction[best_tilt])
    best_tilt_angle = float(np.arctan(tilt_factor) / DEGREE2RADIAN)
    geom.tilt_factor = tilt_factor

    tilted_y = xs_y + xs_x_center * tilt_factor

    # neighbor-compare peak detection (bbox_order.py:319-337)
    best_gains = all_gains[best_tilt, :]
    line_center_bool = (best_gains[:-2] <= best_gains[1:-1]) & (best_gains[2:] < best_gains[1:-1])
    index = np.arange(1, len(best_gains) - 1, dtype=int)
    line_center_y = index[line_center_bool]
    if line_center_y.shape[0] == 0:
        line_center_y = np.zeros(1, dtype=int)
    line_center_y = line_center_y - max_tilt_pixel + y_lo

    # nearest line center per box (bbox_order.py:338-342). line_center_y
    # is ascending, so searchsorted + neighbor compare replaces the
    # (n_boxes, n_lines) distance matrix — that matrix is O(n^2/words-
    # per-line) and allocates 147 GiB on a 780k-word page; this is
    # O(n log L) with O(n) memory. Equidistant ties resolve to the lower
    # line index, exactly like argmin's first-minimum rule.
    pos = np.searchsorted(line_center_y, tilted_y)
    left = np.clip(pos - 1, 0, line_center_y.shape[0] - 1)
    right = np.clip(pos, 0, line_center_y.shape[0] - 1)
    dist_left = np.abs(tilted_y - line_center_y[left])
    dist_right = np.abs(tilted_y - line_center_y[right])
    box_line = np.where(dist_left <= dist_right, left, right)

    # compact away empty lines (bbox_order.py:343-358)
    used_lines = np.unique(box_line)
    if used_lines.shape[0] != line_center_y.shape[0]:
        sorted_lines = np.sort(used_lines)
        line_index = np.arange(sorted_lines.shape[0], dtype=int)
        old2new = np.arange(sorted_lines[-1] + 1, dtype=int)
        old2new[sorted_lines[line_index]] = line_index
        box_line = old2new[box_line]

    # boxes are already x-ordered; a stable sort by line id yields the
    # line-by-line reading order (bbox_order.py:359-364)
    within = np.argsort(box_line, kind="stable")
    ordered_idx = order[within]
    line_ids = box_line[within]
    return ordered_idx.astype(np.int64), best_tilt_angle, line_ids.astype(np.int64), geom


def reading_order_indices(
    coords: np.ndarray, texts: list[str], document_width: int, document_height: int
) -> np.ndarray:
    """Reference get_ordered_bboxes_idxs equivalent (bbox_order.py:371-382)."""
    idx, _, _, _ = order_boxes(coords, texts, document_width, document_height)
    return idx


def assemble_text(texts_in_order: list[str]) -> str:
    """The byte-identity column: space-joined ordered span texts
    (reference ocr_wrapper.py:283-289 / tests/test_googleocr.py:56-57)."""
    return " ".join(texts_in_order)
