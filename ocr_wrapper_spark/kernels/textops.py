"""Text scalar kernels (SURVEY.md §2.7 C6/C7, §2.4 A6)."""

from __future__ import annotations

import re

# Arabic codepoint ranges (reference utils.py:22-36)
ARABIC_RANGES = (
    (0x0600, 0x06FF),  # Arabic
    (0x0750, 0x077F),  # Arabic Supplement
    (0x08A0, 0x08FF),  # Arabic Extended-A
    (0xFB50, 0xFDFF),  # Arabic Presentation Forms-A
    (0xFE70, 0xFEFF),  # Arabic Presentation Forms-B
)

# same ranges as a regex char class, for the JVM-side F.regexp_like twin
ARABIC_REGEX = "[؀-ۿݐ-ݿࢠ-ࣿﭐ-﷿ﹰ-﻿]"

_ARABIC_RE = re.compile(ARABIC_REGEX)
_NONDIGIT_SPLIT = re.compile(r"(\D+)")


def has_arabic_text(s: str) -> bool:
    """Codepoint-range membership test (reference utils.py:22-36)."""
    return bool(_ARABIC_RE.search(s))


def flip_number_blocks(input_string: str) -> str:
    """Reverse the order of digit runs, keep non-digit separators in place
    (reference utils.py:39-59; applied for lang=='ar' without Arabic chars,
    google_ocr.py:123-136)."""
    parts = _NONDIGIT_SPLIT.split(input_string)
    digit_parts = [part for part in parts if part.isdigit()]
    reversed_digits = digit_parts[::-1]
    result = []
    digit_index = 0
    for part in parts:
        if part.isdigit():
            result.append(reversed_digits[digit_index])
            digit_index += 1
        else:
            result.append(part)
    return "".join(result)


def discretize_angle_to_90_deg(angle: float) -> int:
    """((angle+45)//90*90)%360 (reference azure.py:19-21)."""
    return int(((angle + 45) // 90 * 90) % 360)


def closest_90_degree_distance(angle: float) -> float:
    """Signed distance to the nearest multiple of 90 deg; negative below,
    positive above (reference tilt_correction.py:28-37)."""
    nearest_multiple_of_90 = round(angle / 90) * 90
    return angle - nearest_multiple_of_90
