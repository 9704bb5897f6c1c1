"""Display-width computation (reference parity: internal/utils/runewidth.go).

Implements the reference's *bespoke* width tables — NOT a wholesale
``unicodedata.east_asian_width`` lookup — because the reference pins
behaviors that differ from UAX#11 defaults (emoji blocks = 2, halfwidth
katakana = 1; see runewidth_test.go:5-60 for the contract ported into
tests/test_runewidth.py).

Reference spec: runewidth.go:12-44 (RuneWidth), :47-88 (range tables),
:91-97 (StringWidth).
"""

from __future__ import annotations

import unicodedata

# Wide (2-column) ranges — runewidth.go:47-68
_WIDE_RANGES: tuple[tuple[int, int], ...] = (
    (0x1F300, 0x1F5FF),  # Miscellaneous Symbols and Pictographs
    (0x1F600, 0x1F64F),  # Emoticons
    (0x1F680, 0x1F6FF),  # Transport and Map Symbols
    (0x1F700, 0x1F77F),  # Alchemical Symbols
    (0x1F780, 0x1F7FF),  # Geometric Shapes Extended
    (0x1F800, 0x1F8FF),  # Supplemental Arrows-C
    (0x1F900, 0x1F9FF),  # Supplemental Symbols and Pictographs
    (0x20000, 0x2A6DF),  # CJK Extension B and beyond
    (0x3000, 0x303F),    # CJK Symbols and Punctuation
    (0x3040, 0x309F),    # Hiragana
    (0x30A0, 0x30FF),    # Katakana
    (0x3400, 0x4DBF),    # CJK Extension A
    (0x4E00, 0x9FFF),    # CJK Unified Ideographs
    (0xAC00, 0xD7AF),    # Hangul Syllables
    (0xFF01, 0xFF60),    # Fullwidth ASCII variants
    (0xFFE0, 0xFFE6),    # Fullwidth symbols
)

# Explicit half-width ranges checked before the wide ranges — runewidth.go:71-73
_HALFWIDTH_RANGES: tuple[tuple[int, int], ...] = ((0xFF61, 0xFFDC),)

_ZERO_WIDTH = frozenset((0x200B, 0x200C, 0x200D, 0xFEFF))

# Combining-mark categories (Go: unicode.Mn, unicode.Me, unicode.Mc)
_COMBINING_CATS = frozenset(("Mn", "Me", "Mc"))


def rune_width(ch: str) -> int:
    """Display width of a single character: 0, 1, or 2. runewidth.go:12-44."""
    cp = ord(ch)
    if cp < 32 or cp == 127:
        return 0
    if cp < 127:
        return 1
    if cp in _ZERO_WIDTH:
        return 0
    if unicodedata.category(ch) in _COMBINING_CATS:
        return 0
    if _is_wide(cp):
        return 2
    return 1


def _is_wide(cp: int) -> bool:
    for lo, hi in _HALFWIDTH_RANGES:
        if lo <= cp <= hi:
            return False
    for lo, hi in _WIDE_RANGES:
        if lo <= cp <= hi:
            return True
    return False


def string_width(s: str) -> int:
    """Sum of rune widths. runewidth.go:91-97."""
    if s.isascii() and s.isprintable():
        return len(s)  # printable ASCII is uniformly width 1
    return sum(rune_width(ch) for ch in s)
