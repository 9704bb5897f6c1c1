"""Ported contract: /root/reference/internal/utils/runewidth_test.go:5-60."""

import pytest

from marky_spark.kernels.runewidth import rune_width, string_width


@pytest.mark.parametrize(
    ("cp", "expected"),
    [
        (0, 0),        # NUL control
        (31, 0),       # unit separator
        (127, 0),      # DEL
        (ord("A"), 1),
        (ord(" "), 1),
        (ord("~"), 1),
        (0x200B, 0),   # zero width space
        (0x200C, 0),
        (0x200D, 0),
        (0xFEFF, 0),   # BOM
        (0x0301, 0),   # combining acute
        (0x1F600, 2),  # emoji
        (0x4E2D, 2),   # 中
        (0xFF21, 2),   # fullwidth A
        (0xFF66, 1),   # halfwidth katakana wo
        (0xAC00, 2),   # hangul
        (0x3042, 2),   # hiragana あ
        (0x30A2, 2),   # katakana ア
        (0xFF9E, 1),   # halfwidth voiced sound mark
    ],
)
def test_rune_width(cp, expected):
    assert rune_width(chr(cp)) == expected


@pytest.mark.parametrize(
    ("s", "expected"),
    [
        ("Hello", 5),                    # ASCII only
        ("A中B", 4),                 # mixed ASCII and CJK
        ("A​中B", 4),           # zero width in string
        ("ÁB", 2),                 # combining mark in string
        ("\U0001F600\U0001F601", 4),     # two emojis
        ("Ａｦ", 3),             # fullwidth + halfwidth
    ],
)
def test_string_width(s, expected):
    assert string_width(s) == expected
