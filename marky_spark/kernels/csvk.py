"""CSV → Markdown table kernel (reference parity: internal/converters/csv.go).

Go ``encoding/csv.ReadAll`` semantics preserved (csv.go:37-51):

- RFC-4180 quoting: quoted fields, ``""`` escapes, embedded commas/newlines;
- blank lines are skipped (not empty records);
- **uniform field count enforced** — a record whose field count differs from
  the first record's is an error (csv_test.go:159-186), unlike Python's
  lenient ``csv.reader``;
- leading/trailing ``\\r`` of CRLF line endings handled.
"""

from __future__ import annotations

import csv
import io

from .base import ConvertError, Segment, md
from .mdtable import to_markdown_table


def parse_csv(text: str) -> list[list[str]]:
    """Parse with Go encoding/csv strictness. csv.go:44-46."""
    try:
        # strict=True: bare/extraneous quotes inside quoted fields error,
        # matching Go encoding/csv's ErrQuote instead of silently mangling
        reader = csv.reader(io.StringIO(text, newline=""), strict=True)
        records: list[list[str]] = []
        line_nums: list[int] = []  # physical line per record (Go's error N)
        for rec in reader:
            if rec:
                records.append(rec)
                line_nums.append(reader.line_num)
    except csv.Error as exc:
        raise ConvertError(f"unable to parse CSV: {exc}") from exc

    if not records:
        return []

    width = len(records[0])
    for i, rec in enumerate(records):
        if len(rec) != width:
            # Go: "record on line N: wrong number of fields"
            raise ConvertError(
                f"record on line {line_nums[i]}: wrong number of fields "
                f"(got {len(rec)}, want {width})"
            )
    return records


def convert_csv(text: str) -> list[Segment]:
    """csv.go:28-34 — parse then render via the uniform table renderer."""
    return [md(to_markdown_table(parse_csv(text)))]


def parse_tsv(text: str) -> list[list[str]]:
    """Tab-delimited variant with the same Go-strict uniform-width
    contract (beyond-the-reference kind: TSV is the interchange format
    data dumps actually use; quoting follows the same RFC-4180 rules
    with tab as the delimiter)."""
    try:
        reader = csv.reader(io.StringIO(text, newline=""),
                            delimiter="\t", strict=True)
        records: list[list[str]] = []
        line_nums: list[int] = []
        for rec in reader:
            if rec:
                records.append(rec)
                line_nums.append(reader.line_num)
    except csv.Error as exc:
        raise ConvertError(f"unable to parse TSV: {exc}") from exc
    if not records:
        return []
    width = len(records[0])
    for i, rec in enumerate(records):
        if len(rec) != width:
            raise ConvertError(
                f"record on line {line_nums[i]}: wrong number of fields "
                f"(got {len(rec)}, want {width})")
    return records


def convert_tsv(text: str) -> list[Segment]:
    """TSV → the same uniform pipe table the CSV kernel emits."""
    return [md(to_markdown_table(parse_tsv(text)))]
