"""Ported contracts: ipynb.go:61-109, ipynb_test.go:26-80, :220-250."""

import json

import pytest

from marky_spark.kernels.base import ConvertError, segments_text
from marky_spark.kernels.ipynbk import convert_ipynb


def nb(cells, metadata=None):
    return json.dumps(
        {
            "nbformat": 4,
            "nbformat_minor": 5,
            "cells": cells,
            "metadata": metadata or {},
        }
    )


def md_of(text: str) -> str:
    return segments_text(convert_ipynb(text))


def test_markdown_and_code_cells():
    text = nb(
        [
            {"cell_type": "markdown", "source": ["# My Notebook\n", "\n", "Intro."]},
            {"cell_type": "code", "source": ["print('hi')\n", "x = 1"]},
        ]
    )
    got = md_of(text)
    assert got == "# My Notebook\n\nIntro.\n\n```python\nprint('hi')\nx = 1\n```"


def test_title_prepended_when_missing():
    # title from metadata used iff doc doesn't start with '# '
    text = nb(
        [{"cell_type": "code", "source": ["1+1"]}],
        metadata={"title": "Meta Title"},
    )
    assert md_of(text) == "# Meta Title\n\n```python\n1+1\n```"


def test_title_from_first_heading_not_duplicated():
    text = nb([{"cell_type": "markdown", "source": ["# Top\n", "body"]}])
    assert md_of(text) == "# Top\nbody"


def test_title_found_in_later_cell_prepended():
    # heading appears in a later markdown cell (doc doesn't *start* with it)
    text = nb(
        [
            {"cell_type": "markdown", "source": ["intro text"]},
            {"cell_type": "markdown", "source": ["# Later Title\nmore"]},
        ]
    )
    assert md_of(text) == "# Later Title\n\nintro text\n\n# Later Title\nmore"


def test_raw_cell_plain_fence():
    text = nb([{"cell_type": "raw", "source": ["raw stuff"]}])
    assert md_of(text) == "```\nraw stuff\n```"


def test_blank_code_cells_dropped():
    text = nb(
        [
            {"cell_type": "code", "source": ["  \n"]},
            {"cell_type": "code", "source": ["x"]},
            {"cell_type": "raw", "source": [""]},
        ]
    )
    assert md_of(text) == "```python\nx\n```"


def test_empty_markdown_cell_participates_in_join():
    # reference appends markdown cells unconditionally (ipynb.go:70-72)
    text = nb(
        [
            {"cell_type": "markdown", "source": []},
            {"cell_type": "markdown", "source": ["tail"]},
        ]
    )
    assert md_of(text) == "\n\ntail"


def test_source_as_single_string():
    text = nb([{"cell_type": "markdown", "source": "# S\nbody"}])
    assert md_of(text) == "# S\nbody"


def test_invalid_json_errors():
    with pytest.raises(ConvertError):
        convert_ipynb("{not json")


def test_non_object_errors():
    with pytest.raises(ConvertError):
        convert_ipynb("[1,2,3]")
