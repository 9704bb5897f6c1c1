"""Table-driven CLI/MCP conformance sweep vs the reference main paths.

Mirrors the reference's observable contracts:
- cmd/marky/main.go:23-25  missing input → error, exit 1
- cmd/marky/main.go:28-31  conversion failure → error, exit 1
- cmd/marky/main.go:33-36  default output 'console' → markdown printed
- cmd/marky/main.go:38-41  -o path → os.WriteFile(..., 0o644) + notice
- marky-mcp/main.go:44-46  missing 'input' → isError tool result
- marky-mcp/main.go:50     output default/'console' → NO file write
- marky-mcp/main.go:57-63  output=path → file written, markdown text is
                           STILL the tool result (echo semantics)
"""

import os
import stat

import pytest

from marky_spark.cli import main as cli_main
from marky_spark.mcp_server import handle_tool_call

REF = "/root/reference/test_files"


@pytest.fixture()
def sample_csv(tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,2\n")
    return str(p)


CLI_CASES = [
    # (argv builder, expected exit code, stderr fragment or None)
    (lambda d, csv: [str(d / "missing.csv")], 1, "does not exist"),
    (lambda d, csv: [csv], 0, None),
    (lambda d, csv: [csv, "-o", str(d / "out.md")], 0, None),
    # uneven CSV rows are a conversion error (csv.go strict reader)
    (lambda d, csv: [_write(d / "bad.csv", "a,b,c\nd,e")], 1, None),
    # unknown/undetectable kind → 'no converter found'
    (lambda d, csv: [_write(d / "blob.xyz", "\x00\x01binary-ish")], 1,
     "no converter"),
]


def _write(path, text):
    path.write_text(text)
    return str(path)


@pytest.mark.parametrize("case", range(len(CLI_CASES)))
def test_cli_exit_codes(case, tmp_path, sample_csv, capsys):
    argv_fn, want_rc, stderr_frag = CLI_CASES[case]
    rc = cli_main(argv_fn(tmp_path, sample_csv))
    captured = capsys.readouterr()
    assert rc == want_rc
    if stderr_frag:
        assert stderr_frag in captured.err


def test_cli_console_prints_markdown(sample_csv, capsys):
    assert cli_main([sample_csv]) == 0
    out = capsys.readouterr().out
    assert "| a | b |" in out and "| 1 | 2 |" in out


def test_cli_output_file_mode_0644(tmp_path, sample_csv, capsys):
    """-o writes with the reference's os.WriteFile mode 0644 (umask applies
    in Go too, so pin under a known umask) and prints the written-to notice
    (cmd/marky/main.go:41)."""
    out = tmp_path / "out.md"
    old_umask = os.umask(0o022)
    try:
        assert cli_main([sample_csv, "-o", str(out)]) == 0
    finally:
        os.umask(old_umask)
    assert "| a | b |" in out.read_text()
    assert stat.S_IMODE(os.stat(out).st_mode) == 0o644
    assert f"Content written to {out}" in capsys.readouterr().out


def test_cli_output_file_truncates_existing(tmp_path, sample_csv):
    out = tmp_path / "out.md"
    out.write_text("x" * 10_000)
    assert cli_main([sample_csv, "-o", str(out)]) == 0
    text = out.read_text()
    assert "| a | b |" in text and "x" * 100 not in text


MCP_ERROR_CASES = [
    {},                                # missing input entirely
    {"input": ""},                     # empty input
    {"input": 42},                     # non-string input
    {"input": "/nope/never.csv"},      # nonexistent file
]


@pytest.mark.parametrize("args", MCP_ERROR_CASES)
def test_mcp_bad_input_is_error_result(args):
    res = handle_tool_call(args)
    assert res["isError"] is True
    assert res["content"][0]["type"] == "text"


def test_mcp_output_param_echo_semantics(tmp_path, sample_csv):
    """marky-mcp/main.go:50,57-63: omitted output and output='console' both
    skip the file write; output=path writes 0644 AND the tool result text is
    the markdown in every variant."""
    md = handle_tool_call({"input": sample_csv})["content"][0]["text"]
    assert "| a | b |" in md

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        res = handle_tool_call({"input": sample_csv, "output": "console"})
        assert res["isError"] is False
        assert not (tmp_path / "console").exists()  # 'console' is NOT a path
    finally:
        os.chdir(cwd)

    out = tmp_path / "mcp_out.md"
    old_umask = os.umask(0o022)
    try:
        res = handle_tool_call({"input": sample_csv, "output": str(out)})
    finally:
        os.umask(old_umask)
    assert res["isError"] is False
    assert res["content"][0]["text"] == md        # echo even when writing
    assert out.read_text() == md
    assert stat.S_IMODE(os.stat(out).st_mode) == 0o644


def test_mcp_real_fixture_roundtrip(tmp_path):
    """End-to-end on a real reference fixture through the MCP handler."""
    res = handle_tool_call({"input": f"{REF}/test.ipynb",
                            "output": str(tmp_path / "nb.md")})
    assert res["isError"] is False
    assert (tmp_path / "nb.md").read_text() == res["content"][0]["text"]


MIME_MAGIC_CASES = [
    (b"\x89PNG\r\n\x1a\n" + b"\x00" * 16, "image/png"),
    (b"\xff\xd8\xff\xe0" + b"\x00" * 16, "image/jpeg"),
    (b"GIF89a" + b"\x00" * 16, "image/gif"),
    (b"RIFF" + b"\x00\x00\x00\x00" + b"WEBP" + b"\x00" * 8, "image/webp"),
    (b"RIFF" + b"\x00\x00\x00\x00" + b"WAVE" + b"\x00" * 8, "audio/wav"),
    (b"II*\x00" + b"\x00" * 16, "image/tiff"),
    (b"MM\x00*" + b"\x00" * 16, "image/tiff"),
    (b"\x1f\x8b\x08" + b"\x00" * 16, "application/gzip"),
    (b"ID3\x04" + b"\x00" * 16, "audio/mpeg"),
    (b"\x7fELF\x02" + b"\x00" * 16, "application/x-executable"),
    (b"SQLite format 3\x00" + b"\x00" * 8, "application/vnd.sqlite3"),
]


@pytest.mark.parametrize("data,mime", MIME_MAGIC_CASES)
def test_unsupported_mime_detection(data, mime, tmp_path):
    """Detected-but-unconvertible types error with the SPECIFIC type name,
    like the reference's mimetype.DetectFile + marky.go:41 path."""
    from marky_spark.cli import convert_file, sniff_mime_unsupported
    from marky_spark.kernels import ConvertError

    assert sniff_mime_unsupported(data) == mime
    p = tmp_path / "blob.bin"
    p.write_bytes(data)
    with pytest.raises(ConvertError, match=mime.replace("+", "\\+")):
        convert_file(str(p))
