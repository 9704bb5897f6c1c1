"""CLI + MCP surface parity (reference cmd/marky/main.go, marky-mcp/main.go).

No Spark involved — these are the per-file entry points backed directly by
the kernels.
"""

import json
import subprocess
import sys

REF = "/root/reference/test_files"
REPO = "/root/repo"


def run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "marky_spark.cli", *args],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )


def test_cli_console_output():
    p = run_cli(f"{REF}/test.csv")
    assert p.returncode == 0, p.stderr
    assert "| --- |" in p.stdout  # markdown table rendered


def test_cli_file_output(tmp_path):
    out = tmp_path / "out.md"
    p = run_cli(f"{REF}/test.ipynb", "-o", str(out))
    assert p.returncode == 0, p.stderr
    assert "Content written to" in p.stdout  # cmd/marky/main.go:41
    assert "```python" in out.read_text()


def test_cli_missing_input_exits_1():
    p = run_cli("/no/such/file.pdf")
    assert p.returncode == 1  # cmd/marky/main.go:23-25
    assert "does not exist" in p.stderr


def test_cli_unsupported_exits_1(tmp_path):
    weird = tmp_path / "blob.xyz"
    weird.write_bytes(b"\x00\x01\x02garbage")
    p = run_cli(str(weird))
    assert p.returncode == 1
    assert "no converter" in p.stderr  # marky.go:41


def test_cli_sniffs_binary_kinds_without_extension(tmp_path):
    """Content sniffing (marky.go:29): magic bytes win over a lying name."""
    import shutil

    for src, marker in [("test.pdf", ""), ("test.docx", ""),
                        ("test.xlsx", "| --- |"), ("test.pptx", "Slide")]:
        anon = tmp_path / src.replace(".", "_")  # no extension at all
        shutil.copy(f"{REF}/{src}", anon)
        p = run_cli(str(anon))
        assert p.returncode == 0, (src, p.stderr)
        assert marker in p.stdout


def _mcp_round_trip(requests):
    lines = "\n".join(json.dumps(r) for r in requests) + "\n"
    p = subprocess.run(
        [sys.executable, "-m", "marky_spark.mcp_server"],
        input=lines, capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    assert p.returncode == 0, p.stderr
    return [json.loads(x) for x in p.stdout.splitlines() if x.strip()]


def test_mcp_initialize_list_call(tmp_path):
    out_file = tmp_path / "mcp_out.md"
    responses = _mcp_round_trip([
        {"jsonrpc": "2.0", "id": 1, "method": "initialize",
         "params": {"protocolVersion": "2024-11-05"}},
        {"jsonrpc": "2.0", "method": "notifications/initialized"},
        {"jsonrpc": "2.0", "id": 2, "method": "tools/list"},
        {"jsonrpc": "2.0", "id": 3, "method": "tools/call",
         "params": {"name": "convert_to_markdown",
                    "arguments": {"input": f"{REF}/test.csv",
                                  "output": str(out_file)}}},
        {"jsonrpc": "2.0", "id": 4, "method": "tools/call",
         "params": {"name": "convert_to_markdown",
                    "arguments": {"input": "/no/such.pdf"}}},
        {"jsonrpc": "2.0", "id": 5, "method": "nope"},
    ])
    by_id = {r["id"]: r for r in responses}
    assert by_id[1]["result"]["serverInfo"]["name"] == "Marky"
    tools = by_id[2]["result"]["tools"]
    assert [t["name"] for t in tools] == ["convert_to_markdown"]
    ok = by_id[3]["result"]
    assert not ok.get("isError")
    assert "| --- |" in ok["content"][0]["text"]
    assert "| --- |" in out_file.read_text()  # optional file write
    assert by_id[4]["result"]["isError"]
    assert by_id[5]["error"]["code"] == -32601
    # the notification produced no response line
    assert set(by_id) == {1, 2, 3, 4, 5}


def test_cli_matches_pipeline_kernel_output():
    """The CLI and the Spark kernel path produce the identical Markdown."""
    import base64

    from marky_spark.cli import convert_file
    from marky_spark.convert import convert_document

    payload = base64.b64encode(open(f"{REF}/test.docx", "rb").read()).decode()
    row = convert_document(
        "d", [{"kind": "docx", "text": payload, "media_ref": "", "offset": 0}]
    )
    assert row["status"] == "ok"
    assert convert_file(f"{REF}/test.docx") == row["markdown"]


def test_cli_permission_denied_exits_1(tmp_path):
    import os

    import pytest

    if os.geteuid() == 0:  # root bypasses file modes; the dir case below
        pytest.skip("permission bits are advisory for root")
    locked = tmp_path / "locked.csv"
    locked.write_text("a,b\n1,2\n")
    locked.chmod(0)
    try:
        p = run_cli(str(locked))
        assert p.returncode == 1
        assert "error:" in p.stderr
    finally:
        locked.chmod(0o644)


def test_cli_directory_as_file_exits_1(tmp_path):
    d = tmp_path / "adir.csv"
    d.mkdir()
    p = run_cli(str(d))
    assert p.returncode == 1
    assert "error:" in p.stderr


def test_mcp_survives_bad_inputs(tmp_path):
    """OS-level and parse errors come back as isError results, never
    crash the server loop (poison-pill isolation at the tool boundary)."""
    adir = tmp_path / "adir.csv"  # IsADirectoryError fires even as root
    adir.mkdir()
    bad = tmp_path / "bad.pdf"
    bad.write_bytes(b"%PDF-not really a pdf at all")
    responses = _mcp_round_trip([
        {"jsonrpc": "2.0", "id": 1, "method": "tools/call",
         "params": {"name": "convert_to_markdown",
                    "arguments": {"input": str(adir)}}},
        {"jsonrpc": "2.0", "id": 2, "method": "tools/call",
         "params": {"name": "convert_to_markdown",
                    "arguments": {"input": str(bad)}}},
        {"jsonrpc": "2.0", "id": 3, "method": "ping"},
    ])
    by_id = {r["id"]: r for r in responses}
    assert by_id[1]["result"]["isError"]
    assert by_id[2]["result"]["isError"]
    assert by_id[3]["result"] == {}  # server still alive after both errors


def test_sniff_zip_member_prefix_not_substring():
    """Zip container sniffing keys on member-name *prefixes*: 'password/x'
    must not read as 'word/' (docx), nor 'xxl/…' as 'xl/' (xlsx) — an EPUB
    carrying such members classifies as epub."""
    import io
    import zipfile

    from marky_spark.cli import sniff_kind

    def zip_bytes(names):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            for n in names:
                z.writestr(n, "x")
        return buf.getvalue()

    tricky_epub = zip_bytes(
        ["mimetype", "META-INF/container.xml", "password/x.txt", "xxl/a"])
    assert sniff_kind("book.bin", tricky_epub) == "epub"
    assert sniff_kind("a.bin", zip_bytes(["password/x.txt"])) is None
    assert sniff_kind("a.bin", zip_bytes(["xxl/sheet.xml"])) is None
    assert sniff_kind("d.bin", zip_bytes(["word/document.xml"])) == "docx"
    assert sniff_kind("x.bin", zip_bytes(["xl/workbook.xml"])) == "xlsx"
    assert sniff_kind("p.bin", zip_bytes(["ppt/slides/slide1.xml"])) == "pptx"


def test_sniff_epub_mimetype_content_is_authoritative():
    """OCF makes the 'mimetype' member's CONTENT authoritative: a hostile
    EPUB that also carries a root word/ member must classify as epub, not
    docx (r2 verdict residual). A zip with a non-epub mimetype content
    still classifies by its Office prefixes, and a real DOCX is
    unaffected."""
    import io
    import zipfile

    from marky_spark.cli import sniff_kind

    def zip_with(entries):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            for n, content in entries:
                z.writestr(n, content)
        return buf.getvalue()

    hostile_epub = zip_with([
        ("mimetype", "application/epub+zip"),
        ("META-INF/container.xml", "<container/>"),
        ("word/decoy.xml", "x"),
    ])
    assert sniff_kind("h.bin", hostile_epub) == "epub"
    other_ocf = zip_with([
        ("mimetype", "application/something-else"),
        ("word/document.xml", "x"),
    ])
    assert sniff_kind("o.bin", other_ocf) == "docx"
    plain_docx = zip_with([("word/document.xml", "x")])
    assert sniff_kind("d.bin", plain_docx) == "docx"
