"""Run the reference's BASH documentation examples — ``general/
blobs.rst`` and ``interfaces/http.rst`` — against the engine's real
HTTP server, the way the reference's own doctest suite does
(blackbox/test_docs.py:455-476: ``bash_parser`` + a live node).

``sh$ crash -c "<sql>"`` lines execute through :class:`CrateSession`
(crash is the reference CLI; its table render is the console format
the DQL runner already compares). ``sh$ curl ...`` / ``sh$ python3
...`` lines run through bash VERBATIM — heredocs, escapes and all —
against :func:`crate_spark.http_sql.serve` on a test port, and the
captured stdout is compared to the documented output (JSON bodies as
wildcard-aware deep compares, HTTP transcripts line by line).
"""

from __future__ import annotations

import json
import re
import socket
import subprocess
from pathlib import Path

import pytest

from crate_spark.engine import CrateSession
from crate_spark.http_sql import serve

from .test_doc_dql import DATA, FIXTURES
from .test_doc_dql import _rows_match

DOCS = Path("/root/reference/docs")

FILES = {
    "general/blobs.rst": (),
    "interfaces/http.rst": ("locations",),
}


def _cases(fname: str):
    """All ``sh$`` examples in file order: (command, expected_lines).
    Continuation lines (``... ``) join with newlines so bash sees
    backslash-continuations and heredocs exactly as printed."""
    lines = (DOCS / fname).read_text().splitlines()
    cases, i = [], 0
    while i < len(lines):
        m = re.match(r"\s*sh\$\s+(.*)$", lines[i])
        if not m:
            i += 1
            continue
        cmd = [m.group(1)]
        i += 1
        while i < len(lines) and re.match(r"\s*\.\.\.\s?", lines[i]):
            cmd.append(re.sub(r"^\s*\.\.\.\s?", "", lines[i]))
            i += 1
        expected = []
        while i < len(lines) and lines[i].strip():
            expected.append(lines[i].strip())
            i += 1
        cases.append(("\n".join(cmd), expected))
    return cases


def _json_matches(got: str, expected_lines: list[str]) -> bool:
    """Wildcard-aware JSON compare: ``...`` in the doc means
    any value (doctest ELLIPSIS)."""
    text = "\n".join(expected_lines)
    text = re.sub(r"(:\s*)\.\.\.(\s*[,}\]])", r'\1"__ANY__"\2', text)
    text = re.sub(r"(:\s*)\.\.\.\s*$", r'\1"__ANY__"', text, flags=re.M)
    try:
        want = json.loads(text)
        have = json.loads(got)
    except json.JSONDecodeError:
        return False

    def deep(a, b) -> bool:
        if b in ("__ANY__", "..."):
            return True
        if isinstance(b, dict):
            return (
                isinstance(a, dict)
                and set(a) == set(b)
                and all(deep(a[k], b[k]) for k in b)
            )
        if isinstance(b, list):
            return (
                isinstance(a, list)
                and len(a) == len(b)
                and all(deep(x, y) for x, y in zip(a, b))
            )
        return a == b

    return deep(have, want)


def _transcript_matches(got: str, expected_lines: list[str]) -> bool:
    """HTTP-transcript compare: expected lines must appear in order in
    the output; header names compare case-insensitively and ``...``
    wildcards any run (curl -i output)."""
    got_lines = [ln.strip() for ln in got.splitlines() if ln.strip()]
    gi = 0
    for want in expected_lines:
        pat = ".*".join(re.escape(p) for p in want.split("..."))
        hit = None
        for j in range(gi, len(got_lines)):
            if re.fullmatch(pat, got_lines[j], re.IGNORECASE):
                hit = j
                break
        if hit is None:
            return False
        gi = hit + 1
    return True


def _grid_rows(expected_lines: list[str]):
    """Parse a crash/console +---+ grid into header+rows (cell text),
    or None if the expected output isn't a grid."""
    if not expected_lines or not expected_lines[0].startswith("+-"):
        return None
    header, rows = None, []
    for s in expected_lines:
        if s.startswith("+-"):
            continue
        if s.startswith("|"):
            cells = [c.strip() for c in s.strip("|").split("|")]
            if header is None:
                header = cells
            else:
                rows.append(cells)
        else:
            break  # trailing "SELECT n rows in set (... sec)"
    return rows


@pytest.fixture()
def http_env(spark, tmp_path_factory, request):
    fname = request.node.callspec.params.get("fname")
    s = CrateSession(
        spark, None, storage_dir=str(tmp_path_factory.mktemp("http_docs"))
    )
    for name in FILES[fname]:
        ddl, data = FIXTURES[name]
        s.execute(ddl)
        s.execute(f"copy {name} from '{DATA / data}'")
        s.execute(f"refresh table {name}")
    with socket.socket() as probe:  # free port
        probe.bind(("127.0.0.1", 0))
        port = probe.getsockname()[1]
    srv = serve(s, port=port)
    yield s, port
    srv.shutdown()


@pytest.mark.parametrize("fname", sorted(FILES))
def test_bash_doc_file(http_env, fname):
    session, port = http_env
    ran = failures = skipped = 0
    for cmd, expected in _cases(fname):
        if "doctest: +SKIP" in cmd:
            skipped += 1
            continue
        crash = re.match(r'crash\s+-c\s+"(.*)"\s*$', cmd, re.DOTALL)
        if crash:
            ran += 1
            try:
                df = session.execute(crash.group(1))
            except Exception as e:
                failures += 1
                print(f"\nFAIL (raised) crash -c {crash.group(1)!r}: {e}")
                continue
            want_rows = _grid_rows(expected)
            if want_rows is not None:
                got = [
                    ["NULL" if v is None else str(v) for v in r]
                    for r in df.collect()
                ]
                if not _rows_match(got, want_rows):
                    failures += 1
                    print(f"\nFAIL crash -c {crash.group(1)!r}")
                    print(f"  got : {got}")
                    print(f"  want: {want_rows}")
            continue
        # genuine shell example — run it verbatim against the live port
        ran += 1
        live = cmd.replace("127.0.0.1:4200", f"127.0.0.1:{port}")
        proc = subprocess.run(
            ["bash", "-c", live], capture_output=True, text=True, timeout=120
        )
        got = proc.stdout
        if expected and expected[0].startswith("{"):
            ok = _json_matches(got, expected)
        else:
            ok = _transcript_matches(got, expected)
        if not ok:
            failures += 1
            print(f"\nFAIL sh$ {live}")
            print(f"  got : {got!r}")
            print(f"  want: {expected}")
    assert failures == 0, f"{failures}/{ran} bash doc examples failed"
    assert ran > 0
