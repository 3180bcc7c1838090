"""CLI entry points (the reference's Main analog)."""

import subprocess
import sys

EX = "/root/reference/examples"


def _run(*args):
    return subprocess.run(
        [sys.executable, "-m", "shaclex_ray", *args],
        capture_output=True,
        text=True,
        timeout=180,
        cwd="/root/repo",
    )


def test_cli_validate_shex():
    p = _run(
        "validate",
        "--data", f"{EX}/shex/datatype.ttl",
        "--engine", "shex",
        "--schema", f"{EX}/shex/datatype.shex",
        "--shapemap", open(f"{EX}/shex/datatype.shapeMap").read(),
    )
    assert p.returncode == 0, p.stderr[-500:]
    assert "OK <http://example.org/good>" in p.stdout
    assert p.stdout.count("FAIL") == 5


def test_cli_infer_and_convert():
    p = _run("infer", "--data", f"{EX}/shex/datatype.ttl")
    assert p.returncode == 0, p.stderr[-500:]
    assert "<http://example.org/p>" in p.stdout

    p = _run("convert", "--schema", f"{EX}/shex/datatype.shex", "--to", "shacl")
    assert p.returncode == 0, p.stderr[-500:]
    assert "minCount" in p.stdout
