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


def test_cli_query_subcommand(ray_session, capsys, tmp_path):
    from shaclex_ray.__main__ import main

    main(["query", "--list"])
    names = capsys.readouterr().out.split()
    assert "kg_triples" in names and "pack_sequences" in names

    main(
        [
            "query",
            "--name",
            "text_token_stats",
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--limit",
            "3",
        ]
    )
    out = capsys.readouterr().out
    assert "n_tokens" in out

    out_dir = str(tmp_path / "q")
    main(
        [
            "query",
            "--name",
            "dedup_exact",
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--out",
            out_dir,
        ]
    )
    import glob

    import pyarrow.parquet as pq

    rows = sum(
        pq.ParquetFile(f).metadata.num_rows for f in glob.glob(f"{out_dir}/*.parquet")
    )
    assert rows == 500


def test_cli_shextest_by_name(capsys, ray_session):
    from shaclex_ray.__main__ import main

    main(["shextest", "--name", "1dot_pass"])
    out = capsys.readouterr().out
    assert "1dot_pass-noOthers: pass" in out
    assert "'pass': 4" in out
