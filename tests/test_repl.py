"""Interactive shell (shaclex_ray/repl.py — the reference's --shell REPL,
Repl.scala:17-96, whose :load is an echo stub; ours executes). Driven as
a scripted line iterable, matching the reference's own scripted-test
approach (withRedirectedOutput, Repl.scala:45-57)."""

import io

EX = "/root/reference/examples"


def _run(lines) -> str:
    from shaclex_ray.repl import run_repl

    out = io.StringIO()
    run_repl(lines, out)
    return out.getvalue()


def test_help_unknown_ambiguous_quit():
    out = _run([":help", ":frobnicate", ":s", ":quit", ":count"])
    assert ":validate" in out  # help text
    assert 'Unknown command: ":frobnicate"' in out
    assert '":s" matches :schema, :shapemap' in out
    assert "load data first" not in out  # :count after :quit never ran


def test_load_validate_shex(ray_session):
    out = _run(
        [
            f":load {EX}/shex/datatype.ttl",
            f":schema {EX}/shex/datatype.shex",
            ":shapemap " + open(f"{EX}/shex/datatype.shapeMap").read().strip(),
            ":validate",
            ":count",
            ":quit",
        ]
    )
    assert "loaded" in out and "schema loaded (shex)" in out
    assert "FAIL <http://example.org/bad5>" in out
    assert "OK <http://example.org/good>" in out


def test_load_validate_shacl_and_infer(ray_session):
    out = _run(
        [
            f":load {EX}/shacl/good1.ttl",
            f":schema {EX}/shacl/good1.ttl shacl",
            ":validate",
            ":infer",
            ":quit",
        ]
    )
    assert "schema loaded (shacl)" in out
    assert "<http://example.org/y>" in out  # nonconformant node reported
    assert "{" in out  # inferred ShExC printed


def test_errors_do_not_kill_shell():
    out = _run([":load /nonexistent/file.ttl", ":validate", ":quit"])
    assert "error:" in out
    assert "load data (:load) and a schema (:schema) first" in out
