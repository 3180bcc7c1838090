"""Interactive shell (the reference's --shell / JLine REPL,
src/main/scala/es/weso/shaclex/repl/Repl.scala:17-96). The reference's
command set is `:help`, `:quit` and a stub `:load` (it only echoes the
path — Repl.scala:89-91); this one additionally makes the commands real:
data/schema loading, the four-trigger validate, inference and counting,
all through the same engine facade the CLI uses. Prefix matching and
ambiguity reporting mirror ParseResult.scala.

Scriptable: ``run_repl(lines, out)`` takes any iterable of lines, so
tests drive it without a terminal.
"""

from __future__ import annotations

import sys

HELP = """The shell has several commands available:
:help                       show this help
:quit                       exit the shell (Ctrl-D works too)
:load <path>                load an RDF data file (ttl/nt/rdf/jsonld/...)
:schema <path> [shex|shacl] load a schema (engine sniffed from extension)
:shapemap <text>            set the shapemap for :validate
:validate                   validate loaded data against the loaded schema
:infer [classIRI]           infer a ShEx shape from the loaded data
:count                      triple count of the loaded data
"""

_COMMANDS = [":help", ":quit", ":load", ":schema", ":shapemap", ":validate", ":infer", ":count"]


class ReplState:
    def __init__(self):
        self.triples_ds = None
        self.schema = None
        self.engine = None
        self.shapemap = None


def _resolve_command(word: str):
    matches = [c for c in _COMMANDS if c.startswith(word)]
    if len(matches) == 1:
        return matches[0], None
    if not matches:
        return None, f'Unknown command: "{word}", run ":help" for a list of commands'
    return None, (
        f'"{word}" matches {", ".join(matches)}. Try typing a few more '
        'characters. Run ":help" for a list of commands'
    )


def _interpret(line: str, st: ReplState, out) -> bool:
    """Returns False when the shell should quit."""
    line = line.strip()
    if not line:
        return True
    if not line.startswith(":"):
        print('Commands start with ":" — run :help', file=out)
        return True
    word, _, arg = line.partition(" ")
    cmd, err = _resolve_command(word)
    if err:
        print(err, file=out)
        return True
    arg = arg.strip()
    try:
        if cmd == ":quit":
            return False
        if cmd == ":help":
            print(HELP, file=out)
        elif cmd == ":load":
            from shaclex_ray.__main__ import _load_triples_ds

            st.triples_ds = _load_triples_ds(arg)
            print(f"loaded {st.triples_ds.count()} triples from {arg}", file=out)
        elif cmd == ":schema":
            parts = arg.split()
            path = parts[0]
            engine = parts[1] if len(parts) > 1 else (
                "shex" if path.endswith((".shex", ".json")) else "shacl"
            )
            from shaclex_ray.engine import compile_schema

            text = open(path).read()
            st.schema = compile_schema(engine, text)
            st.engine = engine
            print(f"schema loaded ({engine})", file=out)
        elif cmd == ":shapemap":
            st.shapemap = arg
            print("shapemap set", file=out)
        elif cmd == ":validate":
            if st.triples_ds is None or st.schema is None:
                print("load data (:load) and a schema (:schema) first", file=out)
                return True
            from shaclex_ray.engine import validate
            from shaclex_ray.result import result_text

            if st.engine == "shex":
                typing, _summary = validate(
                    st.triples_ds, "shex", st.schema,
                    trigger="SHAPEMAP", shapemap=st.shapemap or "",
                )
                report = None
            else:
                typing, report, _summary = validate(
                    st.triples_ds, "shacl", st.schema
                )
            print(result_text(typing, report), file=out)
        elif cmd == ":infer":
            if st.triples_ds is None:
                print("load data first (:load)", file=out)
                return True
            from shaclex_ray.pipelines.infer import infer_schema
            from shaclex_ray.shapes.render import render_shexc

            schema, _ = infer_schema(st.triples_ds, focus_class=arg or None)
            print(render_shexc(schema), file=out)
        elif cmd == ":count":
            if st.triples_ds is None:
                print("load data first (:load)", file=out)
                return True
            print(st.triples_ds.count(), file=out)
    except Exception as e:  # noqa: BLE001 — a shell never dies on a command
        print(f"error: {type(e).__name__}: {e}", file=out)
    return True


def run_repl(lines=None, out=None) -> None:
    out = out or sys.stdout
    st = ReplState()

    def _stdin_lines():
        while True:
            try:
                yield input("shaclex> ")
            except (EOFError, KeyboardInterrupt):
                return

    for line in lines if lines is not None else _stdin_lines():
        if not _interpret(line, st, out):
            break
