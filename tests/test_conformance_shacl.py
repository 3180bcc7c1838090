"""SHACL core suite conformance: status + (focusNode, component) multiset
parity on every applicable W3C core test (SURVEY.md §5)."""

from collections import Counter

from shaclex_ray.conformance import load_shacl_cases, run_shacl_case


def test_shacl_core_full_parity():
    files = load_shacl_cases()
    assert len(files) > 100
    stats = Counter()
    failures = []
    for f in files:
        st, detail = run_shacl_case(f)
        stats[st] += 1
        if st in ("fail", "error"):
            failures.append((f, st, detail))
    assert not failures, failures[:10]
    assert stats["pass"] >= 98, stats
