"""shexTest conformance: every applicable entry must pass (parity with the
reference's suite, SURVEY.md §5)."""

from collections import Counter

from shaclex_ray.conformance import load_shex_manifest, run_shex_case


def test_shex_suite_full_parity():
    cases = load_shex_manifest()
    assert len(cases) > 1000
    stats = Counter()
    failures = []
    for c in cases:
        st, detail = run_shex_case(c)
        stats[st] += 1
        if st in ("fail", "error"):
            failures.append((c["name"], st, detail))
    assert not failures, failures[:10]
    # the FULL suite: 1088/1088, zero skips. SemanticAction (Test
    # extension), ExternalShape (sht:shapeExterns resolution) and Greedy
    # (trait-selected greedy matching strategy) all run since round 4.
    assert stats["pass"] >= 1088, stats
    assert stats.get("skip", 0) == 0, stats
