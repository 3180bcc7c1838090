"""Empty-partition hardening sweep: every queries() entry must return a
ZERO-ROW result (not crash) over a corpus whose ten tables are all empty.

At 100 TB this is not a corner case — a key-range partition, a filtered
split, or a freshly-onboarded source routinely hands a pipeline zero
rows; an operator that dies there kills the whole run. The failure modes
this pins (all seen live before the fix): schema-less Datasets out of
zero-block reads, zero-column empty blocks entering hash exchanges,
``np.max``/``min``/``next`` on empty, parquet stage dirs written with no
part files, and driver joins on column-less sides.
"""

import glob
import os
import shutil

import pyarrow.parquet as pq
import pytest

SRC_SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sf_empty"))
    for f in glob.glob(f"{SRC_SF}/*.parquet"):
        pq.write_table(
            pq.read_schema(f).empty_table(), os.path.join(out, os.path.basename(f))
        )
    yield out
    # the kg/curation queries checkpoint under /tmp/graft_* keyed on the
    # sf dir path — drop those so reruns never resume a stale layout
    mangled = out.strip("/").replace("/", "_")
    for root in ("/tmp/graft_kg", "/tmp/graft_curate"):
        shutil.rmtree(os.path.join(root, mangled), ignore_errors=True)


def _query_names():
    import __ray_entry__ as e

    return sorted(e.queries())


@pytest.mark.parametrize("name", _query_names())
def test_query_on_empty_corpus(ray_session, empty_sf, name):
    import ray.data

    import __ray_entry__ as e

    res = e.queries()[name](empty_sf)
    n = res.count() if isinstance(res, ray.data.Dataset) else len(res)
    assert n == 0, f"{name} returned {n} rows on an all-empty corpus"


@pytest.fixture(scope="module")
def one_row_sf(tmp_path_factory):
    """One physical row per table — truncation leaves DANGLING foreign
    keys (e.g. a lineitem whose supplier's nation has no nation row),
    the dirty-data shape a 100-TB ingest will contain."""
    out = str(tmp_path_factory.mktemp("sf_one"))
    for f in glob.glob(f"{SRC_SF}/*.parquet"):
        pq.write_table(
            pq.read_table(f).slice(0, 1), os.path.join(out, os.path.basename(f))
        )
    yield out
    mangled = out.strip("/").replace("/", "_")
    for root in ("/tmp/graft_kg", "/tmp/graft_curate"):
        shutil.rmtree(os.path.join(root, mangled), ignore_errors=True)


@pytest.mark.parametrize("name", _query_names())
def test_query_on_one_row_corpus(ray_session, one_row_sf, name):
    import ray.data

    import __ray_entry__ as e

    res = e.queries()[name](one_row_sf)
    # row counts vary per operator; the invariant is graceful execution
    n = res.count() if isinstance(res, ray.data.Dataset) else len(res)
    assert n >= 0


@pytest.fixture(scope="module")
def hot_key_sf(tmp_path_factory):
    """Every document carries ONE shared text and ONE source — the
    hottest possible key: one giant dup group, one LSH bucket, one
    substring window hash. Pins that the degenerate-bucket caps and
    representative-based verifies keep skewed exchanges alive."""
    import pyarrow as pa

    out = str(tmp_path_factory.mktemp("sf_dup"))
    for f in glob.glob(f"{SRC_SF}/*.parquet"):
        t = pq.read_table(f)
        name = os.path.basename(f)
        if name == "documents.parquet" and t.num_rows:
            txt = t.column("text")[0].as_py()
            n = t.num_rows
            t = t.set_column(
                t.schema.get_field_index("text"),
                "text",
                pa.array([txt] * n, pa.string()),
            )
            t = t.set_column(
                t.schema.get_field_index("source"),
                "source",
                pa.array(["s0"] * n, pa.string()),
            )
        pq.write_table(t, os.path.join(out, name))
    yield out
    mangled = out.strip("/").replace("/", "_")
    for root in ("/tmp/graft_kg", "/tmp/graft_curate"):
        shutil.rmtree(os.path.join(root, mangled), ignore_errors=True)


# the skew-sensitive operators: giant dup groups, single-bucket LSH,
# identical-window substring exchange, hot-source sampling/mixture
_HOT_KEY_NAMES = [
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash_groups",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_substring",
    "curate_corpus",
    "curate_sample",
    "curate_mixture",
    "curate_top_terms",
    "text_term_stats",
]


@pytest.mark.parametrize("name", _HOT_KEY_NAMES)
def test_query_on_hot_key_corpus(ray_session, hot_key_sf, name):
    import ray.data

    import __ray_entry__ as e

    res = e.queries()[name](hot_key_sf)
    n = res.count() if isinstance(res, ray.data.Dataset) else len(res)
    assert n >= 0


@pytest.fixture(scope="module")
def null_sf(tmp_path_factory):
    """Null text/lang/source sprinkled through the documents table (keys
    stay non-null) — real ingests carry nulls. Engine policy: a null
    string tokenizes and hashes as the EMPTY string (pinned here); the
    SQL oracles never see nulls (the driver's testdata has none), so
    DuckDB's null-propagation semantics are not at stake."""
    import pyarrow as pa

    out = str(tmp_path_factory.mktemp("sf_null"))
    for f in glob.glob(f"{SRC_SF}/*.parquet"):
        t = pq.read_table(f)
        name = os.path.basename(f)
        if name == "documents.parquet" and t.num_rows >= 4:
            for c in ("text", "lang", "source"):
                col = t.column(c).to_pylist()
                for i in range(0, min(len(col), 40), 7):
                    col[i] = None
                t = t.set_column(
                    t.schema.get_field_index(c),
                    c,
                    pa.array(col, t.schema.field(c).type),
                )
        pq.write_table(t, os.path.join(out, name))
    yield out
    mangled = out.strip("/").replace("/", "_")
    for root in ("/tmp/graft_kg", "/tmp/graft_curate"):
        shutil.rmtree(os.path.join(root, mangled), ignore_errors=True)


@pytest.mark.parametrize("name", _query_names())
def test_query_on_null_corpus(ray_session, null_sf, name):
    import ray.data

    import __ray_entry__ as e

    res = e.queries()[name](null_sf)
    n = res.count() if isinstance(res, ray.data.Dataset) else len(res)
    assert n >= 0
