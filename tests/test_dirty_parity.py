"""Adversarial-corpus parity: every oracle-twinned queries() entry must
still match DuckDB row-for-row on a DIRTY variant of sf0.001 — negative
and 13-digit doc ids, unicode/emoji/CJK text, a 2MB single token,
whitespace-only and control-character docs, duplicated text across
distinct ids, zero-norm / 1e30 / -1e-30 embeddings, AND a NULL in every
poisonable column: text/lang/source (read as ''), embeddings incl.
empty lists and null elements (read as the zero vector -> cosine -1),
knn labels (read as -1), event strings, event ts/user_id (rows dropped
by the time/user-keyed operators) and value (reads 0.0), and the star
schema's join keys / measures / flags / dates (drop out identically on
both sides). This pins the engine-wide edge policies (pad-only doc
labels, sign-safe modulo, the null-string policy, the zero-norm
cosine = -1 rule, float64 cosine vs DuckDB's storage-type kernel)
against real adversarial data rather than only the clean synthetic
tables. Probed and deliberately NOT pinned: duplicate primary keys —
contract-violating input on which per-doc operators legitimately
differ from SQL row semantics (see BASELINE.md)."""

import glob
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.test_oracle_parity import TABLES, _normalize, _to_pandas

BASE = "/root/testdata/sf0.001"


def _names():
    import __ray_entry__ as e

    return sorted(e.oracle_sql())




def poison_documents(t: pa.Table) -> pa.Table:
    """Apply the canonical dirty-documents mutations (shared with the CLI
    pipeline pin in test_cli.py so the two corpora cannot drift)."""
    ids = t.column("doc_id").to_pylist()
    txt = t.column("text").to_pylist()
    lng = t.column("lang").to_pylist()
    src = t.column("source").to_pylist()
    ids[0] = -5
    ids[1] = 10**12
    ids[2] = -999999
    txt[3] = "héllo wörld 👋 你好 世界 🌍 " * 50 + "é شكرا"
    txt[4] = ("lorem ipsum dolor sit amet " * 40) + ("x" * 2_000_000)
    txt[5] = "   "
    txt[6] = "line1\nline2\ttab  double  space"
    txt[7] = txt[8]  # duplicate content across weird ids
    txt[9] = None  # null text: engine policy tokenizes/hashes as ''
    # null lang/source: same policy — read as '' everywhere
    lng[10] = None
    src[11] = None
    for col, v, typ in (
        ("doc_id", ids, pa.int64()),
        ("text", txt, pa.string()),
        ("lang", lng, pa.string()),
        ("source", src, pa.string()),
    ):
        t = t.set_column(t.schema.get_field_index(col), col, pa.array(v, typ))
    return t


@pytest.fixture(scope="session")
def dirty_sf(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dirty") / "sf")
    os.makedirs(out, exist_ok=True)
    for f in glob.glob(f"{BASE}/*.parquet"):
        t = pq.read_table(f)
        name = os.path.basename(f)
        if name == "documents.parquet" and t.num_rows >= 12:
            t = poison_documents(t)
        if name == "embeddings.parquet" and t.num_rows >= 10:
            emb = t.column("embedding").to_pylist()
            dim = len(emb[0])
            emb[0] = [0.0] * dim  # zero-norm vector
            emb[1] = [1e30] * dim  # huge magnitude (overflows f32 cosine)
            emb[2] = [-1e-30] * dim  # tiny magnitude (underflows f32 cosine)
            emb[3] = None  # null embedding: policy reads it as the zero vector
            emb[4] = [None] + emb[4][1:]  # null ELEMENT: reads as 0.0
            emb[5] = []  # empty list: reads as the zero vector too
            lab = t.column("label").to_pylist()
            lab[6] = None  # null label: policy reads it as -1 (unknown class)
            t = t.set_column(
                t.schema.get_field_index("embedding"),
                "embedding",
                pa.array(emb, pa.list_(pa.float32())),
            )
            t = t.set_column(
                t.schema.get_field_index("label"),
                "label",
                pa.array(lab, t.schema.field("label").type),
            )
        star_nulls = {
            "orders.parquet": ["o_custkey", "o_totalprice", "o_orderdate"],
            "lineitem.parquet": [
                "l_orderkey", "l_quantity", "l_extendedprice", "l_discount",
                "l_returnflag", "l_linestatus", "l_shipdate", "l_suppkey",
            ],
            "customer.parquet": ["c_nationkey", "c_mktsegment"],
            "supplier.parquet": ["s_nationkey"],
            "nation.parquet": ["n_regionkey", "n_name"],
            "region.parquet": ["r_regionkey", "r_name"],
        }
        for col in star_nulls.get(name, []):
            # null join keys / measures / flags in the star schema: must
            # drop out identically on both sides, never crash or corrupt
            if col in t.column_names and t.num_rows >= 5:
                v = t.column(col).to_pylist()
                v[4] = None
                t = t.set_column(
                    t.schema.get_field_index(col),
                    col,
                    pa.array(v, t.schema.field(col).type),
                )
        if name == "events.parquet" and t.num_rows >= 10:
            # null event strings: null props/event_type must not crash
            # the groupbys or the JSON extraction
            for col in t.column_names:
                if t.schema.field(col).type == pa.string():
                    v = t.column(col).to_pylist()
                    v[2] = None
                    t = t.set_column(
                        t.schema.get_field_index(col), col, pa.array(v, pa.string())
                    )
            # events policy: a NULL ts or user_id row is DROPPED by the
            # time/user-keyed operators; NULL value reads as 0.0
            for col, row in (("ts", 3), ("user_id", 4), ("value", 5)):
                v = t.column(col).to_pylist()
                v[row] = None
                t = t.set_column(
                    t.schema.get_field_index(col),
                    col,
                    pa.array(v, t.schema.field(col).type),
                )
        pq.write_table(t, f"{out}/{name}")
    return out


@pytest.fixture(scope="module")
def qo(ray_session):
    import __ray_entry__ as e

    return e.queries(), e.oracle_sql()


@pytest.mark.parametrize("name", _names())
def test_dirty_query_matches_oracle(qo, dirty_sf, name):
    queries, oracles = qo
    got = _normalize(_to_pandas(queries[name](dirty_sf)))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{dirty_sf}/{t}.parquet')"
        )
    exp = _normalize(con.execute(oracles[name]).fetchdf())
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp), f"rows: got {len(got)} exp {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
