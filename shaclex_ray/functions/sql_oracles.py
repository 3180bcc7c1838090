"""DuckDB oracle-SQL generators for the hash-based dedup / ANN operators.

Every operator in functions/dedup.py and functions/ann.py is built from
md5-derived hashes (``md5_number_lower``: last 8 digest bytes little-endian
— exactly DuckDB's function of that name) plus arithmetic DuckDB can
reproduce, so the *entire* pipeline — shingle → minhash → band → bucket
pairs → jaccard verify, and hyperplane LSH signatures — has an independent
SQL twin. The only non-trivial piece is splitmix64, whose two wrapping
64-bit multiplications are emitted as 32-bit-split HUGEINT arithmetic.

The generators inline the SAME seeds / hyperplanes as the Ray operators
(minhash_seeds / lsh_planes), so the two sides cannot drift.
"""

from __future__ import annotations

_U32 = 4294967296
_U64 = 18446744073709551616
_C1 = 0xBF58476D1CE4E5B9
_C2 = 0x94D049BB133111EB


def _mulmod64(x: str, c: int) -> str:
    """SQL for (x * c) mod 2**64 over UBIGINT x: 32-bit split so every
    intermediate fits HUGEINT."""
    cl, ch = c % _U32, c // _U32
    xl = f"CAST(({x}) & 4294967295 AS HUGEINT)"
    xh = f"CAST(({x}) >> 32 AS HUGEINT)"
    return (
        f"CAST((({xl} * {cl}) + (((({xl} * {ch}) + ({xh} * {cl})) % {_U32}) * {_U32}))"
        f" % {_U64} AS UBIGINT)"
    )


def _grams_cte(shingle: int) -> str:
    return f"""
toks AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS toks FROM documents
),
grams AS (
  SELECT doc_id,
         array_to_string(list_slice(toks, u.i + 1, u.i + {shingle}), ' ') AS gram
  FROM toks,
       unnest(generate_series(0, greatest(1, len(toks) - {shingle} + 1) - 1)) AS u(i)
),
gh AS (
  SELECT doc_id, md5_number_lower(gram) AS h FROM grams
)"""


def _minhash_ctes(num_perm: int, bands: int, shingle: int) -> str:
    """CTE chain ending in ``pairs(doc_a, doc_b)`` — the LSH candidate
    pairs, matching minhash_candidates() exactly."""
    from shaclex_ray.functions.dedup import minhash_seeds

    seeds = minhash_seeds(num_perm)
    rpb = num_perm // bands
    perm_rows = ", ".join(
        f"({p}, CAST({int(s)} AS UBIGINT))" for p, s in enumerate(seeds)
    )
    return (
        _grams_cte(shingle)
        + f""",
perms(p, seed) AS (VALUES {perm_rows}),
mix0 AS (SELECT doc_id, p, xor(h, seed) AS v FROM gh CROSS JOIN perms),
mix1 AS (SELECT doc_id, p, xor(v, v >> 30) AS v FROM mix0),
mix2 AS (SELECT doc_id, p, {_mulmod64('v', _C1)} AS v FROM mix1),
mix3 AS (SELECT doc_id, p, xor(v, v >> 27) AS v FROM mix2),
mix4 AS (SELECT doc_id, p, {_mulmod64('v', _C2)} AS v FROM mix3),
mixed AS (SELECT doc_id, p, xor(v, v >> 31) AS v FROM mix4),
sig AS (SELECT doc_id, p, min(v) AS minv FROM mixed GROUP BY doc_id, p),
bandk AS (
  SELECT doc_id, p // {rpb} AS band,
         substr(md5(CAST(p // {rpb} AS VARCHAR) || ':' ||
                    string_agg(CAST(minv AS VARCHAR), ',' ORDER BY p)), 1, 16)
           AS band_key
  FROM sig GROUP BY doc_id, p // {rpb}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bandk a JOIN bandk b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
)"""
    )


def minhash_candidates_sql(num_perm: int = 64, bands: int = 16, shingle: int = 3) -> str:
    return (
        "WITH "
        + _minhash_ctes(num_perm, bands, shingle)
        + "\nSELECT doc_a, doc_b FROM pairs"
    )


def _jaccard_ctes(num_perm: int, bands: int, shingle: int) -> str:
    """CTE chain ending at ``jacc(doc_a, doc_b, jaccard)`` — shared by the
    pair oracle and the cluster-resolution oracle."""
    return (
        _minhash_ctes(num_perm, bands, shingle)
        + """,
dgh AS (SELECT DISTINCT doc_id, h FROM gh),
dsh AS (SELECT doc_id, count(*) AS n FROM dgh GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS icnt
  FROM pairs p
  JOIN dgh ga ON ga.doc_id = p.doc_a
  JOIN dgh gb ON gb.doc_id = p.doc_b AND gb.h = ga.h
  GROUP BY p.doc_a, p.doc_b
),
jacc AS (
  SELECT p.doc_a, p.doc_b,
         CAST(COALESCE(i.icnt, 0) AS DOUBLE)
           / (na.n + nb.n - COALESCE(i.icnt, 0)) AS jaccard
  FROM pairs p
  JOIN dsh na ON na.doc_id = p.doc_a
  JOIN dsh nb ON nb.doc_id = p.doc_b
  LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
)"""
    )


def ngram_jaccard_sql(
    shingle: int = 3,
    threshold: float = 0.8,
    num_perm: int = 32,
    bands: int = 8,
) -> str:
    return (
        "WITH "
        + _jaccard_ctes(num_perm, bands, shingle)
        + f"""
SELECT doc_a, doc_b, jaccard FROM jacc WHERE jaccard >= {threshold}"""
    )


def dedup_clusters_sql(
    shingle: int = 3,
    threshold: float = 0.8,
    num_perm: int = 32,
    bands: int = 8,
) -> str:
    """Cluster resolution over the verified near-dup pairs: component
    label = min doc_id of the connected component (transitive closure by
    a recursive CTE; propagating only labels smaller than the target node
    is safe — the component minimum is smaller than every other member —
    and keeps the closure linear-ish)."""
    return (
        "WITH RECURSIVE "
        + _jaccard_ctes(num_perm, bands, shingle)
        + f""",
dup AS (SELECT doc_a, doc_b FROM jacc WHERE jaccard >= {threshold}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM dup
  UNION ALL SELECT doc_b, doc_a FROM dup
),
reach(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.b, r.label FROM reach r JOIN edges e ON e.a = r.node
  WHERE r.label < e.b
)
SELECT node AS doc_id,
       CAST(min(label) AS BIGINT) AS cluster,
       node = min(label) AS keep
FROM reach GROUP BY node"""
    )


def simhash_sql() -> str:
    return """
WITH t AS (
  SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS tok FROM documents
),
th AS (SELECT doc_id, md5_number_lower(tok) AS h FROM t),
bits AS (
  SELECT doc_id, b.b AS bit,
         SUM(CASE WHEN (h >> CAST(b.b AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS acc
  FROM th CROSS JOIN (SELECT unnest(range(64)) AS b) b
  GROUP BY doc_id, b.b
),
hv AS (
  SELECT doc_id,
         SUM(CASE WHEN acc > 0
                  THEN CAST(CAST(1 AS UBIGINT) << CAST(bit AS INTEGER) AS HUGEINT)
                  ELSE 0 END) AS h
  FROM bits GROUP BY doc_id
)
SELECT doc_id, lpad(lower(to_hex(CAST(h AS UBIGINT))), 16, '0') AS simhash FROM hv
"""


def simhash_groups_sql() -> str:
    return (
        "WITH sh AS ("
        + simhash_sql()
        + """)
SELECT simhash,
       CAST(min(doc_id) AS BIGINT) AS canonical_doc_id,
       CAST(count(*) AS BIGINT) AS n_dups
FROM sh GROUP BY simhash HAVING count(*) >= 2
"""
    )


def quality_sql() -> str:
    """Twin of functions/text.py quality_batch (same float64 ops)."""
    return """
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS n_tokens,
         CAST(length(coalesce(text, '')) AS BIGINT) AS n_chars,
         CAST((SELECT count(*) FROM unnest(string_split(coalesce(text, ''), ' ')) AS u(tok)
               WHERE u.tok IN ('the', 'a')) AS BIGINT) AS n_stopwords
  FROM documents
)
SELECT doc_id, n_tokens,
       (CAST(n_chars AS DOUBLE) - (CAST(n_tokens AS DOUBLE) + (-1.0)))
         / greatest(CAST(n_tokens AS DOUBLE), 1.0) AS avg_token_len,
       CAST(n_stopwords AS DOUBLE)
         / greatest(CAST(n_tokens AS DOUBLE), 1.0) AS stopword_ratio
FROM t
"""



def _emb_cast(dim: int, col: str = "embedding") -> str:
    """SQL read of an embedding under the engine's null policy: a NULL
    (or absent) vector reads as the ZERO vector, so the zero-norm
    cosine = -1 rule applies on both sides. DuckDB's list kernels are
    inconsistent on NULL list inputs (NULL result on some plans, a hard
    'can not contain NULL values' error on others — a plain coalesce()
    still trips it because the kernel inspects the child validity mask),
    so the rewrite must happen at the INPUT via CASE + list_transform,
    which needs the corpus dim for the zeros literal (64 across the test
    tables, like the inlined LSH planes). Null ELEMENTS read as 0.0, the
    engine's fill on the flat values buffer."""
    zeros = "[" + ", ".join(["0.0"] * dim) + "]"
    return (
        f"CASE WHEN {col} IS NULL OR len({col}) = 0 THEN {zeros} "
        f"ELSE list_transform(CAST({col} AS DOUBLE[]), x -> coalesce(x, 0.0)) END"
    )

def _sig_expr(dim: int, nbits: int, col: str = "embedding") -> str:
    """SQL expression for the LSH bucket signature with inlined planes."""
    from shaclex_ray.functions.ann import lsh_planes

    planes = lsh_planes(dim, nbits)
    terms = []
    for b in range(nbits):
        coeffs = ", ".join(repr(float(x)) for x in planes[b])
        terms.append(
            f"(CASE WHEN list_inner_product({_emb_cast(dim, col)}, [{coeffs}]) > 0"
            f" THEN {1 << b} ELSE 0 END)"
        )
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def lsh_buckets_sql(dim: int, nbits: int = 8) -> str:
    return f"SELECT vec_id, {_sig_expr(dim, nbits)} AS bucket_sig FROM embeddings"


_IVF_COMMON = """
s AS (
  SELECT greatest(1, (SELECT count(*) FROM embeddings) // {nlist}) AS st
),
emb AS (
  SELECT vec_id, {emb} AS e FROM embeddings
),
cent AS (
  SELECT CAST(vec_id // s.st AS BIGINT) AS cid, e AS ce
  FROM emb, s WHERE vec_id % s.st = 0 AND vec_id // s.st < {nlist}
),
vassign AS (
  SELECT vec_id, e, cid FROM (
    SELECT v.vec_id, v.e, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY coalesce(list_cosine_similarity(v.e, c.ce), -1.0) DESC, c.cid) AS rn
    FROM emb v CROSS JOIN cent c
  ) WHERE rn = 1
)"""


def ivf_lists_sql(nlist: int = 16, dim: int = 64) -> str:
    return (
        "WITH "
        + _IVF_COMMON.format(nlist=nlist, emb=_emb_cast(dim))
        + "\nSELECT vec_id, CAST(cid AS BIGINT) AS list_id FROM vassign"
    )


def ivf_topk_sql(
    n_queries: int = 10, k: int = 5, nlist: int = 16, nprobe: int = 4,
    dim: int = 64,
) -> str:
    return (
        "WITH "
        + _IVF_COMMON.format(nlist=nlist, emb=_emb_cast(dim))
        + f""",
q AS (
  SELECT vec_id AS query_id, e AS qe FROM emb ORDER BY vec_id LIMIT {n_queries}
),
qprobe AS (
  SELECT query_id, qe, cid FROM (
    SELECT q.query_id, q.qe, c.cid,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY coalesce(list_cosine_similarity(q.qe, c.ce), -1.0) DESC, c.cid) AS rn
    FROM q CROSS JOIN cent c
  ) WHERE rn <= {nprobe}
),
scored AS (
  SELECT p.query_id, v.vec_id, coalesce(list_cosine_similarity(p.qe, v.e), -1.0) AS cos
  FROM qprobe p JOIN vassign v ON v.cid = p.cid AND v.vec_id != p.query_id
),
ranked AS (
  SELECT query_id, vec_id,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
  FROM scored
)
SELECT query_id, vec_id, rank FROM ranked WHERE rank <= {k}
"""
    )


def lsh_topk_sql(dim: int, n_queries: int = 10, k: int = 5, nbits: int = 8) -> str:
    return f"""
WITH sigs AS (
  SELECT vec_id, {_sig_expr(dim, nbits)} AS bucket_sig,
         {_emb_cast(dim)} AS e
  FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, bucket_sig, e AS qe FROM sigs
  ORDER BY vec_id LIMIT {n_queries}
),
scored AS (
  SELECT q.query_id, s.vec_id, coalesce(list_cosine_similarity(q.qe, s.e), -1.0) AS cos
  FROM q JOIN sigs s
    ON s.bucket_sig = q.bucket_sig AND s.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, vec_id,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
  FROM scored
)
SELECT query_id, vec_id, rank FROM ranked WHERE rank <= {k}
"""


def embedding_dups_sql(
    dim: int, threshold: float = 0.4, nbits: int = 48, bands: int = 6
) -> str:
    """Twin of functions/dedup.py embedding_near_dups: banded hyperplane
    LSH candidates (band value = r-bit signature slice; equality of
    (band, value) ⟺ equality of the md5 band key), cosine-verified.
    nbits <= 63: bit b contributes `1 << b` to a BIGINT signature."""
    r = nbits // bands
    vmask = (1 << r) - 1
    sig = _sig_expr(dim, nbits)
    return f"""
WITH sigs AS (
  SELECT vec_id, {sig} AS sig, {_emb_cast(dim)} AS e
  FROM embeddings
),
bandrows AS (
  SELECT vec_id, b.band, (sig >> (b.band * {r})) & {vmask} AS band_val, e
  FROM sigs CROSS JOIN (SELECT unnest(range({bands})) AS band) b
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
  FROM bandrows a JOIN bandrows b
    ON a.band = b.band AND a.band_val = b.band_val AND a.vec_id < b.vec_id
)
SELECT c.vec_id_a, c.vec_id_b
FROM cand c
JOIN sigs sa ON sa.vec_id = c.vec_id_a
JOIN sigs sb ON sb.vec_id = c.vec_id_b
WHERE coalesce(list_cosine_similarity(sa.e, sb.e), -1.0) >= {threshold}
"""


# ------------------------------------------------------- events operators


def events_window_agg_sql() -> str:
    """Twin of functions/events.py events_window_agg. Sums ride as
    integer cents (order-independent); the published doubles use the
    identical IEEE expression tree (cents/100.0, then /n)."""
    return """
WITH t AS (
  SELECT date_trunc('hour', ts) AS window_start, event_type,
         CAST(round(coalesce(value, 0.0) * 100) AS BIGINT) AS cents
  FROM events WHERE ts IS NOT NULL
)
SELECT window_start, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(cents) AS DOUBLE) / 100.0 AS sum_value,
       (CAST(sum(cents) AS DOUBLE) / 100.0) / CAST(count(*) AS DOUBLE) AS avg_value
FROM t GROUP BY window_start, event_type
"""


def events_sessions_sql(gap_minutes: int = 30) -> str:
    """Twin of functions/events.py events_sessions: a session breaks on
    inactivity strictly greater than the gap; ordering within a user is
    (ts, event_id) on both sides."""
    return f"""
WITH o AS (
  SELECT user_id, ts, event_id, CAST(round(coalesce(value, 0.0) * 100) AS BIGINT) AS cents,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL {gap_minutes} MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, cents,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       min(ts) AS session_start, max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(cents) AS DOUBLE) / 100.0 AS sum_value
FROM s GROUP BY user_id, session_id
"""


def events_asof_sql() -> str:
    """Twin of functions/events.py events_asof_view: inner as-of join,
    latest same-user 'view' with ts <= the click's ts, ties broken by
    max view event_id."""
    return """
WITH e0 AS (SELECT * FROM events
            WHERE ts IS NOT NULL AND user_id IS NOT NULL
              AND event_id IS NOT NULL),
     v AS (SELECT event_id, user_id, ts FROM e0 WHERE event_type = 'view'),
     c AS (SELECT event_id, user_id, ts FROM e0 WHERE event_type = 'click')
SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
       l.view_id, l.view_ts,
       CAST(date_diff('microsecond', l.view_ts, c.ts) AS DOUBLE)
         / 1000000.0 AS gap_sec
FROM c, LATERAL (
  SELECT v.event_id AS view_id, v.ts AS view_ts
  FROM v WHERE v.user_id = c.user_id AND v.ts <= c.ts
  ORDER BY v.ts DESC, v.event_id DESC LIMIT 1
) AS l
"""


def events_json_stats_sql() -> str:
    """Twin of functions/events.py events_json_stats (regex extraction of
    the integer props.k ≡ json_extract_string on this corpus)."""
    return """
WITH t AS (
  SELECT event_type,
         TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(k) AS BIGINT) AS n_k,
       CAST(coalesce(sum(k), 0) AS BIGINT) AS sum_k,
       CAST(coalesce(sum(k), 0) AS DOUBLE)
         / CAST(greatest(count(k), 1) AS DOUBLE) AS avg_k
FROM t GROUP BY event_type
"""
