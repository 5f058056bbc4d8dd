"""DuckDB oracle SQL mirrors for the driver correctness gate.

Each function returns ANSI SQL (DuckDB dialect) computing exactly the same
result as the matching ``queries()`` entry in ``__spark_entry__`` over the
driver parquet views (region nation customer supplier part orders lineitem
events documents embeddings).  Column names/aliases match the Spark side
column-for-column; numeric results are either integer arithmetic (exact) or
rounded at a precision where the two engines' float paths cannot diverge.
"""

from __future__ import annotations

from ..functions.text import LANG_MARKERS

# ---------------------------------------------------------------------------
# relational operator coverage
# ---------------------------------------------------------------------------

PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(l_quantity) AS DOUBLE)                    AS sum_qty,
       CAST(SUM(l_extendedprice) AS DOUBLE)               AS sum_base_price,
       CAST(SUM(l_extendedprice * (1 - l_discount)) AS DOUBLE) AS sum_disc_price,
       ROUND(AVG(l_quantity), 6)                          AS avg_qty,
       ROUND(AVG(l_discount), 6)                          AS avg_disc,
       COUNT(*)                                           AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""

ORDERS_PER_NATION = """
SELECT n.n_name AS nation,
       COUNT(*) AS n_orders,
       CAST(SUM(o.o_totalprice) AS DOUBLE) AS total_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""

TOPK_ORDERS = """
SELECT o_custkey, o_orderkey, rnk
FROM (
  SELECT o_custkey, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders
) WHERE rnk <= 2
"""

VOTE_THRESHOLD = """
WITH per AS (
  SELECT o_custkey, COUNT(*) AS checks,
         SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS hits
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, checks,
       CAST(CASE WHEN checks <= 2 THEN hits = checks
                 ELSE hits >= checks * 0.66 END AS INT) AS vote_yes
FROM per
"""

SEMI_ANTI_COUNTS = """
SELECT
  (SELECT COUNT(*) FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS with_orders,
  (SELECT COUNT(*) FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS without_orders
"""

DISTINCT_PARTS = """
SELECT p_brand, COUNT(DISTINCT p_type) AS n_types, COUNT(*) AS n_parts
FROM part GROUP BY p_brand
"""

# ---------------------------------------------------------------------------
# events (sessionization / windowed aggregation)
# ---------------------------------------------------------------------------

EVENTS_SESSIONS = """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE OR
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
)
SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM g GROUP BY user_id
"""

EVENTS_JSON = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type
"""
# ^ the outer CAST matters: DuckDB types SUM(BIGINT) as HUGEINT (int128),
# which pandas fetchdf materializes as float64 — the driver then hashes
# "99111.0" against Spark's int64 "99111" and reports a value mismatch on
# identical numbers.  Every oracle whose OUTPUT column sums an integer must
# cast the sum back to BIGINT (DOUBLE-summing oracles are unaffected).

EVENTS_ASOF = """
WITH l AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
r AS (
  SELECT user_id, ts, MAX(event_id) AS event_id
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
)
SELECT l.event_id, l.user_id, l.ts, r.event_id AS r_event_id
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
"""

RANGE_JOIN_COUNT = """
WITH pts AS (
  SELECT c_custkey AS point_id, CAST((c_custkey * 37) % 10000 AS DOUBLE) AS v
  FROM customer
),
iv AS (
  SELECT s_suppkey AS interval_id,
         CAST((s_suppkey * 13) % 9000 AS DOUBLE) AS lo,
         CAST(((s_suppkey * 13) % 9000) + 120 + (s_suppkey % 7) * 260 AS DOUBLE) AS hi
  FROM supplier
)
SELECT interval_id, COUNT(*) AS n_points, MIN(v) AS min_v
FROM pts JOIN iv ON v >= lo AND v < hi
GROUP BY interval_id
"""

def _events_rollup_sql() -> str:
    from ..functions.rounding import sql_pyround

    r = sql_pyround("SUM(CAST(ROUND(value * 100) AS BIGINT)) / (COUNT(*) * 100.0)", 4)
    return f"""
SELECT date_trunc('day', ts) AS day, event_type,
       COUNT(*) AS n, {r} AS avg_value
FROM events GROUP BY 1, 2
"""


EVENTS_ROLLUP = _events_rollup_sql()

def _distinct_sketch_sql(k: int = 64) -> str:
    from ..functions.rounding import sql_pyround

    est = sql_pyround(
        f"CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE) "
        f"ELSE ({k} - 1) * 2147483648.0 / h_k END", 4)
    return f"""
WITH hashes AS (
  SELECT DISTINCT event_type, (user_id * 2654435761) % 2147483648 AS h
  FROM events
),
sk AS (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS r
    FROM hashes
  ) WHERE r <= {k}
),
agg AS (
  SELECT event_type, COUNT(*) AS n_kept, MAX(h) AS h_k FROM sk GROUP BY 1
),
ex AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS n_exact FROM events GROUP BY 1
)
SELECT a.event_type, a.n_kept, {est} AS est_distinct, ex.n_exact
FROM agg a JOIN ex USING (event_type)
"""


DISTINCT_SKETCH = _distinct_sketch_sql()

EVENTS_TUMBLING = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n, ROUND(AVG(value), 6) AS avg_value
FROM events GROUP BY 1, 2
"""

# ---------------------------------------------------------------------------
# documents: dedup family + text analysis
# ---------------------------------------------------------------------------

DEDUP_EXACT = """
SELECT MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_dups
FROM documents GROUP BY text
"""

_WORD_TOKENS = """
tokens AS (
  SELECT DISTINCT doc_id, w AS word
  FROM (SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS w FROM documents)
  WHERE w <> ''
)
"""

#: 3-word shingles (the jaccard/minhash token space; see operators/dedup.py)
_TOKENS = """
tokens AS (
  SELECT DISTINCT doc_id, ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS word
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
       UNNEST(range(0, GREATEST(len(ws) - 2, 0))) AS t(i)
  WHERE ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] <> ''
)
"""

_WORD_IDS = _TOKENS + """,
vocab AS (
  SELECT word, DENSE_RANK() OVER (ORDER BY word) AS word_id
  FROM (SELECT DISTINCT word FROM tokens)
),
tok_ids AS (SELECT t.doc_id, v.word_id FROM tokens t JOIN vocab v USING (word))
"""

JACCARD_PAIRS = "WITH " + _TOKENS + """,
sizes AS (SELECT doc_id, COUNT(*) AS n FROM tokens GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
  FROM tokens a JOIN tokens b USING (word)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, common,
       ROUND(common / (na.n + nb.n - common), 6) AS jaccard
FROM common
JOIN sizes na ON na.doc_id = doc_a
JOIN sizes nb ON nb.doc_id = doc_b
WHERE common / (na.n + nb.n - common) >= {threshold}
"""


def _minhash_cand_ctes(n_hashes: int, bands: int) -> str:
    """The shared sig -> banded -> cand CTE chain of both minhash verifies
    (mirrors operators/dedup.minhash_lsh_pairs candidate generation)."""
    rows = n_hashes // bands
    p = 2147483647
    sig_cols = ",\n  ".join(
        f"MIN((word_id * {2 * i + 1} + {31 * i + 7}) % {p}) AS h{i}"
        for i in range(n_hashes)
    )
    band_vals = ", ".join(
        "concat_ws('_', " + ", ".join(f"h{b * rows + r}" for r in range(rows)) + ")"
        for b in range(bands)
    )
    return _WORD_IDS + f""",
sig AS (SELECT doc_id, {sig_cols} FROM tok_ids GROUP BY doc_id),
banded AS (
  SELECT doc_id, band - 1 AS band, band_val FROM (
    SELECT doc_id, UNNEST([{band_vals}]) AS band_val,
           UNNEST(range(1, {bands + 1})) AS band
    FROM sig)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b USING (band, band_val)
  WHERE a.doc_id < b.doc_id
)"""


def minhash_sketch_sql(n_hashes: int = 16, bands: int = 4, threshold: float = 0.5) -> str:
    """Mirror of minhash_lsh_pairs(verify='sketch'): jaccard estimated as
    the matching-component fraction of the two signatures (exact multiples
    of 1/n_hashes, so ROUND and the threshold compare are drift-free)."""
    match_sum = " + ".join(
        f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END" for i in range(n_hashes)
    )
    return "WITH " + _minhash_cand_ctes(n_hashes, bands) + f"""
SELECT c.doc_a, c.doc_b,
       ROUND(({match_sum}) / {float(n_hashes)}, 6) AS jaccard
FROM cand c
JOIN sig sa ON sa.doc_id = c.doc_a
JOIN sig sb ON sb.doc_id = c.doc_b
WHERE ROUND(({match_sum}) / {float(n_hashes)}, 6) >= {threshold}
"""


def minhash_lsh_sql(n_hashes: int = 16, bands: int = 4, threshold: float = 0.5) -> str:
    return "WITH " + _minhash_cand_ctes(n_hashes, bands) + f""",
sizes AS (SELECT doc_id, COUNT(*) AS n FROM tokens GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
  FROM tokens a JOIN tokens b USING (word)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b, ROUND(common / (na.n + nb.n - common), 6) AS jaccard
FROM cand c
JOIN common USING (doc_a, doc_b)
JOIN sizes na ON na.doc_id = c.doc_a
JOIN sizes nb ON nb.doc_id = c.doc_b
WHERE common / (na.n + nb.n - common) >= {threshold}
"""


_WORD_WORD_IDS = _WORD_TOKENS + """,
vocab AS (
  SELECT word, DENSE_RANK() OVER (ORDER BY word) AS word_id
  FROM (SELECT DISTINCT word FROM tokens)
),
tok_ids AS (SELECT t.doc_id, v.word_id FROM tokens t JOIN vocab v USING (word))
"""


def simhash_sql(bits: int = 32) -> str:
    bit_sums = ",\n  ".join(
        f"SUM(CASE WHEN ((word_id * 2654435761) % 2147483648 // {1 << j}) % 2 = 1 "
        f"THEN 1 ELSE -1 END) AS b{j}"
        for j in range(bits)
    )
    recon = " + ".join(f"CASE WHEN b{j} > 0 THEN {1 << j}::BIGINT ELSE 0 END" for j in range(bits))
    return "WITH " + _WORD_WORD_IDS + f""",
agg AS (SELECT doc_id, {bit_sums} FROM tok_ids GROUP BY doc_id)
SELECT doc_id, CAST({recon} AS BIGINT) AS simhash FROM agg
"""


def _occurrences(expr: str, needle: str) -> str:
    n = needle.replace("'", "''")
    return f"CAST((length({expr}) - length(replace({expr}, '{n}', ''))) / {len(needle)} AS INT)"


def _lang_score(lang: str) -> str:
    padded = "concat(' ', lower(text), ' ')"
    return " + ".join(_occurrences(padded, f" {w} ") for w in LANG_MARKERS[lang])


def _lang_quality_parts() -> tuple[str, str, str, str]:
    """(lang argmax expr, tokens expr, punct expr, quality expr) over a
    relation exposing ``text`` and per-language ``s_{lang}`` columns —
    shared by text_stats_sql and lang_quality_sql so the two rows can
    never drift apart."""
    # argmax with alphabetical tie-break: fold in alphabetical order keeping
    # strictly-greater winners (mirrors functions/text.py lang_id)
    langs = sorted(LANG_MARKERS)
    best_s, best_l = f"s_{langs[0]}", f"'{langs[0]}'"
    for lang in langs[1:]:
        best_l = f"CASE WHEN s_{lang} > {best_s} THEN '{lang}' ELSE {best_l} END"
        best_s = f"CASE WHEN s_{lang} > {best_s} THEN s_{lang} ELSE {best_s} END"
    lang_expr = f"CASE WHEN {best_s} > 0 THEN {best_l} ELSE 'unknown' END"
    punct_strip = "text"
    for ch in [".", ",", ";", ":", "!", "?"]:
        punct_strip = f"replace({punct_strip}, '{ch}', '')"
    tokens = "CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END"
    punct = f"CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(text) - length({punct_strip}) AS DOUBLE) / length(text) END"
    any_stop = " + ".join(f"s_{lang}" for lang in langs)
    quality = f"""ROUND(
         (CASE WHEN length(text) BETWEEN 20 AND 5000 THEN 0.4
               WHEN length(text) > 0 THEN 0.1 ELSE 0.0 END)
         + (CASE WHEN {punct} > 0 AND {punct} < 0.2 THEN 0.3 ELSE 0.0 END)
         + (CASE WHEN ({any_stop}) * 10 >= {tokens} THEN 0.3 ELSE 0.0 END), 1)"""
    return lang_expr, tokens, punct, quality


def text_stats_sql() -> str:
    scores = {lang: _lang_score(lang) for lang in sorted(LANG_MARKERS)}
    lang_expr, tokens, punct, quality = _lang_quality_parts()
    from ..functions.bpe import bpe_query_sql

    return f"""
WITH s AS (
  SELECT doc_id, text,
         {", ".join(f"{sql} AS s_{lang}" for lang, sql in scores.items())}
  FROM documents
),
bpe AS ({bpe_query_sql()})
SELECT doc_id,
       length(text) AS n_chars,
       {tokens} AS n_tokens,
       bpe.n_bpe_tokens AS n_subwords,
       ROUND({punct}, 6) AS punct_ratio,
       {lang_expr} AS lang,
       {quality} AS quality
FROM s JOIN bpe USING (doc_id)
"""


def lang_quality_sql() -> str:
    """Dedicated lang_id / quality_score boundary mirror over
    functions/text.py's LANG_BOUNDARY_CASES, synthesized from customer keys
    with the SAME case table as the Spark query."""
    from ..functions.text import LANG_BOUNDARY_CASES

    n = len(LANG_BOUNDARY_CASES)
    arms = []
    for i, case in enumerate(LANG_BOUNDARY_CASES):
        lit = (f"repeat('{case[1]}', {case[2]})" if isinstance(case, tuple)
               else "'" + case.replace("'", "''") + "'")
        arms.append(f"WHEN {i} THEN {lit}")
    scores = {lang: _lang_score(lang) for lang in sorted(LANG_MARKERS)}
    lang_expr, _tokens, _punct, quality = _lang_quality_parts()
    return f"""
WITH boundary AS (
  SELECT c_custkey AS doc_id,
         CASE c_custkey % {n} {' '.join(arms)} ELSE '' END AS text
  FROM customer
),
s AS (
  SELECT doc_id, text,
         {", ".join(f"CAST({sql} AS INT) AS s_{lang}" for lang, sql in scores.items())}
  FROM boundary
)
SELECT doc_id, s_de, s_en, s_fr,
       {lang_expr} AS lang,
       {quality} AS quality
FROM s
"""


FINGERPRINT = """
WITH chars AS (
  SELECT doc_id, UNNEST(string_split(text, '')) AS ch,
         UNNEST(range(0, length(text))) AS i
  FROM documents WHERE length(text) > 0
)
SELECT doc_id,
       CAST(SUM(ascii(ch) * ([1, 31, 961, 29791])[(i % 4) + 1]) % 1000000007 AS BIGINT) AS fingerprint
FROM chars GROUP BY doc_id
"""

# ---------------------------------------------------------------------------
# embeddings: brute-force top-k, LSH buckets, near-dups
# ---------------------------------------------------------------------------

_FLAT = """
flat AS (
  SELECT vec_id, UNNEST(embedding) AS v,
         UNNEST(range(0, len(embedding))) AS d
  FROM embeddings
)
"""

_QUERY_FILTER = "vec_id % 100 = 0"


def embedding_topk_sql(k: int = 5) -> str:
    return f"""
WITH {_FLAT},
q AS (SELECT vec_id AS query_id, v AS qv, d FROM flat WHERE {_QUERY_FILTER}),
dots AS (
  SELECT q.query_id, f.vec_id,
         SUM(CAST(f.v AS DOUBLE) * CAST(q.qv AS DOUBLE)) AS dp
  FROM flat f JOIN q ON f.d = q.d
  GROUP BY 1, 2
),
norms AS (
  SELECT vec_id, sqrt(SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) AS nrm
  FROM flat GROUP BY vec_id
),
sims AS (
  SELECT d.query_id, d.vec_id,
         d.dp / (nc.nrm * nq.nrm) AS cos_sim
  FROM dots d
  JOIN norms nc ON nc.vec_id = d.vec_id
  JOIN norms nq ON nq.vec_id = d.query_id
)
SELECT query_id, vec_id, ROUND(cos_sim, 6) AS cos_sim, rank FROM (
  SELECT query_id, vec_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM sims
) WHERE rank <= {k}
"""


def _bucket_sql(n_planes: int = 8) -> str:
    sums = ",\n  ".join(
        f"SUM(CAST(v AS DOUBLE) * ((({i * 131} + d * 17) % 97) / 97.0 - 0.5)) AS s{i}"
        for i in range(n_planes)
    )
    bucket = " + ".join(
        f"CASE WHEN s{i} >= 0 THEN {1 << i}::BIGINT ELSE 0 END" for i in range(n_planes)
    )
    return f"""
sums AS (SELECT vec_id, {sums} FROM flat GROUP BY vec_id),
buckets AS (SELECT vec_id, CAST({bucket} AS BIGINT) AS bucket FROM sums)
"""


def ann_buckets_sql(n_planes: int = 8) -> str:
    return f"WITH {_FLAT}, {_bucket_sql(n_planes)} SELECT vec_id, bucket FROM buckets"


def ann_lsh_topk_sql(k: int = 5, n_planes: int = 8) -> str:
    """LSH top-k is deterministic (fixed hyperplanes), so it has an exact
    mirror: candidates share one of the query's multi-probe buckets (its own
    bucket plus every Hamming-1 neighbor), ranked by exact cosine.  Queries
    come from the same table, so the query bucket IS the corpus bucket of
    that vec_id.  A query's probe buckets are distinct and each corpus row
    has one bucket, so the probe join cannot duplicate a pair."""
    probe_rows = "\nUNION ALL\n".join(
        f"  SELECT vec_id AS query_id, xor(bucket, {1 << i}::BIGINT) AS bucket "
        f"FROM buckets WHERE {_QUERY_FILTER}"
        for i in range(n_planes)
    )
    return f"""
WITH {_FLAT}, {_bucket_sql(n_planes)},
probes AS (
  SELECT vec_id AS query_id, bucket FROM buckets WHERE {_QUERY_FILTER}
UNION ALL
{probe_rows}
),
cand AS (
  SELECT p.query_id, c.vec_id
  FROM probes p JOIN buckets c USING (bucket)
),
dots AS (
  SELECT cd.query_id, cd.vec_id,
         SUM(CAST(fc.v AS DOUBLE) * CAST(fq.v AS DOUBLE)) AS dp
  FROM cand cd
  JOIN flat fc ON fc.vec_id = cd.vec_id
  JOIN flat fq ON fq.vec_id = cd.query_id AND fq.d = fc.d
  GROUP BY 1, 2
),
norms AS (
  SELECT vec_id, sqrt(SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) AS nrm
  FROM flat GROUP BY vec_id
),
sims AS (
  SELECT d.query_id, d.vec_id, d.dp / (nc.nrm * nq.nrm) AS cos_sim
  FROM dots d
  JOIN norms nc ON nc.vec_id = d.vec_id
  JOIN norms nq ON nq.vec_id = d.query_id
)
SELECT query_id, vec_id, ROUND(cos_sim, 6) AS cos_sim, rank FROM (
  SELECT query_id, vec_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM sims
) WHERE rank <= {k}
"""


def ivf_topk_sql(k: int = 5, n_centroids: int = 16, n_probe: int = 4) -> str:
    """Exact mirror of ann.ivf_topk: seed centroids are the n_centroids
    smallest vec_ids, corpus rows assign to their max-cosine centroid
    (tie -> smallest cid), queries probe their n_probe nearest centroids."""
    return f"""
WITH {_FLAT},
cents AS (
  SELECT cseed, ROW_NUMBER() OVER (ORDER BY cseed) AS cid FROM (
    SELECT vec_id AS cseed FROM embeddings ORDER BY vec_id LIMIT {n_centroids}
  )
),
norms AS (
  SELECT vec_id, sqrt(SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) AS nrm
  FROM flat GROUP BY vec_id
),
cdots AS (
  SELECT f.vec_id, c.cid, c.cseed,
         SUM(CAST(f.v AS DOUBLE) * CAST(cf.v AS DOUBLE)) AS dp
  FROM flat f
  JOIN cents c ON TRUE
  JOIN flat cf ON cf.vec_id = c.cseed AND cf.d = f.d
  GROUP BY 1, 2, 3
),
csims AS (
  SELECT d.vec_id, d.cid, d.dp / (nv.nrm * nc.nrm) AS csim
  FROM cdots d
  JOIN norms nv ON nv.vec_id = d.vec_id
  JOIN norms nc ON nc.vec_id = d.cseed
),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY csim DESC, cid ASC) AS rn
    FROM csims
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, cid FROM (
    SELECT vec_id AS query_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY csim DESC, cid ASC) AS rn
    FROM csims WHERE {_QUERY_FILTER}
  ) WHERE rn <= {n_probe}
),
cand AS (
  SELECT p.query_id, a.vec_id FROM probes p JOIN assign a USING (cid)
),
dots AS (
  SELECT cd.query_id, cd.vec_id,
         SUM(CAST(fc.v AS DOUBLE) * CAST(fq.v AS DOUBLE)) AS dp
  FROM cand cd
  JOIN flat fc ON fc.vec_id = cd.vec_id
  JOIN flat fq ON fq.vec_id = cd.query_id AND fq.d = fc.d
  GROUP BY 1, 2
),
sims AS (
  SELECT d.query_id, d.vec_id, d.dp / (nc.nrm * nq.nrm) AS cos_sim
  FROM dots d
  JOIN norms nc ON nc.vec_id = d.vec_id
  JOIN norms nq ON nq.vec_id = d.query_id
)
SELECT query_id, vec_id, ROUND(cos_sim, 6) AS cos_sim, rank FROM (
  SELECT query_id, vec_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM sims
) WHERE rank <= {k}
"""


def embedding_near_dups_sql(threshold: float = 0.95, n_planes: int = 8) -> str:
    return f"""
WITH {_FLAT}, {_bucket_sql(n_planes)},
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM buckets a JOIN buckets b USING (bucket)
  WHERE a.vec_id < b.vec_id
),
dots AS (
  SELECT c.vec_a, c.vec_b, SUM(CAST(fa.v AS DOUBLE) * CAST(fb.v AS DOUBLE)) AS dp
  FROM cand c
  JOIN flat fa ON fa.vec_id = c.vec_a
  JOIN flat fb ON fb.vec_id = c.vec_b AND fb.d = fa.d
  GROUP BY 1, 2
),
norms AS (
  SELECT vec_id, sqrt(SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) AS nrm
  FROM flat GROUP BY vec_id
)
SELECT vec_a, vec_b, ROUND(dp / (na.nrm * nb.nrm), 6) AS cos_sim
FROM dots
JOIN norms na ON na.vec_id = vec_a
JOIN norms nb ON nb.vec_id = vec_b
WHERE dp / (na.nrm * nb.nrm) >= {threshold}
"""


REPETITION_STATS = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
  FROM documents
),
base AS (
  SELECT doc_id, len(w) AS n_words,
         CASE WHEN len(w) > 0
              THEN ROUND(1 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 6)
              ELSE 0.0 END AS dup_word_frac,
         w
  FROM t
),
bg AS (
  SELECT doc_id, w[i + 1] || ' ' || w[i + 2] AS bg
  FROM base, UNNEST(range(0, n_words - 1)) u(i)
  WHERE n_words >= 2
),
cnt AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2),
per AS (SELECT doc_id, MAX(c) AS mx, SUM(c) AS tot FROM cnt GROUP BY 1)
SELECT b.doc_id, CAST(b.n_words AS INT) AS n_words, b.dup_word_frac,
       COALESCE(ROUND(CAST(mx AS DOUBLE) / tot, 6), 0.0) AS top_bigram_frac
FROM base b LEFT JOIN per USING (doc_id)
"""


def decontaminate_sql(n: int = 5, bench_mod: int = 97) -> str:
    """Mirror of operators/quality.decontaminate with the benchmark set
    taken as documents whose doc_id % bench_mod == 0 (the driver query's
    deterministic benchmark)."""
    joins = " || ' ' || ".join(f"w[i + {k}]" for k in range(1, n + 1))
    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, {joins} AS s
  FROM t, UNNEST(range(0, len(w) - {n - 1})) u(i)
  WHERE len(w) >= {n}
),
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % {bench_mod} = 0),
hits AS (
  SELECT sh.doc_id, COUNT(*) AS n_hits
  FROM sh JOIN bench USING (s)
  GROUP BY 1
)
SELECT d.doc_id, COALESCE(h.n_hits, 0) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) > 0 AS INT) AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
"""


def dedup_groups_text_sql(threshold: float = 0.5,
                          verify: str = "exact") -> str:
    """Mirror of dedup_groups over MINHASH-LSH pairs on the documents
    table — same recursive-CTE closure as the embedding variant, proving
    the group resolver composes across pair sources.  ``verify`` selects
    the nested pairs mirror (exact Jaccard vs the sketch estimate),
    matching minhash_lsh_pairs/minhash_groups."""
    pairs_sql = (minhash_sketch_sql(threshold=threshold) if verify == "sketch"
                 else minhash_lsh_sql(threshold=threshold))
    return f"""
WITH RECURSIVE
pairs AS ({pairs_sql}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
walk(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.node
),
lab AS (SELECT node AS doc_id, MIN(lbl) AS group_id FROM walk GROUP BY node)
SELECT doc_id, group_id,
       CAST(COUNT(*) OVER (PARTITION BY group_id) AS BIGINT) AS n_members,
       CAST(doc_id = group_id AS INT) AS is_keeper
FROM lab
"""


def dedup_groups_jaccard_sql(threshold: float = 0.5) -> str:
    """Mirror of dedup_groups over NGRAM-JACCARD pairs (the PPJoin
    prefix-filter pair source) — fourth pair-source composition of the
    same recursive-CTE closure; the pairs CTE nests JACCARD_PAIRS' own
    WITH chain as a subquery."""
    pairs = JACCARD_PAIRS.format(threshold=threshold)
    return f"""
WITH RECURSIVE
pairs AS ({pairs}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
walk(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.node
),
lab AS (SELECT node AS doc_id, MIN(lbl) AS group_id FROM walk GROUP BY node)
SELECT doc_id, group_id,
       CAST(COUNT(*) OVER (PARTITION BY group_id) AS BIGINT) AS n_members,
       CAST(doc_id = group_id AS INT) AS is_keeper
FROM lab
"""


def dedup_groups_sql(threshold: float = 0.3, n_planes: int = 8) -> str:
    """Mirror of operators/dedup.dedup_groups over embedding_near_dups
    pairs: transitive closure by a recursive CTE (min reachable id per
    node == the hash-min fixpoint the Spark loop converges to)."""
    pairs = embedding_near_dups_sql(threshold, n_planes)
    return f"""
WITH RECURSIVE
pairs AS ({pairs}),
edges AS (
  SELECT vec_a AS src, vec_b AS dst FROM pairs
  UNION
  SELECT vec_b, vec_a FROM pairs
),
walk(node, lbl) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.node
),
lab AS (SELECT node AS vec_id, MIN(lbl) AS group_id FROM walk GROUP BY node)
SELECT vec_id, group_id,
       CAST(COUNT(*) OVER (PARTITION BY group_id) AS BIGINT) AS n_members,
       CAST(vec_id = group_id AS INT) AS is_keeper
FROM lab
"""


def pii_scrub_sql() -> str:
    """Mirror of operators/quality.pii_scrub over the deterministically
    PII-augmented documents table (the synth corpus carries no PII, so the
    query plants emails/IPs/phones as pure functions of doc_id — identical
    expressions on both sides).  Same patterns (RE2 <-> Java common
    subset), counts on the progressively-redacted text (each count ==
    that pass's actual replacements), md5 of the scrubbed text."""
    from ..operators.quality import PII_EMAIL, PII_IPV4, PII_PHONE

    return f"""
WITH aug AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@ex-ample.org now' ELSE '' END
    || CASE WHEN doc_id % 5 = 0 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.77' ELSE '' END
    || CASE WHEN doc_id % 7 = 0 THEN ' call +4930' || CAST(doc_id + 1000000 AS VARCHAR) || ' ok' ELSE '' END AS t
  FROM documents
),
steps AS (
  SELECT doc_id, t,
         regexp_replace(t, '{PII_EMAIL}', '<EMAIL>', 'g') AS t1
  FROM aug
),
steps2 AS (
  SELECT doc_id, t, t1,
         regexp_replace(t1, '{PII_IPV4}', '<IP>', 'g') AS t2
  FROM steps
)
SELECT doc_id,
  CAST(len(regexp_extract_all(t, '{PII_EMAIL}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(t1, '{PII_IPV4}')) AS BIGINT) AS n_ips,
  CAST(len(regexp_extract_all(t2, '{PII_PHONE}')) AS BIGINT) AS n_phones,
  md5(regexp_replace(t2, '{PII_PHONE}', '<PHONE>', 'g')) AS scrub_md5
FROM steps2
"""


def sample_split_sql(rates: dict | None = None, default_rate: float = 0.125,
                     train: float = 0.8, val: float = 0.1) -> str:
    """Mirror of operators/sampling.stratified_sample + hash_split: the
    same affine-hash bucket, the same pre-floored integer thresholds."""
    from ..operators.sampling import _K, _M

    rates = rates or {"src0": 1.0, "src1": 0.5, "src2": 0.25}
    arms = " ".join(
        f"WHEN '{k}' THEN {int(v * _M)}" for k, v in rates.items()
    )
    t1, t2 = int(train * _M), int((train + val) * _M)
    return f"""
SELECT doc_id, source,
  CASE WHEN b < {t1} THEN 'train' WHEN b < {t2} THEN 'val' ELSE 'test' END AS split
FROM (
  SELECT doc_id, source, ((doc_id % {_M}) * {_K}) % {_M} AS b FROM documents
)
WHERE b < CASE source {arms} ELSE {int(default_rate * _M)} END
"""


def corpus_curate_sql(rep_max: float = 0.6, train: float = 0.9,
                      val: float = 0.05, default_rate: float = 0.5,
                      verify: str = "sketch") -> str:
    """Mirror of the end-to-end curation composition: reuses the
    component mirrors verbatim (dedup_groups_text_sql / REPETITION_STATS /
    decontaminate_sql) as CTEs, then the same stratified-sample + split
    arithmetic as sample_split_sql — composition on both sides."""
    from ..operators.sampling import _K, _M

    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
    arms = " ".join(
        f"WHEN '{k}' THEN {int(v * _M)}" for k, v in rates.items()
    )
    t1, t2 = int(train * _M), int((train + val) * _M)
    return f"""
WITH
grp AS ({dedup_groups_text_sql(verify=verify)}),
rep AS ({REPETITION_STATS}),
dec AS ({decontaminate_sql()}),
kept AS (
  SELECT d.doc_id, d.source, ((d.doc_id % {_M}) * {_K}) % {_M} AS b
  FROM documents d
  JOIN grp USING (doc_id)
  JOIN rep USING (doc_id)
  JOIN dec USING (doc_id)
  WHERE grp.is_keeper = 1 AND rep.dup_word_frac <= {rep_max}
    AND dec.contaminated = 0
)
SELECT doc_id, source,
  CASE WHEN b < {t1} THEN 'train' WHEN b < {t2} THEN 'val' ELSE 'test' END AS split
FROM kept
WHERE b < CASE source {arms} ELSE {int(default_rate * _M)} END
"""


# ---------------------------------------------------------------------------
# image pHash near-dups (the last dedup modality: text / embeddings / images)
# ---------------------------------------------------------------------------

def _img_phash_sql() -> str:
    """DuckDB mirror of __spark_entry__._images_phash: a deterministic
    62-bit pHash per customer-derived image — cluster base (image_id % 256)
    XOR up to 7 single-bit flips at positions derived from the id.  POWER(2,
    p) is exact in IEEE double for any p <= 62, so the BIGINT cast is
    bit-exact on both engines; the xor fold order matches the Spark chain."""
    expr = ("((((c_custkey % 256) * 2654435761) % 1073741824) * 4294967296"
            " + ((c_custkey % 256) * 40503 + 17) % 2147483648)")
    for i in range(7):
        bit = (f"CASE WHEN c_custkey % 8 > {i} THEN "
               f"CAST(POWER(2, (c_custkey * {7 + 6 * i}) % 62) AS BIGINT) "
               f"ELSE 0 END")
        expr = f"xor({expr}, {bit})"
    return f"img AS (SELECT c_custkey AS image_id, {expr} AS phash FROM customer)"


def phash_near_dups_sql(max_hamming: int = 6) -> str:
    """Brute-force mirror of hamming_near_pairs over the image pHashes:
    the block-pigeonhole candidate generation is lossless (distance <=
    max_hamming implies a shared block), so the exact cross-join predicate
    IS the operator's semantics."""
    return f"""
WITH {_img_phash_sql()}
SELECT a.image_id AS img_a, b.image_id AS img_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
FROM img a JOIN img b ON a.image_id < b.image_id
WHERE bit_count(xor(a.phash, b.phash)) <= {max_hamming}
"""


def dedup_groups_images_sql(max_hamming: int = 6) -> str:
    """Mirror of dedup_groups over pHash-hamming pairs on the synthesized
    image table — the same recursive-CTE transitive closure as the text and
    embedding variants, closing the third dedup modality."""
    return f"""
WITH RECURSIVE
{_img_phash_sql()},
pairs AS (
  SELECT a.image_id AS img_a, b.image_id AS img_b
  FROM img a JOIN img b ON a.image_id < b.image_id
  WHERE bit_count(xor(a.phash, b.phash)) <= {max_hamming}
),
edges AS (
  SELECT img_a AS src, img_b AS dst FROM pairs
  UNION
  SELECT img_b, img_a FROM pairs
),
walk(node, lbl) AS (
  SELECT image_id, image_id FROM img
  UNION
  SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.node
),
lab AS (SELECT node AS image_id, MIN(lbl) AS group_id FROM walk GROUP BY node)
SELECT image_id, group_id,
       CAST(COUNT(*) OVER (PARTITION BY group_id) AS BIGINT) AS n_members,
       CAST(image_id = group_id AS INT) AS is_keeper
FROM lab
"""


def span_dedup_sql(k: int = 8, min_count: int = 2) -> str:
    """Mirror of operators/dedup.repeated_spans: k-gram occurrences over
    the NON-EMPTY lowercase whitespace tokens (dense 0-based positions),
    corpus-duplicated grams flag their interval, overlapping-or-adjacent
    intervals merge per doc (gaps-and-islands; all intervals are k long so
    LAG(start) carries the merge condition)."""
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
  FROM documents
),
grams AS (
  SELECT doc_id, i AS pos, array_to_string(ws[i+1:i+{k}], ' ') AS gram
  FROM toks, UNNEST(range(0, GREATEST(len(ws) - {k} + 1, 0))) AS t(i)
),
dup AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= {min_count}),
flagged AS (
  SELECT g.doc_id, g.pos AS s, g.pos + {k - 1} AS e
  FROM grams g JOIN dup USING (gram)
),
lagged AS (
  SELECT doc_id, s, e, LAG(s) OVER (PARTITION BY doc_id ORDER BY s) AS prev_s
  FROM flagged
),
isl AS (
  SELECT doc_id, s, e,
         SUM(CASE WHEN prev_s IS NOT NULL AND s - prev_s <= {k} THEN 0 ELSE 1 END)
           OVER (PARTITION BY doc_id ORDER BY s) AS island
  FROM lagged
)
SELECT doc_id, MIN(s) AS span_start, MAX(e) AS span_end,
       CAST(MAX(e) - MIN(s) + 1 AS BIGINT) AS n_tokens
FROM isl GROUP BY doc_id, island
"""
