"""DuckDB oracle-SQL generators for the engine's hash-based operators.

Each function returns a complete ANSI-SQL (DuckDB-dialect) query string that
replicates the corresponding fatespark operator BIT-EXACTLY on the driver's
parquet tables — including the approximate/pruned parts (LSH banding, probe
sets), not just the surviving rows. That works because every source of
randomness in the engine is a deterministic splitmix64/md5 derivation
(``dedup``, ``ann``), and every float reduction is an ordered left-fold, so
the SQL can mirror the arithmetic term by term:

- token hashes: first 8 bytes of md5 (``sqlhash.md5_u64``);
- splitmix64 chains: stepwise lateral aliases (``sqlhash.splitmix64_steps``)
  with 64-bit wrap-around emulated in HUGEINT;
- hyperplane dots: the plane matrix is inlined as repr() float literals and
  the dot is an explicit left-associated chain, matching the engine's
  ascending-dimension accumulation (``ann.plane_dots``) IEEE-exactly.

These are import-time string builders — no Spark, no DuckDB required here.
"""

from __future__ import annotations

import numpy as np

from . import sqlhash as sq

_UP = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LO = "abcdefghijklmnopqrstuvwxyz"
_WS_SQL = r"[ \t\n\r\f\v]+"
_M = 0x9E3779B97F4A7C15
_I64MAX = (1 << 63) - 1

# tokenization identical to analysis.whitespace_tokens(ascii_fold(text))
_TOK_CTE = f"""
tok AS (
  SELECT doc_id, translate(t, '{_UP}', '{_LO}') AS term
  FROM (SELECT doc_id,
               unnest(regexp_split_to_array(coalesce(text, ''), '{_WS_SQL}')) AS t
        FROM documents)
  WHERE t <> ''
)"""

_PTOKS_CTE = f"""
ptoks AS (
  SELECT doc_id,
         list_transform(
           list_filter(regexp_split_to_array(coalesce(text, ''), '{_WS_SQL}'),
                       x -> x <> ''),
           x -> translate(x, '{_UP}', '{_LO}')) AS toks
  FROM documents
)"""


def simhash_pairs_sql(max_hamming: int = 8, seed: int = 99) -> str:
    """Twin of ``dedup.simhash_near_pairs``: seeded-token-hash SimHash,
    4x16-bit band join, hamming filter. Output (id_a, id_b, hamming)."""
    seed_c = sq.splitmix64_py(seed)
    steps, final = sq.splitmix64_steps(
        sq.xor64("th", sq.u64_lit(seed_c)), "s")
    return f"""
WITH {_TOK_CTE},
tcnt AS (
  SELECT doc_id, term, count(*) AS c FROM tok GROUP BY doc_id, term
),
th AS (
  SELECT doc_id, c, {sq.md5_u64('term')} AS th FROM tcnt
),
ths AS (
  SELECT doc_id, c,
       {sq.select_steps(steps)}
  FROM th
),
bits AS (
  SELECT doc_id, b.b,
         CASE WHEN sum(CASE WHEN (({final}) >> b.b) & 1 = 1
                            THEN c ELSE -c END) > 0
              THEN (1::HUGEINT << b.b) ELSE 0::HUGEINT END AS bitv
  FROM ths CROSS JOIN generate_series(0, 63) b(b)
  GROUP BY doc_id, b.b
),
shu AS (
  SELECT doc_id, sum(bitv)::HUGEINT AS shu FROM bits GROUP BY doc_id
),
allsh AS (
  SELECT d.doc_id, {sq.to_i64('coalesce(s.shu, 0::HUGEINT)')} AS simhash
  FROM documents d LEFT JOIN shu s USING (doc_id)
),
banded AS (
  SELECT doc_id, simhash,
         t.b AS band,
         ((CASE WHEN simhash < 0 THEN simhash::HUGEINT + {sq.U64}::HUGEINT
                ELSE simhash::HUGEINT END) >> (16 * t.b)) & 65535 AS band_val
  FROM allsh CROSS JOIN generate_series(0, 3) t(b)
),
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
         x.simhash AS sa, y.simhash AS sb
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.band_val = y.band_val AND x.doc_id < y.doc_id
)
SELECT id_a, id_b, bit_count(xor(sa, sb)) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}"""


def _minhash_sig_ctes(num_hashes: int, k: int, seed: int,
                      shingle_seed: int, docs_table: str = "documents",
                      ptoks_cte: str | None = None) -> str:
    """Shared signature-derivation CTE chain (ptoks → win → wh → mh → sigv
    → sig) used by ``minhash_pairs_sql`` and ``fuzzy_decontam_sql``; k=3
    only (matches the engine default)."""
    if k != 3:
        raise NotImplementedError("SQL twin generated for k=3 only")
    init = sq.splitmix64_py(shingle_seed)
    r0 = (init * _M) % sq.U64
    seeds = [sq.splitmix64_py(i + seed * 0x9E3779B9)
             for i in range(num_hashes)]
    seed_rows = ", ".join(f"({i}, {s}::HUGEINT)"
                          for i, s in enumerate(seeds))
    w_steps, w_final = sq.splitmix64_steps("r3", "w")
    m_steps, m_final = sq.splitmix64_steps(sq.xor64("wh", "s.sv"), "m")
    return f"""{ptoks_cte if ptoks_cte is not None else _PTOKS_CTE},
win AS (
  SELECT doc_id,
         {sq.md5_u64('toks[i]')} AS h1,
         {sq.md5_u64('toks[i+1]')} AS h2,
         {sq.md5_u64('toks[i+2]')} AS h3
  FROM ptoks, unnest(range(1, len(toks) - 1)) AS u(i)
  WHERE len(toks) >= 3
),
wh AS (
  SELECT doc_id,
         {sq.add64(sq.u64_lit(r0), 'h1')} AS r1,
         {sq.add64(sq.mul64('r1', sq.u64_lit(_M)), 'h2')} AS r2,
         {sq.add64(sq.mul64('r2', sq.u64_lit(_M)), 'h3')} AS r3,
         {sq.select_steps(w_steps)}
  FROM win
),
mh AS (
  SELECT doc_id, s.i,
         {sq.select_steps(m_steps)}
  FROM (SELECT doc_id, {w_final} AS wh FROM wh)
  CROSS JOIN (VALUES {seed_rows}) s(i, sv)
),
sigv AS (
  SELECT doc_id, i, min({m_final}) AS mv FROM mh GROUP BY doc_id, i
),
sig AS (
  SELECT d.doc_id, g.i,
         coalesce({sq.to_i64('s.mv')}, {_I64MAX}) AS v
  FROM {docs_table} d
  CROSS JOIN generate_series(0, {num_hashes - 1}) g(i)
  LEFT JOIN sigv s ON s.doc_id = d.doc_id AND s.i = g.i
)"""


def fuzzy_decontam_sql(threshold: float = 0.5, num_hashes: int = 64,
                       k: int = 3, bands: int = 16, seed: int = 7,
                       shingle_seed: int = 1337,
                       planted_cte: str | None = None,
                       bench_pred: str = "doc_id % 25 = 0") -> str:
    """Twin of ``dedup.decontaminate_fuzzy_flags`` over a planted corpus:
    signatures over all docs, corpus bands × bench bands candidates, the
    same signature-estimate filter, per-corpus-doc aggregate. Output
    (doc_id, fuzzy_contaminated, n_bench_matches, max_jaccard_est)."""
    rows_per_band = num_hashes // bands
    up, lo, ws = _UP, _LO, _WS_SQL
    src = "planted" if planted_cte is not None else "documents"
    ptoks = f"""
ptoks AS (
  SELECT doc_id,
         list_transform(
           list_filter(regexp_split_to_array(coalesce(text, ''), '{ws}'),
                       x -> x <> ''),
           x -> translate(x, '{up}', '{lo}')) AS toks
  FROM {src}
)"""
    head = (f"{planted_cte},{ptoks}" if planted_cte is not None else ptoks)
    sig_chain = _minhash_sig_ctes(num_hashes, k, seed, shingle_seed,
                                  docs_table=src, ptoks_cte=head)
    return f"""
WITH {sig_chain},
bands AS (
  SELECT doc_id, i // {rows_per_band} AS band, list(v ORDER BY i) AS key
  FROM sig GROUP BY doc_id, i // {rows_per_band}
),
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.key = y.key
  WHERE y.doc_id IN (SELECT doc_id FROM {src} WHERE {bench_pred})
),
est AS (
  SELECT c.id_a, c.id_b,
         sum(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END) / {float(num_hashes)}
           AS jaccard_est
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.id_a
  JOIN sig sb ON sb.doc_id = c.id_b AND sb.i = sa.i
  GROUP BY c.id_a, c.id_b
),
hits AS (
  SELECT id_a, count(*) AS n_bench_matches,
         max(jaccard_est) AS max_jaccard_est
  FROM est WHERE jaccard_est >= {threshold}
  GROUP BY id_a
)
SELECT d.doc_id,
       (h.n_bench_matches IS NOT NULL) AS fuzzy_contaminated,
       coalesce(h.n_bench_matches, 0)::BIGINT AS n_bench_matches,
       round(coalesce(h.max_jaccard_est, 0.0), 4) AS max_jaccard_est
FROM {src} d LEFT JOIN hits h ON h.id_a = d.doc_id
ORDER BY d.doc_id"""


def minhash_pairs_sql(threshold: float = 0.35, num_hashes: int = 64,
                      k: int = 3, bands: int = 16, seed: int = 7,
                      shingle_seed: int = 1337) -> str:
    """Twin of ``dedup.minhash_dedup_pairs``: rolling-polynomial k-shingle
    hashes, per-seed minima, banded candidates, signature-estimate filter.
    Output (id_a, id_b, jaccard_est). Only k=3 window joins are generated
    (matches the engine default)."""
    rows_per_band = num_hashes // bands
    sig_chain = _minhash_sig_ctes(num_hashes, k, seed, shingle_seed)
    return f"""
WITH {sig_chain},
bands AS (
  SELECT doc_id, i // {rows_per_band} AS band, list(v ORDER BY i) AS key
  FROM sig GROUP BY doc_id, i // {rows_per_band}
),
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
),
est AS (
  SELECT c.id_a, c.id_b,
         sum(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END) / {float(num_hashes)}
           AS jaccard_est
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.id_a
  JOIN sig sb ON sb.doc_id = c.id_b AND sb.i = sa.i
  GROUP BY c.id_a, c.id_b
)
SELECT id_a, id_b, jaccard_est FROM est
WHERE jaccard_est >= {threshold}"""


def _dot_fold(vec_expr: str, plane: np.ndarray) -> str:
    """Explicit left-associated dot product — IEEE-identical to
    ``ann.plane_dots``'s ascending-dimension accumulation."""
    terms = "".join(
        f" + ({vec_expr}[{d + 1}]::DOUBLE) * {p!r}"
        for d, p in enumerate(plane.tolist()))
    return "(0.0" + terms + ")"


def bucket_expr(vec_expr: str, planes: np.ndarray) -> str:
    """Sign-bit bucket id of ``vec_expr`` under ``planes`` — twin of
    ``ann.lsh_bucket_of`` with the plane matrix inlined as literals."""
    bits = " + ".join(
        f"(CASE WHEN {_dot_fold(vec_expr, planes[p])} > 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p in range(planes.shape[0]))
    return f"({bits})"


def lsh_topk_sql(dim: int = 64, n_planes: int = 10, n_probes: int = 128,
                 seed: int = 5, k: int = 10) -> str:
    """Twin of ``ann.lsh_topk`` for query vector = embeddings[vec_id=0],
    corpus = vec_id<>0 (the driver query): replicate bucket assignment,
    probe-set selection (hamming order, ties by bucket id), and the exact
    cosine top-k over probed buckets. Output (vec_id, cosine r4)."""
    from . import ann
    planes = ann.hyperplanes(dim, n_planes, seed)
    be = bucket_expr("embedding", planes)
    return f"""
WITH qb AS (
  SELECT {be} AS b FROM embeddings WHERE vec_id = 0
),
probe AS (
  SELECT g.b AS b
  FROM generate_series(0, {(1 << n_planes) - 1}) g(b), qb
  ORDER BY bit_count(xor(g.b::BIGINT, qb.b::BIGINT)), g.b
  LIMIT {n_probes}
),
cand AS (
  SELECT vec_id, embedding
  FROM embeddings
  WHERE vec_id <> 0 AND {be} IN (SELECT b FROM probe)
),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round(list_cosine_similarity(embedding::DOUBLE[], q.qv), 4) AS cosine
FROM cand, q
ORDER BY list_cosine_similarity(embedding::DOUBLE[], q.qv) DESC, vec_id
LIMIT {k}"""


def banded_embdup_sql(dim: int = 64, threshold: float = 0.4,
                      n_bands: int = 16, planes_per_band: int = 4,
                      seed: int = 5) -> str:
    """Twin of ``dedup.embedding_dup_pairs_banded``: per-band hyperplane
    buckets (seed + 101*band), (band, bucket) equi-join candidates, exact
    cosine verification. Replicates the PRUNING exactly, so the output
    matches even where banding recall < 1. Output (id_a, id_b, cosine r4)."""
    from . import ann
    band_exprs = ", ".join(
        f"({b}, {bucket_expr('embedding', ann.hyperplanes(dim, planes_per_band, seed=seed + 101 * b))})"
        for b in range(n_bands))
    return f"""
WITH banded AS (
  SELECT vec_id, t.band, t.bucket
  FROM embeddings,
       LATERAL (VALUES {band_exprs}) t(band, bucket)
),
cand AS (
  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.bucket = y.bucket AND x.vec_id < y.vec_id
)
SELECT c.id_a, c.id_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[],
                                    b.embedding::DOUBLE[]), 4) AS cosine
FROM cand c
JOIN embeddings a ON a.vec_id = c.id_a
JOIN embeddings b ON b.vec_id = c.id_b
WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                             b.embedding::DOUBLE[]) >= {threshold}"""


def clusters_sql(pairs_sql: str, ids_table: str = "documents",
                 id_col: str = "doc_id") -> str:
    """Twin of ``dedup.dup_clusters`` over any pair-producing oracle query:
    connected components as a recursive CTE — seed every corpus id with
    itself, walk the symmetrized edge list to a fixpoint (UNION dedups, so
    the recursion terminates), then min-reachable-id per node is exactly
    the engine's min-label component id. Output
    (id, cluster_id, cluster_size) covering all of ``ids_table``.

    ``pairs`` is forced MATERIALIZED: the recursive ``reach`` term walks
    ``edges`` (two references to ``pairs``) once per iteration, and
    without materialization DuckDB re-evaluates the full pair-derivation
    chain (minhash signatures etc.) every round — observed 8x slower on
    the driver corpus for identical output."""
    return f"""
WITH RECURSIVE pairs AS MATERIALIZED (
  {pairs_sql}
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
),
reach(id, r) AS (
  SELECT {id_col}, {id_col} FROM {ids_table}
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
),
lab AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY cluster_id)
SELECT l.id, l.cluster_id, sz.cluster_size
FROM lab l JOIN sz USING (cluster_id)"""


def pii_mask_sql(text_expr: str) -> str:
    """Twin of ``textops.pii_mask_col``: the same pattern chain, applied in
    the same order, with DuckDB's 'g' flag matching Spark's replace-all
    default. Patterns avoid alternation/lookaround so Java-regex and RE2
    agree match-for-match (see textops.PII_PATTERNS)."""
    from fatespark.textops import PII_PATTERNS
    e = f"coalesce({text_expr}, '')"
    for _, pat, repl in PII_PATTERNS:
        p = pat.replace("'", "''")
        e = f"regexp_replace({e}, '{p}', '{repl}', 'g')"
    return e


def pii_count_sql(text_expr: str) -> list[str]:
    """Twin of ``textops.pii_count_cols``: one ``n_<kind>`` projection per
    pattern via regexp_extract_all length (DuckDB's regexp count)."""
    from fatespark.textops import PII_PATTERNS
    e = f"coalesce({text_expr}, '')"
    return [
        f"len(regexp_extract_all({e}, '{pat}'))::BIGINT AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    ]


def _ivf_dist_chain(v: str, c: str, dim: int) -> str:
    """Squared-L2 chain over 1-indexed SQL arrays. Both operands live on
    the engine's exact grids (vectors: integers; centroids: 1/1024 grid),
    so every term and partial sum is exact in float64 — any summation
    order, numpy's included, gives the same bits (``ann._ivf_nearest``)."""
    terms = "".join(
        f" + (({v}[{d + 1}]) - ({c}[{d + 1}]))"
        f" * (({v}[{d + 1}]) - ({c}[{d + 1}]))"
        for d in range(dim))
    return "(0.0" + terms + ")"


def _ivf_train_ctes(dim: int, n_centroids: int, n_iters: int, seed: str,
                    where: str = "") -> list[str]:
    """Unrolled deterministic-Lloyd CTE chain shared by ``ivf_topk_sql``
    and ``semdedup_sql``: ``qv`` (floor(v*4096) quantized vectors,
    optionally filtered by ``where``), ``c0`` (md5-ordered seeding), then
    per iteration ``a{i}`` (nearest-cell assignment, (dist, cid) ties) and
    ``c{i}`` (1/1024-grid means, empty cells keep their centroid). The
    final assignment is ``a{n_iters}``, the final codebook ``c{n_iters}``
    — bit-exact twins of ``ann.ivf_train``/``ann.ivf_assign``."""
    # centroid grid: floor((sum * 1024) / n) / 1024 — sum and *1024 are
    # exact doubles, so the one rounding (the division) is shared bit-wise
    # with the engine's numpy floor(s * 1024 / n) / 1024
    mean_list = ", ".join(
        f"floor(sum(qv[{d + 1}]) * 1024.0 / count(*)) / 1024.0"
        for d in range(dim))
    src = f"FROM embeddings {where}".rstrip()
    ctes = [f"""qv AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[], x -> floor(x * 4096.0)) AS qv
  {src}
),
c0 AS (
  SELECT (row_number() OVER (
            ORDER BY md5('{seed}:' || vec_id::VARCHAR), vec_id) - 1)::INT
           AS cid,
         qv AS carr
  FROM qv
  ORDER BY md5('{seed}:' || vec_id::VARCHAR), vec_id
  LIMIT {n_centroids}
)"""]
    for i in range(1, n_iters + 1):
        dist = _ivf_dist_chain("v.qv", "c.carr", dim)
        ctes.append(f"""a{i} AS (
  SELECT vec_id, qv, cid FROM (
    SELECT v.vec_id, v.qv, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {dist}, c.cid) AS rn
    FROM qv v CROSS JOIN c{i - 1} c) WHERE rn = 1
),
c{i} AS (
  SELECT p.cid, coalesce(u.carr, p.carr) AS carr
  FROM c{i - 1} p LEFT JOIN (
    SELECT cid, [{mean_list}] AS carr
    FROM a{i} GROUP BY cid) u USING (cid)
)""")
    return ctes


def semdedup_sql(dim: int = 64, threshold: float = 0.5,
                 n_centroids: int = 8, n_iters: int = 2,
                 seed: str = "ivf") -> str:
    """Twin of ``dedup.semdedup``: the full unrolled-Lloyd clustering over
    ALL embeddings, then within-cell duplicate pairs by exact cosine
    (DuckDB's ``list_cosine_similarity`` over DOUBLE[] matches the
    engine's ordered ``zip_with``/``aggregate`` fold bit-for-bit — proven
    by the dd_embdup rows), and keep = no same-cell neighbor with a
    smaller id at cosine ≥ threshold. Output (vec_id, ivf_cid, keep)."""
    ctes = _ivf_train_ctes(dim, n_centroids, n_iters, seed)
    cn = f"c{n_iters}"
    # final assignment against the FINAL codebook (a{i} in the chain is the
    # assignment against c{i-1} that produced c{i} — one codebook behind)
    dist_f = _ivf_dist_chain("v.qv", "c.carr", dim)
    ctes.append(f"""af AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {dist_f}, c.cid) AS rn
    FROM qv v CROSS JOIN {cn} c) WHERE rn = 1
)""")
    an = "af"
    return "WITH " + ",\n".join(ctes) + f""",
removed AS (
  SELECT DISTINCT y.vec_id AS id
  FROM {an} x
  JOIN {an} y ON x.cid = y.cid AND x.vec_id < y.vec_id
  JOIN embeddings ea ON ea.vec_id = x.vec_id
  JOIN embeddings eb ON eb.vec_id = y.vec_id
  WHERE list_cosine_similarity(ea.embedding::DOUBLE[],
                               eb.embedding::DOUBLE[]) >= {threshold}
)
SELECT a.vec_id, a.cid AS ivf_cid,
       (r.id IS NULL) AS keep
FROM {an} a LEFT JOIN removed r ON r.id = a.vec_id
ORDER BY a.vec_id"""


def ivf_topk_sql(dim: int = 64, n_centroids: int = 8, n_iters: int = 2,
                 n_probes: int = 3, seed: str = "ivf", k: int = 10) -> str:
    """Twin of ``ann.IvfVectorIndex`` for query vector = embeddings[vec_id=0],
    corpus = vec_id<>0 (the driver query): replicates the WHOLE training —
    md5-ordered seeding, ``n_iters`` unrolled Lloyd iterations over
    floor(v*4096) quantized vectors with 1/1024-grid centroids (all
    distance arithmetic exact in float64, so aggregation order cannot
    matter), nearest-cell assignment with (dist, cid) ties, probe-cell
    selection, and the exact cosine top-k over probed cells. The PRUNING is replicated bit-exactly, not just the output."""
    ctes = _ivf_train_ctes(dim, n_centroids, n_iters, seed,
                           where="WHERE vec_id <> 0")
    cn = f"c{n_iters}"
    dist_q = _ivf_dist_chain("qq.qq", "c.carr", dim)
    dist_f = _ivf_dist_chain("v.qv", "c.carr", dim)
    ctes.append(f"""qq AS (
  SELECT list_transform(embedding::DOUBLE[], x -> floor(x * 4096.0)) AS qq
  FROM embeddings WHERE vec_id = 0
),
probe AS (
  SELECT c.cid FROM {cn} c, qq
  ORDER BY {dist_q}, c.cid LIMIT {n_probes}
),
af AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {dist_f}, c.cid) AS rn
    FROM qv v CROSS JOIN {cn} c) WHERE rn = 1
),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)""")
    return "WITH " + ",\n".join(ctes) + f"""
SELECT e.vec_id,
       round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 4)
         AS cosine
FROM embeddings e JOIN af ON af.vec_id = e.vec_id, q
WHERE af.cid IN (SELECT cid FROM probe)
ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv) DESC, e.vec_id
LIMIT {k}"""


def pq_topk_sql(dim: int = 64, m_sub: int = 4, n_centroids: int = 8,
                n_iters: int = 2, seed: str = "pq", k: int = 10) -> str:
    """Twin of ``ann.PqVectorIndex`` for query vector = embeddings[vec_id=0],
    corpus = vec_id<>0: replicates the WHOLE product-quantization pipeline —
    one shared md5-ordered seeding, per-subspace unrolled Lloyd over the
    sliced floor(v*4096) vectors with 1/1024-grid centroids, per-subspace
    code assignment with (dist, cid) ties, the query's ADC distance tables,
    and the final m_sub-way lookup sum — all exact float64 (same grids as
    IVF, so summation order cannot matter) and therefore hash-exact.
    Output (vec_id, adc) ascending, ties by vec_id."""
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    dsub = dim // m_sub
    ctes = [f"""qv AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[], x -> floor(x * 4096.0)) AS qv
  FROM embeddings WHERE vec_id <> 0
),
c0full AS (
  SELECT (row_number() OVER (
            ORDER BY md5('{seed}:' || vec_id::VARCHAR), vec_id) - 1)::INT
           AS cid,
         qv AS carr
  FROM qv
  ORDER BY md5('{seed}:' || vec_id::VARCHAR), vec_id
  LIMIT {n_centroids}
),
qqfull AS (
  SELECT list_transform(embedding::DOUBLE[], x -> floor(x * 4096.0)) AS qq
  FROM embeddings WHERE vec_id = 0
)"""]
    mean_list = ", ".join(
        f"floor(sum(qv[{d + 1}]) * 1024.0 / count(*)) / 1024.0"
        for d in range(dsub))
    dist = _ivf_dist_chain("v.qv", "c.carr", dsub)
    for m in range(m_sub):
        lo, hi = m * dsub + 1, (m + 1) * dsub
        ctes.append(f"""v{m} AS (
  SELECT vec_id, qv[{lo}:{hi}] AS qv FROM qv
),
s{m}c0 AS (
  SELECT cid, carr[{lo}:{hi}] AS carr FROM c0full
)""")
        for i in range(1, n_iters + 1):
            ctes.append(f"""s{m}a{i} AS (
  SELECT vec_id, qv, cid FROM (
    SELECT v.vec_id, v.qv, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {dist}, c.cid) AS rn
    FROM v{m} v CROSS JOIN s{m}c{i - 1} c) WHERE rn = 1
),
s{m}c{i} AS (
  SELECT p.cid, coalesce(u.carr, p.carr) AS carr
  FROM s{m}c{i - 1} p LEFT JOIN (
    SELECT cid, [{mean_list}] AS carr
    FROM s{m}a{i} GROUP BY cid) u USING (cid)
)""")
        dist_q = _ivf_dist_chain("qq.qq", "c.carr", dsub)
        ctes.append(f"""s{m}af AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {dist}, c.cid) AS rn
    FROM v{m} v CROSS JOIN s{m}c{n_iters} c) WHERE rn = 1
),
dt{m} AS (
  SELECT c.cid, {dist_q} AS d
  FROM s{m}c{n_iters} c,
       (SELECT qq[{lo}:{hi}] AS qq FROM qqfull) qq
)""")
    joins = "\n".join(
        f"JOIN s{m}af a{m} ON a{m}.vec_id = a0.vec_id\n"
        f"JOIN dt{m} d{m} ON d{m}.cid = a{m}.cid"
        if m else "JOIN dt0 d0 ON d0.cid = a0.cid"
        for m in range(m_sub))
    adc = " + ".join(f"d{m}.d" for m in range(m_sub))
    return "WITH " + ",\n".join(ctes) + f"""
SELECT a0.vec_id, ({adc}) AS adc
FROM s0af a0
{joins}
ORDER BY ({adc}), a0.vec_id
LIMIT {k}"""
