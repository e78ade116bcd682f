"""Shared DuckDB oracle-SQL builders — NO query registrations here, so any
query module (or the public-API query family) can import these without
perturbing the registry's registration order."""

from __future__ import annotations

# DuckDB shingle CTE shared by the dedup oracles (1-based list indexing)
SHINGLES_CTE = """
    t AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts FROM documents
    ), sh AS (
        SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(ts) >= 3
                 THEN list_transform(generate_series(1, len(ts) - 2),
                                     i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])
                 ELSE [] END)) AS shingle
        FROM t
    )
"""


# Engine-portable SimHash fingerprints (60-bit, md5 token hashes) —
# byte-identical to operators/dedup.py::simhash_md5; shared by the
# fingerprint, pair and survivorship oracles.
SIMHASH_MD5_FP_CTES = """
    toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents
    ), h AS (
        SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv FROM toks
    ), votes AS (
        SELECT doc_id, g.i AS i,
               SUM(CASE WHEN ((hv >> g.i) & 1) = 1 THEN 1 ELSE -1 END) AS v
        FROM h, generate_series(0, 59) AS g(i)
        GROUP BY doc_id, g.i
    ), fp AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS simhash60
        FROM votes GROUP BY doc_id
    )
"""


def lsh_sig_sql(vec: str, n_planes: int = 4, dim: int = 64) -> str:
    """DuckDB SQL for the hyperplane sign signature — plane p's component
    for (1-based) dim i: ascii(first hex char of md5('plane{p}d{i-1}'))
    even → +1 else -1 — mirrored in operators/similarity.py."""
    bits = []
    for p in range(n_planes):
        dotp = (
            f"list_sum(list_transform(generate_series(1, {dim}), "
            f"i -> CAST({vec}[i] AS DOUBLE) * "
            f"(CASE WHEN ascii(substr(md5('plane{p}d' || CAST(i - 1 AS VARCHAR)), 1, 1)) % 2 = 0 "
            f"THEN 1.0 ELSE -1.0 END)))"
        )
        bits.append(f"(CASE WHEN {dotp} >= 0 THEN '1' ELSE '0' END)")
    return " || ".join(bits)


def minhash_cand_ctes(num_hashes: int = 8, rows_per_band: int = 4) -> str:
    """CTE chain ``sig``, ``bands``, ``cand`` (distinct candidate id pairs)
    building on the ``sh`` CTE from :data:`SHINGLES_CTE` — md5 end-to-end,
    byte-identical to operators/dedup.py::minhash_candidate_pairs."""
    n_bands = num_hashes // rows_per_band
    mins = ",\n               ".join(
        f"MIN(md5(shingle || '#{i}')) AS mh{i}" for i in range(num_hashes)
    )
    band_selects = []
    for b in range(n_bands):
        cols = " || '|' || ".join(f"mh{i}" for i in range(b * rows_per_band, (b + 1) * rows_per_band))
        band_selects.append(
            f"SELECT doc_id, {b} AS band_idx, md5({cols}) AS bucket FROM sig"
        )
    bands_sql = "\n        UNION ALL\n        ".join(band_selects)
    return f"""
    sig AS (
        SELECT doc_id,
               {mins}
        FROM sh GROUP BY doc_id
    ), bands AS (
        {bands_sql}
    ), cand AS (
        SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        FROM bands x JOIN bands y
          ON x.band_idx = y.band_idx AND x.bucket = y.bucket AND x.doc_id < y.doc_id
    )"""


def minhash_oracle(num_hashes: int = 8, rows_per_band: int = 4) -> str:
    """MinHash signatures + LSH banding candidate pairs, md5 end-to-end —
    byte-identical to operators/dedup.py::minhash_candidate_pairs."""
    return f"""
    WITH {SHINGLES_CTE},
    {minhash_cand_ctes(num_hashes, rows_per_band)}
    SELECT id_a, id_b FROM cand
    """
