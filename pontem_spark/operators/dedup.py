"""Deduplication operators for web-scale corpora.

Four tiers, in increasing recall / decreasing precision:

1. **exact** — hash-groupBy on a content fingerprint. One shuffle on the
   hash; at 100 TB the md5 (16 bytes) shuffles instead of the document body.
2. **n-gram Jaccard** — exact set similarity on word shingles via an
   inverted-index self-join. Exact but quadratic in the worst case; at scale
   you run it only on candidate pairs from tier 3.
3. **MinHash + LSH banding** — signatures from per-shingle hashes, candidate
   pairs from band-bucket equality. Linear shuffle volume, tunable recall
   (P[candidate] = 1-(1-J^rows_per_band)^n_bands).
4. **SimHash** — 64-bit locality-sensitive fingerprint; near-dups differ in
   few bits. Cheapest at scale (fingerprints join/fuzzy-match directly).

All hashing uses md5 (byte-identical across engines) where an oracle checks
results, and xxhash64 (faster, JVM-intrinsic) where it doesn't (simhash).
No Python UDFs anywhere — everything is Column-expression / higher-order
function work that stays in WholeStageCodegen.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, functions as F

from pontem_spark.functions.compat import rnd
from pontem_spark.functions import text as T
from pontem_spark.operators.util import ensure_parallelism


def _persist(df: DataFrame, storage_level: str | None) -> DataFrame:
    """Persist an intermediate that multiple downstream branches re-read.

    ``None`` → MEMORY_AND_DISK (right locally and for sampled runs). At
    corpus scale pass ``"DISK_ONLY"``: a 100 TB shingle index must not
    compete with shuffle/execution memory — spilling it up front is cheaper
    than evicting it mid-join.
    """
    if storage_level is None:
        return df.cache()
    level = getattr(StorageLevel, storage_level) if isinstance(storage_level, str) else storage_level
    return df.persist(level)


def _tokens_distinct_shingles(df: DataFrame, id_col: str, text_col: str, ngram: int) -> DataFrame:
    """(id, shingle) exploded inverted-index rows, shingles deduped per doc.

    Two deliberate plan choices:
    - ``explode_outer`` + post-filter instead of ``explode``: plain explode
      makes Catalyst synthesize a not-null/non-empty pre-filter that clones
      the whole (interpreted, HOF-based) shingle expression and pushes it to
      the scan — tripling the most expensive expression in the pipeline.
    - per-doc dedup via ``dropDuplicates`` AFTER the explode (codegen hash
      aggregate) instead of ``array_distinct`` inside the array (interpreted,
      quadratic, measured 40x slower).
    Input is rebalanced first: shingling is CPU-dense and explodes ~50x, so
    it must run wide even when the source is a single small file."""
    df = ensure_parallelism(df)
    return (
        df.select(id_col, T.tokens(text_col).alias("__toks"))
        .select(id_col, F.explode_outer(T.shingles("__toks", ngram)).alias("shingle"))
        .filter(F.col("shingle").isNotNull())
        .dropDuplicates([id_col, "shingle"])
    )


def exact_duplicates(df: DataFrame, id_col: str, text_col: str, normalized: bool = True) -> DataFrame:
    """Groups of byte-identical (optionally case/whitespace-normalized) docs.

    Returns (content_hash, n_docs, keep_id) — ``keep_id`` is the smallest id,
    the canonical survivor. Only the 32-char hash shuffles, never the text.
    """
    content = F.lower(F.trim(F.col(text_col))) if normalized else F.col(text_col)
    return (
        df.select(F.md5(content).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


def jaccard_similar_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    ngram: int = 3,
    round_digits: int = 4,
    storage_level: str | None = None,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram-shingle Jaccard similarity pairs above ``threshold``.

    Inverted-index plan: explode distinct shingles → self-equi-join on the
    shingle (this is a plain shuffle-hash join Catalyst handles) → count
    intersections per pair → Jaccard from the per-doc set sizes.

    Scale note: the join key (shingle) is the skew hazard — a boilerplate
    shingle shared by millions of docs creates a quadratic bucket.
    ``max_doc_freq`` is the standard mitigation: drop shingles whose
    document frequency exceeds the cap BEFORE the self-join (a shingle in
    thousands of docs carries no dedup signal — it only identifies the
    boilerplate, not the document). Set sizes and Jaccard are then computed
    over the RETAINED shingles on both engines, so the capped variant stays
    oracle-exact. With the cap set, the join's worst bucket is bounded by
    max_doc_freq² — linear total work — and the raw quadratic tier is gone;
    alternatively feed candidates from :func:`minhash_candidate_pairs`.
    """
    # Attach each doc's set size via an unordered window count — no extra
    # join and no recompute of the shingle pipeline for the union size.
    from pyspark.sql import Window

    sh = _tokens_distinct_shingles(df, id_col, text_col, ngram)
    if max_doc_freq is not None:
        # document frequency via a shingle-partitioned window count: the
        # shuffle it costs co-partitions by shingle — exactly the
        # partitioning the self-join needs next, so AQE reuses it
        sh = (
            sh.withColumn(
                "__df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
            )
            .filter(F.col("__df") <= max_doc_freq)
            .drop("__df")
        )
    sh = _persist(
        sh.withColumn("set_size", F.count(F.lit(1)).over(Window.partitionBy(id_col))),
        storage_level,  # referenced twice (both join sides)
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"), "shingle")
    jac = rnd(
        F.col("n_common") / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
        round_digits,
    )
    return (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    ngram: int = 3,
) -> DataFrame:
    """MinHash signature per doc: for seed i, min over shingles of
    md5(shingle || '#' || i). md5-on-purpose: cross-engine deterministic, so
    the LSH pipeline itself is oracle-checkable (rare for LSH implementations).

    Plan shape: explode shingles, ONE groupBy(id) computing all ``num_hashes``
    mins in a single aggregation pass (not num_hashes passes).
    """
    sh = _tokens_distinct_shingles(df, id_col, text_col, ngram)
    mins = [
        F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{i}")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*mins)


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    rows_per_band: int = 4,
    ngram: int = 3,
    storage_level: str | None = None,
) -> DataFrame:
    """LSH banding: hash each band of ``rows_per_band`` signature slots to a
    bucket; docs sharing any (band_idx, bucket) are candidate near-dup pairs.

    The candidate join is an equi-join on (band_idx, bucket) — linear shuffle,
    no cross product. Returns distinct (id_a, id_b) with id_a < id_b.
    """
    assert num_hashes % rows_per_band == 0
    n_bands = num_hashes // rows_per_band
    sig = minhash_signatures(df, id_col, text_col, num_hashes, ngram)

    # ONE pass over signatures: explode an array of (band_idx, bucket)
    # structs instead of unioning n_bands re-computations of the pipeline.
    band_structs = []
    for b in range(n_bands):
        cols = [F.col(f"mh{i}") for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        band_structs.append(
            F.struct(F.lit(b).alias("band_idx"), F.md5(F.concat_ws("|", *cols)).alias("bucket"))
        )
    all_bands = _persist(
        sig.select(F.col(id_col), F.explode(F.array(*band_structs)).alias("__b"))
        .select(id_col, F.col("__b.band_idx").alias("band_idx"), F.col("__b.bucket").alias("bucket")),
        storage_level,  # tiny (n_docs x n_bands); joined against itself below
    )

    x = all_bands.alias("x")
    y = all_bands.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_hashes: int = 8,
    rows_per_band: int = 4,
    ngram: int = 3,
    round_digits: int = 4,
    storage_level: str | None = None,
) -> DataFrame:
    """The at-scale composed dedup pipeline: MinHash-LSH candidates →
    exact Jaccard verification ON THE CANDIDATES ONLY.

    This retires the hot-shingle quadratic tier of
    :func:`jaccard_similar_pairs`: the plan contains NO self-join on the
    shingle key. Candidates come from the (band_idx, bucket) equi-join —
    linear shuffle — and the verify step intersects shingle sets by joining
    candidates to the inverted index on the DOC ID:

        cand(id_a, id_b) ⋈ sh(id_a) on id_a  → one row per (pair, a-shingle)
                          ⋈ sh(id_b) on (id_b, shingle) → common shingles

    Work is |candidates| x avg_set_size — linear in candidate volume, which
    LSH keeps proportional to true near-dups. Recall bound is the banding
    probability 1-(1-J^rows_per_band)^n_bands (≈ 1 for J ≥ threshold with
    the defaults); precision is exact because every emitted pair passed true
    Jaccard. The shingle index is computed ONCE and persisted — signatures,
    sizes, and both verify sides all read it.
    """
    from pyspark.sql import Window

    sh = _persist(
        _tokens_distinct_shingles(df, id_col, text_col, ngram)
        .withColumn("set_size", F.count(F.lit(1)).over(Window.partitionBy(id_col))),
        storage_level,
    )

    # signatures from the SAME persisted index (one aggregation pass)
    mins = [
        F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{i}")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy(id_col).agg(*mins)

    assert num_hashes % rows_per_band == 0
    n_bands = num_hashes // rows_per_band
    band_structs = []
    for b in range(n_bands):
        cols = [F.col(f"mh{i}") for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        band_structs.append(
            F.struct(F.lit(b).alias("band_idx"), F.md5(F.concat_ws("|", *cols)).alias("bucket"))
        )
    bands = sig.select(F.col(id_col), F.explode(F.array(*band_structs)).alias("__b")).select(
        id_col, F.col("__b.band_idx").alias("band_idx"), F.col("__b.bucket").alias("bucket")
    )
    x, y = bands.alias("x"), bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b"))
        .distinct()
    )

    a = sh.select(
        F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"), "shingle"
    )
    b = sh.select(
        F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"), "shingle"
    )
    jac = rnd(
        F.col("n_common") / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
        round_digits,
    )
    return (
        cand.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_md5(df: DataFrame, id_col: str, text_col: str, bits: int = 60) -> DataFrame:
    """Engine-portable SimHash: the token hash is the first 15 hex chars of
    md5 read as a 60-bit integer, so ANY engine reproduces the fingerprint
    bit-for-bit (DuckDB: ``('0x' || substr(md5(tok),1,15))::BIGINT``) —
    the oracle-checkable twin of the xxhash64 :func:`simhash` production
    path. 60 bits keeps the fingerprint strictly positive in a signed
    BIGINT on every engine (no overflow-wrap divergence).

    Same plan shape as :func:`simhash`: explode tokens, ONE groupBy(id)
    aggregation computing all per-bit votes, fingerprint assembled from the
    vote signs. All codegen, no UDF.
    """
    assert bits <= 62, "fingerprint must stay positive in a signed 64-bit int"
    # (r14 probe: a (doc, token)-count pre-aggregation before the vote
    # aggregate measured SLOWER — the single groupBy(id) below already
    # partial-aggregates map-side over the repartitioned explode, while
    # the extra exchange let AQE coalesce the vote aggregate's input to
    # one partition. Kept single-pass deliberately.)
    toks = (
        ensure_parallelism(df)
        .select(id_col, T.tokens(text_col).alias("__toks"))
        .select(id_col, F.explode("__toks").alias("tok"))
        .select(id_col, F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long").alias("h"))
    )
    # The vote/assembly expressions ride ONE SQL string each (r14): built as
    # per-bit Column objects they cost ~10 Py4J round trips per bit — ~1 s of
    # driver time PER QUERY BUILD for 60 bits, re-paid on every run — while
    # parsing the identical expression text JVM-side is ~2 calls total. The
    # Catalyst trees (and therefore plans and fingerprints) are unchanged.
    votes = [
        F.expr(
            f"sum(CASE WHEN ((shiftright(h, {i}) & 1) = 1) THEN 1 ELSE -1 END)"
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    fp = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN {1 << i}L ELSE 0L END)" for i in range(bits)
    )
    return agg.select(F.col(id_col), F.expr(f"CAST(0 AS BIGINT) + {fp}").alias(f"simhash{bits}"))


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """64-bit SimHash fingerprint per document (token-level, unweighted).

    Each token hashes once with xxhash64 (JVM intrinsic); per bit, the doc
    accumulates +1/-1 by that bit of the token hash; fingerprint bit = sign.
    Implemented as an explode + one groupBy(id) over 64 conditional sums —
    heavy-looking but a single aggregation pass, all codegen, no UDF.

    Not oracle-checked (xxhash64 is Spark-specific); tested structurally and
    by the Hamming-distance property on known near-dups.
    """
    toks = (
        ensure_parallelism(df).select(id_col, T.tokens(text_col).alias("__toks"))
        .select(id_col, F.explode("__toks").alias("tok"))
        .select(id_col, F.xxhash64("tok").alias("h"))
    )
    # single-SQL-string construction for the same reason as simhash_md5
    # (~10 Py4J calls per bit otherwise; identical Catalyst trees)
    votes = [
        F.expr(
            f"sum(CASE WHEN ((shiftright(h, {i}) & 1) = 1) THEN 1 ELSE -1 END)"
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    fp = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN {1 << i}L ELSE 0L END)" for i in range(bits)
    )
    # bit 63 of a 64-bit fingerprint would need the sign bit: 1L<<63 overflows
    # a SQL bigint literal, so keep the shiftleft form for that one bit
    if bits >= 64:
        fp = " + ".join(
            [f"(CASE WHEN v{i} > 0 THEN {1 << i}L ELSE 0L END)" for i in range(63)]
            + [
                f"(CASE WHEN v{i} > 0 THEN shiftleft(1L, {i}) ELSE 0L END)"
                for i in range(63, bits)
            ]
        )
    return agg.select(F.col(id_col), F.expr(f"CAST(0 AS BIGINT) + {fp}").alias("simhash64"))


def hamming_distance(a: Column, b: Column) -> Column:
    """Popcount of XOR via bit_count (Spark 3.3+)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_band_candidates(
    fingerprints: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "simhash64",
    bits: int = 64,
    n_bands: int = 9,
    carry_hash: bool = False,
    storage_level: str | None = None,
    collapse_identical: bool = False,
    carry_cols: "list[str] | None" = None,
) -> DataFrame:
    """Candidate near-dup pairs by banding the SimHash fingerprint.

    Pigeonhole guarantee: a pair differing in at most ``n_bands - 1`` bits
    must agree EXACTLY on at least one band — so for a Hamming-``k`` query,
    ``n_bands = k + 1`` bands turn the O(n^2) pair scan into an equi-join on
    (band_idx, band_value) with NO loss of recall: candidates ⊇ all true
    pairs, and the exact Hamming filter afterwards removes false positives.

    Shuffle volume is n_bands x fingerprints (tiny rows: id + two longs).
    Worst case is a hot band value (m docs sharing one band → m^2 candidate
    pairs); with ~7-bit bands this is the inherent banding trade-off — widen
    bands (lower k / more-bit bands) when candidate volume dominates.

    Returns distinct (id_a, id_b), id_a < id_b. With ``carry_hash=True`` the
    band rows carry the fingerprint through the join and the result is
    NON-distinct (id_a, id_b, h_a, h_b) — one candidate row per shared band
    — so the caller can apply its cheap verify filter (e.g. Hamming ≤ k)
    BEFORE the dedup shuffle instead of joining fingerprints back in twice.

    ``collapse_identical=True`` is the EXACT-DUPLICATE-pressure scale path
    (r10 30x scale step: with c identical copies of each doc, every band
    bucket holds c times its natural multiplicity, so the bucket self-join
    emits c^2 candidates — measured 83.7x runtime at 30x data, the
    inherent quadratic of the all-pairs contract). It first collapses
    identical fingerprints to one representative (min id) per fingerprint
    — ONE linear groupBy — so the banded join runs over the distinct
    fingerprint set and stays linear no matter how duplicate-heavy the
    corpus. The pair set is then over REPRESENTATIVES; exact-duplicate
    members rejoin via a fingerprint equi-join (that's what a removal
    pipeline consumes — it never needs the quadratic within-group pairs).

    ``carry_cols`` generalizes ``carry_hash``: the named columns travel
    through the band join and come back suffixed _a/_b on the
    (non-distinct) candidate rows — so per-doc metadata (e.g. the
    collapse path's member counts) needs NO join back through the
    upstream pipeline (Catalyst re-derives diamond subtrees).
    """
    if collapse_identical:
        aggs = [F.min(id_col).alias(id_col)]
        for c in carry_cols or []:
            if c != hash_col:
                raise ValueError(
                    "collapse_identical with carry_cols: carry columns "
                    "other than the hash are ambiguous after collapsing; "
                    "aggregate them into the fingerprint frame first"
                )
        fingerprints = fingerprints.groupBy(hash_col).agg(*aggs)
    base, extra = divmod(bits, n_bands)
    structs, lo = [], 0
    for b in range(n_bands):
        w = base + (1 if b < extra else 0)
        mask = (1 << w) - 1
        structs.append(
            F.struct(
                F.lit(b).alias("band_idx"),
                F.shiftright(F.col(hash_col), lo).bitwiseAND(F.lit(mask)).alias("band_val"),
            )
        )
        lo += w
    carry_names = list(dict.fromkeys(
        ([hash_col] if carry_hash else []) + list(carry_cols or [])
    ))
    carry = [F.col(c) for c in carry_names]
    bands = _persist(
        fingerprints.select(F.col(id_col), *carry, F.explode(F.array(*structs)).alias("__b"))
        .select(id_col, *carry_names, F.col("__b.band_idx").alias("band_idx"), F.col("__b.band_val").alias("band_val")),
        storage_level,  # tiny (n_docs x n_bands); both self-join sides read
        # it — without it the upstream fingerprint aggregation runs twice
    )
    x, y = bands.alias("x"), bands.alias("y")
    joined = x.join(
        y,
        (F.col("x.band_idx") == F.col("y.band_idx"))
        & (F.col("x.band_val") == F.col("y.band_val"))
        & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
    )
    if carry_names:
        out_cols = [
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
        ]
        if carry_hash:
            out_cols += [
                F.col(f"x.{hash_col}").alias("h_a"),
                F.col(f"y.{hash_col}").alias("h_b"),
            ]
        for c in carry_names:
            if c == hash_col and carry_hash:
                continue  # already out as h_a/h_b
            out_cols += [
                F.col(f"x.{c}").alias(f"{c}_a"),
                F.col(f"y.{c}").alias(f"{c}_b"),
            ]
        return joined.select(*out_cols)
    return (
        joined.select(F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b"))
        .distinct()
    )


def latest_by_key(
    df: DataFrame,
    key_col: str,
    order_cols: "list[str]",
    payload_cols: "list[str]",
) -> DataFrame:
    """Temporal dedup / upsert compaction: keep each key's latest record,
    latest = lexicographic max over ``order_cols`` (include a unique id last
    for a total order).

    Implemented as ``max(struct(order..., payload...))`` — an ordinary
    aggregate, NOT ``row_number() over (partition by key)``: the aggregate
    combines map-side, so each executor first reduces its own partitions to
    one candidate per key and only those survivors shuffle. The window form
    shuffles EVERY version of every key and at 100 TB of CDC history that is
    the whole table; the agg shuffles ~|keys| rows.
    """
    fields = [F.col(c) for c in order_cols] + [F.col(c) for c in payload_cols]
    return (
        df.groupBy(key_col)
        .agg(F.max(F.struct(*fields)).alias("__latest"))
        .select(key_col, *[F.col(f"__latest.{c}").alias(c) for c in order_cols + payload_cols])
    )


def semantic_dedup(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    centroids,
    threshold: float,
    round_digits: int = 4,
) -> DataFrame:
    """Semantic deduplication (the SemDeDup recipe): cluster the embedding
    space, then drop every vector that has a sufficiently-similar
    LOWER-id vector in the SAME cluster. Returns the kept rows as
    ``(id, centroid_id)``.

    Scale shape: cluster assignment is the map-side argmin over the
    centroid literals (operators/ivf.py::assign_cells — zero shuffles), and
    the only join is the within-cluster self-equi-join on ``centroid_id``,
    so pairwise work is sum over clusters of |cluster|² instead of the
    corpus quadratic — at 100 TB you raise K so clusters stay bounded, and
    the pair stage is one Arrow/BLAS batch per cluster (the cluster is the
    natural applyInPandas group — same kernel as cosine_pairs_tiled).

    Determinism: the keep rule is pure (lower id wins; cosine rounded to
    ``round_digits`` before the threshold), so an oracle can re-derive the
    exact kept set given the same centroids.
    """
    from pontem_spark.operators.ivf import assign_cells
    from pontem_spark.operators.similarity import _pair_kernel

    assigned = assign_cells(corpus, centroids, id_col, vec_col, dim, n_probe=1)
    # the argmin fold is the expensive projection and both the pair stage
    # and the final anti-join reference it — Spark would recompute it per
    # branch. The assigned frame is (id, vec, cell) rows; pin it once.
    assigned = assigned.localCheckpoint(eager=True)
    # within-cluster pairs via the shared Arrow/BLAS batch kernel: one
    # applyInPandas per cluster (the cluster IS the natural batch). The
    # expanded-expression cosine measured ~26µs/pair here — the 64-term
    # pair expression exceeds what codegen handles well — while the BLAS
    # matmul does the same 250k fixture pairs in well under a second, with
    # the identical floor-rounding so the DuckDB oracle is unchanged
    # (the same kernel already backs the oracle-green cosine_pairs_tiled).
    kernel = _pair_kernel(threshold, float(10**round_digits), id_col, vec_col)
    id_type = dict(assigned.dtypes)[id_col]
    pairs = assigned.groupBy("centroid_id").applyInPandas(
        lambda pdf: kernel(pdf),
        f"id_a {id_type}, id_b {id_type}, cos_sim double",
    )
    dups = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return assigned.join(dups, on=id_col, how="left_anti").select(id_col, "centroid_id")


def fuzzy_pairs(
    df: DataFrame,
    col: str,
    max_dist: int = 2,
    block_expr: Column | None = None,
) -> DataFrame:
    """Approximate string matching: pairs of DISTINCT values of ``col``
    within edit distance ``max_dist`` — entity-resolution's first step
    (catalog names, merchant strings, near-identical titles).

    Scale shape: the self-join runs on the DISTINCT vocabulary, which is
    orders of magnitude smaller than the rows (dedup first, then match —
    never pair raw rows). ``block_expr`` (default: first whitespace token)
    turns the quadratic all-pairs into an equi-join on the block key, so
    pair work is Σ|block|²; use a coarser key (length band, soundex,
    first-k chars) when tokens don't block well. ``levenshtein`` is the
    JVM built-in — no UDF.
    """
    if block_expr is None:
        block_expr = F.split(F.col(col), r"\s+").getItem(0)
    vocab = (
        df.select(col)
        .distinct()
        .withColumn("__blk", block_expr)
        .withColumnRenamed(col, "__name")
    )
    # re-derive the block for the right side from its own name column so the
    # join condition stays a plain equi-join on materialized columns
    a = vocab.select(F.col("__name").alias("name_a"), F.col("__blk").alias("__blk"))
    b = vocab.select(F.col("__name").alias("name_b"), F.col("__blk").alias("__blk"))
    return (
        a.join(b, on="__blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("edit_dist", F.levenshtein(F.col("name_a"), F.col("name_b")))
        .filter(F.col("edit_dist") <= max_dist)
        .select("name_a", "name_b", "edit_dist")
    )


def jaccard_prefix_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    ngram: int = 3,
    round_digits: int = 4,
    storage_level: "str | None" = None,
) -> DataFrame:
    """Exact Jaccard pairs ≥ ``threshold`` via PREFIX FILTERING (the
    PPJoin/AllPairs family) — the candidate generation that scales where
    even the capped inverted index over-pairs.

    Why it is exact: order every doc's shingle set by a GLOBAL total order
    (ascending document frequency, rarest first — the order that shrinks
    candidate buckets hardest). If Jaccard(A, B) ≥ t, the sets must overlap
    in more than ``|S| - ⌈t·|S|⌉`` elements of either prefix, so two docs
    with NO shared prefix shingle can be skipped with zero false negatives.
    Only prefixes (the ``(1-t)`` rarest fraction of each set) enter the
    self-join, and each prefix shingle's bucket is small BY CONSTRUCTION —
    rare shingles pair few docs, and the hot shingles that wreck the plain
    inverted index never appear in a prefix at all.

    Verification then runs map-side: candidates join each doc's full
    shingle array once and compute the exact intersection in-row. The
    length filter ``min_size ≥ t·max_size`` (necessary for J ≥ t) prunes
    candidates before the arrays are even fetched.

    Cites: reference has no similarity surface (`pontem/series/series.py`);
    this extends SURVEY §2.G's dedup family with its best-at-scale tier.
    """
    from pyspark.sql import Window

    sh = _tokens_distinct_shingles(df, id_col, text_col, ngram)
    # global document frequency per shingle: the one shingle-keyed shuffle
    with_df = sh.withColumn(
        "__df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
    )
    # ONE per-doc aggregate yields everything doc-local: the frequency-
    # ordered shingle array (struct sort = (df, shingle) lexicographic),
    # the set size, the full set for verification, and the prefix — no
    # doc-keyed windows, no second sets aggregate
    t = float(threshold)
    docs = _persist(
        with_df.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__df"), F.col("shingle")))
            ).alias("__arr")
        )
        .select(
            F.col(id_col),
            F.size("__arr").alias("__sz"),
            F.transform("__arr", lambda x: x["shingle"]).alias("__set"),
            F.expr(
                f"transform(slice(__arr, 1, size(__arr) - cast(ceil({t!r} * size(__arr)) as int) + 1), x -> x.shingle)"
            ).alias("__prefix"),
        ),
        storage_level,
    )
    a = docs.select(
        F.col(id_col).alias("id_a"),
        F.col("__sz").alias("size_a"),
        F.explode("__prefix").alias("shingle"),
    )
    b = docs.select(
        F.col(id_col).alias("id_b"),
        F.col("__sz").alias("size_b"),
        F.explode("__prefix").alias("shingle"),
    )
    cand = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        # length filter: J >= t forces min >= t * max
        .filter(
            F.least("size_a", "size_b")
            >= F.lit(t) * F.greatest("size_a", "size_b")
        )
        .select("id_a", "id_b", "size_a", "size_b")
        .distinct()
    )
    inter = F.size(F.array_intersect(F.col("__sa"), F.col("__sb")))
    j = F.col("__n_common") / (F.col("size_a") + F.col("size_b") - F.col("__n_common"))
    return (
        cand.join(
            docs.select(F.col(id_col).alias("id_a"), F.col("__set").alias("__sa")),
            "id_a",
        )
        .join(
            docs.select(F.col(id_col).alias("id_b"), F.col("__set").alias("__sb")),
            "id_b",
        )
        .withColumn("__n_common", inter)
        .filter(j >= threshold)
        .select("id_a", "id_b", rnd(j, round_digits).alias("jaccard"))
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.9,
    ngram: int = 3,
    round_digits: int = 4,
    max_doc_freq: "int | None" = 50,
    storage_level: "str | None" = None,
) -> DataFrame:
    """Directed shingle CONTAINMENT ``|A∩B| / |A|`` ≥ threshold — catches a
    document swallowed inside a larger one, which symmetric Jaccard
    misses (a 100-word doc pasted into a 10,000-word doc has Jaccard ~0.01
    but containment 1.0). The standard screen for quote/excerpt/boilerplate
    inclusion before training.

    Same inverted-index plan as :func:`jaccard_similar_pairs` (one
    shingle-key self-join, ``max_doc_freq`` bounding the worst bucket);
    each unordered pair is scored in BOTH directions and a direction is
    emitted when the smaller side is covered: (id_contained, id_container).
    """
    from pyspark.sql import Window

    sh = _tokens_distinct_shingles(df, id_col, text_col, ngram)
    if max_doc_freq is not None:
        sh = (
            sh.withColumn("__df", F.count(F.lit(1)).over(Window.partitionBy("shingle")))
            .filter(F.col("__df") <= max_doc_freq)
            .drop("__df")
        )
    sh = _persist(
        sh.withColumn("set_size", F.count(F.lit(1)).over(Window.partitionBy(id_col))),
        storage_level,
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"), "shingle")
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    c_a = F.col("n_common") / F.col("size_a")  # how much of A sits in B
    c_b = F.col("n_common") / F.col("size_b")
    both = pairs.select(
        F.col("id_a").alias("id_contained"),
        F.col("id_b").alias("id_container"),
        c_a.alias("__c"),
    ).unionAll(
        pairs.select(
            F.col("id_b").alias("id_contained"),
            F.col("id_a").alias("id_container"),
            c_b.alias("__c"),
        )
    )
    return both.filter(F.col("__c") >= threshold).select(
        "id_contained", "id_container", rnd(F.col("__c"), round_digits).alias("containment")
    )
