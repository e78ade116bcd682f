"""Operator-level tests: as-of join vs pandas merge_asof, multimodal
plumbing, simhash properties."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pontem_spark.operators.asof import asof_join
from pontem_spark.operators import multimodal as M
from pontem_spark.sources.tables import load_table


def test_asof_join_matches_pandas_merge_asof(spark):
    left_pd = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2],
            "t": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 11:00", "2024-01-01 12:00",
                                 "2024-01-01 10:30", "2024-01-01 09:00"]),
            "lv": [1, 2, 3, 4, 5],
        }
    )
    right_pd = pd.DataFrame(
        {
            "k": [1, 1, 2],
            "t": pd.to_datetime(["2024-01-01 09:30", "2024-01-01 11:00", "2024-01-01 10:00"]),
            "rv": [100, 200, 300],
        }
    )
    got = (
        asof_join(
            spark.createDataFrame(left_pd),
            spark.createDataFrame(right_pd),
            on="t",
            by="k",
        )
        .toPandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left_pd.sort_values("t"), right_pd.sort_values("t"), on="t", by="k", direction="backward"
    ).sort_values(["k", "t"]).reset_index(drop=True)
    pd.testing.assert_series_equal(
        got["r_rv"].astype("float64"), want["rv"].astype("float64"), check_names=False
    )


def test_asof_tolerance(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1], "t": pd.to_datetime(["2024-01-01 12:00"]), "lv": [1]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1], "t": pd.to_datetime(["2024-01-01 10:00"]), "rv": [9]})
    )
    wide = asof_join(left, right, on="t", by="k").toPandas()
    assert wide["r_rv"].iloc[0] == 9
    tight = asof_join(left, right, on="t", by="k", tolerance_seconds=3600).toPandas()
    assert pd.isna(tight["r_rv"].iloc[0])


def test_multimodal_decode_schema_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    packed = M.attach_binary(docs, "doc_id", "text", mime="image/fake")
    decoded = M.decode_media(packed)
    assert decoded.schema.simpleString() == (
        "struct<id:bigint,n_bytes:bigint,content_sha256:string,mime:string,"
        "width:int,height:int,channels:int>"
    )
    a = decoded.orderBy("id").toPandas()
    b = M.decode_media(M.attach_binary(docs, "doc_id", "text", mime="image/fake")).orderBy("id").toPandas()
    pd.testing.assert_frame_equal(a, b)  # deterministic stub
    assert (a["width"].between(64, 255)).all()
    assert (a["channels"].between(1, 3)).all()


def test_multimodal_resize_geometry(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    decoded = M.decode_media(M.attach_binary(docs, "doc_id", "text"))
    resized = M.resize_media(decoded, max_side=100).toPandas()
    assert (resized[["target_width", "target_height"]].max(axis=1) <= 100).all()
    # aspect ratio preserved within rounding
    ratio_in = resized["width"] / resized["height"]
    ratio_out = resized["target_width"] / resized["target_height"]
    assert ((ratio_in - ratio_out).abs() < 0.1).all()


def test_multimodal_features_and_frames(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(10)
    packed = M.attach_binary(docs, "doc_id", "text")
    feats = M.extract_features(packed, dim=16).toPandas()
    assert feats["features"].map(len).eq(16).all()
    frames = M.sample_frames(
        M.decode_media(packed).withColumnRenamed("n_bytes", "n_bytes"), every_n=10
    ).toPandas()
    assert (frames["sampled_frame_indices"].map(len) >= 3).all()


def test_simhash_hamming_close_for_near_dups(spark, sf_dir):
    """Known near-dup pairs (trigram jaccard >= 0.9) must have small simhash
    Hamming distance; random pairs must not."""
    from pontem_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    fp = D.simhash(docs, "doc_id", "text")
    jac = D.jaccard_similar_pairs(docs, "doc_id", "text", threshold=0.9)
    a = fp.select(F.col("doc_id").alias("id_a"), F.col("simhash64").alias("ha"))
    b = fp.select(F.col("doc_id").alias("id_b"), F.col("simhash64").alias("hb"))
    joined = jac.join(a, "id_a").join(b, "id_b").select(
        D.hamming_distance(F.col("ha"), F.col("hb")).alias("d")
    ).toPandas()
    if len(joined):
        assert joined["d"].median() <= 12


def test_simhash_banding_loses_no_pairs(spark, sf_dir):
    """Pigeonhole property as a differential test: the 9-band candidate
    equi-join followed by the exact Hamming-8 filter must return EXACTLY the
    pairs the O(n^2) scan finds — banding changes the join shape, never the
    result."""
    from pyspark.sql import functions as F

    from pontem_spark.operators import dedup as D
    from pontem_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    fp = D.simhash(docs, "doc_id", "text").cache()
    a = fp.select(F.col("doc_id").alias("id_a"), F.col("simhash64").alias("h_a"))
    b = fp.select(F.col("doc_id").alias("id_b"), F.col("simhash64").alias("h_b"))
    full = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", D.hamming_distance(F.col("h_a"), F.col("h_b")).cast("int"))
        .filter(F.col("hamming") <= 8)
        .select("id_a", "id_b", "hamming")
    )
    cand = D.simhash_band_candidates(fp, "doc_id", "simhash64", bits=64, n_bands=9)
    banded = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("hamming", D.hamming_distance(F.col("h_a"), F.col("h_b")).cast("int"))
        .filter(F.col("hamming") <= 8)
        .select("id_a", "id_b", "hamming")
    )
    f = full.toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    g = banded.toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert f.equals(g)


def test_parse_image_header_known_bytes():
    """The header parser against handcrafted binaries with KNOWN geometry —
    exact values pinned, no hash-derived fakes."""
    import struct
    import zlib

    from pontem_spark.operators.multimodal import parse_image_header

    # minimal PNG: 320x200 RGB 8-bit
    ihdr = b"IHDR" + struct.pack(">IIBBBBB", 320, 200, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + ihdr + struct.pack(">I", zlib.crc32(ihdr))
        + struct.pack(">I", 0) + b"IEND" + struct.pack(">I", zlib.crc32(b"IEND"))
    )
    assert parse_image_header(png) == {
        "mime": "image/png", "width": 320, "height": 200, "channels": 3,
    }

    # minimal JPEG: APP0 then SOF0 with 640x480, 3 components
    sof = b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * 3, 8, 480, 640, 3) + b"\x01\x11\x00" * 3
    jpg = b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 4) + b"JF" + sof + b"\xff\xd9"
    assert parse_image_header(jpg) == {
        "mime": "image/jpeg", "width": 640, "height": 480, "channels": 3,
    }

    # GIF89a 13x7 (little-endian)
    gif = b"GIF89a" + struct.pack("<HH", 13, 7) + b"\x00\x00\x00"
    assert parse_image_header(gif) == {
        "mime": "image/gif", "width": 13, "height": 7, "channels": 3,
    }

    assert parse_image_header(b"not an image at all") is None


def test_synthetic_png_roundtrip(spark):
    """attach_synthetic_png emits REAL PNG bytes: the header parser (and the
    md5 formula) must both recover the same dimensions, and the IHDR crc
    must be the true crc32."""
    import hashlib
    import struct
    import zlib

    from pontem_spark.operators.multimodal import attach_synthetic_png, parse_image_header

    df = spark.createDataFrame([(1, "hello world"), (2, "pontem")], "doc_id long, text string")
    rows = {r["id"]: bytes(r["media"]) for r in attach_synthetic_png(df, "doc_id", "text").collect()}
    for doc_id, text in ((1, "hello world"), (2, "pontem")):
        h = hashlib.md5(text.encode()).digest()
        want_w, want_h = 64 + h[0] % 192, 64 + h[1] % 192
        payload = rows[doc_id]
        parsed = parse_image_header(payload)
        assert parsed == {"mime": "image/png", "width": want_w, "height": want_h, "channels": 3}
        # IHDR chunk crc is genuine
        ihdr_td = payload[12:29]
        assert struct.unpack(">I", payload[29:33])[0] == zlib.crc32(ihdr_td)


def test_connected_components_huge_ids(spark):
    """Convergence detection must survive ids near 2^62: the per-iteration
    label sum is exact decimal, not a long that quietly wraps."""
    from pontem_spark.operators.graph import connected_components

    base = 1 << 62
    ids = [base + i for i in range(6)]
    nodes = spark.createDataFrame([(i,) for i in ids], "id long")
    edges = spark.createDataFrame(
        [(ids[0], ids[1]), (ids[1], ids[2]), (ids[3], ids[4])], "src long, dst long"
    )
    out = {r["id"]: r["component"] for r in connected_components(nodes, edges).collect()}
    assert out == {
        ids[0]: ids[0], ids[1]: ids[0], ids[2]: ids[0],
        ids[3]: ids[3], ids[4]: ids[3], ids[5]: ids[5],
    }


def test_latest_by_key_ties_and_payload(spark):
    from pontem_spark.operators.dedup import latest_by_key

    pdf = pd.DataFrame(
        {
            "k": [1, 1, 1, 2],
            "ver": [3, 3, 1, 7],     # key 1 has a tie on ver
            "uid": [10, 20, 5, 1],   # broken by uid
            "payload": ["a", "b", "c", "d"],
        }
    )
    got = (
        latest_by_key(spark.createDataFrame(pdf), "k", ["ver", "uid"], ["payload"])
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got["payload"].tolist() == ["b", "d"]  # (ver=3, uid=20) wins for k=1
    assert got["ver"].tolist() == [3, 7]


def test_stratified_sample_is_deterministic_and_stratified(spark, sf_dir):
    from pontem_spark.operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    a = stratified_sample(docs, "lang", "doc_id", {"en": 60}, default_percent=0)
    b = stratified_sample(docs, "lang", "doc_id", {"en": 60}, default_percent=0)
    ids_a = sorted(r.doc_id for r in a.select("doc_id").collect())
    ids_b = sorted(r.doc_id for r in b.select("doc_id").collect())
    assert ids_a == ids_b and ids_a, "same rows on every run"
    assert a.filter(F.col("lang") != "en").count() == 0, "default 0 drops other strata"


def test_profile_counts_nulls(spark):
    from pontem_spark.operators.profile import profile_columns

    pdf = pd.DataFrame({"a": [1, None, 3, None], "b": ["x", "x", None, "y"]})
    got = (
        profile_columns(spark.createDataFrame(pdf), ["a", "b"])
        .toPandas()
        .set_index("column_name")
    )
    assert got.loc["a", "n_nulls"] == 2 and got.loc["a", "n_distinct"] == 2
    assert got.loc["b", "n_nulls"] == 1 and got.loc["b", "n_distinct"] == 2
    assert (got["n_rows"] == 4).all()


def test_tfidf_hand_example(spark):
    from pontem_spark.operators.textstats import tfidf_top_terms

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["apple apple banana", "banana cherry"],
        }
    )
    got = tfidf_top_terms(spark.createDataFrame(pdf), "doc_id", "text", k=1).toPandas()
    top = got.set_index("doc_id")["term"]
    # 'apple' is doc 1's top (tf=2, rare); banana/cherry tie on tf in doc 2,
    # cherry wins on lower document frequency
    assert top[1] == "apple" and top[2] == "cherry"
    import math
    row = got[got.doc_id == 1].iloc[0]
    assert abs(row["tfidf"] - round(2 * math.log(2 / 1), 4)) < 1e-9


def test_minhash_jaccard_composed_no_shingle_selfjoin(spark, sf_dir):
    """The composed pipeline must (a) agree with raw Jaccard on every pair it
    emits, (b) join only on doc ids / (id, shingle) — never shingle alone —
    so hot shingles cannot create a quadratic bucket."""
    from pontem_spark.operators import dedup as D
    from pontem_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    composed = D.minhash_jaccard_pairs(docs, "doc_id", "text", threshold=0.8)
    raw = D.jaccard_similar_pairs(docs, "doc_id", "text", threshold=0.8)
    c = {(r.id_a, r.id_b): r.jaccard for r in composed.collect()}
    r = {(x.id_a, x.id_b): x.jaccard for x in raw.collect()}
    # precision is exact: every composed pair is a true pair with the same score
    for pair, score in c.items():
        assert pair in r and r[pair] == score
    # recall on this corpus (planted J>=0.9 near-dups, 2x4 banding): complete
    assert set(c) == set(r)


def test_simhash_md5_matches_bit_definition(spark):
    """Hand-check one tiny doc: fingerprint bit i = majority vote of bit i
    over md5-derived 60-bit token hashes."""
    from pontem_spark.operators.dedup import simhash_md5

    rows = [(1, "alpha beta alpha")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = simhash_md5(df, "doc_id", "text", bits=60).collect()[0].simhash60

    import hashlib

    def h(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)

    toks = ["alpha", "beta", "alpha"]
    fp = 0
    for i in range(60):
        vote = sum(1 if (h(t) >> i) & 1 else -1 for t in toks)
        if vote > 0:
            fp |= 1 << i
    assert got == fp


def test_dedup_persist_storage_level(spark):
    """storage_level='DISK_ONLY' must reach the persisted intermediate;
    default stays MEMORY_AND_DISK (cache())."""
    from pyspark import StorageLevel

    from pontem_spark.operators.dedup import _persist

    df = spark.range(10)
    try:
        assert _persist(df, "DISK_ONLY").storageLevel == StorageLevel.DISK_ONLY
    finally:
        df.unpersist()
    df2 = spark.range(11)
    try:
        assert _persist(df2, None).storageLevel.useMemory
    finally:
        df2.unpersist()


def test_hier_ivf_assignment_no_exchange(spark, sf_dir):
    """Hierarchical cell assignment must stay map-side: scan → project →
    generate, ZERO Exchange before the probe equi-join."""
    from pyspark.sql import functions as F

    from pontem_spark.operators.ivf import hierarchical_assign_cells, label_centroids
    from pontem_spark.plans import count_exchanges
    from pontem_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "cell_key", F.col("label") * 16 + F.col("vec_id") % 16
    )
    cents = label_centroids(emb, "vec_id", "embedding", "cell_key", 64).collect()
    assigned = hierarchical_assign_cells(emb, cents, "vec_id", "embedding", 64, n_probe=1)
    assert count_exchanges(assigned) == 0


def test_hier_ivf_large_k_matches_numpy(spark):
    """K=1024 synthetic centroids (the scale the flat expression form cannot
    express): hierarchical assignment must equal the brute-force numpy
    argmax-cosine *restricted to the chosen group* — the exact hierarchy
    contract — and the expression must build/evaluate without issue."""
    import math

    import numpy as np
    from pyspark.sql import Row

    from pontem_spark.operators.ivf import (
        build_centroid_groups,
        hierarchical_assign_cells,
    )

    rng = np.random.RandomState(7)
    K, dim, n_vec = 1024, 16, 40
    cents_np = rng.randn(K, dim).round(6)
    rows = [
        Row(centroid_id=i, centroid=[float(x) for x in cents_np[i]]) for i in range(K)
    ]
    vecs = rng.randn(n_vec, dim)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n_vec)],
        "vec_id bigint, embedding array<double>",
    )
    got = {
        r.vec_id: r.centroid_id
        for r in hierarchical_assign_cells(
            df, rows, "vec_id", "embedding", dim, n_probe=1
        ).collect()
    }
    assert len(got) == n_vec

    groups = build_centroid_groups(rows, 6)

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return math.floor((float(np.dot(a, b)) / (na * nb)) * 1e6 + 0.5) / 1e6

    for i in range(n_vec):
        v = vecs[i]
        # stage 1: nearest group centroid (max sim, tie → lower gid)
        best_g = min(
            ((-cos(v, np.array(gc)), gid) for gid, gc, _, _ in groups)
        )[1]
        members = next(m for gid, _, _, m in groups if gid == best_g)
        best_c = min(
            ((-cos(v, np.array(r.centroid)), r.centroid_id) for r in members)
        )[1]
        assert got[i] == best_c, f"vec {i}: {got[i]} != {best_c}"


def test_profile_approx_within_bounds(spark, sf_dir):
    """approx=True (HLL, rsd=2%) must land within ±10% of the exact twin on
    every profiled column — mirroring the approx-aggregates bounds test."""
    from pontem_spark.operators.profile import profile_columns
    from pontem_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_orderstatus", "o_orderpriority", "o_totalprice"]
    exact = {r.column_name: r for r in profile_columns(orders, cols).collect()}
    approx = {r.column_name: r for r in profile_columns(orders, cols, approx=True).collect()}
    for c in cols:
        assert approx[c].n_rows == exact[c].n_rows
        assert approx[c].n_nulls == exact[c].n_nulls
        e, a = exact[c].n_distinct, approx[c].n_distinct
        assert abs(a - e) <= max(0.10 * e, 2), f"{c}: approx {a} vs exact {e}"


def test_hier_ivf_multigroup_recall(spark, sf_dir):
    """n_probe_groups=2 must (a) widen the candidate POOL (unsliced cells
    are a per-query superset of the single-group pool — with a fixed
    n_probe the *selected* cells may legitimately displace single-group
    picks for nearer ones) and (b) recall at least as many of the
    brute-force true top-k neighbors on this fixture — the boundary-recall
    mitigation doing its job (VERDICT r04 #2)."""
    from pyspark.sql import functions as F

    from pontem_spark.operators.ivf import (
        hierarchical_assign_cells,
        ivf_topk_hier,
        label_centroids,
    )
    from pontem_spark.operators.similarity import brute_force_topk
    from pontem_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "cell_key", F.col("label") * 16 + F.col("vec_id") % 16
    )
    queries = emb.filter(F.col("vec_id") < 10)
    cents = label_centroids(emb, "vec_id", "embedding", "cell_key", 64).collect()

    def cells(g, n_probe):
        out = {}
        for r in hierarchical_assign_cells(
            queries, cents, "vec_id", "embedding", 64, n_probe=n_probe,
            n_probe_groups=g,
        ).collect():
            out.setdefault(r.vec_id, set()).add(r.centroid_id)
        return out

    # unsliced pools: two groups' members strictly contain one group's
    c1, c2 = cells(1, 10_000), cells(2, 10_000)
    assert set(c1) == set(c2)
    for qid in c1:
        assert c1[qid] < c2[qid], f"query {qid}: g=2 pool did not widen"

    truth = {}
    for r in brute_force_topk(emb, queries, k=5, dim=64).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)

    def recall(res):
        hits = {}
        for r in res.collect():
            hits.setdefault(r.query_id, set()).add(r.neighbor_id)
        return sum(len(hits.get(q, set()) & t) for q, t in truth.items()), sum(
            len(t) for t in truth.values()
        )

    # probe every cell of the selected group(s): the g=2 candidate set is a
    # strict superset, so recall is monotone — the mechanism by which wider
    # group probing recovers boundary neighbors. (At a FIXED small n_probe
    # the nearer cells of the second group can displace first-group cells,
    # so recall is data-dependent there — by design, not a bug.)
    r1, tot = recall(
        ivf_topk_hier(
            emb, queries, cell_key_col="cell_key", k=5, dim=64, n_probe=10_000
        )
    )
    r2, _ = recall(
        ivf_topk_hier(
            emb, queries, cell_key_col="cell_key", k=5, dim=64, n_probe=10_000,
            n_probe_groups=2,
        )
    )
    assert r2 >= r1, f"multi-group recall regressed: {r2}/{tot} < {r1}/{tot}"
    assert r2 > 0


def test_train_centroids_deterministic_and_moves(spark, sf_dir):
    """k-means training: k centroids out, bit-identical across runs (the
    cross-engine determinism contract), and iteration actually moves the
    init vectors (Lloyd did something)."""
    from pontem_spark.operators.ivf import train_centroids
    from pontem_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a = train_centroids(emb, "vec_id", "embedding", dim=64, k=8, sample_pct=30, iters=2)
    b = train_centroids(emb, "vec_id", "embedding", dim=64, k=8, sample_pct=30, iters=2)
    assert len(a) == 8
    assert [r.centroid_id for r in a] == list(range(8))
    assert [list(r.centroid) for r in a] == [list(r.centroid) for r in b]
    init_only = train_centroids(
        emb, "vec_id", "embedding", dim=64, k=8, sample_pct=30, iters=0
    )
    assert [list(r.centroid) for r in a] != [list(r.centroid) for r in init_only]


def test_incremental_rollup_merge_equals_direct(spark, sf_dir):
    """Merging per-batch states (any split, any merge order) must equal the
    direct aggregation — the monoid property incremental pipelines rely
    on. Checked on integer-exact fields (n) and rounded floats."""
    from pyspark.sql import functions as F

    from pontem_spark.operators.incremental import (
        finalize,
        merge_states,
        rollup_state,
    )
    from pontem_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    direct = finalize(
        rollup_state(events, ["event_type"], "value"), ["event_type"]
    ).toPandas().set_index("event_type").sort_index()

    # the query's own split expression: pmod+coalesce provably PARTITIONS
    # the input (a plain % drops null event_ids and maps negatives to
    # negative remainders no batch would claim)
    split = F.pmod(F.coalesce(F.col("event_id"), F.lit(0)), F.lit(4))
    parts = [
        rollup_state(events.filter(split == i), ["event_type"], "value")
        for i in range(4)
    ]
    # two different merge trees
    left = merge_states(
        merge_states(merge_states(parts[0], parts[1], ["event_type"]), parts[2], ["event_type"]),
        parts[3], ["event_type"],
    )
    bal = merge_states(
        merge_states(parts[0], parts[1], ["event_type"]),
        merge_states(parts[2], parts[3], ["event_type"]),
        ["event_type"],
    )
    for merged in (left, bal):
        got = finalize(merged, ["event_type"]).toPandas().set_index("event_type").sort_index()
        assert got["n"].equals(direct["n"])
        for c in ("total", "avg", "sd", "lo", "hi"):
            # fillna: sd is NULL for n<2 groups on BOTH sides; NaN-NaN
            # would poison the max otherwise
            assert (got[c].fillna(0) - direct[c].fillna(0)).abs().max() < 1e-9, c


def test_train_centroids_k256_matches_python_replay(spark, sf_dir):
    """Large-K evidence for the 'K bounded by broadcast size, not plan
    size' claim (ivf.py): training at K=256 (vs the suite's usual k<=24)
    completes, the argmin EXPRESSION is K-independent (r14: centroids ride
    as a broadcast data row, not literals), and one full Lloyd step is
    replayed in pure Python double arithmetic — the same left-chained
    folds and portable rounding — and must agree.

    The assignment arithmetic is replicated BIT-IDENTICALLY (sequential
    folds, driver-side rounded init on both sides); the per-cell means use
    a different summation order than Spark's partial aggregation, so each
    component may differ by at most ONE 1e-6 rounding step, and only
    rarely (no cascade: assignment came from the shared init)."""
    import collections
    import math
    import time

    import numpy as np

    from pontem_spark.functions import vector as V
    from pontem_spark.operators.ivf import _attach_argmin_cell, train_centroids
    from pontem_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    t0 = time.perf_counter()
    got = train_centroids(
        emb, "vec_id", "embedding", dim=64, k=256, sample_pct=100, iters=1
    )
    t_k256 = time.perf_counter() - t0
    assert len(got) == 256
    assert [r.centroid_id for r in got] == list(range(256))
    # plan-size evidence (r14 form): the centroid set rides as DATA in a
    # broadcast 1-row frame, so the analyzed argmin expression tree is the
    # SAME size at K=256 as at K=24 — only the LocalRelation row grows.
    base = emb.withColumn("__vnorm", V.norm_fixed("embedding", 64))
    p256 = _attach_argmin_cell(base, got, "embedding", "cid")._jdf.queryExecution().analyzed().toString()
    p24 = _attach_argmin_cell(base, got[:24], "embedding", "cid")._jdf.queryExecution().analyzed().toString()
    assert len(p256) < 2 * len(p24), (len(p24), len(p256))
    print(f"\n# K=256 train: {t_k256:.2f}s, analyzed plan {len(p256)} chars (K=24: {len(p24)})")

    def pr(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    def fold_dot(a, b) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    pdf = emb.select("vec_id", "embedding").toPandas()
    vecs = {int(r.vec_id): [float(x) for x in r.embedding] for r in pdf.itertuples()}
    ids = sorted(vecs)
    init = [[pr(x) for x in vecs[i]] for i in ids[:256]]
    cnorms = [math.sqrt(fold_dot(c, c)) for c in init]
    members = collections.defaultdict(list)
    for vid in ids:
        v = vecs[vid]
        vn = math.sqrt(fold_dot(v, v))
        best = None
        for cid, (c, cn) in enumerate(zip(init, cnorms)):
            den = vn * cn
            ns = -pr(fold_dot(v, c) / den) if den > 0 else float("inf")
            if best is None or (ns, cid) < best:
                best = (ns, cid)
        members[best[1]].append(vid)
    want = []
    for cid in range(256):
        if members[cid]:
            n = len(members[cid])
            want.append(
                [pr(sum(vecs[vid][p] for vid in members[cid]) / n) for p in range(64)]
            )
        else:  # a cell that lost every member keeps its init centroid
            want.append(init[cid])
    G = np.array([[float(x) for x in r.centroid] for r in got])
    W = np.array(want)
    diff = np.abs(G - W)
    # exact up to one rounding step per component; flips must be isolated
    assert diff.max() <= 1.000001e-6, float(diff.max())
    assert (diff > 1e-9).mean() < 0.01, float((diff > 1e-9).mean())


def test_resample_gapfill_ffill_matches_pandas(spark, sf_dir):
    """The three timeseries pieces compose to pandas' resample().mean() +
    reindex + ffill on the same sparse slice, and the fixture really has
    gaps (else the fill path is dead code in this test)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from pontem_spark.operators.timeseries import forward_fill, gap_fill, resample
    from pontem_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").filter(F.col("value") >= 195)
    res = resample(ev, "ts", "value", ["event_type"], 21600)
    filled = forward_fill(
        gap_fill(res, ["event_type"], "bucket_ts", 21600)
        .withColumn("avg_filled", F.col("avg_value")),
        ["event_type"],
        "bucket_ts",
        ["avg_filled"],
    )
    got = filled.toPandas().sort_values(["event_type", "bucket_ts"]).reset_index(drop=True)
    assert (got["n"] == 0).any(), "fixture produced no gaps — filter too loose"
    assert got.loc[got["n"] == 0, "avg_value"].isna().all()
    assert got["avg_filled"].notna().all()  # spans start at an observed bucket

    pdf = ev.select("ts", "event_type", "value").toPandas()
    pdf["bucket_ts"] = pdf["ts"].dt.floor("6h")
    for etype, g in pdf.groupby("event_type"):
        series = g.groupby("bucket_ts")["value"].mean()
        idx = pd.date_range(series.index.min(), series.index.max(), freq="6h")
        want = series.reindex(idx).ffill()
        mine = got[got["event_type"] == etype].set_index("bucket_ts")["avg_filled"]
        assert len(mine) == len(want), etype
        assert (mine - want).abs().max() < 1e-9, etype


def test_temperature_resample_rate_fidelity(spark, sf_dir):
    """Realized per-stratum keep rates must track the alpha=0.5 targets
    (share ∝ sqrt(count), rarest stratum kept whole) — the property the
    16-bit hash value exists to deliver (the two-char bucket was ~30% off).
    Also: deterministic across runs."""
    import math

    from pontem_spark.operators.sampling import temperature_resample
    from pontem_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    before = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    kept1 = temperature_resample(docs, "lang", "doc_id", alpha=0.5)
    after = {r["lang"]: r["count"] for r in kept1.groupBy("lang").count().collect()}

    min_cnt = min(before.values())
    rarest = min(before, key=before.get)
    assert after[rarest] == before[rarest], "rarest stratum must be kept whole"
    for lang, n in before.items():
        target = math.sqrt(min_cnt / n)
        realized = after.get(lang, 0) / n
        # binomial-ish noise on a few hundred rows: ±0.12 absolute
        assert abs(realized - target) < 0.12, (lang, realized, target)

    ids1 = sorted(r["doc_id"] for r in kept1.select("doc_id").collect())
    ids2 = sorted(
        r["doc_id"]
        for r in temperature_resample(docs, "lang", "doc_id", alpha=0.5)
        .select("doc_id")
        .collect()
    )
    assert ids1 == ids2


def test_semantic_dedup_invariants(spark, sf_dir):
    """SemDeDup keep-rule invariants on the real fixture: (1) rows are
    actually dropped; (2) no kept pair within a cluster is >= threshold
    (else the higher id should have been dropped); (3) every dropped id has
    a lower-id same-cluster witness >= threshold."""
    import numpy as np

    from pontem_spark.operators.dedup import semantic_dedup
    from pontem_spark.operators.ivf import assign_cells, train_centroids
    from pontem_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = train_centroids(emb, "vec_id", "embedding", dim=64, k=8, sample_pct=30, iters=2)
    kept = semantic_dedup(emb, "vec_id", "embedding", 64, cents, threshold=0.4).toPandas()
    assigned = assign_cells(emb, cents, "vec_id", "embedding", 64).toPandas()
    assert len(kept) < len(assigned), "no rows dropped — dup path not exercised"

    vecs = {int(r.vec_id): np.array(r.embedding, dtype="float64") for r in assigned.itertuples()}
    cluster = {int(r.vec_id): int(r.centroid_id) for r in assigned.itertuples()}

    def cos4(a, b):
        va, vb = vecs[a], vecs[b]
        c = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        return np.floor(c * 1e4 + 0.5) / 1e4

    kept_ids = sorted(int(v) for v in kept["vec_id"])
    kept_set = set(kept_ids)
    by_cluster: dict = {}
    for vid, cid in cluster.items():
        by_cluster.setdefault(cid, []).append(vid)
    for cid, members in by_cluster.items():
        members = sorted(members)
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                if a in kept_set and b in kept_set:
                    assert cos4(a, b) < 0.4, (a, b)
    dropped = [v for v in cluster if v not in kept_set]
    for b in dropped:
        assert any(
            a < b and cluster[a] == cluster[b] and cos4(a, b) >= 0.4 for a in cluster
        ), b


def test_mmr_rerank_diversifies(spark, sf_dir):
    """MMR invariants: rank-1 is the plain nearest neighbor, every selection
    is drawn from the candidate pool, and an independent numpy replay of the
    greedy lam=0.7 selection (BLAS dot products instead of the operator's
    explicit folds) picks the identical sequence. (Note: greedy MMR does
    NOT guarantee a lower max-pairwise-similarity than plain top-k — it
    optimizes the marginal score per step — so that is deliberately not
    asserted.)"""
    import numpy as np

    from pontem_spark.operators.similarity import brute_force_topk, mmr_rerank
    from pontem_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 10")
    mmr = mmr_rerank(emb, queries, n_candidates=20, k=5, dim=64).toPandas()
    plain = brute_force_topk(emb, queries, k=20, dim=64).toPandas()
    vecs = {
        int(r.vec_id): np.array(r.embedding, dtype="float64")
        for r in emb.select("vec_id", "embedding").toPandas().itertuples()
    }

    def cos6(a, b):
        va, vb = vecs[a], vecs[b]
        c = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        return np.floor(c * 1e6 + 0.5) / 1e6

    assert sorted(mmr["query_id"].unique()) == list(range(10))
    for qid, g in mmr.groupby("query_id"):
        g = g.sort_values("mmr_rank")
        assert len(g) == 5
        pq = plain[plain["query_id"] == qid].sort_values("rank")
        assert g.loc[g["mmr_rank"] == 1, "neighbor_id"].iloc[0] == pq["neighbor_id"].iloc[0]
        assert set(g["neighbor_id"]) <= set(pq["neighbor_id"])
        # independent greedy replay
        rel = {int(r.neighbor_id): float(r.cos_sim) for r in pq.itertuples()}
        remaining = sorted(rel)
        sel: list = []
        while remaining and len(sel) < 5:
            scored = []
            for c in remaining:
                if sel:
                    s = 0.7 * rel[c] - 0.3 * max(cos6(c, s0) for s0 in sel)
                else:
                    s = rel[c]
                scored.append((-s, c))
            _, pick = min(scored)
            sel.append(pick)
            remaining.remove(pick)
        assert [int(x) for x in g["neighbor_id"]] == sel, qid


def test_round6_operator_plan_shapes(spark, sf_dir):
    """Plan assertions for the round-6 operators: the scale claims in the
    docstrings, checked against the actual physical plans."""
    from pyspark.sql import functions as F

    from pontem_spark.operators.binning import quantile_bins
    from pontem_spark.operators.dedup import semantic_dedup
    from pontem_spark.operators.ivf import assign_cells, train_centroids
    from pontem_spark.operators.sampling import temperature_resample
    from pontem_spark.plans import count_exchanges, has_node, physical_plan
    from pontem_spark.sources.tables import load_table

    # qcut: boundaries broadcast, bucket map-side — no sort, no window
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    q = quantile_bins(orders, "o_totalprice", q=4)
    assert not has_node(q, "Window"), physical_plan(q)
    assert has_node(q, "BroadcastNestedLoopJoin") or has_node(
        q, "BroadcastExchange"
    ), physical_plan(q)
    # two Exchanges: the r14 ensure_parallelism rebalance of the projected
    # value column (spreads the buffering percentile partials across cores
    # when the scan is a single split — guide §2.5) + the aggregate's
    # single-partition reduce. Still no Window, no sort of the data.
    assert count_exchanges(q) <= 2, physical_plan(q)

    # temperature sampling: thresholds broadcast back, stream side never
    # sort-merge-joined
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    t = temperature_resample(docs, "lang", "doc_id")
    assert has_node(t, "BroadcastHashJoin"), physical_plan(t)
    assert not has_node(t, "SortMergeJoin"), physical_plan(t)

    # semantic dedup: cluster assignment is map-side (zero Exchange before
    # the within-cluster join); the joins are equi-joins, never cartesian
    emb = load_table(spark, sf_dir, "embeddings")
    cents = train_centroids(emb, "vec_id", "embedding", dim=64, k=8, sample_pct=30, iters=1)
    assigned = assign_cells(emb, cents, "vec_id", "embedding", 64)
    assert count_exchanges(assigned) == 0, physical_plan(assigned)
    sd = semantic_dedup(emb, "vec_id", "embedding", 64, cents, threshold=0.4)
    assert not has_node(sd, "CartesianProduct"), physical_plan(sd)
    assert not has_node(sd, "BroadcastNestedLoopJoin"), physical_plan(sd)


def test_round6_operator_edge_cases(spark, sf_dir):
    """Degenerate inputs for the round-6 operators: empty frames, single
    strata, fewer candidates than k, constant binning columns."""
    import pandas as pd
    from pyspark.sql import functions as F

    from pontem_spark.operators.binning import quantile_bins
    from pontem_spark.operators.dedup import fuzzy_pairs, semantic_dedup
    from pontem_spark.operators.sampling import temperature_resample
    from pontem_spark.operators.similarity import mmr_rerank
    from pontem_spark.operators.timeseries import forward_fill, gap_fill, resample
    from pontem_spark.sources.tables import load_table

    # gap_fill on an empty resample: no groups, no grid, empty result
    ev = load_table(spark, sf_dir, "events").filter("value > 1e12")
    res = resample(ev, "ts", "value", ["event_type"], 3600)
    filled = forward_fill(
        gap_fill(res, ["event_type"], "bucket_ts", 3600), ["event_type"],
        "bucket_ts", ["avg_value"],
    )
    assert filled.count() == 0

    # temperature sampling with ONE stratum: rate 1.0, everything kept
    docs = load_table(spark, sf_dir, "documents").filter("lang = 'fr'")
    kept = temperature_resample(docs.select("doc_id", "lang"), "lang", "doc_id")
    assert kept.count() == docs.count()

    # MMR with fewer candidates than k: returns what exists, ranks contiguous
    emb = load_table(spark, sf_dir, "embeddings")
    tiny = emb.filter("vec_id < 4")  # 3 candidates per query after self-excl
    out = mmr_rerank(tiny, tiny.filter("vec_id = 0"), n_candidates=10, k=5, dim=64).toPandas()
    assert len(out) == 3
    assert sorted(out["mmr_rank"]) == [1, 2, 3]

    # semantic dedup where every vector is its own cluster-mate-free island
    # (threshold above any real similarity): nothing dropped
    from pontem_spark.operators.ivf import train_centroids

    cents = train_centroids(emb, "vec_id", "embedding", dim=64, k=4, sample_pct=30, iters=1)
    kept_sd = semantic_dedup(emb, "vec_id", "embedding", 64, cents, threshold=1.01)
    assert kept_sd.count() == emb.count()

    # qcut on a CONSTANT column: all boundaries equal the value, "x > b" is
    # false everywhere -> every row lands in bucket 0 (deliberate deviation:
    # pandas raises on duplicate bin edges; at scale a constant shard must
    # not kill the job)
    const = spark.range(100).select(F.lit(7.0).alias("v"), F.col("id"))
    b = quantile_bins(const, "v", q=4).toPandas()
    assert (b["bucket"] == 0).all()

    # fuzzy pairs on a vocabulary with no near matches
    pdf = pd.DataFrame({"name": ["alpha one", "bravo two", "charlie three"]})
    fz = fuzzy_pairs(spark.createDataFrame(pdf), "name", max_dist=2)
    assert fz.count() == 0


def test_hll_sketch_rollup_bounds_and_merge_invariance(spark, sf_dir):
    """HLL sketch estimates land within the lgk=12 error bounds of the
    exact distinct counts, and the merged per-day state gives the SAME
    estimate as a direct build — mergeability is the whole point."""
    from pyspark.sql import functions as F

    from pontem_spark.operators.sketches import (
        estimate,
        hll_rollup,
        merge_rollups,
        rollup_over,
    )
    from pontem_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    daily = hll_rollup(ev, ["event_type", "day"], "user_id")
    merged = rollup_over(daily, ["event_type"])
    est = {
        r["event_type"]: r["n_distinct_est"]
        for r in estimate(merged, ["event_type"]).collect()
    }
    direct = {
        r["event_type"]: r["n_distinct_est"]
        for r in estimate(
            hll_rollup(ev, ["event_type"], "user_id"), ["event_type"]
        ).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for k in exact:
        assert abs(est[k] - exact[k]) / exact[k] < 0.05, (k, est[k], exact[k])
        # merged-from-daily state == direct build (union semantics)
        assert abs(est[k] - direct[k]) / max(direct[k], 1) < 0.01, k

    # arbitrary merge tree: split by day parity, merge the two states
    odd = hll_rollup(ev.filter(F.dayofmonth("day") % 2 == 1), ["event_type"], "user_id")
    even = hll_rollup(ev.filter(F.dayofmonth("day") % 2 == 0), ["event_type"], "user_id")
    two_way = {
        r["event_type"]: r["n_distinct_est"]
        for r in estimate(merge_rollups(odd, even, ["event_type"]), ["event_type"]).collect()
    }
    for k in exact:
        assert abs(two_way[k] - direct[k]) / max(direct[k], 1) < 0.01, k


def test_asof_forward_and_nearest_match_pandas(spark):
    """All three merge_asof directions against pandas on a fixture with
    equal timestamps, gaps on both sides, and unmatched rows."""
    import pandas as pd

    left_pd = pd.DataFrame(
        {
            "k": [1, 1, 1, 1, 2, 2, 3],
            "t": pd.to_datetime(
                ["2024-01-01 10:00", "2024-01-01 11:00", "2024-01-01 11:30",
                 "2024-01-01 12:00", "2024-01-01 09:00", "2024-01-01 10:30",
                 "2024-01-01 08:00"]
            ),
            "lv": [1, 2, 3, 4, 5, 6, 7],
        }
    )
    right_pd = pd.DataFrame(
        {
            "k": [1, 1, 1, 2],
            "t": pd.to_datetime(
                ["2024-01-01 09:30", "2024-01-01 11:00", "2024-01-01 13:00",
                 "2024-01-01 10:00"]
            ),
            "rv": [100, 200, 300, 400],
        }
    )
    l, r = spark.createDataFrame(left_pd), spark.createDataFrame(right_pd)
    for direction in ("backward", "forward", "nearest"):
        got = (
            asof_join(l, r, on="t", by="k", direction=direction)
            .toPandas()
            .sort_values(["k", "t"])
            .reset_index(drop=True)
        )
        want = pd.merge_asof(
            left_pd.sort_values("t"),
            right_pd.sort_values("t"),
            on="t",
            by="k",
            direction=direction,
        ).sort_values(["k", "t"]).reset_index(drop=True)
        pd.testing.assert_series_equal(
            got["r_rv"].astype("float64"), want["rv"].astype("float64"),
            check_names=False,
        ), direction

    # tolerance in the forward direction
    tight = asof_join(
        l, r, on="t", by="k", direction="forward", tolerance_seconds=1800
    ).toPandas().sort_values(["k", "t"]).reset_index(drop=True)
    want_t = pd.merge_asof(
        left_pd.sort_values("t"), right_pd.sort_values("t"), on="t", by="k",
        direction="forward", tolerance=pd.Timedelta(seconds=1800),
    ).sort_values(["k", "t"]).reset_index(drop=True)
    pd.testing.assert_series_equal(
        tight["r_rv"].astype("float64"), want_t["rv"].astype("float64"),
        check_names=False,
    )


def test_histogram_state_merge_is_exact(spark, sf_dir):
    """Unlike HLL, histogram merge is EXACT: a three-way split merged back
    is bit-identical to the direct build, and quantile estimates are within
    one bin width of the true quantile."""
    from pontem_spark.operators.sketches import (
        histogram_quantiles,
        histogram_state,
        merge_histograms,
    )
    from pontem_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    LO, HI, NB = 0.0, 640.0, 32
    direct = histogram_state(ev, ["event_type"], "value", LO, HI, NB)

    # provably-partitioning split (pmod+coalesce — the r5 ADVICE lesson)
    split = F.pmod(F.coalesce(F.crc32(F.col("value").cast("string")), F.lit(0)), F.lit(3))
    parts = [
        histogram_state(ev.filter(split == i), ["event_type"], "value", LO, HI, NB)
        for i in range(3)
    ]
    merged = merge_histograms(
        merge_histograms(parts[0], parts[1], ["event_type"], NB),
        parts[2],
        ["event_type"],
        NB,
    )
    d = {r.event_type: r.bins for r in direct.collect()}
    m = {r.event_type: r.bins for r in merged.collect()}
    assert d == m  # exact, element-wise

    # error bound: |est - exact quantile| <= bin width
    est = {
        r.event_type: (r.p50, r.p90)
        for r in histogram_quantiles(
            direct, ["event_type"], {"p50": 0.5, "p90": 0.9}, LO, HI, NB
        ).collect()
    }
    exact = {
        r.event_type: (r.q50, r.q90)
        for r in ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("q50"),
            F.expr("percentile(value, 0.9)").alias("q90"),
        )
        .collect()
    }
    width = (HI - LO) / NB
    for et, (e50, e90) in est.items():
        assert abs(e50 - exact[et][0]) <= width, (et, e50, exact[et][0])
        assert abs(e90 - exact[et][1]) <= width, (et, e90, exact[et][1])


def test_histogram_quantiles_zero_jobs_mapside(spark):
    """Finalize is a pure projection over the state — no Exchange added."""
    from pontem_spark.operators.sketches import histogram_quantiles, histogram_state
    from pontem_spark.plans import count_exchanges

    df = spark.range(100).select((F.col("id") % 50).cast("double").alias("v"))
    state = histogram_state(df, [], "v", 0.0, 64.0, 8)
    # stateless grouping: histogram_state with no keys still aggregates
    out = histogram_quantiles(state, [], {"p50": 0.5}, 0.0, 64.0, 8)
    assert count_exchanges(out) == count_exchanges(state)


def test_weighted_sample_deterministic_and_filtered(spark):
    from pontem_spark.operators.sampling import weighted_sample
    from pontem_spark.plans import physical_plan

    rows = [(i, float(i % 7) if i % 11 else None) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, w double")
    a = sorted(r.id for r in weighted_sample(df, "id", "w", k=20).collect())
    b = sorted(r.id for r in weighted_sample(df, "id", "w", k=20).collect())
    assert a == b and len(a) == 20  # same race, same winners
    # zero/null weights have no mass
    sampled = weighted_sample(df, "id", "w", k=500).collect()
    assert all(r.w and r.w > 0 for r in sampled)
    # global top-k plans as TakeOrderedAndProject — no full sort materializes
    plan = physical_plan(weighted_sample(df, "id", "w", k=20))
    assert "TakeOrderedAndProject" in plan


def test_weighted_sample_prefers_heavy_rows(spark):
    """With weight 1000 vs 1, the heavy stratum should dominate the race:
    all heavy rows that entered must appear before most light rows."""
    from pontem_spark.operators.sampling import weighted_sample

    rows = [(i, 1000.0 if i < 20 else 1.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = {r.id for r in weighted_sample(df, "id", "w", k=40).collect()}
    heavy = {i for i in range(20)}
    assert len(got & heavy) >= 18  # ln(u)/1000 ≈ 0 beats ln(u)/1 a.s.


def test_jaccard_prefix_equals_direct(spark):
    """Prefix filtering is EXACT: pairs from the prefix-filtered join equal
    the plain inverted-index join on a corpus with planted near-dups and a
    hot boilerplate shingle shared by every doc."""
    from pontem_spark.operators.dedup import jaccard_prefix_pairs, jaccard_similar_pairs

    base = "the common header row alpha beta gamma delta"
    rows = [
        (1, base + " one two three four five six"),
        (2, base + " one two three four five seven"),   # near-dup of 1
        (3, base + " totally different tail content here now"),
        (4, base + " one two three four five six"),     # exact dup of 1
        (5, "unrelated words entirely separate from others okay fine"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    for t in (0.5, 0.8):
        got = {
            (r.id_a, r.id_b, r.jaccard)
            for r in jaccard_prefix_pairs(df, "doc_id", "text", threshold=t).collect()
        }
        want = {
            (r.id_a, r.id_b, r.jaccard)
            for r in jaccard_similar_pairs(df, "doc_id", "text", threshold=t).collect()
        }
        assert got == want, (t, got, want)


def test_pagerank_star_graph(spark):
    """On an undirected star the hub outranks every leaf, and total rank
    mass stays ~1 (bidirectional edges leave no dangling nodes)."""
    from pontem_spark.operators.graph import pagerank

    leaves = [f"leaf{i}" for i in range(8)]
    pairs = [("hub", l) for l in leaves]
    edges = spark.createDataFrame(
        pairs + [(d, s) for s, d in pairs], "src string, dst string"
    )
    ranks = {r.node: r["rank"] for r in pagerank(edges, iterations=5).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    hub = ranks["hub"]
    assert all(hub > ranks[l] for l in leaves)
    assert len({round(ranks[l], 12) for l in leaves}) == 1  # symmetry


def test_pagerank_dangling_mass_conserved(spark):
    """A genuinely DIRECTED graph with a sink: without the dangling term,
    the sink's rank leaks out of the distribution every iteration. With it
    (the default), total mass stays exactly 1 and the ranks match a dense
    NumPy power iteration using the same redistribution rule
    (VERDICT r6 #5)."""
    import numpy as np

    from pontem_spark.operators.graph import pagerank

    # 1→3, 2→3, 3 is a pure sink; 4→1, 4→2 feeds the top
    pairs = [(4, 1), (4, 2), (1, 3), (2, 3)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    d, iters = 0.85, 4
    got = {r.node: r["rank"] for r in pagerank(edges, damping=d, iterations=iters).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-9, "mass not conserved"

    ids = [1, 2, 3, 4]
    n = len(ids)
    A = np.zeros((n, n))  # column-stochastic link matrix
    outdeg = {4: 2, 1: 1, 2: 1}
    for s, t in pairs:
        A[ids.index(t), ids.index(s)] = 1.0 / outdeg[s]
    r = np.full(n, 1.0 / n)
    dangling = np.array([1 if i == 3 else 0 for i in ids], dtype=float)
    for _ in range(iters):
        S = float(r @ dangling)
        r = (1 - d) / n + d * (A @ r + S / n)
    for i, node in enumerate(ids):
        assert abs(got[node] - r[i]) < 1e-9, (node, got[node], r[i])

    # the flag off reproduces the old leaky behavior (mass < 1)
    leaky = {
        r_.node: r_["rank"]
        for r_ in pagerank(edges, damping=d, iterations=iters, handle_dangling=False).collect()
    }
    assert sum(leaky.values()) < 1.0 - 1e-6


def test_categorical_association_known_cases(spark):
    """MI/NMI/chi2 sanity: independent columns give ~0; identical columns
    give NMI 1 with MI = H(X); scipy-free closed-form check."""
    import math

    from pontem_spark.operators.profile import categorical_association

    # identical columns, two balanced levels: MI = H = ln 2, NMI = 1
    rows = [(("a" if i % 2 else "b"),) * 2 for i in range(100)]
    df = spark.createDataFrame([(x, y) for x, y in rows], "x string, y string")
    r = categorical_association(df, "x", "y").collect()[0]
    assert abs(r.mi_nats - math.log(2)) < 1e-5
    assert abs(r.nmi - 1.0) < 1e-6
    assert r.n == 100

    # independent 2x2 with equal counts: MI = 0, chi2 = 0
    rows2 = [(a, b) for a in "ab" for b in "cd" for _ in range(25)]
    df2 = spark.createDataFrame(rows2, "x string, y string")
    r2 = categorical_association(df2, "x", "y").collect()[0]
    assert abs(r2.mi_nats) < 1e-9 and abs(r2.chi2) < 1e-9


def test_containment_catches_subdocument(spark):
    """A short doc pasted inside a long one: Jaccard is tiny (misses it),
    containment is 1.0 (catches it, in the right direction only)."""
    from pontem_spark.operators.dedup import containment_pairs, jaccard_similar_pairs

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"tok{i} tok{i+1} tok{i+2}" for i in range(0, 60, 3))
    rows = [(1, short), (2, filler + " " + short + " " + filler)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    jac = jaccard_similar_pairs(df, "doc_id", "text", threshold=0.5).collect()
    assert jac == []  # symmetric measure misses the inclusion
    cont = containment_pairs(df, "doc_id", "text", threshold=0.9).collect()
    assert [(r.id_contained, r.id_container, r.containment) for r in cont] == [
        (1, 2, 1.0)
    ]


def test_embedding_dim_profile_flags_dead_dimension(spark):
    from pontem_spark.operators.profile import embedding_dimension_profile

    rows = [(i, [float(i), 7.0, float(-i)]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    prof = {r.dim: r for r in embedding_dimension_profile(df).collect()}
    assert prof[1].sd == 0.0 and prof[1].mean == 7.0  # dead dimension
    assert prof[0].n == 10 and prof[0].lo == 0.0 and prof[0].hi == 9.0
    assert prof[2].mean == -prof[0].mean


def test_grouped_qcut_balanced_within_each_group(spark):
    """Each group spreads ~evenly over its own buckets even when the groups'
    value ranges are disjoint (a global qcut would put group B entirely in
    the top bucket)."""
    from pontem_spark.operators.binning import grouped_quantile_bins

    rows = [("a", float(i)) for i in range(100)] + [
        ("b", 1000.0 + i) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = grouped_quantile_bins(df, "g", "v", q=4)
    counts = {
        (r.g, r.bucket): r.n
        for r in out.groupBy("g", "bucket").agg(F.count("*").alias("n")).collect()
    }
    for g in ("a", "b"):
        for b in range(4):
            assert 20 <= counts[(g, b)] <= 30, counts


def test_histogram_state_clamps_extreme_values_ansi(spark):
    """Far-out-of-range values (incl. infinities) clamp into the edge bins
    instead of overflowing the int cast under Spark 4's ANSI mode; NaN is
    missing, not a bin member."""
    from pontem_spark.operators.sketches import histogram_state

    rows = [(1e11,), (-1e11,), (float("inf",),), (float("-inf"),), (float("nan"),), (5.0,), (None,)]
    df = spark.createDataFrame([(float(v),) if v is not None else (None,) for (v,) in rows], "v double")
    bins = histogram_state(df, [], "v", lo=0.0, hi=8.0, n_bins=4).collect()[0].bins
    # 5.0 -> bin 2; +1e11/+inf -> bin 3; -1e11/-inf -> bin 0; NaN/null skipped
    assert bins == [2, 0, 1, 2]


def test_pagerank_empty_graph(spark):
    from pontem_spark.operators.graph import pagerank

    edges = spark.createDataFrame([], "src string, dst string")
    assert pagerank(edges).collect() == []


def test_grouped_qcut_keeps_null_group_rows(spark):
    """Rows with a NULL group key bin among themselves instead of being
    silently dropped by a null-rejecting join."""
    from pontem_spark.operators.binning import grouped_quantile_bins

    rows = [("a", float(i)) for i in range(40)] + [(None, float(i)) for i in range(40)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = grouped_quantile_bins(df, "g", "v", q=4)
    assert out.count() == 80  # nothing dropped
    null_buckets = {r.bucket for r in out.filter(F.col("g").isNull()).collect()}
    assert null_buckets == {0, 1, 2, 3}


def test_categorical_association_constant_column_nmi_null(spark):
    from pontem_spark.operators.profile import categorical_association

    df = spark.createDataFrame([("a", x) for x in "xyxy"], "c string, d string")
    r = categorical_association(df, "c", "d").collect()[0]
    assert r.nmi is None  # 0/0 is a defined NULL, not NaN
    assert r.mi_nats == 0.0


def test_bloom_semi_join_equals_exact(spark):
    """The Bloom pre-filter composed with the verify join is bit-identical
    to the plain semi-join (no false negatives, positives removed), and
    the pre-filter alone never drops a true match."""
    from pontem_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
        bloom_semi_join,
    )
    from pontem_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    cust = load_table(spark, SF_SMOKE, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, SF_SMOKE, "orders")
    got = sorted(
        bloom_semi_join(orders, cust, "o_custkey", "c_custkey")
        .select("o_orderkey")
        .toPandas()["o_orderkey"]
    )
    want = sorted(
        orders.join(
            cust.select("c_custkey"),
            orders["o_custkey"] == F.col("c_custkey"),
            "left_semi",
        )
        .select("o_orderkey")
        .toPandas()["o_orderkey"]
    )
    assert got == want and len(got) > 0

    # no false negatives from the pre-filter alone (tiny filter → many
    # false positives, still a superset of the true matches)
    words = bloom_build(cust, "c_custkey", num_bits=4096)
    pre = set(
        orders.filter(bloom_might_contain(words, F.col("o_custkey")))
        .select("o_custkey")
        .toPandas()["o_custkey"]
    )
    true_keys = set(cust.select("c_custkey").toPandas()["c_custkey"]) & set(
        orders.select("o_custkey").toPandas()["o_custkey"]
    )
    assert true_keys <= pre

    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(cust, "c_custkey", num_bits=100)
    with pytest.raises(ValueError, match="cap"):
        bloom_build(cust, "c_custkey", num_bits=1 << 30)


def test_cms_merge_invariance_and_overestimate(spark):
    """A merge tree of count-min states equals the direct build
    bit-for-bit, and estimates never undercount (the CMS guarantee)."""
    from pontem_spark.operators.sketches import cms_estimate, cms_merge, cms_state

    df = spark.createDataFrame(
        [(i, f"k{i % 7}") for i in range(500)], "id long, k string"
    )
    direct = cms_state(df, "k", width=64, depth=3)
    halves = cms_merge(
        cms_state(df.filter(F.col("id") % 2 == 0), "k", width=64, depth=3),
        cms_state(df.filter(F.col("id") % 2 == 1), "k", width=64, depth=3),
    )
    d = sorted(map(tuple, direct.collect()))
    m = sorted(map(tuple, halves.collect()))
    assert d == m

    est = cms_estimate(direct, df, "k", width=64, depth=3).toPandas()
    exact = df.groupBy("k").count().toPandas()
    joined = est.merge(exact, on="k")
    assert (joined["cnt_est"] >= joined["count"]).all()
    # width 64 >> 7 keys: the narrow grid still bounds total overcount
    assert (joined["cnt_est"] - joined["count"]).sum() <= 500


def test_bigram_pmi_counts_consistent(spark):
    """PMI columns agree with independent count queries and the ln()
    arithmetic on a corpus small enough to check by hand."""
    import math

    from pontem_spark.operators.textstats import bigram_pmi

    docs = spark.createDataFrame(
        [("a b a b",), ("a b c",), ("c c a b",)], "text string"
    )
    out = {r["ab"]: r for r in bigram_pmi(docs, "text", min_count=1).collect()}
    # corpus: tokens = 11, bigrams = 8; "a b" appears 4x; c_a=4, c_b=4
    r = out["a b"]
    assert (r["c_ab"], r["c_a"], r["c_b"]) == (4, 4, 4)
    want = math.log((4 / 8) / ((4 / 11) * (4 / 11)))
    assert abs(r["pmi"] - round(want, 4)) < 1e-9


def test_grouped_linear_trend_matches_numpy(spark):
    import numpy as np

    from pontem_spark.operators.profile import grouped_linear_trend

    xs = np.arange(50)
    ys = 2.0 * xs + 1 + (xs % 3)
    rows = [("a", float(x), float(y)) for x, y in zip(xs, ys)]
    rows += [("c", 1.0, 3.0), ("c", 1.0, 4.0)]  # constant x → NULL fit
    df = spark.createDataFrame(rows, "k string, x double, y double")
    out = {r["k"]: r for r in grouped_linear_trend(df, ["k"], "x", "y").collect()}
    s, i = np.polyfit(xs, ys, 1)
    r2 = np.corrcoef(xs, ys)[0, 1] ** 2
    assert out["a"]["slope"] == round(float(s), 6)
    assert out["a"]["intercept"] == round(float(i), 6)
    assert out["a"]["r2"] == round(float(r2), 6)
    assert out["c"]["slope"] is None and out["c"]["r2"] is None


def test_chunk_by_tokens_edges(spark):
    import pytest

    from pontem_spark.operators.chunking import chunk_by_tokens

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x"), (3, None)], ["id", "text"]
    )
    out = chunk_by_tokens(df, "id", "text", size=3, overlap=1).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append((r["chunk_id"], r["chunk_text"], r["n_tokens"]))
    # starts 0,2,4,6 -> windows of 3 tokens, last a 1-token suffix
    assert by_id[1] == [(0, "a b c", 3), (1, "c d e", 3), (2, "e f g", 3), (3, "g", 1)]
    assert by_id[2] == [(0, "x", 1)]
    assert 3 not in by_id  # NULL text dropped like SQL unnest
    with pytest.raises(ValueError):
        chunk_by_tokens(df, "id", "text", size=3, overlap=3)
    with pytest.raises(ValueError):
        chunk_by_tokens(df, "id", "text", size=0)
    # plan shape: projection + generate only — no Exchange
    plan = chunk_by_tokens(df, "id", "text", 4, 2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_mix_sources_feasible_mix(spark):
    import pytest

    from pontem_spark.operators.sampling import mix_sources

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(600)]
    df = spark.createDataFrame(rows, ["id", "src"])
    kept = mix_sources(df, "src", "id", {"a": 2.0, "b": 1.0}).groupBy("src").count()
    counts = {r["src"]: r["count"] for r in kept.collect()}
    # c dropped entirely; binding stratum a keeps ~all, b ~half of a's rate
    assert "c" not in counts
    assert counts["a"] == 200  # rate 1.0 -> every row survives
    assert abs(counts["b"] - 100) < 25  # md5 realization of rate 0.5
    with pytest.raises(ValueError):
        mix_sources(df, "src", "id", {})
    with pytest.raises(ValueError):
        mix_sources(df, "src", "id", {"a": -1.0})


def test_dup_ngram_signals_known_values(spark):
    from pontem_spark.operators.curation import dup_ngram_signals

    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "q w e r t y"), (3, "x y")], ["id", "text"]
    )
    out = {r["id"]: r for r in dup_ngram_signals(df, "id", "text", n=2).collect()}
    # doc 1 bigrams: ab ba ab ba ab -> 5 grams, 2 distinct, top 3/5, all dup
    assert out[1]["n_grams"] == 5 and out[1]["n_distinct"] == 2
    assert out[1]["top_share"] == 0.6 and out[1]["dup_frac"] == 1.0
    # doc 2: all unique
    assert out[2]["dup_frac"] == 0.0 and out[2]["top_share"] == 0.2
    # doc 3 has exactly n tokens -> 1 gram; shorter docs are filtered
    assert out[3]["n_grams"] == 1
    plan = dup_ngram_signals(df, "id", "text", 2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pca_whitening_identity_covariance(spark):
    import numpy as np

    from pontem_spark.operators.pca import (
        apply_whitening,
        embedding_moments,
        fit_whitening,
    )

    rng = np.random.default_rng(7)
    d = 8
    A = rng.normal(size=(d, d))
    X = rng.normal(size=(2000, d)) @ A  # strongly correlated dims
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(X)], ["id", "vec"]
    ).repartition(6)

    mean, W = fit_whitening(df, "vec", eps=1e-9)
    out = apply_whitening(df, "vec", mean, W)
    Y = np.stack([r["whitened"] for r in out.orderBy("id").collect()])
    cov = np.cov(Y, rowvar=False, ddof=1)
    assert np.allclose(np.diag(cov), 1.0, atol=0.05)
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < 0.05
    # moments are partition-count invariant (up to FP reassociation)
    n1, m1, s1 = embedding_moments(df.repartition(2), "vec")
    n2, m2, s2 = embedding_moments(df.repartition(13), "vec")
    assert n1 == n2 == 2000
    assert np.allclose(m1, m2) and np.allclose(s1, s2)
    # PCA (rotating) form also whitens
    mean_p, Wp = fit_whitening(df, "vec", eps=1e-9, zca=False)
    Yp = (X - mean_p) @ Wp.T
    assert np.allclose(np.cov(Yp, rowvar=False), np.eye(d), atol=0.05)


def test_triangle_count_known_graphs(spark):
    """Known-value graphs: K4 (4 triangles), a square + diagonal (2),
    a hub star (0), and a randomized Erdos-Renyi graph checked against a
    brute-force itertools count."""
    import itertools
    import random

    from pontem_spark.operators.graph import triangle_count

    def count(edges):
        df = spark.createDataFrame(edges, ["src", "dst"])
        return triangle_count(df).first()["triangles"]

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert count(k4) == 4
    square_diag = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    assert count(square_diag) == 2
    star = [(0, i) for i in range(1, 8)]
    assert count(star) == 0
    # duplicate + reversed + self-loop edges are cleaned
    assert count(k4 + [(b, a) for a, b in k4] + [(1, 1), (0, 1)]) == 4

    rng = random.Random(11)
    nodes = list(range(24))
    edges = [(a, b) for a in nodes for b in nodes if a < b and rng.random() < 0.25]
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    brute = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    assert count(edges) == brute


def test_k_core_peeling(spark):
    """Known fixture: triangle + pendant chain — the 2-core is exactly the
    triangle (peeling cascades down the chain); plus an Erdos-Renyi graph
    checked against a python peel, and idempotence past the fixpoint."""
    import collections
    import random

    from pontem_spark.operators.graph import k_core

    tri_chain = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5)]
    df = spark.createDataFrame(tri_chain, ["src", "dst"])
    got = {(r["node"], r["degree"]) for r in k_core(df, 2).collect()}
    assert got == {(0, 2), (1, 2), (2, 2)}

    rng = random.Random(7)
    nodes = list(range(30))
    edges = [(a, b) for a in nodes for b in nodes if a < b and rng.random() < 0.12]

    def py_core(E, k):
        E = set(E)
        while True:
            deg = collections.Counter()
            for u, v in E:
                deg[u] += 1
                deg[v] += 1
            keep = {n for n, d in deg.items() if d >= k}
            E2 = {(u, v) for u, v in E if u in keep and v in keep}
            if E2 == E:
                return deg if all(d >= k for d in deg.values()) else py_core(E2, k)
            E = E2

    for k in (2, 3):
        want = {(n, d) for n, d in py_core(edges, k).items() if d >= k}
        df = spark.createDataFrame(edges or [(0, 1)], ["src", "dst"])
        got = {(r["node"], r["degree"]) for r in k_core(df, k, max_iterations=12).collect()}
        assert got == want, k


def test_k_core_nonconvergence_raises(spark):
    """Adversarial long chain (r7 verdict #2): a 12-edge path peels two
    endpoints per round, so max_iterations=2 hits the cap mid-peel — the
    guard must raise instead of silently returning a superset of the
    (empty) 2-core. With enough rounds the same graph converges to empty."""
    import pytest

    from pontem_spark.operators.graph import k_core

    path = [(i, i + 1) for i in range(12)]
    df = spark.createDataFrame(path, ["src", "dst"])
    with pytest.raises(ValueError, match="did not converge"):
        k_core(df, 2, max_iterations=2)
    assert k_core(df, 2, max_iterations=8).count() == 0


def test_bm25_topk_manual(spark):
    """Four tiny docs scored by hand with the Lucene idf form: the term
    filter, length normalization, and tie-break ordering all verified
    against an explicit python computation."""
    import math

    from pontem_spark.operators.textstats import bm25_topk

    docs = [
        (1, "apple banana apple"),
        (2, "apple cherry cherry cherry"),
        (3, "banana banana banana banana"),
        (4, "date fig grape"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = bm25_topk(df, "doc_id", "text", ["apple", "banana"], k=4).collect()

    toks = {i: t.split() for i, t in docs}
    n, avgdl = 4.0, sum(len(t) for t in toks.values()) / 4.0
    dfreq = {"apple": 2, "banana": 2}
    k1, b = 1.2, 0.75

    def score(i):
        s = 0.0
        for term, dfr in dfreq.items():
            tf = toks[i].count(term)
            if not tf:
                continue
            idf = math.log(1.0 + (n - dfr + 0.5) / (dfr + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks[i]) / avgdl))
        return math.floor(s * 1e4 + 0.5) / 1e4

    want = {i: score(i) for i in (1, 2, 3)}
    assert {r["doc_id"] for r in got} == {1, 2, 3}  # doc 4 hits no term
    for r in got:
        assert r["bm25"] == want[r["doc_id"]], r
    # ordering: rounded score desc, id asc
    assert [r["doc_id"] for r in got] == sorted(want, key=lambda i: (-want[i], i))


def test_group_split_leakage_safe(spark):
    """Every group lands wholly in one split; labels exhaust the rows and
    follow the cumulative bucket thresholds."""
    from pontem_spark.operators.sampling import group_split

    rows = [(f"g{i % 37}", i) for i in range(500)]
    df = spark.createDataFrame(rows, ["grp", "x"])
    out = group_split(df, "grp", {"train": 80, "val": 10, "test": 10})
    per_group = (
        out.groupBy("grp")
        .agg(F.countDistinct("split").alias("n_splits"))
        .collect()
    )
    assert all(r["n_splits"] == 1 for r in per_group)
    assert out.filter(F.col("split").isNull()).count() == 0
    labels = {r["split"] for r in out.select("split").distinct().collect()}
    assert labels <= {"train", "val", "test"}
    assert out.count() == 500


def test_time_decay_agg_manual(spark):
    """Three events for one key, hand-computed half-life weights (ages 0,
    1 and 2 halflives -> weights 1, 0.5, 0.25)."""
    import datetime as dt

    from pontem_spark.operators.timeseries import time_decay_agg

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("u", t0, 8.0),
        ("u", t0 + dt.timedelta(seconds=3600), 4.0),
        ("u", t0 + dt.timedelta(seconds=7200), 2.0),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    got = time_decay_agg(df, "k", "ts", "v", halflife_s=3600.0).first()
    # aged from the LATEST event: weights 0.25, 0.5, 1.0
    total = 0.25 * 8 + 0.5 * 4 + 1.0 * 2
    mean = total / (0.25 + 0.5 + 1.0)
    assert got["n_events"] == 3
    import math

    assert got["decayed_total"] == math.floor(total * 1e4 + 0.5) / 1e4
    assert got["decayed_mean"] == math.floor(mean * 1e4 + 0.5) / 1e4


def test_rrf_fuse_manual(spark):
    """Two hand-made rankings: fused score = sum of 1/(60+rank) over the
    lists that retrieved the doc; ordering on rounded score, id ties."""
    import math

    from pontem_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["doc_id", "rank"])
    b = spark.createDataFrame([(3, 1), (1, 2), (4, 3)], ["doc_id", "rank"])
    got = {r["doc_id"]: (r["rrf_score"], r["n_lists"]) for r in rrf_fuse([a, b], k=4).collect()}

    def s(*ranks):
        return math.floor(sum(1.0 / (60 + r) for r in ranks) * 1e6 + 0.5) / 1e6

    assert got == {
        1: (s(1, 2), 2),
        3: (s(3, 1), 2),
        2: (s(2), 1),
        4: (s(3), 1),
    }


def test_label_propagation_two_cliques(spark):
    """Two 4-cliques joined by one bridge edge: LPA settles each clique
    onto one community, and the two communities differ."""
    from pontem_spark.operators.graph import label_propagation

    c1 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    c2 = [(a, b) for a in "wxyz" for b in "wxyz" if a < b]
    edges = c1 + c2 + [("d", "w")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["community"] for r in label_propagation(df, iterations=4).collect()}
    assert len(got) == 8
    left = {got[n] for n in "abc"}
    right = {got[n] for n in "xyz"}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_skew_report_known_distribution(spark):
    """Hand-built skew: key 'a' x6, 'b' x3, 'c' x1 — shares, cumulative
    shares, ranks and the distinct-key count all verified exactly."""
    from pontem_spark.operators.profile import skew_report

    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, ["k"])
    got = {r["rank"]: r for r in skew_report(df, "k", top_n=2).collect()}
    assert set(got) == {1, 2}
    assert (got[1]["key"], got[1]["cnt"], got[1]["share"], got[1]["cum_share"]) == ("a", 6, 0.6, 0.6)
    assert (got[2]["key"], got[2]["cnt"], got[2]["share"], got[2]["cum_share"]) == ("b", 3, 0.3, 0.9)
    assert got[1]["distinct_keys"] == 3


def test_mad_outliers_known(spark):
    """One group with a planted spike: median/MAD computed by hand; the
    spike (and only the spike) crosses the 3.5 modified-z gate. A
    constant group (MAD=0) is excluded, not a divide-by-zero."""
    from pontem_spark.operators.profile import mad_outliers

    rows = [("g", i, float(v)) for i, v in enumerate([10, 11, 12, 13, 14, 100])]
    rows += [("c", 100 + i, 5.0) for i in range(4)]
    df = spark.createDataFrame(rows, ["grp", "id", "v"])
    got = mad_outliers(df, "grp", "id", "v", threshold=3.5).collect()
    # group g: median 12.5, deviations [2.5,1.5,.5,.5,1.5,87.5] -> MAD 1.5
    # spike z = .6745*87.5/1.5 = 39.3458; next largest = .6745*2.5/1.5 = 1.12
    assert [(r["grp"], r["id"], r["robust_z"]) for r in got] == [("g", 5, 39.3458)]


def test_ctfidf_separates_class_vocab(spark):
    """Two classes with disjoint signature words among shared filler: each
    class's top term is its signature word."""
    from pontem_spark.operators.textstats import ctfidf_top_terms

    rows = [("A", "alpha common filler " * 5), ("A", "alpha common stuff"),
            ("B", "beta common filler " * 5), ("B", "beta common stuff")]
    df = spark.createDataFrame(rows, ["cls", "text"])
    got = ctfidf_top_terms(df, "cls", "text", k=1).collect()
    top = {r["cls"]: r["term"] for r in got}
    assert top == {"A": "alpha", "B": "beta"}


def test_rfm_features_manual(spark):
    """Two users, hand-computed recency/frequency/monetary and 2-tile
    scores."""
    import datetime as dt

    from pontem_spark.operators.timeseries import rfm_features

    t0 = dt.datetime(2024, 1, 10)
    rows = [
        ("u1", t0, 10.0),
        ("u1", t0 - dt.timedelta(days=1), 5.0),
        ("u1", t0 - dt.timedelta(days=2), 5.0),
        ("u2", t0 - dt.timedelta(days=4), 100.0),
    ]
    df = spark.createDataFrame(rows, ["u", "ts", "v"])
    got = {r["u"]: r for r in rfm_features(df, "u", "ts", "v", n_tiles=2).collect()}
    assert (got["u1"]["recency_days"], got["u1"]["frequency"], got["u1"]["monetary"]) == (0, 3, 20.0)
    assert (got["u2"]["recency_days"], got["u2"]["frequency"], got["u2"]["monetary"]) == (4, 1, 100.0)
    # u1 is most recent & most frequent (tile 1); u2 has the money
    assert (got["u1"]["r_score"], got["u1"]["f_score"], got["u1"]["m_score"]) == (1, 1, 2)
    assert (got["u2"]["r_score"], got["u2"]["f_score"], got["u2"]["m_score"]) == (2, 2, 1)


def test_negative_samples_ring(spark):
    """10 ids, k=2 -> step=3: negatives are exactly (pos+3, pos+6) mod 10
    in id order; no anchor is its own negative; every anchor gets k."""
    from pontem_spark.operators.sampling import negative_samples

    ids = [(i * 10,) for i in range(10)]  # non-dense ids on purpose
    df = spark.createDataFrame(ids, ["id"])
    got = negative_samples(df, "id", k=2).collect()
    assert len(got) == 20
    order = sorted(i for (i,) in ids)
    pos = {v: i for i, v in enumerate(order)}
    for r in got:
        expect = order[(pos[r["anchor_id"]] + r["slot"] * 3) % 10]
        assert r["negative_id"] == expect
        assert r["negative_id"] != r["anchor_id"]


def test_decayed_state_merge_equals_direct(spark):
    """Split events three ways, build decayed states independently, merge
    in two different orders — both equal the direct single-pass
    time_decay_agg after rounding (exponential decay is a mergeable
    monoid; re-anchoring is exact algebra up to float ulps)."""
    import datetime as dt

    from pontem_spark.operators.incremental import (
        decayed_state,
        finalize_decayed,
        merge_decayed,
    )
    from pontem_spark.operators.timeseries import time_decay_agg

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("u%d" % (i % 3), t0 + dt.timedelta(hours=i), float(i * 7 % 13) + 1.0)
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    direct = {
        r["k"]: r for r in time_decay_agg(df, "k", "ts", "v", 7200.0).collect()
    }

    parts = [
        decayed_state(df.filter(F.col("ts") < t0 + dt.timedelta(hours=20)), "k", "ts", "v", 7200.0),
        decayed_state(
            df.filter(
                (F.col("ts") >= t0 + dt.timedelta(hours=20))
                & (F.col("ts") < t0 + dt.timedelta(hours=40))
            ),
            "k", "ts", "v", 7200.0,
        ),
        decayed_state(df.filter(F.col("ts") >= t0 + dt.timedelta(hours=40)), "k", "ts", "v", 7200.0),
    ]
    m1 = merge_decayed(merge_decayed(parts[0], parts[1], "k", 7200.0), parts[2], "k", 7200.0)
    m2 = merge_decayed(parts[2], merge_decayed(parts[1], parts[0], "k", 7200.0), "k", 7200.0)
    for merged in (m1, m2):
        got = {r["k"]: r for r in finalize_decayed(merged, "k").collect()}
        assert set(got) == set(direct)
        for k in direct:
            assert got[k]["n_events"] == direct[k]["n_events"]
            assert got[k]["decayed_total"] == direct[k]["decayed_total"], k
            assert got[k]["decayed_mean"] == direct[k]["decayed_mean"], k


def test_simhash_collapse_identical_scale_path(spark):
    """r10 scale-step pin: collapse_identical pre-collapses identical
    fingerprints to one min-id representative before banding (the
    exact-duplicate-pressure scale path — without it c copies of a doc
    put c^2 candidates in every shared band bucket). The representative
    pair set must equal the plain banded pair set computed over the
    distinct-fingerprint representatives."""
    from pyspark.sql import functions as F

    from pontem_spark.operators import dedup as D

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again and again!",
        "a completely different document about spark scale testing",
    ]
    rows = []
    did = 0
    for t in texts:
        for _ in range(5):  # 5 exact copies of each
            rows.append((did, t))
            did += 1
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    fp = D.simhash_md5(docs, "doc_id", "text", bits=60)

    collapsed = D.simhash_band_candidates(
        fp, "doc_id", "simhash60", bits=60, n_bands=9, collapse_identical=True
    ).toPandas()
    reps = fp.groupBy("simhash60").agg(F.min("doc_id").alias("doc_id"))
    manual = D.simhash_band_candidates(
        reps, "doc_id", "simhash60", bits=60, n_bands=9
    ).toPandas()
    got = sorted(map(tuple, collapsed[["id_a", "id_b"]].values.tolist()))
    want = sorted(map(tuple, manual[["id_a", "id_b"]].values.tolist()))
    assert got == want
    # representatives are min ids: 3 distinct texts -> ids 0, 5, 10 only
    ids = {i for p in got for i in p}
    assert ids <= {0, 5, 10}
    # every near-dup pair of ORIGINALS is recoverable via representatives:
    # texts 0 and 1 differ by one char -> their reps (0, 5) must pair
    assert (0, 5) in got
