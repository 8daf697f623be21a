"""Training-data pipeline operators: dedup ladder, similarity search, text
analysis, multimodal plumbing (SURVEY.md §2.9)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from sketchlib.pipeline import dedup, multimodal, similarity, text
from sketchlib.spark import get_spark

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    yield get_spark("pipeline-tests", cpus=8, shuffle_partitions=8)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_exact_dedup(spark, docs):
    corpus = docs.select("doc_id", "text").unionByName(
        docs.select((F.col("doc_id") + 10000).alias("doc_id"), "text")
    )
    kept = dedup.exact_dedup(corpus, "text", "doc_id")
    assert kept.count() == docs.count()
    # survivors are the min-id copies
    assert kept.agg(F.max("doc_id")).first()[0] < 10000


def test_minhash_detects_partial_overlap(spark, docs):
    """Near-dups (prefix-truncated copies, Jaccard ≈ 0.9+) must be caught by
    LSH candidates and survive exact verification."""
    base = docs.filter(F.col("doc_id") < 40).select("doc_id", "text")
    near = base.select(
        (F.col("doc_id") + 5000).alias("doc_id"),
        F.expr("substring(text, 8, length(text))").alias("text"),
    )
    pairs = dedup.minhash_lsh_pairs(
        base.unionByName(near), "text", "doc_id", threshold=0.7
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    expected = {(i, i + 5000) for i in range(40)}
    missed = expected - found
    assert len(missed) <= 2, f"LSH missed {len(missed)} of 40 near-dup pairs"


def test_minhash_signature_determinism(spark, docs):
    a = dedup.minhash_signatures(docs.limit(50), "text", "doc_id").collect()
    b = dedup.minhash_signatures(docs.limit(50).repartition(7), "text", "doc_id").collect()
    da = {r["id"]: r["sig"] for r in a}
    db = {r["id"]: r["sig"] for r in b}
    assert da == db, "signatures must not depend on partitioning"


def test_simhash_hamming_zero_for_identical(spark, docs):
    corpus = docs.limit(30).select("doc_id", "text").unionByName(
        docs.limit(30).select((F.col("doc_id") + 7000).alias("doc_id"), "text")
    )
    sims = dedup.simhash_signatures(corpus, "text", "doc_id")
    cands = dedup.simhash_candidate_pairs(sims, max_hamming=0).collect()
    found = {(r["id_a"], r["id_b"]) for r in cands}
    assert {(i, i + 7000) for i in range(30)} <= found


def test_ngram_jaccard_exact_values(spark):
    rows = [(1, "abcdef"), (2, "abcdef"), (3, "xyzxyz")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.ngram_jaccard_pairs(df, "text", "doc_id", k=3, threshold=0.5).collect()
    assert len(pairs) == 1
    assert pairs[0]["id_a"] == 1 and pairs[0]["id_b"] == 2
    assert pairs[0]["jaccard"] == 1.0


def test_cosine_topk_matches_numpy(spark, emb):
    tbl = emb.toArrow()
    ids = np.array(tbl.column("vec_id").to_pylist())
    M = np.stack([np.array(v, dtype=np.float64) for v in tbl.column("embedding").to_pylist()])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    queries = {int(ids[i]): M[i] for i in range(3)}
    got = similarity.cosine_topk(emb, queries, k=4)
    for qi in range(3):
        sims = Mn @ Mn[qi]
        sims[qi] = -np.inf
        want = set(ids[np.argsort(-sims)[:4]])
        have = {n for q, n, _ in got if q == ids[qi]}
        assert have == want


def test_near_dup_pairs(spark, emb):
    corpus = emb.unionByName(emb.withColumn("vec_id", F.col("vec_id") + 10000))
    pairs = similarity.near_dup_pairs_exact(corpus, threshold=0.999)
    assert pairs.count() == emb.count()  # exactly the identity pairs


def test_lsh_ann_subset_and_recall(spark, emb):
    tbl = emb.limit(5).toArrow()
    queries = {
        int(i): np.array(v, dtype=np.float64)
        for i, v in zip(tbl.column("vec_id").to_pylist(), tbl.column("embedding").to_pylist())
    }
    exact = {(q, n) for q, n, _ in similarity.cosine_topk(emb, queries, k=5)}
    approx = {(q, n) for q, n, _ in similarity.lsh_ann_topk(emb, queries, k=5, planes=8)}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.10  # random 64-d data is LSH-hostile; scan ~3.5%


def test_duplicate_clusters_transitive(spark):
    """a-b and b-c pairs must land in ONE cluster with canonical = min."""
    ids = spark.createDataFrame([(i,) for i in range(6)], "id long")
    pairs = spark.createDataFrame([(0, 1), (1, 2), (3, 4)], "id_a long, id_b long")
    out = {r["id"]: r["canonical_id"] for r in dedup.duplicate_clusters(ids, pairs).collect()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5}


def test_text_columns(spark, docs):
    row = docs.select(
        text.token_count("text").alias("tok"),
        text.quality_score("text").alias("q"),
        text.lang_id("text").alias("lang"),
        text.bpe_ish_token_count("text").alias("bpe"),
    ).first()
    assert row["tok"] > 0 and 0.0 <= row["q"] <= 1.0 and row["bpe"] >= row["tok"]


def test_lang_id_markers(spark):
    rows = [
        (1, "das ist der hund und die katze nicht"),
        (2, "el que los una por como casa"),
        (3, "le chat est dans les des une"),
        (4, "这 是 的 一个 在 了 和"),
        (5, "the cat and the dog of it is"),
        (6, "zzz qqq xxx"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {r["id"]: r["lang"] for r in df.select("id", text.lang_id("t").alias("lang")).collect()}
    assert got == {1: "de", 2: "es", 3: "fr", 4: "zh", 5: "en", 6: "und"}


def test_fingerprint_stability(spark, docs):
    a = docs.select("doc_id", text.fingerprint_col(spark, "text").alias("fp")).collect()
    # normalization: extra whitespace and case don't change the fingerprint
    mangled = docs.select(
        "doc_id",
        text.fingerprint_col(
            spark, F.upper(F.concat(F.lit("  "), F.col("text"), F.lit(" ")))
        ).alias("fp"),
    ).collect()
    da = {r["doc_id"]: r["fp"] for r in a}
    dm = {r["doc_id"]: r["fp"] for r in mangled}
    assert da == dm


def test_multimodal_shapes_and_stub(spark, docs):
    media = multimodal.make_media_df(spark, docs.limit(10), "text", "doc_id")
    feats = multimodal.image_features(media, resize_to=4, fake=True).collect()
    assert len(feats) == 10
    assert all(len(r["feat"]) == 3 for r in feats)
    frames = multimodal.frame_sample(media, every=5, fake=True)
    assert frames.count() > 0
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"xx", {"height": 2, "width": 2, "channels": 3}, fake=False)
    # deterministic fake decode
    p1 = multimodal.decode_image(b"seed", {"height": 2, "width": 2, "channels": 3}, fake=True)
    p2 = multimodal.decode_image(b"seed", {"height": 2, "width": 2, "channels": 3}, fake=True)
    assert (p1 == p2).all()


def test_near_dup_pairs_bucketed_matches_exact(spark, emb):
    """The SRP-bucketed scale path must find identical pairs with recall 1
    and perturbed near-dups (cos ~ 0.9992) with recall >= 0.95 vs exact."""
    import pandas as pd

    base = emb.limit(200).toPandas()
    rng = np.random.default_rng(11)
    pert = base.copy()
    pert["vec_id"] = pert["vec_id"] + 10000
    pert["embedding"] = [
        (np.asarray(v, dtype=np.float64)
         + 0.04 * np.linalg.norm(v) * rng.standard_normal(len(v)) / np.sqrt(len(v))
         ).tolist()
        for v in base["embedding"]
    ]
    corpus = spark.createDataFrame(pd.concat([base, pert], ignore_index=True))

    exact = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in similarity.near_dup_pairs_exact(corpus, threshold=0.999).collect()
    }
    bucketed = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in similarity.near_dup_pairs_bucketed(corpus, threshold=0.999).collect()
    }
    assert exact, "fixture produced no near-dup pairs"
    found = set(bucketed) & set(exact)
    assert len(found) / len(exact) >= 0.95, f"recall {len(found)}/{len(exact)}"
    assert not (set(bucketed) - set(exact)), "bucketed emitted non-exact pairs"
    for k in found:
        assert abs(bucketed[k] - exact[k]) < 1e-9


def test_near_dup_pairs_auto_selector(spark, emb):
    corpus = emb.unionByName(emb.withColumn("vec_id", F.col("vec_id") + 10000))
    n = emb.count()
    small = similarity.near_dup_pairs(corpus, threshold=0.999, exact_cap=10**6)
    big = similarity.near_dup_pairs(corpus, threshold=0.999, exact_cap=1)
    assert small.count() == n and big.count() == n


def test_duplicate_clusters_long_chain(spark):
    """A 30-node chain (diameter 29) must converge — pointer jumping gives
    O(log d) rounds; plain one-hop propagation would exhaust 20 iters."""
    n = 30
    ids = spark.createDataFrame([(i,) for i in range(n)], "id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    out = {r["id"]: r["canonical_id"] for r in dedup.duplicate_clusters(ids, pairs, max_iters=12).collect()}
    assert out == {i: 0 for i in range(n)}


def test_short_doc_signatures_position_independent(spark):
    """Docs shorter than shingle_k must hash identically regardless of what
    follows them in the Arrow buffer (round-1 leak: the k-byte window mask
    read the next doc's bytes)."""
    a = spark.createDataFrame(
        [(1, "ab"), (2, "SUFFIX-ONE-XXXXX")], "doc_id long, text string"
    ).coalesce(1)
    b = spark.createDataFrame(
        [(3, "ab"), (4, "totally-different-suffix")], "doc_id long, text string"
    ).coalesce(1)
    sig_a = dedup.minhash_signatures(a, "text", "doc_id", shingle_k=5).filter("id = 1").first()["sig"]
    sig_b = dedup.minhash_signatures(b, "text", "doc_id", shingle_k=5).filter("id = 3").first()["sig"]
    assert sig_a == sig_b
    sim_a = dedup.simhash_signatures(a, "text", "doc_id", shingle_k=4).filter("id = 1").first()["sim"]
    sim_b = dedup.simhash_signatures(b, "text", "doc_id", shingle_k=4).filter("id = 3").first()["sim"]
    assert sim_a == sim_b


def test_srp_index_persist_and_probe(spark, emb, tmp_path):
    """Persisted SRP index: bucket-partitioned parquet, probe prunes to the
    multiprobe buckets and returns the same results as the on-the-fly LSH."""
    path = str(tmp_path / "srp_index")
    meta = similarity.build_srp_index(emb, path, planes=8, seed=7)
    assert meta["planes"] == 8 and meta["dim"] == 64

    tbl = emb.limit(5).toArrow()
    queries = {
        int(i): np.array(v, dtype=np.float64)
        for i, v in zip(tbl.column("vec_id").to_pylist(), tbl.column("embedding").to_pylist())
    }
    got = similarity.lsh_ann_topk_indexed(spark, path, queries, k=5)
    want = similarity.lsh_ann_topk(emb, queries, k=5, planes=8, seed=7)
    assert {(q, n) for q, n, _ in got} == {(q, n) for q, n, _ in want}

    # the probe plan must prune bucket partitions at the scan
    probe_df = spark.read.parquet(path).filter(F.col("bucket").isin([1, 2, 3]))
    plan = probe_df._jdf.queryExecution().executedPlan().toString()
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1), plan[:600]


def test_ngram_jaccard_hot_shingle_drop(spark, docs):
    """max_doc_freq drops stop-shingles before the self-join without
    changing the high-threshold pair set (identical docs still pair)."""
    corpus = docs.filter(F.col("doc_id") < 50).select("doc_id", "text")
    corpus = corpus.unionByName(
        corpus.select((F.col("doc_id") + 10000).alias("doc_id"), "text")
    )
    full = dedup.ngram_jaccard_pairs(corpus, "text", "doc_id", 3, 0.9)
    pruned = dedup.ngram_jaccard_pairs(corpus, "text", "doc_id", 3, 0.9, max_doc_freq=30)
    want = {(i, i + 10000) for i in range(50)}
    assert {(r["id_a"], r["id_b"]) for r in full.collect()} == want
    assert {(r["id_a"], r["id_b"]) for r in pruned.collect()} == want


def test_ivf_index_recall_and_pruning(spark, emb, tmp_path):
    """IVF index: cell-partitioned parquet; with n_probe covering half the
    cells, recall vs brute force on random data should beat the 8-plane SRP
    LSH; full-probe recall is 1.0 (every cell scanned = exact)."""
    path = str(tmp_path / "ivf_index")
    meta = similarity.build_ivf_index(emb, path, n_cells=16, seed=7)
    assert meta["n_cells"] == 16 and meta["dim"] == 64

    tbl = emb.limit(5).toArrow()
    queries = {
        int(i): np.array(v, dtype=np.float64)
        for i, v in zip(tbl.column("vec_id").to_pylist(), tbl.column("embedding").to_pylist())
    }
    exact = {(q, n) for q, n, _ in similarity.cosine_topk(emb, queries, k=5)}
    full = {(q, n) for q, n, _ in similarity.ivf_ann_topk(spark, path, queries, k=5, n_probe=16)}
    assert full == exact  # probing every cell is the exact search
    half = {(q, n) for q, n, _ in similarity.ivf_ann_topk(spark, path, queries, k=5, n_probe=8)}
    assert len(half & exact) / len(exact) >= 0.5

    plan = (
        spark.read.parquet(path)
        .filter(F.col("cell").isin([0, 1]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan[:600]


def test_near_dup_bucketed_collapse_and_tiling_correct(spark):
    """Duplicate groups + cross-group near-pairs, with gemm_tile=2 forcing
    tile boundaries through every group combination — the collapsed/tiled
    bucket kernel must emit exactly the exact-path pairs."""
    import pandas as pd

    rng = np.random.default_rng(3)
    bases = [rng.standard_normal(8) for _ in range(5)]
    rows = []
    vid = 0
    for gi, b in enumerate(bases):
        for _ in range(gi + 1):  # group sizes 1..5 (exact copies)
            rows.append((vid, b.tolist()))
            vid += 1
        # a near-twin of base 0 (cross-group pair above threshold)
        if gi == 0:
            twin = b + 1e-4 * np.linalg.norm(b) * rng.standard_normal(8)
            rows.append((vid, twin.tolist()))
            vid += 1
    corpus = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    )
    exact = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in similarity.near_dup_pairs_exact(corpus, threshold=0.999).collect()
    }
    bucketed = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in similarity.near_dup_pairs_bucketed(
            corpus, threshold=0.999, gemm_tile=2
        ).collect()
    }
    assert set(bucketed) == set(exact)
    for k, v in exact.items():
        assert abs(bucketed[k] - v) < 1e-9


def test_near_dup_hot_bucket_bounded(spark):
    """Adversarial hot bucket (VERDICT r2 #3): 20k distinct vectors in one
    tight cone — every vector lands in the SAME SRP bucket.  The old dense
    kernel would allocate a 20k x 20k (3.2 GB) sims matrix in one task; the
    tiled kernel peaks at gemm_tile^2.  Must complete and match exact."""
    import pandas as pd

    rng = np.random.default_rng(7)
    n, dim = 20_000, 16
    u = rng.standard_normal(dim)
    u /= np.linalg.norm(u)
    # tight cone: pairwise cos mostly ~0.998-1.0, a fraction above 0.9995
    noise = rng.standard_normal((n, dim)) / np.sqrt(dim)
    M = u[None, :] + 0.03 * noise
    corpus = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(n), "embedding": [r.tolist() for r in M]})
    )
    thr = 0.9995
    bucketed = similarity.near_dup_pairs_bucketed(
        corpus, threshold=thr, multiprobe_bits=0, gemm_tile=4096
    )
    exact = similarity.near_dup_pairs_exact(corpus, threshold=thr)
    nb, ne = bucketed.count(), exact.count()
    assert ne > 100, f"fixture produced too few qualifying pairs ({ne})"
    # one cone => one bucket => the bucketed path sees every pair: recall 1
    assert nb == ne, f"bucketed {nb} != exact {ne}"


def test_near_dup_hot_bucket_duplicate_heavy(spark):
    """Dup-heavy hot bucket: 50k rows but only 500 distinct vectors. The
    collapse step makes the GEMM 500x500 regardless of row count; clique
    expansion must produce exactly the per-group pair counts."""
    import pandas as pd

    rng = np.random.default_rng(13)
    groups, copies, dim = 500, 100, 8
    B = rng.standard_normal((groups, dim))
    vec_ids = np.arange(groups * copies)
    emb_rows = [B[i % groups].tolist() for i in range(groups * copies)]
    corpus = spark.createDataFrame(
        pd.DataFrame({"vec_id": vec_ids, "embedding": emb_rows})
    )
    pairs = similarity.near_dup_pairs_bucketed(
        corpus, threshold=0.9999, multiprobe_bits=0
    )
    from pyspark.sql import functions as F2

    # random dim-8 bases are far apart at cos>=0.9999 => only clique pairs
    expected = groups * (copies * (copies - 1) // 2)
    got = pairs.agg(
        F2.count("*").alias("n"), F2.min("cos").alias("mn"), F2.max("cos").alias("mx")
    ).first()
    assert got["n"] == expected, f"{got['n']} != {expected}"
    assert got["mn"] == 1.0 and got["mx"] == 1.0


# -- real codecs (stdlib fallback paths; Pillow/soundfile when present) ----

def _png_encode(arr, filters):
    """Test-side PNG writer applying a given filter type per row (the
    forward transforms of PNG spec §9) so every decoder branch is hit."""
    import struct as _s
    import zlib as _z

    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    bpp = c
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        cur = arr[y].reshape(-1).astype(np.int32)
        f = filters[y % len(filters)]
        raw.append(f)
        for i in range(w * c):
            a = int(cur[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            cc = int(prev[i - bpp]) if i >= bpp else 0
            if f == 0:
                v = cur[i]
            elif f == 1:
                v = cur[i] - a
            elif f == 2:
                v = cur[i] - b
            elif f == 3:
                v = cur[i] - (a + b) // 2
            else:
                pa, pb, pc = abs(b - cc), abs(a - cc), abs(a + b - 2 * cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                v = cur[i] - pred
            raw.append(v & 0xFF)
        prev = cur

    def chunk(t, d):
        return _s.pack(">I", len(d)) + t + d + _s.pack(">I", _z.crc32(t + d))

    ihdr = _s.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", _z.compress(bytes(raw))) + chunk(b"IEND", b""))


def test_png_stdlib_decode_all_filters_and_channels():
    rng = np.random.default_rng(3)
    for c in (1, 2, 3, 4):
        arr = rng.integers(0, 256, size=(7, 5, c), dtype=np.uint8)
        blob = _png_encode(arr, filters=[0, 1, 2, 3, 4])
        got = multimodal._decode_png(blob)
        assert got.shape == arr.shape
        assert (got == arr).all(), f"channels={c}"


def test_decode_image_dispatch_png():
    """decode_image without fake handles a real PNG via the stdlib path
    (or Pillow when installed) — the container no longer dead-ends."""
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8)
    blob = _png_encode(arr, filters=[4])
    got = multimodal.decode_image(bytes(blob), {"format": "png"}, fake=False)
    assert (got == arr).all()


def test_decode_audio_stdlib_wav():
    import io
    import wave

    rate, n = 8000, 500
    t = np.arange(n, dtype=np.float32)
    left = (np.sin(2 * np.pi * 440 * t / rate) * 20000).astype(np.int16)
    right = (np.cos(2 * np.pi * 220 * t / rate) * 15000).astype(np.int16)
    pcm = np.stack([left, right], axis=1).reshape(-1).tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm)
    got = multimodal.decode_audio(buf.getvalue(), {"format": "wav"}, fake=False)
    exp = (left.astype(np.float32) + right.astype(np.float32)) / 2 / 32768.0
    assert got.dtype == np.float32 and got.shape == (n,)
    assert np.allclose(got, exp, atol=1e-6)


def test_image_features_real_png_end_to_end(spark):
    """The mapInPandas image pipeline over REAL PNG blobs (fake=False):
    decode → resize → features, with the channel means matching a local
    decode of the same bytes."""
    import pandas as pd

    rng = np.random.default_rng(9)
    rows = []
    for i in range(6):
        arr = rng.integers(0, 256, size=(10 + i, 8, 3), dtype=np.uint8)
        rows.append((i, "image", bytearray(_png_encode(arr, filters=[i % 5])),
                     {"width": 8, "height": 10 + i, "channels": 3,
                      "sample_rate": 0, "n_frames": 0, "format": "png"},
                     arr.reshape(-1, 3).mean(axis=0)))
    media = spark.createDataFrame(
        pd.DataFrame([r[:4] for r in rows], columns=["id", "kind", "data", "meta"]),
        schema=multimodal.MEDIA_SCHEMA,
    )
    out = {r["id"]: r for r in multimodal.image_features(media, resize_to=4, fake=False).collect()}
    assert len(out) == 6
    for i, _, blob, _, chan_mean in rows:
        feat = np.array(out[i]["feat"])
        assert feat.shape == (3,)
        # mean of unequal-sized patch means ≈ global mean, not equal to it
        assert np.allclose(feat, chan_mean, atol=8.0), i


@pytest.mark.skipif(not multimodal.HAVE_PIL, reason="Pillow not installed")
def test_decode_image_pillow_path():
    import io as _io

    from PIL import Image

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    buf = _io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    got = multimodal.decode_image(buf.getvalue(), {"format": "png"}, fake=False)
    assert (got == arr).all()


@pytest.mark.skipif(not multimodal.HAVE_SOUNDFILE, reason="soundfile not installed")
def test_decode_audio_soundfile_path():
    import io as _io

    import soundfile as sf

    x = np.sin(np.linspace(0, 10, 1000)).astype(np.float32)
    buf = _io.BytesIO()
    sf.write(buf, x, 8000, format="WAV")
    got = multimodal.decode_audio(buf.getvalue(), {"format": "wav"}, fake=False)
    assert np.allclose(got, x, atol=1e-3)
