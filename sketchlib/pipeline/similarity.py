"""Similarity search over embedding columns (``array<float>``).

- **brute-force cosine top-k** (the exactness baseline): query matrix is
  broadcast; each partition GEMMs its block against the queries and emits a
  local top-k; a tiny global reduce finishes.  O(n·d·q) total, embarrassingly
  parallel, zero shuffle of the corpus.
- **LSH-bucketed ANN** (the scale path): signed-random-projection buckets
  (seeded hyperplanes); queries probe their bucket (plus multiprobe
  neighbors), exact rerank inside.  Sub-linear probes at 100 TB; recall
  reported against the brute-force baseline.
- **cosine near-dup pairs**: block × broadcast-matrix products, pairs ≥ τ.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _batch_matrix(batch: pa.RecordBatch, col: str) -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # float64 throughout: cosine values must agree with the (double-precision)
    # SQL oracle to 4+ decimals
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def cosine_topk(
    df: DataFrame,
    queries: dict[int, np.ndarray],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> list[tuple[int, int, float]]:
    """Exact top-k neighbors for each query vector.

    Returns [(query_id, neighbor_id, cosine)], k rows per query.  Partition
    tasks emit local top-k (k·q rows each); the driver merges — the
    per-partition-topk + small-reduce pattern that holds at any corpus size.
    """
    spark = df.sparkSession
    qids = sorted(queries)
    Q = _normalize(np.stack([np.asarray(queries[q], dtype=np.float64) for q in qids]))
    bq = spark.sparkContext.broadcast((qids, Q))

    proj = df.select(F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("v"))

    def local_topk(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        qids_, Q_ = bq.value
        ids_all, sims_all = [], []
        for b in batches:
            if not b.num_rows:
                continue
            ids = b.column("id").to_numpy(zero_copy_only=False)
            M = _normalize(_batch_matrix(b, "v"))
            sims = M @ Q_.T  # (n, q)
            ids_all.append(ids)
            sims_all.append(sims)
        if not ids_all:
            return
        ids = np.concatenate(ids_all)
        sims = np.concatenate(sims_all)
        out_q, out_id, out_s = [], [], []
        for j, qid in enumerate(qids_):
            col = sims[:, j]
            take = min(k + 1, col.size)
            top = np.argpartition(-col, take - 1)[:take]
            for t in top:
                out_q.append(qid)
                out_id.append(int(ids[t]))
                out_s.append(float(col[t]))
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(out_q, type=pa.int64()),
                pa.array(out_id, type=pa.int64()),
                pa.array(out_s, type=pa.float64()),
            ],
            names=["qid", "nid", "cos"],
        )

    local = proj.mapInArrow(local_topk, "qid long, nid long, cos double").toArrow()
    out: list[tuple[int, int, float]] = []
    qa = local.column("qid").to_numpy()
    na = local.column("nid").to_numpy()
    ca = local.column("cos").to_numpy()
    for qid in qids:
        mask = qa == qid
        nid, cos = na[mask], ca[mask]
        if exclude_self:
            keep = nid != qid
            nid, cos = nid[keep], cos[keep]
        order = np.lexsort((nid, -cos))[:k]
        out.extend((qid, int(nid[i]), float(cos[i])) for i in order)
    return out


def _srp_planes(dim: int, planes: int, seed: int) -> np.ndarray:
    """THE SRP hyperplane construction — the single definition shared by the
    column UDF, the driver-side query hashing, and the persisted index.  Any
    divergence between write-side and probe-side hashing silently zeroes
    index recall, so there is exactly one copy of this recipe."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, planes)).astype(np.float32)


def _srp_bucket_ids(M: np.ndarray, H: np.ndarray) -> np.ndarray:
    """(n, dim) float matrix → (n,) int64 bucket ids (sign bits, LSB = plane
    0).  Must stay bit-identical to the UDF path."""
    signs = (M.astype(np.float32) @ H) > 0
    weights = (1 << np.arange(H.shape[1], dtype=np.int64))[None, :]
    return (signs * weights).sum(axis=1)


def _srp_multiprobe(q: np.ndarray, H: np.ndarray) -> set[int]:
    """Query bucket + its 1-bit-flip neighbors."""
    b = int(_srp_bucket_ids(np.asarray(q, dtype=np.float32)[None, :], H)[0])
    return {b} | {b ^ (1 << i) for i in range(H.shape[1])}


def srp_bucket_col(
    spark: SparkSession, vec_col: str, dim: int, planes: int = 12, seed: int = 7
):
    """Signed-random-projection LSH bucket id (0..2^planes-1) as a column —
    the partitioning key for sub-linear ANN at scale."""
    bh = spark.sparkContext.broadcast(_srp_planes(dim, planes, seed))

    @F.pandas_udf("long")
    def _bucket(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy())
        return pd.Series(_srp_bucket_ids(M, bh.value))

    return _bucket(F.col(vec_col))


def lsh_ann_topk(
    df: DataFrame,
    queries: dict[int, np.ndarray],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    seed: int = 7,
) -> list[tuple[int, int, float]]:
    """ANN: restrict the exact search to the query's SRP bucket and its
    1-bit multiprobe neighbors (planes+1 of 2^planes buckets ⇒ ~
    (planes+1)/2^planes of the corpus scanned)."""
    spark = df.sparkSession
    dim = len(next(iter(queries.values())))
    H = _srp_planes(dim, planes, seed)
    probes: set[int] = set()
    for q in queries.values():
        probes |= _srp_multiprobe(q, H)

    with_bucket = df.withColumn(
        "__bucket", srp_bucket_col(spark, vec_col, dim, planes, seed)
    )
    candidates = with_bucket.filter(F.col("__bucket").isin(list(probes)))
    return cosine_topk(candidates, queries, k, id_col, vec_col)


def build_srp_index(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    seed: int = 7,
    dim: int | None = None,
) -> dict:
    """Persist an SRP-LSH ANN index: the corpus written as parquet
    PARTITIONED BY the SRP bucket, so a probe reads only its probed buckets'
    directories (PartitionFilters prune the other 2^planes-(planes+1) — the
    'persisted index' an ANN service reuses across query batches instead of
    re-hashing the corpus per call).  Returns the index metadata dict, also
    written to ``path/_srp_meta`` (via Spark, so hdfs://... / s3a://... index
    locations work; underscore-prefixed paths are invisible to the parquet
    reader)."""
    if dim is None:  # pass dim when known — skips a whole Spark job
        dim = len(df.select(vec_col).first()[0])
    spark = df.sparkSession
    (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .withColumn("bucket", srp_bucket_col(spark, "v", dim, planes, seed))
        # co-locate each bucket before the partitioned write: without this,
        # every task writes a file into every bucket dir it touches
        # (tasks x buckets small files); with it, one file per bucket
        .repartition(F.col("bucket"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
    meta = {"dim": dim, "planes": planes, "seed": seed}
    _write_index_meta(spark, path, "_srp_meta", meta)
    return meta


def _write_index_meta(spark: SparkSession, path: str, name: str, meta: dict) -> None:
    """Tiny index-metadata sidecar via the Hadoop FileSystem API — still
    FS-agnostic (hdfs:// / s3a:// / file:), but no Spark job: writing it as a
    1-row DataFrame cost ~6 s per index in job overhead, dominating the whole
    index build.  Underscore-prefixed, so the parquet reader ignores it."""
    import json

    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{path}/{name}")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(p, True)
    try:
        out.write(bytearray(json.dumps(meta).encode("utf-8")))
    finally:
        out.close()


def _read_index_meta(spark: SparkSession, path: str, name: str) -> dict:
    import json

    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{path}/{name}")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(p)
    try:
        # py4j passes byte[] by value, so a fill-my-buffer call can't work;
        # IOUtils RETURNS the bytes (commons-io ships with Spark)
        raw = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return json.loads(bytes(raw).decode("utf-8"))


def lsh_ann_topk_indexed(
    spark: SparkSession,
    path: str,
    queries: dict[int, np.ndarray],
    k: int = 5,
) -> list[tuple[int, int, float]]:
    """ANN top-k over a persisted SRP index: compute each query's bucket and
    its 1-bit multiprobe neighbors driver-side (a planes x dim GEMV), read
    ONLY those bucket partitions, exact-rerank inside.  The scan is pruned at
    the source — at 100 TB this touches (planes+1)/2^planes of the files."""
    meta = _read_index_meta(spark, path, "_srp_meta")
    H = _srp_planes(meta["dim"], meta["planes"], meta["seed"])
    probes: set[int] = set()
    for q in queries.values():
        probes |= _srp_multiprobe(q, H)
    cand = spark.read.parquet(path).filter(F.col("bucket").isin(list(probes)))
    return cosine_topk(cand, queries, k, id_col="id", vec_col="v")


def _kmeans_fit(X: np.ndarray, n_cells: int, iters: int = 10, seed: int = 7) -> np.ndarray:
    """Small deterministic spherical k-means on a driver-side sample — the
    IVF coarse quantizer.  Cosine metric: rows and centroids are
    L2-normalized; assignment = argmax dot."""
    Xn = _normalize(X.astype(np.float64))
    rng = np.random.default_rng(seed)
    C = Xn[rng.choice(Xn.shape[0], size=min(n_cells, Xn.shape[0]), replace=False)]
    for _ in range(iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        for c in range(C.shape[0]):
            members = Xn[assign == c]
            if members.size:
                C[c] = members.mean(axis=0)
        C = _normalize(C)
    return C


def build_ivf_index(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 64,
    train_rows: int = 100_000,
    seed: int = 7,
) -> dict:
    """Persist an IVF (inverted-file) ANN index: a k-means coarse quantizer
    trained on a bounded driver-side sample, then every vector assigned to
    its nearest centroid cell and written as parquet PARTITIONED BY cell.
    Probes read only n_probe cell directories.  Complements the SRP index:
    IVF adapts to the data distribution (clustered corpora), SRP is
    data-independent.  Returns metadata (centroids inline), also written to
    ``path/_ivf_meta`` (via Spark — FS-agnostic)."""
    spark = df.sparkSession
    sample = (
        df.select(F.col(vec_col).alias("v")).limit(int(train_rows)).toArrow()
    )
    X = np.stack([np.asarray(v, dtype=np.float64) for v in sample.column("v").to_pylist()])
    C = _kmeans_fit(X, n_cells, seed=seed)
    bc = spark.sparkContext.broadcast(C)

    @F.pandas_udf("int")
    def _cell(v: pd.Series) -> pd.Series:
        M = _normalize(np.stack(v.to_numpy()).astype(np.float64))
        return pd.Series(np.argmax(M @ bc.value.T, axis=1).astype(np.int32))

    (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .withColumn("cell", _cell(F.col("v")))
        .repartition(F.col("cell"))  # one file per cell, not tasks x cells
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    meta = {"n_cells": int(C.shape[0]), "dim": int(C.shape[1]), "seed": seed,
            "centroids": C.tolist()}
    _write_index_meta(spark, path, "_ivf_meta", meta)
    return meta


def ivf_ann_topk(
    spark: SparkSession,
    path: str,
    queries: dict[int, np.ndarray],
    k: int = 5,
    n_probe: int = 8,
) -> list[tuple[int, int, float]]:
    """ANN top-k over a persisted IVF index: each query probes its n_probe
    nearest cells (driver-side GEMV against the stored centroids), the scan
    reads only those cell partitions, exact rerank inside."""
    meta = _read_index_meta(spark, path, "_ivf_meta")
    C = np.asarray(meta["centroids"], dtype=np.float64)
    probes: set[int] = set()
    for q in queries.values():
        qn = _normalize(np.asarray(q, dtype=np.float64)[None, :])[0]
        sims = C @ qn
        take = min(n_probe, C.shape[0])
        probes.update(int(c) for c in np.argpartition(-sims, take - 1)[:take])
    cand = spark.read.parquet(path).filter(F.col("cell").isin(list(probes)))
    return cosine_topk(cand, queries, k, id_col="id", vec_col="v")


def near_dup_pairs_bucketed(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 12,
    seed: int = 7,
    multiprobe_bits: int = 1,
    gemm_tile: int = 4096,
) -> DataFrame:
    """All pairs with cosine ≥ τ, the SCALE path: SRP-bucket every vector
    (each vector also emitted to its 1-bit-flip neighbor buckets —
    symmetric multiprobe covers bucket-code Hamming ≤ 2·multiprobe_bits),
    exact GEMM pairs inside each bucket via groupBy(bucket).applyInArrow,
    deduped across buckets.  No driver collect, no full-matrix broadcast:
    work is quadratic per bucket, not per corpus.  For cos ≥ 0.999 pairs at
    planes=12 the 1-bit multiprobe recall is ≥ 0.999 (P[plane splits a
    2.6-degree pair] ≈ 0.014); identical vectors always share every bucket.

    Hot-bucket safety (the dup-heavy worst case): inside each bucket,
    byte-identical vectors are collapsed to one representative before the
    GEMM (cost quadratic in distinct vectors), within-group pairs are clique-
    expanded arithmetically, and the GEMM itself is tiled at ``gemm_tile`` so
    peak intermediate memory is O(gemm_tile²) regardless of bucket size.
    Output cardinality (= the actual qualifying pairs) remains the contract;
    at 100 TB run exact dedup first so identical documents don't demand
    quadratic pair OUTPUT here."""
    spark = df.sparkSession
    first = df.select(vec_col).first()
    if first is None:
        return spark.createDataFrame([], "id_a long, id_b long, cos double")
    dim = len(first[0])

    proj = df.select(
        F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("v")
    ).withColumn("__b0", srp_bucket_col(spark, "v", dim, planes, seed))
    bucket_cols = [F.col("__b0")]
    if multiprobe_bits >= 1:
        bucket_cols += [
            F.col("__b0").bitwiseXOR(F.lit(1 << i)) for i in range(planes)
        ]
    exploded = proj.select(
        "id", "v", F.explode(F.array(*bucket_cols)).alias("__b")
    )

    thr = float(threshold)
    tile = int(gemm_tile)

    def bucket_pairs(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("id").to_numpy(zero_copy_only=False)
        arr = tbl.column("v")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = len(ids)
        empty = pa.table(
            {
                "id_a": pa.array([], type=pa.int64()),
                "id_b": pa.array([], type=pa.int64()),
                "cos": pa.array([], type=pa.float64()),
            }
        )
        if n < 2:
            return empty
        M = _normalize(
            arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(n, -1)
        )
        # Hot-bucket guard, part 1: collapse byte-identical vectors.  The
        # target workload (dup-heavy corpora) concentrates exact copies of
        # a few embeddings into one bucket; GEMM cost must be quadratic in
        # DISTINCT vectors, not rows.  10^5 copies of 200 vectors -> 200x200
        # GEMM + arithmetic clique expansion instead of a 10^5 x 10^5 matrix.
        U, first, inv = np.unique(M, axis=0, return_index=True, return_inverse=True)
        g = U.shape[0]
        order = np.argsort(inv, kind="stable")
        sorted_ids = ids[order]
        starts = np.searchsorted(inv[order], np.arange(g))
        ends = np.append(starts[1:], n)
        cnt = ends - starts

        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_c: list[np.ndarray] = []

        def emit_cross(gi: int, gj: int, s: float) -> None:
            A = sorted_ids[starts[gi]:ends[gi]]
            B = sorted_ids[starts[gj]:ends[gj]]
            ia = np.repeat(A, B.size)
            ja = np.tile(B, A.size)
            out_a.append(np.minimum(ia, ja))
            out_b.append(np.maximum(ia, ja))
            out_c.append(np.full(ia.size, round(float(s), 6)))

        # Hot-bucket guard, part 2: tiled GEMM over the distinct vectors —
        # intermediate memory is O(tile^2), never O(g^2), so a bucket of many
        # distinct-but-clustered vectors takes time, not executor memory.
        for i0 in range(0, g, tile):
            Ui = U[i0 : i0 + tile]
            for j0 in range(i0, g, tile):
                S = Ui @ U[j0 : j0 + tile].T
                ii, jj = np.nonzero(S >= thr)
                if ii.size == 0:
                    continue
                gi = ii + i0
                gj = jj + j0
                keep = gi < gj
                gi, gj, sv = gi[keep], gj[keep], S[ii[keep], jj[keep]]
                if gi.size == 0:
                    continue
                single = (cnt[gi] == 1) & (cnt[gj] == 1)
                if single.any():
                    ia = ids[first[gi[single]]]
                    ja = ids[first[gj[single]]]
                    out_a.append(np.minimum(ia, ja))
                    out_b.append(np.maximum(ia, ja))
                    out_c.append(np.round(sv[single], 6))
                for a, b, s in zip(gi[~single], gj[~single], sv[~single]):
                    emit_cross(int(a), int(b), float(s))
        # Diagonal cliques: identical vectors have cosine exactly 1 (matches
        # the old GEMM-then-round(,6) value), so every within-group pair hits.
        if thr <= 1.0:
            for gidx in np.nonzero(cnt > 1)[0]:
                A = np.sort(sorted_ids[starts[gidx]:ends[gidx]])
                iu, ju = np.triu_indices(A.size, 1)
                out_a.append(A[iu])
                out_b.append(A[ju])
                out_c.append(np.full(iu.size, 1.0))
        if not out_a:
            return empty
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a), type=pa.int64()),
                "id_b": pa.array(np.concatenate(out_b), type=pa.int64()),
                "cos": pa.array(np.concatenate(out_c), type=pa.float64()),
            }
        )

    pairs = exploded.groupBy("__b").applyInArrow(
        bucket_pairs, "id_a long, id_b long, cos double"
    )
    # a pair can surface in several (multiprobe) buckets — dedupe; max() makes
    # the value deterministic even if per-bucket GEMM blocking differs in the
    # last bit
    return pairs.groupBy("id_a", "id_b").agg(F.max("cos").alias("cos"))


def near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact_cap: int = 200_000,
    **bucket_kw,
) -> DataFrame:
    """Auto-select: exact broadcast-GEMM under ``exact_cap`` rows (cheap and
    recall-1), SRP-bucketed beyond it (the 100-TB path).  The size probe is
    bounded at exact_cap+1 rows — a full count() of a computed 100-TB frame
    would cost a scan just to pick a path."""
    n = df.limit(exact_cap + 1).count()
    if n <= exact_cap:
        return near_dup_pairs_exact(df, threshold, id_col, vec_col)
    return near_dup_pairs_bucketed(df, threshold, id_col, vec_col, **bucket_kw)


def near_dup_pairs_exact(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ τ: each partition block GEMMs against the
    broadcast full matrix and emits its (i < j) hits.  Exact; the broadcast
    bounds this to corpora whose embeddings fit an executor (~1M × 64 f32 =
    256 MB) — beyond that use near_dup_pairs_bucketed (or the auto-selecting
    near_dup_pairs)."""
    spark = df.sparkSession
    tbl = df.select(
        F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("v")
    ).toArrow()
    ids_all = tbl.column("id").to_numpy()
    M_all = _normalize(
        np.stack([np.asarray(x, dtype=np.float64) for x in tbl.column("v").to_pylist()])
    )
    bc = spark.sparkContext.broadcast((ids_all, M_all))

    proj = df.select(F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("v"))

    def block(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        ids_g, M_g = bc.value
        for b in batches:
            if not b.num_rows:
                continue
            ids = b.column("id").to_numpy(zero_copy_only=False)
            M = _normalize(_batch_matrix(b, "v"))
            sims = M @ M_g.T
            ii, jj = np.nonzero(sims >= threshold)
            ia, ja = ids[ii], ids_g[jj]
            keep = ia < ja
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ia[keep], type=pa.int64()),
                    pa.array(ja[keep], type=pa.int64()),
                    pa.array(np.round(sims[ii, jj][keep].astype(np.float64), 6)),
                ],
                names=["id_a", "id_b", "cos"],
            )

    return proj.mapInArrow(block, "id_a long, id_b long, cos double")
