"""Query surface mirroring SURVEY.md §2's operator inventory, exposed through
the driver contract (__spark_entry__.py): each query is
``(spark, sf_dir) -> DataFrame`` with an ANSI-SQL duckdb oracle.

Sketch queries are made hash-comparable by construction: the DataFrame
carries (a) exact values computed relationally in Spark — which the oracle
recomputes in SQL — and (b) boolean bound-checks the sketch estimate must
satisfy (never-undercount, ≤ εN, ≤ 2%, no-false-negative...), which the
oracle emits as literal TRUE.  Everything is deterministic: fixed data,
fixed hash seeds, event-time as-of from max(ts).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from sketchlib.spark import probe
from sketchlib.spark.agg import SketchJob, build_many, build_sketch
from sketchlib.specs import (
    BloomSpec,
    CBloomSpec,
    CmsSpec,
    CuckooSpec,
    HllSpec,
    KllSpec,
    SbfSpec,
    TdBloomSpec,
    TdCBloomSpec,
    TDigestSpec,
)

QS = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _ts_bounds(events: DataFrame) -> tuple[int, int]:
    r = events.select(
        F.min(F.unix_timestamp("ts")), F.max(F.unix_timestamp("ts"))
    ).first()
    return int(r[0]), int(r[1])


def _ts_at_least(epoch_sec: int):
    """ts >= <epoch literal> as a PUSHABLE predicate: comparing the column
    directly to a constant-folded NTZ literal reaches the parquet scan as a
    PushedFilter (row-group min/max skipping at 100 TB);
    ``unix_timestamp(ts) >= x`` stays a post-scan DataFilter.  Equivalent on
    whole-second timestamps (the transcripts/events data model)."""
    lit = F.lit(__import__("datetime").datetime.utcfromtimestamp(int(epoch_sec)))
    return F.col("ts") >= lit.cast("timestamp_ntz")


# ---------------------------------------------------------------------------
# cardinality (HLL)
# ---------------------------------------------------------------------------

def q_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct user_id (north_star query 1) — HLL m=2^14,
    bound |est−true|/true ≤ 2%."""
    events = _read(spark, sf_dir, "events")
    kernel, _ = build_sketch(events, HllSpec(p=14), key="user_id")
    true = events.select(F.countDistinct("user_id").alias("d")).first()["d"]
    est = kernel.estimate()
    ok = bool(abs(est - true) / true <= 0.02)
    return spark.createDataFrame(
        [Row(sketch="hll_users", true_distinct=int(true), within_2pct=ok)]
    )


def q_hll_sql_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-Catalyst HLL build (spark/hll_sql.py): the register update
    expressed as groupBy(idx).max(rho) in whole-stage codegen — ZERO Python
    in the build path (10M rows/s measured vs ~1.5M for the Arrow-crossing
    kernel path).  Checks the ±2% bound AND byte-identity with the
    prehash-kernel build over the same rows."""
    from sketchlib.spark.hll_sql import build_hll_sql

    events = _read(spark, sf_dir, "events")
    spec = HllSpec(p=14)
    k_sql = build_hll_sql(events, spec, "user_id")
    k_ker, _ = build_sketch(events, spec, key="user_id", prehash=True)
    identical = bool(k_sql.serialize() == k_ker.serialize())
    true = events.select(F.countDistinct("user_id").alias("d")).first()["d"]
    ok = bool(abs(k_sql.estimate() - true) / true <= 0.02)
    return spark.createDataFrame(
        [
            Row(
                sketch="hll_sql_users",
                true_distinct=int(true),
                within_2pct=ok,
                identical_to_kernel_build=identical,
            )
        ]
    )


def q_hll_distinct_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct (user_id, event_type) — the composite-key analog
    of archbloom's (conv_id, tool) cardinality query."""
    events = _read(spark, sf_dir, "events")
    key = F.concat_ws("\x00", F.col("user_id"), F.col("event_type"))
    kernel, _ = build_sketch(events, HllSpec(p=14), key=key)
    true = events.select(
        F.countDistinct("user_id", "event_type").alias("d")
    ).first()["d"]
    est = kernel.estimate()
    ok = bool(abs(est - true) / true <= 0.02)
    return spark.createDataFrame(
        [Row(sketch="hll_user_type", true_distinct=int(true), within_2pct=ok)]
    )


# ---------------------------------------------------------------------------
# membership (bloom / cuckoo) — semi-join carriers
# ---------------------------------------------------------------------------

def q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom probe of purchase-users against all events — at p=1e-6 the probe
    equals the exact left-semi join on this data (verified; bloom never
    false-negatives, expected FP ≈ n·p ≪ 1)."""
    events = _read(spark, sf_dir, "events")
    members = events.filter(F.col("event_type") == "purchase")
    kernel, _ = build_sketch(members, BloomSpec(200_000, 1e-6), key="user_id")
    return (
        events.withColumn("hit", probe.probe_column(spark, kernel, "user_id"))
        .filter("hit")
        .select("user_id")
        .distinct()
        .select("user_id")
    )


def q_prehash_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-prehash fast path through the gate (spark/prehash.py): bloom
    built AND probed from xxhash64 pairs computed in whole-stage codegen —
    the raw key never crosses to Python on either side, the recommended
    configuration at cluster scale.  At p=1e-6 the probe equals the exact
    left-semi join (no false negatives; expected FP ≈ n·p ≪ 1); an HLL
    built prehashed over the same rows must land within ±2% of the exact
    distinct count (the published-bound invariance the mode guarantees)."""
    events = _read(spark, sf_dir, "events")
    members = events.filter(F.col("event_type") == "purchase")
    # bloom + hll in ONE build pass over members (one scan, one Arrow
    # crossing) instead of two build_sketch scans
    built = build_many(
        members,
        [
            SketchJob("bloom", BloomSpec(200_000, 1e-6), key="user_id", prehash=True),
            SketchJob("hll", HllSpec(p=14), key="user_id", prehash=True),
        ],
    )
    kernel, hll = built["bloom"][0], built["hll"][0]
    true_distinct = members.select("user_id").distinct().count()
    hll_ok = abs(hll.estimate() - true_distinct) / true_distinct <= 0.02
    return (
        events.withColumn(
            "hit", probe.probe_column(spark, kernel, "user_id", prehash=True)
        )
        .filter("hit")
        .select("user_id")
        .distinct()
        .withColumn("hll_within_2pct", F.lit(bool(hll_ok)))
    )


def q_bloom_sql_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-Catalyst Bloom (spark/bloom_sql.py): the KM position ladder
    (ANSI-safe wrap-around arithmetic), the bitmap OR and the membership
    check all run inside whole-stage codegen — ZERO Python in build or
    probe, the configuration that closes the N→4N scaling gate (the
    mapInArrow per-stream floor is gone).  At p=1e-6 the probe equals the
    exact semi-join (no false negatives; expected FP ≈ n·p ≪ 1).
    Byte-identity of the SQL-built bitmap vs the prehash kernel build is
    property-tested in tests/test_bloom_sql.py — the gate carries only
    the build+probe dataflow (the r4 double-build cost 2x the query).
    Remaining wall at sf0.1 is plan analysis + codegen compile of the
    two k=20 position ladders (measured linear in k, invariant to input
    rows) — a per-query constant that amortizes to zero at scale."""
    from sketchlib.spark.bloom_sql import bloom_sql_members, bloom_word_rows

    events = _read(spark, sf_dir, "events")
    members = events.filter(F.col("event_type") == "purchase")
    spec = BloomSpec(200_000, 1e-6)
    # low-cardinality key: dedupe the hash pair before the explode×k
    words = bloom_word_rows(members, spec, "user_id", prereduce=True)
    return (
        bloom_sql_members(words, events, spec, "user_id")
        .filter("member")
        .select("user_id")
    )


def q_cbloom_sql_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-Catalyst counting-Bloom (spark/bloom_sql.py): counters as
    ``groupBy(pos).least(count, cap)``, min-of-k point counts as a
    broadcast join — zero Python in either path.  One-sided error checked
    per key (never undercounts); ONE byte-identity flag (cbloom SQL build
    vs the prehash kernel build) stays in-gate; tdbloom/tdcbloom identity
    is property-tested in tests/test_bloom_sql.py (the r4 sextuple-build
    was the suite's most expensive gate)."""
    from sketchlib.spark.bloom_sql import (
        cbloom_cell_rows,
        cbloom_from_cells,
        cbloom_sql_counts,
    )

    events = _read(spark, sf_dir, "events")
    cspec = CBloomSpec(50_000, 0.001)
    # key-level pre-reduction: user_id is ~1.5k distinct over 3M events, so
    # the explode×k runs over distinct keys; one cell build serves the
    # probe AND the identity flag (cbloom_from_cells is a state-sized
    # collect, not a second pass — prereduce identity is property-tested)
    cells = cbloom_cell_rows(events, cspec, "user_id", prereduce=True).cache()
    # exact carries the distinct keys too: the probe side reads them from
    # this cached frame instead of re-scanning + re-distincting events
    exact = (
        events.groupBy("user_id")
        .count()
        .withColumnRenamed("count", "cnt_exact")
        .cache()
    )
    est = cbloom_sql_counts(cells, exact, cspec, "user_id")
    # prehash-kernel reference build WITHOUT a second scan: the per-key
    # exact counts above are the sufficient statistic for a +1-add cbloom
    # (per-cell result is min(total_adds, cap) in any order), so feed the
    # kernel's own update_hashes the JVM-computed xxhash64 lanes repeated
    # per count — the same hash family and scatter code path the
    # distributed prehash build runs, minus the partial/merge machinery
    # (which tests/test_spark_agg.py covers).  Collect is key-cardinality-
    # sized (the same bound as the cell state), never event-sized.
    from sketchlib import mmh3
    from sketchlib.kernels import CountingBloomFilter
    from sketchlib.spark.prehash import prehash_pair

    h1, h2 = prehash_pair(F.col("user_id"))
    lanes = exact.select(
        h1.alias("h1"), h2.alias("h2"), "cnt_exact"
    ).collect()
    reps = np.array([r["cnt_exact"] for r in lanes], dtype=np.int64)
    ckern = CountingBloomFilter(cspec)
    if lanes:
        ckern.update_hashes(
            np.repeat(mmh3.as_u64(np.array([r["h1"] for r in lanes], dtype=np.int64)), reps),
            np.repeat(mmh3.as_u64(np.array([r["h2"] for r in lanes], dtype=np.int64)), reps),
        )
    c_ident = cbloom_from_cells(cells, cspec).serialize() == ckern.serialize()
    out = (
        exact.join(est, "user_id")
        .select(
            "user_id",
            "cnt_exact",
            (F.col("cnt") >= F.col("cnt_exact")).alias("never_undercounts"),
            F.lit(bool(c_ident)).alias("cbloom_byte_identical"),
        )
        .localCheckpoint(eager=True)  # key-count-sized; frees both caches
    )
    cells.unpersist()
    exact.unpersist()
    return out


def q_bloom_probe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe-via-JOIN for sketches too big to broadcast (the 100-TB probe
    path): the Bloom state is built as key-routed shards and probed by
    cogrouping probe rows with their shard's state — the merged filter is
    never broadcast and never touches the driver.  At p=1e-9 the probe
    equals the exact semi-join (no false negatives; expected FP ≈ n·p ≪ 1).
    The routed_not_broadcast flag is asserted from the PHYSICAL PLAN:
    FlatMapCoGroupsInArrow present, BroadcastExchange absent."""
    from sketchlib.spark.probe_join import build_sharded_states, probe_sharded

    events = _read(spark, sf_dir, "events")
    members = events.filter(F.col("event_type") == "purchase")
    spec = BloomSpec(100_000, 1e-9)  # per-shard geometry
    states = build_sharded_states(members, "user_id", spec, n_shards=8)
    probed = probe_sharded(
        states, events.select("user_id").distinct(), "user_id", spec=spec,
        n_shards=8,
    )
    plan = probed._jdf.queryExecution().executedPlan().toString()
    routed = ("FlatMapCoGroupsInArrow" in plan) and ("BroadcastExchange" not in plan)
    return (
        probed.filter("hit")
        .select("user_id")
        .withColumn("routed_not_broadcast", F.lit(bool(routed)))
    )


def q_archbloom_file_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native archbloom ``!bloomf!`` file interop (src/bloom.c:525-628,
    sketchlib/formats.py): build a Bloom over purchase users, export it to
    the C on-disk format, re-import, and probe — the file-round-tripped
    filter must answer exactly like the in-memory one (byte-identical
    bitmap; geometry chosen with m % 8 == 0 so the C truncated-bitmap size
    is lossless), which at p=1e-6 equals the exact semi-join.  Also
    round-trips a cuckoo filter through the reference's raw-struct layout
    (src/cuckoo.c:205-301, formats.CuckooNativeFile): export → import must
    preserve the fingerprint table, counters and every lookup."""
    import os
    import tempfile

    from sketchlib.formats import (
        CuckooNativeFile,
        bloom_export,
        bloom_import,
        cuckoo_native_export,
        cuckoo_native_import,
    )

    events = _read(spark, sf_dir, "events")
    members = events.filter(F.col("event_type") == "purchase")
    # expected=200_013 → m = 5_751_408 bits (divisible by 8): C bitmap size
    # is exact, export/import is lossless.  accuracy pre-rounded through C
    # float, as the file header stores it, so the re-imported spec is equal.
    spec = BloomSpec(200_013, float(np.float32(1e-6)))
    kernel, _ = build_sketch(members, spec, key="user_id")
    fd, path = tempfile.mkstemp(suffix=".bloomf")
    os.close(fd)
    try:
        bloom_export(kernel, path)
        back = bloom_import(path)
        identical = bool(np.array_equal(back.bits, kernel.bits)) and (
            back.spec == kernel.spec
        )
    finally:
        os.unlink(path)
    # cuckoo native-layout round-trip over a BOUNDED sample of member keys:
    # the native-layout round-trip property is size-independent, and an
    # unbounded distinct().collect() here was the one data-sized driver
    # materialization left in the gate surface (r5 verdict #1)
    ck = CuckooNativeFile.create(4096, 4, 500)
    member_keys = [
        str(r["user_id"])
        for r in members.select("user_id").distinct().limit(10_000).collect()
    ]
    ck.add_strings(member_keys)
    fd, cpath = tempfile.mkstemp(suffix=".cuckoo")
    os.close(fd)
    try:
        cuckoo_native_export(ck, cpath)
        ck2 = cuckoo_native_import(cpath)
        ck_ok = (
            bool(np.array_equal(ck2.fingerprints, ck.fingerprints))
            and bool(np.array_equal(ck2.bucket_insertions, ck.bucket_insertions))
            and ck2.total_insertions == ck.total_insertions
            and bool(ck2.contains_strings(member_keys).all())
        )
    finally:
        os.unlink(cpath)
    return (
        events.withColumn("hit", probe.probe_column(spark, back, "user_id"))
        .filter("hit")
        .select("user_id")
        .distinct()
        .withColumn("file_roundtrip_identical", F.lit(identical))
        .withColumn("cuckoo_native_roundtrip", F.lit(bool(ck_ok)))
    )


def q_cuckoo_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cuckoo membership with deletions, DISTRIBUTED: insert even doc_ids,
    remove the ones divisible by 10, probe all — retained members are found
    exactly (no false negatives), removed/odd ones bounded by the published
    FPR.  Build is key-partitioned shards (groupBy shard → per-shard kernel),
    probe a routed broadcast UDF — no corpus collect anywhere (the round-1
    version built the filter on the driver)."""
    from sketchlib.spark.cuckoo_dist import build_sharded_cuckoo, cuckoo_probe_column

    docs = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("id")
    )
    is_member = (F.col("id") % 2 == 0) & (F.col("id") % 10 != 0)
    is_removed = (F.col("id") % 2 == 0) & (F.col("id") % 10 == 0)
    # insert members+removed, then remove the removed — one sharded pass,
    # ops applied adds-first per shard
    ops = (
        docs.filter(is_member | is_removed)
        .select("id", F.lit(1).alias("op"))
        .unionByName(docs.filter(is_removed).select("id", F.lit(-1).alias("op")))
    )
    n_shards = 8
    n_total = docs.count()
    spec = CuckooSpec(max(1024, n_total // n_shards + 64), bucket_size=4, seed=1)
    sharded = build_sharded_cuckoo(ops, "id", spec, n_shards=n_shards, op="op")

    agg = (
        docs.withColumn("hit", cuckoo_probe_column(spark, sharded, "id"))
        .agg(
            F.sum(F.when(is_member & F.col("hit"), 1).otherwise(0)).alias("found"),
            F.sum(F.when(is_member, 1).otherwise(0)).alias("true_members"),
            F.sum(F.when(~is_member & F.col("hit"), 1).otherwise(0)).alias("fp"),
            F.sum(F.when(~is_member, 1).otherwise(0)).alias("nonmem"),
        )
        .first()
    )
    fpr_ok = bool(int(agg["fp"]) / max(int(agg["nonmem"]), 1) <= 0.01)
    return spark.createDataFrame(
        [
            Row(
                sketch="cuckoo_docs",
                n_members_found=int(agg["found"]),
                n_members_true=int(agg["true_members"]),
                fpr_within_bound=fpr_ok,
            )
        ]
    )


# ---------------------------------------------------------------------------
# frequency (CMS / counting bloom)
# ---------------------------------------------------------------------------

def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter event types: exact counts (the relational carrier) +
    CMS one-sided bound checks per key."""
    events = _read(spark, sf_dir, "events")
    spec = CmsSpec(epsilon=0.0005, delta=0.01)
    kernel, total = build_sketch(events, spec, key="event_type")
    exact = events.groupBy("event_type").count().withColumnRenamed("count", "cnt")
    rows = exact.collect()
    keys = [str(r["event_type"]) for r in rows]
    est = kernel.estimate_strings(keys)
    eps_n = np.e / spec.width * total
    out = [
        Row(
            event_type=k,
            cnt=int(r["cnt"]),
            never_undercounts=bool(e >= r["cnt"]),
            overcount_within_epsN=bool(e - r["cnt"] <= eps_n),
        )
        for k, r, e in zip(keys, rows, est)
    ]
    return spark.createDataFrame(out)


def q_cms_sql_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-Catalyst CMS (spark/cms_sql.py): build = groupBy(i,pos).count
    over an explode×d (≤ d·w state rows), probe = broadcast-join of the
    probe keys' cells against that frame — zero Python in either path
    (plan-asserted in tests).  Same one-sided Cormode–Muthukrishnan checks
    as cms_heavy_hitters, evaluated declaratively."""
    from sketchlib.spark.cms_sql import cms_cell_rows, cms_sql_estimates

    events = _read(spark, sf_dir, "events")
    spec = CmsSpec(epsilon=0.0005, delta=0.01)
    cells = cms_cell_rows(events, spec, "event_type")
    est = cms_sql_estimates(cells, events, spec, "event_type")
    n = events.count()
    eps_n = float(np.e / spec.width * n)
    exact = events.groupBy("event_type").count().withColumnRenamed("count", "cnt")
    return (
        exact.join(est, "event_type")
        .select(
            "event_type",
            "cnt",
            (F.col("est") >= F.col("cnt")).alias("never_undercounts"),
            ((F.col("est") - F.col("cnt")) <= eps_n).alias("overcount_within_epsN"),
        )
    )


def q_bottomk_distinct_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k (KMV) sketch: a DETERMINISTIC uniform sample over distinct
    user_ids + a cardinality estimate, one tiny mergeable state (byte-
    identical merges).  Carriers: exact distinct count and the exact sample
    size min(k, distinct); bounds: every sampled key really occurs (checked
    distributed via left-semi join), estimate within 4/sqrt(k-2)."""
    from sketchlib.specs import BottomKSpec

    events = _read(spark, sf_dir, "events")
    spec = BottomKSpec(k=256)
    kernel, _ = build_sketch(events, spec, key="user_id")
    true_d = int(events.select(F.countDistinct("user_id").alias("d")).first()["d"])
    sample = [s.decode() for s in kernel.sample()]
    sample_df = spark.createDataFrame([(s,) for s in sample], "user_id string")
    valid = (
        sample_df.join(
            events.select(F.col("user_id").cast("string")).distinct(),
            "user_id",
            "left_semi",
        ).count()
        == len(sample)
    )
    est = kernel.distinct_estimate()
    if true_d < spec.k:
        est_ok = est == float(true_d)
    else:
        est_ok = abs(est - true_d) / true_d <= 4.0 / np.sqrt(spec.k - 2)
    return spark.createDataFrame(
        [
            Row(
                true_distinct=true_d,
                sample_size=len(sample),
                sample_all_valid=bool(valid),
                est_within_bound=bool(est_ok),
            )
        ]
    )


def q_mg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra–Gries heavy hitters over events — the one-sided complement of
    CMS (never overcounts; undercount ≤ N/(k+1); every key above the
    threshold guaranteed present, WITH its key — no candidate set needed)."""
    from sketchlib.specs import MGSpec

    events = _read(spark, sf_dir, "events")
    spec = MGSpec(k=64)
    kernel, total = build_sketch(events, spec, key="event_type")
    exact = events.groupBy("event_type").count().withColumnRenamed("count", "cnt")
    rows = exact.collect()
    keys = [str(r["event_type"]) for r in rows]
    est = kernel.estimate_strings(keys)
    bound = total // (spec.k + 1) + 1
    present = {k_ for k_, _ in kernel.heavy_hitters()}
    out = [
        Row(
            event_type=k_,
            cnt=int(r["cnt"]),
            never_overcounts=bool(e <= r["cnt"]),
            undercount_within_bound=bool(r["cnt"] - e <= bound),
            guaranteed_present=bool(
                k_.encode() in present if r["cnt"] > bound else True
            ),
        )
        for k_, r, e in zip(keys, rows, est)
    ]
    return spark.createDataFrame(out)


def q_cbloom_point_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counting-bloom min-count per lineitem returnflag — exact group counts
    + the reference's one-sided guarantee (cbloom_count semantics,
    src/cbloom.c:257-274)."""
    li = _read(spark, sf_dir, "lineitem")
    # expected sizes the counter ARRAY for distinct keys (3 returnflags here),
    # not total adds — r2 shipped 300k/11.5 MB partials for a 3-key carrier
    # (BENCH_r02 8.5 s).  32-bit counters stay: per-key counts exceed 65k at
    # sf>=0.1 and cbloom adds saturate, which would break never-undercounts.
    spec = CBloomSpec(10_000, 0.001, counter_bits=32)
    kernel, _ = build_sketch(li, spec, key="l_returnflag")
    exact = li.groupBy("l_returnflag").count().withColumnRenamed("count", "cnt")
    rows = exact.collect()
    keys = [str(r["l_returnflag"]) for r in rows]
    est = kernel.count_strings(keys)
    out = [
        Row(l_returnflag=k, cnt=int(r["cnt"]), never_undercounts=bool(e >= r["cnt"]))
        for k, r, e in zip(keys, rows, est)
    ]
    return spark.createDataFrame(out)


def q_sbf_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral Bloom filter point counts per event type — the reference's
    declared-only roadmap structure (README.md:93-104), per Cohen–Matias
    SIGMOD'03 (kernels/sbf.py).  Built in ONE pass alongside a plain
    counting bloom of identical geometry/seed to certify, per key: the MS
    estimate never undercounts, the MI update is never looser than the basic
    counting-bloom update (conservative-update dominance, preserved cell-wise
    by the saturating-add merge), and the recurring-minimum refinement only
    ever shaves the MS estimate."""
    events = _read(spark, sf_dir, "events")
    # expected sizes the counter array for DISTINCT keys (a handful of event
    # types), not total adds — the r2 state-per-partial lesson; 32-bit
    # counters because per-type counts pass 65k at sf>=0.1 and saturation
    # would break never-undercounts.
    sbf_spec = SbfSpec(10_000, 0.001, counter_bits=32)
    cbf_spec = CBloomSpec(10_000, 0.001, counter_bits=32)
    res = build_many(
        events,
        [
            SketchJob("sbf", sbf_spec, key="event_type"),
            SketchJob("cbf", cbf_spec, key="event_type"),
        ],
    )
    sbf, cbf = res["sbf"][0], res["cbf"][0]
    rows = events.groupBy("event_type").count().collect()  # ≤10 exact groups
    keys = [str(r["event_type"]) for r in rows]
    ms = sbf.estimate_strings(keys)
    rm = sbf.estimate_rm_strings(keys)
    cb = cbf.count_strings(keys)
    out = [
        Row(
            event_type=k,
            cnt=int(r["count"]),
            never_undercounts=bool(e >= r["count"]),
            mi_not_looser=bool(e <= c),
            rm_not_looser=bool(g <= e),
        )
        for k, r, e, g, c in zip(keys, rows, ms, rm, cb)
    ]
    return spark.createDataFrame(out)


# ---------------------------------------------------------------------------
# time decay (tdbloom / tdcbloom)
# ---------------------------------------------------------------------------

def q_tdbloom_recent_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency membership as-of max(ts): every exactly-recent user must be
    flagged by the time-decaying bloom (no false negatives)."""
    events = _read(spark, sf_dir, "events")
    t0, t1 = _ts_bounds(events)
    window = max((t1 - t0) // 3, 1)
    # sized for distinct user_ids (~1.5k at sf0.1), not total events — the
    # same state-per-partial trap as the r2 cbloom carrier (a 200k spec is a
    # 2.9M-cell uint32 array = 11.5 MB per partial for a 1.5k-key corpus)
    spec = TdBloomSpec(20_000, 0.001, timeout=window, start_time=t0)
    kernel, _ = build_sketch(events, spec, key="user_id", ts="ts")
    recent = events.filter(_ts_at_least(t1 - window)).select("user_id").distinct()
    # broadcast-probe over the DataFrame — never collect the key list to the
    # driver (round-1 scale-killer: millions of user_ids at 100x)
    return recent.select(
        "user_id",
        probe.probe_column(spark, kernel, "user_id", as_of=t1).alias("td_hit"),
    )


def q_tdcbloom_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'How many events did user U have, counting only users active in the
    last W seconds' — tdcbloom count vs the exact windowed GROUP BY.
    Also certifies the DECLARATIVE probe (bloom_sql.tdcbloom_sql_counts —
    broadcast-join min-of-k gated on tick freshness, zero Python in the
    plan): per key it must equal the prehash kernel's count_hashes over
    the same SQL-built cell state (sql_matches_kernel)."""
    from sketchlib.spark.bloom_sql import (
        _tick_col,
        tdcbloom_cells_from_lanes,
        tdcbloom_from_cells,
        tdcbloom_sql_counts,
    )
    from sketchlib.spark.prehash import prehash_pair

    events = _read(spark, sf_dir, "events")
    t0, t1 = _ts_bounds(events)
    window = max((t1 - t0) // 3, 1)
    # sized for distinct user_ids (~1.5k at sf0.1), not total events — the r2
    # 200k spec moved two 2.9M-cell arrays per partial (BENCH_r02 4.4 s)
    spec = TdCBloomSpec(
        20_000, 0.001, timeout=window, counter_bits=32, start_time=t0
    )
    kernel, _ = build_sketch(events, spec, key="user_id", ts="ts")
    # ONE groupBy pass carries every per-key statistic the gate needs:
    # the exact windowed count (the output carrier), and the tdcbloom
    # per-key sufficient statistic (add count + max tick) that feeds the
    # declarative cell build — so cells cost no extra pass over events,
    # and the probe key set reads from this cached key-sized frame
    h1, h2 = prehash_pair(F.col("user_id"))
    per_user = (
        events.groupBy("user_id")
        .agg(
            F.sum(_ts_at_least(t1 - window).cast("long")).alias("recent_cnt"),
            F.count(F.lit(1)).alias("__w"),
            F.max(_tick_col(spec, "ts")).alias("__t"),
        )
        .cache()
    )
    # declarative probe vs prehash kernel probe over the same state (the
    # prehash family — bloom_sql's hash lanes; the mmh3 kernel above stays
    # the reference-parity carrier).  One cell build serves both sides:
    # the kernel is materialized from the cell frame (state-sized), and
    # cells==prehash-build byte-identity is property-tested in
    # tests/test_bloom_sql.py.
    lanes = per_user.select(
        h1.alias("__h1"), h2.alias("__h2"), F.col("__t"), F.col("__w")
    )
    cells = tdcbloom_cells_from_lanes(lanes, spec).cache()
    sql_cnt = tdcbloom_sql_counts(
        cells, spec, per_user, "user_id", as_of=t1, result_col="sql_cnt"
    )
    kern_ph = tdcbloom_from_cells(cells, spec)
    kc = probe.count_hashes_column(
        spark, kern_ph, F.col("user_id").cast("string"), as_of=t1
    )
    sql_matches = bool(
        sql_cnt.withColumn("kc", kc)
        .select(F.bool_and(F.col("sql_cnt") == F.col("kc")).alias("ok"))
        .first()["ok"]
    )
    cells.unpersist()  # both consumers (sql_cnt, kern_ph) are materialized
    # distributed windowed-count probe (count_asof_udf), never a driver loop
    est = probe.count_asof_udf(spark, kernel, t1)(
        F.col("user_id").cast("string")
    )
    out = (
        per_user.filter(F.col("recent_cnt") > 0)
        .select(
            "user_id",
            "recent_cnt",
            (est >= F.col("recent_cnt")).alias("est_at_least_recent"),
            F.lit(sql_matches).alias("sql_matches_kernel"),
        )
        .localCheckpoint(eager=True)  # key-count-sized; frees the cache
    )
    per_user.unpersist()
    return out


def q_tdbloom_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tdbloom lifecycle-op family through the gate (previously
    pytest-only): last_access_time / was_active_within probed DISTRIBUTED
    over every user, plus the filter-wide maintenance ops
    (clear_expired, get_average_lifetime, adjust_timeout, lookup_or_add,
    reset_if_expired, age_element) checked on copies via their guaranteed
    invariants.  Exact carrier: distinct/recent user counts.

    Invariants used (all one-sided guarantees, deterministic):
    - last_access est = min over k cells ≥ the user's true last stamp and
      ≤ max(ts) (collisions only raise a cell — kernels/tdbloom.py:107).
    - truly-recent user ⇒ was_active_within(window) (no false negatives).
    - after clear_expired(T): count_expired(T) == 0; likewise after
      adjust_timeout (reaps under the NEW policy, src/tdcbloom.c:303-320).
    - average lifetime of live cells ∈ [0, timeout].
    - lookup_or_add of an absent key: returns False, then present as-of T.
    - all-expired key: has_expired true; reset_if_expired re-stamps it.
    - age_element returns True for a fully-present key."""
    import copy

    events = _read(spark, sf_dir, "events")
    t0, t1 = _ts_bounds(events)
    window = max((t1 - t0) // 3, 1)
    spec = TdBloomSpec(20_000, 0.001, timeout=window, start_time=t0)
    kernel, _ = build_sketch(events, spec, key="user_id", ts="ts")

    per_user = events.groupBy("user_id").agg(
        F.max(F.unix_timestamp("ts")).alias("last_seen")
    )
    est = probe.method_udf(spark, kernel, "last_access_time", "long")(
        F.col("user_id").cast("string")
    )
    act = probe.method_udf(
        spark, kernel, "was_active_within", "boolean", extra=(t1 - window, t1)
    )(F.col("user_id").cast("string"))
    checked = per_user.select(
        "user_id",
        "last_seen",
        ((est >= F.col("last_seen")) & (est <= F.lit(t1))).alias("__bounds"),
        ((F.col("last_seen") < F.lit(t1 - window)) | act).alias("__active"),
    )
    agg = checked.agg(
        F.count("*").alias("n_users"),
        F.sum((F.col("last_seen") >= F.lit(t1 - window)).cast("long")).alias(
            "n_recent"
        ),
        F.bool_and("__bounds").alias("last_access_bounds_ok"),
        F.bool_and("__active").alias("recent_implies_active"),
    ).first()

    probe_key = str(per_user.select("user_id").first()[0])
    k2 = copy.deepcopy(kernel)
    k2.clear_expired(t1)
    clear_ok = k2.count_expired(t1) == 0
    avg = kernel.get_average_lifetime(t1)
    avg_ok = 0.0 <= avg <= window
    k3 = copy.deepcopy(kernel)
    k3.adjust_timeout(max(window // 2, 1), as_of=t1)
    adjust_ok = k3.count_expired(t1) == 0
    k4 = copy.deepcopy(kernel)
    was = bool(k4.lookup_or_add_strings(["__never_seen__"], as_of=t1)[0])
    loa_ok = (not was) and bool(k4.contains_strings(["__never_seen__"], as_of=t1)[0])
    from sketchlib import mmh3

    k5 = copy.deepcopy(kernel)
    far = t1 + 2 * window + 1  # everything stale as-of here
    exp_ok = bool(k5.has_expired(*mmh3.pack_strings([probe_key]), as_of=far)[0])
    reset_ok = bool(k5.reset_if_expired_strings([probe_key], as_of=far)[0]) and bool(
        k5.contains_strings([probe_key], as_of=far)[0]
    )
    k6 = copy.deepcopy(kernel)
    age_ok = bool(k6.age_element_strings([probe_key], age_amount=1)[0])
    # saturation_count (src/tdbloom.h:117, declared-only TODO in C): the
    # live-cell count must be the exact integer behind the % variant
    sc = kernel.saturation_count(t1)
    sc_ok = sc > 0 and abs(kernel.saturation(t1) - 100.0 * sc / kernel.m) < 1e-9
    return spark.createDataFrame(
        [
            Row(
                n_users=int(agg["n_users"]),
                n_recent=int(agg["n_recent"]),
                last_access_bounds_ok=bool(agg["last_access_bounds_ok"]),
                recent_implies_active=bool(agg["recent_implies_active"]),
                clear_expired_empties=bool(clear_ok),
                avg_lifetime_in_window=bool(avg_ok),
                adjust_timeout_reaps=bool(adjust_ok),
                lookup_or_add_stamps=bool(loa_ok),
                expired_then_reset=bool(exp_ok and reset_ok),
                age_element_present=bool(age_ok),
                saturation_count_consistent=bool(sc_ok),
            )
        ]
    )


def q_cbloom_maintenance_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The counting-bloom maintenance family through the gate (previously
    pytest-only): remove / decay_linear / decay_exponential /
    clear_if_count_above / count_elements_above_threshold /
    get_average_count / lookup_or_add, each checked by its guaranteed
    invariant against the exact per-key counts.

    Invariants (deterministic, collision-one-sided):
    - avg nonzero-cell count == N·k / saturation_count EXACTLY (every add
      increments exactly k cells; no saturation at 32-bit;
      get_average_count averages nonzero cells, src/cbloom.c:337-354).
    - a key with exact count > T has all k cells > T ⇒
      count_elements_above_threshold(T) (= cells-above // k,
      src/cbloom.c:310-321) ≥ the number of exact keys above T.
    - after one remove: exact−1 ≤ count(key) ≤ count_before.
    - after decay_linear(d): count(key) ≥ exact−d; after
      decay_exponential(0.5): count(key) ≥ ⌊exact/2⌋ (trunc is monotone).
    - clear_if_count_above(key, exact−1) zeroes every cell of that key.
    - lookup_or_add of an absent key: False, then count ≥ 1."""
    import copy

    li = _read(spark, sf_dir, "lineitem")
    spec = CBloomSpec(10_000, 0.001, counter_bits=32)
    kernel, _ = build_sketch(li, spec, key="l_returnflag")
    exact_rows = li.groupBy("l_returnflag").count().collect()  # 3 keys
    exact = {str(r[0]): int(r[1]) for r in exact_rows}
    flags = sorted(exact)
    counts0 = dict(zip(flags, kernel.count_strings(flags).tolist()))
    n_rows = sum(exact.values())

    avg_ok = (
        abs(kernel.get_average_count() - n_rows * spec.k / kernel.saturation_count())
        < 1e-9
    )
    t_mid = sorted(exact.values())[len(exact) // 2] - 1  # at least one key above
    n_above = sum(1 for c in exact.values() if c > t_mid)
    thresh_ok = kernel.count_elements_above_threshold(t_mid) >= n_above

    f0 = flags[0]
    k2 = copy.deepcopy(kernel)
    k2.remove_strings([f0])
    c_after = int(k2.count_strings([f0])[0])
    remove_ok = exact[f0] - 1 <= c_after <= counts0[f0]

    d = max(min(exact.values()) // 2, 1)
    k3 = copy.deepcopy(kernel)
    k3.decay_linear(d)
    lin_ok = all(
        int(c) >= exact[f] - d for f, c in zip(flags, k3.count_strings(flags))
    )
    k4 = copy.deepcopy(kernel)
    k4.decay_exponential(0.5)
    exp_ok = all(
        int(c) >= exact[f] // 2 for f, c in zip(flags, k4.count_strings(flags))
    )

    fmax = max(exact, key=exact.get)
    k5 = copy.deepcopy(kernel)
    k5.clear_if_count_above_strings([fmax], exact[fmax] - 1)
    clear_ok = int(k5.count_strings([fmax])[0]) == 0

    k6 = copy.deepcopy(kernel)
    was = bool(k6.lookup_or_add_strings(["__absent__"])[0])
    loa_ok = (not was) and int(k6.count_strings(["__absent__"])[0]) >= 1

    return spark.createDataFrame(
        [
            Row(
                n_rows=int(n_rows),
                n_flags=len(flags),
                avg_count_exact=bool(avg_ok),
                threshold_count_ge_k=bool(thresh_ok),
                remove_one_sided=bool(remove_ok),
                decay_linear_bounded=bool(lin_ok),
                decay_exponential_bounded=bool(exp_ok),
                clear_above_zeroes=bool(clear_ok),
                lookup_or_add_inserts=bool(loa_ok),
            )
        ]
    )


# ---------------------------------------------------------------------------
# quantiles (KLL / t-digest)
# ---------------------------------------------------------------------------

def _quantile_query(spark, sf_dir, make_kernel, tol: float, sketch_name: str):
    li = _read(spark, sf_dir, "lineitem")
    kernel, _ = build_sketch(li, make_kernel, values="l_extendedprice")
    # rank brackets Spark-side in ONE aggregation pass: count(v < est) /
    # count(v <= est) per estimate reproduce searchsorted's left/right
    # ranks exactly — no data-sized toArrow + driver sort (100x-unsafe)
    ests = [float(kernel.quantile(q)) for q in QS]
    v = F.col("l_extendedprice")
    aggs = [F.count(v).alias("n")]
    for j, e in enumerate(ests):
        aggs.append(F.sum((v < F.lit(e)).cast("long")).alias(f"lt{j}"))
        aggs.append(F.sum((v <= F.lit(e)).cast("long")).alias(f"le{j}"))
    r = li.agg(*aggs).first()
    n = int(r["n"])
    out = []
    for j, q in enumerate(QS):
        lo, hi = int(r[f"lt{j}"]) / n, int(r[f"le{j}"]) / n
        err = 0.0 if lo <= q <= hi else min(abs(q - lo), abs(q - hi))
        out.append(Row(sketch=sketch_name, q=float(q), rank_err_within_bound=bool(err <= tol)))
    return spark.createDataFrame(out).select("sketch", "q", "rank_err_within_bound")


def q_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL k=200 rank error ≤ 3% on l_extendedprice (Karnin–Lang–Liberty
    bound ≈1.65% @99% for k=200; 3% is the always-bound used in tests)."""
    return _quantile_query(spark, sf_dir, KllSpec(k=200), 0.03, "kll_extendedprice")


def q_tdigest_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-digest δ=200 rank error ≤ 2% mid-range on l_extendedprice."""
    return _quantile_query(
        spark, sf_dir, TDigestSpec(compression=200), 0.02, "tdigest_extendedprice"
    )


def q_kll_sql_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles as plain Spark SQL (spark/sql_udaf.py): per-ship-month KLL
    states built by the registered GROUPED_AGG UDAF over l_extendedprice,
    read with the registered p50/p95 quantile UDFs, then RE-aggregated
    with kll_merge into one total state — all inside spark.sql.  Bound:
    every per-month quantile and the merged total within KLL k=200's 3%
    rank-error budget of the exact ranks (merge preserves the bound —
    Karnin–Lang–Liberty)."""
    from sketchlib.spark.sql_udaf import register_sql_udafs

    register_sql_udafs(spark, KllSpec(k=200), "sk_kll", quantiles=(0.5, 0.95))
    li = _read(spark, sf_dir, "lineitem")
    li.select(
        F.date_trunc("month", "l_shipdate").cast("date").alias("month"),
        F.col("l_extendedprice").cast("double").alias("price"),
    ).createOrReplaceTempView("kll_lineitem")
    months = spark.sql(
        """
        SELECT month, sk_kll_p50(state) AS p50, sk_kll_p95(state) AS p95,
               state
        FROM (SELECT month, sk_kll_state(price) AS state
              FROM kll_lineitem GROUP BY month)
        """
    ).cache()
    months.createOrReplaceTempView("kll_month_states")
    tot = spark.sql(
        """
        SELECT sk_kll_p50(sk_kll_merge(state)) AS p50,
               sk_kll_p95(sk_kll_merge(state)) AS p95
        FROM kll_month_states
        """
    ).first()
    tot_p50, tot_p95 = float(tot["p50"]), float(tot["p95"])

    # rank verification SPARK-SIDE in one pass: broadcast-join the 83x3
    # estimate frame back onto the prices and count (price < est) /
    # (price <= est) per month — the exact-rank bracket [lo, hi] without
    # pulling a data-sized column to the driver (the r4 gate toPandas'd
    # every price: ~600k rows at sf0.1, a non-starter at 100x)
    def _cnt(cond) -> F.Column:
        return F.sum(cond.cast("long"))

    p = F.col("price")
    # ONE rank-bracket pass, ONE collect: the 83-row count frame is small
    # enough to finish the per-month checks, the merged-total sums and the
    # output rows driver-side in a single job (the r5 shape ran three
    # separate aggregations over a cached copy of this frame)
    per_rows = (
        spark.table("kll_lineitem")
        .join(F.broadcast(months.select("month", "p50", "p95")), "month")
        .groupBy("month")
        .agg(
            F.count("price").alias("n"),
            _cnt(p < F.col("p50")).alias("lt50"),
            _cnt(p <= F.col("p50")).alias("le50"),
            _cnt(p < F.col("p95")).alias("lt95"),
            _cnt(p <= F.col("p95")).alias("le95"),
            _cnt(p < F.lit(tot_p50)).alias("lt50t"),
            _cnt(p <= F.lit(tot_p50)).alias("le50t"),
            _cnt(p < F.lit(tot_p95)).alias("lt95t"),
            _cnt(p <= F.lit(tot_p95)).alias("le95t"),
        )
        .collect()
    )
    months.unpersist()

    def _ok_scalar(lt: int, le: int, n: int, q: float, tol: float = 0.03) -> bool:
        lo, hi = lt / n, le / n
        return lo <= q <= hi or min(abs(q - lo), abs(q - hi)) <= tol

    monthly_ok = all(
        _ok_scalar(r["lt50"], r["le50"], r["n"], 0.5)
        and _ok_scalar(r["lt95"], r["le95"], r["n"], 0.95)
        for r in per_rows
    )
    # merged-total bracket: the per-month counts vs the TOTAL estimates sum
    # to the global exact ranks (counts are additive across the partition)
    n_tot = sum(r["n"] for r in per_rows)
    tot_ok = _ok_scalar(
        sum(r["lt50t"] for r in per_rows), sum(r["le50t"] for r in per_rows),
        n_tot, 0.5,
    ) and _ok_scalar(
        sum(r["lt95t"] for r in per_rows), sum(r["le95t"] for r in per_rows),
        n_tot, 0.95,
    )
    out_rows = [
        Row(
            month=r["month"],
            n=int(r["n"]),
            monthly_within_rank_bound=bool(monthly_ok),
            merged_within_rank_bound=bool(tot_ok),
        )
        for r in per_rows
    ]
    return spark.createDataFrame(out_rows)


# ---------------------------------------------------------------------------
# set algebra (bloom merge / intersect / jaccard — bloomtool §2.8)
# ---------------------------------------------------------------------------

def q_bloom_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bloomtool merge/intersect/intersection analogs over two user sets
    (click-users vs purchase-users): exact counts are the carrier; the bloom
    union must contain every member of both sets, and the bloom Jaccard
    estimate must land within ±10pp of the true Jaccard."""
    events = _read(spark, sf_dir, "events")
    # ONE key-sized membership-flag frame replaces four separate
    # filter+distinct scans (a, b, a∩b, a∪b): per user, does it click /
    # purchase — the union is every row, the intersection the a&b rows
    ev = events.filter(F.col("event_type").isin("click", "purchase"))
    flags = (
        ev.groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "click").cast("int")).alias("a"),
            F.max((F.col("event_type") == "purchase").cast("int")).alias("b"),
        )
        .cache()
    )
    inter_cnt = flags.filter("a = 1 AND b = 1").count()
    union_cnt = flags.count()

    # both filters in ONE build pass (conditional keys — null keys are
    # dropped by the kernel framing), not two full scans
    built = build_many(
        ev,
        [
            SketchJob(
                "a", BloomSpec(200_000, 0.0001),
                key=F.when(F.col("event_type") == "click", F.col("user_id")),
            ),
            SketchJob(
                "b", BloomSpec(200_000, 0.0001),
                key=F.when(F.col("event_type") == "purchase", F.col("user_id")),
            ),
        ],
    )
    ka, kb = built["a"][0], built["b"][0]
    true_j = 100.0 * inter_cnt / union_cnt if union_cnt else 0.0
    est_j = ka.jaccard(kb)
    j_ok = bool(abs(est_j - true_j) <= 10.0)

    merged = ka  # merge mutates — ka already holds click set
    merged.merge(kb)
    # distributed no-false-negative check: probe UDF + bool_and aggregate
    # (round 1 collected the whole union key list to the driver)
    union_complete = bool(
        flags.select(
            F.bool_and(probe.probe_column(spark, merged, "user_id")).alias("ok")
        ).first()["ok"]
    )
    flags.unpersist()
    return spark.createDataFrame(
        [
            Row(
                inter_cnt=int(inter_cnt),
                union_cnt=int(union_cnt),
                union_contains_all=union_complete,
                jaccard_within_10pp=j_ok,
            )
        ]
    )


def q_sql_udaf_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregation as plain Spark SQL (spark/sql_udaf.py): per-day
    HLL states built by a registered GROUPED_AGG UDAF over the xxhash64
    lane, estimated by a registered scalar UDF, then RE-aggregated with the
    merge UDAF — all inside one spark.sql statement.  Carrier: exact daily
    distinct counts; bound: every estimate (per-day and the merged total)
    within ±2% of exact."""
    from sketchlib.spark.sql_udaf import register_sql_udafs

    spec = HllSpec(p=14)
    register_sql_udafs(spark, spec, "sk_hll")
    events = _read(spark, sf_dir, "events")
    events.select(
        F.to_date("ts").alias("day"), F.col("user_id").cast("string").alias("uid")
    ).createOrReplaceTempView("udaf_events")
    # cache the UDAF day-state frame: three consumers below (total merge,
    # per-day estimates, and the view re-read) each re-ran the whole
    # GROUPED_AGG pass over events when it was left lazy
    per_day = spark.sql(
        """
        SELECT day,
               sk_hll_state(xxhash64(uid)) AS state,
               sk_hll_estimate(sk_hll_state(xxhash64(uid))) AS est
        FROM udaf_events WHERE uid IS NOT NULL GROUP BY day
        """
    ).cache()
    per_day.createOrReplaceTempView("udaf_day_states")
    total_est = spark.sql(
        "SELECT sk_hll_estimate(sk_hll_merge(state)) AS est FROM udaf_day_states"
    ).first()["est"]
    exact = {
        r["day"]: r["d"]
        for r in spark.sql(
            "SELECT day, COUNT(DISTINCT uid) AS d FROM udaf_events GROUP BY day"
        ).collect()
    }
    total_true = spark.sql(
        "SELECT COUNT(DISTINCT uid) AS d FROM udaf_events"
    ).first()["d"]
    day_ok = all(
        abs(r["est"] - exact[r["day"]]) / exact[r["day"]] <= 0.02
        for r in per_day.select("day", "est").collect()
    )
    total_ok = abs(total_est - total_true) / total_true <= 0.02
    per_day.unpersist()
    return (
        spark.createDataFrame(
            sorted(exact.items()), "day date, true_distinct bigint"
        )
        .withColumn("daily_within_2pct", F.lit(bool(day_ok)))
        .withColumn("merged_within_2pct", F.lit(bool(total_ok)))
    )


def q_hll_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-partitioned HLL rollup: one tiny sketch state per day, weekly
    distinct-user counts answered by MERGING day states (never rescanning
    rows) — the hypertable-rollup pattern at 10^12 turns.  Carrier: exact
    weekly distinct counts; bound: each merged weekly estimate within 2%."""
    import datetime as dt

    from sketchlib.spark.agg import _merge_blobs
    from sketchlib.spark.rollup import sketch_rollup

    spec = HllSpec(p=14)
    events = _read(spark, sf_dir, "events")
    # ONE job materializes the whole rollup (a handful of KB-sized rows);
    # every weekly range query is then a driver-side merge of day states
    tbl = sketch_rollup(events, spec, key="user_id").toArrow()
    by_week: dict = {}
    for b, s in zip(tbl.column("bucket").to_pylist(), tbl.column("state").to_pylist()):
        wk = b - dt.timedelta(days=b.weekday())
        by_week.setdefault(wk, []).append(s)
    weeks = (
        events.select(
            F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
            "user_id",
        )
        .groupBy("week")
        .agg(F.countDistinct("user_id").alias("true_distinct"))
        .collect()
    )
    out = []
    for r in sorted(weeks, key=lambda r: r["week"]):
        est = _merge_blobs(spec.to_json(), by_week.get(r["week"], [])).estimate()
        ok = bool(abs(est - r["true_distinct"]) / max(r["true_distinct"], 1) <= 0.02)
        out.append(
            Row(week=r["week"], true_distinct=int(r["true_distinct"]), within_2pct=ok)
        )
    return spark.createDataFrame(out).select("week", "true_distinct", "within_2pct")


def q_bloom_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom maintenance surface (bloom_intersect / saturation /
    estimate_false_positive_rate / clear_if_saturation_exceeds,
    src/bloom.c) driven through the gate: the AND-intersection keeps every
    true-intersection member (no false negatives), saturation and the
    corrected (s/m)^k FPR estimate stay in their deterministic bands, and
    the conditional clear triggers exactly on threshold crossing.  Exact
    carrier: distinct click users."""
    import copy

    events = _read(spark, sf_dir, "events")
    # one key-sized flag frame + one build_many pass replace two
    # filter+distinct scans and two full build scans (see bloom_set_algebra)
    ev = events.filter(F.col("event_type").isin("click", "purchase"))
    flags = (
        ev.groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "click").cast("int")).alias("a"),
            F.max((F.col("event_type") == "purchase").cast("int")).alias("b"),
        )
        .cache()
    )
    spec = BloomSpec(50_000, 0.001)
    built = build_many(
        ev,
        [
            SketchJob(
                "a", BloomSpec(50_000, 0.001),
                key=F.when(F.col("event_type") == "click", F.col("user_id")),
            ),
            SketchJob(
                "b", BloomSpec(50_000, 0.001),
                key=F.when(F.col("event_type") == "purchase", F.col("user_id")),
            ),
        ],
    )
    ka, kb = built["a"][0], built["b"][0]
    n_a = flags.filter("a = 1").count()

    ki = copy.deepcopy(ka).intersect(kb)
    inter_ok = (
        flags.filter("a = 1 AND b = 1")
        .select(F.bool_and(probe.probe_column(spark, ki, "user_id")).alias("ok"))
        .first()["ok"]
    )
    inter_ok = True if inter_ok is None else bool(inter_ok)
    flags.unpersist()

    sat = ka.saturation()
    fpr = ka.estimate_false_positive_rate()
    kc = copy.deepcopy(ka)
    clear_behaves = (
        not kc.clear_if_saturation_exceeds(99.9)  # under threshold: no clear
        and kc.saturation_count() > 0
        and kc.clear_if_saturation_exceeds(sat / 2)  # over: clears
        and kc.saturation_count() == 0
    )
    return spark.createDataFrame(
        [
            Row(
                n_click_users=int(n_a),
                intersect_no_false_negatives=inter_ok,
                saturation_in_band=bool(0.0 < sat < 50.0),
                fpr_le_p=bool(fpr <= spec.accuracy),
                clear_threshold_behavior=bool(clear_behaves),
            )
        ]
    )


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style quality filtering through the gate: per-source doc
    count and how many docs pass quality_score >= 0.5 (the score is a pure
    per-row function of integer char classes, reproduced exactly in SQL —
    the hash-compared OUTPUT columns are all integers)."""
    from sketchlib.pipeline.text import quality_score

    docs = _read(spark, sf_dir, "documents")
    return (
        docs.select("source", quality_score("text").alias("q"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("q") >= 0.5, 1).otherwise(0)).alias("n_quality"),
        )
        .select("source", "n_docs", "n_quality")
    )


# ---------------------------------------------------------------------------
# Gaussian Naive Bayes (reference src/gaussiannb.c, SURVEY.md §2.7)
# ---------------------------------------------------------------------------

def q_gaussiannb_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit GNB on events (label=event_type, features=value + hour-of-day);
    the per-class counts/means are the exact relational carrier, plus a
    bound-check that scoring the training rows beats chance."""
    from sketchlib.ml.gaussiannb import fit_gaussian_nb, predict_udf

    events = _read(spark, sf_dir, "events").withColumn(
        "hour", F.hour("ts").cast("double")
    )
    model = fit_gaussian_nb(events, "event_type", ["value", "hour"])
    preds = events.withColumn(
        "pred", predict_udf(spark, model, ["value", "hour"])
    )
    # one aggregation job over the scored rows (hits + total together)
    acc_row = preds.agg(
        F.sum((F.col("pred") == F.col("event_type")).cast("long")).alias("hit"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    acc = acc_row["hit"] / acc_row["n"]
    acc_ok = bool(acc >= 1.0 / (2 * len(model.labels)))
    # gaussiannb_mahalanobis_distance (src/gaussiannb.c): a class mean is at
    # distance 0 from its own class — deterministic model invariant
    maha_ok = all(
        abs(float(model.mahalanobis(np.array([model.mean[i]]), i)[0])) < 1e-9
        for i in range(len(model.labels))
    )
    # gaussiannb_update analog (Chan parallel merge, ml/gaussiannb.py):
    # fitting two disjoint halves and merging must equal the single fit.
    # Both half-fits come from ONE groupBy(half, label) pass
    # (fit_gaussian_nb_split) instead of two filtered scans.
    from sketchlib.ml.gaussiannb import fit_gaussian_nb_split, merge_models

    half = F.pmod(F.xxhash64(F.col("user_id")), F.lit(2))
    halves = fit_gaussian_nb_split(events, "event_type", ["value", "hour"], half)
    m_a, m_b = halves[0], halves[1]
    merged = merge_models(m_a, m_b)
    merge_ok = (
        merged.labels == model.labels
        and np.allclose(merged.count, model.count)
        and np.allclose(merged.mean, model.mean, atol=1e-9)
        and np.allclose(merged.var, model.var, atol=1e-9)
    )
    rows = [
        Row(
            event_type=str(lbl),
            n=int(model.count[i]),
            mean_value=float(round(model.mean[i][0], 4)),
            pred_acc_above_half_chance=acc_ok,
            mahalanobis_self_zero=bool(maha_ok),
            parallel_merge_equals_single=bool(merge_ok),
        )
        for i, lbl in enumerate(model.labels)
    ]
    return spark.createDataFrame(rows).select(
        "event_type", "n", "mean_value", "pred_acc_above_half_chance",
        "mahalanobis_self_zero", "parallel_merge_equals_single",
    )


# ---------------------------------------------------------------------------
# relational carriers (exact — pure Catalyst, no sketches)
# ---------------------------------------------------------------------------

def q_events_by_type_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.col("event_type"), F.to_date("ts").alias("day")
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select("event_type", "day", "n", "sum_value")
    )


def q_lineitem_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped carrier: the exact-aggregation baseline the sketch
    pipeline is benchmarked against."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "count_order",
        )
    )


def q_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema join carrier: orders ⋈ customer ⋈ nation (dims broadcast —
    the co-location pattern every probe/enrichment join uses at scale),
    revenue per nation in exact integer cents."""
    orders = _read(spark, sf_dir, "orders")
    customer = _read(spark, sf_dir, "customer")
    nation = _read(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice") * 100)
            .cast("long")
            .alias("revenue_cents"),
        )
        .select("n_name", "n_orders", "revenue_cents")
    )


def q_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(20)
        .select("user_id", "n_events")
    )


def q_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accelerated join (spark/joins.py): the big side is pre-pruned
    by a Bloom literal built from the dim side — scan-level DataFilter,
    zero shuffle and zero Python on the probe, then the real join removes
    the ~p false positives, so the result is EXACTLY the plain inner
    join's (which is the oracle)."""
    from sketchlib.spark.joins import bloom_pruned_join

    events = _read(spark, sf_dir, "events")
    # cache the key-sized dim: it is consumed three times (expected-count,
    # bloom word build, and the verifying join) and each use re-ran the
    # filter+distinct over events when left lazy
    dim = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .cache()
    )
    j = bloom_pruned_join(events, dim, "user_id", p=0.001)
    out = j.groupBy("user_id").agg(F.count("*").alias("n_events"))
    out = out.localCheckpoint(eager=True)  # key-count-sized; frees the cache
    dim.unpersist()
    return out


def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization carrier (spark/sessions.py): per-user
    episode stats with a 30-min gap — the lag/cumulative-sum construction,
    one shuffle on user_id, whole-stage codegen windows."""
    from sketchlib.spark.sessions import session_stats

    st = session_stats(_read(spark, sf_dir, "events"), "user_id", gap_sec=1800)
    return st.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("n_events").alias("max_session_events"),
        F.sum("active_sec").alias("total_active_sec"),
    )


# ---------------------------------------------------------------------------
# training-data pipeline (SURVEY.md §2.9 extensions: dedup / similarity /
# text analysis / multimodal)
# ---------------------------------------------------------------------------

def _dup_corpus(spark, sf_dir, limit=100):
    """documents[doc_id < limit] ∪ same texts re-id'd (+10000): the
    deterministic near-dup fixture both Spark and the SQL oracle construct."""
    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < limit)
    return docs.select("doc_id", "text").unionByName(
        docs.select((F.col("doc_id") + 10000).alias("doc_id"), "text")
    )


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact hash-groupBy dedup of a corpus with every doc duplicated —
    survivors are exactly the originals (min doc_id per text)."""
    from sketchlib.pipeline.dedup import exact_dedup

    docs = _read(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text", "source").unionByName(
        docs.select((F.col("doc_id") + 10000).alias("doc_id"), "text", "source")
    )
    kept = exact_dedup(corpus, "text", "doc_id")
    return kept.groupBy("source").agg(F.count("*").alias("n_docs")).select("source", "n_docs")


def q_ngram_jaccard_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard ≥ 0.9 pairs (pure Catalyst explode+join) on the
    duplicated corpus — the ground-truth tier of the dedup ladder."""
    from sketchlib.pipeline.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_dup_corpus(spark, sf_dir), "text", "doc_id", 3, 0.9)


def q_minhash_lsh_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidates, exact-Jaccard-verified at ≥ 0.9 — must equal
    the exact pair set (Jaccard-1 duplicates collide in every LSH band)."""
    from sketchlib.pipeline.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _dup_corpus(spark, sf_dir), "text", "doc_id", threshold=0.9, verify_k=3
    )


def q_simhash_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming≤3 candidates, exact-verified at ≥ 0.9 — identical
    texts have Hamming 0, so the verified set equals the exact pair set."""
    from sketchlib.pipeline.dedup import (
        simhash_candidate_pairs,
        simhash_signatures,
        verify_pairs_jaccard,
    )

    corpus = _dup_corpus(spark, sf_dir)
    cands = simhash_candidate_pairs(simhash_signatures(corpus, "text", "doc_id"))
    return verify_pairs_jaccard(corpus, cands, "text", "doc_id", 0.9, 3)


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs → connected components → canonical (min) id per doc: the
    keep-one resolution step.  On the duplicated corpus every copy's
    canonical is its original; originals map to themselves."""
    from sketchlib.pipeline.dedup import duplicate_clusters, minhash_lsh_pairs

    corpus = _dup_corpus(spark, sf_dir)
    pairs = minhash_lsh_pairs(corpus, "text", "doc_id", threshold=0.9, verify_k=3)
    ids = corpus.select(F.col("doc_id").alias("id"))
    return duplicate_clusters(ids, pairs).select("id", "canonical_id")


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs ≥ 0.999 on a corpus with every vector
    duplicated (+10000) — via the SRP-bucketed scale path (identical vectors
    share every bucket, so the bucketed result equals the exact oracle
    here; recall vs the exact path is property-tested separately)."""
    from sketchlib.pipeline.similarity import near_dup_pairs_bucketed

    emb = _read(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = emb.unionByName(
        emb.select((F.col("vec_id") + 10000).alias("vec_id"), "embedding")
    )
    pairs = near_dup_pairs_bucketed(corpus, threshold=0.999)
    return pairs.select("id_a", "id_b", F.round("cos", 4).alias("cos"))


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for query vectors 0..4
    (per-partition top-k + global reduce)."""
    from sketchlib.pipeline.similarity import cosine_topk

    emb = _read(spark, sf_dir, "embeddings")
    qt = emb.filter(F.col("vec_id") < 5).toArrow()
    queries = {
        int(i): np.array(v, dtype=np.float64)
        for i, v in zip(qt.column("vec_id").to_pylist(), qt.column("embedding").to_pylist())
    }
    rows = [
        Row(qid=q, nid=n, cos=float(round(c, 4)))
        for q, n, c in cosine_topk(emb, queries, k=5)
    ]
    return spark.createDataFrame(rows).select("qid", "nid", "cos")


def q_lsh_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH ANN vs the brute-force baseline: sub-linear scan fraction with
    bounded recall (random 64-dim data is LSH-hostile; the bound reflects
    the 1-bit multiprobe scan fraction)."""
    from sketchlib.pipeline.similarity import cosine_topk, lsh_ann_topk

    emb = _read(spark, sf_dir, "embeddings")
    qt = emb.filter(F.col("vec_id") < 5).toArrow()
    queries = {
        int(i): np.array(v, dtype=np.float64)
        for i, v in zip(qt.column("vec_id").to_pylist(), qt.column("embedding").to_pylist())
    }
    exact = {(q, n) for q, n, _ in cosine_topk(emb, queries, k=5)}
    approx = {(q, n) for q, n, _ in lsh_ann_topk(emb, queries, k=5, planes=8)}
    recall = len(exact & approx) / max(len(exact), 1)
    total = emb.count()
    return spark.createDataFrame(
        [
            Row(
                n_queries=len(queries),
                recall_ge_10pct=bool(recall >= 0.10),
                corpus_rows=int(total),
            )
        ]
    ).select("n_queries", "recall_ge_10pct", "corpus_rows")


def q_ann_index_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-index ANN through the gate (SRP bucket-partitioned + IVF
    cell-partitioned parquet): IVF probing EVERY cell must equal brute
    force exactly, and the SRP index probe must equal the on-the-fly LSH
    (same buckets, same rerank).  Exact carrier: corpus rows."""
    import shutil
    import tempfile

    from sketchlib.pipeline.similarity import (
        build_ivf_index,
        build_srp_index,
        cosine_topk,
        ivf_ann_topk,
        lsh_ann_topk,
        lsh_ann_topk_indexed,
    )

    # one cached corpus scan feeds both index builds + both reference top-ks
    emb = _read(spark, sf_dir, "embeddings").cache()
    qt = emb.filter(F.col("vec_id") < 5).toArrow()
    queries = {
        int(i): np.array(v, dtype=np.float64)
        for i, v in zip(qt.column("vec_id").to_pylist(), qt.column("embedding").to_pylist())
    }
    total = emb.count()
    tmp = tempfile.mkdtemp(prefix="sketchlib_ann_gate_")
    try:
        # planes=4 → 16 bucket dirs: the carrier's cost is dominated by
        # directory count in the partitioned writes, and the equality
        # properties checked here are planes-independent (r2 VERDICT #5).
        # dim passed from the query vectors — skips the builder's first() job
        dim = len(next(iter(queries.values())))
        build_srp_index(emb, f"{tmp}/srp", planes=4, seed=7, dim=dim)
        srp_idx = {(q, n) for q, n, _ in lsh_ann_topk_indexed(spark, f"{tmp}/srp", queries, k=5)}
        srp_fly = {(q, n) for q, n, _ in lsh_ann_topk(emb, queries, k=5, planes=4, seed=7)}
        n_cells = 8
        build_ivf_index(emb, f"{tmp}/ivf", n_cells=n_cells, seed=7)
        ivf_full = {(q, n) for q, n, _ in ivf_ann_topk(spark, f"{tmp}/ivf", queries, k=5, n_probe=n_cells)}
        exact = {(q, n) for q, n, _ in cosine_topk(emb, queries, k=5)}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        emb.unpersist()
    return spark.createDataFrame(
        [
            Row(
                n_queries=len(queries),
                corpus_rows=int(total),
                ivf_fullprobe_is_exact=bool(ivf_full == exact),
                srp_index_matches_lsh=bool(srp_idx == srp_fly),
            )
        ]
    )


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source text-analysis aggregates: token counts, char classes —
    every column exactly reproducible in SQL."""
    from sketchlib.pipeline.text import char_classes, token_count

    docs = _read(spark, sf_dir, "documents")
    cc = char_classes("text")
    return (
        docs.select(
            "source",
            token_count("text").alias("tok"),
            cc["n_chars"].alias("nch"),
            cc["n_punct"].alias("npu"),
            cc["n_alpha"].alias("nal"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tok").alias("sum_tokens"),
            F.sum("nch").alias("sum_chars"),
            F.sum("npu").alias("sum_punct"),
            # integer sum, NOT a rounded float average: float summation order
            # depends on partitioning, and a 4-dp boundary flip breaks the
            # driver's value hash (round-1 failure mode)
            F.sum("nal").alias("sum_alpha"),
        )
        .select("source", "n_docs", "sum_tokens", "sum_chars", "sum_punct", "sum_alpha")
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID over a constructed multilingual corpus: marker tokens of
    lang (doc_id % 5) appended to each text; the classifier must recover the
    injected language exactly (the documents.lang column is label noise —
    text content is monolingual, verified)."""
    from sketchlib.pipeline.text import lang_id

    docs = _read(spark, sf_dir, "documents")
    markers = {
        0: " the and of is",
        1: " der und die ist",
        2: " el que los una",
        3: " le les des dans",
        4: " 的 是 在 了",
    }
    expected = {0: "en", 1: "de", 2: "es", 3: "fr", 4: "zh"}
    tagged = docs.withColumn(
        "mtext",
        F.concat(
            F.col("text"),
            F.element_at(
                F.array(*[F.lit(markers[i]) for i in range(5)]),
                (F.col("doc_id") % 5 + 1).cast("int"),
            ),
        ),
    )
    pred = tagged.select(
        (F.col("doc_id") % 5).alias("bucket"), lang_id("mtext").alias("pred")
    )
    return (
        pred.groupBy("bucket", "pred")
        .agg(F.count("*").alias("n"))
        .select("bucket", "pred", "n")
    )


def q_fingerprint_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mmh3 document fingerprints: distinct fingerprints must equal distinct
    normalized texts (no collisions at this scale, deterministic)."""
    from sketchlib.pipeline.text import fingerprint_col

    docs = _read(spark, sf_dir, "documents")
    n_fp = (
        docs.select(fingerprint_col(spark, "text").alias("fp")).distinct().count()
    )
    n_text = docs.select(
        F.lower(F.regexp_replace(F.trim("text"), r"\s+", " ")).alias("t")
    ).distinct().count()
    return spark.createDataFrame(
        [Row(n_distinct_texts=int(n_text), fp_matches_texts=bool(n_fp == n_text))]
    ).select("n_distinct_texts", "fp_matches_texts")


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: text→binary media table, decode +
    resize + feature extract (mapInPandas), frame sampling — byte counts and
    frame counts are exact SQL-checkable functions of the text lengths.
    The volume run uses the deterministic stub decoder; a REAL-codec leg
    runs the same mapInPandas pipeline over genuine PNG blobs with
    ``fake=False`` (stdlib decoder, pipeline/multimodal.py) and asserts the
    features match a local decode of the same bytes — the gate no longer
    proves only the fake path."""
    from sketchlib.pipeline.multimodal import (
        _decode_png,
        frame_sample,
        image_features,
        make_media_df,
    )

    docs = _read(spark, sf_dir, "documents")
    media = make_media_df(spark, docs, "text", "doc_id")
    feats = image_features(media, resize_to=4, fake=True)
    frames = frame_sample(media, every=7, fake=True)

    # real-codec leg: deterministic PNGs through the same pipeline
    import pandas as pd

    from sketchlib.pipeline.multimodal import MEDIA_SCHEMA

    rng = np.random.default_rng(17)
    rows, local_means = [], {}
    for i in range(12):
        arr = rng.integers(0, 256, size=(9 + i % 4, 7, 3), dtype=np.uint8)
        blob = _png_bytes(arr, filt=i % 5)
        rows.append(
            (i, "image", bytearray(blob),
             {"width": 7, "height": 9 + i % 4, "channels": 3,
              "sample_rate": 0, "n_frames": 0, "format": "png"})
        )
        local_means[i] = _decode_png(blob).reshape(-1, 3).mean(axis=0)
    png_media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "kind", "data", "meta"]),
        schema=MEDIA_SCHEMA,
    )
    got = {
        r["id"]: np.array(r["feat"])
        for r in image_features(png_media, resize_to=4, fake=False).collect()
    }
    real_ok = len(got) == 12 and all(
        np.allclose(got[i], local_means[i], atol=8.0) for i in got
    )

    # one deterministic all-integer aggregation per branch, joined into one
    # row — the round-1 version ran four separate actions over the uncached
    # mapInPandas chain (4x recompute + a hash-fragile driver-side Row)
    f_agg = feats.agg(
        F.count("*").alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max(F.size("feat")).alias("feat_dim"),
    )
    s_agg = frames.agg(F.count("*").alias("n_sampled_frames"))
    return f_agg.crossJoin(s_agg).select(
        "n_media",
        "total_bytes",
        "feat_dim",
        "n_sampled_frames",
        F.lit(bool(real_ok)).alias("real_png_decode_ok"),
    )


def _png_bytes(arr: "np.ndarray", filt: int = 0) -> bytes:
    """Minimal PNG writer (8-bit RGB, one filter type for all rows) for the
    real-codec gate leg — forward transforms of PNG spec §9."""
    import struct as _s
    import zlib as _z

    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        cur = arr[y].reshape(-1).astype(np.int32)
        raw.append(filt)
        for i in range(w * c):
            a = int(cur[i - c]) if i >= c else 0
            b = int(prev[i])
            cc = int(prev[i - c]) if i >= c else 0
            if filt == 0:
                v = cur[i]
            elif filt == 1:
                v = cur[i] - a
            elif filt == 2:
                v = cur[i] - b
            elif filt == 3:
                v = cur[i] - (a + b) // 2
            else:
                pa, pb, pc = abs(b - cc), abs(a - cc), abs(a + b - 2 * cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                v = cur[i] - pred
            raw.append(int(v) & 0xFF)
        prev = cur

    def chunk(t, d):
        return _s.pack(">I", len(d)) + t + d + _s.pack(">I", _z.crc32(t + d))

    ihdr = _s.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", _z.compress(bytes(raw))) + chunk(b"IEND", b""))


def q_streaming_sketch_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming maintenance of a sketch (SURVEY.md §2.9 /
    streaming.py): stream the events table file-by-file through the
    foreachBatch sketch_sink (epoch-dedup, persistent store), then compare
    the folded HLL estimate against the exact COUNT(DISTINCT).  The stream
    is deterministic (fixed files, associative merges), so the exact carrier
    + bound hash-match the SQL oracle like the batch queries."""
    import os
    import shutil
    import tempfile

    from sketchlib.spark.agg import SketchJob
    from sketchlib.store import SketchStore
    from sketchlib.streaming import run_stream_build

    events = _read(spark, sf_dir, "events")
    true = events.select(F.countDistinct("user_id").alias("d")).first()["d"]
    tmp = tempfile.mkdtemp(prefix="sketchlib_stream_gate_")
    try:
        src = os.path.join(tmp, "src")
        # two files → two micro-batches (maxFilesPerTrigger=1): the gate's
        # multi-batch property needs ≥2 epochs, and every extra micro-batch
        # costs a fixed trigger+build overhead (~0.5 s at this scale)
        events.select("user_id").repartition(2).write.parquet(src)
        store = SketchStore(os.path.join(tmp, "store"))
        q = run_stream_build(
            spark,
            src,
            store,
            [SketchJob("hll_users_streamed", HllSpec(p=14), key="user_id")],
            checkpoint_dir=os.path.join(tmp, "ckpt"),
            query_name="gate_stream_build",
        )
        q.processAllAvailable()
        q.stop()
        kernel, metrics = store.load_kernel("hll_users_streamed")
        est = kernel.estimate()
        epochs = int(metrics.get("epochs", 0))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    ok = bool(abs(est - true) / true <= 0.02)
    return spark.createDataFrame(
        [
            Row(
                sketch="hll_users_streamed",
                true_distinct=int(true),
                multi_batch=bool(epochs >= 2),
                within_2pct=ok,
            )
        ]
    )


def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming dedup (streaming.py::streaming_dedup): the
    documents corpus arrives twice across micro-batches (full file, then a
    half-duplicate file); the sharded Bloom state must pass every unique
    text through exactly once — so the emitted rows ARE the documents
    table, hash-comparable against its SQL projection."""
    import os
    import shutil
    import tempfile

    from sketchlib.streaming import streaming_dedup

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="sketchlib_sdedup_gate_")
    try:
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        # one sorted file: within-batch first-occurrence = MIN(doc_id),
        # which the SQL oracle can state exactly
        docs.repartition(1).sortWithinPartitions("doc_id").write.parquet(
            os.path.join(src, "b1")
        )
        docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
            os.path.join(src, "b2")
        )
        # one dir per micro-batch; FileStreamSource orders by the mtimes of
        # the LEAF part files (not the directories — ADVICE r4), so stamp
        # every part file inside each batch dir
        import glob as _glob

        for bdir, mt in (("b1", 1_000_000_000), ("b2", 1_000_000_001)):
            for part in _glob.glob(os.path.join(src, bdir, "*.parquet")):
                os.utime(part, (mt, mt))
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
        )
        out = streaming_dedup(
            stream, "text", BloomSpec(200_000, 1e-9), n_shards=8
        )
        sink = os.path.join(tmp, "out")
        # state-store partitions = shard count: the stateful exchange has
        # exactly n_shards non-empty groups, so the session's default
        # (cores-scaled) shuffle-partition count only adds empty state
        # store instances per micro-batch — scale-adaptive, not box-tuned
        old_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                out.writeStream.outputMode("append")
                .format("parquet")
                .option("path", sink)
                .option("checkpointLocation", os.path.join(tmp, "ckpt"))
                .queryName("gate_stream_dedup")
                .start()
            )
            q.processAllAvailable()
            q.stop()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        # materialize executor-side (emitted ≈ distinct documents — data-
        # sized, so never a driver collect) before the sink dir is removed
        emitted = spark.read.parquet(sink).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return emitted.select(*docs.columns)


def q_streaming_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained heavy hitters (streaming.py::
    streaming_heavy_hitters — per-key-shard Misra–Gries in
    applyInPandasWithState, update mode): the events table arrives in two
    micro-batches; after the stream drains, every key whose exact count
    exceeds total/(k+1) MUST be present in its shard's final summary
    (keys never span shards, and shard_rows ≤ total keeps the MG
    guarantee one-sided), with its estimate bracketing the true count:
    count_lower ≤ true ≤ count_lower + undercount_bound."""
    import os
    import shutil
    import tempfile

    from sketchlib.specs import MGSpec
    from sketchlib.streaming import streaming_heavy_hitters

    K = 64
    events = _read(spark, sf_dir, "events").select("event_id", "event_type")
    total = events.count()
    exact = (
        events.groupBy("event_type")
        .count()
        .withColumnRenamed("count", "cnt_exact")
    )
    heavy = exact.filter(F.col("cnt_exact") > total / (K + 1))
    tmp = tempfile.mkdtemp(prefix="sketchlib_shh_gate_")
    try:
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
            os.path.join(src, "b1")
        )
        events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
            os.path.join(src, "b2")
        )
        import glob as _glob

        for bdir, mt in (("b1", 1_000_000_000), ("b2", 1_000_000_001)):
            for part in _glob.glob(os.path.join(src, bdir, "*.parquet")):
                os.utime(part, (mt, mt))
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
        )
        out = streaming_heavy_hitters(stream, "event_type", MGSpec(k=K), n_shards=4)
        # state-store partitions = shard count (see streaming_dedup gate):
        # partitions beyond n_shards hold provably empty state
        old_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try:
            q = (
                out.writeStream.outputMode("update")
                .format("memory")
                .queryName("gate_streaming_hh")
                .start()
            )
            q.processAllAvailable()
            q.stop()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        # latest emission per key = the row from the key's shard's final
        # micro-batch (shard_rows is monotone per shard)
        latest = (
            spark.table("gate_streaming_hh")
            .groupBy("key")
            .agg(
                F.max_by(
                    F.struct("count_lower", "undercount_bound"), F.col("shard_rows")
                ).alias("s")
            )
            .select("key", "s.count_lower", "s.undercount_bound")
        )
        bracketed = (
            F.col("count_lower").isNotNull()
            & (F.col("count_lower") <= F.col("cnt_exact"))
            & (F.col("cnt_exact") <= F.col("count_lower") + F.col("undercount_bound"))
        )
        rows = (
            heavy.join(latest, heavy["event_type"] == latest["key"], "left")
            .select(
                "event_type",
                "cnt_exact",
                bracketed.alias("emitted_and_bracketed"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "event_type string, cnt_exact long, emitted_and_bracketed boolean"
    )


def q_archbloom_fleet_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The archbloom DataSource through the gate (spark/archbloom_source.py,
    previously pytest-only): two Bloom filters (click-users, purchase-users)
    are written as native C ``!bloomf!`` files via
    ``df.write.format("archbloom")`` (two-phase atomic writer), read back
    as a fleet via ``spark.read.format("archbloom")``, OR-merged with
    ``import_merged`` (kind-checked fold), and the union filter must
    contain EVERY click/purchase user (no false negatives — the merge
    algebra of src/bloom.c:773-817 re-expressed over files)."""
    import os
    import shutil
    import tempfile

    from sketchlib.spark.archbloom_source import (
        ArchbloomDataSource,
        import_merged,
    )

    spark.dataSource.register(ArchbloomDataSource)
    events = _read(spark, sf_dir, "events")
    # both filters in ONE build_many pass: conditional keys are null for
    # the other event type and null keys are skipped by the kernel framing
    # (mmh3.arrow_string_buffers drops nulls) — one scan, one Arrow
    # crossing, two kernels, instead of two full build passes
    spec = BloomSpec(20_000, 1e-6)
    ev = events.filter(F.col("event_type").isin("click", "purchase"))
    built = build_many(
        ev,
        [
            SketchJob(
                "click_users",
                BloomSpec(20_000, 1e-6, name="click_users"),
                key=F.when(F.col("event_type") == "click", F.col("user_id")),
            ),
            SketchJob(
                "purchase_users",
                BloomSpec(20_000, 1e-6, name="purchase_users"),
                key=F.when(F.col("event_type") == "purchase", F.col("user_id")),
            ),
        ],
    )
    ka, kb = built["click_users"][0], built["purchase_users"][0]
    fleet_df = spark.createDataFrame(
        [
            Row(name="click_users", kind="bloom",
                spec_json=ka.spec.to_json(), state=bytearray(ka.serialize())),
            Row(name="purchase_users", kind="bloom",
                spec_json=kb.spec.to_json(), state=bytearray(kb.serialize())),
        ]
    )
    tmp = tempfile.mkdtemp(prefix="sketchlib_fleet_gate_")
    try:
        out_dir = os.path.join(tmp, "filters")
        # NOTE: measured, counter-intuitive — coalesce(1) before this write
        # costs ~4.4 s vs ~0.8 s plain (the single-partition python
        # data-source writer path is pathologically slower here), so the
        # 2-row frame is written as-is
        fleet_df.write.format("archbloom").mode("overwrite").save(out_dir)
        # cache the fleet frame: the meta check and import_merged otherwise
        # each run the Python data-source reader (one job apiece)
        fleet = spark.read.format("archbloom").load(out_dir).cache()
        meta = fleet.select("name", "kind", "nbytes").collect()
        fleet_ok = (
            len(meta) == 2
            and {r["name"] for r in meta} == {"click_users", "purchase_users"}
            and all(r["kind"] == "bloom" for r in meta)
            and all(r["nbytes"] == spec.nbytes for r in meta)
        )
        merged = import_merged(fleet, kind="bloom")
        fleet.unpersist()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    # key-sized frame consumed twice (no-false-negative probe + the output
    # carrier): cache it so filter+distinct over events runs once
    union = (
        events.filter(F.col("event_type").isin("click", "purchase"))
        .select("user_id")
        .distinct()
        .cache()
    )
    contains_all = bool(
        union.select(
            F.bool_and(probe.probe_column(spark, merged, "user_id")).alias("ok")
        ).first()["ok"]
    )
    out = union.select(
        "user_id",
        F.lit(bool(fleet_ok)).alias("fleet_read_ok"),
        F.lit(contains_all).alias("union_contains_all"),
    ).localCheckpoint(eager=True)  # key-count-sized; frees the cache
    union.unpersist()
    return out


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "hll_distinct_users": q_hll_distinct_users,
    "hll_sql_distinct": q_hll_sql_distinct,
    "hll_distinct_user_type": q_hll_distinct_user_type,
    "hll_daily_rollup": q_hll_daily_rollup,
    "sql_udaf_rollup": q_sql_udaf_rollup,
    "bottomk_distinct_sample": q_bottomk_distinct_sample,
    "bloom_membership": q_bloom_membership,
    "prehash_membership": q_prehash_membership,
    "bloom_sql_membership": q_bloom_sql_membership,
    "cbloom_sql_counts": q_cbloom_sql_counts,
    "bloom_probe_join": q_bloom_probe_join,
    "archbloom_file_roundtrip": q_archbloom_file_roundtrip,
    "cuckoo_membership": q_cuckoo_membership,
    "cms_heavy_hitters": q_cms_heavy_hitters,
    "cms_sql_heavy_hitters": q_cms_sql_heavy_hitters,
    "mg_heavy_hitters": q_mg_heavy_hitters,
    "cbloom_point_counts": q_cbloom_point_counts,
    "sbf_frequency": q_sbf_frequency,
    "tdbloom_recent_users": q_tdbloom_recent_users,
    "tdcbloom_windowed_counts": q_tdcbloom_windowed_counts,
    "tdbloom_lifecycle": q_tdbloom_lifecycle,
    "cbloom_maintenance_ops": q_cbloom_maintenance_ops,
    "kll_quantiles": q_kll_quantiles,
    "kll_sql_quantiles": q_kll_sql_quantiles,
    "tdigest_quantiles": q_tdigest_quantiles,
    "bloom_set_algebra": q_bloom_set_algebra,
    "bloom_maintenance": q_bloom_maintenance,
    "quality_filter": q_quality_filter,
    "gaussiannb_events": q_gaussiannb_events,
    "events_by_type_day": q_events_by_type_day,
    "lineitem_pricing_summary": q_lineitem_pricing_summary,
    "top_users": q_top_users,
    "nation_revenue": q_nation_revenue,
    "user_sessions": q_user_sessions,
    "bloom_pruned_join": q_bloom_pruned_join,
    "exact_dedup": q_exact_dedup,
    "ngram_jaccard_dups": q_ngram_jaccard_dups,
    "minhash_lsh_dups": q_minhash_lsh_dups,
    "simhash_dups": q_simhash_dups,
    "dedup_clusters": q_dedup_clusters,
    "embedding_near_dups": q_embedding_near_dups,
    "ann_topk": q_ann_topk,
    "lsh_ann_recall": q_lsh_ann_recall,
    "ann_index_recall": q_ann_index_recall,
    "text_stats": q_text_stats,
    "lang_id": q_lang_id,
    "fingerprint_docs": q_fingerprint_docs,
    "multimodal_features": q_multimodal_features,
    "streaming_sketch_build": q_streaming_sketch_build,
    "streaming_dedup": q_streaming_dedup,
    "streaming_heavy_hitters": q_streaming_heavy_hitters,
    "archbloom_fleet_merge": q_archbloom_fleet_merge,
}

_DUP_PAIRS_ORACLE = """
    WITH c AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 100
        UNION ALL
        SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id < 100
    ),
    sh AS (
        SELECT DISTINCT doc_id, substring(text, CAST(i AS INT), 3) AS s
        FROM c, LATERAL (
            SELECT unnest(generate_series(1, GREATEST(length(text) - 2, 1))) AS i
        ) t
    ),
    sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS n
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT ia AS id_a, ib AS id_b,
           ROUND(n / (sa.sz + sb.sz - n), 6) AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = ia
    JOIN sz sb ON sb.doc_id = ib
    WHERE n / (sa.sz + sb.sz - n) >= 0.9
"""


ORACLES: dict[str, str] = {
    "hll_distinct_users": """
        SELECT 'hll_users' AS sketch,
               COUNT(DISTINCT user_id) AS true_distinct,
               TRUE AS within_2pct
        FROM events
    """,
    "hll_sql_distinct": """
        SELECT 'hll_sql_users' AS sketch,
               COUNT(DISTINCT user_id) AS true_distinct,
               TRUE AS within_2pct,
               TRUE AS identical_to_kernel_build
        FROM events
    """,
    "hll_distinct_user_type": """
        SELECT 'hll_user_type' AS sketch,
               COUNT(DISTINCT (user_id, event_type)) AS true_distinct,
               TRUE AS within_2pct
        FROM events
    """,
    "hll_daily_rollup": """
        SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
               COUNT(DISTINCT user_id) AS true_distinct,
               TRUE AS within_2pct
        FROM events GROUP BY 1
    """,
    "sql_udaf_rollup": """
        SELECT CAST(ts AS DATE) AS day,
               COUNT(DISTINCT user_id) AS true_distinct,
               TRUE AS daily_within_2pct,
               TRUE AS merged_within_2pct
        FROM events GROUP BY 1
    """,
    "bloom_membership": """
        SELECT DISTINCT user_id
        FROM events
        WHERE user_id IN (SELECT user_id FROM events WHERE event_type = 'purchase')
    """,
    "prehash_membership": """
        SELECT DISTINCT user_id, TRUE AS hll_within_2pct
        FROM events
        WHERE user_id IN (SELECT user_id FROM events WHERE event_type = 'purchase')
    """,
    "bloom_sql_membership": """
        SELECT DISTINCT user_id
        FROM events
        WHERE user_id IN (SELECT user_id FROM events WHERE event_type = 'purchase')
    """,
    "cbloom_sql_counts": """
        SELECT user_id,
               COUNT(*) AS cnt_exact,
               TRUE AS never_undercounts,
               TRUE AS cbloom_byte_identical
        FROM events GROUP BY user_id
    """,
    "bloom_probe_join": """
        SELECT DISTINCT user_id, TRUE AS routed_not_broadcast
        FROM events
        WHERE user_id IN (SELECT user_id FROM events WHERE event_type = 'purchase')
    """,
    "archbloom_file_roundtrip": """
        SELECT DISTINCT user_id,
               TRUE AS file_roundtrip_identical,
               TRUE AS cuckoo_native_roundtrip
        FROM events
        WHERE user_id IN (SELECT user_id FROM events WHERE event_type = 'purchase')
    """,
    "cuckoo_membership": """
        SELECT 'cuckoo_docs' AS sketch,
               COUNT(*) AS n_members_found,
               COUNT(*) AS n_members_true,
               TRUE AS fpr_within_bound
        FROM documents
        WHERE doc_id % 2 = 0 AND doc_id % 10 != 0
    """,
    "cms_heavy_hitters": """
        SELECT event_type,
               COUNT(*) AS cnt,
               TRUE AS never_undercounts,
               TRUE AS overcount_within_epsN
        FROM events GROUP BY event_type
    """,
    "cms_sql_heavy_hitters": """
        SELECT event_type,
               COUNT(*) AS cnt,
               TRUE AS never_undercounts,
               TRUE AS overcount_within_epsN
        FROM events GROUP BY event_type
    """,
    "bottomk_distinct_sample": """
        SELECT COUNT(DISTINCT user_id) AS true_distinct,
               LEAST(256, COUNT(DISTINCT user_id)) AS sample_size,
               TRUE AS sample_all_valid,
               TRUE AS est_within_bound
        FROM events
    """,
    "mg_heavy_hitters": """
        SELECT event_type,
               COUNT(*) AS cnt,
               TRUE AS never_overcounts,
               TRUE AS undercount_within_bound,
               TRUE AS guaranteed_present
        FROM events GROUP BY event_type
    """,
    "cbloom_point_counts": """
        SELECT l_returnflag,
               COUNT(*) AS cnt,
               TRUE AS never_undercounts
        FROM lineitem GROUP BY l_returnflag
    """,
    "sbf_frequency": """
        SELECT event_type,
               COUNT(*) AS cnt,
               TRUE AS never_undercounts,
               TRUE AS mi_not_looser,
               TRUE AS rm_not_looser
        FROM events GROUP BY event_type
    """,
    "tdbloom_recent_users": """
        WITH bounds AS (
            SELECT epoch(MIN(ts))::BIGINT AS t0, epoch(MAX(ts))::BIGINT AS t1 FROM events
        )
        SELECT DISTINCT user_id, TRUE AS td_hit
        FROM events, bounds
        WHERE epoch(ts)::BIGINT >= t1 - GREATEST((t1 - t0) // 3, 1)
    """,
    "tdcbloom_windowed_counts": """
        WITH bounds AS (
            SELECT epoch(MIN(ts))::BIGINT AS t0, epoch(MAX(ts))::BIGINT AS t1 FROM events
        )
        SELECT user_id,
               COUNT(*) AS recent_cnt,
               TRUE AS est_at_least_recent,
               TRUE AS sql_matches_kernel
        FROM events, bounds
        WHERE epoch(ts)::BIGINT >= t1 - GREATEST((t1 - t0) // 3, 1)
        GROUP BY user_id
    """,
    "tdbloom_lifecycle": """
        WITH bounds AS (
            SELECT epoch(MIN(ts))::BIGINT AS t0, epoch(MAX(ts))::BIGINT AS t1 FROM events
        ),
        pu AS (
            SELECT user_id, MAX(epoch(ts)::BIGINT) AS last_seen FROM events GROUP BY user_id
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(CASE WHEN last_seen >= t1 - GREATEST((t1 - t0) // 3, 1)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_recent,
               TRUE AS last_access_bounds_ok,
               TRUE AS recent_implies_active,
               TRUE AS clear_expired_empties,
               TRUE AS avg_lifetime_in_window,
               TRUE AS adjust_timeout_reaps,
               TRUE AS lookup_or_add_stamps,
               TRUE AS expired_then_reset,
               TRUE AS age_element_present,
               TRUE AS saturation_count_consistent
        FROM pu, bounds
    """,
    "cbloom_maintenance_ops": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               COUNT(DISTINCT l_returnflag) AS n_flags,
               TRUE AS avg_count_exact,
               TRUE AS threshold_count_ge_k,
               TRUE AS remove_one_sided,
               TRUE AS decay_linear_bounded,
               TRUE AS decay_exponential_bounded,
               TRUE AS clear_above_zeroes,
               TRUE AS lookup_or_add_inserts
        FROM lineitem
    """,
    "kll_quantiles": """
        SELECT 'kll_extendedprice' AS sketch, q, TRUE AS rank_err_within_bound
        FROM (SELECT UNNEST(CAST([0.1, 0.25, 0.5, 0.75, 0.9, 0.99] AS DOUBLE[])) AS q)
    """,
    "kll_sql_quantiles": """
        SELECT CAST(DATE_TRUNC('month', l_shipdate) AS DATE) AS month,
               COUNT(l_extendedprice) AS n,
               TRUE AS monthly_within_rank_bound,
               TRUE AS merged_within_rank_bound
        FROM lineitem GROUP BY 1
    """,
    "tdigest_quantiles": """
        SELECT 'tdigest_extendedprice' AS sketch, q, TRUE AS rank_err_within_bound
        FROM (SELECT UNNEST(CAST([0.1, 0.25, 0.5, 0.75, 0.9, 0.99] AS DOUBLE[])) AS q)
    """,
    "bloom_set_algebra": """
        WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
             b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        SELECT (SELECT COUNT(*) FROM a WHERE user_id IN (SELECT user_id FROM b)) AS inter_cnt,
               (SELECT COUNT(*) FROM (SELECT user_id FROM a UNION SELECT user_id FROM b)) AS union_cnt,
               TRUE AS union_contains_all,
               TRUE AS jaccard_within_10pp
    """,
    "bloom_maintenance": """
        SELECT COUNT(DISTINCT user_id) AS n_click_users,
               TRUE AS intersect_no_false_negatives,
               TRUE AS saturation_in_band,
               TRUE AS fpr_le_p,
               TRUE AS clear_threshold_behavior
        FROM events WHERE event_type = 'click'
    """,
    "quality_filter": """
        WITH q AS (
            SELECT source,
                   ROUND(
                       CASE WHEN length(text) BETWEEN 50 AND 10000 THEN 1.0 ELSE 0.5 END
                       * (0.7 * (length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))) * 1.0 / GREATEST(length(text), 1)
                          + 0.3 * (1 - (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) * 1.0 / GREATEST(length(text), 1))),
                       6) AS score
            FROM documents
        )
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN LEAST(GREATEST(score, 0), 1) >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality
        FROM q GROUP BY source
    """,
    "gaussiannb_events": """
        SELECT event_type,
               COUNT(*) AS n,
               ROUND(AVG(value), 4) AS mean_value,
               TRUE AS pred_acc_above_half_chance,
               TRUE AS mahalanobis_self_zero,
               TRUE AS parallel_merge_equals_single
        FROM events GROUP BY event_type
    """,
    "events_by_type_day": """
        SELECT event_type,
               CAST(ts AS DATE) AS day,
               COUNT(*) AS n,
               ROUND(SUM(value), 4) AS sum_value
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    """,
    "lineitem_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty,
               ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "top_users": """
        SELECT user_id, COUNT(*) AS n_events
        FROM events
        GROUP BY user_id
        ORDER BY n_events DESC, user_id ASC
        LIMIT 20
    """,
    "nation_revenue": """
        SELECT n_name,
               COUNT(*) AS n_orders,
               CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS revenue_cents
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "bloom_pruned_join": """
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events
        WHERE user_id IN (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        )
        GROUP BY user_id
    """,
    "user_sessions": """
        WITH es AS (
            -- floor to whole seconds: Spark's unix_timestamp truncates,
            -- duckdb's epoch keeps fractions
            SELECT user_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS sec
            FROM events
        ), lagged AS (
            SELECT user_id, ts, sec,
                   sec - LAG(sec) OVER (PARTITION BY user_id ORDER BY ts) AS gap
            FROM es
        ), sess AS (
            SELECT user_id, sec,
                   SUM(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS seq
            FROM lagged
        ), per AS (
            SELECT user_id, seq, CAST(COUNT(*) AS BIGINT) AS n_events,
                   MAX(sec) - MIN(sec) AS active_sec
            FROM sess GROUP BY user_id, seq
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(n_events) AS BIGINT) AS n_events,
               MAX(n_events) AS max_session_events,
               CAST(SUM(active_sec) AS BIGINT) AS total_active_sec
        FROM per GROUP BY user_id
    """,
    "exact_dedup": """
        SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    """,
    "ngram_jaccard_dups": _DUP_PAIRS_ORACLE,
    "dedup_clusters": """
        SELECT doc_id AS id, doc_id AS canonical_id
        FROM documents WHERE doc_id < 100
        UNION ALL
        SELECT doc_id + 10000 AS id, doc_id AS canonical_id
        FROM documents WHERE doc_id < 100
    """,
    "minhash_lsh_dups": _DUP_PAIRS_ORACLE,
    "simhash_dups": _DUP_PAIRS_ORACLE,
    "embedding_near_dups": """
        WITH c AS (
            SELECT vec_id, embedding FROM embeddings
            UNION ALL
            SELECT vec_id + 10000 AS vec_id, embedding FROM embeddings
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 4) AS cos
        FROM c a JOIN c b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.999
    """,
    "ann_topk": """
        WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5)
        SELECT qid, vec_id AS nid,
               ROUND(CAST(list_cosine_similarity(qe, embedding) AS DOUBLE), 4) AS cos
        FROM q, embeddings
        WHERE vec_id != qid
        QUALIFY row_number() OVER (
            PARTITION BY qid
            ORDER BY list_cosine_similarity(qe, embedding) DESC, vec_id ASC
        ) <= 5
    """,
    "lsh_ann_recall": """
        SELECT 5 AS n_queries, TRUE AS recall_ge_10pct,
               (SELECT COUNT(*) FROM embeddings) AS corpus_rows
    """,
    "ann_index_recall": """
        SELECT 5 AS n_queries,
               (SELECT COUNT(*) FROM embeddings) AS corpus_rows,
               TRUE AS ivf_fullprobe_is_exact,
               TRUE AS srp_index_matches_lsh
    """,
    "text_stats": """
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(length(trim(text)) - length(replace(trim(text), ' ', '')) + 1) AS BIGINT) AS sum_tokens,
               CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
               CAST(SUM(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) AS BIGINT) AS sum_punct,
               CAST(SUM(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))) AS BIGINT) AS sum_alpha
        FROM documents GROUP BY source
    """,
    "lang_id": """
        SELECT doc_id % 5 AS bucket,
               CASE doc_id % 5
                    WHEN 0 THEN 'en' WHEN 1 THEN 'de' WHEN 2 THEN 'es'
                    WHEN 3 THEN 'fr' ELSE 'zh' END AS pred,
               COUNT(*) AS n
        FROM documents GROUP BY 1, 2
    """,
    "fingerprint_docs": """
        SELECT COUNT(DISTINCT lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS n_distinct_texts,
               TRUE AS fp_matches_texts
        FROM documents
    """,
    "streaming_sketch_build": """
        SELECT 'hll_users_streamed' AS sketch,
               COUNT(DISTINCT user_id) AS true_distinct,
               TRUE AS multi_batch,
               TRUE AS within_2pct
        FROM events
    """,
    "streaming_dedup": """
        SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, text
        FROM documents GROUP BY text
    """,
    "streaming_heavy_hitters": """
        SELECT event_type,
               COUNT(*) AS cnt_exact,
               TRUE AS emitted_and_bracketed
        FROM events
        GROUP BY event_type
        HAVING COUNT(*) > (SELECT COUNT(*) FROM events) / 65.0
    """,
    "archbloom_fleet_merge": """
        SELECT DISTINCT user_id,
               TRUE AS fleet_read_ok,
               TRUE AS union_contains_all
        FROM events
        WHERE event_type IN ('click', 'purchase')
    """,
    "multimodal_features": """
        SELECT COUNT(*) AS n_media,
               CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
               3 AS feat_dim,
               CAST(SUM((length(text) % 50 + 1 + 6) // 7) AS BIGINT) AS n_sampled_frames,
               TRUE AS real_png_decode_ok
        FROM documents
    """,
}
