"""Pure-Catalyst bloom-family builds: the Kirsch–Mitzenmacher position
ladder, the bitmap OR, the counter add and the tick max all expressed as
declarative aggregations — **zero Python in the build dataflow**, and the
materialized kernels are **byte-identical** to the prehash kernel path
(``build_sketch(..., prehash=True)``) over the same rows.

Why this exists: the mapInArrow kernel build pays a per-stream Python/Arrow
conversion cost (~250k rows/s per worker stream, measured — see
``spark/prehash.py``) that floors single-box scaling at ~0.5 even though
the JVM half scales at ~0.9.  Expressing the whole update inside
whole-stage codegen removes that floor: the shuffle after map-side combine
carries at most *state-sized* cell rows (≤ m/64 words for bloom, ≤ m
counters for cbloom, ≤ m ticks for tdbloom), never data-sized rows.

The ANSI-mode obstacle (documented in ``spark/cms_sql.py``, which chose a
different hash family to avoid it) is solved here rather than avoided:
the KM ladder needs wrap-around uint64 arithmetic, which Spark's ANSI mode
forbids for ``+``/``*`` — but the same wrap is expressible with bitwise
ops that ANSI never checks, by splitting each 64-bit value into 32-bit
halves (:func:`_wrap_add`, :func:`_wrap_mul_const`).  A naive iterated
``g += h2`` ladder is a trap: each wrap_add references its operand twice,
so nesting doubles the expression tree per rung (2^k blowup hangs the
optimizer at k≥10, observed).  The closed form ``g_i = h1 ⊞ (i ⊠ h2)``
keeps every position expression O(1)-sized.

Hash family: ``spark/prehash.py``'s xxhash64 pair — the SAME lanes the
prehash kernel build consumes, so SQL-built and prehash-kernel-built
states merge freely (byte-identity is property-tested).  NOT compatible
with mmh3-built states or archbloom native files (use the parity path in
``spark/agg.py`` for file interop).

Reference semantics reproduced (same cell layout as the kernels):
- bloom:  bit ``pos%8`` of byte ``pos/8`` set (src/bloom.c:228-231,:299)
  — here as 64-bit words: ``groupBy(pos>>6).agg(bit_or(1<<(pos&63)))``;
- cbloom: saturating per-cell add (src/cbloom.c:419-429) — since every
  add is +1, the final counter is ``least(count(*), cap)`` per cell;
- tdbloom: freshest event-time tick per cell (src/tdbloom.c:289-306;
  event-time max — kernels/tdbloom.py) — ``groupBy(pos).agg(max(tick))``.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sketchlib.kernels.bloom import BloomFilter
from sketchlib.kernels.cbloom import CountingBloomFilter
from sketchlib.kernels.tdbloom import TdBloomFilter
from sketchlib.spark.prehash import prehash_pair
from sketchlib.specs import BloomSpec, CBloomSpec, TdBloomSpec

_M32 = 0xFFFFFFFF


def _wrap_add(a: Column, b: Column) -> Column:
    """``(a + b) mod 2^64`` on bigint columns under ANSI mode: 32-bit-half
    addition glued with shifts — every intermediate fits in int64, and the
    final ``shiftleft`` discards carry bits exactly like uint64 wrap."""
    lo = a.bitwiseAND(F.lit(_M32)) + b.bitwiseAND(F.lit(_M32))
    hi = (
        F.shiftrightunsigned(a, 32)
        + F.shiftrightunsigned(b, 32)
        + F.shiftrightunsigned(lo, 32)
    )
    return F.shiftleft(hi, 32).bitwiseOR(lo.bitwiseAND(F.lit(_M32)))


def _wrap_mul_const(h: Column, c: int) -> Column:
    """``(c * h) mod 2^64`` for a small non-negative constant (c < 2^26 so
    each 32-bit-half product stays far below int64 overflow)."""
    if not 0 <= c < (1 << 26):
        raise ValueError(f"constant multiplier out of range: {c}")
    lo = h.bitwiseAND(F.lit(_M32)) * F.lit(c)
    hi = F.shiftrightunsigned(h, 32) * F.lit(c) + F.shiftrightunsigned(lo, 32)
    return F.shiftleft(hi, 32).bitwiseOR(lo.bitwiseAND(F.lit(_M32)))


def _umod(h: Column, m: int) -> Column:
    """``u64(h) mod m`` for a bigint column reinterpreted as uint64:
    ``(pmod(h,m) + [h<0]·(2^64 mod m)) mod m``.  Needs ``2m < 2^63``."""
    if m <= 0 or m >= (1 << 62):
        raise ValueError(f"modulus out of range: {m}")
    corr = (1 << 64) % m
    return F.pmod(
        F.pmod(h, F.lit(m))
        + F.when(h < 0, F.lit(corr)).otherwise(F.lit(0)),
        F.lit(m),
    )


def km_position_cols(key, k: int, m: int) -> list[Column]:
    """The k cell positions of ``key`` in the prehash family — the exact
    integer semantics of ``mmh3.positions_from_hashes`` over
    ``prehash_pair(key)``, including the reference's ``% (2^64-1)``
    after-wrap quirk (src/mmh3.c:308-315: a wrapped value of 2^64-1 — long
    ``-1`` — maps to 0 before the modulus).  Null key → null positions.

    NOTE: each returned Column embeds the full hash tree — fine for a few
    positions in one projection, but k of them in a single generator
    expression overflows janino's method-size limit (observed at k=7 on
    the events table).  The builders/probes below use the explode-first
    shape (:func:`_lane_positions`) instead — one O(1)-sized variable-rung
    expression after exploding the rung indices; :func:`_staged_positions`
    (k aliased position columns) remains for consumers that need all k
    positions side by side on data-sized rows (spark/joins.py's scan-level
    literal probe, where an aggregation-based all-bits check would add a
    shuffle to the 100-TB fact scan)."""
    h1, h2 = prehash_pair(key)
    return [_pos_expr(h1, h2, i, m) for i in range(k)]


def _pos_expr(h1: Column, h2: Column, i: int, m: int) -> Column:
    g = h1 if i == 0 else _wrap_add(h1, _wrap_mul_const(h2, i))
    g = F.when(g == -1, F.lit(0)).otherwise(g)
    return _umod(g, m)


def _wrap_mul_col(h: Column, c: Column) -> Column:
    """``(c * h) mod 2^64`` for a small non-negative bigint COLUMN (caller
    guarantees values < 2^26 — the ladder rung index, bounded by k)."""
    lo = h.bitwiseAND(F.lit(_M32)) * c
    hi = F.shiftrightunsigned(h, 32) * c + F.shiftrightunsigned(lo, 32)
    return F.shiftleft(hi, 32).bitwiseOR(lo.bitwiseAND(F.lit(_M32)))


def _pos_expr_i(h1: Column, h2: Column, i: Column, m: int) -> Column:
    """:func:`_pos_expr` with the rung index as a COLUMN.  For i=0 the
    wrap-mul folds to 0 and the wrap-add to h1, so the result is identical
    to the constant-rung form for every i (byte-identity property-tested)."""
    g = _wrap_add(h1, _wrap_mul_col(h2, i))
    g = F.when(g == -1, F.lit(0)).otherwise(g)
    return _umod(g, m)


def _lane_positions(
    lanes: DataFrame, k: int, m: int, carry: tuple[str, ...] = ()
) -> DataFrame:
    """Hash-pair lanes ``(__h1, __h2 [+ carry])`` → ``(pos, __i [+ carry])``,
    k rows per lane — the EXPLODE-FIRST ladder: explode the k rung indices
    (a constant array literal), then evaluate ONE variable-rung position
    expression.  Exactly the same k position computations per input row as
    the k-aliased-columns shape, still plain bitwise arithmetic inside
    whole-stage codegen (no higher-order functions, no Python) — but the
    expression TREE is O(1) in k instead of O(k), so driver-side analysis,
    optimization and codegen no longer scale with the ladder height
    (measured ~2.5 s of per-query driver time for two k=20 ladders in the
    old shape at sf0.1, independent of input size)."""
    exploded = lanes.select(
        F.col("__h1"),
        F.col("__h2"),
        *[F.col(c) for c in carry],
        F.explode(F.lit(list(range(k))).cast("array<bigint>")).alias("__i"),
    )
    return exploded.select(
        _pos_expr_i(F.col("__h1"), F.col("__h2"), F.col("__i"), m).alias("pos"),
        F.col("__i"),
        *[F.col(c) for c in carry],
    )


def _probe_lanes(df: DataFrame, key) -> DataFrame:
    """Distinct non-null probe keys with their hash lanes:
    ``(__orig, __h1, __h2)`` — the shared probe-side head of the
    declarative membership/count probes."""
    orig = F.col(key) if isinstance(key, str) else key
    probes = (
        df.select(orig.alias("__orig"))
        .filter(F.col("__orig").isNotNull())
        .distinct()
    )
    h1, h2 = prehash_pair(F.col("__orig"))
    return probes.select(
        F.col("__orig"), h1.alias("__h1"), h2.alias("__h2")
    )


def _staged_positions(
    df: DataFrame, key, k: int, m: int, extra: dict[str, Column] | None = None
) -> DataFrame:
    """``df`` → columns ``__p0..__p{k-1}`` (+ ``extra``), computed through
    two aliased projections (hash pair, then positions).  The aliases are
    load-bearing: CollapseProject keeps multi-referenced non-cheap aliases
    as their own codegen locals, so h1/h2 are hashed once per row and each
    position tree is emitted once — without them the inlined generator
    expression blows past janino's 64KB method limit and whole-stage
    codegen fails (observed; the interpreted fallback is ~10x slower)."""
    extra = extra or {}
    h1, h2 = prehash_pair(key)
    staged = df.select(
        h1.alias("__h1"),
        h2.alias("__h2"),
        *[c.alias(name) for name, c in extra.items()],
    )
    # stage the wrapped ladder value g_i separately from the -1-quirk +
    # modulus: umod/when reference their argument 2x each, so inlining
    # makes every position embed ~4 copies of the wrap-add tree — staging
    # g_i keeps each projection's trees ~3x smaller (driver-side analysis
    # is linear in total nodes; runtime codegen is identical since
    # CollapseProject keeps multi-referenced non-cheap aliases as locals)
    g_staged = staged.select(
        *[
            (
                F.col("__h1")
                if i == 0
                else _wrap_add(F.col("__h1"), _wrap_mul_const(F.col("__h2"), i))
            ).alias(f"__g{i}")
            for i in range(k)
        ],
        *[F.col(name) for name in extra],
    )

    def _quirk_mod(g: Column) -> Column:
        return _umod(F.when(g == -1, F.lit(0)).otherwise(g), m)

    return g_staged.select(
        *[_quirk_mod(F.col(f"__g{i}")).alias(f"__p{i}") for i in range(k)],
        *[F.col(name) for name in extra],
    )


# ---------------------------------------------------------------------------
# bloom
# ---------------------------------------------------------------------------

def bloom_word_rows(
    df: DataFrame, spec: BloomSpec, key, prereduce: bool = False
) -> DataFrame:
    """The aggregated bitmap as 64-bit words ``(w bigint, word bigint)`` —
    at most ``ceil(m/64)`` rows regardless of input size (map-side combine
    runs inside whole-stage codegen).  Word w's little-endian bytes are
    bytes ``8w..8w+7`` of the kernel bitmap, bit ``pos&63`` of the word is
    bit ``pos&7`` of byte ``pos>>3`` — the exact kernel layout.

    The explode is over a PRIMITIVE long array (positions), with word/mask
    derived post-explode: primitive arrays stay unboxed in UnsafeArrayData,
    while an array<struct> explode allocates a generic row per entry
    (measured ~25% slower here and pathologically slow when many such
    arrays are concatenated).

    ``prereduce=True`` dedupes the hash pair before the explode×k (set
    bits are idempotent — presence is the per-key sufficient statistic),
    so the explode runs over #distinct-keys rows instead of #rows.
    Opt-in: for near-unique keys the dedupe map would be data-sized."""
    h1, h2 = prehash_pair(key)
    lanes = (
        df.select(h1.alias("__h1"), h2.alias("__h2"))
        .filter(F.col("__h1").isNotNull())
    )
    if prereduce:
        lanes = lanes.distinct()
    pos = _lane_positions(lanes, spec.k, spec.m)
    return (
        pos.select(
            F.shiftrightunsigned("pos", 6).alias("w"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("bigint"),
                F.col("pos").bitwiseAND(F.lit(63)).cast("int"),
            ).alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("word"))
    )


def _words_to_bits(rows, nbytes: int) -> np.ndarray:
    nwords = (nbytes + 7) // 8
    words = np.zeros(nwords, dtype=np.int64)
    if rows:
        words[np.array([r[0] for r in rows], dtype=np.int64)] = np.array(
            [r[1] for r in rows], dtype=np.int64
        )
    return words.astype("<i8").view(np.uint8)[:nbytes].copy()


def build_bloom_sql(
    df: DataFrame, spec: BloomSpec, key, prereduce: bool = False
) -> BloomFilter:
    """Build a prehash-family Bloom filter with zero Python in the build
    dataflow.  Byte-identical to ``build_sketch(df, spec, key=key,
    prehash=True)`` over the same rows (property-tested), so the result
    merges freely with prehash kernel builds and probes with
    ``probe_column(..., prehash=True)``."""
    rows = [
        (r["w"], r["word"])
        for r in bloom_word_rows(df, spec, key, prereduce=prereduce).collect()
    ]
    return BloomFilter(spec, _words_to_bits(rows, spec.nbytes))


def bloom_sql_members(
    words: DataFrame, df: DataFrame, spec: BloomSpec, key, result_col: str = "member"
) -> DataFrame:
    """Declarative membership probe: re-derives each distinct probe key's
    k (word, mask) cells with the same expressions and broadcast-joins them
    against the word frame — member iff every mask's bits are present.
    Entirely JVM-side; missing words count as 0 (untouched bitmap).
    Returns ``(<key>, result_col bool)`` with the key column in the
    caller's ORIGINAL type (the hash lane string-casts internally, but the
    returned values are the uncast originals, so joining the result back
    against the source column needs no coercion)."""
    pos = _lane_positions(_probe_lanes(df, key), spec.k, spec.m, carry=("__orig",))
    probed = pos.select(
        "__orig",
        F.shiftrightunsigned("pos", 6).alias("w"),
        F.call_function(
            "shiftleft",
            F.lit(1).cast("bigint"),
            F.col("pos").bitwiseAND(F.lit(63)).cast("int"),
        ).alias("mask"),
    )
    hit = F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("mask")) == F.col("mask")
    return (
        probed.join(F.broadcast(words), "w", "left")
        .groupBy("__orig")
        .agg((F.min(hit.cast("int")) == 1).alias(result_col))
        .withColumnRenamed("__orig", key if isinstance(key, str) else "key")
    )


# ---------------------------------------------------------------------------
# cbloom
# ---------------------------------------------------------------------------

def cbloom_cell_rows(
    df: DataFrame, spec: CBloomSpec, key, prereduce: bool = False
) -> DataFrame:
    """Aggregated counters ``(pos bigint, cnt bigint)`` — ≤ m rows, counts
    saturated at the spec's counter cap (sequential saturating +1 adds end
    at ``min(total, cap)``, so the declarative form is exact).

    ``prereduce=True`` aggregates the per-key add count over the hash pair
    before the explode×k (suite_sql.py's low_cardinality trick; saturating
    +1 adds compose as ``least(sum, cap)`` through the key level), so the
    explode runs over #distinct-keys rows instead of #rows.  Opt-in: wrong
    choice for near-unique keys."""
    h1, h2 = prehash_pair(key)
    lanes = df.select(h1.alias("__h1"), h2.alias("__h2")).filter(
        F.col("__h1").isNotNull()
    )
    if prereduce:
        lanes = lanes.groupBy("__h1", "__h2").agg(F.count(F.lit(1)).alias("__w"))
    else:
        lanes = lanes.withColumn("__w", F.lit(1).cast("bigint"))
    return (
        _lane_positions(lanes, spec.k, spec.m, carry=("__w",))
        .groupBy("pos")
        .agg(F.least(F.sum("__w"), F.lit(spec.cap)).alias("cnt"))
    )


def cbloom_from_cells(cells: DataFrame, spec: CBloomSpec) -> CountingBloomFilter:
    """Materialize a :class:`CountingBloomFilter` kernel from an
    already-built cell frame (:func:`cbloom_cell_rows`) — a state-sized
    collect, no second pass over the input."""
    rows = cells.collect()
    counters = np.zeros(spec.m, dtype=spec.dtype)
    if rows:
        counters[np.array([r["pos"] for r in rows], dtype=np.int64)] = np.array(
            [r["cnt"] for r in rows], dtype=np.uint64
        ).astype(spec.dtype)
    return CountingBloomFilter(spec, counters)


def build_cbloom_sql(
    df: DataFrame, spec: CBloomSpec, key, prereduce: bool = False
) -> CountingBloomFilter:
    """Prehash-family counting Bloom, zero Python in the build dataflow;
    byte-identical to the prehash kernel build for +1 add streams."""
    return cbloom_from_cells(cbloom_cell_rows(df, spec, key, prereduce=prereduce), spec)


def cbloom_sql_counts(
    cells: DataFrame, df: DataFrame, spec: CBloomSpec, key, result_col: str = "cnt"
) -> DataFrame:
    """Declarative min-of-k point counts (cbloom_count, src/cbloom.c:487-504
    semantics: never undercounts) — broadcast-join the probe keys' cells
    against the counter frame; absent cells count 0.  The returned key
    column keeps the caller's original (uncast) values."""
    probed = _lane_positions(
        _probe_lanes(df, key), spec.k, spec.m, carry=("__orig",)
    ).select("__orig", "pos")
    return (
        probed.join(F.broadcast(cells), "pos", "left")
        .withColumn("c", F.coalesce(F.col("cnt"), F.lit(0)))
        .groupBy("__orig")
        .agg(F.min("c").alias(result_col))
        .withColumnRenamed("__orig", key if isinstance(key, str) else "key")
    )


# ---------------------------------------------------------------------------
# tdbloom
# ---------------------------------------------------------------------------

def _tick_col(spec: TdBloomSpec, ts) -> Column:
    """1-based event-time tick (kernels/tdbloom.py::_stamp): ``(unix(ts) -
    start_time) + 1``.  Caller contract (same as the kernel, which raises):
    ts ≥ spec.start_time — violations are caught at materialization."""
    t = F.col(ts) if isinstance(ts, str) else ts
    return (F.unix_timestamp(t) - F.lit(spec.start_time) + F.lit(1)).cast("bigint")


def tdbloom_cell_rows(
    df: DataFrame, spec: TdBloomSpec, key, ts: str = "ts", prereduce: bool = False
) -> DataFrame:
    """Aggregated ticks ``(pos bigint, tick bigint)`` — ≤ m rows, freshest
    (max) event-time tick per cell, exactly the kernel's ``np.maximum.at``.

    ``prereduce=True`` aggregates the per-key max tick over the hash pair
    before the explode×k (max is associative through the key level), so
    the explode runs over #distinct-keys rows instead of #rows.  Opt-in:
    wrong choice for near-unique keys."""
    h1, h2 = prehash_pair(key)
    lanes = (
        df.select(
            h1.alias("__h1"), h2.alias("__h2"), _tick_col(spec, ts).alias("__t")
        )
        .filter(F.col("__h1").isNotNull() & F.col("__t").isNotNull())
    )
    if prereduce:
        lanes = lanes.groupBy("__h1", "__h2").agg(F.max("__t").alias("__t"))
    return (
        _lane_positions(lanes, spec.k, spec.m, carry=("__t",))
        .groupBy("pos")
        .agg(F.max("__t").alias("tick"))
    )


def build_tdbloom_sql(
    df: DataFrame, spec: TdBloomSpec, key, ts: str = "ts", prereduce: bool = False
) -> TdBloomFilter:
    """Prehash-family time-decaying Bloom, zero Python in the build
    dataflow; byte-identical to the prehash kernel build."""
    rows = tdbloom_cell_rows(df, spec, key, ts, prereduce=prereduce).collect()
    if rows:
        ticks_arr = np.array([r["tick"] for r in rows], dtype=np.int64)
        if ticks_arr.min() < 1:
            raise ValueError("ts earlier than spec.start_time")
        if ticks_arr.max() >= 2**31:
            raise ValueError("ts span exceeds int32 ticks (>68 years)")
    ticks = np.zeros(spec.m, dtype=np.int32)
    if rows:
        ticks[np.array([r["pos"] for r in rows], dtype=np.int64)] = ticks_arr.astype(
            np.int32
        )
    return TdBloomFilter(spec, ticks)


def tdbloom_sql_members(
    cells: DataFrame,
    spec: TdBloomSpec,
    df: DataFrame,
    key,
    as_of: int,
    result_col: str = "member",
) -> DataFrame:
    """Declarative as-of membership probe against a tdbloom cell frame:
    re-derive each distinct probe key's k cells, broadcast-join the tick
    frame, member iff every cell is stamped AND fresh within ``timeout``
    as of ``as_of`` (kernels/tdbloom.py::contains semantics, including the
    whole-filter age guard src/tdbloom.c:342: past ``max_time`` everything
    reads absent).  Missing cells count 0 (never stamped).  Returns the
    caller's original key values."""
    T = int(as_of) - spec.start_time
    orig = F.col(key) if isinstance(key, str) else key
    if T > spec.max_time:
        probes = (
            df.select(orig.alias("__orig"))
            .filter(F.col("__orig").isNotNull())
            .distinct()
        )
        return probes.select(
            F.col("__orig").alias(key if isinstance(key, str) else "key"),
            F.lit(False).alias(result_col),
        )
    probed = _lane_positions(
        _probe_lanes(df, key), spec.k, spec.m, carry=("__orig",)
    ).select("__orig", "pos")
    tick = F.coalesce(F.col("tick"), F.lit(0))
    age = F.lit(T) - (tick - F.lit(1))
    live = (tick > 0) & (age >= 0) & (age <= F.lit(spec.timeout))
    return (
        probed.join(F.broadcast(cells), "pos", "left")
        .groupBy("__orig")
        .agg((F.min(live.cast("int")) == 1).alias(result_col))
        .withColumnRenamed("__orig", key if isinstance(key, str) else "key")
    )


# ---------------------------------------------------------------------------
# tdcbloom
# ---------------------------------------------------------------------------

def tdcbloom_cell_rows(
    df: DataFrame, spec, key, ts: str = "ts", prereduce: bool = False
) -> DataFrame:
    """Aggregated SoA cells ``(pos, cnt, tick)`` — the saturating counter
    is ``least(count, cap)`` (add-only streams) and the tick is the
    freshest event-time stamp, exactly kernels/tdcbloom.py::update_hashes
    (``_scatter_sat_add`` + ``np.maximum.at``).

    ``prereduce=True`` turns on a key-level pre-reduction before the
    explode×k (the suite_sql.py low_cardinality trick): the per-key
    sufficient statistic (add count, max tick) is aggregated over the
    hash pair first, so the explode runs over #distinct-keys rows instead
    of #rows.  Saturating +1 adds compose as ``least(sum, cap)``, so the
    final cells are identical (property-tested).  Opt-in: for near-unique
    keys the pre-reduction map would be data-sized."""
    h1, h2 = prehash_pair(key)
    lanes = (
        df.select(h1.alias("__h1"), h2.alias("__h2"), _tick_col(spec, ts).alias("__t"))
        .filter(F.col("__h1").isNotNull() & F.col("__t").isNotNull())
    )
    if prereduce:
        lanes = lanes.groupBy("__h1", "__h2").agg(
            F.max("__t").alias("__t"),
            F.count(F.lit(1)).alias("__w"),
        )
    else:
        lanes = lanes.withColumn("__w", F.lit(1).cast("bigint"))
    return tdcbloom_cells_from_lanes(lanes, spec)


def tdcbloom_cells_from_lanes(lanes: DataFrame, spec) -> DataFrame:
    """Cell frame from pre-computed lanes ``(__h1, __h2, __t, __w)`` —
    for callers that already hold a per-key sufficient-statistic frame
    (add count, max tick per hash pair; e.g. a groupBy(key) carrier the
    query needs anyway), so the cell build costs no extra pass over the
    data.  Identical cells to :func:`tdcbloom_cell_rows`: per-pos weights
    sum and ticks max across lanes, so duplicate hash pairs (including
    colliding keys) fold exactly as the kernel folds them."""
    return (
        _lane_positions(lanes, spec.k, spec.m, carry=("__t", "__w"))
        .groupBy("pos")
        .agg(
            F.least(F.sum("__w"), F.lit(spec.cap)).alias("cnt"),
            F.max("__t").alias("tick"),
        )
    )


def tdcbloom_sql_counts(
    cells: DataFrame,
    spec,
    df: DataFrame,
    key,
    as_of: int,
    result_col: str = "cnt",
) -> DataFrame:
    """Declarative windowed min-of-k point counts against a tdcbloom cell
    frame — the composition of :func:`cbloom_sql_counts`'s min-of-k with
    :func:`tdbloom_sql_members`'s per-cell freshness: count = min counter
    over the key's k cells if EVERY cell is stamped and fresh within
    ``timeout`` as of ``as_of``, else 0 (tdcbloom_count,
    src/tdcbloom.c:775-806 / kernels/tdcbloom.py::count — which applies no
    whole-filter age guard, unlike tdbloom_lookup).  Broadcast join, zero
    Python; missing cells read (cnt=0, tick=0) = never stamped.  Returns
    the caller's original (uncast) key values."""
    T = int(as_of) - spec.start_time
    probed = _lane_positions(
        _probe_lanes(df, key), spec.k, spec.m, carry=("__orig",)
    ).select("__orig", "pos")
    cnt = F.coalesce(F.col("cnt"), F.lit(0))
    tick = F.coalesce(F.col("tick"), F.lit(0))
    age = F.lit(T) - (tick - F.lit(1))
    fresh = (tick > 0) & (age >= 0) & (age <= F.lit(spec.timeout))
    return (
        probed.join(F.broadcast(cells), "pos", "left")
        .groupBy("__orig")
        .agg(
            F.min(cnt).alias("__mn"),
            (F.min(fresh.cast("int")) == 1).alias("__all_fresh"),
        )
        .select(
            F.col("__orig").alias(key if isinstance(key, str) else "key"),
            F.when(F.col("__all_fresh"), F.col("__mn"))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias(result_col),
        )
    )


def tdcbloom_from_cells(cells: DataFrame, spec):
    """Materialize a :class:`TdCBloomFilter` kernel from an already-built
    cell frame (:func:`tdcbloom_cell_rows`) — a state-sized collect, no
    second pass over the input.  Byte-identical to the prehash kernel
    build (property-tested in tests/test_bloom_sql.py)."""
    from sketchlib.kernels import TdCBloomFilter

    rows = cells.collect()
    if rows:
        ticks_arr = np.array([r["tick"] for r in rows], dtype=np.int64)
        if ticks_arr.min() < 1:
            raise ValueError("ts earlier than spec.start_time")
        if ticks_arr.max() >= 2**31:
            raise ValueError("ts span exceeds int32 ticks (>68 years)")
    counters = np.zeros(spec.m, dtype=spec.counter_np_dtype)
    ticks = np.zeros(spec.m, dtype=np.int32)
    if rows:
        idx = np.array([r["pos"] for r in rows], dtype=np.int64)
        counters[idx] = np.array([r["cnt"] for r in rows], dtype=np.uint64).astype(
            spec.counter_np_dtype
        )
        ticks[idx] = ticks_arr.astype(np.int32)
    return TdCBloomFilter(spec, counters, ticks)


def build_tdcbloom_sql(df: DataFrame, spec, key, ts: str = "ts", prereduce: bool = False):
    """Prehash-family time-decaying counting Bloom, zero Python in the
    build dataflow; byte-identical to the prehash kernel build."""
    return tdcbloom_from_cells(
        tdcbloom_cell_rows(df, spec, key, ts, prereduce=prereduce), spec
    )
