"""Sketch-accelerated join pruning — a Bloom runtime filter as a user-level
operator.

The classic 100-TB join problem: ``fact ⋈ dim`` shuffles the WHOLE fact
table even when only a sliver of its keys exist in ``dim``.  Engines solve
it with runtime bloom filters (Spark's own
``spark.sql.optimizer.runtime.bloomFilter`` does this internally for some
shapes); archbloom's whole reason to exist is that same filter as a
user-visible object.  This module closes the loop: build the declarative
bitmap from the dim side (``bloom_sql.bloom_word_rows`` — pure Catalyst),
embed it as ONE array<bigint> literal in the fact side's scan filter, and
let the join see only surviving rows.

The probe is zero-shuffle and zero-Python: the k Kirsch–Mitzenmacher
positions are codegen expressions (the same ladder the builds use), and
the bitmap is a constant array — ``element_at(<literal>, pos>>6) & mask``
runs inside WholeStageCodegen in the scan's task pipeline, so the prune
happens before the exchange (each bit test is its own projected field
with an observe() barrier before the filter — see ``_filter_all_bits``
for why that shape is required to stay compiled).  False positives pass
the prune and are then removed by the real join — ``bloom_pruned_join``
is EXACTLY a plain inner join, just cheaper: the shuffle carries
~(selectivity + p) of the fact table instead of all of it.

Memory shape: the literal holds m/64 longs (spec.nbytes bytes — e.g. 1.2 MB
at n=1M, p=1%); it ships once per task closure like any broadcast.  Size
the spec for the DIM side (the small relation), never the fact side.
"""

from __future__ import annotations

import itertools

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sketchlib.spark.bloom_sql import _staged_positions, bloom_word_rows
from sketchlib.specs import BloomSpec


def dense_words(words: DataFrame, spec: BloomSpec) -> list[int]:
    """Word-row frame → dense ``m/64`` signed-int64 list (index = word w).
    Driver-side but state-sized: ≤ m/64 rows regardless of input rows."""
    n_words = (spec.m + 63) // 64
    dense = np.zeros(n_words, dtype=np.int64)
    for r in words.collect():
        dense[r["w"]] = r["word"]
    return [int(x) for x in dense]


def _words_literal(dense: list[int]) -> Column:
    """The bitmap as one array<bigint> literal column (a single Literal
    node — NOT ``F.array`` of m/64 child literals, which would bloat the
    plan tree and break codegen)."""
    return F.lit(dense)


#: above this bitmap size the literal leaves the plan and the probe routes
#: through the broadcast word-frame join instead (a multi-MB literal would
#: be re-serialized into every stage's task binary and logged plan)
LITERAL_BITMAP_MAX_BYTES = 8 << 20


def bloom_prune(
    df: DataFrame,
    key,
    spec: BloomSpec,
    words: DataFrame | None = None,
    build_from: DataFrame | None = None,
) -> DataFrame:
    """Filter ``df`` to rows whose ``key`` is (probably) in the Bloom
    filter described by ``words`` (a ``bloom_word_rows`` frame) or built
    here from ``build_from``.  Null keys are dropped — this operator
    exists to pre-prune INNER/SEMI joins, which drop them anyway; do not
    use it ahead of outer joins.  False-positive rows (≈ p) survive; no
    true key is ever dropped.

    Bitmaps ≤ :data:`LITERAL_BITMAP_MAX_BYTES` probe as a scan-level
    array literal (zero shuffle); larger ones fall back to a SINGLE-PASS
    probe that left-joins the broadcast word frame once per hash position
    (k broadcast hash joins, one scan of ``df``, no distinct/semi-join
    second pass — the k exchanges canonicalize identically so Spark
    reuses ONE broadcast).  For filters too big to broadcast at all,
    use the key-routed ``probe_join.probe_sharded`` path instead."""
    if words is None:
        if build_from is None:
            raise ValueError("bloom_prune needs either words or build_from")
        words = bloom_word_rows(build_from, spec, key)
    if spec.nbytes > LITERAL_BITMAP_MAX_BYTES:
        return _prune_via_broadcast_words(df, key, spec, words)
    arr = _words_literal(dense_words(words, spec))

    staged = _staged_positions(
        df, F.col(key) if isinstance(key, str) else key, spec.k, spec.m,
        extra={c: F.col(c) for c in df.columns},
    )
    bits = []
    for i in range(spec.k):
        p = F.col(f"__p{i}")
        word = F.element_at(arr, (F.shiftrightunsigned(p, 6) + 1).cast("int"))
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("bigint"),
            p.bitwiseAND(F.lit(63)).cast("int"),
        )
        bits.append((word.bitwiseAND(mask) != 0).alias(f"__b{i}"))
    # Null keys → null __b{i} → NULL conjunction → filter drops (the
    # documented null semantics).
    return _filter_all_bits(
        staged.select(*df.columns, *bits), spec.k, df.columns, "literal"
    )


def _prune_via_broadcast_words(
    df: DataFrame, key, spec: BloomSpec, words: DataFrame
) -> DataFrame:
    """Large-bitmap fallback: probe ``df``'s own rows against the broadcast
    word frame, one LEFT broadcast-hash-join per hash position — member iff
    every position's word has its mask bit.  One scan of ``df``, zero
    shuffle on the fact side, and the k word-frame exchanges canonicalize
    to the same plan so only ONE broadcast actually ships (ReusedExchange,
    plan-asserted in tests).  Works for Column keys as well as names —
    nothing is renamed on ``df``."""
    staged = _staged_positions(
        df, F.col(key) if isinstance(key, str) else key, spec.k, spec.m,
        extra={c: F.col(c) for c in df.columns},
    )
    # observe() barrier: without it the optimizer substitutes the __p{i}
    # aliases into the k join keys and the joint codegen method blows the
    # janino 64 KB limit (see _filter_all_bits) — with it the joins key on
    # bare attribute refs
    staged = staged.observe(
        f"bloom_prune_words_{next(_PRUNE_SEQ)}",
        F.count(F.lit(1)).alias("rows_probed"),
    )
    # reserved dunder names so a fact table that itself has `w`/`word`
    # columns can't make the mask references ambiguous (same convention
    # as the __p{i}/__h1 staging columns); the rename is ONE projection
    # shared by all k joins, so the plans still canonicalize identically
    wf = words.select(
        F.col("w").alias("__bw_w"), F.col("word").alias("__bw_word")
    )
    keep = None
    for i in range(spec.k):
        p = F.col(f"__p{i}")
        # the SAME words plan each time (only a SubqueryAlias differs,
        # which canonicalization strips) — the k BroadcastExchanges
        # collapse into one broadcast + (k-1) ReusedExchange
        w_i = wf.alias(f"__bw{i}")
        staged = staged.join(
            F.broadcast(w_i),
            F.shiftrightunsigned(p, 6) == F.col(f"__bw{i}.__bw_w"),
            "left",
        )
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("bigint"),
            p.bitwiseAND(F.lit(63)).cast("int"),
        )
        cond = (
            F.coalesce(F.col(f"__bw{i}.__bw_word"), F.lit(0)).bitwiseAND(mask)
            != 0
        )
        keep = cond if keep is None else (keep & cond)
    return staged.filter(keep).select(*df.columns)


#: per-process counter for unique observe() names (Spark requires metric
#: names to be unique within one query, and bloom_prune may appear several
#: times in a plan)
_PRUNE_SEQ = itertools.count()


def _filter_all_bits(
    flagged: DataFrame, k: int, out_cols: list[str], tag: str
) -> DataFrame:
    """``flagged`` (payload + ``__b0..__b{k-1}`` booleans) → rows where all
    k bits are set, projected back to ``out_cols``.

    The two-step shape — bit tests as their OWN projected fields, then a
    filter on the bare attribute refs — is load-bearing for codegen:
    ProjectExec splits each field into its own generated method, while a
    Filter condition (or join key) is always emitted inline into ONE
    method, so the earlier k-way conjunction of full position trees blew
    janino's 64 KB method limit at k=4+ and silently ran the whole probe
    stage INTERPRETED (re-attempting the failed compile on every
    execution — measured ~2 s/run at sf0.1, ~10x slower per row at scale;
    HOF forall() is no better, higher-order functions are
    CodegenFallback).  The ``observe`` between them is a predicate-
    pushdown barrier: without it the optimizer substitutes the ``__b{i}``
    aliases back into the filter condition and re-creates the giant
    method.  It also reports ``rows_probed`` per probe as a free metric
    (query lineage).  The filter still runs in the same task pipeline,
    before any exchange — nothing about the prune's plan position
    changes."""
    flagged = flagged.observe(
        f"bloom_prune_{tag}_{next(_PRUNE_SEQ)}",
        F.count(F.lit(1)).alias("rows_probed"),
    )
    keep = F.col("__b0")
    for i in range(1, k):
        keep = keep & F.col(f"__b{i}")
    return flagged.filter(keep).select(*out_cols)


def bloom_pruned_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    spec: BloomSpec | None = None,
    expected: int | None = None,
    p: float = 0.001,
) -> DataFrame:
    """``big ⋈ small`` (inner, equi on ``on``) with the big side pre-pruned
    by a Bloom filter of the small side's keys.  Result rows are EXACTLY
    the plain join's (FPs fall out in the join); the exchange under the
    join carries only surviving big-side rows.

    ``spec`` defaults to ``BloomSpec(expected, p)``; ``expected`` defaults
    to ``small.count()`` (one extra cheap job — pass it if you know it)."""
    if spec is None:
        if expected is None:
            expected = small.count()
        spec = BloomSpec(max(int(expected), 1), p)
    pruned = bloom_prune(big, on, spec, build_from=small)
    return pruned.join(small, on, "inner")
