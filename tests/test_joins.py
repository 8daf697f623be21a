"""Bloom-pruned joins: exactness vs the plain join, no-shuffle probe plan,
and prune effectiveness."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sketchlib.spark import get_spark
from sketchlib.spark.joins import bloom_prune, bloom_pruned_join
from sketchlib.specs import BloomSpec

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    yield get_spark("join-tests", cpus=4, shuffle_partitions=4)


@pytest.fixture(scope="module")
def tables(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    # dim = the purchase users (a sliver of all users)
    dim = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
    )
    return events, dim


def test_pruned_join_equals_plain_join(spark, tables):
    events, dim = tables
    plain = events.join(dim, "user_id", "inner")
    pruned = bloom_pruned_join(events, dim, "user_id", p=0.01)
    assert pruned.count() == plain.count()
    a = {tuple(r) for r in plain.select("user_id", "ts").collect()}
    b = {tuple(r) for r in pruned.select("user_id", "ts").collect()}
    assert a == b


def test_prune_drops_most_nonmembers_never_members(spark, tables):
    events, dim = tables
    spec = BloomSpec(10_000, 0.001)
    member_rows = events.join(dim, "user_id", "leftsemi").count()
    kept = bloom_prune(events, "user_id", spec, build_from=dim)
    n_kept = kept.count()
    total = events.count()
    assert n_kept >= member_rows, "no member row may be pruned"
    # FP rows ≈ p · non-members; allow 10x headroom over p=0.001
    assert n_kept - member_rows <= max(0.01 * (total - member_rows), 5)


def test_prune_is_shuffle_free_and_python_free(spark, tables):
    events, dim = tables
    spec = BloomSpec(10_000, 0.001)
    kept = bloom_prune(events, "user_id", spec, build_from=dim)
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "the probe side must not shuffle"
    assert "Python" not in plan and "ArrowEval" not in plan
    assert "*(" in plan, "whole-stage codegen marker missing"


def test_prune_null_keys_dropped(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("b",)], "user_id string"
    )
    dim = spark.createDataFrame([("a",)], "user_id string")
    spec = BloomSpec(100, 0.001)
    got = [
        r["user_id"]
        for r in bloom_prune(df, "user_id", spec, build_from=dim).collect()
    ]
    assert got == ["a"]


def test_large_bitmap_fallback_matches_literal_path(spark, tables, monkeypatch):
    """Past the literal-size cap the prune routes through the single-pass
    broadcast word-frame probe — same surviving keys, and the plan shows
    ONE scan of the fact side, no shuffle, no Python, and the k word-frame
    broadcasts collapsing into ReusedExchange."""
    from sketchlib.spark import joins

    events, dim = tables
    spec = BloomSpec(10_000, 0.001)
    lit_keys = {
        r["user_id"]
        for r in bloom_prune(events, "user_id", spec, build_from=dim)
        .select("user_id").distinct().collect()
    }
    monkeypatch.setattr(joins, "LITERAL_BITMAP_MAX_BYTES", 1)
    fb = joins.bloom_prune(events, "user_id", spec, build_from=dim)
    fb_keys = {r["user_id"] for r in fb.select("user_id").distinct().collect()}
    assert fb_keys == lit_keys
    # plan shape on the executed frame itself (AQE reuse is runtime-only)
    fb.collect()
    plan = fb._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 2, "one fact scan + one dim scan"
    # the only shuffles are dim-side state-sized ones (distinct + groupBy w);
    # the fact side must not shuffle
    assert final.count("Exchange hashpartitioning") <= 2
    assert "Python" not in final and "ArrowEval" not in final
    # k word-frame broadcasts collapse to ONE live exchange + k-1 reuses
    assert final.count("ReusedExchange") == spec.k - 1


def test_large_bitmap_fallback_column_key(spark, tables, monkeypatch):
    """The fallback must accept a Column expression key (ADVICE r4: the old
    semi-join fallback renamed the probe column to the literal name 'key'
    and raised unless df happened to have one)."""
    from sketchlib.spark import joins

    events, dim = tables
    spec = BloomSpec(10_000, 0.001)
    key_expr = F.upper(F.col("user_id"))
    dim_up = dim.select(F.upper("user_id").alias("user_id"))
    lit = joins.bloom_prune(events, key_expr, spec, build_from=dim_up).count()
    monkeypatch.setattr(joins, "LITERAL_BITMAP_MAX_BYTES", 1)
    fb = joins.bloom_prune(events, key_expr, spec, build_from=dim_up).count()
    assert fb == lit


def test_large_bitmap_fallback_w_word_columns(spark, tables, monkeypatch):
    """A fact table whose OWN columns are named ``w``/``word`` (the word
    frame's names) must prune identically through the fallback — the
    broadcast frame's columns are renamed to reserved dunder names, so
    the k mask references can never become ambiguous."""
    from sketchlib.spark import joins

    events, dim = tables
    clash = events.select(
        "user_id", F.lit(7).alias("w"), F.lit("x").alias("word")
    )
    spec = BloomSpec(10_000, 0.001)
    lit_rows = joins.bloom_prune(clash, "user_id", spec, build_from=dim).count()
    monkeypatch.setattr(joins, "LITERAL_BITMAP_MAX_BYTES", 1)
    fb = joins.bloom_prune(clash, "user_id", spec, build_from=dim)
    assert fb.columns == ["user_id", "w", "word"]
    assert fb.count() == lit_rows

def test_probe_stays_compiled_no_janino_overflow():
    """Regression: a filter/join-key conjunction of k full position trees
    blows janino's 64 KB method limit at k>=4, and Spark then silently
    runs the probe stage INTERPRETED, re-attempting the failed compile on
    every execution (~10x slower per row at scale).  The fix is the
    projected-bit-fields + observe()-barrier shape (joins._filter_all_bits).
    The fallback is invisible in results — only the JVM's stderr shows it —
    so probe both paths at k=11 in a fresh JVM and assert the compiler
    never overflowed."""
    import subprocess
    import sys
    import textwrap

    code = textwrap.dedent(
        """
        from pyspark.sql import functions as F
        from sketchlib.spark import get_spark, joins
        from sketchlib.specs import BloomSpec
        spark = get_spark("janino-probe", cpus=2, shuffle_partitions=2)
        events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        dim = (
            events.filter(F.col("event_type") == "purchase")
            .select("user_id").distinct()
        )
        spec = BloomSpec(10_000, 0.0005)
        assert spec.k >= 9, spec.k
        n_lit = joins.bloom_prune(events, "user_id", spec, build_from=dim).count()
        joins.LITERAL_BITMAP_MAX_BYTES = 1  # force the broadcast-words path
        n_fb = joins.bloom_prune(events, "user_id", spec, build_from=dim).count()
        assert n_lit == n_fb > 0, (n_lit, n_fb)
        print("ROWS", n_lit)
        """
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "grows beyond 64 KB" not in r.stderr, (
        "probe plan fell back to interpreted execution (janino overflow)"
    )
    assert "ROWS" in r.stdout
