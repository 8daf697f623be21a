"""JVM-side pre-hashing: the 100-TB fast path for sketch builds and probes.

The mmh3-parity path ships the raw key bytes (often the full ``text``
column) across the JVM→Python Arrow boundary and hashes them in numpy —
bit-compatible with the reference's files (``formats.py``) but it pays for
moving strings and for Python-side hashing.  At cluster scale neither is
necessary: every kernel in the bloom family consumes only a 64-bit hash
pair (Kirsch–Mitzenmacher, src/mmh3.c:308-315 — any uniform 64-bit family
keeps the published FPR/ε/±2% bounds), so the hashes can be computed inside
whole-stage codegen with ``xxhash64`` and only two int64 columns cross to
Python.

Measured (interleaved min-of-N on the shared bench box, 5-sketch suite):
the Python kernel loop is **2.2×** cheaper (0.179 s vs 0.386 s per 400k
rows, isolated) and the crossing moves ~24× fewer bytes; end-to-end on
one box both modes land within noise (~5.0 vs 5.3 s at 9M rows) because
the per-stream Arrow conversion machinery (~250k rows/s per worker
stream, insensitive to byte width and batch size) floors both — a
per-executor cost that scales out with cluster width, which is where the
kernel/crossing savings surface.  Under high fan-out memory pressure the
slimmer mode degrades far less (9.1 s vs 22.3 s at 24 partials / 9M
rows).

Trade-off (documented, opt-in): a prehashed sketch is NOT bit-compatible
with mmh3-built states or archbloom native files — it is its own hash
family.  ``spec.seed`` is ignored (the family is fixed by xxhash64's seed
and :data:`PREHASH_SALT`); two prehashed sketches over the same key column
therefore share hash positions.  Merges remain byte-identical across
orders; probes must also be prehashed (``probe.probe_column(...,
prehash=True)`` uses these same expressions, so build and probe can never
disagree).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Salt for the second Kirsch-Mitzenmacher lane: h2 = xxhash64(key, SALT).
# Any fixed constant works; this one is floor(2^64/phi) = 0x9E3779B97F4A7C15
# (the 64-bit golden-ratio constant) reinterpreted as a signed int64,
# chosen once and shared by build + probe.
PREHASH_SALT = -7046029254386353131
assert PREHASH_SALT == 0x9E3779B97F4A7C15 - (1 << 64)


def _as_col(key) -> Column:
    return (F.col(key) if isinstance(key, str) else key).cast("string")


def prehash_lane_sql(col: str) -> tuple[str, str]:
    """The exact SQL text of the two prehash lanes for a column — use these
    in hand-written SQL (e.g. feeding ``spark/sql_udaf.py`` aggregates) so
    the states stay merge-compatible with ``SketchJob(prehash=True)`` /
    ``build_*_sql`` builds.  The ``CAST(... AS STRING)`` is load-bearing:
    ``prehash_pair`` string-casts before hashing, and a lane built from a
    raw non-string column is a silently different hash family."""
    c = f"CAST({col} AS STRING)"
    return f"xxhash64({c})", f"xxhash64({c}, {PREHASH_SALT}L)"


def prehash_pair(key) -> tuple[Column, Column]:
    """(h1, h2) int64 hash columns for ``key``, null iff the key is null.

    ``xxhash64(NULL)`` returns the seed (42), not NULL — the ``when`` guard
    keeps null keys null so the build can drop them like the parity path
    drops null strings.
    """
    c = _as_col(key)
    h1 = F.when(c.isNotNull(), F.xxhash64(c))
    h2 = F.when(c.isNotNull(), F.xxhash64(c, F.lit(PREHASH_SALT)))
    return h1, h2
