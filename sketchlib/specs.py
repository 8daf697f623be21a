"""Sketch specifications: sizing geometry + parameter dataclasses.

Geometry reproduces the reference bit-for-bit:

- ``ideal_size``: ``m = -(n * log(p) / log(2)^2)`` truncated, with ``p``
  first rounded through a C ``float`` (the reference API takes
  ``const float accuracy``) — reference ``src/bloom.c:37-39`` (duplicated at
  ``src/cbloom.c:46-48``, ``src/tdbloom.c:42-44``, ``src/tdcbloom.c:37-39``).
- ``hashcount``: ``k = (m / n) * ln 2`` with **integer division first**, then
  truncation (``src/bloom.c:56``, ``src/tdbloom.c:84``) — except the counting
  bloom, which rounds half-up (``src/cbloom.c:73``).
- Time-decaying timer width auto-pick: smallest of {1,2,4,8} bytes with
  ``timeout`` strictly below the type max; ``max_time`` = type max
  (``src/tdbloom.c:92-102``).

One deliberate divergence, documented in SURVEY.md §1.1: the reference sizes
its bitmap ``m / 8`` bytes (truncating — an out-of-bounds write for
``m % 8 != 0``); we allocate ``ceil(m / 8)``. Bit positions are identical.

Specs are frozen dataclasses, JSON-serializable for broadcast to executors
and for sketch-store persistence.
"""

from __future__ import annotations

import json
import math
from dataclasses import asdict, dataclass, field, fields

import numpy as np

LN2 = math.log(2.0)

_TIMER_WIDTHS = (
    (np.uint8, 0xFF),
    (np.uint16, 0xFFFF),
    (np.uint32, 0xFFFFFFFF),
    (np.uint64, 0xFFFFFFFFFFFFFFFF),
)


def ideal_size(expected: int, accuracy: float) -> int:
    """Bit/cell count m from (n, p) — parity with reference ``ideal_size``."""
    if expected <= 0:
        raise ValueError("expected must be > 0")
    if not (0.0 < accuracy < 1.0):
        raise ValueError("accuracy must be in (0, 1)")
    p32 = float(np.float32(accuracy))  # reference API takes C float
    return int(-(expected * math.log(p32) / (LN2 * LN2)))


def bloom_hashcount(m: int, expected: int) -> int:
    """k via integer-division-then-truncate (src/bloom.c:56)."""
    return int((m // expected) * LN2)


def cbloom_hashcount(m: int, expected: int) -> int:
    """k via integer-division-then-round (src/cbloom.c:73)."""
    return int((m // expected) * LN2 + 0.5)


def timer_dtype(timeout: int) -> tuple[np.dtype, int]:
    """(dtype, max_time) for a time-decaying filter (src/tdbloom.c:92-102)."""
    if timeout <= 0:
        raise ValueError("timeout must be > 0")
    for dt, tmax in _TIMER_WIDTHS:
        if timeout < tmax:
            return np.dtype(dt), tmax
    raise ValueError("timeout too large")


def counter_dtype(counter_bits: int) -> tuple[np.dtype, int]:
    """(storage dtype, saturation cap) for a counter width; 4-bit counters are
    nibble-packed in uint8 (src/cbloom.c:66-72, :81)."""
    caps = {4: 0xF, 8: 0xFF, 16: 0xFFFF, 32: 0xFFFFFFFF, 64: 0xFFFFFFFFFFFFFFFF}
    if counter_bits not in caps:
        raise ValueError(f"invalid counter width {counter_bits}")
    dt = {4: np.uint8, 8: np.uint8, 16: np.uint16, 32: np.uint32, 64: np.uint64}[counter_bits]
    return np.dtype(dt), caps[counter_bits]


@dataclass(frozen=True)
class BaseSpec:
    name: str = field(default="DEFAULT", kw_only=True)
    seed: int = field(default=0, kw_only=True)

    @property
    def kind(self) -> str:
        return _KIND_BY_CLASS[type(self)]

    def to_json(self) -> str:
        d = asdict(self)
        d["kind"] = self.kind
        return json.dumps(d, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "BaseSpec":
        d = json.loads(s)
        cls = _CLASS_BY_KIND[d.pop("kind")]
        return cls(**d)

    def compatible(self, other: "BaseSpec") -> bool:
        """Merge compatibility — the analog of the reference's size/hashcount/
        accuracy check before bloom_merge (src/bloom.c:773-777)."""
        if type(self) is not type(other):
            return False
        skip = {"name"}
        return all(
            getattr(self, f.name) == getattr(other, f.name)
            for f in fields(self)
            if f.name not in skip
        )


@dataclass(frozen=True)
class BloomSpec(BaseSpec):
    """Classic Bloom filter (src/bloom.h:118-126)."""

    expected: int
    accuracy: float

    @property
    def m(self) -> int:
        return ideal_size(self.expected, self.accuracy)

    @property
    def k(self) -> int:
        return bloom_hashcount(self.m, self.expected)

    @property
    def nbytes(self) -> int:
        return (self.m + 7) // 8  # ceil — divergence note in module docstring


@dataclass(frozen=True)
class CBloomSpec(BaseSpec):
    """Counting Bloom filter (src/cbloom.h:122-131); counter_bits ∈ {4,8,16,32,64}."""

    expected: int
    accuracy: float
    counter_bits: int = 16

    @property
    def m(self) -> int:
        return ideal_size(self.expected, self.accuracy)

    @property
    def k(self) -> int:
        return cbloom_hashcount(self.m, self.expected)

    @property
    def cap(self) -> int:
        return counter_dtype(self.counter_bits)[1]

    @property
    def dtype(self) -> np.dtype:
        return counter_dtype(self.counter_bits)[0]


@dataclass(frozen=True)
class TdBloomSpec(BaseSpec):
    """Time-decaying Bloom filter (src/tdbloom.h:90-102).

    Event-time semantics: ticks are seconds relative to ``start_time`` (an
    epoch), wrapped modulo ``max_time`` and stored 1-based, exactly the
    reference's formulas (src/tdbloom.c:293, :357-358) — but driven by the
    data's ``ts`` column and an explicit as-of time instead of wall clock
    (deliberate deviation, SURVEY.md §7 hard-part 2).
    """

    expected: int
    accuracy: float
    timeout: int
    start_time: int = 0  # epoch seconds the tick clock is based at

    @property
    def m(self) -> int:
        return ideal_size(self.expected, self.accuracy)

    @property
    def k(self) -> int:
        return bloom_hashcount(self.m, self.expected)

    @property
    def max_time(self) -> int:
        return timer_dtype(self.timeout)[1]

    @property
    def dtype(self) -> np.dtype:
        return timer_dtype(self.timeout)[0]


@dataclass(frozen=True)
class TdCBloomSpec(BaseSpec):
    """Time-decaying counting Bloom filter (src/tdcbloom.h:79-91).

    SoA layout (separate counter and tick arrays) instead of the reference's
    packed (counter, timestamp) entries — same semantics, vectorizable.
    Ticks are rebased on ``start_time`` like TdBloom (the reference stores raw
    ``now % width_max`` here, inconsistently with tdbloom — unified, see
    SURVEY.md §2.5).
    """

    expected: int
    accuracy: float
    timeout: int
    counter_bits: int = 8
    start_time: int = 0

    @property
    def m(self) -> int:
        return ideal_size(self.expected, self.accuracy)

    @property
    def k(self) -> int:
        # reference tdcbloom uses truncation like bloom (src/tdcbloom.c:91)
        return bloom_hashcount(self.m, self.expected)

    @property
    def max_time(self) -> int:
        return timer_dtype(self.timeout)[1]

    @property
    def tick_dtype(self) -> np.dtype:
        return timer_dtype(self.timeout)[0]

    @property
    def cap(self) -> int:
        return counter_dtype(self.counter_bits)[1]

    @property
    def counter_np_dtype(self) -> np.dtype:
        return counter_dtype(self.counter_bits)[0]


@dataclass(frozen=True)
class CuckooSpec(BaseSpec):
    """Cuckoo filter (src/cuckoo.h:12-27), with the four defect fixes of
    SURVEY.md §2.6: fingerprint from an independent hash lane (not the low
    bits of the index hash), partner bucket ``i2 = i1 ^ H(fp)`` (Fan et al.,
    CoNEXT'14), fp==0 remapped to 1, and a deterministic PRNG seed."""

    num_buckets: int
    bucket_size: int = 4
    max_kicks: int = 500
    fp_bits: int = 16


@dataclass(frozen=True)
class HllSpec(BaseSpec):
    """Dense HyperLogLog (Flajolet et al. 2007); north-star extension.

    ``p`` register-index bits → m = 2**p registers, uint8. Default p=14 ⇒
    σ ≈ 1.04/√m ≈ 0.81%, inside the ±2% budget of BASELINE.json.
    """

    p: int = 14

    @property
    def m(self) -> int:
        return 1 << self.p


@dataclass(frozen=True)
class CmsSpec(BaseSpec):
    """Count-Min sketch (Cormode–Muthukrishnan 2005); the reference README
    declares it 'NOT IMPLEMENTED YET' (README.md:80-90) — semantics match its
    description plus cbloom's min-of-counters estimator (src/cbloom.c:257-274).

    width w = ceil(e/eps), depth d = ceil(ln(1/delta)).
    """

    epsilon: float = 0.0001
    delta: float = 0.01

    @property
    def width(self) -> int:
        return int(math.ceil(math.e / self.epsilon))

    @property
    def depth(self) -> int:
        return int(math.ceil(math.log(1.0 / self.delta)))


@dataclass(frozen=True)
class KllSpec(BaseSpec):
    """KLL rank/quantile sketch (Karnin–Lang–Liberty 2016); north-rule extension."""

    k: int = 200


@dataclass(frozen=True)
class TDigestSpec(BaseSpec):
    """Merging t-digest (Dunning & Ertl); north-rule extension."""

    compression: float = 200.0


@dataclass(frozen=True)
class BottomKSpec(BaseSpec):
    """Bottom-k / KMV distinct sketch (Bar-Yossef et al. 2002, Beyer et al.
    SIGMOD'07); north-rule extension.  Deterministic distinct sample +
    cardinality (rel. err ~ 1/sqrt(k-2)) + Jaccard; byte-identical merges."""

    k: int = 1024


@dataclass(frozen=True)
class MGSpec(BaseSpec):
    """Misra–Gries heavy-hitters summary (Agarwal et al., Mergeable
    Summaries); north-rule extension.  ``k`` tracked entries ⇒ one-sided
    undercount ≤ N/(k+1); every key with true count > N/(k+1) is present."""

    k: int = 256


@dataclass(frozen=True)
class SbfSpec(BaseSpec):
    """Spectral Bloom filter (Cohen & Matias SIGMOD'03) — the reference's
    declared-only roadmap structure (README.md:93-104).  Counting-bloom
    geometry (same ideal_size / rounded hashcount as CBloomSpec, since the C
    library never fixed formulas for it) plus a smaller secondary array for
    recurring-minimum collision management, sized ``expected // rm_fraction``
    with the same accuracy.  counter_bits ∈ {8,16,32,64} (no 4-bit nibble
    packing: there is no C file format to stay parity with)."""

    expected: int
    accuracy: float
    counter_bits: int = 16
    rm_fraction: int = 4

    def __post_init__(self):
        if self.counter_bits not in (8, 16, 32, 64):
            raise ValueError("sbf counter_bits must be 8/16/32/64")
        if self.rm_fraction < 1:
            raise ValueError("rm_fraction must be >= 1")

    @property
    def m(self) -> int:
        return ideal_size(self.expected, self.accuracy)

    @property
    def k(self) -> int:
        return cbloom_hashcount(self.m, self.expected)

    @property
    def rm_expected(self) -> int:
        return max(64, self.expected // self.rm_fraction)

    @property
    def rm_m(self) -> int:
        return ideal_size(self.rm_expected, self.accuracy)

    @property
    def rm_k(self) -> int:
        return cbloom_hashcount(self.rm_m, self.rm_expected)

    @property
    def cap(self) -> int:
        return counter_dtype(self.counter_bits)[1]

    @property
    def dtype(self) -> np.dtype:
        return counter_dtype(self.counter_bits)[0]


_CLASS_BY_KIND: dict[str, type] = {
    "bloom": BloomSpec,
    "cbloom": CBloomSpec,
    "tdbloom": TdBloomSpec,
    "tdcbloom": TdCBloomSpec,
    "cuckoo": CuckooSpec,
    "hll": HllSpec,
    "cms": CmsSpec,
    "kll": KllSpec,
    "tdigest": TDigestSpec,
    "mg": MGSpec,
    "bottomk": BottomKSpec,
    "sbf": SbfSpec,
}
_KIND_BY_CLASS = {v: k for k, v in _CLASS_BY_KIND.items()}
