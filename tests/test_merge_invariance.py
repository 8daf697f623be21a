"""North-rule merge algebra: for the linear sketches (bloom family, CMS,
HLL, tdbloom, tdcbloom) the merged state must be BYTE-IDENTICAL for any
partitioning of the rows, any partition order, and any merge-tree shape
(BASELINE.json.north_rule: "merges must be associative/commutative so any
partition merge order yields identical sketches").

KLL / t-digest are exempt by design (their guarantee is the error bound, not
byte identity — BASELINE.md)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sketchlib.kernels import (
    BloomFilter,
    CountingBloomFilter,
    CountMinSketch,
    HyperLogLog,
    TdBloomFilter,
    TdCBloomFilter,
)
from sketchlib.specs import (
    BloomSpec,
    CBloomSpec,
    CmsSpec,
    HllSpec,
    TdBloomSpec,
    TdCBloomSpec,
)

BASE = 1_700_000_000
N_ROWS = 2_000
KEYS = ["conv-%05d" % (i % 700) for i in range(N_ROWS)]  # dups on purpose
TS = [BASE + (i * 37) % 5000 for i in range(N_ROWS)]


def _builders():
    return {
        "bloom": (
            lambda: BloomFilter(BloomSpec(1000, 0.01)),
            lambda k, keys, ts: k.update_strings(keys),
        ),
        "cbloom": (
            lambda: CountingBloomFilter(CBloomSpec(1000, 0.01, counter_bits=16)),
            lambda k, keys, ts: k.update_strings(keys),
        ),
        "cbloom4bit": (
            lambda: CountingBloomFilter(CBloomSpec(1000, 0.01, counter_bits=4)),
            lambda k, keys, ts: k.update_strings(keys),
        ),
        "hll": (
            lambda: HyperLogLog(HllSpec(p=12)),
            lambda k, keys, ts: k.update_strings(keys),
        ),
        "cms": (
            lambda: CountMinSketch(CmsSpec(epsilon=0.01, delta=0.1)),
            lambda k, keys, ts: k.update_strings(keys),
        ),
        "tdbloom": (
            lambda: TdBloomFilter(TdBloomSpec(1000, 0.01, timeout=10_000, start_time=BASE)),
            lambda k, keys, ts: k.update_strings(keys, ts),
        ),
        "tdcbloom": (
            lambda: TdCBloomFilter(
                TdCBloomSpec(1000, 0.01, timeout=10_000, counter_bits=16, start_time=BASE)
            ),
            lambda k, keys, ts: k.update_strings(keys, ts),
        ),
    }


@pytest.mark.parametrize("kind", list(_builders()))
@given(
    n_parts=st.integers(1, 16),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=12, deadline=None)
def test_merge_invariance(kind, n_parts, seed):
    make, ingest = _builders()[kind]

    # sequential single-partition reference
    ref = make()
    ingest(ref, KEYS, TS)
    ref_bytes = ref.serialize()

    # random partitioning + shuffled merge order
    rng = np.random.default_rng(seed)
    assign = rng.integers(0, n_parts, size=N_ROWS)
    partials = []
    for part in range(n_parts):
        idx = np.nonzero(assign == part)[0]
        k = make()
        if idx.size:
            ingest(k, [KEYS[i] for i in idx], [TS[i] for i in idx])
        partials.append(k)
    rng.shuffle(partials)

    # random merge-tree shape: fold pairs until one remains
    while len(partials) > 1:
        i = int(rng.integers(0, len(partials) - 1))
        a = partials.pop(i)
        b = partials.pop(int(rng.integers(0, len(partials))) % len(partials) if len(partials) else 0)
        a.merge(b)
        partials.append(a)

    assert partials[0].serialize() == ref_bytes, f"{kind}: merge order changed the state"
