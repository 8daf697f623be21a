"""Dense HyperLogLog kernel (north-star extension — the reference has no
cardinality sketch; BASELINE.json.north_star mandates approximate distinct
``conv_id`` / ``(conv_id, tool)``).

Standard Flajolet–Fuss–Gandouet–Meunier 2007 construction over the mmh3
x64_128 ``h1`` lane: top ``p`` bits → register index, ρ = leading-zero count
of the remaining ``64 - p`` bits + 1 → register value; registers are uint8,
merge = element-wise max (associative, commutative, idempotent ⇒
merge-order-invariant states).  Estimator: raw harmonic mean with the
small-range linear-counting correction; no large-range correction is needed
with a 64-bit hash.

Error: σ ≈ 1.04/√m; p=14 (m=16384) ⇒ 0.81%, inside the ±2% budget
(BASELINE.md).  Cross-checkable against Spark's ``approx_count_distinct`` /
``hll_sketch_agg`` (different hash, same bound).
"""

from __future__ import annotations

import numpy as np

from sketchlib import mmh3
from sketchlib.specs import HllSpec

U64 = np.uint64


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


class HyperLogLog:
    spec_cls = HllSpec

    def __init__(self, spec: HllSpec, registers: np.ndarray | None = None):
        self.spec = spec
        self.p = spec.p
        self.m = spec.m
        if registers is None:
            registers = np.zeros(self.m, dtype=np.uint8)
        assert registers.size == self.m
        self.registers = registers

    def update(self, data: np.ndarray, offsets: np.ndarray) -> None:
        h1, _ = mmh3.mmh3_x64_128(data, offsets, self.spec.seed)
        self.update_hashes(h1)

    def update_hashes(self, h: np.ndarray, h2: np.ndarray | None = None) -> None:
        """Ingest pre-computed 64-bit hashes (lets one hash pass feed several
        sketches).  ``h2`` is accepted for uniformity with the bloom-family
        prehash signature and ignored — HLL consumes a single 64-bit lane."""
        h = mmh3.as_u64(h)
        p = self.p
        idx = (h >> U64(64 - p)).astype(np.int64)
        w = h << U64(p)  # remaining bits, left-aligned
        # ρ = clz(w) + 1, capped at 64 - p + 1 when w == 0
        rho = np.full(h.size, 64 - p + 1, dtype=np.uint8)
        nz = w != 0
        if nz.any():
            wnz = w[nz]
            # clz via float64 exponent is unsafe near 2^63; use a bit-length
            # ladder instead (log2 on uint64 loses precision).
            lz = np.zeros(wnz.size, dtype=np.uint8)
            cur = wnz.copy()
            for shift in (32, 16, 8, 4, 2, 1):
                mask = cur < (U64(1) << U64(64 - shift))
                lz[mask] += np.uint8(shift)
                cur[mask] <<= U64(shift)
            rho_nz = (lz + 1).astype(np.uint8)
            rho[nz] = np.minimum(rho_nz, np.uint8(64 - p + 1))
        np.maximum.at(self.registers, idx, rho)

    def update_strings(self, keys) -> None:
        self.update(*mmh3.pack_strings(keys))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if not self.spec.compatible(other.spec):
            raise ValueError("incompatible HLL sketches")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        """Cardinality estimate (floats touch only this read path — state
        stays integer for byte-identical merges)."""
        m = self.m
        regs = self.registers.astype(np.float64)
        raw = _alpha(m) * m * m / np.sum(np.exp2(-regs))
        if raw <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return float(m * np.log(m / zeros))
        return float(raw)

    def serialize(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def deserialize(cls, spec: HllSpec, blob: bytes) -> "HyperLogLog":
        return cls(spec, np.frombuffer(blob, dtype=np.uint8).copy())
