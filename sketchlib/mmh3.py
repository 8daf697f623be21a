"""Vectorized MurmurHash3 kernels (numpy, batch-at-a-time).

Reimplements, bit-for-bit, the hash pipeline of the reference C library
(``/root/reference/src/mmh3.c`` — itself Austin Appleby's public-domain
MurmurHash3):

- ``mmh3_x64_128``  — MurmurHash3 x64_128   (reference ``mmh3_128``, src/mmh3.c:214-285)
- ``mmh3_x64_64``   — x64_128 folded h1^h2  (reference ``mmh3_64``,  src/mmh3.c:105-187)
- ``mmh3_x86_32``   — MurmurHash3 x86_32    (reference ``mmh3_32``,  src/mmh3.c:26-80)
- ``make_hashes``   — Kirsch–Mitzenmacher double hashing
                      (reference ``mmh3_64_make_hashes``, src/mmh3.c:308-315),
                      including its quirk of taking ``% (2**64 - 1)`` *after*
                      the natural mod-2**64 wraparound.

Unlike the reference (one element per call), these kernels hash a whole batch
of variable-length byte strings per call: input is the Arrow string layout —
a contiguous ``uint8`` data buffer plus an ``int64`` offsets array — so an
Arrow batch is hashed with zero per-row Python. Little-endian host assumed
(asserted at import).

Golden vectors (FIXTURES.md §3, recorded from the compiled reference) pin
parity in tests/test_mmh3.py.
"""

from __future__ import annotations

import sys

import numpy as np

assert sys.byteorder == "little", "sketchlib hash kernels require a little-endian host"

U64 = np.uint64
U32 = np.uint32

# x64_128 constants
_C1 = U64(0x87C37B91114253D5)
_C2 = U64(0x4CF5AD432745937F)
_F1 = U64(0xFF51AFD7ED558CCD)
_F2 = U64(0xC4CEB9FE1A85EC53)
_M5 = U64(5)
_A1 = U64(0x52DCE729)
_A2 = U64(0x38495AB5)
_FULL64 = U64(0xFFFFFFFFFFFFFFFF)

# x86_32 constants
_C1_32 = U32(0xCC9E2D51)
_C2_32 = U32(0x1B873593)


def _rotl64(x: np.ndarray, r: int) -> np.ndarray:
    r = U64(r)
    return (x << r) | (x >> U64(64 - int(r)))


def _rotl32(x: np.ndarray, r: int) -> np.ndarray:
    r = U32(r)
    return (x << r) | (x >> U32(32 - int(r)))


def _fmix64(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> U64(33))
    k *= _F1
    k ^= k >> U64(33)
    k *= _F2
    k ^= k >> U64(33)
    return k


def _fmix32(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> U32(16))
    h *= U32(0x85EBCA6B)
    h ^= h >> U32(13)
    h *= U32(0xC2B2AE35)
    h ^= h >> U32(16)
    return h


def _as_offsets(offsets: np.ndarray) -> np.ndarray:
    off = np.asarray(offsets)
    if off.dtype != np.int64:
        off = off.astype(np.int64)
    return off


# _MASK1[t] keeps the low min(t,8) bytes; _MASK2[t] keeps bytes 8..t-1 of the
# second lane — zero-padding tails exactly as the reference's switch
# fall-through builds k1/k2 (src/mmh3.c:240-262).
_MASK1 = np.array(
    [(1 << (8 * min(t, 8))) - 1 if t else 0 for t in range(17)], dtype=U64
)
_MASK2 = np.array(
    [(1 << (8 * max(t - 8, 0))) - 1 if t > 8 else 0 for t in range(17)], dtype=U64
)
_MASK1_32 = np.array([(1 << (8 * min(t, 4))) - 1 if t else 0 for t in range(5)], dtype=U32)


def _unaligned_view(padded: np.ndarray, itemdtype) -> np.ndarray:
    """Byte-stride-1 view of a uint8 buffer as overlapping little-endian words,
    so ``view[i]`` is the word starting at byte ``i`` (unaligned loads are fine
    on the little-endian hosts we assert at import)."""
    isz = np.dtype(itemdtype).itemsize
    return np.ndarray(
        shape=(padded.size - isz + 1,), dtype=itemdtype, buffer=padded, strides=(1,)
    )


def mmh3_x64_128(
    data: np.ndarray, offsets: np.ndarray, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """MurmurHash3 x64_128 over a batch of byte strings.

    ``data`` is a flat uint8 buffer; string ``i`` is
    ``data[offsets[i]:offsets[i+1]]``. Returns ``(h1, h2)`` uint64 arrays of
    length ``len(offsets) - 1``. Bit-identical to reference ``mmh3_128``
    (src/mmh3.c:214-285) for every (key, seed).
    """
    off = _as_offsets(offsets)
    n = off.size - 1
    if n <= 0:
        return np.empty(0, dtype=U64), np.empty(0, dtype=U64)

    # One padded copy of the buffer lets every 16-byte block and every tail be
    # read as two unaligned uint64 fancy-gathers — no 2D byte gathers.
    src = np.asarray(data, dtype=np.uint8)
    padded = np.empty(src.size + 16, dtype=np.uint8)
    padded[: src.size] = src
    padded[src.size :] = 0
    v64 = _unaligned_view(padded, "<u8")

    lengths = np.diff(off)
    nblocks = lengths >> 4

    uniform = bool((nblocks == nblocks[0]).all())
    if uniform:
        order = None
        off_s, len_s, nb_s = off[:-1], lengths, nblocks
    else:
        # Descending-nblocks order: each block level touches a contiguous
        # prefix (one gather per level; total gathered = total block bytes).
        order = np.argsort(-nblocks, kind="stable")
        off_s = off[:-1][order]
        len_s = lengths[order]
        nb_s = nblocks[order]

    h1 = np.full(n, U64(seed), dtype=U64)
    h2 = np.full(n, U64(seed), dtype=U64)

    nb_max = int(nb_s.max()) if n else 0
    neg = -nb_s
    for j in range(nb_max):
        m = n if uniform else int(np.searchsorted(neg, -(j + 1), side="right"))
        if m == 0:
            break
        base = off_s[:m] + 16 * j
        k1 = v64[base]
        k2 = v64[base + 8]

        k1 = k1 * _C1
        k1 = _rotl64(k1, 31)
        k1 *= _C2
        h1[:m] ^= k1

        h1[:m] = _rotl64(h1[:m], 27) + h2[:m]
        h1[:m] = h1[:m] * _M5 + _A1

        k2 = k2 * _C2
        k2 = _rotl64(k2, 33)
        k2 *= _C1
        h2[:m] ^= k2

        h2[:m] = _rotl64(h2[:m], 31) + h1[:m]
        h2[:m] = h2[:m] * _M5 + _A2

    # Tail: len & 15 remaining bytes, zero-padded little-endian loads.  The
    # reference's switch fall-through (src/mmh3.c:240-262) is exactly an LE
    # load of the zero-padded tail; lanes that end up 0 stay 0 through the
    # multiply/rotate pipeline, so h ^= 0 is a no-op — uniform vectorization
    # is bit-exact.
    tail_len = len_s & 15
    if tail_len.any():
        tbase = off_s + 16 * nb_s
        k1 = v64[tbase] & _MASK1[tail_len]
        k2 = v64[tbase + 8] & _MASK2[tail_len]

        k2 *= _C2
        k2 = _rotl64(k2, 33)
        k2 *= _C1
        h2 ^= k2

        k1 *= _C1
        k1 = _rotl64(k1, 31)
        k1 *= _C2
        h1 ^= k1

    ln = len_s.astype(U64)
    h1 ^= ln
    h2 ^= ln
    h1 += h2
    h2 += h1
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 += h2
    h2 += h1

    if order is None:
        return h1, h2
    out1 = np.empty(n, dtype=U64)
    out2 = np.empty(n, dtype=U64)
    out1[order] = h1
    out2[order] = h2
    return out1, out2


def mmh3_x64_64(data: np.ndarray, offsets: np.ndarray, seed: int = 0) -> np.ndarray:
    """x64_128 folded to 64 bits as ``h1 ^ h2`` (reference ``mmh3_64``,
    src/mmh3.c:105-187 — its loop is the same x64_128 core)."""
    h1, h2 = mmh3_x64_128(data, offsets, seed)
    return h1 ^ h2


def mmh3_x86_32(data: np.ndarray, offsets: np.ndarray, seed: int = 0) -> np.ndarray:
    """MurmurHash3 x86_32 over a batch (reference ``mmh3_32``, src/mmh3.c:26-80).

    Note: Spark's builtin ``F.hash()`` is the same algorithm but pinned to
    seed 42; the reference uses caller seeds (0 by default), hence this
    kernel.
    """
    off = _as_offsets(offsets)
    n = off.size - 1
    if n <= 0:
        return np.empty(0, dtype=U32)

    src = np.asarray(data, dtype=np.uint8)
    padded = np.empty(src.size + 8, dtype=np.uint8)
    padded[: src.size] = src
    padded[src.size :] = 0
    v32 = _unaligned_view(padded, "<u4")

    lengths = np.diff(off)
    nblocks = lengths >> 2

    uniform = bool((nblocks == nblocks[0]).all())
    if uniform:
        order = None
        off_s, len_s, nb_s = off[:-1], lengths, nblocks
    else:
        order = np.argsort(-nblocks, kind="stable")
        off_s = off[:-1][order]
        len_s = lengths[order]
        nb_s = nblocks[order]

    h = np.full(n, U32(seed & 0xFFFFFFFF), dtype=U32)
    neg = -nb_s
    nb_max = int(nb_s.max()) if n else 0
    for j in range(nb_max):
        m = n if uniform else int(np.searchsorted(neg, -(j + 1), side="right"))
        if m == 0:
            break
        k1 = v32[off_s[:m] + 4 * j] * _C1_32
        k1 = _rotl32(k1, 15)
        k1 *= _C2_32
        h[:m] ^= k1
        h[:m] = _rotl32(h[:m], 13)
        h[:m] = h[:m] * U32(5) + U32(0xE6546B64)

    tail_len = len_s & 3
    if tail_len.any():
        k1 = v32[off_s + 4 * nb_s] & _MASK1_32[tail_len]
        k1 *= _C1_32
        k1 = _rotl32(k1, 15)
        k1 *= _C2_32
        h ^= k1

    h ^= len_s.astype(U32)
    h = _fmix32(h)

    if order is None:
        return h
    out = np.empty(n, dtype=U32)
    out[order] = h
    return out


def make_hashes(h1: np.ndarray, h2: np.ndarray, k: int) -> np.ndarray:
    """Kirsch–Mitzenmacher: ``k`` hashes from one 128-bit hash.

    Reproduces reference ``mmh3_64_make_hashes`` (src/mmh3.c:308-315)
    including its quirk: ``(h1 + i*h2)`` wraps naturally mod 2**64, and the
    reference then applies ``% UINT64_MAX`` — i.e. mod (2**64 - 1) — on the
    wrapped value.  Returns shape ``(len(h1), k)`` uint64.
    """
    i = np.arange(k, dtype=U64)[None, :]
    h = h1[:, None] + i * h2[:, None]
    # x % (2**64 - 1) for x in [0, 2**64) is x, except x == 2**64-1 → 0 —
    # no integer division needed.
    h[h == _FULL64] = 0
    return h


def as_u64(a: np.ndarray) -> np.ndarray:
    """Reinterpret signed 64-bit hashes (Spark's xxhash64 returns long) as
    uint64 without copying; other dtypes are cast."""
    a = np.asarray(a)
    if a.dtype == np.int64:
        return a.view(U64)
    return a.astype(U64, copy=False)


def positions_from_hashes(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    """``(n, k)`` int64 cell positions from a pre-computed 64-bit hash pair
    (the JVM-prehash fast path, ``spark/prehash.py``): same
    Kirsch–Mitzenmacher ladder as :func:`positions`, hash family supplied by
    the caller instead of mmh3."""
    return (make_hashes(as_u64(h1), as_u64(h2), k) % U64(m)).astype(np.int64)


def hash_batch(data: np.ndarray, offsets: np.ndarray, k: int, seed: int = 0) -> np.ndarray:
    """One mmh3_x64_128 pass + double hashing → ``(n, k)`` uint64 hash matrix.

    This is the shared front half of every bloom-family add/lookup
    (reference pipeline: bloom_add → mmh3_64_make_hashes → positions,
    src/bloom.c:336-352)."""
    h1, h2 = mmh3_x64_128(data, offsets, seed)
    return make_hashes(h1, h2, k)


def positions(data: np.ndarray, offsets: np.ndarray, k: int, m: int, seed: int = 0) -> np.ndarray:
    """``(n, k)`` int64 cell positions: ``h_i % m`` (reference src/bloom.c:299)."""
    return (hash_batch(data, offsets, k, seed) % U64(m)).astype(np.int64)


def pack_strings(keys: list[bytes | str]) -> tuple[np.ndarray, np.ndarray]:
    """Test/driver convenience: Python strings/bytes → (data, offsets) framing.

    Hot paths never use this — they take Arrow buffers directly via
    :func:`arrow_string_buffers`.
    """
    bs = [k.encode("utf-8") if isinstance(k, str) else bytes(k) for k in keys]
    offsets = np.zeros(len(bs) + 1, dtype=np.int64)
    np.cumsum([len(b) for b in bs], out=offsets[1:])
    data = np.frombuffer(b"".join(bs), dtype=np.uint8) if bs else np.empty(0, dtype=np.uint8)
    return data, offsets


def arrow_string_buffers(arr) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (data, offsets) framing from a pyarrow String/LargeString/Binary array.

    Nulls must be handled upstream (drop or coalesce); a null slot hashes as
    its empty/garbage range otherwise.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if arr.null_count:
        arr = pc.drop_null(arr)
    t = arr.type
    if pa.types.is_large_string(t) or pa.types.is_large_binary(t):
        odtype = np.int64
    elif pa.types.is_string(t) or pa.types.is_binary(t):
        odtype = np.int32
    else:
        arr = pc.cast(arr, pa.large_string())
        odtype = np.int64
    buffers = arr.buffers()
    off = np.frombuffer(buffers[1], dtype=odtype)[arr.offset : arr.offset + len(arr) + 1]
    off = off.astype(np.int64)
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
    return data, off
