"""archbloom on-disk filter-file import/export.

Byte-compatible reader/writer for the reference's native save formats, so a
user migrating from the C library can load existing filter files into
sketchlib (and write files the C library can load back):

- bloom   ``!bloomf!``  header+bitmap      src/bloom.c:525-559 (save),
  :575-628 (load); header struct src/bloom.h:153-161
- cbloom  ``!cbloom!``  header+countermap  src/cbloom.c:854-889 (save),
  :955-1005 (load); header struct src/cbloom.h:173-182
- tdbloom ``!tdbloo!``  header+tick array  src/tdbloom.c:528-565 (save),
  :620-673 (load); header struct src/tdbloom.h:68-79

Headers are the C structs dumped verbatim (x86-64 ABI: little-endian,
natural alignment — the only padding is trailing, to the 8-byte struct
alignment).  Payloads are the raw filter arrays, which this library already
keeps bit/byte-identical to the reference (C-golden hexdump tests), so
import/export is header plumbing plus two documented C defects:

1. **bloom/cbloom partial final byte.**  The reference sizes its bitmap
   ``m / 8`` *truncating* (src/bloom.c:57) — an out-of-bounds write when
   ``m % 8 != 0``; we allocate ``ceil(m / 8)``.  Export truncates to the C
   size (bits beyond the last full byte are lost, exactly as the C binary's
   own file would lose them); import zero-pads.  Geometry with
   ``m % 8 == 0`` round-trips losslessly.

2. **tdbloom save/load is unusable as shipped** (header TODO "test" is
   accurate): the save's ``|| fwrite(...)`` success check is inverted
   (src/tdbloom.c:556-557 — reports TDBF_FWRITE on a successful write,
   though the file lands on disk complete); ``max_time`` is never copied
   into the header (stays 0, so a loaded filter mis-wraps every tick);
   ``timeout`` has no field in the file struct at all; and the path loader
   validates ``sizeof(tdbloom) + filter_size == st_size`` against the
   *in-memory* struct (src/tdbloom.c:651-652 — 336 bytes, not the 320-byte
   file header), so it rejects every file ever written, its own included.
   We write the same layout *corrected*: full tick payload
   (``filter_size = size * bytes``, as C init sets it), real ``max_time``
   — exactly what `tdbloom_load_fd` (the one loader with the right size
   check, src/tdbloom.c:698) expects.  ``timeout`` is stashed in the unused
   tail of the 256-byte name field (after the NUL, which C's strncpy load
   ignores) so sketchlib round-trips it; importing a genuine C file
   requires passing ``timeout=`` explicitly.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from sketchlib.kernels.bloom import BloomFilter
from sketchlib.kernels.cbloom import CountingBloomFilter
from sketchlib.kernels.tdbloom import TdBloomFilter
from sketchlib.specs import BloomSpec, CBloomSpec, TdBloomSpec

BLOOM_MAGIC = b"!bloomf!"
CBLOOM_MAGIC = b"!cbloom!"
TDBLOOM_MAGIC = b"!tdbloo!"

# C struct layouts (src/bloom.h:153-161, src/cbloom.h:173-182,
# src/tdbloom.h:68-79): magic[8], name[256], then the u64/int/float tail.
_BLOOM_HDR = struct.Struct("<8s256s4Qf4x")  # size hashcount bitmap_size expected acc
_CBLOOM_HDR = struct.Struct("<8s256s5Qf4x")  # size csize hashcount cmap_size expected acc
_TDBLOOM_HDR = struct.Struct("<8s256s6Qif")  # size fsize hashcount expected max_t start_t bytes acc

# counter_size enum (src/cbloom.h:66-72)
_CSIZE_TO_BITS = {0: 4, 1: 8, 2: 16, 3: 32, 4: 64}
_BITS_TO_CSIZE = {v: k for k, v in _CSIZE_TO_BITS.items()}

# sketchlib extension: timeout hidden after the name NUL (C ignores it)
_TDEXT_OFF = 240
_TDEXT = struct.Struct("<8sQ")
_TDEXT_MAGIC = b"!tdextn!"


class InvalidFilterFile(ValueError):
    """Bad magic, geometry mismatch, or truncated payload (the analog of the
    reference's BF_INVALIDFILE / CBF_INVALIDFILE / TDBF_INVALIDFILE)."""


def _pack_name(name: str, extra: bytes = b"") -> bytes:
    raw = name.encode("utf-8")[:255]
    buf = bytearray(256)
    buf[: len(raw)] = raw  # NUL-terminated by the zero fill
    if extra:
        buf[_TDEXT_OFF : _TDEXT_OFF + len(extra)] = extra
    return bytes(buf)


def _unpack_name(raw: bytes) -> str:
    return raw.split(b"\0", 1)[0].decode("utf-8", "replace")


def _read_exact(path: str, hdr: struct.Struct) -> tuple[tuple, bytes]:
    with open(path, "rb") as f:
        head = f.read(hdr.size)
        if len(head) != hdr.size:
            raise InvalidFilterFile(f"{path}: truncated header")
        return hdr.unpack(head), f.read()


def _f32(x: float) -> float:
    # the C structs store accuracy as float; round-trip through float32 so
    # geometry derived from it is identical on both sides
    return float(np.float32(x))


# -- bloom ---------------------------------------------------------------
def bloom_export(kernel: BloomFilter, path: str) -> None:
    """Write a ``!bloomf!`` file the C ``bloom_load`` accepts
    (src/bloom.c:575-628 checks size/8 == bitmap_size and exact file size)."""
    spec = kernel.spec
    bitmap_size = spec.m // 8  # C truncation (src/bloom.c:57)
    hdr = _BLOOM_HDR.pack(
        BLOOM_MAGIC, _pack_name(spec.name), spec.m, spec.k,
        bitmap_size, spec.expected, _f32(spec.accuracy),
    )
    with open(path, "wb") as f:
        f.write(hdr)
        f.write(kernel.serialize()[:bitmap_size])


def bloom_import(path: str) -> BloomFilter:
    (magic, name, size, hashcount, bitmap_size, expected, accuracy), payload = (
        _read_exact(path, _BLOOM_HDR)
    )
    if magic != BLOOM_MAGIC:
        raise InvalidFilterFile(f"{path}: bad magic {magic!r}")
    spec = BloomSpec(int(expected), _f32(accuracy), name=_unpack_name(name))
    # the C loader's own sanity check (src/bloom.c:606-610) + geometry parity
    if size // 8 != bitmap_size or len(payload) != bitmap_size:
        raise InvalidFilterFile(f"{path}: size/bitmap mismatch")
    if spec.m != size or spec.k != hashcount:
        raise InvalidFilterFile(
            f"{path}: geometry {size}/{hashcount} != derived {spec.m}/{spec.k}"
        )
    bits = np.zeros(spec.nbytes, dtype=np.uint8)
    bits[:bitmap_size] = np.frombuffer(payload, dtype=np.uint8)
    return BloomFilter(spec, bits)


# -- counting bloom ------------------------------------------------------
def cbloom_export(kernel: CountingBloomFilter, path: str) -> None:
    """Write a ``!cbloom!`` file (src/cbloom.c:854-889).  The 4-bit payload
    is nibble-packed low-first, exactly the C access pattern
    (src/cbloom.c:175,192-194) — which is already our serde layout."""
    spec = kernel.spec
    payload = kernel.serialize()
    hdr = _CBLOOM_HDR.pack(
        CBLOOM_MAGIC, _pack_name(spec.name), spec.m,
        _BITS_TO_CSIZE[spec.counter_bits], spec.k, len(payload),
        spec.expected, _f32(spec.accuracy),
    )
    with open(path, "wb") as f:
        f.write(hdr)
        f.write(payload)


def cbloom_import(path: str) -> CountingBloomFilter:
    (magic, name, size, csize, hashcount, cmap_size, expected, accuracy), payload = (
        _read_exact(path, _CBLOOM_HDR)
    )
    if magic != CBLOOM_MAGIC:
        raise InvalidFilterFile(f"{path}: bad magic {magic!r}")
    if int(csize) not in _CSIZE_TO_BITS:
        raise InvalidFilterFile(f"{path}: invalid counter_size {csize}")
    spec = CBloomSpec(
        int(expected), _f32(accuracy),
        counter_bits=_CSIZE_TO_BITS[int(csize)], name=_unpack_name(name),
    )
    want = (spec.m + 1) // 2 if spec.counter_bits == 4 else spec.m * spec.dtype.itemsize
    if spec.m != size or spec.k != hashcount or len(payload) != cmap_size or cmap_size != want:
        raise InvalidFilterFile(f"{path}: geometry/payload mismatch")
    return CountingBloomFilter.deserialize(spec, payload)


# -- time-decaying bloom ---------------------------------------------------
def tdbloom_export(kernel: TdBloomFilter, path: str) -> None:
    """Write the corrected ``!tdbloo!`` form (module docstring, defect 2):
    full wrapped tick payload (``compact_state`` — the C in-memory array),
    filter_size in bytes, real max_time, timeout in the name-tail extension."""
    spec = kernel.spec
    payload = kernel.compact_state().tobytes()
    hdr = _TDBLOOM_HDR.pack(
        TDBLOOM_MAGIC,
        _pack_name(spec.name, _TDEXT.pack(_TDEXT_MAGIC, spec.timeout)),
        spec.m, len(payload), spec.k, spec.expected, spec.max_time,
        spec.start_time, spec.dtype.itemsize, _f32(spec.accuracy),
    )
    with open(path, "wb") as f:
        f.write(hdr)
        f.write(payload)


def tdbloom_import(path: str, timeout: int | None = None) -> TdBloomFilter:
    """Load a ``!tdbloo!`` file.  ``timeout`` is required for genuine C files
    (the C format never stored it); sketchlib exports carry it in the
    name-tail extension and need no argument."""
    (magic, name_raw, size, fsize, hashcount, expected, max_time, start_time,
     nbytes, accuracy), payload = _read_exact(path, _TDBLOOM_HDR)
    if magic != TDBLOOM_MAGIC:
        raise InvalidFilterFile(f"{path}: bad magic {magic!r}")
    ext_magic, ext_timeout = _TDEXT.unpack_from(name_raw, _TDEXT_OFF)
    if timeout is None:
        if ext_magic != _TDEXT_MAGIC:
            raise InvalidFilterFile(
                f"{path}: C-format tdbloom files do not record the timeout; "
                "pass timeout= explicitly"
            )
        timeout = int(ext_timeout)
    spec = TdBloomSpec(
        int(expected), _f32(accuracy), timeout=timeout,
        start_time=int(start_time), name=_unpack_name(name_raw),
    )
    if spec.m != size or spec.k != hashcount:
        raise InvalidFilterFile(f"{path}: geometry mismatch")
    if spec.dtype.itemsize != nbytes or (max_time and spec.max_time != max_time):
        raise InvalidFilterFile(f"{path}: timer width mismatch (timeout wrong?)")
    if len(payload) != fsize or fsize != size * nbytes:
        raise InvalidFilterFile(f"{path}: payload size mismatch")
    ticks = np.frombuffer(payload, dtype=spec.dtype).astype(np.int32)
    return TdBloomFilter(spec, ticks)


_EXPORTERS = {"bloom": bloom_export, "cbloom": cbloom_export, "tdbloom": tdbloom_export}
_IMPORTERS = {
    BLOOM_MAGIC: ("bloom", bloom_import),
    CBLOOM_MAGIC: ("cbloom", cbloom_import),
    TDBLOOM_MAGIC: ("tdbloom", tdbloom_import),
}


def export_file(kernel, path: str) -> None:
    kind = kernel.spec.kind
    if kind not in _EXPORTERS:
        raise InvalidFilterFile(f"kind {kind} has no archbloom file format")
    _EXPORTERS[kind](kernel, path)


def import_file(path: str, **kw):
    """Sniff the magic and dispatch; returns the loaded kernel."""
    with open(path, "rb") as f:
        magic = f.read(8)
    if magic not in _IMPORTERS:
        raise InvalidFilterFile(f"{path}: unknown magic {magic!r}")
    return _IMPORTERS[magic][1](path, **kw)


# -- cuckoo (native C layout) --------------------------------------------
# The reference's cuckoo_save/cuckoo_load (src/cuckoo.c:205-301) have no
# magic: the file is the raw in-memory struct (src/cuckoo.h:18-27, x86-64
# layout: two heap pointers land in the file and are ignored by the C
# loader) followed by num_buckets*bucket_size uint32 fingerprint slots and
# num_buckets size_t insertion counters.  The C loader's only sanity check
# is the exact-file-size formula, reproduced here.
_CUCKOO_HDR = struct.Struct("<QQQQQQQI4x")  # bucketsPtr nb bs kicks total insPtr evict prng


@dataclass
class CuckooNativeFile:
    """A reference-format cuckoo filter: the migration surface for files
    created by the C implementation.

    This is DELIBERATELY not sketchlib's corrected ``CuckooFilter``: the C
    filter's fingerprints come from ``mmh3_32`` low bits with the defects
    SURVEY.md §2.6 documents (fp==0 indistinguishable from empty, lookup
    partner ``i1 ^ (fp>>1)`` vs eviction partner ``index ^ fp`` mismatch,
    ~0.77 FPR at the defaults) — a table populated under those semantics
    can only be queried under those semantics.  This class reproduces them
    faithfully (add/lookup/remove), so a C user can import, query, extend
    and re-export their files byte-compatibly; new filters should use the
    corrected ``kernels/cuckoo.py`` instead."""

    num_buckets: int
    bucket_size: int
    max_kicks: int
    total_insertions: int
    evictions: int
    prng_state: int
    fingerprints: np.ndarray  # (num_buckets, bucket_size) uint32
    bucket_insertions: np.ndarray  # (num_buckets,) uint64

    @classmethod
    def create(
        cls, num_buckets: int, bucket_size: int = 4, max_kicks: int = 500,
        prng_seed: int = 0x9E3779B9,
    ) -> "CuckooNativeFile":
        return cls(
            num_buckets, bucket_size, max_kicks, 0, 0, prng_seed & 0xFFFFFFFF,
            np.zeros((num_buckets, bucket_size), dtype=np.uint32),
            np.zeros(num_buckets, dtype=np.uint64),
        )

    # -- the C hash scheme (src/cuckoo.c:89-93,134-138) -------------------
    def _fp_i1_i2(self, keys: list[bytes | str]):
        from sketchlib import mmh3

        data, off = mmh3.pack_strings(keys)
        h = mmh3.mmh3_x86_32(data, off, 0).astype(np.uint64)
        fp = (h & np.uint64(0xFFFF)).astype(np.int64)
        i1 = (h % np.uint64(self.num_buckets)).astype(np.int64)
        i2 = ((i1.astype(np.uint64) ^ (fp.astype(np.uint64) >> np.uint64(1)))
              % np.uint64(self.num_buckets)).astype(np.int64)
        return fp, i1, i2

    def _xorshift32(self) -> int:
        x = self.prng_state
        x ^= (x << 13) & 0xFFFFFFFF
        x ^= x >> 17
        x ^= (x << 5) & 0xFFFFFFFF
        self.prng_state = x
        return x

    def _place(self, idx: int, fp: int) -> bool:
        row = self.fingerprints[idx]
        empty = np.nonzero(row == 0)[0]
        if empty.size:
            row[empty[0]] = fp
            self.bucket_insertions[idx] += 1
            self.total_insertions += 1
            return True
        return False

    def add_strings(self, keys: list[bytes | str]) -> np.ndarray:
        """C ``cuckoo_add`` semantics per key, including the eviction walk
        whose partner index ``index ^ fp`` disagrees with the lookup's
        ``i1 ^ (fp>>1)`` (the reference defect — kept, because files must
        stay interchangeable with the C binary)."""
        fps, i1s, i2s = self._fp_i1_i2(keys)
        out = np.zeros(len(fps), dtype=bool)
        for n, (fp, i1, i2) in enumerate(zip(fps, i1s, i2s)):
            fp, i1, i2 = int(fp), int(i1), int(i2)
            if self._place(i1, fp) or self._place(i2, fp):
                out[n] = True
                continue
            index = i1 if (self._xorshift32() % 2) else i2
            for _ in range(self.max_kicks):
                b = self._xorshift32() % self.bucket_size
                evicted = int(self.fingerprints[index, b])
                self.fingerprints[index, b] = fp
                fp = evicted
                if self.bucket_insertions[index] > 0:
                    self.bucket_insertions[index] -= 1
                index = (index ^ fp) % self.num_buckets
                if self._place(index, fp):
                    out[n] = True
                    break
            else:
                self.evictions += 1
        return out

    def contains_strings(self, keys: list[bytes | str]) -> np.ndarray:
        """Vectorized C ``cuckoo_lookup``: fp present in bucket i1 or i2."""
        fps, i1s, i2s = self._fp_i1_i2(keys)
        hit1 = (self.fingerprints[i1s] == fps[:, None]).any(axis=1)
        hit2 = (self.fingerprints[i2s] == fps[:, None]).any(axis=1)
        return hit1 | hit2

    def remove_strings(self, keys: list[bytes | str]) -> np.ndarray:
        """C ``cuckoo_remove``: clear the first matching slot in i1 then i2."""
        fps, i1s, i2s = self._fp_i1_i2(keys)
        out = np.zeros(len(fps), dtype=bool)
        for n, (fp, i1, i2) in enumerate(zip(fps, i1s, i2s)):
            for idx in (int(i1), int(i2)):
                row = self.fingerprints[idx]
                hit = np.nonzero(row == int(fp))[0]
                if hit.size:
                    row[hit[0]] = 0
                    if self.bucket_insertions[idx] > 0:
                        self.bucket_insertions[idx] -= 1
                    if self.total_insertions > 0:
                        self.total_insertions -= 1
                    out[n] = True
                    break
        return out

    def load_factor(self) -> float:
        """C ``cuckoo_load_factor`` (src/cuckoo.c:199-202): insertion
        counter over capacity — inherits the reference's by-value counter
        bug only across its own save/load, not here."""
        return 100.0 * self.total_insertions / (self.num_buckets * self.bucket_size)


def cuckoo_native_export(state: CuckooNativeFile, path: str) -> None:
    """Write a file ``cuckoo_load`` (src/cuckoo.c:235-301) accepts: raw
    struct header (pointer fields zeroed — the C loader ignores them),
    fingerprint slots, per-bucket insertion counters."""
    hdr = _CUCKOO_HDR.pack(
        0, state.num_buckets, state.bucket_size, state.max_kicks,
        state.total_insertions, 0, state.evictions, state.prng_state,
    )
    with open(path, "wb") as f:
        f.write(hdr)
        f.write(np.ascontiguousarray(state.fingerprints, dtype="<u4").tobytes())
        f.write(np.ascontiguousarray(state.bucket_insertions, dtype="<u8").tobytes())


def cuckoo_native_import(path: str) -> CuckooNativeFile:
    """Read a C-created cuckoo filter file, applying the C loader's own
    exact-file-size sanity check (src/cuckoo.c:259-270)."""
    with open(path, "rb") as f:
        raw = f.read()
    if len(raw) < _CUCKOO_HDR.size:
        raise InvalidFilterFile(f"{path}: truncated cuckoo header")
    (_bptr, nb, bs, kicks, total, _iptr, evict, prng) = _CUCKOO_HDR.unpack_from(raw)
    expected = _CUCKOO_HDR.size + nb * bs * 4 + nb * 8
    if len(raw) != expected:
        raise InvalidFilterFile(
            f"{path}: size {len(raw)} != expected {expected} for geometry "
            f"({nb} buckets x {bs})"
        )
    off = _CUCKOO_HDR.size
    fps = np.frombuffer(raw, dtype="<u4", count=nb * bs, offset=off).reshape(nb, bs).copy()
    ins = np.frombuffer(raw, dtype="<u8", count=nb, offset=off + nb * bs * 4).copy()
    return CuckooNativeFile(int(nb), int(bs), int(kicks), int(total), int(evict),
                            int(prng), fps, ins)
