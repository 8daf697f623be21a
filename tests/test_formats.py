"""archbloom on-disk format interop (sketchlib/formats.py).

The ``tests/golden/*.bin`` fixtures were written by the *compiled reference
library itself* (bloom_save src/bloom.c:525-559, cbloom_save
src/cbloom.c:854-889; generator: bloom_init(41, 0.01f) + add foo/bar/baz,
cbloom_init(41, 0.01f, COUNTER_16BIT/4BIT) + counted adds — geometry chosen
so m % 8 == 0 and the C truncated-bitmap defect is moot).  Verified at
creation time in both directions against the compiled C code: sketchlib
exports of the same inserts are byte-identical to these files, and C
``bloom_load``/``cbloom_load`` read sketchlib-written files and answer
queries correctly.  When gcc + the reference sources are present, the live
round-trip is re-run here too."""

from __future__ import annotations

import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

from sketchlib.formats import (
    InvalidFilterFile,
    bloom_export,
    bloom_import,
    cbloom_export,
    cbloom_import,
    export_file,
    import_file,
    tdbloom_export,
    tdbloom_import,
)
from sketchlib.kernels.bloom import BloomFilter
from sketchlib.kernels.cbloom import CountingBloomFilter
from sketchlib.kernels.tdbloom import TdBloomFilter
from sketchlib.specs import BloomSpec, CBloomSpec, TdBloomSpec

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
ACC = float(np.float32(0.01))  # C float accuracy, as the reference stores it


def test_golden_bloom_import():
    bf = import_file(os.path.join(GOLDEN, "golden_bloom.bin"))
    assert isinstance(bf, BloomFilter)
    assert (bf.spec.name, bf.spec.expected, bf.m, bf.k) == ("golden", 41, 392, 6)
    assert bf.contains_strings([b"foo", b"bar", b"baz"]).all()
    assert not bf.contains_strings([b"qux"]).any()


def test_golden_bloom_export_byte_identical():
    ours = BloomFilter(BloomSpec(41, ACC, name="golden"))
    ours.update_strings([b"foo", b"bar", b"baz"])
    out = "/tmp/sl_fmt_bloom.bin"
    bloom_export(ours, out)
    with open(out, "rb") as f, open(os.path.join(GOLDEN, "golden_bloom.bin"), "rb") as g:
        assert f.read() == g.read()


def test_golden_cbloom_import_counts():
    cb = import_file(os.path.join(GOLDEN, "golden_cbloom16.bin"))
    assert isinstance(cb, CountingBloomFilter)
    assert cb.spec.counter_bits == 16 and cb.spec.name == "golden16"
    assert cb.count_strings([b"foo", b"bar", b"qux"]).tolist() == [3, 1, 0]


def test_golden_cbloom4_nibble_import():
    c4 = import_file(os.path.join(GOLDEN, "golden_cbloom4.bin"))
    assert c4.spec.counter_bits == 4
    assert c4.count_strings([b"foo"]).tolist() == [2]


def test_golden_cbloom_export_byte_identical():
    ours = CountingBloomFilter(CBloomSpec(41, ACC, counter_bits=16, name="golden16"))
    ours.update_strings([b"foo"] * 3 + [b"bar"])
    out = "/tmp/sl_fmt_cb16.bin"
    cbloom_export(ours, out)
    with open(out, "rb") as f, open(os.path.join(GOLDEN, "golden_cbloom16.bin"), "rb") as g:
        assert f.read() == g.read()


@pytest.mark.parametrize("bits", [4, 8, 16, 32, 64])
def test_cbloom_roundtrip_all_widths(bits, tmp_path):
    cb = CountingBloomFilter(
        CBloomSpec(100, float(np.float32(0.02)), counter_bits=bits, name=f"w{bits}")
    )
    cb.update_strings([b"a"] * 5 + [b"b"] * 2 + [b"c"])
    p = str(tmp_path / "cb.bin")
    export_file(cb, p)
    back = import_file(p)
    assert back.spec == cb.spec
    assert np.array_equal(back.counters, cb.counters)


def test_bloom_partial_byte_truncation(tmp_path):
    # m % 8 != 0: export loses the C-unrepresentable tail bits (documented
    # defect 1) but must stay loadable and never false-negative on bits
    # within the truncated bitmap
    spec = BloomSpec(15, ACC)  # m = 143, bitmap 17 bytes, nbytes 18
    assert spec.m % 8 != 0
    bf = BloomFilter(spec)
    keys = [f"k{i}".encode() for i in range(15)]
    bf.update_strings(keys)
    p = str(tmp_path / "b.bin")
    bloom_export(bf, p)
    assert os.path.getsize(p) == 304 + spec.m // 8
    back = bloom_import(p)
    assert back.bits[: spec.m // 8].tobytes() == bf.bits[: spec.m // 8].tobytes()
    assert back.bits[spec.m // 8 :].sum() == 0


def test_tdbloom_roundtrip_with_timeout_extension(tmp_path):
    spec = TdBloomSpec(50, ACC, timeout=600, start_time=1_700_000_000, name="td")
    td = TdBloomFilter(spec)
    td.update_strings([b"u1", b"u2"], np.array([1_700_000_100, 1_700_000_200]))
    p = str(tmp_path / "td.bin")
    tdbloom_export(td, p)
    back = tdbloom_import(p)  # timeout comes from the name-tail extension
    assert back.spec == spec
    assert np.array_equal(back.compact_state(), td.compact_state())
    asof = 1_700_000_250
    assert back.contains_strings([b"u1", b"u2"], as_of=asof).all()


def test_tdbloom_import_c_file_requires_timeout(tmp_path):
    spec = TdBloomSpec(50, 0.01, timeout=600, start_time=0, name="ctd")
    td = TdBloomFilter(spec)
    p = str(tmp_path / "ctd.bin")
    tdbloom_export(td, p)
    # scrub the sketchlib extension + max_time to mimic a genuine C save
    # (src/tdbloom.c:528-549 never sets tdbff.max_time)
    with open(p, "r+b") as f:
        data = bytearray(f.read())
        data[8 + 240 : 8 + 256] = b"\0" * 16
        struct.pack_into("<Q", data, 8 + 256 + 32, 0)  # max_time u64 field
        f.seek(0)
        f.write(data)
    with pytest.raises(InvalidFilterFile, match="timeout"):
        tdbloom_import(p)
    back = tdbloom_import(p, timeout=600)
    assert back.spec.timeout == 600 and back.spec.max_time == spec.max_time


def test_bad_magic_and_geometry_rejected(tmp_path):
    p = str(tmp_path / "junk.bin")
    with open(p, "wb") as f:
        f.write(b"!nosuch!" + b"\0" * 400)
    with pytest.raises(InvalidFilterFile):
        import_file(p)
    # valid magic, corrupted hashcount
    bf = BloomFilter(BloomSpec(41, ACC))
    bloom_export(bf, p)
    with open(p, "r+b") as f:
        data = bytearray(f.read())
        struct.pack_into("<Q", data, 8 + 256 + 8, 99)  # hashcount field
        f.seek(0)
        f.write(data)
    with pytest.raises(InvalidFilterFile):
        bloom_import(p)


REF_SRC = "/root/reference/src"
HAVE_CC = shutil.which("gcc") and os.path.exists(f"{REF_SRC}/bloom.c")


@pytest.mark.skipif(not HAVE_CC, reason="gcc + reference sources unavailable")
def test_live_c_loads_sketchlib_export(tmp_path):
    """Compile the reference's own loader and make it read a file sketchlib
    wrote — the migration path in the forward direction."""
    src = tmp_path / "ck.c"
    src.write_text(
        '#include <stdio.h>\n#include <string.h>\n#include "bloom.h"\n'
        "int main(int c, char **v) { bloomfilter b;\n"
        "  if (bloom_load(&b, v[1]) != BF_SUCCESS) return 1;\n"
        "  for (int i = 2; i < c; i++)\n"
        '    printf("%d", bloom_lookup(&b, v[i], strlen(v[i])));\n'
        "  return 0; }\n"
    )
    exe = tmp_path / "ck"
    subprocess.run(
        ["gcc", f"-I{REF_SRC}", "-z", "muldefs", "-o", str(exe), str(src),
         f"{REF_SRC}/bloom.c", f"{REF_SRC}/mmh3.c", "-lm"],
        check=True, capture_output=True,
    )
    bf = BloomFilter(BloomSpec(152, 0.01, name="live"))
    bf.update_strings([b"alpha", b"beta"])
    p = str(tmp_path / "live.bin")
    bloom_export(bf, p)
    r = subprocess.run(
        [str(exe), p, "alpha", "beta", "nope"], capture_output=True, text=True, check=True
    )
    assert r.stdout == "110"


# -- cuckoo native C layout ----------------------------------------------

def _cuckoo_golden():
    import json

    d = os.path.join(os.path.dirname(__file__), "golden")
    with open(os.path.join(d, "golden_cuckoo.json")) as f:
        meta = json.load(f)
    return os.path.join(d, "golden_cuckoo.bin"), meta


def test_cuckoo_native_import_matches_c_lookups():
    """A C-created cuckoo file (reference binary, deterministic PRNG seed)
    imports with the right geometry, and contains_strings reproduces the C
    binary's own lookup results bit for bit — including the removed key."""
    from sketchlib.formats import cuckoo_native_import

    path, meta = _cuckoo_golden()
    st = cuckoo_native_import(path)
    assert (st.num_buckets, st.bucket_size, st.max_kicks) == (
        meta["num_buckets"], meta["bucket_size"], meta["max_kicks"]
    )
    # by-value defect (src/cuckoo.c:89 takes cf by value): the C binary's
    # total_insertions/evictions increments are lost before save
    assert st.total_insertions == 0
    keys = [f"key-{i}" for i in range(200)]
    got = "".join("1" if b else "0" for b in st.contains_strings(keys))
    assert got == meta["lookups_key_0_199"]
    assert not st.contains_strings(["key-3"])[0]


def test_cuckoo_native_roundtrip_bytes(tmp_path):
    """import -> export reproduces the C file byte-for-byte outside the
    pointer fields (heap addresses the C loader ignores)."""
    from sketchlib.formats import cuckoo_native_export, cuckoo_native_import

    path, _ = _cuckoo_golden()
    orig = bytearray(open(path, "rb").read())
    out = str(tmp_path / "rt.bin")
    cuckoo_native_export(cuckoo_native_import(path), out)
    got = bytearray(open(out, "rb").read())
    for buf in (orig, got):
        buf[0:8] = b"\0" * 8    # buckets pointer
        buf[40:48] = b"\0" * 8  # bucket_insertions pointer
    assert got == orig
    # and it re-imports identically
    st = cuckoo_native_import(out)
    assert st.contains_strings(["key-10"])[0]


def test_cuckoo_native_python_build_matches_c_table():
    """Building the same filter in Python under the C semantics (same keys,
    same deterministic prng seed) yields the identical fingerprint table
    and per-bucket counters as the C-created golden — true bidirectional
    interop.  Header counter fields differ where the C binary loses them
    by value (total_insertions stays 0 in C; Python tracks it)."""
    from sketchlib.formats import CuckooNativeFile, cuckoo_native_import

    path, meta = _cuckoo_golden()
    ours = CuckooNativeFile.create(
        meta["num_buckets"], meta["bucket_size"], meta["max_kicks"],
        prng_seed=0x9E3779B9,
    )
    added = ours.add_strings([f"key-{i}" for i in range(meta["n_added"])])
    assert added.all()
    assert ours.remove_strings(meta["removed"])[0]
    theirs = cuckoo_native_import(path)
    assert (ours.fingerprints == theirs.fingerprints).all()
    assert (ours.bucket_insertions == theirs.bucket_insertions).all()
    assert ours.total_insertions == meta["n_added"] - len(meta["removed"])
    assert ours.load_factor() > 0


def test_cuckoo_native_size_sanity(tmp_path):
    from sketchlib.formats import InvalidFilterFile, cuckoo_native_import

    path, _ = _cuckoo_golden()
    bad = str(tmp_path / "bad.bin")
    with open(path, "rb") as f, open(bad, "wb") as g:
        g.write(f.read()[:-4])
    with pytest.raises(InvalidFilterFile, match="size"):
        cuckoo_native_import(bad)


@pytest.mark.skipif(not HAVE_CC, reason="gcc + reference sources unavailable")
def test_cuckoo_native_export_accepted_by_live_c(tmp_path):
    """The C binary loads a Python-exported file and its lookups agree with
    the Python state — the other interop direction, against freshly
    compiled reference sources."""
    from sketchlib.formats import CuckooNativeFile, cuckoo_native_export

    st = CuckooNativeFile.create(32, 4, 50, prng_seed=7)
    st.add_strings([f"u-{i}" for i in range(60)])
    fpath = tmp_path / "py.bin"
    cuckoo_native_export(st, str(fpath))
    src = tmp_path / "chk.c"
    src.write_text(r'''
#include <stdio.h>
#include <string.h>
#include "cuckoo.h"
int main(int argc, char **argv) {
    cuckoofilter cf;
    if (!cuckoo_load(&cf, argv[1])) return 1;
    char buf[32];
    for (int i = 0; i < 80; i++) {
        snprintf(buf, sizeof buf, "u-%d", i);
        printf("%d", cuckoo_lookup_string(cf, buf) ? 1 : 0);
    }
    printf("\n");
    return 0;
}
''')
    exe = tmp_path / "chk"
    subprocess.run(
        ["gcc", "-O2", f"-I{REF_SRC}", "-o", str(exe), str(src),
         f"{REF_SRC}/cuckoo.c", f"{REF_SRC}/mmh3.c", "-lm"],
        check=True, capture_output=True,
    )
    out = subprocess.run([str(exe), str(fpath)], check=True,
                         capture_output=True, text=True).stdout.strip()
    exp = "".join(
        "1" if b else "0"
        for b in st.contains_strings([f"u-{i}" for i in range(80)])
    )
    assert out == exp
