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
