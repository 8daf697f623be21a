"""Local (single-process) sketch kernels: pure numpy state machines with a
uniform lifecycle —

    kernel = Kernel(spec)            # zeroed state
    kernel.update(data, offsets)     # vectorized batch ingest (Arrow framing)
    kernel.merge(other)              # associative/commutative state merge
    blob = kernel.serialize()        # state bytes (spec travels separately)
    Kernel.deserialize(spec, blob)

These are the per-partition aggregation buffers of the Spark layer
(sketchlib.spark): each executor partition builds one kernel over its Arrow
batches; the exchange merges them. They are also directly usable
single-node, mirroring the reference C API surface.
"""

from sketchlib.kernels.bloom import BloomFilter
from sketchlib.kernels.cbloom import CountingBloomFilter
from sketchlib.kernels.hll import HyperLogLog
from sketchlib.kernels.cms import CountMinSketch
from sketchlib.kernels.tdbloom import TdBloomFilter
from sketchlib.kernels.tdcbloom import TdCBloomFilter
from sketchlib.kernels.cuckoo import CuckooFilter
from sketchlib.kernels.kll import KllSketch
from sketchlib.kernels.tdigest import TDigest
from sketchlib.kernels.mg import MisraGries
from sketchlib.kernels.bottomk import BottomK
from sketchlib.kernels.sbf import SpectralBloomFilter

KERNEL_BY_KIND = {
    "bloom": BloomFilter,
    "cbloom": CountingBloomFilter,
    "hll": HyperLogLog,
    "cms": CountMinSketch,
    "tdbloom": TdBloomFilter,
    "tdcbloom": TdCBloomFilter,
    "cuckoo": CuckooFilter,
    "kll": KllSketch,
    "tdigest": TDigest,
    "mg": MisraGries,
    "bottomk": BottomK,
    "sbf": SpectralBloomFilter,
}

__all__ = [
    "BloomFilter",
    "CountingBloomFilter",
    "HyperLogLog",
    "CountMinSketch",
    "TdBloomFilter",
    "TdCBloomFilter",
    "CuckooFilter",
    "KllSketch",
    "TDigest",
    "MisraGries",
    "BottomK",
    "SpectralBloomFilter",
    "KERNEL_BY_KIND",
]
