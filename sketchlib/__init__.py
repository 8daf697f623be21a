"""sketchlib — a PySpark-native distributed sketch / approximate-aggregation library.

A from-scratch rebuild of the query surface of ``droberson/archbloom``
(reference, read-only at /root/reference) as mergeable, vectorized sketch
aggregators over Spark DataFrames:

- Bloom filter            (reference: src/bloom.c)
- Counting Bloom filter   (reference: src/cbloom.c)
- Time-decaying Bloom     (reference: src/tdbloom.c)
- Time-decaying counting  (reference: src/tdcbloom.c)
- Cuckoo filter           (reference: src/cuckoo.c, with published-bound fixes)
- Gaussian Naive Bayes    (reference: src/gaussiannb.c)
- HyperLogLog, Count-Min, KLL, t-digest (north-rule extensions; the
  reference README declares CMS/spectral "NOT IMPLEMENTED YET")

Architecture is idiomatic Spark, NOT a port: per-partition sketch states are
built in numpy over Arrow batches (``mapInArrow``), merged associatively at
the exchange, and probed via broadcast + vectorized pandas UDFs.
"""

__version__ = "0.1.0"

from sketchlib import mmh3  # noqa: F401
