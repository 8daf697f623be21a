"""Training-data pipeline operators (SURVEY.md §2.9 north-rule extensions):
the operations a 100 TB training-data pipeline runs alongside the sketches —
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
approximate similarity search, text analysis (language-ID, quality, tokens,
fingerprints), and multimodal binary-column plumbing.

Design rule: exact set operations are pure Catalyst (explode + join + agg —
shuffle-aware, AQE-optimizable); signature computation (minhash / simhash /
embeddings) is vectorized numpy over Arrow batches via the same
mapInArrow machinery as the sketch kernels."""

from sketchlib.pipeline import dedup, multimodal, similarity, text  # noqa: F401
