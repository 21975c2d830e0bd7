"""Large-scale data-pipeline operators beyond the reference's surface.

The reference implements no relational or corpus-level operators
(SURVEY §2.10) — these modules add the ones a 100-TB training-data
pipeline needs, each expressed with Spark built-ins (higher-order array
functions, hash functions, windows) so the hot path stays inside
whole-stage codegen:

- ``text``        tokenization, quality scoring, language-ID, fingerprints
- ``dedup``       exact, MinHash+LSH, n-gram Jaccard, SimHash
- ``similarity``  brute-force cosine top-k + hyperplane-LSH ANN buckets
- ``asof``        as-of / range joins (union + window, no per-key loops)
- ``multimodal``  opaque binary columns with typed metadata + UDF plumbing
"""
