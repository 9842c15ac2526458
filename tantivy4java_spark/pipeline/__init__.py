"""Large-scale training-data pipeline operators on top of the engine:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
similarity search (brute-force + LSH-bucketed ANN), text analysis
(lang-id, quality, token counts, fingerprints), multimodal plumbing.

All operators are pure DataFrame pipelines: built-in functions on the hot
path, Arrow-batched pandas UDFs only where SQL genuinely cannot express the
semantics (simhash bit votes, embedding hyperplane hashing)."""
