"""Extension operators — the LLM-data-pipeline surface (SURVEY §2.9,
X1-X5): deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding cosine), similarity search, text analysis, multimodal column
plumbing.  Library code lives in ``text`` / ``dedup`` / ``similarity``
/ ``multimodal``; the ``*_queries`` modules register oracle-checked
catalog entries."""
