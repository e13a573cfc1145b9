"""Composite relational operators.

merge.py       set-based upsert / insert-if-absent / surrogate keys
scd2.py        SCD Type-2 dimension merge + insert-only dim merge
dedup.py       exact & near-duplicate detection (hash, minhash-LSH,
               simhash, n-gram jaccard, embedding-cosine)
similarity.py  approximate nearest-neighbor search over embeddings
textstats.py   language-id, quality scoring, token counts, fingerprints
multimodal.py  binary-column (image/audio/video) plumbing over mapInPandas
"""
