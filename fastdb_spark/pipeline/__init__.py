"""Large-scale training-data pipeline operators.

These are first-class engine components alongside the FASTDB catalog
queries: the operations a 100 TB pretraining-data pipeline runs over a
``documents`` / ``embeddings`` corpus.

- ``dedup``      — exact, prefix-blocked n-gram Jaccard, MinHash+LSH,
                   SimHash, embedding-cosine near-dup
- ``ann``        — cosine top-k similarity search (exact + LSH-bucketed)
- ``textstats``  — token counts, quality scores, language ID, fingerprints
- ``multimodal`` — binary media columns: schema, batch plumbing, decode
                   stubs (image/audio libs are not in the runtime image)
"""
