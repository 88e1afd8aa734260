"""Large-scale training-data pipeline operators.

These are first-class engine components alongside the FASTDB catalog
queries: the operations a 100 TB pretraining-data pipeline runs over a
``documents`` / ``embeddings`` corpus.

- ``dedup``      — exact, prefix-blocked n-gram Jaccard, MinHash+LSH,
                   SimHash, embedding-cosine near-dup
- ``cluster``    — distributed connected components (dup clusters)
- ``ann``        — similarity search: exact, LSH-bucketed, IVF (+ persisted
                   index), PQ / IVF-PQ / residual IVF-PQ, batched queries
- ``textstats``  — token counts, quality scores, language ID, fingerprints,
                   repetition signals
- ``decontam``   — benchmark decontamination (exact n-gram + fuzzy MinHash)
- ``retrieval``  — BM25 ranked retrieval (single + batched)
- ``packing``    — concat-and-chunk sequence-packing ledger
- ``sample``     — stratified sampling, domain mixing, leakage-safe splits
- ``curate``     — the composed cleaning pipeline
- ``multimodal`` — binary media columns: schema, batch plumbing, decode
                   stubs (image/audio libs are not in the runtime image)
- ``imagededup`` — perceptual image/video dedup (pHash/dHash, banded
                   hamming pairs + cross-frame probes)
- ``audiodedup`` — perceptual audio dedup (Haitsma-Kalker fingerprints)
- ``incdedup``   — persisted incremental TEXT dedup index (id-bucketed,
                   pruned takedowns)
- ``incmedia``   — persisted incremental PERCEPTUAL media index
                   (image/video/audio methods, shared takedown engine)
"""
