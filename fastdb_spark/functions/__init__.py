"""Scalar / column function library (SURVEY.md §2.8).

- ``photometry`` — flux<->mag, S/N, visit synthesis, MJD conversions (F1-F12)
- ``text``       — tokenization, language-ID heuristic, quality scores,
                   fingerprints, shingles (training-data pipeline)
- ``vectors``    — dense-vector dot / norm / cosine over array columns
"""
