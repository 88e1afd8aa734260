"""Streaming ingest and service-state machinery (SURVEY.md §2.9, §3.3-3.4).

- ``ingest`` — micro-batch silver merge: first-seen dedup, new-object
  detection, 1-arcsec spatial root association, idempotent upserts
- ``queue``  — async long-query queue state machine
"""
