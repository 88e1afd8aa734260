"""Query-layer builders mirroring the reference's user-facing operations.

- ``ltcv``     — lightcurve retrieval (detections / forced / patch),
                 object infos, hot transients (reference ``src/ltcv.py``)
- ``objstats`` — per-object detection statistics gold table (the
                 reference's materialized views, ``src/ltcv.py:1537-1831``)
- ``search``   — object search over objstats + cone search
- ``spectrum`` — spectrum-followup workflow queries (``src/spectrum.py``)
- ``counts``   — version-deduplicated table counts (``src/webserver/server.py``)
"""
