"""Sources and sinks (SURVEY.md §2.1).

- ``alerts``  — nested avro-alert wrangling into relational rows (S2) and
                gated Kafka stream builders (S1/S10)
- ``loaders`` — SNANA-style and survey-parquet batch loaders (S6/S7)
- ``export``  — nested-lightcurve parquet export, csv/pickle/jsonl sinks (S8/S9)
- ``webtext`` — WARC/WET web-archive ingestion (Common Crawl -> documents)
- ``avro_codec``/``fits`` — dependency-free avro + FITS codecs
"""
