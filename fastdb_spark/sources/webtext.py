"""WARC/WET web-archive text ingestion — the Common Crawl interchange
format LLM corpora start from.

A WET file is a sequence of records, each a ``WARC/1.0`` header block
(``WARC-Target-URI``, ``WARC-Date``, ``Content-Length`` …), a blank
line, then the extracted page text.  The canonical 100 TB shape:

- the record split rides Spark's text source with a custom ``lineSep``
  (the WARC version line) — distributed record framing with NO custom
  input format and no Python in the read path; gzip members decompress
  through the same codec path as any ``.gz`` text input,
- header fields and the body are pulled out with ``regexp_extract`` /
  ``substring_index`` column expressions (whole-stage codegen),
- malformed or non-conversion records yield NULL urls and are filtered
  — the reject-row cascade pattern (SURVEY.md P6) applied to web data.

The result lands directly in the ``documents`` shape (url, date, text)
ready for the curation pipeline (``pipeline.curate``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: WET record delimiter, anchored to a record boundary: the WARC spec
#: terminates every record with two CRLFs, so a new record can only begin
#: at ``\r\n\r\nWARC/1.0\r\n``.  Splitting on the bare version string
#: would also split wherever ``WARC/1.0`` appears inside extracted body
#: text (pages *about* web archiving occur in Common Crawl), truncating
#: that record and fabricating a malformed trailing one.  A body that
#: contains the full anchored sequence can still split (vanishingly rare);
#: the Content-Length cross-check in :func:`read_wet` catches exactly that
#: corruption and rejects the mismatched records instead of passing them
#: through silently.
WARC_SEP = "\r\n\r\nWARC/1.0\r\n"


def read_wet(
    spark: SparkSession,
    path: str,
    min_chars: int = 1,
) -> DataFrame:
    """Parse WET records under ``path`` into ``(url, warc_date, n_chars,
    text)`` — one row per conversion record.

    ``min_chars`` drops records whose extracted text is shorter (the
    warcinfo preamble and empty conversions disappear at 0 < n).
    """
    raw = spark.read.option("lineSep", WARC_SEP).text(path)
    # each split chunk = one record's headers+body (the first chunk keeps
    # its leading "WARC/1.0" version line — harmless to the header
    # regexes; a chunk with no WARC headers is preamble -> NULL url)
    rec = raw.select(
        F.regexp_extract(
            F.col("value"), r"WARC-Target-URI:\s*(\S+)", 1
        ).alias("url"),
        F.regexp_extract(
            F.col("value"), r"WARC-Date:\s*(\S+)", 1
        ).alias("warc_date"),
        F.regexp_extract(
            F.col("value"), r"WARC-Type:\s*(\S+)", 1
        ).alias("warc_type"),
        F.nullif(
            F.regexp_extract(F.col("value"), r"Content-Length:\s*(\d+)", 1),
            F.lit(""),
        ).cast("long").alias("_clen"),
        # body = everything after the first blank line following headers
        F.regexp_replace(
            F.col("value"), r"(?s)^.*?\r?\n\r?\n", ""
        ).alias("text"),
    )
    # Content-Length cross-check: with the anchored separator the body's
    # octet length equals the declared length exactly (the terminating
    # CRLFs belong to the separator), except the file's last record which
    # keeps up to 4 trailing CRLF octets.  A record whose body came out
    # shorter (separator matched inside the body) or longer is corrupt ->
    # reject-row cascade, not silent passthrough.  NULL _clen (header
    # absent) is tolerated.
    length_ok = F.col("_clen").isNull() | (
        (F.octet_length("text") >= F.col("_clen"))
        & (F.octet_length("text") <= F.col("_clen") + F.lit(4))
    )
    # F.trim strips only spaces; WET bodies end with CRLF padding
    body = F.expr("btrim(text, ' \r\n\t')")
    out = (
        rec.filter(
            (F.col("warc_type") == "conversion")
            & (F.col("url") != "")
            & length_ok
        )
        .select(
            "url",
            "warc_date",
            F.length(body).alias("n_chars"),
            body.alias("text"),
        )
        .filter(F.col("n_chars") >= min_chars)
    )
    return out


def read_warc_responses(
    spark: SparkSession,
    path: str,
) -> DataFrame:
    """Raw WARC ``response`` records → ``(url, warc_date, payload)`` where
    payload is the HTTP body (headers stripped at the first blank line) —
    the precursor format WET files are derived from.  Same distributed
    lineSep framing as :func:`read_wet`."""
    raw = spark.read.option("lineSep", WARC_SEP).text(path)
    rec = raw.select(
        F.regexp_extract(F.col("value"), r"WARC-Target-URI:\s*(\S+)", 1).alias(
            "url"
        ),
        F.regexp_extract(F.col("value"), r"WARC-Date:\s*(\S+)", 1).alias(
            "warc_date"
        ),
        F.regexp_extract(F.col("value"), r"WARC-Type:\s*(\S+)", 1).alias(
            "warc_type"
        ),
        # 1st blank line ends WARC headers, 2nd ends HTTP headers
        F.regexp_replace(
            F.col("value"), r"(?s)^.*?\r?\n\r?\n.*?\r?\n\r?\n", ""
        ).alias("payload"),
    )
    return rec.filter(
        (F.col("warc_type") == "response") & (F.col("url") != "")
    ).select("url", "warc_date", F.expr("btrim(payload, ' \r\n\t')").alias("payload"))


def extract_text_from_html(
    df: DataFrame,
    html_col: str = "payload",
    text_col: str = "text",
) -> DataFrame:
    """HTML → visible text via the stdlib parser — Arrow-batched
    ``mapInPandas`` (HTML parsing is genuinely not expressible as column
    expressions; this is the documented slow path, same policy as the
    multimodal codecs).  Drops script/style content, collapses
    whitespace.  Output keeps every input column plus ``text_col``."""
    import pandas as pd

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {text_col} string"

    def op(batches):
        from html.parser import HTMLParser

        class _Text(HTMLParser):
            SKIP = {"script", "style", "noscript", "template"}

            def __init__(self):
                super().__init__(convert_charrefs=True)
                self.parts: list[str] = []
                self._skip = 0

            def handle_starttag(self, tag, attrs):
                if tag in self.SKIP:
                    self._skip += 1

            def handle_endtag(self, tag):
                if tag in self.SKIP and self._skip:
                    self._skip -= 1

            def handle_data(self, data):
                if not self._skip and data.strip():
                    self.parts.append(data.strip())

        def extract(html: str) -> str:
            p = _Text()
            try:
                p.feed(html or "")
            except Exception:
                return ""
            return " ".join(" ".join(p.parts).split())

        for pdf in batches:
            pdf = pdf.copy()
            pdf[text_col] = pdf[html_col].map(extract)
            yield pdf

    return df.mapInPandas(op, schema=out_schema)


def wet_to_documents(
    wet: DataFrame, source: str = "commoncrawl"
) -> DataFrame:
    """Project WET rows into the engine's ``documents`` shape with a
    deterministic id (xxhash64 of url+date — stable across re-reads, the
    same idempotency trick as the ingest root ids)."""
    return wet.select(
        F.xxhash64(F.concat_ws("|", F.col("url"), F.col("warc_date"))).alias(
            "doc_id"
        ),
        F.col("text"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(source).alias("source"),
        F.col("n_chars"),
        F.col("url"),
        F.col("warc_date"),
    )
