"""Trained byte-pair-encoding (BPE) tokenizer — the real thing, not the
regex proxy in ``functions.text``.

Shape (the standard industrial split, cf. the public Sennrich 2016
algorithm and the way open-source trainers are structured):

- **Corpus pass (distributed, once):** whitespace-token explode +
  map-side-combined ``groupBy(word).count()`` — the ONLY pass over the
  100 TB corpus.  The resulting word-type histogram is bounded by
  vocabulary size, not corpus size (~10^6-10^8 types for web text), and
  is capped at ``max_words`` types by (count desc, word) before
  training.
- **Merge training (driver, on the histogram):** classic greedy BPE on
  the word-frequency dict: repeatedly count symbol pairs weighted by
  word frequency, merge the most frequent pair (ties break to the
  lexicographically smallest pair — fully deterministic), ``n_merges``
  times.  Cost is O(types x word_len) per merge and never touches the
  corpus again.
- **Encoding (distributed, Arrow):** a Pandas UDF applying the learned
  merges with the greedy lowest-rank loop; the merge table rides along
  as a closure (a few hundred KB — broadcast by task serialization),
  and a per-batch word->pieces cache collapses the Zipfian repetition
  of natural text (each distinct word in a batch is encoded once).

Equivalence note (tested): greedy lowest-rank merging is equivalent to
applying the merge list sequentially with left-to-right non-overlapping
replacement — a merge can only ever create pairs of HIGHER rank than
itself (merging removes a boundary; any merge containing the new token
was necessarily learned later).  The duckdb oracle for the encode gate
exploits this: encoding with a fixed merge list is a chain of string
``replace`` calls over a separator-joined character string, giving the
encoder an exact cross-engine twin.

No reference twin: FASTDB has no tokenizer; this is LLM-pipeline
surface, public-literature semantics only.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: intra-word piece separator for flat-string encodings (never appears
#: in the lowercase corpus; words themselves are space-separated)
SEP = "\x1f"


# ---------------------------------------------------------------------------
# training


def word_histogram(
    df: DataFrame,
    text_col: str = "text",
    max_words: int = 32768,
    min_count: int = 1,
) -> list[tuple[str, int]]:
    """The one corpus pass: word-type counts, capped to the top
    ``max_words`` types by (count desc, word asc).

    Map-side combine does the heavy lifting; the shuffle moves one row
    per word type per partition.  The cap bounds driver memory by
    vocabulary, not corpus, size."""
    counts = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(max_words)
        .collect()
    )
    return [(r["word"], r["n"]) for r in counts]


def _merge_symbols(
    syms: tuple[str, ...], a: str, b: str
) -> tuple[str, ...]:
    """Left-to-right non-overlapping merge of the pair (a, b)."""
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe_from_histogram(
    word_freqs: Iterable[tuple[str, int]],
    n_merges: int,
) -> list[tuple[str, str]]:
    """Greedy BPE merge learning on a word-frequency histogram.

    Deterministic: best pair = max count, ties to the lexicographically
    smallest (left, right).  Returns merges in rank order."""
    freqs = {w: int(f) for w, f in word_freqs if w}
    vocab: dict[str, tuple[str, ...]] = {w: tuple(w) for w in freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for w, f in freqs.items():
            syms = vocab[w]
            for p in zip(syms, syms[1:]):
                counts[p] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w, syms in vocab.items():
            if a in syms:  # cheap pre-filter; _merge_symbols re-checks pairs
                vocab[w] = _merge_symbols(syms, a, b)
    return merges


def train_bpe(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_words: int = 32768,
    min_count: int = 1,
) -> list[tuple[str, str]]:
    """End-to-end trainer: one distributed corpus pass + driver merge
    loop on the bounded histogram."""
    return train_bpe_from_histogram(
        word_histogram(df, text_col, max_words, min_count), n_merges
    )


def merges_df(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """The merge table as a DataFrame (rank, left, right) — the
    persistable tokenizer artifact."""
    rows = [(i, a, b) for i, (a, b) in enumerate(merges)]
    schema = StructType(
        [
            StructField("rank", LongType(), False),
            StructField("left", StringType(), False),
            StructField("right", StringType(), False),
        ]
    )
    # typed Arrow local relation (r13, VERDICT r12 #7): same rows, same
    # nullable=False schema, no Python-RDD job per evaluation
    from fastdb_spark.localrel import tiny_local_df

    return tiny_local_df(spark, rows, schema)


# ---------------------------------------------------------------------------
# encoding


def _encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> tuple[str, ...]:
    """Greedy lowest-rank merge loop (equivalent to sequential merge
    application — see module docstring)."""
    pieces: tuple[str, ...] = tuple(word)
    while len(pieces) > 1:
        best_rank = None
        best_pair = None
        for p in zip(pieces, pieces[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_pair = p
        if best_pair is None:
            break
        pieces = _merge_symbols(pieces, best_pair[0], best_pair[1])
    return pieces


def encode_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode each document with the learned merges.

    Returns ``(id_col, bpe_tokens array<string>, n_bpe_tokens long)``.
    Arrow-batched ``mapInPandas``; per-batch word cache (Zipf's law does
    the rest).  The merge table is a task-serialized closure — for very
    large vocabularies persist ``merges_df`` and re-load per job instead
    of re-training (same pattern as the ANN index)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    out_schema = StructType(
        [
            df.schema[id_col],
            StructField("bpe_tokens", ArrayType(StringType()), True),
            StructField("n_bpe_tokens", LongType(), True),
        ]
    )

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, tuple[str, ...]] = {}

        def enc_doc(text: str) -> list[str]:
            toks: list[str] = []
            for w in (text or "").split(" "):
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    got = _encode_word(w, ranks)
                    cache[w] = got
                toks.extend(got)
            return toks

        for pdf in batches:
            encoded = [enc_doc(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "bpe_tokens": encoded,
                    "n_bpe_tokens": [len(e) for e in encoded],
                }
            )

    return df.select(id_col, text_col).mapInPandas(_encode, out_schema)


def encoded_flat(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flat-string view of the encoding for exact cross-engine checks.

    Rendering: the token stream (word pieces AND the literal spaces
    between words) framed by a DOUBLE separator: ``··t1··t2·· ··t3··``
    (· = ``SEP``).  The double framing is what makes a chained-replace
    oracle sound: every maximal ·-run has length exactly 2, so the merge
    pattern ``·a··b·`` can only align with two complete adjacent tokens
    (a partial-token match would need a ·-run of length 1 or 3), and
    adjacent occurrences of the same pair share no characters, so
    left-to-right non-overlapping replacement merges them all — exactly
    the BPE semantics.  Token count falls out as
    ``count("··") - n_words`` (each word contributes pieces+1 runs)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    out_schema = StructType(
        [
            df.schema[id_col],
            StructField("encoded", StringType(), True),
            StructField("n_bpe_tokens", LongType(), True),
        ]
    )
    sep2 = SEP + SEP

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, tuple[str, ...]] = {}

        def enc_doc(text: str) -> tuple[str, int]:
            parts: list[str] = [sep2]
            n = 0
            words = (text or "").split(" ")
            for wi, w in enumerate(words):
                if w:
                    got = cache.get(w)
                    if got is None:
                        got = _encode_word(w, ranks)
                        cache[w] = got
                    for piece in got:
                        parts.append(piece)
                        parts.append(sep2)
                    n += len(got)
                if wi < len(words) - 1:
                    parts.append(" ")
                    parts.append(sep2)
            return "".join(parts), n

        for pdf in batches:
            pairs = [enc_doc(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "encoded": [p[0] for p in pairs],
                    "n_bpe_tokens": [p[1] for p in pairs],
                }
            )

    return df.select(id_col, text_col).mapInPandas(_encode, out_schema)


def bpe_encode_oracle_sql(
    merges: list[tuple[str, str]],
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """duckdb twin of :func:`encoded_flat` with a FIXED merge list:
    chained left-to-right ``replace`` over the double-separator-framed
    string (see :func:`encoded_flat` for the soundness argument).

    The framing reserves ``SEP`` (U+001F): text containing that control
    character would collide with the token boundaries in BOTH engines —
    the encoder itself handles any text, only this oracle framing has
    the reservation.  The char-framing pattern uses ``[\\s\\S]`` rather
    than ``.`` because duckdb's RE2 dot does not match newline — with
    ``(.)`` any document containing ``\\n`` would be misframed and the
    oracle would diverge from the Spark encoder (which treats newlines
    as ordinary in-word characters)."""
    s = SEP
    # frame every char: leading "··", each char followed by "··" — this
    # renders the initial all-single-char token stream (spaces included
    # as stream elements)
    expr = (
        f"'{s}{s}' || regexp_replace({text_col}, '([\\s\\S])', '\\1{s}{s}', 'g')"
    )
    for a, b in merges:
        expr = f"replace({expr}, '{s}{a}{s}{s}{b}{s}', '{s}{a}{b}{s}')"
    n_words = (
        f"(length({text_col}) - length(replace({text_col}, ' ', '')) + 1)"
    )
    n_sep2 = (
        f"(length(encoded) - length(replace(encoded, '{s}{s}', ''))) / 2"
    )
    return f"""
        WITH enc AS (
          SELECT {id_col}, {expr} AS encoded, {n_words} AS n_words
          FROM {table})
        SELECT {id_col},
               md5(encoded) AS enc_md5,
               CAST({n_sep2} - n_words AS BIGINT) AS n_bpe_tokens
        FROM enc
    """


#: a fixed, self-consistent merge list for the exact-oracle encode gate
#: (every non-char element is produced by an earlier merge); generic
#: lowercase-English pairs so the gate exercises real merging depth on
#: any corpus
FIXED_MERGES: list[tuple[str, str]] = [
    ("t", "h"),
    ("th", "e"),
    ("a", "n"),
    ("i", "n"),
    ("e", "r"),
    ("o", "n"),
    ("r", "e"),
    ("a", "t"),
    ("s", "t"),
    ("e", "n"),
    ("o", "r"),
    ("l", "e"),
    ("a", "r"),
    ("a", "l"),
    ("t", "a"),
    ("ta", "b"),
    ("tab", "le"),
    ("r", "o"),
    ("ro", "w"),
    ("k", "e"),
    ("ke", "y"),
    ("v", "a"),
    ("va", "l"),
    ("s", "c"),
    ("sc", "an"),
    ("a", "s"),
    ("h", "as"),
    ("has", "h"),
]


def save_bpe(spark, merges: list[tuple[str, str]], path: str) -> None:
    """Persist the merge table as rank-ordered parquet — the tokenizer
    artifact a 100 TB pipeline trains once and ships to every job."""
    merges_df(spark, merges).write.mode("overwrite").parquet(path)


def load_bpe(spark, path: str) -> list[tuple[str, str]]:
    """Load a persisted merge table back into apply order."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [(r["left"], r["right"]) for r in rows]


def bpe_vocab(merges: list[tuple[str, str]], base: Iterable[str] = ()) -> list[str]:
    """The token vocabulary induced by a merge list: the base symbols
    (characters seen in training — pass them in, or rely on the merge
    elements) plus every merged token, in first-appearance order."""
    seen: dict[str, None] = {}
    for ch in base:
        seen.setdefault(ch, None)
    for a, b in merges:
        for el in (a, b):
            if len(el) == 1:
                seen.setdefault(el, None)
        seen.setdefault(a + b, None)
    return list(seen)
