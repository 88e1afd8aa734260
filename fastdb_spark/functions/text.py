"""Text-analysis column functions for the training-data pipeline.

All pure Column expressions (JVM-side).  Tokenization is single-space split
to stay dialect-portable with the duckdb oracle (`string_split(text, ' ')`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic.  Deliberately small — the operator shape (per-language token
#: hit-ratio + argmax) is what matters, not classifier quality.
STOPWORDS = {
    "en": ["the", "a", "of", "to", "and", "is", "in"],
    "es": ["el", "la", "de", "que", "y", "en", "los"],
    "fr": ["le", "la", "de", "et", "un", "les", "des"],
    "de": ["der", "die", "und", "das", "ein", "zu", "mit"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokens (single-space split for oracle parity)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-flavoured proxy count: word-pieces of <=4 chars.

    ceil(len(word)/4) summed over words — approximates subword token
    counts without a vocab, good enough for budget estimation."""
    return F.aggregate(
        tokens(text),
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("long"),
    )


#: BPE-style pre-tokenizer pattern (GPT-2-flavoured, lowercase corpus):
#: a leading space binds to the following letter/digit run; punctuation
#: runs stand alone.  RE2-compatible — identical matches in Spark (Java
#: regex) and duckdb (RE2), verified by the oracle harness.
BPE_SPLIT_PATTERN = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"


def regex_token_count(text: Column) -> Column:
    """Pre-tokenizer token count: number of BPE-style pattern matches.
    The companion to the whitespace count — what a real subword tokenizer
    would see before vocab merges."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_SPLIT_PATTERN), 0)).cast(
        "long"
    )


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-shingles, each joined by a single space.

    ``transform(sequence(1, n-k+1), i -> tokens[i..i+k-1])`` — mirrors
    duckdb ``list_transform(generate_series(...), i -> l[i:i+k-1])``.
    """
    toks = tokens(text)
    n = F.size(toks)
    sh = F.transform(
        F.sequence(F.lit(1), n - (k - 1), F.lit(1)),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    # documents shorter than k tokens have NO shingles: Spark's
    # sequence(1, n-k+1, 1) throws on an empty range (unlike duckdb's
    # generate_series, which returns []), so guard with a CASE — the
    # sequence only evaluates when n >= k.  Real corpora DO contain
    # sub-k-token documents; this was a latent crash.
    return F.when(n >= F.lit(k), F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


def char_shingles(text: Column, k: int = 8) -> Column:
    """Distinct character k-grams."""
    n = F.length(text)
    sh = F.transform(
        F.sequence(F.lit(1), n - (k - 1), F.lit(1)),
        lambda i: F.substring(text, i, k),
    )
    # same empty-range guard as word_shingles (sub-k-char documents)
    return F.when(n >= F.lit(k), F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not [a-z0-9 ] (lowercase corpus)."""
    stripped = F.regexp_replace(text, "[a-z0-9 ]", "")
    return F.length(stripped) / F.greatest(F.length(text), F.lit(1))


def mean_token_len(text: Column) -> Column:
    t = tokens(text)
    total = F.aggregate(
        t, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w).cast("long")
    )
    return total / F.greatest(F.size(t), F.lit(1))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    t = tokens(text)
    hits = F.size(F.filter(t, lambda w: w.isin(STOPWORDS[lang])))
    return hits / F.greatest(F.size(t), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + mean-token-length
    band + punctuation penalty.  Deterministic, SQL-mirrorable."""
    n_tok = token_count(text)
    mtl = mean_token_len(text)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 1000), 1.0).otherwise(0.5)
    mtl_ok = F.when((mtl >= 3.0) & (mtl <= 10.0), 1.0).otherwise(0.5)
    punct_pen = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    return F.round((len_ok + mtl_ok + punct_pen) / 3.0, 6)


def lang_id(text: Column) -> Column:
    """Stopword-hit-ratio language ID: argmax over per-language ratios,
    deterministic tie-break by language code, 'und' when all ratios 0."""
    t = tokens(text)
    n = F.greatest(F.size(t), F.lit(1))

    # NB: higher-order functions interpret a two-parameter lambda as
    # (element, index) — closures must stay single-parameter
    def _hits(sw: list[str]):
        return lambda w: w.isin(sw)

    scored = [
        F.struct(
            (F.size(F.filter(t, _hits(sw))) / n).alias("score"),
            F.lit(code).alias("code"),
        )
        for code, sw in sorted(STOPWORDS.items())
    ]
    arr = F.array(*scored)
    best = F.array_max(arr)  # struct compare: score, then code (lexicographic)
    return F.when(best["score"] > 0.0, best["code"]).otherwise(F.lit("und"))


def doc_fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of the whitespace-normalized text."""
    return F.md5(F.regexp_replace(F.trim(text), " +", " "))


def rolling_fingerprint(
    text: Column, base: int = 1000003, mod: int = 2147483647
) -> Column:
    """Polynomial rolling hash over whitespace tokens (Rabin-Karp shape):
    ``h = (h*base + val(token)) % mod`` folded left-to-right.

    ``val(token) = ascii(first char)*256 + length`` — deliberately simple
    so the duckdb oracle reproduces it bit-for-bit.  ``mod = 2^31-1``
    keeps ``acc*base < 2^51``: exact in int64 on both engines.  Unlike
    the md5 fingerprint this is order-sensitive and incrementally
    updatable (streaming append recomputes O(1) per token)."""
    vals = F.transform(
        tokens(text),
        lambda w: F.ascii(w).cast("long") * 256 + F.length(w).cast("long"),
    )
    return F.aggregate(
        vals,
        F.lit(0).cast("long"),
        lambda acc, v: (acc * base + v) % mod,
    )


def prefix_fingerprint(text: Column, n_tokens: int = 8) -> Column:
    """Blocking fingerprint: md5 of the first ``n_tokens`` tokens."""
    return F.md5(F.array_join(F.slice(tokens(text), 1, n_tokens), " "))


#: PII patterns — kept to syntax Java regex (Spark) and RE2 (duckdb)
#: interpret identically: character classes, bounded repeats, \b anchors.
#: Order matters: emails first (their local parts contain digit runs),
#: then IPv4, then long digit runs (phone/account numbers).
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    (r"\b[0-9]{7,}\b", "<NUMBER>"),
]


def redact_pii(text: Column) -> Column:
    """Scrub common PII shapes (emails, IPv4s, long digit runs) with typed
    placeholder tokens — the standard pre-training corpus hygiene pass.
    Pure ``regexp_replace`` chain: whole-stage-codegen JVM execution, no
    UDF, and the same patterns run verbatim on the duckdb oracle."""
    out = text
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out
