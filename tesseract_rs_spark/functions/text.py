"""Text-analysis functions for training-data pipelines.

All pure JVM-side column expressions (``pyspark.sql.functions`` only — no
Python in the hot path): token counting, quality scoring, stopword-list
language ID, and document fingerprinting.  Each op is deterministic and has
an exact ANSI-SQL twin (the driver's DuckDB oracle), so correctness is
checked end-to-end, not eyeballed.

The is_valid_word/dictionary analog of the reference
(/root/reference/src/api.rs:1003-1010) appears here as the stopword /
wordlist membership primitives.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# deterministic stopword lists for the language-ID heuristic
STOPWORDS = {
    "en": ["the", "a", "is", "of", "and"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "los", "y", "es", "las"],
}
LANG_ORDER = ["en", "de", "fr", "es"]  # argmax tie-break priority


def tokens(col: str = "text") -> Column:
    return F.split(F.col(col), " ")


def token_count(col: str = "text") -> Column:
    return F.size(tokens(col)).cast("long")


def stopword_hits(col: str = "text", lang: str = "en") -> Column:
    """Count of stopword OCCURRENCES (not distinct matches)."""
    sw = STOPWORDS[lang]
    return F.size(
        F.filter(tokens(col), lambda x: x.isin(*sw))
    ).cast("long")


def text_stats(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, n_chars, n_distinct, stopword_hits) — quality-scoring
    raw features, all codegen-able expressions."""
    return docs.select(
        F.col(id_col),
        token_count().alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.size(F.array_distinct(tokens())).cast("long").alias("n_distinct"),
        stopword_hits().alias("sw_hits"),
    )


def quality_expr(col: str = "text") -> Column:
    """The quality-score COLUMN (composable into one-pass pipelines):

    score = floor(50*min(1, n_tokens/100) + 30*(n_distinct/n_tokens)
                  + 20*min(1, 10*sw_hits/n_tokens))
    """
    nt = token_count(col).cast("double")
    nd = F.size(F.array_distinct(tokens(col))).cast("long")
    sw = stopword_hits(col)
    return F.floor(
        50.0 * F.least(F.lit(1.0), nt / 100.0)
        + 30.0 * (nd / nt)
        + 20.0 * F.least(F.lit(1.0), 10.0 * sw / nt)
    ).cast("long")


def quality_score(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic 0-100 quality score: length saturation + lexical
    diversity + stopword presence (heuristics in the spirit of public
    web-corpus quality filters; exact formula pinned for the oracle —
    see :func:`quality_expr`)."""
    return docs.select(F.col(id_col), quality_expr().alias("quality"))


def lang_pred_expr(col: str = "text") -> Column:
    """The language-ID COLUMN: stopword-list argmax with the fixed
    LANG_ORDER tie-break."""
    en, de, fr, es = (stopword_hits(col, lang) for lang in LANG_ORDER)
    return (
        F.when((en >= de) & (en >= fr) & (en >= es), "en")
        .when((de >= fr) & (de >= es), "de")
        .when(fr >= es, "fr")
        .otherwise("es")
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Stopword-list language ID with a fixed argmax tie-break order —
    a deterministic heuristic twin-able in SQL."""
    return docs.select(F.col(id_col), lang_pred_expr().alias("lang_pred"))


def fingerprint(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """sha256 content fingerprint (the per-url checksum primitive of the
    acceptance gate, BASELINE.json input_hint)."""
    return docs.select(
        F.col(id_col),
        F.sha2(F.col("text").cast("binary"), 256).alias("fingerprint"),
    )


# BPE-style pre-tokenizer: letter runs, digit runs, single punctuation —
# the shape GPT-2-family pre-tokenizers use (public), ASCII-only so the
# regex behaves identically across engines.
BPE_PRETOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def token_count_bpe(col: str = "text") -> Column:
    """Sub-word-ish token count via the BPE pre-tokenizer regex — the
    cheap proxy for 'how many LLM tokens is this document'."""
    return F.size(F.regexp_extract_all(F.col(col), F.lit(BPE_PRETOKEN_RE), F.lit(0))).cast(
        "long"
    )


def word_is_numeric(col: str = "word") -> Column:
    """All-digit word predicate (word_is_numeric,
    /root/reference/src/result_iterator.rs:158-164)."""
    return F.col(col).rlike("^[0-9]+$")


def word_in_dictionary(
    words: DataFrame, wordlist, col: str = "word"
) -> DataFrame:
    """is_valid_word / word_is_from_dictionary analog
    (/root/reference/src/api.rs:1003-1010, result_iterator.rs:145-151):
    adds ``in_dictionary`` boolean.  Small lists inline as an ``isin``
    literal (constant-folded by Catalyst); large lists broadcast-join so
    the dictionary ships once per executor, never per row."""
    wordlist = list(wordlist)
    if len(wordlist) <= 1024:
        return words.withColumn("in_dictionary", F.col(col).isin(wordlist))
    spark = words.sparkSession
    dict_df = spark.createDataFrame([(w,) for w in wordlist], f"{col} string")
    flagged = F.broadcast(dict_df.withColumn("in_dictionary", F.lit(True)))
    return words.join(flagged, col, "left").fillna(False, ["in_dictionary"])


def _ngram_array(t: Column, n: int) -> Column:
    """ALL word n-grams of a token array, positional order, via n-1
    ``zip_with`` passes over CONTIGUOUS slices.  The per-position
    ``slice(t, i+1, n)`` + ``array_join`` construction (round 2) allocated
    an array per word and dominated every shingle pipeline (~0.3 ms/doc —
    slower than the Python hashing it fed); contiguous slices + linear
    zip_with string concats are ~10x cheaper and value-identical."""
    cnt = F.size(t) - (n - 1)
    acc = F.slice(t, 1, cnt)
    for k in range(1, n):
        acc = F.zip_with(
            acc,
            F.slice(t, k + 1, cnt),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return acc


def word_shingles(col: str = "text", n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array column (JVM-side
    ``zip_with``/``slice`` — no UDF).  Documents with fewer than ``n``
    words have NO shingles (empty array), matching the SQL self-join
    formulation the oracles use — a short doc must not emit a short
    shingle."""
    t = tokens(col)
    return F.when(F.size(t) >= n, F.array_distinct(_ngram_array(t, n))).otherwise(
        F.array().cast("array<string>")
    )


def word_ngrams_all(col: str = "text", n: int = 2) -> Column:
    """ALL word n-grams (with repeats — unlike :func:`word_shingles`),
    empty for docs shorter than ``n`` words."""
    t = tokens(col)
    return F.when(F.size(t) >= n, _ngram_array(t, n)).otherwise(
        F.array().cast("array<string>")
    )


def corpus_fluency_signals(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """CCNet/Gopher-style corpus-frequency fluency signal (Wenzek et al.
    2020 filter docs by LM perplexity; Rae et al. 2021 by rare-n-gram
    fractions — both public): per doc, exact-integer ingredients of a
    bigram-frequency fluency score against statistics of the WHOLE corpus
    — (id, n_bigrams, sum_bigram_freq, n_rare_bigrams, min_bigram_freq),
    where freq = corpus-wide occurrence count of the bigram and "rare"
    means freq <= 2 (gibberish and boilerplate-free junk score high
    rare fractions; fluent text reuses common bigrams).  Consumers divide
    driver-side (rare fraction = n_rare_bigrams / n_bigrams; mean
    frequency = sum_bigram_freq / n_bigrams).

    Deliberately integer-exact instead of a log-probability: IEEE log/sum
    order differ across engines, which would break the bit-exact oracle
    contract; the integer counters carry the same ranking signal.  A
    production pipeline would swap in a pretrained KenLM via the same
    join shape.

    Scale shape: the bigram count table is vocabulary-sized (a groupBy on
    the gram string with map-side combine — the same class as the shingle
    ops); docs then join it BY GRAM, so the shuffle carries (gram,
    count) and (id, gram) pairs, never the document text."""
    grams = docs.select(
        F.col(id_col), F.explode(word_ngrams_all("text", 2)).alias("_g")
    )
    freqs = grams.groupBy("_g").agg(F.count("*").alias("_freq"))
    return (
        grams.join(freqs, "_g")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("_freq").alias("sum_bigram_freq"),
            F.sum(F.when(F.col("_freq") <= 2, 1).otherwise(0)).alias(
                "n_rare_bigrams"
            ),
            F.min("_freq").alias("min_bigram_freq"),
        )
    )


def repetition_signals(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition counters (Rae et al. 2021 quality filters,
    public): per doc, the exact-integer ingredients of the
    top-word-fraction and top-2-gram-fraction rules —
    (id, n_words, n_distinct_words, top_word_count, top_2gram_count).

    Scale shape: explode + groupBy on (id, token) — the shuffle carries
    (id, gram, partial count) keys with map-side combine, never the text;
    same class as the shingle ops."""
    words = docs.select(
        F.col(id_col), F.explode(tokens()).alias("_w")
    )
    top_word = (
        words.groupBy(id_col, "_w")
        .agg(F.count("*").alias("_c"))
        .groupBy(id_col)
        .agg(
            F.max("_c").alias("top_word_count"),
            F.count("*").alias("n_distinct_words"),
            F.sum("_c").alias("n_words"),
        )
    )
    grams = docs.select(
        F.col(id_col), F.explode(word_ngrams_all("text", 2)).alias("_g")
    )
    top_gram = (
        grams.groupBy(id_col, "_g")
        .agg(F.count("*").alias("_c"))
        .groupBy(id_col)
        .agg(F.max("_c").alias("top_2gram_count"))
    )
    return (
        top_word.join(top_gram, id_col, "left")
        .select(
            id_col,
            "n_words",
            "n_distinct_words",
            "top_word_count",
            F.coalesce("top_2gram_count", F.lit(0)).alias("top_2gram_count"),
        )
    )


def shingle_fingerprint(docs: DataFrame, id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Rolling-hash document fingerprint: the minimum md5 over word
    n-gram shingles (one-permutation minhash; winnowing-style selection)."""
    return docs.select(
        F.col(id_col),
        F.array_min(
            F.transform(word_shingles("text", n), lambda s: F.md5(s.cast("binary")))
        ).alias("shingle_fp"),
    )
