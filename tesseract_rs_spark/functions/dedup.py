"""Deduplication operators for training-data pipelines.

Three tiers, each with the scale path spelled out:

- **exact**: sha256 hash-groupBy — one shuffle on the digest; at 100 TB the
  digest (32 B) shuffles, never the text.
- **n-gram Jaccard**: exact pairwise similarity via a shingle self-join —
  the *verification* primitive.  Quadratic in cluster size, so it runs on
  candidate pairs, not the full corpus.
- **MinHash + LSH banding**: the scale path — signatures are computed in
  one vectorized pass (numpy inside ``mapInPandas``), band buckets shuffle
  (band_id, band_hash) keys only, candidate pairs are verified with exact
  Jaccard.  This is the standard shingle→minhash→band→bucket-join design
  (Broder 1997 / MMDS ch.3, public knowledge).

Determinism: the hash family is seeded and fixed; no ``PYTHONHASHSEED``
dependence (blake2b-based shingle hashing, not Python ``hash``).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from tesseract_rs_spark.functions.text import tokens, word_shingles

_MERSENNE_P = (1 << 61) - 1


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", col: str = "text") -> DataFrame:
    """Exact dedup: (id, keeper_id, group_size).  keeper = min id per
    digest.  Join back on keeper_id != id to drop duplicates."""
    digests = docs.select(
        F.col(id_col), F.sha2(F.col(col).cast("binary"), 256).alias("_d")
    )
    groups = digests.groupBy("_d").agg(
        F.min(id_col).alias("keeper_id"), F.count("*").alias("group_size")
    )
    return digests.join(groups, "_d").select(id_col, "keeper_id", "group_size")


def dedup_summary(docs: DataFrame, col: str = "text") -> DataFrame:
    """(n_docs, n_unique, n_dupes) one-row corpus summary."""
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.count_distinct(F.sha2(F.col(col).cast("binary"), 256)).alias("n_unique"),
    ).select(
        "n_docs",
        "n_unique",
        (F.col("n_docs") - F.col("n_unique")).alias("n_dupes"),
    )


def shingle_table(docs: DataFrame, id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(id, shingle) exploded distinct word n-grams — pure JVM transform."""
    return docs.select(
        F.col(id_col), F.explode(word_shingles("text", n)).alias("shingle")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs via shingle self-join:
    (id_a, id_b, inter, n_a, n_b, jaccard), id_a < id_b, jaccard >= t.

    Scale note: shuffles on the shingle key; a hot shingle ("of the and")
    fans out quadratically, so the scale path prefilters through
    ``minhash_pairs`` and uses this only to verify candidates.
    """
    sh = shingle_table(docs, id_col, n)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n_sh", "n_a")
    sb = sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("n_sh", "n_b")
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "n_a", "n_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (the 100 TB path)
# ---------------------------------------------------------------------------


def _hash_params(num_hashes: int, seed: int) -> tuple:
    """Universal-hash params sized so ``a*h + b`` never overflows uint64:
    ``a`` < 2^31, shingle hashes are mixed to 32 bits, so the product is
    < 2^63 and ``+ b`` (< p = 2^61-1) stays inside uint64."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 31, size=num_hashes, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE_P, size=num_hashes, dtype=np.uint64)
    return a, b


def _mersenne_mod(x: np.ndarray) -> np.ndarray:
    """x mod (2^61 - 1) for x < 2^64, pure uint64: fold the high bits down
    (2^61 ≡ 1 mod p), then one conditional subtract."""
    x = (x >> np.uint64(61)) + (x & np.uint64(_MERSENNE_P))
    return np.where(x >= _MERSENNE_P, x - np.uint64(_MERSENNE_P), x)


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, sig array<long>) MinHash signatures.

    Shingle hashing happens JVM-side (``xxhash64`` over the shingle array —
    zero Python hashing); the Python stage is one uint64 numpy broadcast
    ``min((a*h32 + b) mod (2^61-1))`` per doc — no object dtype, no Python
    bigints (the round-1 weak spot)."""
    a_params, b_params = _hash_params(num_hashes, seed)
    with_sh = docs.select(
        F.col(id_col),
        F.transform(word_shingles("text", n), lambda s: F.xxhash64(s)).alias("_sh"),
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        a = a_params[:, None]
        b = b_params[:, None]
        for pdf in batches:
            ids, sigs = [], []
            for doc_id, shingles in zip(pdf[id_col], pdf["_sh"]):
                if len(shingles) == 0:
                    sigs.append([0] * num_hashes)
                    ids.append(doc_id)
                    continue
                h64 = np.asarray(shingles, dtype=np.int64).astype(np.uint64)
                h32 = (h64 ^ (h64 >> np.uint64(32))) & np.uint64(0xFFFFFFFF)
                m = _mersenne_mod(a * h32[None, :] + b)
                sigs.append(m.min(axis=1).astype(np.int64).tolist())
                ids.append(doc_id)
            yield pd.DataFrame({id_col: ids, "sig": sigs})

    return with_sh.mapInPandas(gen, schema=f"{id_col} long, sig array<long>")


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Band the signatures and bucket-join: (id_a, id_b) candidate pairs.
    Only (band_id, band_hash, id) rows shuffle — constant bytes per doc."""
    rows_per_band = (F.size("sig") / bands).cast("int")
    banded = signatures.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda band: F.sha2(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice("sig", band * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                    ).cast("binary"),
                    256,
                ),
            )
        ).alias("band_id", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Full near-dup pipeline: minhash -> LSH candidates -> exact-Jaccard
    verification.  Returns the same schema as ``ngram_jaccard_pairs`` but
    only ever computes Jaccard on candidate pairs."""
    sigs = minhash_signatures(docs, id_col, num_hashes, n, seed)
    cands = lsh_candidate_pairs(sigs, bands, id_col)
    sh = shingle_table(docs, id_col, n)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    # verify candidates only: tag pair rows with a-side shingles, then
    # inner-join the b side on (id_b, shingle) -> intersection counts
    a_sh = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b_sh = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        cands.join(a_sh, "id_a")
        .join(b_sh, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n_sh", "n_a")
    sb = sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("n_sh", "n_b")
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "n_a", "n_b", "jaccard")
    )


def kmv_sketch(
    docs: DataFrame, k: int = 256, id_col: str = "doc_id", col: str = "text"
) -> DataFrame:
    """K-minimum-values distinct-count sketch over the corpus vocabulary
    (Bar-Yossef et al. 2002, public): hash every token to a 60-bit value,
    keep the k smallest — the k-th smallest estimates the distinct count
    as (k-1) * 2^60 / kth_min.

    Unlike HLL registers, KMV with a fixed hash is fully DETERMINISTIC,
    so the sketch itself (k-th minimum) is oracle-checkable cross-engine;
    the derived estimate's accuracy is asserted in tests.  Scale shape:
    per-partition top-k via sort-limit (map-side partial), only k hashes
    per partition reach the driver-side merge.  Returns one row
    (k, kth_min_hash, estimate)."""
    hashes = (
        docs.select(F.explode(tokens(col)).alias("_w"))
        .distinct()
        .select(
            F.conv(F.substring(F.md5(F.col("_w").cast("binary")), 1, 15), 16, 10)
            .cast("long")
            .alias("_h")
        )
    )
    kth = (
        hashes.orderBy("_h")
        .limit(k)
        .agg(F.max("_h").alias("kth_min_hash"), F.count("*").alias("_n"))
    )
    # fewer than k distinct values kept = the sketch IS the exact set
    return kth.select(
        F.lit(k).cast("long").alias("k"),
        "kth_min_hash",
        F.when(F.col("_n") < k, F.col("_n"))
        .otherwise(
            F.round((k - 1) * float(1 << 60) / F.col("kth_min_hash")).cast("long")
        )
        .cast("long")
        .alias("estimate"),
    )


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    bits: int = 60,
    n: int = 3,
) -> DataFrame:
    """(id, simhash long): 60-bit SimHash over distinct word n-gram
    shingles (md5-derived per-feature bit vectors, majority vote per bit —
    Charikar 2002, public).  Features are shingles, not unigrams: documents
    sharing a vocabulary but not phrasing must land far apart.
    Vectorized: per batch, one numpy unpackbits + vote reduction."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, out = [], []
            for doc_id, text in zip(pdf[id_col], pdf["text"]):
                words = text.split(" ") if text else []
                # docs shorter than n words have NO shingles (same edge rule
                # as functions.text.word_shingles — short docs emit 0, not a
                # truncated shingle)
                toks = sorted(
                    {
                        " ".join(words[i : i + n])
                        for i in range(len(words) - n + 1)
                    }
                )
                if not toks:
                    ids.append(doc_id)
                    out.append(0)
                    continue
                raw = np.frombuffer(
                    b"".join(hashlib.md5(t.encode()).digest()[:8] for t in toks),
                    dtype=np.uint8,
                ).reshape(len(toks), 8)
                bitmat = np.unpackbits(raw, axis=1)[:, :bits]  # (features, bits)
                # int64: uint arithmetic would wrap on negative vote sums
                votes = bitmat.sum(axis=0, dtype=np.int64) * 2 - len(toks)
                sh = np.where(votes > 0, 1, 0)
                val = 0
                for bit in sh:
                    val = (val << 1) | int(bit)
                ids.append(doc_id)
                out.append(val)
            yield pd.DataFrame({id_col: ids, "simhash": pd.array(out, dtype="int64")})

    return docs.select(id_col, "text").mapInPandas(
        gen, schema=f"{id_col} long, simhash long"
    )


def hamming64(col_a, col_b):
    """Hamming distance between two long simhash columns — JVM-side
    bit_count(xor)."""
    return F.bit_count(col_a.bitwiseXOR(col_b))
