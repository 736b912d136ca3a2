"""A/B probe for the simhash bench leg (VERDICT r5 ask #1).

Round 5's driver bench read simhash at 8.76 s vs r4's 5.22 s (-68%), and
the one hot-path diff that round was commit 38f3927: the mapInPandas
output schema changed from hardcoded ``doc_id long`` to
``docs.schema[id_col].dataType.simpleString()`` (string-id support).
That expression is DRIVER-side; for a long id the generated plan is
byte-identical — but VERDICT asked for proof, not reasoning.

This probe times three variants interleaved on the same bench corpus:

  pinned   — r4's exact code: schema string hardcoded 'doc_id long'
  current  — tesseract_rs_spark.functions.dedup.simhash as shipped
  unhex    — candidate optimization: JVM unhex()es the joined digest
             string ONCE per doc so binary (8 B/shingle) crosses Arrow
             instead of hex (16 B/shingle), and Python skips fromhex

Interleaved rounds + per-variant median/best follow the BENCH.md r5
methodology (co-tenant spikes hit one slot of the round-robin, not one
variant).  Usage:  python scripts/simhash_ab.py [rounds]
"""

from __future__ import annotations

import json
import sys
import time
from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

sys.path.insert(0, ".")

from bench import CPUS, ensure_corpus  # noqa: E402
from tesseract_rs_spark.functions.dedup import simhash, word_shingles  # noqa: E402
from tesseract_rs_spark.session import get_spark  # noqa: E402

BITS = 60
N = 3


def _vote(counts: np.ndarray, raw: bytes, n_rows: int) -> np.ndarray:
    weights = 1 << np.arange(BITS - 1, -1, -1, dtype=np.int64)
    out = np.zeros(n_rows, dtype=np.int64)
    nz = counts > 0
    if counts.sum() > 0:
        bitmat = np.unpackbits(
            np.frombuffer(raw, dtype=np.uint8).reshape(-1, 8), axis=1
        )[:, :BITS]
        starts = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        sums = np.add.reduceat(bitmat.astype(np.int64), starts[nz], axis=0)
        votes = 2 * sums - counts[nz][:, None]
        out[nz] = ((votes > 0).astype(np.int64) * weights).sum(axis=1)
    return out


def simhash_pinned(docs, id_col="doc_id"):
    """r4 code path: identical plan, schema string hardcoded."""
    hashed = docs.select(
        F.col(id_col),
        F.array_join(
            F.transform(
                word_shingles("text", N),
                lambda s: F.substring(F.md5(s.cast("binary")), 1, 16),
            ),
            "",
        ).alias("_hx"),
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hx = pdf["_hx"]
            counts = (hx.str.len() // 16).to_numpy(dtype=np.int64)
            out = _vote(counts, bytes.fromhex("".join(hx)), len(pdf))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "simhash": pd.array(out, dtype="int64")}
            )

    return hashed.mapInPandas(gen, schema=f"{id_col} long, simhash long")


def simhash_unhex(docs, id_col="doc_id"):
    """Candidate: one unhex per doc JVM-side, binary across Arrow."""
    hashed = docs.select(
        F.col(id_col),
        F.unhex(
            F.array_join(
                F.transform(
                    word_shingles("text", N),
                    lambda s: F.substring(F.md5(s.cast("binary")), 1, 16),
                ),
                "",
            )
        ).alias("_hb"),
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hb = pdf["_hb"]
            counts = (hb.str.len() // 8).to_numpy(dtype=np.int64)
            out = _vote(counts, b"".join(hb), len(pdf))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "simhash": pd.array(out, dtype="int64")}
            )

    return hashed.mapInPandas(gen, schema=f"{id_col} long, simhash long")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("simhash-ab", cores=CPUS)
    path = ensure_corpus(spark)
    src = spark.read.parquet(path).select(
        F.xxhash64("url").alias("doc_id"), "text"
    )

    variants = {
        "pinned": simhash_pinned,
        "current": simhash,
        "unhex": simhash_unhex,
    }

    # equivalence gate first: all three must agree bit-exactly on a subset
    sub = src.filter(F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(200)) == 0)
    sigs = {
        k: {r["doc_id"]: r["simhash"] for r in fn(sub).collect()}
        for k, fn in variants.items()
    }
    assert sigs["pinned"] == sigs["current"] == sigs["unhex"], "variants disagree"
    print(f"# equivalence: {len(sigs['pinned'])} docs bit-exact across variants",
          file=sys.stderr)

    def timed(fn):
        t0 = time.time()
        n = fn(src).agg(F.count("*")).collect()[0][0]
        return time.time() - t0, n

    for fn in variants.values():  # warm-up (JIT + worker spin-up)
        timed(fn)
    samples: dict = {k: [] for k in variants}
    names = list(variants)
    for r in range(rounds):
        # rotate start position per round so a multi-run co-tenant burst
        # straddling consecutive slots cannot keep landing on one variant
        for k in names[r % len(names):] + names[: r % len(names)]:
            samples[k].append(round(timed(variants[k])[0], 3))

    out = {
        k: {
            "walls": v,
            "best": min(v),
            "median": sorted(v)[len(v) // 2],
        }
        for k, v in samples.items()
    }
    base = out["pinned"]["median"]
    for k in out:
        out[k]["vs_pinned_median"] = round(out[k]["median"] / base, 3)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
