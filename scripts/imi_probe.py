"""IMI-vs-flat-IVF quantizer probe (round 6 — evidence for the
product-grid route past the flat-codebook bound).

Corpus: n vectors in g planted duplicate groups — every member of a
group is a tiny perturbation of the group's seeded random unit
direction, so within-group cosine clears the threshold and cross-group
cosine concentrates near 0 (~N(0, 1/sqrt(dim)): at dim 64 and t=0.9 a
cross-group hit needs ~7 sigma, i.e. never).  Ground truth is therefore
closed-form: expected pairs = g * C(group_size, 2); every emitted pair
is exact-verified, so precision is 1.0 by construction and the only
question is RECALL — what fraction of true pairs the quantizer's cell
partition keeps co-bucketed.

Both miners train with the driver-Lloyd sampled trainer ('kmeans') so
the comparison isolates the QUANTIZER SHAPE (one trained partition of
the full space vs the product of two half-space partitions) from the
trainer choice, which is orthogonal (BENCH.md round-6 k-means probe).

Run:  python scripts/imi_probe.py [n_vectors] [dim] [group_size]
Prints one JSON line per scenario.
"""

from __future__ import annotations

import json
import math
import sys
import time

import numpy as np
import pyspark.sql.functions as F

sys.path.insert(0, ".")

from tesseract_rs_spark.session import get_spark  # noqa: E402

THRESHOLD = 0.9


def make_corpus(spark, n: int, dim: int, group_size: int):
    """n vectors, groups of group_size around seeded unit directions."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                g = int(i) // group_size
                base = np.random.default_rng(g).standard_normal(dim)
                base /= np.linalg.norm(base)
                noise = 0.02 * np.random.default_rng(int(i) + 10**9).standard_normal(dim)
                rows.append((base + noise).astype(np.float32))
            yield pd.DataFrame({"vec_id": ids, "embedding": rows})

    return spark.range(n).mapInPandas(gen, "vec_id long, embedding array<float>")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    group_size = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    from tesseract_rs_spark.functions.similarity import (
        embedding_dup_pairs_imi,
        embedding_dup_pairs_ivf,
        imi_assign,
        imi_codebooks,
        ivf_assign,
        ivf_centroids_kmeans,
        kmeans_sample_size,
    )

    spark = get_spark("imi-probe")
    corpus = make_corpus(spark, n, dim, group_size).localCheckpoint()
    # count the trailing partial group too (review r6: with n not a
    # multiple of group_size the old g = n // group_size dropped its
    # pairs from the denominator, inflating recall)
    full, rem = divmod(n, group_size)
    g = full + (1 if rem else 0)
    expected = full * (group_size * (group_size - 1) // 2) + (
        rem * (rem - 1) // 2
    )
    nlist = max(4, n // 256)
    per_half = max(2, math.isqrt(nlist - 1) + 1)  # grid ~= nlist cells

    def run(label, miner, cells_fn):
        from tesseract_rs_spark.functions.similarity import semantic_dedup

        t0 = time.time()
        pairs = miner().localCheckpoint()
        found = pairs.count()
        wall = time.time() - t0
        # the metric that matters downstream: connected components heal
        # missing edges, so a group collapses to ONE survivor as long as
        # the found pairs keep it connected — survivor count vs the
        # ideal g is semantic_dedup-level recall
        survivors = semantic_dedup(corpus, THRESHOLD, pairs=pairs).count()
        occupied = cells_fn().select("cell").distinct().count()
        print(json.dumps({
            "scenario": label,
            "n": n, "dim": dim, "groups": g, "threshold": THRESHOLD,
            "expected_pairs": expected, "found_pairs": found,
            "pair_recall": round(found / expected, 4),
            "survivors": survivors, "ideal_survivors": g,
            "survivor_excess": round(survivors / g, 3),
            "occupied_cells": occupied,
            "wall_sec": round(wall, 1),
        }), flush=True)

    cents = ivf_centroids_kmeans(
        corpus, nlist, sample_size=kmeans_sample_size(nlist)
    )
    run(
        f"flat_ivf_nlist{nlist}",
        lambda: embedding_dup_pairs_ivf(
            corpus, THRESHOLD, n_centroids=nlist, train="kmeans"
        ),
        lambda: ivf_assign(corpus, cents, 1),
    )
    for ph, label in ((per_half, f"imi_{per_half}x{per_half}"),
                      (per_half * 2, f"imi_{per_half * 2}x{per_half * 2}")):
        lo, hi = imi_codebooks(corpus, ph, train="kmeans")
        run(
            label,
            lambda ph=ph: embedding_dup_pairs_imi(
                corpus, THRESHOLD, n_cells_per_half=ph, train="kmeans"
            ),
            lambda lo=lo, hi=hi: imi_assign(corpus, lo, hi),
        )
    spark.stop()


if __name__ == "__main__":
    main()
