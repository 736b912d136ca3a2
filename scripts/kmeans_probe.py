"""Distributed-vs-driver k-means codebook probe (VERDICT r5 #2 evidence).

Trains the IVF coarse quantizer both ways on the same synthetic corpus
and reports wall time plus quantization quality (mean best-cosine of
every vector to its assigned centroid) and the induced cell-size
distribution.  Also demonstrates the capability the distributed trainer
exists for: an nlist PAST the driver-Lloyd budget.

Run:  python scripts/kmeans_probe.py [n_vectors] [dim]
Prints one JSON line per scenario.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pyspark.sql.functions as F

sys.path.insert(0, ".")

from tesseract_rs_spark.session import get_spark  # noqa: E402


def make_corpus(spark, n: int, dim: int, n_clusters: int):
    """n vectors in n_clusters noisy direction clusters, deterministic."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng_rows = []
            for i in ids:
                c = int(i) % n_clusters
                rng = np.random.default_rng(int(i))
                base = np.zeros(dim)
                base[c % dim] = 4.0
                base[(c * 7 + 3) % dim] = 2.0
                v = base + 0.05 * rng.standard_normal(dim)
                rng_rows.append(v.astype(np.float32))
            yield pd.DataFrame({"vec_id": ids, "embedding": rng_rows})

    return (
        spark.range(n)
        .withColumnRenamed("id", "id")
        .mapInPandas(gen, "vec_id long, embedding array<float>")
    )


def quality(spark, corpus, cents):
    """Mean best-cosine + cell-size spread under a codebook."""
    from tesseract_rs_spark.functions.similarity import ivf_assign

    cmat = np.stack([c for _, c in cents])
    cells = ivf_assign(corpus, cents, 1)
    sizes = (
        cells.groupBy("cell").count().agg(
            F.max("count").alias("mx"), F.avg("count").alias("avg")
        ).collect()[0]
    )
    # mean best-cosine via one local sample (quality metric only)
    rows = corpus.limit(4096).collect()
    mat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    mat /= np.linalg.norm(mat, axis=1)[:, None]
    best = (mat @ cmat.T).max(axis=1)
    return {
        "mean_best_cos": round(float(best.mean()), 4),
        "cell_max": int(sizes["mx"]),
        "cell_avg": round(float(sizes["avg"]), 1),
    }


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    from tesseract_rs_spark.functions.similarity import (
        MAX_AUTO_NLIST,
        ivf_centroids_kmeans,
        ivf_centroids_kmeans_distributed,
        kmeans_sample_size,
    )

    spark = get_spark("kmeans-probe", cores=32)
    corpus = make_corpus(spark, n, dim, n_clusters=max(4, n // 256)).cache()
    corpus.count()

    nlist = max(4, n // 256)
    for mode in ("driver", "distributed"):
        t0 = time.time()
        if mode == "driver":
            if nlist > MAX_AUTO_NLIST:
                print(json.dumps({"mode": mode, "skipped": f"nlist {nlist} > budget"}))
                continue
            cents = ivf_centroids_kmeans(
                corpus, nlist, sample_size=kmeans_sample_size(nlist)
            )
        else:
            cents = ivf_centroids_kmeans_distributed(corpus, nlist)
        wall = time.time() - t0
        out = {"mode": mode, "n": n, "dim": dim, "nlist": len(cents),
               "train_wall_s": round(wall, 2)}
        out.update(quality(spark, corpus, cents))
        print(json.dumps(out))

    # capability demo: nlist past the budget (distributed only)
    big = MAX_AUTO_NLIST + 256
    if n >= 2 * big:
        t0 = time.time()
        cents = ivf_centroids_kmeans_distributed(corpus, big, n_iters=4)
        print(json.dumps({
            "mode": "distributed_past_budget", "nlist": len(cents),
            "train_wall_s": round(time.time() - t0, 2),
        }))
    spark.stop()


if __name__ == "__main__":
    main()
