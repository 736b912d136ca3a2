"""Skew-fixture probe (SURVEY §4.2 / VERDICT r4 #7): measure the
oversized-page sidecar against the naive layout.

Fixture: N_SMALL ~10 KB pages plus N_BIG ~multi-MB pages (text repeated),
extracted on a deliberately small core count so a straggler is visible.

- naive: one repartition(CORES) of everything — whichever tasks hold the
  big pages bound the stage wall (worst case: several big pages co-locate).
- sidecar: split_oversized at the 99th byte quantile, normal side
  repartition(CORES), oversized side repartitionByRange(count, url) (one
  page per task), unionByName — the wall is bounded by ONE big page.

Prints one JSON line; run best-of-N on a quiet box (co-tenant noise on
this machine reaches 2x+).  Results are recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from tesseract_rs_spark.operators.extract import extract_text
from tesseract_rs_spark.plans.partitioning import split_oversized
from tesseract_rs_spark.session import get_spark
from tesseract_rs_spark.sources.pages import pages_from_documents

CORES = 8
N_SMALL = 4000
N_BIG = 6
BIG_WORDS = 1_200_000  # ~10 MB of text each -> a real straggler unit


def main() -> None:
    spark = get_spark("skew-probe", cores=CORES)
    small = spark.range(N_SMALL).select(
        F.col("id").alias("doc_id"),
        F.lit(" ".join(f"w{i}" for i in range(180))).alias("text"),
        F.lit("en").alias("lang"),
    )
    bigtext = " ".join(f"w{i}" for i in range(BIG_WORDS))
    big = spark.range(N_BIG).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.lit(bigtext).alias("text"),
        F.lit("en").alias("lang"),
    )
    # materialize the rendered pages once so both layouts read identical
    # bytes (rendering is NOT part of the measurement)
    import tempfile

    pages_dir = tempfile.mkdtemp(prefix="skew_pages_") + "/pages"
    pages_from_documents(small.unionByName(big)).write.parquet(pages_dir)
    pages = spark.read.parquet(pages_dir)

    def run_naive() -> float:
        t0 = time.time()
        # force the adversarial-but-realistic layout: all big pages in ONE
        # task's partition (hash partitioning co-locates them by chance at
        # rate 1/CORES^(N_BIG-1); at corpus scale some task always loses)
        loaded = pages.repartition(
            CORES,
            F.when(F.length("html") > 1 << 20, F.lit(0)).otherwise(
                F.xxhash64("url")
            ),
        )
        assert extract_text(loaded).agg(F.count("*")).collect()[0][0] == (
            N_SMALL + N_BIG
        )
        return time.time() - t0

    def run_sidecar() -> float:
        t0 = time.time()
        # the big pages are 6 of 4006 rows (~0.15%): inside the default
        # 1-percent approxQuantile error band, the 0.99 quantile can read
        # the MAX and swallow them into 'normal'; tighten the error so the
        # quantile reads the small-page mass (the 1 MiB floor then gates)
        normal, oversized, _ = split_oversized(pages, relative_error=0.0005)
        n_over = oversized.count()
        assert n_over == N_BIG, n_over
        side = extract_text(oversized.repartitionByRange(n_over, "url"))
        main_part = extract_text(normal.repartition(CORES, F.xxhash64("url")))
        assert main_part.unionByName(side).agg(F.count("*")).collect()[0][
            0
        ] == (N_SMALL + N_BIG)
        return time.time() - t0

    for fn in (run_naive, run_sidecar):  # warm-up
        fn()
    naive = min(run_naive() for _ in range(3))
    sidecar = min(run_sidecar() for _ in range(3))
    print(
        json.dumps(
            {
                "cores": CORES,
                "n_small": N_SMALL,
                "n_big": N_BIG,
                "naive_colocated_sec": round(naive, 3),
                "sidecar_sec": round(sidecar, 3),
                "speedup": round(naive / sidecar, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
