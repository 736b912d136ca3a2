"""Round-7 optimization profiling harness (guide §1): isolates each bench
leg's sub-components with the noop sink so we time computation, not the
sink, and records /proc/loadavg around every measurement so numbers can be
judged against co-tenant load.  NOT part of the frozen bench contract —
bench.py is untouched; cite these numbers in OPTIMIZATION_r07.md.

Usage: python scripts/profile_r07.py [phase ...]
Phases: extract words raster simhash pipeline explain
"""

from __future__ import annotations

import json
import os
import sys
import time

import pyspark.sql.functions as F

from tesseract_rs_spark.config import ExtractConfig
from tesseract_rs_spark.operators.extract import extract_text, extract_words
from tesseract_rs_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def loadavg():
    with open("/proc/loadavg") as f:
        return f.read().split()[:3]


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, fn, n=3):
    spark.sparkContext.setJobDescription(name)
    best = None
    samples = []
    la0 = loadavg()
    for _ in range(n):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        samples.append(round(dt, 3))
        best = dt if best is None else min(best, dt)
    la1 = loadavg()
    print(
        json.dumps(
            {
                "leg": name,
                "best": round(best, 3),
                "samples": samples,
                "load_before": la0,
                "load_after": la1,
            }
        ),
        flush=True,
    )
    spark.sparkContext.setJobDescription(None)
    return best


def main():
    phases = sys.argv[1:] or ["extract", "words", "raster", "simhash", "pipeline"]
    import bench

    spark = get_spark("profile-r07", cores=CPUS)
    path = bench.ensure_corpus(spark)
    raster_path = bench.ensure_raster_corpus(spark)
    pages = spark.read.parquet(path)
    raster_pages = spark.read.parquet(raster_path)

    if "extract" in phases:
        # scan cost alone (url+html), then the Arrow boundary with a
        # passthrough generator, then the real kernel
        noop(pages.select("url", "html"))  # warm
        timed(spark, "scan url+html noop", lambda: noop(pages.select("url", "html")))

        def passthrough(it):
            import pandas as pd

            for pdf in it:
                yield pd.DataFrame({"url": pdf["url"], "n": pd.array([len(pdf)] * len(pdf), dtype="int64")})

        pt = pages.select("url", "html").mapInPandas(passthrough, "url string, n long")
        noop(pt)
        timed(spark, "arrow passthrough noop", lambda: noop(pt))
        et = extract_text(pages, ExtractConfig(), id_cols=("url",))
        noop(et)
        timed(spark, "extract_text noop", lambda: noop(et))
        timed(
            spark,
            "extract_text agg (bench shape)",
            lambda: et.agg(
                F.count("*"), F.sum("n_chars"), F.sum(F.when(F.col("status") == "ok", 0).otherwise(1))
            ).collect(),
        )

    if "words" in phases:
        ew = extract_words(pages, ExtractConfig())
        ew.agg(F.count("*")).collect()
        timed(spark, "extract_words agg count", lambda: ew.agg(F.count("*")).collect())
        timed(spark, "extract_words noop", lambda: noop(ew))

    if "raster" in phases:
        from tesseract_rs_spark.operators.ocr import ocr_text

        noop(raster_pages.select("url", "html"))
        timed(spark, "raster scan noop", lambda: noop(raster_pages.select("url", "html")))
        ot = ocr_text(raster_pages)
        ot.agg(F.count("*")).collect()
        timed(spark, "ocr_text agg count", lambda: ot.agg(F.count("*")).collect())

    if "simhash" in phases:
        from tesseract_rs_spark.functions.dedup import simhash

        src = pages.select(F.xxhash64("url").alias("doc_id"), "text")
        # JVM-only stage: shingles -> md5 -> array_join (no Python)
        from tesseract_rs_spark.functions.text import word_shingles

        hashed = src.select(
            "doc_id",
            F.array_join(
                F.transform(
                    word_shingles("text", 3),
                    lambda s: F.substring(F.md5(s.cast("binary")), 1, 16),
                ),
                "",
            ).alias("_hx"),
        )
        noop(hashed)
        timed(spark, "simhash JVM md5 stage noop", lambda: noop(hashed))
        sh = simhash(src)
        sh.agg(F.count("*")).collect()
        timed(spark, "simhash full agg count", lambda: sh.agg(F.count("*")).collect())

    if "pipeline" in phases:
        from tesseract_rs_spark.functions.cleaning import curate, flatten_extracted
        from tesseract_rs_spark.functions.dedup import dup_clusters, minhash_dedup_pairs

        def phase_extract_flatten():
            noop(flatten_extracted(extract_text(pages, ExtractConfig(), id_cols=("url",))))

        phase_extract_flatten()
        timed(spark, "pipeline: extract+flatten noop", phase_extract_flatten)

        def phase_curate():
            return curate(
                flatten_extracted(extract_text(pages, ExtractConfig(), id_cols=("url",))),
                id_col="url",
            ).localCheckpoint()

        t0 = time.time()
        curated = phase_curate()
        print(json.dumps({"leg": "pipeline: curate+checkpoint (1 run)", "best": round(time.time() - t0, 3)}), flush=True)

        def phase_pairs():
            return minhash_dedup_pairs(curated, threshold=0.8, id_col="url").select("id_a", "id_b").localCheckpoint()

        t0 = time.time()
        pairs = phase_pairs()
        print(json.dumps({"leg": "pipeline: minhash pairs (1 run)", "best": round(time.time() - t0, 3)}), flush=True)

        def phase_clusters():
            losers = (
                dup_clusters(pairs)
                .filter("doc_id != cluster_id")
                .select(F.col("doc_id").alias("url"))
            )
            return curated.join(losers, "url", "left_anti").count()

        t0 = time.time()
        n = phase_clusters()
        print(json.dumps({"leg": "pipeline: clusters+antijoin (1 run)", "best": round(time.time() - t0, 3), "survivors": n}), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
