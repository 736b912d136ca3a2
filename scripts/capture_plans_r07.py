"""Capture .explain(formatted) for every bench-leg / touched query into
plans/r07/<name>_<suffix>.txt.  Run from a repo tree:

    python scripts/capture_plans_r07.py <suffix> <out_dir>

The bench legs are rebuilt exactly as bench.py builds them (same source
parquet, same operators); declared queries touched this round are built
through __spark_entry__.queries() at sf0.01.
"""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F

SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "before"
OUT = sys.argv[2] if len(sys.argv) > 2 else "plans/r07"
SF01 = "/root/testdata/sf0.01"


def main() -> None:
    sys.path.insert(0, os.getcwd())
    import bench
    import __spark_entry__ as E
    from tesseract_rs_spark.config import ExtractConfig
    from tesseract_rs_spark.operators.extract import extract_text, extract_words
    from tesseract_rs_spark.operators.ocr import ocr_text
    from tesseract_rs_spark.functions.dedup import (
        dup_clusters,
        minhash_dedup_pairs,
        simhash,
    )
    from tesseract_rs_spark.functions.cleaning import curate, flatten_extracted
    from tesseract_rs_spark.session import get_spark

    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("plans-r07", cores=8)
    path = bench.ensure_corpus(spark)
    raster_path = bench.ensure_raster_corpus(spark)
    pages = spark.read.parquet(path)
    raster_pages = spark.read.parquet(raster_path)

    legs = {}
    legs["bench_extract_text"] = extract_text(pages, ExtractConfig(), id_cols=("url",)).agg(
        F.count("*").alias("docs"),
        F.sum("n_chars").alias("chars"),
        F.sum(F.when(F.col("status") == "ok", 0).otherwise(1)).alias("errors"),
    )
    legs["bench_extract_words"] = extract_words(pages, ExtractConfig()).agg(F.count("*"))
    legs["bench_ocr_text"] = ocr_text(raster_pages).agg(F.count("*"))
    legs["bench_simhash"] = simhash(
        pages.select(F.xxhash64("url").alias("doc_id"), "text")
    ).agg(F.count("*"))

    curated = curate(
        flatten_extracted(extract_text(pages, ExtractConfig(), id_cols=("url",))),
        id_col="url",
    )
    legs["bench_pipeline_curate"] = curated
    curated_ck = curated.localCheckpoint()
    pairs = minhash_dedup_pairs(curated_ck, threshold=0.8, id_col="url").select(
        "id_a", "id_b"
    )
    legs["bench_pipeline_pairs"] = pairs
    # dup_clusters is iterative (driver loop) — capture one round's shape
    # via the declared dedup_clusters query below instead.

    qnames = [
        "corpus_curation",
        "dedup_clusters",
        "fingerprint",
        "extract_words",
        "dedup_jaccard_pairs",
        "corpus_sample",
    ]
    queries = E.queries()
    for name in qnames:
        if name in queries:
            legs[f"q_{name}"] = queries[name](spark, SF01)

    for name, df in legs.items():
        p = os.path.join(OUT, f"{name}_{SUFFIX}.txt")
        with open(p, "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            ))
        print("wrote", p)
    spark.stop()


if __name__ == "__main__":
    main()
