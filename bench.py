"""Benchmark harness (driver contract: prints ONE JSON line).

Measures the full extraction pipeline — read pages parquet -> fused
mapInPandas extract -> aggregate — at ``$SPARK_GRAFT_SF_DIR`` on
``local[$SPARK_GRAFT_CPUS]``, plus the north rule's two-cluster-size
scaling evidence: the same job at local[N] and local[4N] on the same
input, reporting throughput at both and efficiency = (thr@4N / thr@N) / 4.

The pages corpus is derived deterministically from the sf documents table
(each document rendered into a boilerplate-wrapped HTML page, replicated
to BENCH_PAGES total rows with distinct urls) and cached as parquet so
repeated bench runs measure extraction, not corpus synthesis.
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
from tesseract_rs_spark.sources.pages import pages_from_documents

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "400000"))
SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") == "1"
# Scaling pair: N and 4N task slots, both sized to leave CO-TENANT
# HEADROOM.  A mapInPandas task slot keeps ~2 threads busy (JVM
# scan/Arrow + the Python worker), so the old cores/2 high leg (32 busy
# threads on 32 cores) competed for the whole box: any background load
# throttled ONLY the high leg and the ratio systematically read < 1
# (measured 0.70-0.78 on a loaded box vs 0.92-1.05 quiet).  At
# cores/16 -> cores/4 (4 -> 16 busy threads) both levels fit even a
# half-loaded machine, so the ratio measures OUR scaling, not the
# co-tenants' schedule (see BENCH.md r5).
SCALE_LOW = max(1, CPUS // 16)
SCALE_HIGH = max(2, CPUS // 4)
SCALING_FRACTION = 2  # scaling runs use 1/2 of the corpus to bound wall time
CACHE_ROOT = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/tesseract_rs_spark_bench")


def corpus_path() -> str:
    # cache key includes a probe-render hash so renderer changes in future
    # rounds can never silently bench a stale corpus
    import hashlib

    from tesseract_rs_spark.corpus import render_html

    probe = hashlib.sha256(render_html("probe words", 0, "en").encode()).hexdigest()[:8]
    tag = os.path.basename(os.path.normpath(SF_DIR))
    return os.path.join(CACHE_ROOT, f"pages_{tag}_{BENCH_PAGES}_{probe}.parquet")


RASTER_PAGES = int(os.environ.get("SPARK_GRAFT_RASTER_PAGES", "5000"))


def raster_corpus_path() -> str:
    import hashlib

    from tesseract_rs_spark.kernels.raster import render_page

    probe = hashlib.sha256(render_page("probe words for raster")).hexdigest()[:8]
    tag = os.path.basename(os.path.normpath(SF_DIR))
    return os.path.join(CACHE_ROOT, f"raster_{tag}_{RASTER_PAGES}_{probe}.parquet")


def ensure_raster_corpus(spark) -> str:
    from tesseract_rs_spark.sources.pages import raster_pages_from_documents

    path = raster_corpus_path()
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .withColumn("doc_id", F.col("doc_id").cast("long"))
        .limit(RASTER_PAGES)
    )
    raster_pages_from_documents(docs).repartition(64).write.mode(
        "overwrite"
    ).parquet(path)
    return path


def ensure_corpus(spark) -> str:
    path = corpus_path()
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    n_docs = docs.count()
    replicate = max(1, -(-BENCH_PAGES // n_docs))
    # distinct doc_ids per replica -> distinct urls (no key skew by design;
    # oversized-document skew is exercised separately in tests)
    replicated = (
        docs.crossJoin(spark.range(replicate).withColumnRenamed("id", "rep"))
        .withColumn("doc_id", F.col("doc_id") * replicate + F.col("rep"))
        .drop("rep")
    )
    pages = pages_from_documents(replicated)
    pages.repartition(max(64, CPUS * 4)).write.mode("overwrite").parquet(path)
    return path


def run_extract(spark, path: str, subset: int | None = None):
    """One measured pipeline run: scan -> fused extract -> aggregate."""
    pages = spark.read.parquet(path)
    if subset:
        pages = pages.filter(F.pmod(F.xxhash64("url"), F.lit(subset)) == 0)
    res = extract_text(pages, ExtractConfig(), id_cols=("url",))
    row = res.agg(
        F.count("*").alias("docs"),
        F.sum("n_chars").alias("chars"),
        F.sum(F.when(F.col("status") == "ok", 0).otherwise(1)).alias("errors"),
    ).collect()[0]
    return row["docs"], row["chars"], row["errors"]


def timed_extract(spark, path: str, subset: int | None = None):
    t0 = time.time()
    docs, chars, errors = run_extract(spark, path, subset=subset)
    return time.time() - t0, docs, chars, errors


def worker_env_probe(spark) -> dict:
    """Report the BLAS/OMP thread env as seen INSIDE a Python worker —
    if the pin in session.get_spark didn't reach the workers (VERDICT r3:
    a pre-set harness env silently defeated the old ``setdefault``), the
    raster leg runs ~4x slow and this field is the tell."""
    import pandas as pd

    def probe(it):
        import os as _os

        for _ in it:
            pass
        yield pd.DataFrame(
            {
                "openblas": [_os.environ.get("OPENBLAS_NUM_THREADS", "")],
                "omp": [_os.environ.get("OMP_NUM_THREADS", "")],
            }
        )

    row = (
        spark.range(1)
        .mapInPandas(probe, "openblas string, omp string")
        .collect()[0]
    )
    return {
        "worker_openblas_num_threads": row["openblas"],
        "worker_omp_num_threads": row["omp"],
        "driver_openblas_num_threads": os.environ.get("OPENBLAS_NUM_THREADS", ""),
    }


def main() -> None:
    results: dict = {}
    spark = get_spark("bench", cores=CPUS)
    path = ensure_corpus(spark)
    total_bytes = (
        spark.read.parquet(path).agg(F.sum(F.length("html"))).collect()[0][0]
    )

    from tesseract_rs_spark.functions.dedup import simhash
    from tesseract_rs_spark.operators.ocr import ocr_text

    raster_path = ensure_raster_corpus(spark)
    raster_pages = spark.read.parquet(raster_path)

    def timed_text():
        return timed_extract(spark, path)  # (sec, docs, chars, errors)

    def timed_words():
        t0 = time.time()
        n = (
            extract_words(spark.read.parquet(path), ExtractConfig())
            .agg(F.count("*"))
            .collect()[0][0]
        )
        return time.time() - t0, n

    def timed_raster():
        t0 = time.time()
        n = ocr_text(raster_pages).agg(F.count("*")).collect()[0][0]
        return time.time() - t0, n

    def timed_simhash():
        # dedup leg (VERDICT r2 ask #4): SimHash signatures over the full
        # page corpus text — JVM shingle-md5 + one numpy vote per batch
        t0 = time.time()
        n = (
            simhash(
                spark.read.parquet(path).select(
                    F.xxhash64("url").alias("doc_id"), "text"
                )
            )
            .agg(F.count("*"))
            .collect()[0][0]
        )
        return time.time() - t0, n

    def timed_pipeline(subset: int | None = None):
        # end-to-end curation pipeline leg (VERDICT r5 #6): the exact
        # stage chain the CLI --curate --fuzzy-dedup runs — fused
        # extract -> one-pass curate (quality + lang + exact dedup) ->
        # materialize the survivor set -> MinHash-LSH near-dup pairs ->
        # connected components -> min-url survivor anti-join
        from tesseract_rs_spark.functions.cleaning import (
            curate,
            flatten_extracted,
        )
        from tesseract_rs_spark.functions.dedup import (
            dup_clusters,
            minhash_dedup_pairs,
        )

        t0 = time.time()
        pages = spark.read.parquet(path)
        if subset:
            pages = pages.filter(
                F.pmod(F.xxhash64("url"), F.lit(subset)) == 0
            )
        curated = curate(
            flatten_extracted(
                extract_text(pages, ExtractConfig(), id_cols=("url",))
            ),
            id_col="url",
        ).localCheckpoint()
        pairs = minhash_dedup_pairs(
            curated, threshold=0.8, id_col="url"
        ).select("id_a", "id_b")
        losers = (
            dup_clusters(pairs)
            .filter("doc_id != cluster_id")
            .select(F.col("doc_id").alias("url"))
        )
        n = curated.join(losers, "url", "left_anti").count()
        return time.time() - t0, n

    # Warm each leg once, then INTERLEAVE the measured rounds: sandbox
    # co-tenant load spikes last minutes, so three back-to-back samples of
    # one leg can all land inside a spike — round-robin spreads each leg's
    # samples across the run and the per-leg median discards the spiked one.
    legs = {
        "extract_text": timed_text,
        "extract_words": timed_words,
        "ocr_text": timed_raster,
        "simhash": timed_simhash,
        "pipeline": timed_pipeline,
    }
    samples: dict = {k: [] for k in legs}
    for name, fn in legs.items():
        # warm-up for JIT + worker spin-up only; the pipeline leg warms
        # on a 1/4 hash-gated subset (its full run is the longest leg and
        # the warm run's wall is thrown away anyway)
        fn(subset=4) if name == "pipeline" else fn()
    for _ in range(3):
        for name, fn in legs.items():
            samples[name].append(fn())
    # Headline = per-leg BEST of 3 (noise only adds time; VERDICT r3 asked
    # the driver-visible number to reproduce the burst-free local record);
    # medians are recorded alongside for cross-round comparability.
    best = {k: min(v) for k, v in samples.items()}
    med = {k: sorted(v)[1] for k, v in samples.items()}
    queries_median = {k: round(v[0], 3) for k, v in med.items()}
    sec, docs, chars, _ = best["extract_text"]
    results["extract_text"] = round(sec, 3)
    docs_per_sec = docs / sec
    mb_per_sec = total_bytes / sec / 1e6
    words_sec, n_words = best["extract_words"]
    results["extract_words"] = round(words_sec, 3)
    raster_sec, n_raster = best["ocr_text"]
    results["ocr_text"] = round(raster_sec, 3)
    raster_pages_per_sec = round(n_raster / raster_sec, 1)
    sim_sec, n_sim = best["simhash"]
    results["simhash"] = round(sim_sec, 3)
    simhash_docs_per_sec = round(n_sim / sim_sec, 1)
    pipe_sec, n_survivors = best["pipeline"]
    results["pipeline"] = round(pipe_sec, 3)
    env_probe = worker_env_probe(spark)
    spark.stop()

    scaling = None
    if SCALING:
        # INTERLEAVE the levels (VERDICT r4 #4): the old all-low-then-
        # all-high order let a minutes-long co-tenant burst land entirely
        # inside one level's block, skewing the ratio (r3 read 0.87, r4
        # read a physically-meaningless 1.30 — both were one throttled
        # block, not scaling).  Rounds of adjacent (low, high) pairs put
        # both levels inside any burst window; each level's headline wall
        # is its best across rounds, and the per-round pair efficiencies
        # are reported so a noisy round is visible instead of silently
        # polluting the headline.  Each leg gets a fresh session (the
        # master string is fixed per JVM context) warmed by one unmeasured
        # run before its measured run.
        # Pin the scan split size for BOTH levels: Spark sizes file splits
        # from defaultParallelism (totalBytes/cores floor), so the low
        # leg otherwise reads the corpus as ~5 fat splits — 2 quantized
        # waves over 4 slots at ~60% utilization — while the high leg
        # gets 16 fine splits at full utilization.  That layout asymmetry
        # (not co-tenant noise) was the systematic >1 "efficiency"
        # (diagnosed r5: per-slot rates read 2.6k/3.8k/3.1k docs/s at
        # 4/8/16 slots under adaptive splits).  8m -> 64 identical splits
        # = 16 waves at 4 slots / 4 waves at 16 — both divide evenly and
        # stragglers amortize; measured pair efficiencies tighten from
        # the 0.73..1.47 adaptive-split band to 0.92..1.05.
        split_conf = {"spark.sql.files.maxPartitionBytes": "8m"}
        walls: dict = {"low": [], "high": []}
        docs_level: dict = {}
        pair_eff = []
        for _ in range(3):
            round_walls = {}
            for label, n in (("low", SCALE_LOW), ("high", SCALE_HIGH)):
                s = get_spark(f"bench-{label}", cores=n, extra_conf=split_conf)
                # warm-up on a quarter of the measured subset: it only
                # exists for JIT + worker spin-up, and a full-size warm
                # doubles the low leg's wall for nothing
                timed_extract(s, path, subset=SCALING_FRACTION * 4)
                w, d, _, _ = timed_extract(s, path, subset=SCALING_FRACTION)
                s.stop()
                walls[label].append(w)
                docs_level[label] = d
                round_walls[label] = w
            pair_eff.append(
                round(
                    (docs_level["high"] / round_walls["high"])
                    / (docs_level["low"] / round_walls["low"])
                    / (SCALE_HIGH / SCALE_LOW),
                    3,
                )
            )
        # Headline = the MEDIAN of the within-round pair efficiencies:
        # with 3 interleaved rounds it discards one throttled round in
        # EITHER direction (a burst during the low leg inflates that
        # round's pair above 1, during the high leg deflates it below —
        # both observed).  Never cross-pair best walls from different
        # rounds (cross-paired bests read 1.37 on a run whose
        # within-round pairs read 0.97/1.92/1.01), and don't pick "the
        # least-throttled round" by combined wall either — a round with
        # a throttled low leg and a clean high leg can still win that
        # selection and read super-linear (measured: 1.053 picked while
        # the median read 0.96).  The reported walls/throughputs are the
        # median round's.
        # sort INDICES, not values: rounded efficiencies can tie, and
        # .index() on a tied value would report walls from the wrong round
        med_idx = sorted(range(len(pair_eff)), key=lambda i: pair_eff[i])[
            len(pair_eff) // 2
        ]
        wl = walls["low"][med_idx]
        wh = walls["high"][med_idx]
        tl = docs_level["low"] / wl
        th = docs_level["high"] / wh
        scaling = {
            "cores_low": SCALE_LOW,
            "cores_high": SCALE_HIGH,
            "pages": int(docs_level["low"]),
            "wall_low_sec": round(wl, 3),
            "wall_high_sec": round(wh, 3),
            "walls_low_sec": [round(w, 3) for w in walls["low"]],
            "walls_high_sec": [round(w, 3) for w in walls["high"]],
            "docs_per_sec_low": round(tl, 1),
            "docs_per_sec_high": round(th, 1),
            "efficiency": pair_eff[med_idx],
            "efficiency_pairs": pair_eff,
        }

    # "value" stays the sum of the four legs every prior round recorded
    # (round-over-round comparability); the new end-to-end pipeline leg
    # is reported per-query plus its survivor count below
    four_leg_total = sum(
        v for k, v in results.items() if k != "pipeline"
    )
    out = {
        "metric": "extraction pipeline wall time (read pages -> fused mapInPandas extract -> agg)",
        "value": round(four_leg_total, 3),
        "unit": "sec",
        "queries": results,
        "sf": SF_DIR,
        "pages": int(docs),
        "corpus_mb": round(total_bytes / 1e6, 1),
        "docs_per_sec": round(docs_per_sec, 1),
        "mb_per_sec": round(mb_per_sec, 1),
        "chars_emitted": int(chars),
        "words_rows": int(n_words),
        "raster_pages": int(n_raster),
        "raster_pages_per_sec": raster_pages_per_sec,
        "simhash_docs_per_sec": simhash_docs_per_sec,
        "pipeline_survivors": int(n_survivors),
        "queries_median": queries_median,
        "env": env_probe,
        "scaling": scaling,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
