#!/usr/bin/env python3
"""Decade-sweep probe: time registered queries (or ad-hoc variants) at a
local sf dir with cold + N warm runs, one JSON line per query.

Usage:
    LAKEFLOW_DRIVER_MEM=64g python tools/scale_probe.py <sf_dir> q1 q2 ...
    python tools/scale_probe.py <sf_dir> --variant ivfpq64   # free-param runs

Unlike bench.py --solo (fixed 6 warm runs, one query per process) this
amortizes one session across the battery — matching how SCALE.md §15/§19
recorded sf10 rows — and supports the documented free-parameter variants
(semdedup n_lists, PQ train_mod, IVF-PQ n_lists/nprobe) that the pinned
registry defaults exclude by design.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WARM = int(os.environ.get("PROBE_WARM", "3"))  # 0 → cold-only single runs
# (the right mode for the big ANN scans: they persist no tiers, so a
# warm run just repeats the cold one at 4× the wall-clock)


def variant_curation_capped(spark, sf_dir):
    """The deployment-shaped audit: cluster_bucket_cap=128 (SCALE.md §16
    cap economics) — byte-identical funnel at the measured corpora, -69%
    LSH candidates; the certified default stays uncapped."""
    from lakeflow.ext import curation

    return curation.curated_docs(spark, sf_dir, cluster_bucket_cap=128)


def variant_pagerank_adaptive(spark, sf_dir):
    """PageRank on the footer-adaptive LSH banding (bits=None → the
    occupancy-targeted depth) — the deployment config; the registered
    4-bit pin is a certification artifact whose bucket occupancy grows
    linearly with corpus size and cannot scale past ~sf1."""
    from lakeflow.ext import graph

    return graph.pagerank(spark, sf_dir)


def variant_pagerank_capped(spark, sf_dir):
    """The full graph-family deployment shape (VERDICT r7 #6): adaptive
    banding AND bucket_cap=128 — the same occupancy knob the curation
    twin certifies — so the sf10 record has the pin-vs-deployment pair
    the ANN family got in §20.2."""
    from lakeflow.ext import graph

    return graph.pagerank(spark, sf_dir, bucket_cap=128)


def variant_ann_recall_sparse(spark, sf_dir):
    """The recall harness's big-SF shape (VERDICT r7 #8): query_mod=1000
    thins the query SAMPLE 10×, cutting the ground truth's O(Nq·N) scan
    10× while recall stays an unbiased estimate — the corpus side, which
    every index must be free to return from, is untouched."""
    from lakeflow.ext import similarity

    return similarity.ann_recall(spark, sf_dir, query_mod=1000)


def variant_ivfpq64(spark, sf_dir):
    """IVF-PQ at deployment-shaped pruning (n_lists=64, nprobe=8 → 1/8 of
    the corpus codes ADC-scanned per query) — the free-parameter scale
    story beside the oracle-pinned 8/4 default, same train_mod recipe."""
    from lakeflow.ext import similarity

    return similarity.knn_ivfpq(spark, sf_dir, n_lists=64, nprobe=8, train_mod=10)


def variant_pq_train10(spark, sf_dir):
    from lakeflow.ext import similarity

    return similarity.knn_pq(spark, sf_dir, train_mod=10)


VARIANTS = {
    "ivfpq64": variant_ivfpq64,
    "pq_train10": variant_pq_train10,
    "curation_capped": variant_curation_capped,
    "pagerank_adaptive": variant_pagerank_adaptive,
    "pagerank_capped": variant_pagerank_capped,
    "ann_recall_sparse": variant_ann_recall_sparse,
}


def main() -> None:
    # argument validation up front (ADVICE r7 #4): a typo'd variant,
    # a trailing --variant, or a missing sf_dir used to raise OUTSIDE
    # the per-query try and abort the whole sweep
    if len(sys.argv) < 2:
        sys.exit(
            "usage: scale_probe.py SF_DIR [query | --variant NAME] ...\n"
            f"variants: {', '.join(sorted(VARIANTS))}"
        )
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    from bench import calibration

    from lakeflow import plancache, registry
    from lakeflow.session import get_session

    spark = get_session("lakeflow-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = registry.queries()
    cal = calibration(spark)
    print(json.dumps({"sf_dir": sf_dir, **cal}), flush=True)
    i = 0
    while i < len(names):
        if names[i] == "--variant":
            if i + 1 >= len(names):
                print(json.dumps({"q": "--variant", "err": "missing variant name"}))
                break
            name, fn = names[i + 1], VARIANTS.get(names[i + 1])
            i += 2
            if fn is None:
                print(json.dumps({"q": name, "err": f"unknown variant (have: {sorted(VARIANTS)})"}))
                continue
        else:
            name, fn = names[i], qmap.get(names[i])
            i += 1
            if fn is None:
                print(json.dumps({"q": name, "err": "unknown query name"}))
                continue
        try:
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            cold = round(time.perf_counter() - t0, 3)
            runs = []
            for _ in range(WARM):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                runs.append(round(time.perf_counter() - t0, 3))
            rec = {
                "q": name,
                "median_warm": sorted(runs)[len(runs) // 2] if runs else None,
                "cold": cold,
                "runs": runs,
                "rows": n,
            }
        except Exception as e:  # record, keep probing
            rec = {"q": name, "err": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(rec), flush=True)
        # Tiers must not leak across queries. clearCache alone is not
        # enough since the r11 plan memo: the memoized tier handles would
        # keep being served without re-running their builders' persist(),
        # so every tier-consuming query after the first would recompute
        # its tier per consumer branch (ADVICE r11). plancache.clear's
        # docstring mandates this pairing.
        spark.catalog.clearCache()
        plancache.clear(spark)
    spark.stop()


if __name__ == "__main__":
    main()
