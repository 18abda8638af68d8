"""Extra benchmarks for the optimization round (bench.py is FROZEN for
measurement; this file is where noop-sink isolation, per-query plan dumps
and stage timing live — guide §1.4/§1.5).

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 --plans plans/r06 --tag before q1 q2 ...
  python bench_extra.py --pipeline          # stage-level pipeline timing
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = [
    "kg_triples", "pricing_summary", "shipping_priority", "region_revenue",
    "broadcast_brand_counts", "dedup_most_complete", "histogram_cutoff",
    "minhash_signature", "ngram_jaccard_docs", "ann_cosine_topk",
    "ann_lsh_topk", "lang_id", "quality_score", "two_hop_composition",
    "transitive_closure", "binned_traits", "simhash_buckets",
]


def make_spark(cores: int, shuffle_partitions: int | None = None):
    from kg_microbe_spark.session import get_spark

    return get_spark(
        app_name=f"bench_extra_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=shuffle_partitions or max(cores * 2, 8),
    )


def bench_queries(args):
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    names = args.queries or DEFAULT_QUERIES
    out = {}
    for name in names:
        fn = qs[name]
        df = fn(spark, args.sf)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        walls_count, walls_noop = [], []
        for r in range(args.reps + 1):
            spark.sparkContext.setJobDescription(f"{name} count rep{r}")
            t0 = time.time()
            fn(spark, args.sf).count()
            w = time.time() - t0
            if r > 0:
                walls_count.append(w)
        if args.noop:
            for r in range(args.reps):
                spark.sparkContext.setJobDescription(f"{name} noop rep{r}")
                t0 = time.time()
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
                walls_noop.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "count_median": round(statistics.median(walls_count), 3),
            "count_best": round(min(walls_count), 3),
            "count_all": [round(w, 3) for w in walls_count],
        }
        if walls_noop:
            out[name]["noop_median"] = round(statistics.median(walls_noop), 3)
            out[name]["noop_all"] = [round(w, 3) for w in walls_noop]
        print(f"{name}: {json.dumps(out[name])}", flush=True)
    print(json.dumps({"sf": args.sf, "queries": out}))


def bench_pipeline(args):
    """Stage-isolated pipeline timing: materialize pages once, then time
    each materialization point with the noop sink."""
    import shutil
    import tempfile

    from kg_microbe_spark.plans.pipeline import run_pipeline
    from kg_microbe_spark.sources.synthetic import lexicon_df, pages_df

    cores = min(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), 16)
    spark = make_spark(cores)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="kgms_bx_")
    try:
        pages_path = os.path.join(tmp, "pages")
        pages_df(spark, args.pages, num_partitions=64).write.mode("overwrite").parquet(pages_path)
        lexicon = lexicon_df(spark)

        def once(tag: str) -> dict:
            pages = spark.read.parquet(pages_path)
            t0 = time.time()
            res = run_pipeline(spark, pages, lexicon, dim_cache_key="bx-lex-v1")
            t_plan = time.time() - t0
            t0 = time.time()
            n = res.triples.count()
            t_triples = time.time() - t0
            t0 = time.time()
            res.nodes.count()
            t_nodes = time.time() - t0
            res.entities.unpersist(blocking=True)
            d = {"plan": round(t_plan, 2), "triples_count": round(t_triples, 2),
                 "nodes_count": round(t_nodes, 2), "n": n,
                 "wall": round(t_plan + t_triples + t_nodes, 2)}
            print(f"{tag}: {json.dumps(d)}", flush=True)
            return d

        once("cold")
        runs = [once(f"warm{r}") for r in range(args.reps)]
        med = statistics.median([r["wall"] for r in runs])
        print(json.dumps({"pages": args.pages, "median_wall": med,
                          "pages_per_sec": round(args.pages / med, 1)}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--plans", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--pipeline", action="store_true")
    ap.add_argument("--pages", type=int, default=20000)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    if args.pipeline:
        bench_pipeline(args)
    else:
        bench_queries(args)


if __name__ == "__main__":
    main()
