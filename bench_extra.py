#!/usr/bin/env python
"""Extra (non-graded) benchmarks: per-stage build isolation with the noop
sink (optimization guide §1.4), warm-engine latency reps, and plan capture.

bench.py is FROZEN for measurement; every number used to steer round-7
optimization work comes from here and is cited in OPTIMIZATION_r07.md.

Usage:
  python bench_extra.py buildprof <cores> <corpus.parquet|testdata dir>
  python bench_extra.py gencorpus <n_docs> <out.parquet>
  python bench_extra.py latency <sf_dir>
  python bench_extra.py plans <sf_dir> <out_dir>
  python bench_extra.py suitetimes <sf_dir>
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def _read_docs(spark, sf_dir):
    from alexandria_spark.sources.tables import documents

    if sf_dir.endswith(".parquet") or os.path.exists(os.path.join(sf_dir, "_SUCCESS")):
        return spark.read.parquet(sf_dir)
    return documents(spark, sf_dir)


def gencorpus(n_docs: int, out: str) -> None:
    from alexandria_spark.session import get_spark
    from alexandria_spark.sources.bench_corpus import bench_corpus

    spark = get_spark(app="gencorpus", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    bench_corpus(spark, n_docs).write.mode("overwrite").parquet(out)
    spark.stop()


def buildprof(cores: int, sf_dir: str) -> None:
    """Stage-isolated timings of the throughput-mode build (the scaling leg
    shape: waves=1, materialize_stage1=False, keep_tf=False)."""
    from alexandria_spark.config import EngineConfig
    from alexandria_spark.plans.build import blockify, build_index, corpus_stats_pass, tokenize_docs
    from alexandria_spark.session import get_spark

    cfg = EngineConfig(num_shards=64, shuffle_partitions=32, build_waves=1,
                       block_size=4096, max_postings_per_salt=65536, keep_tf=False)
    spark = get_spark(
        app=f"buildprof-{cores}", cores=cores,
        shuffle_partitions=cfg.shuffle_partitions,
        extra={
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(256 * 1024),
        },
    )
    sc = spark.sparkContext
    docs = _read_docs(spark, sf_dir)
    n = docs.count()
    docs.limit(200).count()  # warm
    out = {"cores": cores, "n_docs": n}

    sc.setJobDescription("prof: docs scan only")
    out["scan_noop_sec"] = round(_noop(docs), 2)

    sc.setJobDescription("prof: tokenize_docs")
    out["tokenize_noop_sec"] = round(_noop(tokenize_docs(docs, cfg)), 2)

    sc.setJobDescription("prof: corpus_stats_pass + agg")
    import pyspark.sql.functions as F
    t0 = time.time()
    agg = corpus_stats_pass(docs, cfg).groupBy("kind", "key").agg(F.sum("val").alias("val"))
    pdf = agg.toPandas()
    out["stats_pass_sec"] = round(time.time() - t0, 2)
    dl = pdf[pdf["kind"] == 0]
    n_docs, avg_dl = len(dl), float(dl["val"].mean())

    sc.setJobDescription("prof: blockify (tokenize+shuffle+encode), noop sink")
    td = tokenize_docs(docs, cfg)
    out["blockify_noop_sec"] = round(
        _noop(blockify(td, cfg, n_docs, avg_dl, {})), 2)

    sc.setJobDescription("prof: full build_index throughput mode")
    tmp = tempfile.mkdtemp(prefix="buildprof_")
    t0 = time.time()
    build_index(spark, docs, os.path.join(tmp, "idx"), cfg,
                materialize_stage1=False)
    out["full_build_sec"] = round(time.time() - t0, 2)
    out["docs_per_sec"] = round(n / (time.time() - t0), 1)
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    print(json.dumps(out))


def latency(sf_dir: str, reps: int = 5) -> None:
    """Warm-engine per-query latency (median of reps) for each engine, plus
    job-count accounting per query (statusTracker job ids)."""
    from alexandria_spark.config import EngineConfig
    from alexandria_spark.plans.build import Index, build_index
    from alexandria_spark.plans.docpart import DocPartEngine, build_docpart_index
    from alexandria_spark.plans.impact import ImpactEngine, build_impact_postings
    from alexandria_spark.plans.query import QueryEngine
    from alexandria_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    cfg = EngineConfig(num_shards=64, shuffle_partitions=32, build_waves=2,
                       block_size=4096, max_postings_per_salt=65536, keep_tf=False)
    spark = get_spark(app="lat", cores=cpus, shuffle_partitions=max(32, cpus),
                      extra={"spark.scheduler.mode": "FAIR"})
    tmp = tempfile.mkdtemp(prefix="lat_")
    docs = _read_docs(spark, sf_dir)
    idx_path = os.path.join(tmp, "idx")
    build_index(spark, docs, idx_path, cfg)
    idx = Index(idx_path)
    dp = build_docpart_index(spark, docs, os.path.join(tmp, "dp"), cfg)
    build_impact_postings(spark, idx, cfg)

    QUERIES = [
        ("q_and_2", "join hash", "and"),
        ("q_and_rare", "dup join", "and"),
        ("q_and_3", "table scan merge", "and"),
        ("q_or_2", "merge sort", "or"),
        ("q_or_3", "window agg filter", "or"),
        ("q_or_hot", "the a", "or"),
        ("q_single", "vector", "or"),
        ("q_miss", "zzz_absent join", "and"),
    ]
    st = spark.sparkContext.statusTracker()

    def run(tag, serve, queries):
        res = {}
        for name, q, m in queries:
            serve(q, m)  # warm
            jobs0 = len(st.getJobIdsForGroup() or [])
            lat = []
            for _ in range(reps):
                t0 = time.time()
                serve(q, m)
                lat.append(time.time() - t0)
            res[name] = {
                "p50_sec": round(statistics.median(lat), 4),
                "min_sec": round(min(lat), 4),
                "jobs_per_query": ((len(st.getJobIdsForGroup() or []) - jobs0)
                                   / reps),
            }
        return res

    out = {}
    qe = QueryEngine(spark, idx, cfg)
    out["dist_warm"] = run("dist", lambda q, m: qe.search(q, m, 10).collect(), QUERIES[:5])
    dpe = DocPartEngine(spark, dp, cfg)
    out["docpart_warm"] = run("docpart", lambda q, m: dpe.search(q, m, 10).collect(),
                              [x for x in QUERIES if "zzz" not in x[1]])
    ie = ImpactEngine(spark, idx, cfg)
    out["impact_warm"] = run("impact", lambda q, m: ie.or_topk(q, 10),
                             [x for x in QUERIES if x[2] == "or"])
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    print(json.dumps(out, indent=1))


def concurrency(sf_dir: str) -> None:
    """Throughput under 8-in-flight per warm engine — bench.py phase-B2
    methodology (FAIR pools, mixed queries), isolated for iteration."""
    from alexandria_spark.config import EngineConfig
    from alexandria_spark.plans.build import Index, build_index
    from alexandria_spark.plans.docpart import DocPartEngine, build_docpart_index
    from alexandria_spark.plans.impact import ImpactEngine, build_impact_postings
    from alexandria_spark.session import get_spark
    import bench as _bench

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    cfg = EngineConfig(num_shards=64, shuffle_partitions=32, build_waves=2,
                       block_size=4096, max_postings_per_salt=65536, keep_tf=False)
    spark = get_spark(app="conc", cores=cpus, shuffle_partitions=max(32, cpus),
                      extra={"spark.scheduler.mode": "FAIR"})
    tmp = tempfile.mkdtemp(prefix="conc_")
    docs = _read_docs(spark, sf_dir)
    idx_path = os.path.join(tmp, "idx")
    build_index(spark, docs, idx_path, cfg)
    idx = Index(idx_path)
    dp = build_docpart_index(spark, docs, os.path.join(tmp, "dp"), cfg)
    build_impact_postings(spark, idx, cfg)
    dpe = DocPartEngine(spark, dp, cfg)
    ie = ImpactEngine(spark, idx, cfg)
    dp_queries = [(q, m) for _, q, m in _bench.QUERIES if "zzz" not in q]
    im_queries = [(q, m) for _, q, m in _bench.QUERIES if m == "or"]
    out = {}
    out["docpart"] = _bench._measure_concurrent(
        spark, lambda q, m: dpe.search(q, m, 10).collect(), dp_queries, 8, 6)
    out["impact"] = _bench._measure_concurrent(
        spark, lambda q, m: ie.or_topk(q, 10), im_queries, 8, 6)
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    print(json.dumps(out, indent=1))


def suitetimes(sf_dir: str) -> None:
    """Time every declared __spark_entry__ query individually with the noop
    sink (guide §1.4/§1.5) — the per-operator coverage sweep cited in
    OPTIMIZATION_r07.md."""
    import __spark_entry__ as entry
    from alexandria_spark.session import get_spark

    spark = get_spark(app="suite-times",
                      cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                      shuffle_partitions=32)
    out = {}
    for name, fn in entry.queries().items():
        spark.sparkContext.setJobDescription(f"suite:{name}")
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 2)
    spark.stop()
    print(json.dumps(out))


def plans(sf_dir: str, out_dir: str) -> None:
    """Capture .explain('formatted') for the warm engine query DataFrames."""
    from alexandria_spark.config import EngineConfig
    from alexandria_spark.plans.build import Index, build_index
    from alexandria_spark.plans.docpart import DocPartEngine, build_docpart_index
    from alexandria_spark.plans.query import QueryEngine
    from alexandria_spark.session import get_spark

    os.makedirs(out_dir, exist_ok=True)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    cfg = EngineConfig(num_shards=64, shuffle_partitions=32, build_waves=2,
                       block_size=4096, max_postings_per_salt=65536, keep_tf=False)
    spark = get_spark(app="plans", cores=cpus, shuffle_partitions=max(32, cpus))
    tmp = tempfile.mkdtemp(prefix="plans_")
    docs = _read_docs(spark, sf_dir)
    idx_path = os.path.join(tmp, "idx")
    build_index(spark, docs, idx_path, cfg)
    idx = Index(idx_path)
    dp = build_docpart_index(spark, docs, os.path.join(tmp, "dp"), cfg)
    qe = QueryEngine(spark, idx, cfg)
    dpe = DocPartEngine(spark, dp, cfg)
    suffix = sys.argv[4] if len(sys.argv) > 4 else "before"
    for name, df in (
        ("q_and_2_dist_warm", qe.search("join hash", "and", 10)),
        ("q_or_2_dist_warm", qe.search("merge sort", "or", 10)),
        ("q_and_2_docpart_warm", dpe.search("join hash", "and", 10)),
        ("q_or_2_docpart_warm", dpe.search("merge sort", "or", 10)),
    ):
        p = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(p)
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    print("plans written to", out_dir)


def impact_trace(sf_dir: str, out_dir: str, suffix: str) -> None:
    """Driver-loop 'plan' artifact for the impact engine + bmw: per-query
    Spark-job trace (count + descriptions are the plan of a driver-
    orchestrated path) plus the explain of the constituent payload jobs."""
    from alexandria_spark.config import EngineConfig
    from alexandria_spark.plans.build import Index, build_index
    from alexandria_spark.plans.impact import ImpactEngine, build_impact_postings
    from alexandria_spark.plans.query import search_bmw
    from alexandria_spark.session import get_spark

    os.makedirs(out_dir, exist_ok=True)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    cfg = EngineConfig(num_shards=64, shuffle_partitions=32, build_waves=2,
                       block_size=4096, max_postings_per_salt=65536, keep_tf=False)
    spark = get_spark(app="trace", cores=cpus, shuffle_partitions=max(32, cpus))
    tmp = tempfile.mkdtemp(prefix="trace_")
    docs = _read_docs(spark, sf_dir)
    idx_path = os.path.join(tmp, "idx")
    build_index(spark, docs, idx_path, cfg)
    idx = Index(idx_path)
    build_impact_postings(spark, idx, cfg)
    ie = ImpactEngine(spark, idx, cfg)
    sc = spark.sparkContext
    st = sc.statusTracker()

    for name, q in (("q_or_2_impact_warm", "merge sort"),
                    ("q_or_3_impact_warm", "window agg filter"),
                    ("q_single_impact_warm", "vector")):
        ie.or_topk(q, 10)  # warm
        jobs0 = st.getJobIdsForGroup() or []
        stats = {}
        t0 = time.time()
        hits = ie.or_topk(q, 10, _stats=stats)
        dt = time.time() - t0
        jobs1 = st.getJobIdsForGroup() or []
        new_jobs = sorted(set(jobs1) - set(jobs0))
        lines = [
            f"# {name} ({suffix}) — driver-orchestrated impact path",
            f"query: {q!r}  k=10  warm ImpactEngine, sf_dir={sf_dir}",
            f"wall: {dt*1000:.0f} ms",
            f"spark jobs this query: {len(new_jobs)} (ids {new_jobs})",
            f"stats: {stats}",
            "",
            "Payload-fetch source plan (cached impact scan):",
        ]
        p = ie.blocks.where("term_id = 0")._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        lines.append(p)
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write("\n".join(lines))

    # bmw: job trace + hits (the per-bucket eval job's shape is in the code;
    # the trace shows how many jobs/bytes a query costs end to end)
    for name, q, m in (("engines_bmw_and", "table scan merge", "and"),
                       ("engines_bmw_or", "merge sort", "or")):
        search_bmw(spark, idx, q, m, 10, cfg)  # warm-ish (plans, parquet meta)
        jobs0 = st.getJobIdsForGroup() or []
        t0 = time.time()
        hits = search_bmw(spark, idx, q, m, 10, cfg)
        dt = time.time() - t0
        new_jobs = sorted(set(st.getJobIdsForGroup() or []) - set(jobs0))
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(
                f"# {name} ({suffix}) — search_bmw collected path\n"
                f"query: {q!r} mode={m} k=10\n"
                f"wall: {dt*1000:.0f} ms\n"
                f"spark jobs this query: {len(new_jobs)}\n"
                f"hits: {hits}\n")
    spark.stop()
    print("traces written to", out_dir)


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "buildprof":
        buildprof(int(sys.argv[2]), sys.argv[3])
    elif mode == "gencorpus":
        gencorpus(int(sys.argv[2]), sys.argv[3])
    elif mode == "latency":
        latency(sys.argv[2])
    elif mode == "conc":
        concurrency(sys.argv[2])
    elif mode == "suitetimes":
        suitetimes(sys.argv[2])
    elif mode == "plans":
        plans(sys.argv[2], sys.argv[3])
    elif mode == "impact_trace":
        impact_trace(sys.argv[2], sys.argv[3], sys.argv[4])
    else:
        raise SystemExit(f"unknown mode {mode}")
