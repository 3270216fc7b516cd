"""Bench harness: headline queries + flagship pipeline throughput.

Prints ONE JSON line:
  {"metric": "headline_suite_wall", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "pages_per_sec": <pipeline throughput>, "cpus": N}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     BENCH_PAGES (default 20000 synthetic CASIE pages for the
     triple-extraction throughput figure),
     BENCH_QUERY_TRIALS (default 3 — per-query best-of-N; the VM
     throttles ±2-3x run-to-run, single shots under-report).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary", "q02_revenue_by_nation", "q04_running_total",
    "q05_topk_per_group", "q06_sessionize", "q07_asof_join",
    "q09_exact_dedup", "q13_minhash_bands", "q14_embedding_knn",
    "q17_span_assembly", "q18_simhash", "q19_ngram_jaccard",
    "q21_ann_lsh", "q29_ner_lookback",
]

# recorded per-query (timings + trials) but NOT in headline_suite_wall,
# which keeps its round-1 composition for cross-round comparability —
# same contract as pipeline_model_inference below
EXTRA = ["q36_neardup_clusters", "q37_url_dedup", "q38_host_blocklist",
         "q39_corpus_hygiene", "q40_line_dedup", "q41_token_shards",
         "q42_dsir_weights", "q43_upsample_epochs", "q44_c4_line_clean",
         "q45_khop_neighbors", "q46_pagerank", "q47_temperature_mix",
         "q48_warc_roundtrip", "q49_semantic_dedup", "q50_pack_sequences",
         "q51_robots_gate", "q52_html_extract", "q53_bm25_topk",
         "q54_bpe_merges", "q55_triangle_counts", "q56_negative_samples",
         "q57_leakage_split", "q58_kmv_cardinality",
         "q59_label_propagation", "q60_adamic_adar", "q61_length_quantiles",
         "q62_range_join", "q63_crawl_delta", "q64_weighted_sample", "q65_shard_checksums"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("BENCH_PAGES", "20000"))

    from casie_spark.pipeline import run_pipeline
    from casie_spark.queries import QUERIES
    from casie_spark.session import get_spark
    from casie_spark.sources.documents import synth_documents

    spark = get_spark("casie_bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)

    # warm the JVM/codegen on a trivial action so timings measure the
    # queries, not session startup
    spark.range(1000).count()

    # best-of-N PER QUERY (r3 VERDICT next #7): the sandbox VM throttles
    # unpredictably (±2-3x swings on identical runs), and a single-shot
    # recording under-reports the engine whenever one query lands in a
    # throttled window.  Trials are INTERLEAVED as whole-suite sweeps —
    # a query's N trials land minutes apart instead of back-to-back, so
    # a sustained throttle window (measured: minutes-long on this VM)
    # cannot swallow all of them; same total work as consecutive
    # best-of-N.  Each trial re-plans and re-executes from the parquet
    # scan (no frame survives: track_persists releases every cache a
    # query builds internally), so the best trial is genuine recompute
    # capability, not cache reuse.
    from casie_spark.util import track_persists

    n_trials = int(os.environ.get("BENCH_QUERY_TRIALS", "3"))
    trials: dict[str, list[float]] = {name: [] for name in HEADLINE + EXTRA}
    rows: dict[str, int] = {}
    for _sweep in range(n_trials):
        for name in HEADLINE + EXTRA:
            with track_persists():
                t0 = time.perf_counter()
                rows[name] = QUERIES[name](spark, sf_dir).count()
                trials[name].append(round(time.perf_counter() - t0, 3))
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE + EXTRA:
        best = min(trials[name])
        timings[name] = round(best, 3)
        if name in HEADLINE:
            total += best
        print(f"# {name}: {best:.3f}s rows={rows[name]} "
              f"trials={trials[name]}", file=sys.stderr)

    # flagship: pages/sec triple extraction on synthetic CASIE pages.
    # The query suite above leaves cached frames and heap pressure in
    # the JVM (measured 3x slower pipeline when shared), so the
    # throughput figure gets its own session.  Input is materialized
    # and a small warmup run JITs the whole DAG first, so the figure is
    # steady-state throughput, not JVM warmup.
    spark.stop()
    spark = get_spark("casie_bench_pipe", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    docs = synth_documents(spark, n_pages, partitions=cpus * 2).persist()
    docs.count()
    run_pipeline(docs.limit(200), mode="rules").count()
    run_pipeline(docs.limit(200), mode="model").count()
    # best-of-3 BOTH modes, INTERLEAVED (rules, model, ...) for the
    # same reason as the query sweeps: the VM's throttle windows
    # outlast three consecutive ~25 s trials of one mode, but rarely a
    # spread of six.  (r5: model had best-of-2 and twice recorded a
    # throttled pair — 90.1/45.8 s on code whose interleaved A/B ratio
    # was 1.29x rules — so both modes now get equal sampling.)
    pipe_trials: dict[str, list[float]] = {"rules": [], "model": []}
    n_triples = n_triples_m = 0
    for mode in ("rules", "model", "rules", "model", "rules", "model"):
        t0 = time.perf_counter()
        n = run_pipeline(docs, mode=mode).count()
        pipe_trials[mode].append(round(time.perf_counter() - t0, 3))
        if mode == "rules":
            n_triples = n
        else:
            n_triples_m = n
    dt_pipe = min(pipe_trials["rules"])
    dt_model = min(pipe_trials["model"])
    trials["pipeline_triple_extraction"] = pipe_trials["rules"]
    trials["pipeline_model_inference"] = pipe_trials["model"]
    timings["pipeline_triple_extraction"] = round(dt_pipe, 3)
    total += dt_pipe
    pages_per_sec = n_pages / dt_pipe
    print(f"# pipeline: {dt_pipe:.3f}s pages={n_pages} triples={n_triples} "
          f"-> {pages_per_sec:.1f} pages/sec trials={pipe_trials['rules']}",
          file=sys.stderr)
    # recorded per-query only — NOT added into headline_suite_wall, so
    # the headline keeps its round-1 composition (HEADLINE queries +
    # rules pipeline) and stays comparable across rounds (ADVICE r2)
    timings["pipeline_model_inference"] = round(dt_model, 3)
    model_pps = n_pages / dt_model
    print(f"# pipeline(model): {dt_model:.3f}s pages={n_pages} "
          f"triples={n_triples_m} -> {model_pps:.1f} pages/sec "
          f"trials={pipe_trials['model']}", file=sys.stderr)

    out = {
        "metric": "headline_suite_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        # self-adjudicating artifact (r4 VERDICT next #4): EVERY sweep's
        # wall time per entry, in sweep order — min/median/max spread
        # settles throttle-vs-regression from the artifact alone.
        # Headline composition above is unchanged (still the per-query
        # minima).
        "trials": trials,
        "sf": None,
        "pages_per_sec": round(pages_per_sec, 1),
        "pages_per_sec_model": round(model_pps, 1),
        "n_pages": n_pages,
        "n_triples": n_triples,
        "cpus": cpus,
    }
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out["sf"] = float(sf) if sf.replace(".", "").isdigit() else sf
    spark.stop()

    # optional N-vs-4N scaling evidence (north_rule): same input, two
    # parallelism levels, efficiency = tput(4N) / (4 * tput(N)).
    # Default pair 4 -> 16: both map to PHYSICAL cores on this host
    # (32 logical = 16 cores x SMT; a pure-CPU probe shows 8->32
    # delivers only 2.5x cycles, capping any job at 0.63 there, while
    # 4->16 delivers 3.77x = 0.94 — see BASELINE.md).
    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        n_scale = int(os.environ.get("SCALING_PAGES", "600000"))
        n_lo = int(os.environ.get("SCALING_N", "2"))
        tput = {}
        scale_trials: dict[str, list[float]] = {}
        for c in (n_lo, n_lo * 4):
            s = get_spark(f"casie_scale_{c}", master=f"local[{c}]",
                          shuffle_partitions=c)
            d = synth_documents(s, n_scale, partitions=c * 4).persist()
            d.count()
            run_pipeline(d.limit(200), mode="rules").count()
            walls = []
            for _ in range(2):  # best-of-2: VM throttling variance
                t0 = time.perf_counter()
                run_pipeline(d, mode="rules").count()
                walls.append(round(time.perf_counter() - t0, 3))
            scale_trials[str(c)] = walls
            tput[c] = n_scale / min(walls)
            print(f"# scaling cpus={c}: {tput[c]:.1f} pages/sec "
                  f"trials={walls}", file=sys.stderr)
            s.stop()
        lo, hi = n_lo, n_lo * 4
        out["scaling"] = {
            f"pages_per_sec_{lo}": round(tput[lo], 1),
            f"pages_per_sec_{hi}": round(tput[hi], 1),
            "efficiency": round(tput[hi] / (4 * tput[lo]), 3),
            "n_pages": n_scale,
            "trials": scale_trials,
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
