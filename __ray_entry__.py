"""Driver contract for the graft builder (Ray Data target).

entry()      — flagship parse→enrich→route→write pipeline on sf0.001.
queries()    — one callable per implemented operator family (SURVEY §2).
oracle_sql() — matching DuckDB SQL (same columns/names) per query.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in rsyslog_ray) calls ray.init()/ray.shutdown().

Transcripts-based queries run over the deterministic synthetic transcripts
table (BASELINE.json input_hint schema) generated once per scale under /tmp
by rsyslog_ray.datagen.ensure_transcripts; the oracle SQL reads the same
parquet files via read_parquet(), other queries use the pre-registered
testdata views (documents / events / embeddings).
"""

from __future__ import annotations

import shutil
from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; returns the routed-count
    metrics (impstats analogue) as a pandas DataFrame."""
    import pandas as pd

    from rsyslog_ray.pipelines.flagship import run_flagship

    out_root = "/tmp/rsyslog_ray_out/entry"
    shutil.rmtree(out_root, ignore_errors=True)
    counts = run_flagship("/root/testdata/sf0.001", out_root)
    return pd.DataFrame(
        {"action": list(counts.keys()), "rows": list(counts.values())}
    ).sort_values("action").reset_index(drop=True)


def queries() -> dict[str, Callable[[str], Any]]:
    from rsyslog_ray.datagen import ensure_transcripts
    from rsyslog_ray.pipelines import queries as Q

    ensure_transcripts("/root/testdata/sf0.01")  # oracle SQL reads this path
    # Ordering contract: all DuckDB-oracled entries precede the rows-only
    # block, and each block is sorted cheapest-first (measured sf0.01
    # wall-time, scripts/check_queries.py) — if the driver's per-round
    # budget runs out mid-list it skips the most expensive, weakest-signal
    # entries rather than a cheap fully-hashed one.
    return {
        # ---- DuckDB-oracled entries (rows+schema+hash), cheapest first
        "dynstats_tool": Q.q_dynstats_tool,
        "percentiles": Q.q_percentiles,
        "distinct_users": Q.q_distinct_users,
        "mmanon": Q.q_mmanon,
        "foreach_list": Q.q_foreach_list,
        "mmfields": Q.q_mmfields,
        "mmanon_modes": Q.q_mmanon_modes,
        "topk_tools": Q.q_topk_tools,
        "token_stats": Q.q_token_stats,
        "repetition": Q.q_repetition,
        "jaccard_pairs": Q.q_jaccard_pairs,
        "topk_cosine": Q.q_topk_cosine,
        "langid": Q.q_langid,
        "quality": Q.q_quality,
        "dedup_lines": Q.q_dedup_lines,
        "strfun": Q.q_strfun,
        "set_vars": Q.q_set_vars,
        "lookup_enrich": Q.q_lookup_enrich,
        "sample_by_source": Q.q_sample_by_source,
        "hash_split": Q.q_hash_split,
        "top_ngrams": Q.q_top_ngrams,
        "global_topn": Q.q_global_topn,
        "nfc_normalize": Q.q_nfc_normalize,
        "shuffle_shards": Q.q_shuffle_shards,
        "events_props": Q.q_events_props,
        "profile": Q.q_profile,
        "hopping_window": Q.q_hopping_window,
        "decontaminate": Q.q_decontaminate,
        "decontaminate_frac": Q.q_decontaminate_frac,
        "dup_ngrams": Q.q_dup_ngrams,
        "dedup_spans": Q.q_dedup_spans,
        "sample_global": Q.q_sample_global,
        "blocklist": Q.q_blocklist,
        "keyword_search": Q.q_keyword_search,
        "chunk_docs": Q.q_chunk_docs,
        "zscore": Q.q_zscore,
        "event_gaps": Q.q_event_gaps,
        "running_total": Q.q_running_total,
        "user_ntile": Q.q_user_ntile,
        "type_rank": Q.q_type_rank,
        "centroids": Q.q_centroids,
        "dow_pivot": Q.q_dow_pivot,
        "median_filter": Q.q_median_filter,
        "lm_score": Q.q_lm_score,
        "anti_join": Q.q_anti_join,
        "tfidf": Q.q_tfidf,
        "equi_join": Q.q_equi_join,
        "conv_docs": Q.q_conv_docs,
        "sft_pairs": Q.q_sft_pairs,
        "turn_windows": Q.q_turn_windows,
        "range_join": Q.q_range_join,
        "agg_fac_sev": Q.q_agg_fac_sev,
        "asof_join": Q.q_asof_join,
        "exec_interval": Q.q_exec_interval,
        "dedup_exact": Q.q_dedup_exact,
        "sample_n_per_source": Q.q_sample_n_per_source,
        "head_per_conv": Q.q_head_per_conv,
        "prifilt": Q.q_prifilt,
        "rate_window": Q.q_rate_window,
        "sessionize": Q.q_sessionize,
        "redact": Q.q_redact,
        "dedup_lines_global": Q.q_dedup_lines_global,
        "grok_parse": Q.q_grok_parse,
        "properties": Q.q_properties,
        "events_window": Q.q_events_window,
        "every_nth": Q.q_every_nth,
        "curation": Q.q_curation,
        "sev_bucket": Q.q_sev_bucket,
        "parse_json": Q.q_parse_json,
        "foreach_obj": Q.q_foreach_obj,
        "script_error": Q.q_script_error,
        "template_opts": Q.q_template_opts,
        "pack_sequences": Q.q_pack_sequences,
        "parse_timestamps": Q.q_parse_timestamps,
        "route_files": Q.q_route_files,
        "route_cee": Q.q_route_cee,
        "route_errors": Q.q_route_errors,
        "conv_rollup": Q.q_conv_rollup,
        "sd_params": Q.q_sd_params,
        "parse_fields": Q.q_parse_fields,
        "funnel": Q.q_funnel,
        "token_budget": Q.q_token_budget,
        "conv_dedup": Q.q_conv_dedup,
        "jaccard_dedup": Q.q_jaccard_dedup,
        "neardup_clusters": Q.q_neardup_clusters,
        "suppress_repeats": Q.q_suppress_repeats,
        "neardup_pairs": Q.q_neardup_pairs,
        "cosine_dedup": Q.q_cosine_dedup,
        # ---- no-SQL-oracle entries LAST (rows-only driver check): if the
        # driver's per-round budget runs out mid-list, it costs a weaker
        # rows-only signal instead of a full rows+schema+hash row.
        "ewma": Q.q_ewma,                       # recurrence, pandas oracle
        "pca": Q.q_pca,                         # eigh on driver, numpy oracle
        "sq8": Q.q_sq8,                         # quantizer, roundtrip pytest
        "bloom_decontaminate": Q.q_bloom_decontaminate,  # probabilistic
        "distinct_users_hll": Q.q_distinct_users_hll,  # sketch
        "tdigest": Q.q_tdigest,                 # quantile sketch
        "countmin_topk": Q.q_countmin_topk,  # sketch
        "dedup_simhash": Q.q_dedup_simhash,     # simhash
        "fingerprint": Q.q_fingerprint,         # rolling hash
        "bpe_vocab": Q.q_bpe_vocab,             # iterative merge loop
        "bpe_tokens": Q.q_bpe_tokens,           # tokenize under bpe_vocab
        "kmeans": Q.q_kmeans,                   # seeded iterative clustering
        "logreg": Q.q_logreg,                   # iterative GD fit
        "semdedup": Q.q_semdedup,               # k-means + ε-ball drop
        "ivf_cosine": Q.q_ivf_cosine,           # approximate
        "dedup_minhash": Q.q_dedup_minhash,     # minhash
        "multimodal_audio": Q.q_multimodal_audio,  # WAV decode, Python oracle
        "lsh_neardup": Q.q_lsh_neardup,         # approximate
        "lsh_cosine": Q.q_lsh_cosine,           # approximate
        "multimodal": Q.q_multimodal,           # PNG decode, Python oracle
        "image_dedup": Q.q_image_dedup,         # dHash near-dup, Python oracle
        "audio_dedup": Q.q_audio_dedup,         # audio fp near-dup
        "simhash_dedup": Q.q_simhash_dedup,     # Python-oracle pytest
        "token_bucket": Q.q_token_bucket,       # stateful reference semantics
    }


def oracle_sql() -> dict[str, str]:
    from rsyslog_ray.datagen import ensure_transcripts
    from rsyslog_ray.pipelines.oracle_sql import build_oracle_sql

    ensure_transcripts("/root/testdata/sf0.01")
    return build_oracle_sql()
