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
    return {
        # Ordering contract (rotation policy, round 5): the 12
        # entries that have NEVER had a driver row (rows-only by
        # design, but a rows/err row is still signal) come FIRST;
        # then the new-in-r5 entry; then the three re-verify
        # entries whose oracles/gates changed this round
        # (pack_sequences/token_budget BIGINT casts, neardup_pairs
        # size gate); then entries last checked in rounds 1-3
        # (oldest evidence, prior cheapest-first order); the 48
        # checked in round 4 sit at the tail. ~50 driver checks
        # per round -> every registry entry has at least one
        # CORRECTNESS row after this round.
        "pca": Q.q_pca,
        "bloom_decontaminate": Q.q_bloom_decontaminate,
        "ivf_cosine": Q.q_ivf_cosine,
        "lsh_neardup": Q.q_lsh_neardup,
        "kmeans": Q.q_kmeans,
        "multimodal_audio": Q.q_multimodal_audio,
        "audio_dedup": Q.q_audio_dedup,
        "bpe_vocab": Q.q_bpe_vocab,
        "bpe_tokens": Q.q_bpe_tokens,
        "semdedup": Q.q_semdedup,
        "image_dedup": Q.q_image_dedup,
        "logreg": Q.q_logreg,
        "mmexternal": Q.q_mmexternal,
        "omprog": Q.q_omprog,
        "pack_sequences": Q.q_pack_sequences,
        "token_budget": Q.q_token_budget,
        "neardup_pairs": Q.q_neardup_pairs,
        "sample_global": Q.q_sample_global,
        "topk_tools": Q.q_topk_tools,
        "global_topn": Q.q_global_topn,
        "sample_by_source": Q.q_sample_by_source,
        "neardup_clusters": Q.q_neardup_clusters,
        "editdist_pairs": Q.q_editdist_pairs,
        "editdist_dedup": Q.q_editdist_dedup,
        "feature_corr": Q.q_feature_corr,
        "dict_encode": Q.q_dict_encode,
        "winsorize": Q.q_winsorize,
        "jaccard_dedup": Q.q_jaccard_dedup,
        "keyword_search": Q.q_keyword_search,
        "nfc_normalize": Q.q_nfc_normalize,
        "distinct_users": Q.q_distinct_users,
        "blocklist": Q.q_blocklist,
        "asof_join": Q.q_asof_join,
        "asof_tolerance": Q.q_asof_tolerance,
        "hash_split": Q.q_hash_split,
        "quality": Q.q_quality,
        "sample_n_per_source": Q.q_sample_n_per_source,
        "mmanon": Q.q_mmanon,
        "redact": Q.q_redact,
        "token_stats": Q.q_token_stats,
        "lookup_enrich": Q.q_lookup_enrich,
        "funnel": Q.q_funnel,
        "strfun": Q.q_strfun,
        "agg_fac_sev": Q.q_agg_fac_sev,
        "rollup": Q.q_rollup,
        "log_templates": Q.q_log_templates,
        "mmfields": Q.q_mmfields,
        "profile": Q.q_profile,
        "anti_join": Q.q_anti_join,
        "dedup_exact": Q.q_dedup_exact,
        "chunk_docs": Q.q_chunk_docs,
        "mmanon_modes": Q.q_mmanon_modes,
        "head_per_conv": Q.q_head_per_conv,
        "dow_pivot": Q.q_dow_pivot,
        "foreach_list": Q.q_foreach_list,
        "jaccard_pairs": Q.q_jaccard_pairs,
        "every_nth": Q.q_every_nth,
        "curation": Q.q_curation,
        "exec_interval": Q.q_exec_interval,
        "prifilt": Q.q_prifilt,
        "parse_timestamps": Q.q_parse_timestamps,
        "sessionize": Q.q_sessionize,
        "grok_parse": Q.q_grok_parse,
        "parse_fields": Q.q_parse_fields,
        "repetition": Q.q_repetition,
        "properties": Q.q_properties,
        "suppress_repeats": Q.q_suppress_repeats,
        "events_window": Q.q_events_window,
        "sev_bucket": Q.q_sev_bucket,
        "rate_window": Q.q_rate_window,
        "route_errors": Q.q_route_errors,
        "langid": Q.q_langid,
        "events_props": Q.q_events_props,
        "template_opts": Q.q_template_opts,
        "parse_json": Q.q_parse_json,
        "route_files": Q.q_route_files,
        "cosine_dedup": Q.q_cosine_dedup,
        "hopping_window": Q.q_hopping_window,
        "foreach_obj": Q.q_foreach_obj,
        "percentiles": Q.q_percentiles,
        "topk_cosine": Q.q_topk_cosine,
        "conv_rollup": Q.q_conv_rollup,
        "route_cee": Q.q_route_cee,
        "dynstats_tool": Q.q_dynstats_tool,
        "sd_params": Q.q_sd_params,
        "distinct_users_hll": Q.q_distinct_users_hll,
        "fingerprint": Q.q_fingerprint,
        "dedup_minhash": Q.q_dedup_minhash,
        "dedup_simhash": Q.q_dedup_simhash,
        "simhash_dedup": Q.q_simhash_dedup,
        "lsh_cosine": Q.q_lsh_cosine,
        "token_bucket": Q.q_token_bucket,
        "multimodal": Q.q_multimodal,
        "char_entropy": Q.q_char_entropy,
        "dedup_report": Q.q_dedup_report,
        "length_batches": Q.q_length_batches,
        "prf_quality": Q.q_prf_quality,
        "event_patterns": Q.q_event_patterns,
        "temperature_mix": Q.q_temperature_mix,
        "ccnet_buckets": Q.q_ccnet_buckets,
        "auc_quality": Q.q_auc_quality,
        "contamination_report": Q.q_contamination_report,
        "gopher_quality": Q.q_gopher_quality,
        "dsir_score": Q.q_dsir_score,
        "dsir_sample": Q.q_dsir_sample,
        "boilerplate": Q.q_boilerplate,
        "classifier_filter": Q.q_classifier_filter,
        "cluster_sample": Q.q_cluster_sample,
        "immark": Q.q_immark,
        "epoch_mix": Q.q_epoch_mix,
        "canonical_dedup": Q.q_canonical_dedup,
        "centroids": Q.q_centroids,
        "median_filter": Q.q_median_filter,
        "top_ngrams": Q.q_top_ngrams,
        "user_ntile": Q.q_user_ntile,
        "running_total": Q.q_running_total,
        "type_rank": Q.q_type_rank,
        "event_gaps": Q.q_event_gaps,
        "dup_ngrams": Q.q_dup_ngrams,
        "range_join": Q.q_range_join,
        "shuffle_shards": Q.q_shuffle_shards,
        "zscore": Q.q_zscore,
        "dedup_spans": Q.q_dedup_spans,
        "conv_docs": Q.q_conv_docs,
        "decontaminate_frac": Q.q_decontaminate_frac,
        "tfidf": Q.q_tfidf,
        "dedup_lines": Q.q_dedup_lines,
        "sft_pairs": Q.q_sft_pairs,
        "mad_outliers": Q.q_mad_outliers,
        "lm_score": Q.q_lm_score,
        "decontaminate": Q.q_decontaminate,
        "dedup_lines_global": Q.q_dedup_lines_global,
        "turn_windows": Q.q_turn_windows,
        "set_vars": Q.q_set_vars,
        "equi_join": Q.q_equi_join,
        "script_error": Q.q_script_error,
        "conv_dedup": Q.q_conv_dedup,
        "ewma": Q.q_ewma,
        "countmin_topk": Q.q_countmin_topk,
        "tdigest": Q.q_tdigest,
        "sq8": Q.q_sq8,
    }


def oracle_sql() -> dict[str, str]:
    from rsyslog_ray.datagen import ensure_transcripts
    from rsyslog_ray.pipelines.oracle_sql import build_oracle_sql

    ensure_transcripts("/root/testdata/sf0.01")
    return build_oracle_sql()
