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
        "parse_fields": Q.q_parse_fields,
        "parse_timestamps": Q.q_parse_timestamps,
        "route_errors": Q.q_route_errors,
        "route_files": Q.q_route_files,
        "route_cee": Q.q_route_cee,
        "agg_fac_sev": Q.q_agg_fac_sev,
        "conv_rollup": Q.q_conv_rollup,
        "lookup_enrich": Q.q_lookup_enrich,
        "sev_bucket": Q.q_sev_bucket,
        "suppress_repeats": Q.q_suppress_repeats,
        "every_nth": Q.q_every_nth,
        "strfun": Q.q_strfun,
        "dedup_exact": Q.q_dedup_exact,
        "token_stats": Q.q_token_stats,
        "events_window": Q.q_events_window,
        "sessionize": Q.q_sessionize,
        "hopping_window": Q.q_hopping_window,
        "percentiles": Q.q_percentiles,
        "asof_join": Q.q_asof_join,
        "range_join": Q.q_range_join,
        "topk_tools": Q.q_topk_tools,
        "head_per_conv": Q.q_head_per_conv,
        "distinct_users": Q.q_distinct_users,
        "events_props": Q.q_events_props,
        "topk_cosine": Q.q_topk_cosine,
        # mm* modifiers / dynstats / ratelimit / templates (§2.4-2.8)
        "mmfields": Q.q_mmfields,
        "mmanon": Q.q_mmanon,
        "mmanon_modes": Q.q_mmanon_modes,
        "exec_interval": Q.q_exec_interval,
        "sd_params": Q.q_sd_params,
        "foreach_list": Q.q_foreach_list,
        "foreach_obj": Q.q_foreach_obj,
        "dynstats_tool": Q.q_dynstats_tool,
        "rate_window": Q.q_rate_window,
        "template_opts": Q.q_template_opts,
        "properties": Q.q_properties,
        "prifilt": Q.q_prifilt,
        "parse_json": Q.q_parse_json,
        "script_error": Q.q_script_error,
        "grok_parse": Q.q_grok_parse,
        # training-data extras: text analysis / dedup / similarity
        "quality": Q.q_quality,
        "langid": Q.q_langid,
        "repetition": Q.q_repetition,
        "sample_n_per_source": Q.q_sample_n_per_source,
        "top_ngrams": Q.q_top_ngrams,
        "curation": Q.q_curation,
        "dedup_lines": Q.q_dedup_lines,
        "decontaminate": Q.q_decontaminate,
        "hash_split": Q.q_hash_split,
        "sample_by_source": Q.q_sample_by_source,
        "pack_sequences": Q.q_pack_sequences,
        "jaccard_pairs": Q.q_jaccard_pairs,
        "jaccard_dedup": Q.q_jaccard_dedup,
        "cosine_dedup": Q.q_cosine_dedup,
        "neardup_pairs": Q.q_neardup_pairs,
        # ---- no-SQL-oracle entries LAST (rows-only driver check): if the
        # driver's per-round budget runs out mid-list, it costs a weaker
        # rows-only signal instead of a full rows+schema+hash row.
        "distinct_users_hll": Q.q_distinct_users_hll,  # sketch
        "token_bucket": Q.q_token_bucket,       # stateful reference semantics
        "fingerprint": Q.q_fingerprint,         # rolling hash
        "dedup_minhash": Q.q_dedup_minhash,     # minhash
        "dedup_simhash": Q.q_dedup_simhash,     # simhash
        "simhash_dedup": Q.q_simhash_dedup,     # Python-oracle pytest
        "multimodal": Q.q_multimodal,           # PNG decode, Python oracle
        "multimodal_audio": Q.q_multimodal_audio,  # WAV decode, Python oracle
        "lsh_neardup": Q.q_lsh_neardup,         # approximate
        "lsh_cosine": Q.q_lsh_cosine,           # approximate
        "ivf_cosine": Q.q_ivf_cosine,           # approximate
    }


def oracle_sql() -> dict[str, str]:
    from rsyslog_ray.datagen import ensure_transcripts
    from rsyslog_ray.pipelines.oracle_sql import build_oracle_sql

    ensure_transcripts("/root/testdata/sf0.01")
    return build_oracle_sql()
