"""Gopher quality-rule composite (textstats.gopher_quality) — planted
rule violations, DuckDB twin bit-equality on texts that exercise every
rule (bullets, ellipses, symbols, multi-line, stop words), partition
invariance."""

import duckdb
import pyarrow as pa
import ray.data as rd

from rsyslog_ray.stages.textstats import gopher_quality, gopher_quality_sql

DOCS = [
    # 0: clean prose — passes everything
    (0, "the quick brown fox jumps over the lazy dog and runs to be "
        "free of that fence with pride"),
    # 1: too few words
    (1, "short text here"),
    # 2: symbol-heavy (hashes + ellipses)
    (2, "# # # # ... ... tag # soup # with # many # symbols # inside # "
        "this # strange # document # of # hashes"),
    # 3: bullet lines dominate
    (3, "- item one of the list\n- item two with more\n- item three "
        "here\n* item four also\nonly one plain line"),
    # 4: ellipsis line endings
    (4, "this line trails off...\nand this one too...\nand a third "
        "one...\nbut the last is fine"),
    # 5: numeric soup — low alpha fraction
    (5, "12 34 56 78 90 11 22 33 44 55 66 77 88 99 00 311 42 9 81 64"),
    # 6: no required stop words
    (6, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"),
    # 7: empty / whitespace only -> no row
    (7, "   "),
]

KW = dict(min_words=10, max_words=100, min_mean_wlen=1.0,
          max_mean_wlen=10.0, max_bullet_frac=0.5, min_stop_hits=2)


def _run(nparts=3):
    tbl = pa.table({"doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
                    "text": pa.array([t for _, t in DOCS], pa.string())})
    ds = rd.from_arrow(tbl).repartition(nparts)
    got = gopher_quality(ds, **KW).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    return tbl, got


def test_rule_signals_and_keep():
    _, got = _run()
    g = got.set_index("doc_id")
    assert 7 not in g.index                      # tokenless doc: no row
    assert bool(g.loc[0, "keep"])
    assert not g.loc[1, "keep"] and g.loc[1, "n_words"] < 10
    assert not g.loc[2, "keep"] and g.loc[2, "symbol_ratio"] > 0.1
    assert not g.loc[3, "keep"] and g.loc[3, "bullet_frac"] > 0.5
    assert not g.loc[4, "keep"] and g.loc[4, "ellipsis_frac"] > 0.3
    assert not g.loc[5, "keep"] and g.loc[5, "alpha_frac"] < 0.8
    assert not g.loc[6, "keep"] and g.loc[6, "stop_hits"] < 2
    assert g.loc[0, "stop_hits"] >= 2


def test_duckdb_twin_bit_equality_and_partition_invariance():
    tbl, got3 = _run(3)
    _, got1 = _run(1)
    assert got3.equals(got1)
    con = duckdb.connect()
    con.register("documents", tbl)
    exp = con.execute(gopher_quality_sql(**KW)).df()
    assert got3.equals(exp)
