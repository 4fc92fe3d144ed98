"""Aggregates + ratelimit/sampling vs oracle."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from rsyslog_ray.pipelines.flagship import CANONICAL_RULESET
from rsyslog_ray.stages.aggregate import (conv_rollup, count_by,
                                          facility_severity_counts)
from rsyslog_ray.stages.parse import parse_dataset
from rsyslog_ray.stages.ratelimit import (exec_every_nth, suppress_repeats,
                                          token_bucket)
from rsyslog_ray.stages.route import apply_stops
from tests import oracle as O


@pytest.fixture(scope="module")
def oracle_result(tiny_table):
    return O.run_oracle(tiny_table)


@pytest.fixture(scope="module")
def parsed_ds(tiny_table):
    return parse_dataset(rd.from_arrow(tiny_table).repartition(4),
                         batch_size=256)


def test_fac_sev_counts(parsed_ds, oracle_result):
    ds = apply_stops(parsed_ds, CANONICAL_RULESET)
    got = {(r["facility"], r["severity"]): r["rows"]
           for r in facility_severity_counts(ds).to_pylist()}
    assert got == dict(oracle_result.fac_sev)


def test_conv_rollup(parsed_ds, oracle_result):
    got = {r["conv_id"]: r for r in conv_rollup(parsed_ds).take_all()}
    assert set(got) == set(oracle_result.conv)
    for cid, o in oracle_result.conv.items():
        g = got[cid]
        assert g["n_turns"] == o["n_turns"], cid
        assert g["n_parsed_ok"] == o["n_parsed_ok"], cid
        assert pd.Timestamp(g["first_ts"]) == pd.Timestamp(o["first_ts"]), cid
        assert pd.Timestamp(g["last_ts"]) == pd.Timestamp(o["last_ts"]), cid


def test_count_by_matches_pandas(tiny_table):
    ds = rd.from_arrow(tiny_table).repartition(3)
    got = {r["role"]: r["rows"] for r in count_by(ds, ["role"]).take_all()}
    exp = tiny_table.to_pandas().groupby("role").size().to_dict()
    assert got == exp


def _oracle_suppress(df):
    out = []
    for cid, g in df.sort_values(["conv_id", "turn_idx"]).groupby("conv_id"):
        prev = object()
        for _, row in g.iterrows():
            if row["text"] != prev:
                out.append((cid, row["turn_idx"]))
                prev = row["text"]
    return set(out)


def test_suppress_repeats(tiny_table):
    ds = rd.from_arrow(tiny_table).repartition(4)
    got = suppress_repeats(ds)
    keys = {(r["conv_id"], r["turn_idx"]) for r in got.take_all()}
    exp = _oracle_suppress(tiny_table.to_pandas())
    assert keys == exp
    # fixture must actually contain duplicate runs
    assert len(keys) < tiny_table.num_rows


def test_repeat_counts(tiny_table):
    ds = rd.from_arrow(tiny_table).repartition(4)
    rows = suppress_repeats(ds).take_all()
    total = sum(r["n_repeats"] for r in rows)
    assert total == tiny_table.num_rows
    assert max(r["n_repeats"] for r in rows) >= 2


def test_exec_every_nth(tiny_table):
    ds = rd.from_arrow(tiny_table).repartition(4)
    got = {(r["conv_id"], r["turn_idx"]) for r in exec_every_nth(ds, 3).take_all()}
    df = tiny_table.to_pandas().sort_values(["conv_id", "turn_idx"])
    exp = set()
    for cid, g in df.groupby("conv_id"):
        for i, (_, row) in enumerate(g.iterrows()):
            if i % 3 == 0:
                exp.add((cid, row["turn_idx"]))
    assert got == exp


def test_token_bucket(tiny_table):
    ds = rd.from_arrow(tiny_table).repartition(4)
    got = {(r["conv_id"], r["turn_idx"])
           for r in token_bucket(ds, interval_s=30, burst=5).take_all()}
    df = tiny_table.to_pandas().sort_values(["conv_id", "turn_idx"])
    exp = set()
    for cid, g in df.groupby("conv_id"):
        win, used = None, 0
        for _, row in g.iterrows():
            t = row["ts"].timestamp()
            if win is None or t >= win + 30:
                win, used = t, 0
            if used < 5:
                exp.add((cid, row["turn_idx"]))
                used += 1
    assert got == exp
    assert len(got) < tiny_table.num_rows


def test_sessionize_gap_semantics(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from rsyslog_ray.stages.aggregate import sessionize
    ts = np.array(["2024-01-01T00:00:00", "2024-01-01T00:05:00",
                   "2024-01-01T00:20:01",          # gap > 600 s → new sess
                   "2024-01-01T00:25:00",
                   "2024-01-01T01:00:00"],         # new sess again
                  dtype="datetime64[us]")
    t = pa.table({"user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
                  "ts": pa.array(ts)})
    out = sorted((r["user_id"], r["session_idx"], r["n_events"])
                 for r in sessionize(rd.from_arrow(t), gap_s=600).take_all())
    assert out == [(1, 1, 2), (1, 2, 2), (2, 1, 1)]


def test_hopping_window_membership(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from rsyslog_ray.stages.aggregate import hopping_window_counts
    # one event at t=3600+10; windows of size 100 hop 50 containing it:
    # starts 3550 and 3600
    ts = np.array(["2024-01-01T00:00:10"], dtype="datetime64[us]")
    t = pa.table({"event_type": pa.array(["e"]), "ts": pa.array(ts),
                  "value": pa.array([2.0])})
    out = sorted((r["wstart"], r["rows"], r["value_sum"]) for r in
                 hopping_window_counts(rd.from_arrow(t), size_s=100,
                                       hop_s=50).take_all())
    base = 1704067200  # 2024-01-01T00:00:00 epoch
    assert out == [(base - 50, 1, 2.0), (base, 1, 2.0)]


def test_percentiles_by_key_matches_numpy(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from rsyslog_ray.stages.aggregate import percentiles_by_key
    rng = np.random.RandomState(11)
    keys = rng.choice(["a", "b"], size=500)
    vals = np.round(rng.uniform(0, 50, size=500), 2)
    ds = rd.from_arrow(pa.table({"event_type": pa.array(keys),
                                 "value": pa.array(vals, pa.float64())}))
    got = percentiles_by_key(ds).to_pandas().set_index("event_type")
    for k in ("a", "b"):
        v = np.sort(vals[keys == k])
        for q, nm in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            want = v[int(np.ceil(q * len(v))) - 1]  # quantile_disc rank
            assert got.loc[k, nm] == want, (k, nm)


def test_distinct_count_exact_and_hll(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from rsyslog_ray.stages.aggregate import distinct_count_by, hll_distinct_by
    rng = np.random.RandomState(5)
    keys = rng.choice(["x", "y"], size=4000)
    vals = rng.randint(0, 700, size=4000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"event_type": pa.array(keys),
                                 "user_id": pa.array(vals)}))
    exact = distinct_count_by(ds).to_pandas().set_index("event_type")
    for k in ("x", "y"):
        assert exact.loc[k, "n_distinct"] == len(set(vals[keys == k]))
    # distributed bucket path must agree with the driver fold
    dist = (distinct_count_by(ds, driver_threshold=0)
            .to_pandas().set_index("event_type"))
    assert dist["n_distinct"].to_dict() == exact["n_distinct"].to_dict()
    est = hll_distinct_by(ds).to_pandas().set_index("event_type")
    for k in ("x", "y"):
        true = exact.loc[k, "n_distinct"]
        assert abs(est.loc[k, "n_distinct_est"] - true) / true < 0.05, \
            (k, est.loc[k, "n_distinct_est"], true)


def test_asof_join_matches_pandas_oracle(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from rsyslog_ray.stages.joins import asof_join
    rng = np.random.RandomState(7)
    n = 300
    left = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, 20, n).astype(np.int64),
        "ts": pd.to_datetime(rng.randint(0, 10**6, n), unit="s"),
    })
    m = 60
    right = pd.DataFrame({
        "user_id": rng.randint(0, 20, m).astype(np.int64),
        "ts": pd.to_datetime(rng.randint(0, 10**6, m), unit="s"),
        "version": np.arange(m, dtype=np.int64),
    })
    got = (asof_join(rd.from_pandas(left), rd.from_pandas(right),
                     key="user_id", ts_col="ts")
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    want = pd.merge_asof(left.sort_values("ts"), right.sort_values("ts"),
                         on="ts", by="user_id", direction="backward",
                         suffixes=("", "_r"))
    want = (want[want["version"].notna()]
            .sort_values("event_id").reset_index(drop=True))
    assert len(got) == len(want)
    assert (got["event_id"].to_numpy() == want["event_id"].to_numpy()).all()
    assert (got["version"].to_numpy() == want["version"].to_numpy()).all()


def test_topk_by_key_ranks_and_ties(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from rsyslog_ray.stages.aggregate import topk_by_key
    t = pa.table({"k": pa.array(["a"] * 6 + ["b"] * 3),
                  "v": pa.array(["x", "x", "y", "y", "z", "w",
                                 "p", "p", "q"])})
    out = topk_by_key(rd.from_arrow(t), ["k"], "v", k=2).to_pylist()
    # a: x(2) and y(2) tie on count -> value asc; z/w rank 3+ cut
    assert [(r["k"], r["v"], r["rows"], r["rank"]) for r in out] == [
        ("a", "x", 2, 1), ("a", "y", 2, 2),
        ("b", "p", 2, 1), ("b", "q", 1, 2)]


def test_head_per_key(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from rsyslog_ray.stages.aggregate import head_per_key
    t = pa.table({"conv_id": pa.array(["c1"] * 4 + ["c2"] * 2),
                  "turn_idx": pa.array([3, 1, 2, 0, 5, 4], pa.int64())})
    out = sorted((r["conv_id"], r["turn_idx"]) for r in
                 head_per_key(rd.from_arrow(t), n=2).take_all())
    assert out == [("c1", 0), ("c1", 1), ("c2", 4), ("c2", 5)]


def test_range_join_matches_pandas_oracle(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from rsyslog_ray.stages.joins import range_join
    rng = np.random.RandomState(9)
    left = pd.DataFrame({
        "event_id": np.arange(200, dtype=np.int64),
        "user_id": rng.randint(0, 10, 200).astype(np.int64),
        "ts": pd.to_datetime(rng.randint(0, 10**5, 200), unit="s"),
    })
    starts = pd.to_datetime(rng.randint(0, 10**5, 30), unit="s")
    right = pd.DataFrame({
        "user_id": rng.randint(0, 10, 30).astype(np.int64),
        "start_ts": starts,
        "end_ts": starts + pd.Timedelta(hours=2),
        "win_id": np.arange(30, dtype=np.int64),
    })
    got = (range_join(rd.from_pandas(left), rd.from_pandas(right),
                      key="user_id", ts_col="ts")
           .to_pandas().sort_values(["event_id", "win_id"])
           .reset_index(drop=True))
    want = left.merge(right, on="user_id")
    want = (want[(want["ts"] >= want["start_ts"]) &
                 (want["ts"] <= want["end_ts"])]
            .sort_values(["event_id", "win_id"]).reset_index(drop=True))
    assert len(got) == len(want) > 0
    assert (got["event_id"].to_numpy() == want["event_id"].to_numpy()).all()
    assert (got["win_id"].to_numpy() == want["win_id"].to_numpy()).all()


def _join_fixture(seed=11, n=250, m=40):
    import numpy as np
    import pandas as pd
    rng = np.random.RandomState(seed)
    left = pd.DataFrame({
        # ids above 2^53: float64 round-trip would corrupt them
        "event_id": (np.arange(n, dtype=np.int64) + (1 << 60)),
        "user_id": rng.randint(0, 8, n).astype(np.int64),
        "ts": pd.to_datetime(rng.randint(0, 10**5, n), unit="s"),
    })
    starts = pd.to_datetime(rng.randint(0, 10**5, m), unit="s")
    right = pd.DataFrame({
        "user_id": rng.randint(0, 8, m).astype(np.int64),
        "start_ts": starts,
        "end_ts": starts + pd.Timedelta(hours=2),
        "win_id": np.arange(m, dtype=np.int64),
    })
    return left, right


def test_join_output_dtypes_exact_on_both_paths(ray_session):
    """Round-3 fix: pandas merge/merge_asof upcast int64→float64 via NaN
    intermediates; both joins must emit the inputs' exact Arrow types on
    the driver AND distributed paths (hash_match gate + >2^53 ids)."""
    import pyarrow as pa
    import ray.data as rd
    from rsyslog_ray.stages.joins import asof_join, range_join
    left, right = _join_fixture()
    asof_right = right[["user_id", "start_ts"]].rename(
        columns={"start_ts": "ts"})
    for thresh in (2_000_000, 0):          # driver path / distributed path
        out = asof_join(rd.from_pandas(left), rd.from_pandas(asof_right),
                        key="user_id", ts_col="ts",
                        driver_threshold=thresh)
        sch = out.schema()
        assert dict(zip(sch.names, sch.types))["event_id"] == pa.int64()
        ids = sorted(r["event_id"] for r in
                     out.select_columns(["event_id"]).take_all())
        assert ids and all(isinstance(i, int) and i >= (1 << 60)
                           for i in ids)
        out2 = range_join(rd.from_pandas(left), rd.from_pandas(right),
                          key="user_id", ts_col="ts",
                          driver_threshold=thresh)
        sch2 = out2.schema()
        tmap = dict(zip(sch2.names, sch2.types))
        assert tmap["event_id"] == pa.int64()
        assert tmap["win_id"] == pa.int64()
        # contract: output type == LEFT input's type (ns here: pandas src)
        assert tmap["ts"] == pa.timestamp("ns")


def test_range_join_time_bucket_copartition_equivalent(ray_session):
    """Dense overlapping intervals: (key, coarse-time-bucket)
    co-partitioning must produce the identical pair set while bounding
    the per-group merge cross-product."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from rsyslog_ray.stages.joins import range_join
    # ONE hot key, 400 events, 50 fully-overlapping 2h windows: plain
    # per-key merge intermediate = 400*50 = 20000 rows; with 2h buckets
    # each (key, tb) group holds ≤ a bucket's events × ≤3 spanning
    # windows' copies — bounded by construction.
    rng = np.random.RandomState(3)
    n, m = 400, 50
    left = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.zeros(n, dtype=np.int64),
        "ts": pd.to_datetime(rng.randint(0, 10**5, n), unit="s"),
    })
    starts = pd.to_datetime(rng.randint(0, 10**5, m), unit="s")
    right = pd.DataFrame({
        "user_id": np.zeros(m, dtype=np.int64),
        "start_ts": starts,
        "end_ts": starts + pd.Timedelta(hours=2),
        "win_id": np.arange(m, dtype=np.int64),
    })

    def pairs(**kw):
        out = range_join(rd.from_pandas(left), rd.from_pandas(right),
                         key="user_id", ts_col="ts",
                         driver_threshold=0, **kw).take_all()
        return sorted((r["event_id"], r["win_id"]) for r in out)

    plain = pairs()
    bucketed = pairs(time_bucket_s=7200)
    assert plain == bucketed and len(plain) > 0
    # analytic bound check on the fixture itself: the max per-(key,tb)
    # cross size is far below the full per-key cross size
    tb = 7200
    lv = left.assign(_tb=left.ts.astype("int64") // (tb * 10**9))
    per_tb_events = lv.groupby("_tb").size()
    s = right.start_ts.astype("int64") // (tb * 10**9)
    e = right.end_ts.astype("int64") // (tb * 10**9)
    import collections
    wins_per_tb = collections.Counter()
    for a, b in zip(s, e):
        for t in range(a, b + 1):
            wins_per_tb[t] += 1
    max_cross = max(per_tb_events.get(t, 0) * c
                    for t, c in wins_per_tb.items())
    assert max_cross < n * m / 4


def test_asof_join_no_materialize_right(ray_session):
    """materialize_right=False (large fact-to-fact right side) must give
    identical results to the default dimension-side path."""
    import ray.data as rd
    from rsyslog_ray.stages.joins import asof_join
    left, right = _join_fixture(seed=5)
    asof_right = right[["user_id", "start_ts"]].rename(
        columns={"start_ts": "ts"})

    def run(mat):
        out = asof_join(rd.from_pandas(left), rd.from_pandas(asof_right),
                        key="user_id", ts_col="ts", driver_threshold=0,
                        materialize_right=mat).take_all()
        return sorted((r["event_id"], str(r["ts_r"])) for r in out)

    assert run(True) == run(False)


def test_range_join_tolerates_inverted_intervals(ray_session):
    """Dirty data: an interval with end < start matches nothing and must
    not crash the (key, time-bucket) explode."""
    import pyarrow as pa
    import ray.data as rd
    from rsyslog_ray.stages.joins import range_join
    left = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1], pa.int64()),
        "ts": pa.array([1000000, 5000000], pa.timestamp("us")),
    }))
    right = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1], pa.int64()),
        "start_ts": pa.array([0, 9000000], pa.timestamp("us")),
        "end_ts": pa.array([2000000, 4000000], pa.timestamp("us")),  # 2nd inverted
    }))
    out = range_join(left, right, time_bucket_s=1.0).take_all()
    assert [(r["ts"].timestamp()) for r in out] == [1.0]


def test_concat_group_text_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from rsyslog_ray.stages.aggregate import concat_group_text
    rng = np.random.RandomState(11)
    n = 400
    df = pd.DataFrame({
        "conv_id": [f"c{int(i):03d}" for i in rng.randint(0, 37, n)],
        "turn_idx": np.zeros(n, dtype=np.int64),
        "text": [f"t{i}" for i in range(n)],
    })
    df["turn_idx"] = df.groupby("conv_id").cumcount().astype(np.int64)
    df = df.sample(frac=1.0, random_state=3).reset_index(drop=True)  # scramble
    got = (concat_group_text(rd.from_pandas(df).repartition(5))
           .to_pandas().sort_values("conv_id").reset_index(drop=True))
    want = (df.sort_values(["conv_id", "turn_idx"])
            .groupby("conv_id")
            .agg(doc=("text", "\n".join), n_turns=("text", "size"))
            .reset_index())
    want["n_chars"] = want["doc"].str.len().astype(np.int64)
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert got["doc"].tolist() == want["doc"].tolist()
    assert got["n_turns"].tolist() == want["n_turns"].tolist()
    assert got["n_chars"].tolist() == want["n_chars"].tolist()


def test_global_topn_exact_with_ties(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from rsyslog_ray.stages.aggregate import global_topn
    rng = np.random.RandomState(5)
    df = pd.DataFrame({
        "event_id": np.arange(500, dtype=np.int64),
        "value": rng.randint(0, 40, 500).astype(np.int64),  # heavy ties
    })
    out = global_topn(rd.from_pandas(df).repartition(7),
                      sort_col="value", n=25, tie_cols=("event_id",))
    want = df.sort_values(["value", "event_id"],
                          ascending=[False, True]).head(25)
    assert out["event_id"].to_pylist() == want["event_id"].tolist()
    assert out["value"].to_pylist() == want["value"].tolist()
    assert out["event_id"].type == pa.int64()


def test_countmin_topk_overestimates_and_finds_heavies(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from rsyslog_ray.stages.aggregate import countmin_topk
    rng = np.random.RandomState(9)
    # zipf-ish: few heavy keys, long tail
    keys = np.r_[np.repeat([f"hot{i}" for i in range(5)],
                           [900, 700, 500, 300, 200]),
                 [f"cold{i}" for i in rng.randint(0, 400, 600)]]
    rng.shuffle(keys)
    df = pd.DataFrame({"user_id": keys})
    out = countmin_topk(rd.from_pandas(df).repartition(6),
                        col="user_id", k=5)
    exact = df["user_id"].value_counts()
    got = dict(zip(out["user_id"].to_pylist(), out["est_rows"].to_pylist()))
    # CM estimates never under-count
    for k, est in got.items():
        assert est >= exact[k], (k, est, exact[k])
    # at this width the 5 heavies are found exactly, in order
    assert out["user_id"].to_pylist() == [f"hot{i}" for i in range(5)]
    assert out["est_rows"].to_pylist() == [900, 700, 500, 300, 200]


def test_equi_join_inner_left_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from rsyslog_ray.stages.joins import equi_join
    rng = np.random.RandomState(13)
    left = pd.DataFrame({
        "conv_id": [f"k{int(i)}" for i in rng.randint(0, 30, 250)],
        "event_id": np.arange(250, dtype=np.int64),
    })
    right = pd.DataFrame({
        "conv_id": [f"k{i}" for i in range(0, 40, 2)],  # half the keys
        "score": np.arange(20, dtype=np.int64) * 10,
    })
    for how in ("inner", "left"):
        got = (equi_join(rd.from_pandas(left).repartition(4),
                         rd.from_pandas(right), key="conv_id", how=how)
               .to_pandas().sort_values(["event_id", "score"])
               .reset_index(drop=True))
        want = (left.merge(right, on="conv_id", how=how)
                .sort_values(["event_id", "score"]).reset_index(drop=True))
        assert len(got) == len(want)
        assert got["event_id"].tolist() == want["event_id"].tolist()
        # int64 preserved even with nulls on the left path
        assert got["event_id"].dtype == np.int64
        if how == "left":
            assert got["score"].isna().sum() == want["score"].isna().sum()
        else:
            assert got["score"].tolist() == want["score"].tolist()


def test_equi_join_integer_key(ray_session):
    import pandas as pd
    import ray.data as rd
    from rsyslog_ray.stages.joins import equi_join
    left = pd.DataFrame({"uid": [1, 2, 3, 2], "x": [10, 20, 30, 40]})
    right = pd.DataFrame({"uid": [2, 3], "y": ["b", "c"]})
    got = (equi_join(rd.from_pandas(left), rd.from_pandas(right), key="uid")
           .to_pandas().sort_values(["x"]).reset_index(drop=True))
    assert got["uid"].tolist() == [2, 3, 2]
    assert got["y"].tolist() == ["b", "c", "b"]


def test_equi_join_semi_anti(ray_session):
    import pandas as pd
    import ray.data as rd
    from rsyslog_ray.stages.joins import equi_join
    left = pd.DataFrame({"k": ["a", "b", "c", "a"],
                         "v": [1, 2, 3, 4]})
    right = pd.DataFrame({"k": ["a", "x"], "w": [9, 9]})
    semi = (equi_join(rd.from_pandas(left), rd.from_pandas(right),
                      key="k", how="semi").to_pandas()
            .sort_values("v").reset_index(drop=True))
    anti = (equi_join(rd.from_pandas(left), rd.from_pandas(right),
                      key="k", how="anti").to_pandas()
            .sort_values("v").reset_index(drop=True))
    # semi: left rows with a right match, once each, left columns only
    assert semi["v"].tolist() == [1, 4] and list(semi.columns) == ["k", "v"]
    assert anti["v"].tolist() == [2, 3]


def test_lag_and_cumsum_by_key_match_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from rsyslog_ray.stages.aggregate import cumsum_by_key, lag_by_key
    rng = np.random.RandomState(21)
    n = 300
    df = pd.DataFrame({
        "user_id": rng.randint(0, 12, n).astype(np.int64),
        "ts": rng.randint(0, 10**6, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "value": rng.rand(n),
    })
    order = ["user_id", "ts", "event_id"]
    want = df.sort_values(order, kind="mergesort").copy()
    want["prev_ts"] = want.groupby("user_id")["ts"].shift(1)
    want["running_total"] = want.groupby("user_id")["value"].cumsum()

    lagged = (lag_by_key(rd.from_pandas(df).repartition(5), key="user_id",
                         order_cols=("ts", "event_id"), value_col="ts")
              .to_pandas().sort_values(order).reset_index(drop=True))
    assert lagged["prev_ts"].equals(
        want["prev_ts"].reset_index(drop=True))

    summed = (cumsum_by_key(rd.from_pandas(df).repartition(5),
                            key="user_id", order_cols=("ts", "event_id"))
              .to_pandas().sort_values(order).reset_index(drop=True))
    assert np.allclose(summed["running_total"].to_numpy(),
                       want["running_total"].to_numpy(), atol=0, rtol=0)


def test_rank_by_key_rank_rownumber_ntile(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from rsyslog_ray.stages.aggregate import rank_by_key
    # key a: 7 rows with tie groups; key b: 2 rows (fewer than tiles)
    df = pd.DataFrame({
        "k": ["a"] * 7 + ["b"] * 2,
        "v": [10, 10, 20, 20, 20, 30, 40, 5, 5],
        "i": np.arange(9, dtype=np.int64),
    })
    rnk = (rank_by_key(rd.from_pandas(df).repartition(3), key="k",
                       order_cols=("v",), method="rank")
           .to_pandas().sort_values("i"))
    assert rnk["rnk"].tolist() == [1, 1, 3, 3, 3, 6, 7, 1, 1]
    rn = (rank_by_key(rd.from_pandas(df), key="k",
                      order_cols=("v", "i"), method="row_number")
          .to_pandas().sort_values("i"))
    assert rn["rnk"].tolist() == [1, 2, 3, 4, 5, 6, 7, 1, 2]
    nt = (rank_by_key(rd.from_pandas(df), key="k",
                      order_cols=("v", "i"), method="ntile", n_tiles=4,
                      out_col="tile").to_pandas().sort_values("i"))
    # 7 rows over 4 tiles -> sizes 2,2,2,1 (larger first); 2 rows -> 1,1
    assert nt["tile"].tolist() == [1, 1, 2, 2, 3, 3, 4, 1, 2]


def test_centroid_by_label_matches_numpy(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from rsyslog_ray.stages.aggregate import centroid_by_label
    rng = np.random.RandomState(3)
    n, d = 120, 8
    labels = rng.randint(0, 4, n)
    vecs = rng.randn(n, d).astype(np.float32)
    t = pa.table({"label": pa.array(labels, pa.int32()),
                  "embedding": pa.array(list(vecs),
                                        pa.list_(pa.float32()))})
    got = (centroid_by_label(rd.from_arrow(t).repartition(5))
           .to_pandas().sort_values(["label", "dim"])
           .reset_index(drop=True))
    assert len(got) == 4 * d
    for lab in range(4):
        want = vecs[labels == lab].astype(np.float64).mean(axis=0)
        want = np.copysign(np.floor(np.abs(want) * 1e6 + 0.5) / 1e6, want)
        np.testing.assert_array_equal(
            got[got["label"] == lab]["centroid"].to_numpy(), want)


def test_pivot_counts_pins_missing_columns(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from rsyslog_ray.stages.aggregate import pivot_counts
    t = pa.table({"fac": pa.array(["a", "a", "b"]),
                  "sev": pa.array([1, 3, 1], pa.int64())})
    out = pivot_counts(rd.from_arrow(t), row_key="fac", col_key="sev",
                       col_values=(1, 2, 3))
    assert out.column_names == ["fac", "s1", "s2", "s3"]
    assert out["s1"].to_pylist() == [1, 1]
    assert out["s2"].to_pylist() == [0, 0]   # absent value stays, zeroed
    assert out["s3"].to_pylist() == [1, 0]


def test_zscore_outliers_matches_duckdb(ray_session):
    import duckdb
    import pyarrow as pa
    from rsyslog_ray.stages.aggregate import zscore_outliers
    rng = np.random.RandomState(3)
    vals = rng.normal(10, 2, size=400)
    vals[::97] = 100.0                       # planted outliers
    t = pa.table({"event_id": pa.array(range(400), pa.int64()),
                  "event_type": pa.array([f"t{i % 3}" for i in range(400)]),
                  "value": pa.array(vals, pa.float64())})
    got = sorted((r["event_id"], r["z"]) for r in zscore_outliers(
        rd.from_arrow(t).repartition(5)).take_all())
    want = sorted((i, z) for i, z in duckdb.sql("""
        WITH s AS (SELECT event_type, AVG(value) AS mu,
                          STDDEV_POP(value) AS sd
                   FROM t GROUP BY event_type)
        SELECT e.event_id,
          round((e.value - s.mu) / CASE WHEN s.sd > 0 THEN s.sd ELSE 1 END,
                6) AS z
        FROM t e JOIN s USING (event_type)
        WHERE abs(e.value - s.mu) > 3 * s.sd""").fetchall())
    assert [g[0] for g in got] == [w[0] for w in want]
    np.testing.assert_allclose([g[1] for g in got], [w[1] for w in want],
                               atol=2e-6)
    assert set(range(0, 400, 97)) <= {g[0] for g in got}


def test_funnel_steps_matches_duckdb(ray_session):
    import duckdb
    import pyarrow as pa
    from rsyslog_ray.stages.aggregate import funnel_sql, funnel_steps
    rng = np.random.RandomState(9)
    n = 600
    base = np.datetime64("2024-01-01T00:00:00", "us")
    t = pa.table({
        "user_id": pa.array([f"u{rng.randint(40)}" for _ in range(n)]),
        "event_type": pa.array(rng.choice(
            ["view", "click", "purchase", "error"], size=n).tolist()),
        "ts": pa.array([base + np.timedelta64(int(x), "s")
                        for x in rng.randint(0, 100000, size=n)],
                       pa.timestamp("us")),
    })
    got = sorted((r["user_id"], r["t1"], r["t2"], r["t3"])
                 for r in funnel_steps(
        rd.from_arrow(t).repartition(5),
        ["view", "click", "purchase"]).take_all())
    want = sorted(tuple(r) for r in duckdb.sql(
        funnel_sql(["view", "click", "purchase"], table="t")).fetchall())
    assert got == [tuple(w) for w in want]
    assert 0 < len(got) < 40       # some but not all users convert


def test_ewma_by_key_matches_pandas(ray_session):
    import pyarrow as pa
    from rsyslog_ray.stages.aggregate import ewma_by_key
    rng = np.random.RandomState(4)
    n = 300
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "user_id": pa.array([f"u{i % 7}" for i in range(n)]),
        "ts": pa.array(rng.permutation(n).tolist(), pa.int64()),
        "value": pa.array(rng.normal(size=n), pa.float64()),
    })
    got = {r["event_id"]: r["ewma"] for r in ewma_by_key(
        rd.from_arrow(t).repartition(4), key="user_id",
        order_cols=("ts", "event_id")).take_all()}
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    df["ewma"] = (df.groupby("user_id")["value"]
                  .transform(lambda s: s.ewm(alpha=0.3).mean()).round(6))
    want = dict(zip(df["event_id"], df["ewma"]))
    assert got == want


def test_tdigest_rank_accuracy_and_merge_invariance(ray_session):
    """t-digest quantiles: rank error < 1% at p50/p95/p99 on a heavy-tail
    distribution, stable under repartitioning (mergeable sketches), and
    exact min/max behaviour at the extremes."""
    import pyarrow as pa

    from rsyslog_ray.stages.aggregate import tdigest_quantiles_by_key

    rng = np.random.default_rng(11)
    vals = np.concatenate([rng.lognormal(0.0, 1.5, 30_000),
                           rng.normal(100.0, 5.0, 20_000)])
    keys = np.where(np.arange(len(vals)) % 2 == 0, "a", "b")
    tbl = pa.table({"event_type": pa.array(keys.astype(object), pa.string()),
                    "value": pa.array(vals, pa.float64())})

    results = []
    for nblocks in (1, 13):
        ds = rd.from_arrow(tbl).repartition(nblocks)
        out = tdigest_quantiles_by_key(ds).to_pandas() \
            .set_index("event_type").sort_index()
        results.append(out)
        for k in ("a", "b"):
            v = np.sort(vals[keys == k])
            for q, nm in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
                est = out.loc[k, nm]
                # rank of the estimate in the true distribution
                rank = np.searchsorted(v, est) / len(v)
                assert abs(rank - q) < 0.01, (k, nm, rank, q)
    # merge invariance: both partitionings land within the same rank band
    for nm in ("p50", "p95", "p99"):
        a = results[0][nm].to_numpy()
        b = results[1][nm].to_numpy()
        assert np.allclose(a, b, rtol=0.05), (nm, a, b)


def test_tdigest_close_to_exact_percentiles(ray_session):
    """On the real events table the sketch lands near the exact operator
    (bounded 2-dp domain → both paths see the same data)."""
    from rsyslog_ray.stages.aggregate import (percentiles_by_key,
                                              tdigest_quantiles_by_key)
    from rsyslog_ray.sources import read_scaled

    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001/events.parquet"
    exact = percentiles_by_key(
        read_scaled(src, columns=["event_type", "value"])).to_pandas() \
        .set_index("event_type").sort_index()
    approx = tdigest_quantiles_by_key(
        read_scaled(src, columns=["event_type", "value"])).to_pandas() \
        .set_index("event_type").sort_index()
    assert list(exact.index) == list(approx.index)
    # the sketch's guarantee is on RANKS, not values (a sparse discrete
    # tail can sit far apart in value space at adjacent ranks): the
    # estimate's rank within each type's sorted values must be within
    # ±0.02 of the target quantile (small-n slack: ±2 ranks)
    ev = pq.read_table(src, columns=["event_type", "value"]).to_pandas()
    for k, g in ev.groupby("event_type"):
        v = np.sort(g["value"].to_numpy())
        for q, nm in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            est = approx.loc[k, nm]
            rank = np.searchsorted(v, est, side="right") / len(v)
            tol = max(0.02, 2.0 / len(v))
            assert abs(rank - q) <= tol, (k, nm, rank, q, len(v))


def test_sft_pairs(ray_session):
    """Each assistant turn pairs with the latest PRECEDING user turn;
    tool/system turns are skipped; assistant turns before any user turn
    drop; result is batch-partition invariant."""
    import pyarrow as pa

    from rsyslog_ray.stages.aggregate import sft_pairs

    rows = [
        # conv A: a0 drops (no preceding user), u1→a3 (tool skipped),
        # u4→a5 and u4→a6 (two responses share a prompt)
        ("A", 0, "assistant", "orphan"),
        ("A", 1, "user", "q1"),
        ("A", 2, "tool", "t"),
        ("A", 3, "assistant", "r1"),
        ("A", 4, "user", "q2"),
        ("A", 5, "assistant", "r2a"),
        ("A", 6, "assistant", "r2b"),
        # conv B: system-led, one pair
        ("B", 0, "system", "s"),
        ("B", 1, "user", "qq"),
        ("B", 2, "assistant", "rr"),
    ]
    tbl = pa.table({
        "conv_id": [r[0] for r in rows],
        "turn_idx": pa.array([r[1] for r in rows], pa.int64()),
        "role": [r[2] for r in rows],
        "text": [r[3] for r in rows],
    })
    want = [("A", 1, 3, "q1", "r1"), ("A", 4, 5, "q2", "r2a"),
            ("A", 4, 6, "q2", "r2b"), ("B", 1, 2, "qq", "rr")]
    for nblocks in (1, 4):
        ds = rd.from_arrow(tbl).repartition(nblocks)
        out = sft_pairs(ds).to_pandas().sort_values(
            ["conv_id", "response_turn_idx"]).reset_index(drop=True)
        got = list(out.itertuples(index=False, name=None))
        assert got == want, (nblocks, got)


def test_profile_columns_exact_and_dual_path(ray_session):
    import pyarrow as pa

    from rsyslog_ray.stages.aggregate import profile_columns

    tbl = pa.table({
        "k": ["a", "b", "a", None, "c", "a"],
        "v": pa.array([1, 1, 2, 2, None, 3], pa.int64()),
        "f": pa.array([1.5, 1.5, None, None, 2.25, 3.125], pa.float64()),
    })
    want = {
        "k": (6, 1, 3),   # rows, nulls, distinct (nulls excluded)
        "v": (6, 1, 3),
        "f": (6, 2, 3),
    }
    for thresh in (5_000_000, 0):   # driver fold vs bucketed fold
        out = profile_columns(rd.from_arrow(tbl).repartition(3),
                              driver_threshold=thresh).to_pandas() \
            .set_index("column")
        got = {c: (int(out.loc[c, "n_rows"]), int(out.loc[c, "n_nulls"]),
                   int(out.loc[c, "n_distinct"])) for c in want}
        assert got == want, (thresh, got)


def test_turn_windows(ray_session):
    import pyarrow as pa

    from rsyslog_ray.stages.aggregate import turn_windows

    tbl = pa.table({
        "conv_id": ["A", "A", "A", "A", "B", "B"],
        "turn_idx": pa.array([0, 1, 2, 3, 0, 1], pa.int64()),
        "text": ["t0", "t1", "t2", "t3", "b0", "b1"],
    })
    for nblocks in (1, 3):
        out = turn_windows(rd.from_arrow(tbl).repartition(nblocks),
                           k=3).to_pandas() \
            .sort_values(["conv_id", "turn_idx"])
        assert list(out["context"]) == [
            "t0", "t0\nt1", "t0\nt1\nt2", "t1\nt2\nt3", "b0", "b0\nb1"]


def test_tdigest_distributed_merge_path(ray_session):
    """driver_threshold=0 forces the per-key distributed digest merge;
    results stay within the rank-error band of the driver fold."""
    import pyarrow as pa

    from rsyslog_ray.stages.aggregate import tdigest_quantiles_by_key

    rng = np.random.default_rng(13)
    vals = rng.lognormal(0.0, 1.0, 20_000)
    keys = np.where(np.arange(len(vals)) % 2 == 0, "a", "b")
    tbl = pa.table({"event_type": pa.array(keys.astype(object)),
                    "value": pa.array(vals, pa.float64())})
    ds = rd.from_arrow(tbl).repartition(9)
    a = tdigest_quantiles_by_key(ds).to_pandas().set_index("event_type")
    b = tdigest_quantiles_by_key(ds, driver_threshold=0).to_pandas() \
        .set_index("event_type")
    for k in ("a", "b"):
        v = np.sort(vals[keys == k])
        for q, nm in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            rank = np.searchsorted(v, b.loc[k, nm]) / len(v)
            assert abs(rank - q) < 0.015, (k, nm, rank)
    assert np.allclose(a.to_numpy(), b.to_numpy(), rtol=0.1)


def test_centroid_by_label_dual_fold(ray_session):
    import pyarrow as pa

    from rsyslog_ray.stages.aggregate import centroid_by_label

    rng = np.random.default_rng(17)
    emb = rng.normal(0, 1, (60, 4))
    labels = rng.integers(0, 3, 60)
    tbl = pa.table({"label": pa.array(labels, pa.int64()),
                    "embedding": pa.array(list(emb))})
    outs = []
    for thresh in (2_000_000, 0):   # driver fold vs bucketed merge
        out = centroid_by_label(rd.from_arrow(tbl).repartition(3),
                                driver_threshold=thresh).to_pandas() \
            .sort_values(["label", "dim"]).reset_index(drop=True)
        outs.append(out)
        for lb in range(3):
            want = np.round(emb[labels == lb].mean(axis=0) + 1e-12, 6)
            got = out[out["label"] == lb].sort_values("dim")["centroid"] \
                .to_numpy()
            assert np.allclose(got, want, atol=1e-6), (thresh, lb)
    assert outs[0].equals(outs[1])


def test_corr_matrix_matches_numpy(ray_session):
    import pyarrow as pa

    from rsyslog_ray.stages.aggregate import corr_matrix

    rng = np.random.default_rng(29)
    x = rng.normal(0, 1, (3000, 3))
    x[:, 1] = 0.6 * x[:, 0] + 0.4 * x[:, 1]
    tbl = pa.table({"a": x[:, 0], "b": x[:, 1], "c": x[:, 2]})
    ref = np.corrcoef(x.T)
    prev = None
    for nblocks in (1, 5):
        out = corr_matrix(rd.from_arrow(tbl).repartition(nblocks),
                          ["a", "b", "c"]).to_pandas()
        got = {(r["feature_a"], r["feature_b"]): r["corr"]
               for _, r in out.iterrows()}
        for (fa, fb), v in got.items():
            i, j = "abc".index(fa), "abc".index(fb)
            assert abs(v - ref[i, j]) < 1e-5, (fa, fb)
        if prev is not None:
            assert got == prev     # partition-invariant at 6 dp
        prev = got


def test_winsorize_by_key(ray_session):
    import pyarrow as pa

    from rsyslog_ray.stages.aggregate import winsorize_by_key

    rng = np.random.RandomState(33)
    keys = rng.choice(["a", "b"], 400)
    vals = np.round(rng.uniform(0, 100, 400), 2)
    tbl = pa.table({"event_type": pa.array(keys),
                    "value": pa.array(vals, pa.float64())})
    out = winsorize_by_key(rd.from_arrow(tbl).repartition(3),
                           p_lo=0.1, p_hi=0.9).to_pandas()
    for k in ("a", "b"):
        v = np.sort(vals[keys == k])
        lo = v[int(np.ceil(0.1 * len(v))) - 1]
        hi = v[int(np.ceil(0.9 * len(v))) - 1]
        got = out[out["event_type"] == k]
        assert np.allclose(got["clipped"],
                           np.clip(got["value"], lo, hi))
        assert got["clipped"].min() == lo and got["clipped"].max() == hi


def test_asof_join_tolerance(ray_session):
    """Matches older than the tolerance window count as unmatched
    (inclusive boundary, pandas merge_asof semantics)."""
    import pyarrow as pa

    from rsyslog_ray.stages.joins import asof_join

    ts = np.array(["2024-01-10T00:00:00", "2024-01-20T00:00:00"],
                  dtype="datetime64[us]")
    rts = np.array(["2024-01-08T00:00:00"], dtype="datetime64[us]")
    left = rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([7, 7], pa.int64()),
        "ts": pa.array(ts)}))
    right = rd.from_arrow(pa.table({
        "user_id": pa.array([7], pa.int64()),
        "ts": pa.array(rts)}))
    # 2-day-stale match survives a 2-day window (inclusive); the
    # 12-day-stale one does not
    out = asof_join(left, right, key="user_id", ts_col="ts",
                    tolerance_s=2 * 86400).to_pandas()
    assert list(out["event_id"]) == [1]
    out2 = asof_join(left, right, key="user_id", ts_col="ts").to_pandas()
    assert sorted(out2["event_id"]) == [1, 2]


def test_rollup_counts(ray_session):
    import pyarrow as pa

    from rsyslog_ray.stages.aggregate import rollup_counts

    tbl = pa.table({
        "f": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "s": pa.array([0, 0, 1, 0, 1], pa.int64()),
    })
    out = rollup_counts(rd.from_arrow(tbl), ["f", "s"]).to_pandas()
    rows = {(r["f"], r["s"]): r["rows"]
            for _, r in out.iterrows()}

    def key(f, s):
        return (f if f is not None else None,
                s if s is not None else None)
    assert rows[(1, 0)] == 2 and rows[(1, 1)] == 1
    assert rows[(2, 0)] == 1 and rows[(2, 1)] == 1
    # subtotals per f (s null) and grand total (both null)
    import pandas as pd
    sub = {k: v for k, v in rows.items() if pd.isna(k[1])
           and not pd.isna(k[0])}
    assert {int(k[0]): v for k, v in sub.items()} == {1: 3, 2: 2}
    grand = [v for k, v in rows.items()
             if pd.isna(k[0]) and pd.isna(k[1])]
    assert grand == [5]
    assert len(out) == 7


def test_mad_outliers(ray_session):
    import pyarrow as pa

    from rsyslog_ray.stages.aggregate import mad_outliers

    # tight cluster + two gross outliers per key
    vals = np.concatenate([np.round(np.linspace(9.9, 10.1, 50), 2),
                           [100.0, -50.0]])
    tbl = pa.table({
        "event_id": pa.array(range(len(vals)), pa.int64()),
        "event_type": pa.array(["a"] * len(vals)),
        "value": pa.array(vals, pa.float64()),
    })
    out = mad_outliers(rd.from_arrow(tbl).repartition(3)).to_pandas()
    assert sorted(out["event_id"]) == [50, 51]
    # python oracle
    med = np.median(np.sort(vals)[np.ceil(0.5 * len(vals)).astype(int)
                                  - 1: np.ceil(0.5 * len(vals))
                                  .astype(int)])
    resid = np.round(np.abs(vals - med), 2)
    mad = np.sort(resid)[int(np.ceil(0.5 * len(resid))) - 1]
    want = np.flatnonzero(np.abs(vals - med) > 3 * mad)
    assert sorted(out["event_id"]) == sorted(want.tolist())


def test_dyn_inc_unused_metric_life_ttl(ray_session):
    """unusedMetricLife (dynstats.c:35-46): keys whose LAST increment is
    older than the TTL before the stream's max timestamp are expired from
    the emitted counters; fresh keys keep their FULL count."""
    import datetime as dt
    import pyarrow as pa
    import ray.data as rd
    from rsyslog_ray.stages.aggregate import dyn_inc
    t0 = dt.datetime(2026, 1, 1)
    rows = (
        [("stale", t0)] * 3
        + [("fresh", t0), ("fresh", t0 + dt.timedelta(seconds=7000))]
        + [("late", t0 + dt.timedelta(seconds=7000))] * 2
    )
    tbl = pa.table({
        "tool": pa.array([r[0] for r in rows]),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    })
    got = dyn_inc(rd.from_arrow(tbl), "b", "tool",
                  unused_metric_life_s=3600)
    d = dict(zip(got["key"].to_pylist(), got["rows"].to_pylist()))
    assert d == {"fresh": 2, "late": 2}   # 'stale' expired by the sweep
    # TTL off → all keys
    full = dyn_inc(rd.from_arrow(tbl), "b", "tool")
    assert dict(zip(full["key"].to_pylist(),
                    full["rows"].to_pylist())) == {
        "fresh": 2, "late": 2, "stale": 3}


def test_roc_auc_matches_numpy_rank_formula(ray_session):
    """Tie-aware AUC vs a direct O(n^2) pair count on a small random
    fixture (ties planted by rounding scores to one decimal)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from rsyslog_ray.stages.aggregate import roc_auc

    rng = np.random.default_rng(7)
    s = np.round(rng.normal(size=400), 1)
    lab = (rng.random(400) < 0.3).astype(np.int64)
    tbl = pa.table({"score": pa.array(s), "label": pa.array(lab)})
    got = roc_auc(rd.from_arrow(tbl).repartition(7))
    ps, ns = s[lab == 1], s[lab == 0]
    wins = (ps[:, None] > ns[None, :]).sum() \
        + 0.5 * (ps[:, None] == ns[None, :]).sum()
    want = wins / (len(ps) * len(ns))
    assert got["auc"][0].as_py() == want       # exact (half-int sums)
    assert got["n_pos"][0].as_py() == len(ps)
    assert got["n_neg"][0].as_py() == len(ns)


def test_roc_auc_perfect_and_degenerate(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from rsyslog_ray.stages.aggregate import roc_auc

    tbl = pa.table({"score": pa.array([1.0, 2.0, 3.0, 4.0]),
                    "label": pa.array([0, 0, 1, 1])})
    assert roc_auc(rd.from_arrow(tbl))["auc"][0].as_py() == 1.0
    one_class = pa.table({"score": pa.array([1.0, 2.0]),
                          "label": pa.array([1, 1])})
    assert roc_auc(rd.from_arrow(one_class))["auc"][0].as_py() is None


def test_prf_at_threshold_hand_counts(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from rsyslog_ray.stages.aggregate import prf_at_threshold

    # scores:  1 2 3 4 5 6 ; labels: 0 1 0 1 1 0 ; rule s >= 4
    tbl = pa.table({"score": pa.array([1.0, 2, 3, 4, 5, 6]),
                    "label": pa.array([0, 1, 0, 1, 1, 0])})
    got = prf_at_threshold(rd.from_arrow(tbl).repartition(3),
                           threshold=4.0).to_pylist()[0]
    assert (got["tp"], got["fp"], got["fn"], got["tn"]) == (2, 1, 1, 2)
    assert got["precision"] == 2 / 3
    assert got["recall"] == 2 / 3
    assert got["f1"] == 4 / 6
    # degenerate: no predicted positives -> precision null
    none_pred = prf_at_threshold(rd.from_arrow(tbl), threshold=99.0) \
        .to_pylist()[0]
    assert none_pred["precision"] is None and none_pred["tp"] == 0


def test_metrics_drop_null_rows(ray_session):
    """Rows with a null score or label are excluded from both metric ops
    (sklearn semantics); the SQL twins filter identically."""
    import pyarrow as pa
    import ray.data as rd
    from rsyslog_ray.stages.aggregate import prf_at_threshold, roc_auc

    tbl = pa.table({"score": pa.array([1.0, None, 3.0, 4.0]),
                    "label": pa.array([1, 0, None, 0], pa.int64())})
    # survivors: (1.0, 1), (4.0, 0) -> AUC = 0 (positive ranked below)
    assert roc_auc(rd.from_arrow(tbl))["auc"][0].as_py() == 0.0
    got = prf_at_threshold(rd.from_arrow(tbl), 2.0).to_pylist()[0]
    assert (got["tp"], got["fp"], got["fn"], got["tn"]) == (0, 1, 1, 0)


def test_event_pattern_counts_planted_sequences(ray_session):
    """Hand-built sequences: user 1 has 'vcp vp' -> 2 matches of vc*p
    (non-overlapping); user 2 has clicks but no purchase -> no row;
    unmapped types are skipped, ties broken by event_id."""
    import datetime as dt
    import pyarrow as pa
    import ray.data as rd
    from rsyslog_ray.stages.aggregate import event_pattern_counts

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        # user 1: v c p (ts 0,1,2) then v p (3,4) -> "vcpvp" -> 2
        (1, "view", 0), (1, "click", 1), (1, "purchase", 2),
        (1, "view", 3), (1, "purchase", 4),
        (2, "view", 0), (2, "click", 1), (2, "click", 2),   # no purchase
        # user 3: same-ts tie broken by event_id: v(id 8) then p(id 9)
        (3, "view", 5), (3, "purchase", 5),
        (3, "unknown_type", 6),                             # skipped
    ]
    tbl = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows]),
        "ts": pa.array([t0 + dt.timedelta(seconds=r[2]) for r in rows],
                       pa.timestamp("us")),
    })
    from rsyslog_ray.pipelines.queries import EVENT_CHARS
    got = event_pattern_counts(rd.from_arrow(tbl).repartition(3),
                               pattern="vc*p", type_map=EVENT_CHARS) \
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    assert got.user_id.tolist() == [1, 3]
    assert got.n_matches.tolist() == [2, 1]


def test_event_pattern_counts_duckdb_parity_random(ray_session):
    import datetime as dt
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from rsyslog_ray.pipelines.queries import EVENT_CHARS
    from rsyslog_ray.stages.aggregate import (event_pattern_counts,
                                              event_pattern_counts_sql)

    rng = np.random.default_rng(21)
    n = 2000
    t0 = dt.datetime(2026, 1, 1)
    types = np.array(list(EVENT_CHARS.keys()))
    tbl = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "user_id": pa.array(rng.integers(0, 60, n), pa.int64()),
        "event_type": pa.array(types[rng.integers(0, len(types), n)]),
        "ts": pa.array([t0 + dt.timedelta(seconds=int(s))
                        for s in rng.integers(0, 500, n)],
                       pa.timestamp("us")),
    })
    con = duckdb.connect()
    con.register("events", tbl)
    for pat in ("vc*p", "sv+p", "e{2,}"):
        got = event_pattern_counts(rd.from_arrow(tbl).repartition(5),
                                   pattern=pat, type_map=EVENT_CHARS) \
            .to_pandas().sort_values("user_id").reset_index(drop=True)
        want = con.execute(event_pattern_counts_sql(pat, EVENT_CHARS)
                           + " ORDER BY user_id").df()
        assert got.user_id.tolist() == want.user_id.tolist(), pat
        assert got.n_matches.tolist() == want.n_matches.tolist(), pat
