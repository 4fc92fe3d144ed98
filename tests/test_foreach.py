"""Generic foreach explode (stages/foreach.py) vs runtime/ruleset.c:323-417
semantics: array iteration, object key/value iteration, skip-invalid."""

import numpy as np
import pyarrow as pa

from rsyslog_ray.stages.foreach import explode_json_object, explode_list


def test_explode_list_values_and_index():
    t = pa.table({"id": pa.array([1, 2, 3]),
                  "arr": pa.array([[10, 20], [], [30]],
                                  pa.list_(pa.int64()))})
    out = explode_list(t, "arr", out="v").to_pydict()
    assert out["id"] == [1, 1, 3]
    assert out["idx"] == [1, 2, 1]          # 1-based loop counter
    assert out["v"] == [10, 20, 30]


def test_explode_fixed_size_list():
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array([1.0, 2.0, 3.0, 4.0]), 2)
    t = pa.table({"id": pa.array([7, 8]), "arr": arr})
    out = explode_list(t, "arr", out="v").to_pydict()
    assert out["id"] == [7, 7, 8, 8] and out["v"] == [1.0, 2.0, 3.0, 4.0]


def test_explode_json_object_pairs_and_skip():
    t = pa.table({"id": pa.array([1, 2, 3, 4]),
                  "j": pa.array(['{"a":1,"b":"x"}', "[1,2]", "notjson",
                                 '{"c":{"d":5}}'], pa.string())})
    out = explode_json_object(t, "j").to_pydict()
    assert out["id"] == [1, 1, 4]           # arrays/invalid skipped
    assert out["key"] == ["a", "b", "c"]
    assert out["value"] == ["1", "x", '{"d":5}']


def test_explode_list_empty_batch():
    t = pa.table({"id": pa.array([], pa.int64()),
                  "arr": pa.array([], pa.list_(pa.int64()))})
    out = explode_list(t, "arr")
    assert out.num_rows == 0 and set(out.column_names) == {"id", "idx", "item"}


def test_foreach_accumulator_carries_across_iterations():
    """Reference execForeach mutates ONE message sequentially: a counter
    set in iteration k must be visible in iteration k+1 (the round-4
    review repro: count ended at 1 instead of 3)."""
    import pyarrow as pa

    from rsyslog_ray.config import CompiledConfig
    from rsyslog_ray.rainerscript import parse_rainerscript
    from rsyslog_ray.stages.route import route_table

    src = '''
    template(name="t" type="string" string="%hostname% n=%$.n%")
    set $.n = 0;
    foreach ($.x in $!arr) do {
        set $.n = cnum($.n) + 1;
    }
    action(type="omfile" name="after" template="t")
    '''
    cfg = CompiledConfig(parse_rainerscript(src))
    batch = pa.table({
        "hostname": ["h1", "h2", "h3"],
        "msg": ["a", "b", "c"],
        "cee_json": ['{"arr":["p","q","r"]}', '{"arr":[7]}', '{}'],
    })
    out = route_table(batch, cfg.ruleset)
    assert out["after"]["rendered"].to_pylist() == [
        "h1 n=3", "h2 n=1", "h3 n=0"]


def test_foreach_json_tree_loop_variable():
    """foreach ($!x in ...) binds the element into the message JSON tree
    so $!x reads resolve (grammar admits $! loop vars; the round-4
    review repro rendered empty)."""
    import pyarrow as pa

    from rsyslog_ray.config import CompiledConfig
    from rsyslog_ray.rainerscript import parse_rainerscript
    from rsyslog_ray.stages.route import route_table

    src = '''
    template(name="t" type="string" string="%hostname% x=%$!x%")
    foreach ($!x in $!arr) do {
        action(type="omfile" name="items" template="t")
    }
    '''
    cfg = CompiledConfig(parse_rainerscript(src))
    batch = pa.table({
        "hostname": ["h1", "h2"],
        "msg": ["a", "b"],
        "cee_json": ['{"arr":["p","q"]}', '{}'],
    })
    out = route_table(batch, cfg.ruleset)
    items = sorted(out["items"]["rendered"].to_pylist())
    assert items == ["h1 x=p", "h1 x=q"]


def test_foreach_object_element_is_canonical_json():
    """Dict elements serialize with sorted keys in BOTH iterable storage
    types (native list column and JSON string column)."""
    import pyarrow as pa

    from rsyslog_ray.stages.route import route_table
    from rsyslog_ray.config import CompiledConfig
    from rsyslog_ray.rainerscript import parse_rainerscript

    src = '''
    template(name="t" type="string" string="%$.x%")
    foreach ($.x in $!arr) do {
        action(type="omfile" name="items" template="t")
    }
    '''
    cfg = CompiledConfig(parse_rainerscript(src))
    batch = pa.table({
        "hostname": ["h1"], "msg": ["a"],
        "cee_json": ['{"arr":[{"b":1,"a":2}]}'],
    })
    out = route_table(batch, cfg.ruleset)
    assert out["items"]["rendered"].to_pylist() == ['{"a":2,"b":1}']
