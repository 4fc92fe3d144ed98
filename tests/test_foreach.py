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
