"""Inverted text index: distributed build → hash-partitioned Parquet
posting lists → partition-pruned keyword lookup.

The 100 TB search pattern: the corpus is tokenized ONCE into (token,
doc_id) postings, hash-partitioned by token into P directories
(`part=<h>/`), and a keyword query then reads exactly ONE partition
directory (`columns=` + dictionary filter), never the corpus — the
"prune at the read" rule applied to text search. Rebuilding is
incremental per corpus shard (the posting write is idempotent per
partition, same atomic tmp→rename discipline as the sinks).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions import hash64


def _tokens(txt: pa.Array):
    lists = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(pc.cast(txt, pa.string()), "")),
        pattern=r"\s+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    offs = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = lists.flatten().to_numpy(zero_copy_only=False)
    rowidx = np.repeat(np.arange(len(offs) - 1), offs[1:] - offs[:-1])
    keep = flat != ""
    return flat[keep], rowidx[keep]


def token_partition(token: str, n_partitions: int) -> int:
    h = hash64(pa.array([token.lower()], pa.string()))
    return int(h[0].as_py() % n_partitions)


def build_inverted_index(ds, out_root: str, text_col: str = "text",
                         id_col: str = "doc_id", n_partitions: int = 16):
    """One map_batches pass: per-batch distinct (token, doc) postings,
    written directly into `out_root/part=<hash(token)%P>/` from inside
    the map task (no driver round-trip; the write IS the sink). Returns
    the total posting count."""
    import ray

    def write_postings(batch: pa.Table) -> pa.Table:
        toks, rows = _tokens(batch[text_col])
        ids = pc.cast(batch[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        if len(toks):
            import pandas as pd
            df = pd.DataFrame({"token": toks,
                               "doc": ids[rows]}).drop_duplicates()
            h = hash64(pa.array(df["token"].to_numpy(object),
                                pa.string())).to_numpy(
                                    zero_copy_only=False)
            df["part"] = (h % np.uint64(n_partitions)).astype(np.int64)
            for part, g in df.groupby("part", sort=False):
                d = os.path.join(out_root, f"part={part}")
                os.makedirs(d, exist_ok=True)
                t = pa.table({
                    "token": pa.array(g["token"].to_numpy(object),
                                      pa.string()),
                    "doc": pa.array(g["doc"].to_numpy(np.int64)),
                })
                import hashlib
                name = hashlib.sha1(
                    t["doc"].to_numpy(zero_copy_only=False).tobytes()
                    + str(part).encode()).hexdigest()[:16]
                tmp = os.path.join(d, f"._tmp-{name}")
                pq.write_table(t, tmp)
                os.rename(tmp, os.path.join(d, f"post-{name}.parquet"))
            n = len(df)
        else:
            n = 0
        return pa.table({"n": pa.array([n], pa.int64())})

    total = 0
    for t in ds.map_batches(write_postings, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        total += int(pc.sum(t["n"]).as_py() or 0)
    return total


def search_index(index_root: str, token: str,
                 n_partitions: int = 16) -> pa.Table:
    """Point lookup: read ONE partition directory, filter to the token,
    return sorted distinct doc ids. At cluster scale this is a single
    ray.data.read_parquet(dir, filter=...) over ~1/P of the index; here
    the partition fits in one pyarrow read."""
    part = token_partition(token, n_partitions)
    d = os.path.join(index_root, f"part={part}")
    if not os.path.isdir(d):
        return pa.table({"doc_id": pa.array([], pa.int64())})
    t = pq.read_table(d, columns=["token", "doc"])
    hits = t.filter(pc.equal(t["token"], token.lower()))["doc"]
    u = pc.unique(hits.combine_chunks() if isinstance(
        hits, pa.ChunkedArray) else hits)
    return pa.table({"doc_id": pc.take(u, pc.sort_indices(u))})
