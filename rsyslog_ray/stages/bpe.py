"""Distributed BPE tokenizer induction (Sennrich et al. 2016,
arXiv:1508.07909) and tokenization under the learned vocabulary.

Scale shape: BPE trains on the WORD HISTOGRAM, not the corpus — the only
full-data pass is a distributed word count (per-batch np.unique partials
→ hash-bucketed merge → exact global top-`max_words` cap), after which
the classic merge loop runs on the driver over ≤ max_words (word, freq)
rows. That is the standard implementation shape (subword-nmt trains from
`get_vocabulary()` of a counter), and it is why tokenizer training over
a 100 TB corpus is cheap: the histogram is MBs.

Tokenization back over the corpus is a map_batches stage that encodes
each batch's DISTINCT words once (cached across batches in actor state)
and scatters counts back to rows — the per-unique-word merge loop is the
only non-vectorized part, bounded by the batch vocabulary, never row
count.

Determinism: merge ties break (freq desc, pair lexicographic asc); the
histogram cap ties break (freq desc, word asc). No RNG anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: end-of-word sentinel (subword-nmt's '</w>')
EOW = "</w>"


def word_histogram(ds, text_col: str = "text",
                   max_words: int = 50_000) -> list[tuple[str, int]]:
    """Exact global top-`max_words` whitespace words by frequency.
    Same exactness argument as textstats.top_ngrams: after bucket_merge
    every word's global count lives in exactly one block, so the union
    of per-block top-k's contains the global top-k."""
    def partial(batch: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(
            pc.fill_null(pc.cast(batch[text_col], pa.string()), ""),
            pattern=r"\s+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.flatten().to_numpy(zero_copy_only=False)
        words = flat[flat != ""]
        if not len(words):
            return pa.table({"w": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        u, c = np.unique(words.astype("U"), return_counts=True)
        return pa.table({"w": pa.array(u.astype(object), pa.string()),
                         "cnt": pa.array(c.astype(np.int64))})

    from .aggregate import bucket_merge
    merged = bucket_merge(ds.map_batches(partial, batch_format="pyarrow"),
                          ["w"], {"cnt": ("cnt", "sum")})

    def block_top(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["cnt", "w"],
                                       ascending=[False, True],
                                       kind="mergesort").head(max_words)
        return pa.Table.from_pandas(df, preserve_index=False)

    rows = merged.map_batches(block_top, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (-r["cnt"], r["w"]))
    return [(r["w"], r["cnt"]) for r in rows[:max_words]]


def bpe_train_from_histogram(hist: list[tuple[str, int]],
                             n_merges: int = 200) -> list[dict]:
    """Classic BPE merge loop over a (word, freq) histogram. Returns the
    ranked merge table [{rank, left, right, freq}]. Pure and deterministic
    — shared by the engine and the pytest oracle."""
    words = [tuple(w) + (EOW,) for w, _ in hist]
    freqs = [f for _, f in hist]

    pair_counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for i, syms in enumerate(words):
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + freqs[i]
            where.setdefault((a, b), set()).add(i)

    merges = []
    for rank in range(n_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), freq = best
        if freq < 2:
            break
        merges.append({"rank": rank, "left": left, "right": right,
                       "freq": freq})
        new_sym = left + right
        for i in list(where.get((left, right), ())):
            syms = words[i]
            f = freqs[i]
            out = []
            j = 0
            while j < len(syms):
                if (j < len(syms) - 1 and syms[j] == left
                        and syms[j + 1] == right):
                    out.append(new_sym)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            # retract old adjacencies, add new ones
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= f
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                    where.pop((a, b), None)
                else:
                    s = where.get((a, b))
                    if s is not None:
                        s.discard(i)
            new = tuple(out)
            words[i] = new
            for a, b in zip(new, new[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + f
                where.setdefault((a, b), set()).add(i)
    return merges


def bpe_train(ds, text_col: str = "text", n_merges: int = 200,
              max_words: int = 50_000) -> pa.Table:
    """Distributed histogram pass + driver merge loop → merge table."""
    hist = word_histogram(ds, text_col=text_col, max_words=max_words)
    merges = bpe_train_from_histogram(hist, n_merges=n_merges)
    return pa.table({
        "rank": pa.array([m["rank"] for m in merges], pa.int64()),
        "left": pa.array([m["left"] for m in merges], pa.string()),
        "right": pa.array([m["right"] for m in merges], pa.string()),
        "freq": pa.array([m["freq"] for m in merges], pa.int64()),
    })


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Number of BPE symbols for one word under the learned merges —
    the standard lowest-rank-first merge application."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_j = None, -1
        for j in range(len(syms) - 1):
            r = ranks.get((syms[j], syms[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        syms[best_j:best_j + 2] = [syms[best_j] + syms[best_j + 1]]
    return len(syms)


class BpeTokenCounter:
    """Actor-pool map_batches stage: per-doc BPE token count under a
    broadcast merge table. Encodes each batch's distinct words once and
    caches word→n_tokens across batches (actor state), so the Python
    merge loop runs O(new distinct words), not O(rows)."""

    def __init__(self, merges_ref, text_col: str = "text",
                 id_col: str = "doc_id"):
        import ray
        m = ray.get(merges_ref) if isinstance(merges_ref, ray.ObjectRef) \
            else merges_ref
        self.ranks = {(le, ri): rk for rk, le, ri in zip(
            m["rank"].to_pylist(), m["left"].to_pylist(),
            m["right"].to_pylist())}
        self.cache: dict[str, int] = {}
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(
            pc.fill_null(pc.cast(batch[self.text_col], pa.string()), ""),
            pattern=r"\s+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        offs = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = lists.flatten().to_numpy(zero_copy_only=False)
        rowidx = np.repeat(np.arange(batch.num_rows), offs[1:] - offs[:-1])
        keep = flat != ""
        words, rowidx = flat[keep], rowidx[keep]
        uniq, inv = np.unique(words.astype("U"), return_inverse=True)
        toks = np.empty(len(uniq), np.int64)
        for i, w in enumerate(uniq):
            c = self.cache.get(w)
            if c is None:
                c = self.cache[w] = encode_word(str(w), self.ranks)
            toks[i] = c
        per_row = np.zeros(batch.num_rows, np.int64)
        np.add.at(per_row, rowidx, toks[inv])
        return pa.table({
            self.id_col: pc.cast(batch[self.id_col], pa.int64()),
            "bpe_tokens": pa.array(per_row),
        })


def bpe_token_counts(ds, merges: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id", concurrency: int = 2):
    import ray
    ref = ray.put(merges)
    return ds.map_batches(BpeTokenCounter,
                          fn_constructor_args=(ref, text_col, id_col),
                          batch_format="pyarrow", concurrency=concurrency)
