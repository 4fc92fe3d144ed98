"""BPE induction vs a naive recount-from-scratch oracle."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from rsyslog_ray.stages.bpe import (EOW, bpe_token_counts, bpe_train,
                                    bpe_train_from_histogram, encode_word,
                                    word_histogram)

TEXTS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new low",
    "the newest widest low lower",
]


def _naive_bpe(hist, n_merges):
    """Re-derives pair counts from scratch every round — slow, obviously
    correct, independent of the incremental engine implementation."""
    words = {i: list(w) + [EOW] for i, (w, _) in enumerate(hist)}
    freqs = {i: f for i, (_, f) in enumerate(hist)}
    merges = []
    for rank in range(n_merges):
        counts = {}
        for i, syms in words.items():
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + freqs[i]
        if not counts:
            break
        (left, right), freq = min(counts.items(),
                                  key=lambda kv: (-kv[1], kv[0]))
        if freq < 2:
            break
        merges.append((rank, left, right, freq))
        for i, syms in words.items():
            out, j = [], 0
            while j < len(syms):
                if (j < len(syms) - 1 and syms[j] == left
                        and syms[j + 1] == right):
                    out.append(left + right)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
    return merges


def _tbl():
    return pa.table({"doc_id": pa.array(range(len(TEXTS)), pa.int64()),
                     "text": pa.array(TEXTS, pa.string())})


def test_word_histogram_exact_and_partition_invariant(ray_session):
    from collections import Counter
    want = Counter(w for t in TEXTS for w in t.split())
    for parts in (1, 4):
        hist = word_histogram(rd.from_arrow(_tbl()).repartition(parts))
        assert dict(hist) == dict(want)
        # ordering: freq desc then word asc
        keys = [(-c, w) for w, c in hist]
        assert keys == sorted(keys)


def test_bpe_train_matches_naive_oracle(ray_session):
    got = bpe_train(rd.from_arrow(_tbl()), n_merges=30)
    hist = word_histogram(rd.from_arrow(_tbl()))
    want = _naive_bpe(hist, 30)
    rows = list(zip(got["rank"].to_pylist(), got["left"].to_pylist(),
                    got["right"].to_pylist(), got["freq"].to_pylist()))
    assert rows == want
    assert len(rows) > 5        # fixture is mergeable


def test_incremental_matches_naive_on_fuzz():
    rng = np.random.RandomState(7)
    alpha = list("abcde")
    for _ in range(10):
        vocab = ["".join(rng.choice(alpha, size=rng.randint(1, 7)))
                 for _ in range(20)]
        hist = sorted({w: int(rng.randint(1, 50)) for w in vocab}.items(),
                      key=lambda kv: (-kv[1], kv[0]))
        fast = [(m["rank"], m["left"], m["right"], m["freq"])
                for m in bpe_train_from_histogram(hist, 40)]
        assert fast == _naive_bpe(hist, 40)


def test_encode_word_and_token_counts(ray_session):
    merges = bpe_train(rd.from_arrow(_tbl()), n_merges=50)
    ranks = {(le, ri): rk for rk, le, ri in zip(
        merges["rank"].to_pylist(), merges["left"].to_pylist(),
        merges["right"].to_pylist())}
    # a fully-merged frequent word collapses to few symbols
    assert encode_word("low", ranks) < len("low") + 1
    got = {r["doc_id"]: r["bpe_tokens"] for r in bpe_token_counts(
        rd.from_arrow(_tbl()).repartition(3), merges).take_all()}
    want = {i: sum(encode_word(w, ranks) for w in t.split())
            for i, t in enumerate(TEXTS)}
    assert got == want
