"""Text-analysis stages for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All vectorized (pyarrow.compute regex kernels / numpy); language-ID keeps
its stopword sets compiled in an actor (__init__ once per worker).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"\S+"
WORD_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"  # BPE-ish: words + solo punctuation


def token_stats_table(batch: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """doc_id, n_chars, n_tokens (whitespace), n_bpeish (word/punct split).
    SQL-mirrorable: length(), length(regexp_extract_all(...))."""
    txt = pc.cast(batch[text_col], pa.string())
    return pa.table({
        id_col: batch[id_col],
        "n_chars": pc.utf8_length(txt),
        "n_tokens": pc.count_substring_regex(txt, pattern=TOKEN_RE),
        "n_bpeish": pc.count_substring_regex(txt, pattern=WORD_RE),
    })


class QualityScore:
    """Actor stage: heuristic quality metrics (stopword ratio, mean word
    length, punctuation ratio, digit ratio) + a composite score."""

    STOPWORDS = {"the", "and", "of", "a", "to", "in", "is", "it", "that",
                 "for", "on", "with", "as", "was", "at", "by", "an", "be"}

    def __init__(self, text_col: str = "text"):
        import re
        self.word = re.compile(r"[a-z]+")
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col].fillna("")
        low = texts.str.lower()
        words = low.str.findall(self.word)
        n_words = words.map(len).clip(lower=1)
        stop_ratio = words.map(
            lambda ws: sum(w in self.STOPWORDS for w in ws)) / n_words
        mean_wlen = words.map(lambda ws: float(np.mean([len(w) for w in ws]))
                              if ws else 0.0)
        n_chars = texts.str.len().clip(lower=1)
        # explicit ASCII classes (not \w/\d) so the DuckDB RE2 oracle is
        # character-for-character identical
        punct_ratio = texts.str.count(r"[^A-Za-z0-9\s]") / n_chars
        digit_ratio = texts.str.count(r"[0-9]") / n_chars
        batch = batch.assign(
            stop_ratio=stop_ratio.round(6),
            mean_word_len=mean_wlen.round(6) if hasattr(mean_wlen, 'round') else mean_wlen,
            punct_ratio=punct_ratio.round(6),
            digit_ratio=digit_ratio.round(6),
        )
        batch["quality"] = (
            (batch["stop_ratio"].clip(0, 0.6) / 0.6) * 0.5
            + (1 - batch["punct_ratio"].clip(0, 0.3) / 0.3) * 0.3
            + (1 - batch["digit_ratio"].clip(0, 0.3) / 0.3) * 0.2
        ).round(6)
        return batch


def quality_scores(ds, text_col: str = "text", concurrency=None,
                   batch_size: int = 4096):
    """Task-mode by default (instance serialized once; regex compiled at
    construction). Pass concurrency to opt into an actor pool for heavy
    state (model-scorer shape)."""
    if concurrency:
        return ds.map_batches(QualityScore, fn_constructor_args=(text_col,),
                              batch_format="pandas", batch_size=batch_size,
                              concurrency=concurrency)
    return ds.map_batches(QualityScore(text_col), batch_format="pandas",
                          batch_size=batch_size)


class LangId:
    """n-gram/stopword language-ID heuristic (en/de/fr/es/unknown).
    Tiny stopword profiles compiled once per actor."""

    PROFILES = {
        "en": {"the", "and", "of", "to", "in", "is", "you", "that", "it"},
        "de": {"der", "die", "das", "und", "ist", "nicht", "ich", "ein"},
        "fr": {"le", "la", "les", "et", "est", "pas", "je", "une", "que"},
        "es": {"el", "la", "los", "y", "es", "no", "una", "que", "por"},
    }

    def __init__(self, text_col: str = "text"):
        import re
        self.word = re.compile(r"[a-záéíóúüäöñç]+")
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        def ident(t: str) -> str:
            ws = set(self.word.findall((t or "").lower()))
            best, bestn = "unknown", 0
            for lang, prof in self.PROFILES.items():
                n = len(ws & prof)
                if n > bestn:
                    best, bestn = lang, n
            return best if bestn >= 2 else "unknown"
        batch["lang_pred"] = batch[self.text_col].map(ident)
        return batch


def langid(ds, text_col: str = "text", concurrency=None):
    if concurrency:
        return ds.map_batches(LangId, fn_constructor_args=(text_col,),
                              batch_format="pandas", concurrency=concurrency)
    return ds.map_batches(LangId(text_col), batch_format="pandas")


_FP_BASE = np.uint64(1000003)


def _fingerprint_one(b: bytes, window: int) -> np.uint64:
    """min polynomial hash over all `window`-byte windows — `window`
    whole-array passes (h = h·B + byte), no per-byte Python loop."""
    a = np.frombuffer(b.ljust(window), dtype=np.uint8)
    n = len(a) - window + 1
    with np.errstate(over="ignore"):
        h = np.zeros(n, dtype=np.uint64)
        for i in range(window):
            h = h * _FP_BASE + a[i:i + n].astype(np.uint64)
    return h.min()


def fingerprint_table(batch: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id", window: int = 8) -> pa.Table:
    """Rolling-hash document fingerprint: min window hash (winnowing-style
    1-fingerprint summary), deterministic."""
    texts = pc.cast(batch[text_col], pa.string()).to_pylist()
    out = np.fromiter(
        (_fingerprint_one((t or "").encode("utf-8", "ignore"), window)
         for t in texts), dtype=np.uint64, count=len(texts))
    return pa.table({id_col: batch[id_col],
                     "fingerprint": pa.array(out.view(np.int64))})
