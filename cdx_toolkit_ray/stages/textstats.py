"""Text analysis stages: token counting, quality scoring, language ID,
document fingerprinting.

Training-data operators over the ``documents`` / ``pages`` text columns
(driver brief: "lang-ID (n-gram heuristic), quality scoring
(length/punct/stopword ratios), token counting (whitespace + a BPE-ish
regex), document fingerprinting (rolling hash)").

Everything here is a stateless vectorized ``map_batches`` stage; the
kernels are chosen to be EXACTLY reproducible in ANSI SQL (DuckDB)
where possible so the driver's oracle can value-check them:

* ``n_tokens_ws``  == len(regexp_extract_all(text, '\\S+'))
* ``n_tokens_re``  == len(regexp_extract_all(text, '\\w+|[^\\w\\s]'))
* ``stopword_ratio`` over whitespace tokens vs a fixed list
* ``lang_id``: argmax of per-language stopword hit counts with a
  deterministic alphabetical tie-break
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

WS_RE = re.compile(r"\S+")
BPE_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for")

# tiny per-language marker sets for the heuristic language ID
LANG_MARKERS = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "a", "of", "and", "to", "in", "is", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "por"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une"),
}


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append ``n_tokens_ws`` (whitespace) and ``n_tokens_re``
    (BPE-ish word/punct regex) counts."""
    texts = batch[text_col].to_numpy(zero_copy_only=False)
    ws = np.fromiter((len(WS_RE.findall(t or "")) for t in texts),
                     np.int64, len(texts))
    bpe = np.fromiter((len(BPE_RE.findall(t or "")) for t in texts),
                      np.int64, len(texts))
    batch = batch.append_column("n_tokens_ws", pa.array(ws, pa.int64()))
    batch = batch.append_column("n_tokens_re", pa.array(bpe, pa.int64()))
    return batch


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append quality metrics: char count, whitespace-token count, mean
    token length, stopword ratio (all SQL-reproducible)."""
    texts = batch[text_col].to_numpy(zero_copy_only=False)
    n = len(texts)
    n_chars = np.empty(n, np.int64)
    n_tok = np.empty(n, np.int64)
    n_stop = np.empty(n, np.int64)
    mean_len = np.empty(n, np.float64)
    stop_ratio = np.empty(n, np.float64)
    stopset = set(STOPWORDS)
    for i, t in enumerate(texts):
        t = t or ""
        toks = WS_RE.findall(t)
        n_chars[i] = len(t)
        n_tok[i] = len(toks)
        n_stop[i] = sum(1 for w in toks if w in stopset)
        if toks:
            mean_len[i] = sum(len(w) for w in toks) / len(toks)
            stop_ratio[i] = n_stop[i] / len(toks)
        else:
            mean_len[i] = 0.0
            stop_ratio[i] = 0.0
    for name, arr, typ in (("n_chars_actual", n_chars, pa.int64()),
                           ("n_tokens_ws", n_tok, pa.int64()),
                           ("n_stopwords", n_stop, pa.int64()),
                           ("mean_token_len", mean_len, pa.float64()),
                           ("stopword_ratio", stop_ratio, pa.float64())):
        if name in batch.column_names:
            batch = batch.drop_columns([name])
        batch = batch.append_column(name, pa.array(arr, typ))
    return batch


def lang_id_batch(batch: pa.Table, text_col: str = "text",
                  out_col: str = "lang_pred") -> pa.Table:
    """Append the heuristic language guess.

    Score per language = count of whitespace tokens in that language's
    marker set; winner = max score, ties broken alphabetically;
    'und' (undetermined) when all scores are zero.
    """
    texts = batch[text_col].to_numpy(zero_copy_only=False)
    langs = sorted(LANG_MARKERS)
    marker_sets = {l: set(LANG_MARKERS[l]) for l in langs}
    out = np.empty(len(texts), dtype=object)
    for i, t in enumerate(texts):
        toks = WS_RE.findall((t or "").lower())
        best_lang, best_score = "und", 0
        for l in langs:
            s = sum(1 for w in toks if w in marker_sets[l])
            if s > best_score:
                best_lang, best_score = l, s
        out[i] = best_lang
    return batch.append_column(out_col, pa.array(out, pa.string()))


def make_fingerprint_stage(text_col: str = "text", window: int = 4,
                           out_col: str = "fingerprint"):
    """Winnowing-style document fingerprint: min rolling hash over word
    ``window``-grams (deterministic; robust to small edits at the
    min-selection level)."""
    from .dedup import _hash_text_array

    def fingerprint(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_numpy(zero_copy_only=False)
        out = np.zeros(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            words = WS_RE.findall((t or "").lower())
            if not words:
                continue
            if len(words) < window:
                grams = [" ".join(words)]
            else:
                grams = [" ".join(words[j:j + window])
                         for j in range(len(words) - window + 1)]
            out[i] = _hash_text_array(grams).min()
        return batch.append_column(out_col, pa.array(out, pa.uint64()))

    return fingerprint
