"""repeated_span_stats vs a brute-force driver reference + DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from cdx_toolkit_ray.stages.spans import repeated_span_stats

pytestmark = pytest.mark.usefixtures("ray_session")

BOILER = "all rights reserved contact us for licensing terms today"


def _brute(docs: pd.DataFrame, k: int, min_docs: int) -> pd.DataFrame:
    import re

    per_doc = {}
    for _, r in docs.iterrows():
        words = re.findall(r"\w+", (r["text"] or "").lower())
        if not words:
            continue
        if len(words) < k:
            grams = {" ".join(words)}
        else:
            grams = {" ".join(words[i:i + k])
                     for i in range(len(words) - k + 1)}
        per_doc[r["doc_id"]] = grams
    counts: dict = {}
    for grams in per_doc.values():
        for g in grams:
            counts[g] = counts.get(g, 0) + 1
    rows = [{"doc_id": d, "n_spans": len(g),
             "n_repeated_spans": sum(counts[x] >= min_docs for x in g)}
            for d, g in per_doc.items()]
    return pd.DataFrame(rows).sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": "int64", "n_spans": "int64",
                 "n_repeated_spans": "int64"})


@pytest.fixture(scope="module")
def docs():
    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa"]
    rows = []
    for i in range(60):
        body = " ".join(rng.choice(vocab, size=rng.integers(3, 25)))
        # a third of the docs carry the shared boilerplate span
        text = body + " " + BOILER if i % 3 == 0 else body
        rows.append({"doc_id": i, "text": text})
    rows.append({"doc_id": 200, "text": ""})
    rows.append({"doc_id": 201, "text": "two words"})
    rows.append({"doc_id": 202, "text": "two words"})
    return pd.DataFrame(rows)


def test_matches_brute_force(docs):
    got = repeated_span_stats(ray.data.from_pandas(docs), span_k=4,
                              min_docs=2, num_buckets=7).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = _brute(docs, 4, 2)
    pd.testing.assert_frame_equal(got, want)
    # the boilerplate span really registers as repeated
    boiler_ids = set(range(0, 60, 3))
    rep = got[got["n_repeated_spans"] > 0]["doc_id"].tolist()
    assert boiler_ids <= set(rep)
    # short-doc exact pair: single all-words gram shared by 201/202
    assert got.set_index("doc_id").loc[201, "n_repeated_spans"] == 1


def test_min_docs_threshold(docs):
    got3 = repeated_span_stats(ray.data.from_pandas(docs), span_k=4,
                               min_docs=3).to_pandas()
    want3 = _brute(docs, 4, 3)
    pd.testing.assert_frame_equal(
        got3.sort_values("doc_id").reset_index(drop=True), want3)
    # 201/202 pair falls below min_docs=3
    assert got3.set_index("doc_id").loc[201, "n_repeated_spans"] == 0


def test_matches_sql_oracle(docs):
    from cdx_toolkit_ray.queries import ORACLES

    got = repeated_span_stats(ray.data.from_pandas(docs), span_k=5,
                              min_docs=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(ORACLES["repeated_spans"] + " ORDER BY doc_id") \
        .df().astype({"doc_id": "int64"}).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def _brute_cut(docs: pd.DataFrame, k: int, min_docs: int) -> pd.DataFrame:
    import re

    toks = {r["doc_id"]: re.findall(r"\w+", (r["text"] or "").lower())
            for _, r in docs.iterrows()}

    def grams(w):
        if not w:
            return []
        if len(w) < k:
            return [(0, " ".join(w))]
        return [(p, " ".join(w[p:p + k])) for p in range(len(w) - k + 1)]

    counts: dict = {}
    for w in toks.values():
        for g in {g for _, g in grams(w)}:
            counts[g] = counts.get(g, 0) + 1
    rows = []
    for d, w in toks.items():
        cov = np.zeros(len(w), bool)
        for p, g in grams(w):
            if counts.get(g, 0) >= min_docs:
                cov[p:min(p + k, len(w))] = True
        kept = [x for x, c in zip(w, cov) if not c]
        rows.append({"doc_id": d, "n_words": len(w), "n_kept": len(kept),
                     "clean_text": " ".join(kept)})
    return pd.DataFrame(rows).sort_values("doc_id") \
        .reset_index(drop=True).astype({"doc_id": "int64",
                                        "n_words": "int64",
                                        "n_kept": "int64"})


def test_cut_matches_brute_force(docs):
    from cdx_toolkit_ray.stages.spans import cut_repeated_spans

    got = cut_repeated_spans(ray.data.from_pandas(docs), span_k=4,
                             min_docs=2, num_buckets=7).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = _brute_cut(docs, 4, 2)
    pd.testing.assert_frame_equal(got, want)
    idx = got.set_index("doc_id")
    # boilerplate docs lose words; the empty doc survives as (0, 0, "")
    assert (idx.loc[list(range(0, 60, 3)), "n_kept"]
            < idx.loc[list(range(0, 60, 3)), "n_words"]).all()
    assert tuple(idx.loc[200, ["n_words", "n_kept", "clean_text"]]) \
        == (0, 0, "")
    # the short identical pair is covered entirely by its single gram
    assert tuple(idx.loc[201, ["n_words", "n_kept", "clean_text"]]) \
        == (2, 0, "")
    # and some unique doc keeps every word
    assert (idx["n_kept"] == idx["n_words"]).any()


def test_cut_matches_sql_oracle(docs):
    from cdx_toolkit_ray.queries import ORACLES
    from cdx_toolkit_ray.stages.spans import cut_repeated_spans

    got = cut_repeated_spans(ray.data.from_pandas(docs), span_k=5,
                             min_docs=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(ORACLES["cut_spans"] + " ORDER BY doc_id") \
        .df().astype({"doc_id": "int64"}).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
