"""Unigram-LM score, inverted index, mixture sampling, quantile gate."""

import glob
import os

import numpy as np
import pandas as pd
import pytest
import ray.data

from cdx_toolkit_ray.stages.invindex import (
    _term_buckets,
    build_inverted_index,
    search_index,
    search_terms,
)
from cdx_toolkit_ray.stages.lm import unigram_lm_score
from cdx_toolkit_ray.stages.sampling import mixture_sample
from cdx_toolkit_ray.stages.textstats import quantile_gate

pytestmark = pytest.mark.usefixtures("ray_session")

DOCS = [
    {"doc_id": 0, "text": "the cat sat on the mat"},
    {"doc_id": 1, "text": "the dog sat on the log"},
    {"doc_id": 2, "text": "quantum zebra flux"},
    {"doc_id": 3, "text": "the the the cat cat dog"},
    {"doc_id": 4, "text": ""},
]


def _driver_lm(docs):
    """Reference unigram NLL in micro-nats, straight numpy."""
    from collections import Counter

    tfs = {d["doc_id"]: Counter(d["text"].lower().split())
           for d in docs}
    cnt = Counter()
    for c in tfs.values():
        cnt.update(c)
    total = sum(cnt.values())
    out = {}
    for did, c in tfs.items():
        if not c:
            continue
        nll = sum(int(np.floor(tf * np.log(total / cnt[w]) * 1e6 + 0.5))
                  for w, tf in c.items())
        ntok = sum(c.values())
        out[did] = (ntok, nll, nll // ntok)
    return out

def test_unigram_lm_matches_driver():
    got = (unigram_lm_score(ray.data.from_items(DOCS))
           .to_pandas().set_index("doc_id").sort_index())
    want = _driver_lm(DOCS)
    assert set(got.index) == set(want)  # empty doc emits no tokens
    for did, (ntok, nll, per) in want.items():
        row = got.loc[did]
        assert (row.n_tok, row.nll_sum_1e6, row.nll_per_tok_1e6) \
            == (ntok, nll, per)


def test_unigram_lm_rare_tokens_score_higher():
    got = (unigram_lm_score(ray.data.from_items(DOCS))
           .to_pandas().set_index("doc_id"))
    # doc 2 is all-rare words; doc 3 is all-frequent words
    assert got.loc[2].nll_per_tok_1e6 > got.loc[3].nll_per_tok_1e6


def test_unigram_lm_bucketing_invariant():
    a = (unigram_lm_score(ray.data.from_items(DOCS), n_buckets=2)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (unigram_lm_score(ray.data.from_items(DOCS), n_buckets=64)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_inverted_index_and_or(tmp_path):
    ds = ray.data.from_items(DOCS)
    idx = build_inverted_index(ds, str(tmp_path / "idx"), n_buckets=8)
    got = (search_index(idx, ["the", "cat"], mode="and")
           .to_pandas().sort_values("doc_id"))
    assert list(got.doc_id) == [0, 3]
    # doc 3: the x3 + cat x2 -> tf_sum 5, both terms matched
    assert got.set_index("doc_id").loc[3].tolist() == [2, 5]
    got_or = (search_index(idx, ["cat", "zebra"], mode="or")
              .to_pandas().sort_values("doc_id"))
    assert list(got_or.doc_id) == [0, 2, 3]


def test_inverted_index_prunes_buckets(tmp_path):
    ds = ray.data.from_items(DOCS)
    idx = build_inverted_index(ds, str(tmp_path / "idx"), n_buckets=8)
    tb = _term_buckets(["cat"], 8)
    all_parts = {os.path.basename(p) for p in glob.glob(idx + "/wb=*")}
    assert len(all_parts) > 1  # corpus spans several buckets
    # the search only globs the term's bucket dir(s)
    assert set(tb.values()) <= {int(p.split("=")[1]) for p in all_parts}


def test_search_index_matches_in_stream(tmp_path):
    ds = ray.data.from_items(DOCS)
    idx = build_inverted_index(ds, str(tmp_path / "idx"), n_buckets=4)
    a = (search_index(idx, ["sat", "on"], mode="and")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (search_terms(ds, ["sat", "on"], mode="and")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_search_missing_term_empty(tmp_path):
    ds = ray.data.from_items(DOCS)
    idx = build_inverted_index(ds, str(tmp_path / "idx"), n_buckets=4)
    assert search_index(idx, ["notaword", "cat"]).count() == 0


def test_mixture_sample_deterministic_and_weighted():
    rows = [{"doc_id": i, "grp": "a" if i % 2 else "b"}
            for i in range(4000)]
    ds = ray.data.from_items(rows)
    out = mixture_sample(ds, "grp", {"a": 0.25, "b": 0.9},
                         seed=3).to_pandas()
    frac = out.groupby("grp").size() / 2000
    assert abs(frac["a"] - 0.25) < 0.05 and abs(frac["b"] - 0.9) < 0.05
    # same seed -> identical survivor set, regardless of arrival order
    out2 = mixture_sample(ray.data.from_items(rows[::-1]), "grp",
                          {"a": 0.25, "b": 0.9}, seed=3).to_pandas()
    assert set(out.doc_id) == set(out2.doc_id)
    # unknown group keeps `default`
    out3 = mixture_sample(ds, "grp", {"a": 0.25}, default=1.0,
                          seed=3).to_pandas()
    assert (out3.groupby("grp").size()["b"]) == 2000


def test_quantile_gate_drops_bottom_quartile():
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "doc_id": np.arange(1000),
        "lang": rng.choice(["en", "de"], 1000),
        "n_chars": rng.integers(0, 1000, 1000),
    })
    out = quantile_gate(ray.data.from_pandas(df), "lang", "n_chars",
                        q_pct=25).to_pandas()
    for lang, g in df.groupby("lang"):
        thr = np.sort(g.n_chars.to_numpy())[
            max(0, int(np.ceil(0.25 * len(g))) - 1)]
        surv = out[out.lang == lang]
        assert (surv.q_thresh == thr).all()
        assert len(surv) == (g.n_chars >= thr).sum()
        assert (surv.n_chars >= thr).all()


def test_merge_index_upsert_semantics(tmp_path):
    """Re-crawled docs replace their postings; new docs append; the
    merged layout equals a from-scratch rebuild of the logical corpus."""
    import pandas as pd

    from cdx_toolkit_ray.stages.invindex import (build_inverted_index,
                                                 merge_index,
                                                 search_index)

    base = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["apple banana", "banana cherry", "cherry apple apple"],
    })
    incr = pd.DataFrame({
        "doc_id": [2, 4],                      # 2 = re-crawl, 4 = new
        "text": ["durian only now", "apple durian"],
    })
    b = build_inverted_index(ray.data.from_pandas(base),
                             str(tmp_path / "base"), n_buckets=4)
    m = merge_index(b, ray.data.from_pandas(incr),
                    str(tmp_path / "merged"))

    got = search_index(m, ["apple"], mode="or").to_pandas() \
        .set_index("doc_id")
    # doc 2 no longer contains 'apple'-adjacent text; 1, 3, 4 do
    assert set(got.index) == {1, 3, 4}
    assert got.loc[3, "tf_sum"] == 2
    got2 = search_index(m, ["durian"], mode="or").to_pandas()
    assert set(got2["doc_id"]) == {2, 4}
    # old text of the re-crawled doc is gone entirely
    got3 = search_index(m, ["banana"], mode="or").to_pandas()
    assert set(got3["doc_id"]) == {1}

    # merged layout == rebuild over the logical corpus, term by term
    logical = pd.concat([base[base.doc_id != 2], incr])
    rb = build_inverted_index(ray.data.from_pandas(logical),
                              str(tmp_path / "rebuilt"), n_buckets=4)
    for term in ["apple", "banana", "cherry", "durian", "only"]:
        a = search_index(m, [term]).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        bb = search_index(rb, [term]).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, bb)


def test_merge_index_empty_increment(tmp_path):
    import pandas as pd

    from cdx_toolkit_ray.stages.invindex import (build_inverted_index,
                                                 merge_index,
                                                 search_index)

    base = pd.DataFrame({"doc_id": [1], "text": ["apple"]})
    b = build_inverted_index(ray.data.from_pandas(base),
                             str(tmp_path / "b"), n_buckets=2)
    empty = ray.data.from_pandas(
        pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                      "text": pd.Series([], dtype="object")}))
    m = merge_index(b, empty, str(tmp_path / "m"))
    got = search_index(m, ["apple"]).to_pandas()
    assert set(got["doc_id"]) == {1}


def test_bigram_lm_stupid_backoff_matches_serial():
    import math

    import pyarrow as pa
    import ray.data

    from cdx_toolkit_ray.stages.lm import bigram_lm_score

    train_texts = {10: "a b c a b", 12: "b c d d"}
    score_texts = {10: "a b c",        # all bigrams seen
                   11: "a b zz c",     # zz unseen word -> c1=0 branch
                   13: "c a",          # unseen bigram, both words known
                   14: "w"}            # single word: no bigrams, no row
    train = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(train_texts), pa.int64()),
        "text": pa.array(list(train_texts.values()), pa.string())}))
    score = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(score_texts), pa.int64()),
        "text": pa.array(list(score_texts.values()), pa.string())}))
    df = bigram_lm_score(score, train, n_buckets=4).to_pandas()
    got = {r.doc_id: (r.n_big, r.n_backoff, r.nll_sum_1e6,
                      r.nll_per_big_1e6) for r in df.itertuples()}

    # serial reference
    c1: dict = {}
    c2: dict = {}
    ctx: dict = {}
    T = 0
    for t in train_texts.values():
        ws = t.split()
        T += len(ws)
        for w in ws:
            c1[w] = c1.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
    want = {}
    for d, t in score_texts.items():
        ws = t.split()
        if len(ws) < 2:
            continue
        tfs: dict = {}
        for bg in zip(ws, ws[1:]):
            tfs[bg] = tfs.get(bg, 0) + 1
        nll = nbig = nbo = 0
        for (a, b), tf in tfs.items():
            if (a, b) in c2:
                term = math.floor(
                    tf * math.log(ctx[a] / c2[(a, b)]) * 1e6 + 0.5)
            else:
                term = math.floor(
                    tf * math.log(2.5 * T / (c1.get(b, 0) + 1)) * 1e6
                    + 0.5)
                nbo += tf
            nll += term
            nbig += tf
        want[d] = (nbig, nbo, nll, nll // nbig)
    assert got == want
    assert 14 not in got and got[11][1] > 0 and got[10][1] == 0


def test_proximity_search_truth_table():
    import pyarrow as pa

    from cdx_toolkit_ray.stages.invindex import proximity_search_batch

    rows = [
        (1, "a x x b"),               # gap 3
        (2, "a b"),                   # gap 1
        (3, "b x x x x x x a"),       # gap 7 (order-free)
        (4, "a only here"),           # missing b -> no row
        (5, "b alone"),               # missing a -> no row
        (6, "a x b x x x x x x a"),   # multiple: min gap 2
        (7, "x a a b b x"),           # adjacent duplicates: gap 1
    ]
    batch = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    out = proximity_search_batch(batch, ("a", "b"), 3)
    got = {d: (g, h) for d, g, h in zip(out["doc_id"].to_pylist(),
                                        out["min_gap"].to_pylist(),
                                        out["hit"].to_pylist())}
    assert got == {1: (3, True), 2: (1, True), 3: (7, False),
                   6: (2, True), 7: (1, True)}


def test_pmi_topk_matches_serial():
    import math
    from collections import Counter

    import pyarrow as pa
    import ray.data

    from cdx_toolkit_ray.stages.lm import pmi_topk

    texts = ["strong coffee " * 6 + "weak tea " * 6,
             "strong tea " * 3 + "coffee beans " * 5,
             "beans beans beans strong strong coffee"]
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts,
                                                        pa.string())}))
    df = pmi_topk(ds, k=5, min_count=2, n_buckets=4).to_pandas()

    c1: Counter = Counter()
    c2: Counter = Counter()
    T = 0
    for t in texts:
        ws = t.split()
        T += len(ws)
        c1.update(ws)
        c2.update(zip(ws, ws[1:]))
    scored = []
    for (a, b), c in c2.items():
        if c < 2:
            continue
        pmi = math.floor(
            math.log(c * float(T) / (c1[a] * c1[b])) * 1e6 + 0.5)
        scored.append((-pmi, a, b, c))
    scored.sort()
    want = [(a, b, c, -np_) for np_, a, b, c in scored[:5]]
    got = list(zip(df.w1, df.w2, df.c2, df.pmi_1e6))
    assert got == want


def test_bm25_hand_truth_and_or_mode():
    import math

    import pyarrow as pa
    import ray.data

    from cdx_toolkit_ray.stages.invindex import bm25_search

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["table hash merge table",
                          "hash only words here",
                          "table hash merge"], pa.string())}))
    df = (bm25_search(ds, ["table", "hash", "merge"], mode="and")
          .to_pandas().set_index("doc_id"))
    # N=3 docs, Ttok=11 tokens; df(table)=2, df(hash)=3, df(merge)=2
    idf2 = math.floor(1e6 * math.log(8 / 5) + 0.5)
    idf3 = math.floor(1e6 * math.log(8 / 7) + 0.5)

    def contrib(idf, tf, dl):
        return (idf * 44 * tf * 11) // (20 * tf * 11 + 6 * 11
                                        + 18 * dl * 3)

    assert set(df.index) == {1, 3}          # AND drops doc 2
    assert int(df.loc[3].score_1e6) == (contrib(idf2, 1, 3)
                                        + contrib(idf3, 1, 3)
                                        + contrib(idf2, 1, 3))
    assert int(df.loc[1].score_1e6) == (contrib(idf2, 2, 4)
                                        + contrib(idf3, 1, 4)
                                        + contrib(idf2, 1, 4))
    # longer doc with same tf scores lower (length normalization)
    assert int(df.loc[3].score_1e6) > contrib(idf2, 1, 4) \
        + contrib(idf3, 1, 4) + contrib(idf2, 1, 4)
    got_or = (bm25_search(ds, ["table", "hash", "merge"], mode="or")
              .to_pandas())
    assert set(got_or.doc_id) == {1, 2, 3}
    assert int(got_or.set_index("doc_id").loc[2].n_matched) == 1


def test_dirichlet_ql_truth_and_missing_term():
    import math

    import pyarrow as pa
    import pytest
    import ray.data

    from cdx_toolkit_ray.stages.invindex import dirichlet_ql

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["table hash table", "hash words"],
                         pa.string())}))
    # Ttok=5, cf(table)=2, cf(hash)=2; dl1=3, dl2=2; mu=10
    df = (dirichlet_ql(ds, ["table", "hash"], mu=10)
          .to_pandas().set_index("doc_id"))

    def term(tf, cf, dl):
        return math.floor(1e6 * math.log((tf * 5 + 10 * cf)
                                         / ((dl + 10) * 5)) + 0.5)

    assert int(df.loc[1].score_1e6) == term(2, 2, 3) + term(1, 2, 3)
    assert int(df.loc[2].score_1e6) == term(0, 2, 2) + term(1, 2, 2)
    assert int(df.loc[1].n_matched) == 2
    assert int(df.loc[2].n_matched) == 1
    # every doc is scored (smoothing), unlike bm25 AND
    assert set(df.index) == {1, 2}
    with pytest.raises(ValueError):
        dirichlet_ql(ds, ["table", "zzzmissing"]).materialize()


def _rank_corpus():
    import pyarrow as pa

    texts = [
        "table hash merge join scan table",
        "hash merge table",
        "merge sort spill table hash merge merge",
        "completely unrelated words here",
        "table table table hash hash merge filter",
    ]
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(3)


def test_bm25_index_backed_matches_in_stream(tmp_path):
    """Index-backed BM25 (pruned wb= + doclen db= reads, stats from
    meta.json) must equal the in-stream pass bit for bit."""
    from cdx_toolkit_ray.stages.invindex import (bm25_search,
                                                 build_inverted_index)

    ds = _rank_corpus()
    idx = build_inverted_index(ds, str(tmp_path / "idx"), n_buckets=8)
    terms = ["table", "hash", "merge"]
    for mode in ("and", "or"):
        ins = (bm25_search(ds, terms, mode=mode).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        idb = (bm25_search(None, terms, mode=mode, index_dir=idx)
               .to_pandas().sort_values("doc_id")
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(ins, idb)
    assert len(ins) == 4                    # doc 4 matches nothing


def test_dirichlet_ql_index_backed_matches_in_stream(tmp_path):
    from cdx_toolkit_ray.stages.invindex import (build_inverted_index,
                                                 dirichlet_ql)

    ds = _rank_corpus()
    idx = build_inverted_index(ds, str(tmp_path / "idx"), n_buckets=8)
    ins = (dirichlet_ql(ds, ["table", "merge"], mu=100).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    idb = (dirichlet_ql(None, ["table", "merge"], mu=100,
                        index_dir=idx).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(ins, idb)
    assert len(ins) == 5                    # QL scores every doc


def test_index_meta_carries_corpus_stats(tmp_path):
    """build/merge persist n_docs + t_tok so ranked search never
    re-aggregates the corpus; merge keeps them in sync (upsert)."""
    import json

    import pyarrow as pa

    from cdx_toolkit_ray.stages.invindex import (build_inverted_index,
                                                 merge_index)

    ds = _rank_corpus()
    idx = build_inverted_index(ds, str(tmp_path / "idx"), n_buckets=8)
    meta = json.load(open(os.path.join(idx, "meta.json")))
    assert meta["n_docs"] == 5
    assert meta["t_tok"] == 6 + 3 + 7 + 4 + 7
    assert glob.glob(os.path.join(idx, "doclen", "db=*", "*.parquet"))

    # upsert doc 5 (7 -> 2 tokens) and add doc 6 (3 tokens)
    inc = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([5, 6], pa.int64()),
        "text": pa.array(["tiny doc", "brand new doc"], pa.string())}))
    merged = merge_index(idx, inc, str(tmp_path / "idx2"))
    meta2 = json.load(open(os.path.join(merged, "meta.json")))
    assert meta2["n_docs"] == 6
    assert meta2["t_tok"] == 6 + 3 + 7 + 4 + 2 + 3


def test_ranking_in_stream_never_materializes_postings():
    """The 100-TB contract (VERDICT r3 finding #2): the in-stream
    ranking paths must not pin the token-scale POSTINGS stream in the
    object store. The index paths may materialize the pruned
    ``matched`` set (bounded by the query terms' buckets), so the
    guard checks that every materialize call in these functions is on
    ``_index_matched_rows`` output and that the stats helper has
    none. Grep-able guard."""
    import inspect
    import re

    from cdx_toolkit_ray.stages.invindex import (_corpus_term_stats,
                                                 bm25_search,
                                                 dirichlet_ql)

    assert ".materialize()" not in inspect.getsource(
        _corpus_term_stats)
    for fn in (bm25_search, dirichlet_ql):
        src = inspect.getsource(fn)
        n_mat = src.count(".materialize()")
        n_matched = len(re.findall(
            r"_index_matched_rows\([^)]*\)\.materialize\(\)",
            src.replace("\n", " ")))
        assert n_mat == n_matched, fn.__name__
        assert "posts.materialize" not in src, fn.__name__


def test_ranking_index_parity_with_zero_token_docs(tmp_path):
    """Review regression (r4): a doc whose text has no \\w+ tokens
    ('!!! ???') must not appear in index-backed QL output (the
    in-stream path and the SQL oracle derive dl rows from postings,
    which token-less docs never have), while meta n_docs still counts
    the whole corpus (the in-stream BM25 ds.count() semantics)."""
    import json

    import pyarrow as pa

    from cdx_toolkit_ray.stages.invindex import (bm25_search,
                                                 build_inverted_index,
                                                 dirichlet_ql)

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["table hash merge", "table alone",
                          "!!! ???", "hash table hash"],
                         pa.string())}))
    idx = build_inverted_index(ds, str(tmp_path / "idx"), n_buckets=4)
    meta = json.load(open(os.path.join(idx, "meta.json")))
    assert meta["n_docs"] == 4          # token-less doc still counted

    ins = (dirichlet_ql(ds, ["table"], mu=50).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    idb = (dirichlet_ql(None, ["table"], mu=50, index_dir=idx)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(ins, idb)
    assert set(idb["doc_id"]) == {1, 2, 4}   # doc 3 never scored

    bi = (bm25_search(ds, ["table"], mode="or").to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    bx = (bm25_search(None, ["table"], mode="or", index_dir=idx)
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(bi, bx)
