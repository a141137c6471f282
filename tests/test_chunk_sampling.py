"""Chunking, sampling/shuffle, and doc-frequency stages."""

import numpy as np
import pytest
import ray.data

from cdx_toolkit_ray.stages.chunk import chunk_documents
from cdx_toolkit_ray.stages.sampling import (
    sharded_shuffle,
    stratified_sample,
)
from cdx_toolkit_ray.stages.textstats import doc_frequency

pytestmark = pytest.mark.usefixtures("ray_session")


def _docs(rows):
    return ray.data.from_items(rows)


def test_chunk_windows():
    words = ["w%d" % i for i in range(100)]
    ds = _docs([{"doc_id": 1, "text": " ".join(words)},
                {"doc_id": 2, "text": "only three words"},
                {"doc_id": 3, "text": ""},
                {"doc_id": 4, "text": None}])
    out = chunk_documents(ds, chunk_size=64, stride=48).to_pandas()
    d1 = out[out.doc_id == 1].sort_values("chunk_id")
    assert list(d1.chunk_start) == [0, 48, 96]
    assert list(d1.n_tokens) == [64, 52, 4]
    assert d1.iloc[0].chunk_text == " ".join(words[:64])
    assert d1.iloc[2].chunk_text == " ".join(words[96:])
    d2 = out[out.doc_id == 2]
    assert len(d2) == 1 and d2.iloc[0].n_tokens == 3
    # empty / null docs emit no chunks (flat-map semantics)
    assert set(out.doc_id) == {1, 2}


def test_chunk_rejects_bad_params():
    ds = _docs([{"doc_id": 1, "text": "a b"}])
    with pytest.raises(ValueError):
        chunk_documents(ds, chunk_size=0)
    with pytest.raises(ValueError):
        chunk_documents(ds, stride=-1)


def test_stratified_sample_quota_and_determinism():
    rows = [{"doc_id": i, "lang": "abcd"[i % 4]} for i in range(200)]
    ds = _docs(rows)
    out = stratified_sample(ds, group_col="lang", k=5, seed=7) \
        .to_pandas().sort_values(["lang", "samp_rank"])
    assert (out.groupby("lang").size() == 5).all()
    assert all(list(g.samp_rank) == [1, 2, 3, 4, 5]
               for _, g in out.groupby("lang"))
    # reproducible across runs
    out2 = stratified_sample(_docs(rows), group_col="lang", k=5,
                             seed=7).to_pandas() \
        .sort_values(["lang", "samp_rank"])
    assert list(out.doc_id) == list(out2.doc_id)
    # different seed -> (almost surely) different draw
    out3 = stratified_sample(_docs(rows), group_col="lang", k=5,
                             seed=8).to_pandas() \
        .sort_values(["lang", "samp_rank"])
    assert list(out.doc_id) != list(out3.doc_id)


def test_stratified_sample_small_groups():
    ds = _docs([{"doc_id": 1, "lang": "xx"}, {"doc_id": 2, "lang": "xx"},
                {"doc_id": 3, "lang": "yy"}])
    out = stratified_sample(ds, group_col="lang", k=10).to_pandas()
    assert len(out[out.lang == "xx"]) == 2
    assert len(out[out.lang == "yy"]) == 1


def test_sharded_shuffle_partitions_and_order():
    rows = [{"doc_id": i} for i in range(300)]
    out = sharded_shuffle(_docs(rows), n_shards=8, seed=3).to_pandas()
    assert len(out) == 300 and set(out.doc_id) == set(range(300))
    assert out.shard.between(0, 7).all()
    assert (out.shard == (out.skey % 8).astype(np.int64)).all()
    for _, g in out.groupby("shard"):
        g = g.sort_values("shard_pos")
        assert list(g.shard_pos) == list(range(len(g)))
        # in-shard order is by (skey, doc_id)
        assert list(g.skey) == sorted(g.skey)
    out2 = sharded_shuffle(_docs(rows), n_shards=8, seed=3).to_pandas()
    key = ["shard", "shard_pos"]
    assert list(out.sort_values(key).doc_id) == \
        list(out2.sort_values(key).doc_id)


def test_doc_frequency_counts():
    ds = _docs([
        {"doc_id": 1, "text": "the cat sat the mat"},
        {"doc_id": 2, "text": "The dog sat"},
        {"doc_id": 3, "text": "a cat"},
    ])
    out = doc_frequency(ds, min_df=2).to_pandas() \
        .set_index("word")["df"].to_dict()
    # 'the' appears twice in doc 1 but counts once per doc
    assert out == {"the": 2, "cat": 2, "sat": 2}


def test_holdout_split_group_atomic_and_deterministic():
    """Every group lands wholly on one side; assignment is seed-stable
    and arrival-order independent."""
    from cdx_toolkit_ray.stages.sampling import holdout_split

    rows = [{"doc_id": i, "host": "h%d" % (i % 40)} for i in range(400)]
    out = holdout_split(ray.data.from_items(rows), "host",
                        val_frac=0.3, seed=1).to_pandas()
    sides = out.groupby("host")["split"].nunique()
    assert (sides == 1).all()                 # no group straddles
    assert set(out["split"]) == {"train", "val"}
    frac = (out.drop_duplicates("host")["split"] == "val").mean()
    assert 0.1 < frac < 0.5                   # ~0.3 of GROUPS

    rev = holdout_split(ray.data.from_items(rows[::-1]), "host",
                        val_frac=0.3, seed=1).to_pandas()
    a = out.sort_values("doc_id")["split"].tolist()
    b = rev.sort_values("doc_id")["split"].tolist()
    assert a == b                             # order-free

    other = holdout_split(ray.data.from_items(rows), "host",
                          val_frac=0.3, seed=2).to_pandas()
    assert other.sort_values("doc_id")["split"].tolist() != a


def test_holdout_split_edges():
    from cdx_toolkit_ray.stages.sampling import holdout_split

    rows = [{"doc_id": i, "host": "h%d" % i} for i in range(20)]
    all_train = holdout_split(ray.data.from_items(rows), "host",
                              val_frac=0.0).to_pandas()
    assert (all_train["split"] == "train").all()
    all_val = holdout_split(ray.data.from_items(rows), "host",
                            val_frac=1.0).to_pandas()
    assert (all_val["split"] == "val").all()
    import pytest as _pytest
    with _pytest.raises(ValueError):
        holdout_split(ray.data.from_items(rows), "host", val_frac=1.5)


def test_training_prep_composite_consistency():
    """Every packed row's doc passed the gate and won its dedup group;
    per-shard offsets are a contiguous token layout."""
    import pandas as pd

    from cdx_toolkit_ray.queries import q_training_prep
    from cdx_toolkit_ray.stages.textstats import gopher_gate_batch

    sf = "/root/testdata/sf0.001"
    out = q_training_prep(sf).to_pandas()
    docs = pd.read_parquet(sf + "/documents.parquet",
                           columns=["doc_id", "text"])
    import pyarrow as _pa
    verdict = gopher_gate_batch(_pa.Table.from_pandas(docs)) \
        .to_pandas().set_index("doc_id")
    kept = set(verdict[verdict.keep].index)
    assert set(out.doc_id) <= kept
    # dedup: each packed doc is the min id of its text group
    first = docs.sort_values("doc_id").groupby("text").first()
    winners = set(first.doc_id)
    assert set(out.doc_id) <= winners
    # packing invariant: per shard, offsets start at 0 and are
    # strictly increasing with no gaps (sum of chunk sizes)
    for shard, g in out.groupby("shard"):
        offs = g.sort_values("tok_off")["tok_off"].to_numpy()
        assert offs[0] == 0
        assert (np.diff(offs) > 0).all()
    assert (out.seq_off == out.tok_off % 256).all()
    assert (out.seq_id == out.tok_off // 256).all()


def test_token_budget_mixture_matches_serial(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from cdx_toolkit_ray.stages.sampling import (_seeded_key,
                                                 token_budget_mixture)

    rng = np.random.default_rng(2)
    n = 200
    ids = np.arange(n, dtype=np.int64)
    srcs = np.array(["s%d" % (i % 4) for i in range(n)], object)
    toks = rng.integers(1, 50, n).astype(np.int64)
    budgets = {"s0": 100, "s1": 0, "s2": 57, "s3": 10_000}
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids), "source": pa.array(srcs, pa.string()),
        "n_tok": pa.array(toks)}))
    got = token_budget_mixture(ds, budgets=budgets, seed=3,
                               num_buckets=4).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)

    skey = _seeded_key(pa.array(ids), 3)
    want = []
    for s in sorted(budgets):
        m = np.flatnonzero(srcs == s)
        order = m[np.lexsort((ids[m], skey[m]))]
        cum = 0
        for j in order:
            if cum < budgets[s]:
                want.append((int(ids[j]), s, int(toks[j]), cum))
            cum += int(toks[j])
    want.sort()
    assert len(got) == len(want)
    for (i, s, t, c), row in zip(want, got.itertuples()):
        assert (row.doc_id, row.source, row.n_tok, row.cum_before) \
            == (i, s, t, c)
    # s1 excluded entirely; s3's budget exceeds supply -> all kept
    assert not (got.source == "s1").any()
    assert (got.source == "s3").sum() == (srcs == "s3").sum()
    # concat-and-cut: per source, kept tokens reach or cross budget
    for s in ("s0", "s2"):
        sel = got[got.source == s]
        assert sel.n_tok.sum() >= budgets[s]
        assert sel.cum_before.max() < budgets[s]


def test_mixture_and_holdout_null_groups_deterministic(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from cdx_toolkit_ray.stages.sampling import (holdout_split,
                                                 mixture_sample)

    t = pa.table({
        "doc_id": pa.array(list(range(6)), pa.int64()),
        "grp": pa.array(["a", None, "a", None, "b", None], pa.string()),
    })
    ds = ray.data.from_arrow(t)
    # default=0 -> every null-group row must drop (never borrow "a"/"b")
    kept = mixture_sample(ds, "grp", {"a": 1.0, "b": 1.0},
                          default=0.0, seed=1).to_pandas()
    assert set(kept.doc_id) == {0, 2, 4}
    # holdout: null group gets ONE deterministic side for all its rows
    tagged = holdout_split(ds, "grp", val_frac=0.5, seed=3).to_pandas()
    null_sides = set(tagged[tagged.grp.isna()]["split"])
    assert len(null_sides) == 1
    # and the same side regardless of batch layout (reversed input)
    rev = ray.data.from_arrow(t.take(list(range(5, -1, -1))))
    tagged2 = holdout_split(rev, "grp", val_frac=0.5, seed=3) \
        .to_pandas()
    assert set(tagged2[tagged2.grp.isna()]["split"]) == null_sides


def test_temperature_mixture_sqrt_shares():
    import math

    import pyarrow as pa
    import ray.data

    from cdx_toolkit_ray.stages.sampling import temperature_mixture

    # 100 'big' docs vs 4 'small': sqrt shares 10 vs 2 -> of a
    # 12-doc budget big gets 10, small gets 2 (not 11.5/0.5)
    ids = list(range(104))
    grp = ["big"] * 100 + ["small"] * 4
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "lang": pa.array(grp, pa.string())}))
    out = temperature_mixture(ds, "lang", budget=12).to_pandas()
    got = out.groupby("lang").size().to_dict()
    assert got == {"big": 10, "small": 2}
    assert set(out[out.lang == "small"].quota) == {2}
    # proportional sampling would have given small 12*4/104 = 0 docs
    assert math.isqrt(100) == 10 and math.isqrt(4) == 2
    # deterministic winners: re-run equals
    again = temperature_mixture(ds, "lang", budget=12).to_pandas()
    assert sorted(out.doc_id) == sorted(again.doc_id)
