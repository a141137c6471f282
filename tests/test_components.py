"""Connected components + cluster-level fuzzy dedup
(cdx_toolkit_ray/stages/components.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from cdx_toolkit_ray.stages.components import (
    connected_components,
    fuzzy_dedup,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def _pairs(edges):
    a, b = zip(*edges) if edges else ((), ())
    return ray.data.from_arrow(pa.table({
        "id_a": pa.array(list(a), pa.int64()),
        "id_b": pa.array(list(b), pa.int64())}))


def _cc_dict(pairs, **kw):
    df = connected_components(pairs, **kw).to_pandas()
    return dict(zip(df["node"], df["component"]))


def _union_find_oracle(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # second pass: min id per root
    comp = {}
    for n in list(parent):
        comp.setdefault(find(n), []).append(n)
    out = {}
    for root, members in comp.items():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def test_empty_pairs():
    out = connected_components(_pairs([]))
    assert out.count() == 0
    assert out.schema().names == ["node", "component"]


def test_chain_triangle_and_selfloop():
    # 100-node path (worst-case diameter), a triangle, a self pair,
    # duplicate + reversed edges
    edges = [(i, i + 1) for i in range(99)]
    edges += [(200, 201), (201, 202), (202, 200)]
    edges += [(300, 300)]          # self pair -> singleton
    edges += [(1, 0), (0, 1)]      # duplicates / reversed
    got = _cc_dict(_pairs(edges))
    want = _union_find_oracle(edges)
    assert got == want
    assert all(v == 0 for k, v in got.items() if k < 100)
    assert got[202] == 200 and got[300] == 300


def test_random_graph_matches_union_find():
    rng = np.random.RandomState(7)
    # sparse random graph over sparse 64-bit-ish ids (incl. negatives:
    # the contract is min int64 id, whatever its sign)
    ids = rng.choice(np.arange(-500, 500) * 12345679, size=400,
                     replace=False)
    edges = [(int(ids[rng.randint(400)]), int(ids[rng.randint(400)]))
             for _ in range(300)]
    got = _cc_dict(_pairs(edges))
    assert got == _union_find_oracle(edges)


def test_max_rounds_guard():
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(_pairs([(i, i + 1) for i in range(40)]),
                             max_rounds=1)


@pytest.fixture(scope="module")
def dup_corpus():
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    rows = []
    # chain of near-dups 0~1~2 (each adjacent pair shares most words):
    # pair-wise id_b drops would delete 1 AND 2; cluster dedup keeps
    # only the representative 0
    rows.append({"doc_id": 0, "text": base})
    rows.append({"doc_id": 1, "text": base.replace("alpha", "alpha2")})
    rows.append({"doc_id": 2, "text": base.replace("alpha", "alpha2")
                 .replace("beta", "beta2")})
    # exact dup pair (textually disjoint from the chain)
    other = " ".join("q%d r%d" % (j, j * 3) for j in range(15))
    rows.append({"doc_id": 10, "text": other})
    rows.append({"doc_id": 11, "text": other})
    # uniques
    for i in range(20, 30):
        rows.append({"doc_id": i,
                     "text": " ".join("w%d_%d" % (i, j) for j in range(25))})
    return ray.data.from_items(rows)


def test_fuzzy_dedup_cluster_semantics(dup_corpus):
    out = fuzzy_dedup(dup_corpus, threshold=0.5, shingle_k=3).to_pandas()
    n = dup_corpus.count()
    # partition invariant: every doc counted exactly once
    assert out["cluster_size"].sum() == n
    # representatives are the component minima
    assert (out["doc_id"] == out["component"]).all()
    by_id = out.set_index("doc_id")["cluster_size"].to_dict()
    # the 0~1~2 chain collapsed to one cluster of 3
    assert by_id[0] == 3 and 1 not in by_id and 2 not in by_id
    # exact pair collapsed
    assert by_id[10] == 2 and 11 not in by_id
    # uniques survive as singletons
    for i in range(20, 30):
        assert by_id[i] == 1


def test_fuzzy_dedup_best_score_policy(dup_corpus):
    """score_col= swaps the representative to the highest-score member
    (ties -> min id); components and sizes are unchanged."""
    def add_score(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        # doc 2 outscores the rest of its chain; tie inside pair 10/11
        score = np.where(ids == 2, 100, 7).astype(np.int64)
        return t.append_column("score", pa.array(score))

    scored = dup_corpus.map_batches(add_score, batch_format="pyarrow",
                                    batch_size=None)
    out = fuzzy_dedup(scored, threshold=0.5, shingle_k=3,
                      score_col="score").to_pandas()
    assert out["cluster_size"].sum() == dup_corpus.count()
    by_comp = out.set_index("component")
    # chain 0~1~2: winner is the high scorer, not the min id
    assert by_comp.loc[0, "doc_id"] == 2
    assert by_comp.loc[0, "cluster_size"] == 3
    assert by_comp.loc[0, "score"] == 100
    # tie in the exact pair -> min id wins
    assert by_comp.loc[10, "doc_id"] == 10
    # singleton components keep themselves
    for i in range(20, 30):
        assert by_comp.loc[i, "doc_id"] == i
