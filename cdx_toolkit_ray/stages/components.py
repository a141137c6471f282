"""Distributed connected components + cluster-level fuzzy dedup.

The missing endgame of MinHash dedup at 100-TB scale: the verified
near-dup PAIRS (stages/dedup.minhash_dedup_pairs) form a graph whose
connected components are the duplicate clusters; a real pretraining
pipeline keeps exactly ONE representative per cluster (pair-wise
``id_b`` drops over-delete chains: A~B, B~C drops B and C even though
C may only be near B). This module computes the components with a
hash-to-min label-propagation loop where EVERY round is a distributed
Ray Data exchange — the driver holds only per-round scalar counters,
never a node, edge, or label table.

Algorithm (hash-to-min with pointer jumping, cf. the MapReduce CC
literature — Rastogi et al., "Finding Connected Components in
Map-Reduce in Logarithmic Rounds", ICDE 2013):

  labels <- {node: node}
  repeat:
    1. propagate: edges ⋈ labels(src) -> (dst, label_src)   [hash join]
    2. min-combine: union with self rows, groupby(node) min  [one shuffle]
    3. pointer jump: label' <- labels(label)                 [hash join]
  until no label changed

With identity init, labels only ever decrease and converge to the
component minimum; pointer jumping makes the round count O(log
diameter) instead of O(diameter). Per round the state is O(V) for the
pair-graph's node set — a small minority of the corpus (only docs in
at least one verified pair) — and each step is a balanced hash
exchange, so the loop scales exactly like the engine's joins.

Convergence bookkeeping: a round is a fixpoint iff label'(v) == old
label(v) for every v. Because edges are stored bidirectionally, that
implies label(u) == label(v) across every edge AND every label is a
root (label(label) == label) — i.e. labels are constant per component
and equal to the component min.

The per-round ``materialize()`` on the O(V) label table is the
checkpoint that keeps iteration N+1 from re-executing rounds 1..N
(Ray Datasets are lazy); it is deliberate, bounded state — NOT a
whole-corpus materialization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _node_bucket(keys: np.ndarray, n: int) -> np.ndarray:
    """Balanced bucket codes from int64 node ids (murmur-style mix —
    raw ids may be dense sequences whose low bits correlate)."""
    x = keys.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    return (x % np.uint64(n)).astype(np.int64)


def _heal(ds: ray.data.Dataset, n: int) -> ray.data.Dataset:
    """Repartition to heal the schema-less empty blocks sparse groupby
    stages emit (they poison downstream hash-join partitions) and to
    re-balance after a filter."""
    return ds.repartition(max(1, n))


def connected_components(pairs: ray.data.Dataset, *, col_a: str = "id_a",
                         col_b: str = "id_b",
                         num_partitions: int | None = None,
                         max_rounds: int = 64) -> ray.data.Dataset:
    """(node:int64, component:int64) per distinct node of ``pairs``,
    where ``component`` is the minimum node id reachable from ``node``.

    ``pairs`` is an undirected edge list ((a, b) implies (b, a); self
    pairs and duplicates are fine). Raises RuntimeError if the loop
    exceeds ``max_rounds`` (= graph diameter > ~2^64 under pointer
    jumping — unreachable in practice; the guard turns a scheduling
    bug into a loud failure instead of an infinite loop).
    """
    from .dedup import default_join_partitions

    if num_partitions is None:
        num_partitions = default_join_partitions()

    def both_dirs_plus_self(batch: pa.Table) -> pa.Table:
        a = batch[col_a].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[col_b].to_numpy(zero_copy_only=False).astype(np.int64)
        # per-block self loops (deduped below): a self edge delivers the
        # node's OWN label into the min-combine, so no separate union
        # with the label table is needed per round
        uniq = np.unique(np.concatenate([a, b]))
        return pa.table({
            "src": np.concatenate([a, b, uniq]),
            "dst": np.concatenate([b, a, uniq]),
            "is_self": np.concatenate(
                [np.zeros(2 * len(a), np.int8), np.ones(len(uniq), np.int8)]),
        })

    from .exchange import hash_bucket_apply

    def add_pair_bucket(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        d = batch["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = s * np.uint64(0x9E3779B97F4A7C15) ^ d
        h ^= h >> np.uint64(33)
        return batch.append_column(
            "_eb", pa.array((h % np.uint64(num_partitions))
                            .astype(np.int64)))

    def distinct_edges(tbl: pa.Table) -> pa.Table:
        # distinct (src, dst) with Max(is_self): one lexsort +
        # run-length pass, no per-group Python
        s = tbl["src"].to_numpy(zero_copy_only=False)
        d = tbl["dst"].to_numpy(zero_copy_only=False)
        f = tbl["is_self"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, s))
        ss, ds_, fs = s[order], d[order], f[order]
        new_run = np.ones(len(ss), bool)
        new_run[1:] = (ss[1:] != ss[:-1]) | (ds_[1:] != ds_[:-1])
        starts = np.flatnonzero(new_run)
        is_self = np.maximum.reduceat(fs, starts) if len(starts) \
            else fs[:0]
        return pa.table({"src": pa.array(ss[starts]),
                         "dst": pa.array(ds_[starts]),
                         "is_self": pa.array(is_self)})

    edges = pairs.map_batches(both_dirs_plus_self, batch_format="pyarrow",
                              batch_size=None) \
        .map_batches(add_pair_bucket, batch_format="pyarrow",
                     batch_size=None)
    # distinct-ify (self loops may repeat across blocks) via the
    # task-graph exchange (groupby.aggregate pays a per-group
    # aggregator tail; the edge stream is the narrow side of the op)
    edges = hash_bucket_apply(
        edges, "_eb", distinct_edges,
        num_buckets=num_partitions).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "component": pa.array([], pa.int64())}))
    # the loop pays a fixed scheduling cost per exchange that scales
    # with the partition count; size the per-round exchanges to the
    # edge volume (full width only once ~128k rows/partition is real
    # work) — num_partitions stays the ceiling for the 100-TB case
    n_parts = max(1, min(num_partitions, (n_edges + (1 << 17) - 1) >> 17))

    # labels <- identity over the node set (= the self-loop rows)
    labels = edges.filter(expr="is_self == 1").map_batches(
        lambda t: pa.table({"node": t["src"], "component": t["src"]}),
        batch_format="pyarrow", batch_size=None)
    labels = _heal(labels, n_parts).materialize()

    for _round in range(max_rounds):
        # shortcut edges component(v) -> v make the round deliver
        # label(label(v)) to v — pointer jumping folded into the same
        # join, keeping every round at exactly two exchanges
        shortcuts = labels.map_batches(
            lambda t: pa.table({"src": t["component"], "dst": t["node"],
                                "is_self": pa.array(
                                    np.zeros(len(t), np.int8))}),
            batch_format="pyarrow", batch_size=None)
        delivered = edges.union(shortcuts).join(
            labels, "inner", n_parts,
            on=("src",), right_on=("node",))

        _sent = np.int64(np.iinfo(np.int64).max)

        def tag(batch: pa.Table) -> pa.Table:
            comp = batch["component"]
            self_mask = pc.equal(batch["is_self"], 1)
            node = batch["dst"].to_numpy(zero_copy_only=False)
            return pa.table({
                "node": batch["dst"],
                "cand": comp,
                # only the self row carries the previous label
                # (sentinel elsewhere; min-reduce recovers it)
                "old": pc.if_else(self_mask, comp,
                                  pa.scalar(_sent, pa.int64())),
                "_nb": pa.array(
                    _node_bucket(node, n_parts)),
            })

        def min_combine(tbl: pa.Table) -> pa.Table:
            # per-node Min(cand) + the self row's old label + change
            # flag, one argsort + reduceat pass (groupby.aggregate's
            # per-group tail measured ~10x slower on many small groups)
            node = tbl["node"].to_numpy(zero_copy_only=False)
            cand = tbl["cand"].to_numpy(zero_copy_only=False)
            old = tbl["old"].to_numpy(zero_copy_only=False)
            order = np.argsort(node, kind="stable")
            ns = node[order]
            new_run = np.ones(len(ns), bool)
            new_run[1:] = ns[1:] != ns[:-1]
            starts = np.flatnonzero(new_run)
            comp = np.minimum.reduceat(cand[order], starts) if len(starts) \
                else cand[:0]
            oldv = np.minimum.reduceat(old[order], starts) if len(starts) \
                else old[:0]
            return pa.table({
                "node": pa.array(ns[starts] if len(starts) else ns),
                "component": pa.array(comp),
                "_changed": pa.array((comp != oldv).astype(np.int64)),
            })

        combined = hash_bucket_apply(
            delivered.map_batches(tag, batch_format="pyarrow",
                                  batch_size=None),
            "_nb", min_combine, num_buckets=n_parts).materialize()
        changed = combined.sum("_changed")
        labels = combined.drop_columns(["_changed"])
        if not changed:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds")


def fuzzy_dedup(ds: ray.data.Dataset, *, text_col: str = "text",
                id_col: str = "doc_id", threshold: float = 0.5,
                score_col: str | None = None,
                num_partitions: int | None = None,
                **minhash_kwargs) -> ray.data.Dataset:
    """Cluster-level near-dup removal: corpus -> survivors
    (id, component, cluster_size), exactly ONE representative (min id
    by default; highest-``score_col`` member with ``score_col=``)
    per connected component of the verified near-dup pair graph.

    Docs in no pair survive as their own singleton cluster
    (component = own id, cluster_size = 1). ``cluster_size`` counts
    ALL member docs of the component, so
    ``sum(cluster_size) == count(corpus)`` — the invariant the oracle
    checks.

    Every stage is distributed: the pair graph, the component labels,
    and the membership join all stay Datasets; the driver sees only
    the CC round counters.
    """
    from .dedup import default_join_partitions, minhash_dedup_pairs

    if num_partitions is None:
        num_partitions = default_join_partitions()

    pairs = minhash_dedup_pairs(ds, text_col=text_col, id_col=id_col,
                                threshold=threshold,
                                num_partitions=num_partitions,
                                **minhash_kwargs)
    return survivors_from_pairs(ds, pairs, id_col=id_col,
                                score_col=score_col,
                                num_partitions=num_partitions)


def survivors_from_pairs(ds: ray.data.Dataset, pairs: ray.data.Dataset,
                         *, id_col: str = "doc_id",
                         score_col: str | None = None,
                         num_partitions: int | None = None
                         ) -> ray.data.Dataset:
    """Corpus + near-dup pair graph (id_a, id_b) -> survivors
    (id, component, cluster_size): exactly ONE representative per
    connected component, singletons kept as their own cluster.
    The reusable back half of ``fuzzy_dedup`` — any candidate
    generator (MinHash, SimHash, semantic/embedding) plugs in here.

    Representative policy: min id (default — the component label
    itself, arrival-order independent) or, with ``score_col``, the
    member with the HIGHEST score (ties -> min id) — the policy real
    pipelines want ("keep the best document of each near-dup
    cluster"); the winning score is carried in the output then.
    Scores are integer-form (quantize floats first — the same
    convention as the pipeline's integer-form quality gates).

    One component-keyed exchange does winner + size in a single
    kernel; the driver sees only the CC round counters.
    """
    from .dedup import default_join_partitions

    if num_partitions is None:
        num_partitions = default_join_partitions()

    cc = connected_components(pairs, num_partitions=num_partitions)
    cc = cc.materialize()  # consumed after a driver count; O(pair nodes)

    cols = [id_col] + ([score_col] if score_col else [])
    corpus = ds.select_columns(cols)
    n_cc = cc.count()
    if n_cc == 0:
        def singletons(t: pa.Table) -> pa.Table:
            out = {id_col: t[id_col], "component": t[id_col],
                   "cluster_size": pa.array([1] * len(t), pa.int64())}
            if score_col:
                out[score_col] = t[score_col]
            return pa.table(out)

        return corpus.map_batches(singletons, batch_format="pyarrow",
                                  batch_size=None)

    # assignment for the whole corpus: left join against the pair-graph
    # labels, singletons keep their own id
    assigned = corpus.join(cc, "left_outer", num_partitions,
                           on=(id_col,), right_on=("node",))

    def fill_component(batch: pa.Table) -> pa.Table:
        comp = pc.coalesce(batch["component"], batch[id_col])
        out = {id_col: batch[id_col],
               "component": pc.cast(comp, pa.int64())}
        if score_col:
            out[score_col] = batch[score_col]
        t = pa.table(out)
        c = t["component"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_cb", pa.array(_node_bucket(c, num_partitions)))

    assigned = assigned.map_batches(fill_component,
                                    batch_format="pyarrow",
                                    batch_size=None)

    from .exchange import hash_bucket_apply

    def reduce_components(tbl: pa.Table) -> pa.Table:
        sch = {id_col: pa.int64(), "component": pa.int64(),
               "cluster_size": pa.int64()}
        if score_col:
            sch[score_col] = pa.int64()
        if tbl.num_rows == 0:
            return pa.schema(list(sch.items())).empty_table()
        comp = tbl["component"].to_numpy(zero_copy_only=False)
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        if score_col:
            sc = tbl[score_col].to_numpy(zero_copy_only=False)
            order = np.lexsort((ids, -sc, comp))
        else:
            order = np.lexsort((ids, comp))
        comp_s = comp[order]
        new_run = np.ones(len(comp_s), bool)
        new_run[1:] = comp_s[1:] != comp_s[:-1]
        starts = np.flatnonzero(new_run)
        sizes = np.diff(np.r_[starts, len(comp_s)])
        win = order[starts]  # first of each run = policy winner
        out = {id_col: pa.array(ids[win].astype(np.int64)),
               "component": pa.array(comp_s[starts].astype(np.int64)),
               "cluster_size": pa.array(sizes.astype(np.int64))}
        if score_col:
            out[score_col] = pa.array(sc[win].astype(np.int64))
        return pa.table(out)

    return hash_bucket_apply(assigned, "_cb", reduce_components,
                             num_buckets=num_partitions)
