"""Scale-shape guards for the round-5 physical-plan fixes (VERDICT r4
items 2 and 3): the graph- and corpus-sized state these operators once
collected on the driver must stay distributed, and the exact-dedup
exchange must move only the narrow (key_hash, id) stream — never the
text payload."""

import inspect

import numpy as np
import pyarrow as pa
import pytest
import ray.data

pytestmark = pytest.mark.usefixtures("ray_session")


def test_triangle_counts_source_has_no_driver_collect():
    from cdx_toolkit_ray.stages import links

    src = inspect.getsource(links.triangle_counts)
    assert "take_all" not in src, \
        "triangle_counts must not collect graph-sized state"
    assert "ray.put" not in src and "_ray.put" not in src, \
        "triangle_counts must not broadcast an O(nodes) structure"


def test_triangle_counts_multiblock_parity():
    """Same graph through 1 block and through many blocks/buckets —
    the distributed degree-attach must be partitioning-invariant."""
    import itertools

    from cdx_toolkit_ray.stages.links import triangle_counts

    rng = np.random.RandomState(7)
    nodes = ["u%d" % i for i in range(30)]
    edges = sorted({(nodes[a], nodes[b])
                    for a, b in rng.randint(0, 30, size=(160, 2))
                    if a != b})
    t = pa.table({"src_url": [e[0] for e in edges],
                  "dst_url": [e[1] for e in edges]})

    und = {tuple(sorted(e)) for e in edges}
    want: dict = {}
    for a, b, c in itertools.combinations(sorted(nodes), 3):
        if (a, b) in und and (a, c) in und and (b, c) in und:
            for x in (a, b, c):
                want[x] = want.get(x, 0) + 1

    for blocks, buckets in [(1, 2), (5, 3), (11, 8)]:
        got = {r["url"]: r["n_triangles"]
               for r in triangle_counts(
                   ray.data.from_arrow(t).repartition(blocks),
                   num_buckets=buckets).take_all()}
        assert got == want, (blocks, buckets)


def test_exact_dedup_exchange_stream_is_narrow():
    from cdx_toolkit_ray.stages.dedup import _exact_pairs_stream

    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(range(8)),
        "text": ["payload %d" % (i % 3) for i in range(8)],
        "extra": ["x" * 100] * 8,
    }))
    pairs = _exact_pairs_stream(ds, "text", "doc_id", 4)
    assert set(pairs.schema().names) == {"key_hash", "_id", "_kb"}, \
        "the exact-dedup exchange must move only (key_hash, id)"


def test_exact_dedup_multiblock_and_fallback_paths():
    from cdx_toolkit_ray.stages.dedup import exact_dedup

    t = pa.table({
        "doc_id": list(range(50)),
        "text": ["dup group %d" % (i % 9) for i in range(50)],
        "keep": ["col%d" % i for i in range(50)],
    })
    want = sorted(range(9))          # min id per group
    for blocks in (1, 7):
        ds = ray.data.from_arrow(t).repartition(blocks)
        # broadcast gate path
        out = exact_dedup(ds, "text", "doc_id")
        got = sorted(r["doc_id"] for r in out.take_all())
        assert got == want
        # distributed pair-join fallback path (winners > budget)
        out2 = exact_dedup(ds, "text", "doc_id",
                           winners_broadcast_max=0)
        got2 = sorted(r["doc_id"] for r in out2.take_all())
        assert got2 == want
    # passthrough columns survive and belong to the winner rows
    rows = {r["doc_id"]: r["keep"]
            for r in exact_dedup(ray.data.from_arrow(t), "text",
                                 "doc_id").take_all()}
    assert rows[3] == "col3"


def test_exact_dedup_duplicate_ids_fail_loudly():
    from cdx_toolkit_ray.stages.dedup import exact_dedup

    t = pa.table({"doc_id": [1, 1, 2], "text": ["a", "a", "b"]})
    with pytest.raises(Exception, match="unique"):
        exact_dedup(ray.data.from_arrow(t), "text",
                    "doc_id").materialize()


def test_exact_dedup_cross_key_id_collision_is_exact():
    """An id value repeating under a DIFFERENT key must not veto that
    key's winner (round-5 review finding: the loser-id gate silently
    dropped key b's only row here). The pair gate keeps it — on both
    the broadcast and the join path."""
    from cdx_toolkit_ray.stages.dedup import exact_dedup

    t = pa.table({"doc_id": [1, 2, 2],
                  "text": ["a", "a", "b"]})
    for budget in (4_000_000, 0):
        out = exact_dedup(ray.data.from_arrow(t), "text", "doc_id",
                          winners_broadcast_max=budget)
        got = sorted((r["text"], r["doc_id"]) for r in out.take_all())
        assert got == [("a", 1), ("b", 2)], (budget, got)
