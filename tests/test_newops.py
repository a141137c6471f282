"""Tests for distinct / union / top-k-per-group / n-gram Jaccard /
IVF ANN / actor-pool URL-seen query catalog entries (SURVEY.md §2.5,
§2.6, and the training-data operator set)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"


def test_distinct_matches_pandas():
    from cdx_toolkit_ray.queries import q_distinct

    got = q_distinct(SF).to_pandas()
    import pyarrow.parquet as pq

    df = pq.read_table(SF + "/documents.parquet",
                       columns=["lang", "source"]).to_pandas()
    want = df.drop_duplicates()
    assert (set(map(tuple, got.to_numpy()))
            == set(map(tuple, want.to_numpy())))


def test_union_streams_counts():
    from cdx_toolkit_ray.queries import q_union_streams

    got = q_union_streams(SF).to_pandas()
    import pyarrow.parquet as pq

    df = pq.read_table(SF + "/events.parquet",
                       columns=["event_type"]).to_pandas()
    want = int((df.event_type == "click").sum()
               + (df.event_type == "view").sum())
    assert len(got) == want
    assert set(got.event_type) <= {"click", "view"}


def test_topk_per_group_rank():
    from cdx_toolkit_ray.queries import q_topk_per_group

    got = q_topk_per_group(SF).to_pandas()
    import pyarrow.parquet as pq

    df = pq.read_table(SF + "/documents.parquet",
                       columns=["doc_id", "source", "n_chars"]).to_pandas()
    df = df.sort_values(["source", "n_chars", "doc_id"],
                        ascending=[True, False, True])
    want = df.groupby("source", sort=False).head(3)
    assert len(got) == len(want)
    g = got.sort_values(["source", "grp_rank"])
    assert list(g.doc_id) == list(want.doc_id)
    assert set(got.groupby("source").grp_rank.max()) <= {1, 2, 3}


def test_ngram_jaccard_pairs_exact():
    import re

    from cdx_toolkit_ray.queries import q_ngram_jaccard

    got = q_ngram_jaccard(SF).to_pandas().set_index("id_a")
    import pyarrow.parquet as pq

    df = pq.read_table(SF + "/documents.parquet",
                       columns=["doc_id", "text"]).to_pandas()
    texts = dict(zip(df.doc_id, df.text))

    def sh(t):
        w = re.findall(r"\w+", t.lower())
        return {" ".join(w[i:i + 2]) for i in range(len(w) - 1)}

    n_pairs = 0
    for a in sorted(texts):
        if a % 2 or a + 1 not in texts:
            continue
        n_pairs += 1
        sa, sb = sh(texts[a]), sh(texts[a + 1])
        row = got.loc[a]
        assert int(row.n_inter) == len(sa & sb)
        assert int(row.n_union) == len(sa | sb)
    assert len(got) == n_pairs > 0


def test_ivf_topk_recall():
    """nprobe=all cells is exact; nprobe=half keeps recall >= 0.5 on
    the synthetic embeddings (sanity for the pruning path)."""
    import pyarrow.parquet as pq

    from cdx_toolkit_ray.stages.ann import cosine_topk, ivf_topk

    emb = pq.read_table(SF + "/embeddings.parquet")
    qvec = emb["embedding"][0].as_py()
    ds = ray.data.read_parquet(SF + "/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    exact = set(cosine_topk(ds, qvec, k=10).to_pandas().vec_id)
    full = set(ivf_topk(ds, qvec, k=10, n_centroids=8,
                        nprobe=8).to_pandas().vec_id)
    assert full == exact
    probed = set(ivf_topk(ds, qvec, k=10, n_centroids=8,
                          nprobe=4).to_pandas().vec_id)
    assert len(probed & exact) >= 5


def test_url_seen_equals_distinct():
    from cdx_toolkit_ray.canon import canonicalize_batch
    from cdx_toolkit_ray.queries import derived_seeds, q_url_seen

    got = sorted(q_url_seen(SF).to_pandas().urlkey)
    want = sorted(set(
        derived_seeds(SF).map_batches(canonicalize_batch,
                                      batch_format="pyarrow")
        .to_pandas().urlkey))
    assert got == want


def test_media_queries_run():
    from cdx_toolkit_ray.queries import q_frame_sample, q_media_decode

    md = q_media_decode(SF).to_pandas()
    assert len(md) == 256
    assert {"media_id", "media_type", "width", "height"} <= set(md.columns)
    fs = q_frame_sample(SF).to_pandas()
    assert (fs.n_frames_sampled >= 0).all()
    assert len(fs) == sum(1 for i in range(256) if i % 3 == 2)


def test_ivf_index_build_search(tmp_path):
    """Partitioned-index IVF: nprobe=all over the on-disk layout equals
    brute force; partial probes read only their cell directories."""
    import os

    import pyarrow.parquet as pq

    from cdx_toolkit_ray.stages.ann import (cosine_topk, ivf_build_index,
                                            ivf_search_index)

    emb = pq.read_table(SF + "/embeddings.parquet")
    qvec = emb["embedding"][0].as_py()
    ds = ray.data.read_parquet(SF + "/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    idx = str(tmp_path / "ivf")
    ivf_build_index(ds, idx, n_centroids=8)
    assert os.path.exists(idx + "/centroids.npy")
    cells = [d for d in os.listdir(idx) if d.startswith("ivf_cell=")]
    assert len(cells) >= 2

    exact = set(cosine_topk(ds, qvec, k=10).to_pandas().vec_id)
    full = set(ivf_search_index(idx, qvec, k=10,
                                nprobe=8).to_pandas().vec_id)
    assert full == exact
    probed = ivf_search_index(idx, qvec, k=10, nprobe=3).to_pandas()
    assert len(probed) == 10


def test_window_agg_matches_pandas():
    import pandas as pd
    import pyarrow.parquet as pq

    from cdx_toolkit_ray.queries import q_window_agg

    got = q_window_agg(SF).to_pandas()
    df = pq.read_table(SF + "/events.parquet",
                       columns=["event_type", "ts", "value"]).to_pandas()
    df["win"] = df.ts.dt.floor("h").dt.strftime("%Y%m%d%H")
    df["cents"] = (df.value * 100).round().astype("int64")
    want = df.groupby(["event_type", "win"], as_index=False).agg(
        sum_cents=("cents", "sum"), n_events=("cents", "count"))
    m = got.merge(want, on=["event_type", "win"], suffixes=("", "_w"))
    assert len(m) == len(want) == len(got)
    assert (m.sum_cents == m.sum_cents_w).all()
    assert (m.n_events == m.n_events_w).all()


def test_asof_join_matches_pandas():
    import pandas as pd
    import pyarrow.parquet as pq

    from cdx_toolkit_ray.queries import q_asof_join

    got = q_asof_join(SF).to_pandas().sort_values("event_id")
    ev = pq.read_table(SF + "/events.parquet",
                       columns=["event_id", "user_id", "ts"]).to_pandas()
    od = pq.read_table(SF + "/orders.parquet",
                       columns=["o_custkey", "o_orderkey",
                                "o_orderdate"]).to_pandas()
    od["r_ts"] = pd.to_datetime(od.o_orderdate)
    od = (od.groupby(["o_custkey", "r_ts"], as_index=False)
          .o_orderkey.max().sort_values("r_ts"))
    ev["l_ts"] = ev.ts.dt.floor("s")
    want = pd.merge_asof(ev.sort_values("l_ts"), od,
                         left_on="l_ts", right_on="r_ts",
                         left_by="user_id", right_by="o_custkey",
                         direction="backward")
    want = want.dropna(subset=["o_orderkey"]).sort_values("event_id")
    assert list(got.event_id) == list(want.event_id)
    assert list(got.o_orderkey) == [int(x) for x in want.o_orderkey]


def test_range_join_matches_pandas():
    import pandas as pd
    import pyarrow.parquet as pq

    from cdx_toolkit_ray.queries import q_range_join

    got = (q_range_join(SF).to_pandas()
           .sort_values(["event_id", "o_orderkey"]).reset_index(drop=True))
    ev = pq.read_table(SF + "/events.parquet",
                       columns=["event_id", "user_id", "ts"]).to_pandas()
    od = pq.read_table(SF + "/orders.parquet",
                       columns=["o_custkey", "o_orderkey",
                                "o_orderdate"]).to_pandas()
    ev["l_ts"] = (ev.ts.dt.floor("s").values.astype("datetime64[s]")
                  .astype("int64"))
    od["lo"] = (pd.to_datetime(od.o_orderdate).values
                .astype("datetime64[s]").astype("int64") + 9000 * 86400)
    od["hi"] = od.lo + 400 * 86400 - 1
    m = ev.merge(od, left_on="user_id", right_on="o_custkey")
    m = m[(m.l_ts >= m.lo) & (m.l_ts <= m.hi)]
    want = (m[["event_id", "user_id", "o_orderkey"]]
            .sort_values(["event_id", "o_orderkey"]).reset_index(drop=True))
    assert len(got) == len(want) > 0
    assert (got.event_id == want.event_id).all()
    assert (got.o_orderkey == want.o_orderkey).all()


def test_range_join_deep_overlap_chain():
    """Adversarial all-overlapping intervals: chain depth ~200 per key.

    The pre-round-2 sweep capped candidate back-scan at 65 and silently
    dropped deeper (row, interval) pairs; the binary-search expansion
    must emit every pair."""
    import numpy as np
    import pandas as pd

    from cdx_toolkit_ray.stages.asof import range_join

    rng = np.random.default_rng(7)
    n = 400
    right = pd.DataFrame({
        "k": rng.integers(0, 2, n).astype("int64"),
        "lo": rng.integers(0, 100, n).astype("int64"),
        "rid": np.arange(n, dtype="int64"),
    })
    right["hi"] = right.lo + rng.integers(400, 1000, n)
    left = pd.DataFrame({
        "k": rng.integers(0, 2, 50).astype("int64"),
        "ts": rng.integers(0, 1200, 50).astype("int64"),
        "lid": np.arange(50, dtype="int64"),
    })
    got = range_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        left_key="k", right_key="k", left_ts="ts",
        right_lo="lo", right_hi="hi", right_cols=["rid"], num_buckets=4,
    ).to_pandas().sort_values(["lid", "rid"]).reset_index(drop=True)
    m = left.merge(right, on="k")
    m = m[(m.ts >= m.lo) & (m.ts <= m.hi)]
    want = m.sort_values(["lid", "rid"]).reset_index(drop=True)
    deepest = want.groupby("lid").size().max()
    assert deepest > 65  # the case the old cap dropped
    assert len(got) == len(want)
    assert (got.rid == want.rid).all()
    assert (got.lid == want.lid).all()


def test_range_join_packed_range_guard():
    import pandas as pd

    from cdx_toolkit_ray.stages.asof import range_join

    left = pd.DataFrame({"k": [1], "ts": [1 << 39], "lid": [0]})
    right = pd.DataFrame({"k": [1], "lo": [0], "hi": [10], "rid": [0]})
    with pytest.raises(Exception, match="packed range"):
        range_join(ray.data.from_pandas(left),
                   ray.data.from_pandas(right),
                   left_key="k", right_key="k", left_ts="ts",
                   right_lo="lo", right_hi="hi",
                   right_cols=["rid"], num_buckets=2).to_pandas()


def test_asof_join_left_ts_guard():
    import pandas as pd

    from cdx_toolkit_ray.stages.asof import asof_join_backward

    left = pd.DataFrame({"k": [1], "ts": [-5], "lid": [0]})
    right = pd.DataFrame({"k": [1], "ts": [0], "rid": [0]})
    with pytest.raises(Exception, match="packed range"):
        asof_join_backward(ray.data.from_pandas(left),
                           ray.data.from_pandas(right),
                           left_key="k", right_key="k",
                           left_ts="ts", right_ts="ts",
                           right_cols=["rid"], num_buckets=2).to_pandas()


def test_top_revenue_matches_duckdb(tmp_path):
    """TPC-H Q3-shaped multi-join catalog query vs its oracle on a
    tiny synthetic warehouse (exercises the empty-segment guard too)."""
    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq_

    from cdx_toolkit_ray import queries as Q

    rng = np.random.default_rng(13)
    cust = pd.DataFrame({
        "c_custkey": np.arange(30, dtype=np.int64),
        "c_mktsegment": [["BUILDING", "AUTOMOBILE", "MACHINERY"][i % 3]
                         for i in range(30)]})
    orders = pd.DataFrame({
        "o_orderkey": np.arange(200, dtype=np.int64),
        "o_custkey": rng.integers(0, 30, 200),
        "o_orderdate": pd.to_datetime("1995-01-01")
        + pd.to_timedelta(rng.integers(0, 1500, 200), unit="D")})
    line = pd.DataFrame({
        "l_orderkey": rng.integers(0, 200, 800),
        "l_extendedprice": rng.uniform(10, 5000, 800).round(2),
        "l_discount": rng.choice([0.0, 0.05, 0.1], 800),
        "l_shipdate": pd.to_datetime("1995-01-01")
        + pd.to_timedelta(rng.integers(0, 1500, 800), unit="D")})
    for name, df in (("customer", cust), ("orders", orders),
                     ("lineitem", line)):
        pq_.write_table(pa.Table.from_pandas(df, preserve_index=False),
                        str(tmp_path / f"{name}.parquet"))
    got = Q.QUERIES["top_revenue"](str(tmp_path)).to_pandas() \
        .reset_index(drop=True)
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/{t}.parquet')")
    want = con.execute(Q.ORACLES["top_revenue"]).df() \
        .astype({"o_orderkey": "int64"}).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_detect_charset_truth_table():
    import pyarrow as pa

    from cdx_toolkit_ray.stages.text import detect_charset_batch

    cases = [
        (b"\xef\xbb\xbf<meta charset='iso-8859-1'>", "utf-8", True),
        (b"\xff\xfe\x00g", "utf-16le", True),
        (b"\xfe\xff\x00g", "utf-16be", True),
        (b"<meta charset='UTF8'>", "utf-8", False),     # alias + case
        (b"<meta charset='ISO-8859-1'>", "iso-8859-1", False),
        (b"<meta charset='Shift_JIS'>", "shift_jis", False),  # passthrough
        (b"<html>plain</html>", "utf-8", False),
        (b"", "utf-8", False),
        (b"\xef\xbb", "utf-8", False),  # short prefix, no BOM
    ]
    batch = pa.table({
        "doc_id": pa.array(range(len(cases)), pa.int64()),
        "html": pa.array([c[0] for c in cases], pa.binary()),
    })
    out = detect_charset_batch(batch).to_pylist()
    for row, (_, cs, bom) in zip(out, cases):
        assert (row["charset"], row["bom"]) == (cs, bom), row


def test_detect_charset_sliced_and_empty():
    import pyarrow as pa

    from cdx_toolkit_ray.stages.text import detect_charset_batch

    batch = pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "html": pa.array([b"\xef\xbb\xbfx", b"<meta charset='utf8'>",
                          b"y", b"\xff\xfez"], pa.binary()),
    })
    sliced = batch.slice(1, 2)  # nonzero offset exercises the rebase
    out = detect_charset_batch(sliced).to_pylist()
    assert [r["charset"] for r in out] == ["utf-8", "utf-8"]
    assert [r["bom"] for r in out] == [False, False]

    empty = batch.slice(0, 0)
    assert detect_charset_batch(empty).num_rows == 0


def test_split_hash_tolerates_schemaless_empty_blocks():
    """A map_batches stage that filters a block to zero rows can emit
    a SCHEMA-LESS empty block; the exchange splitter must pass rows
    through rather than abort (regression: host-contracted link
    streams where some blocks filter away entirely)."""
    import pyarrow as pa
    import ray

    from cdx_toolkit_ray.stages.exchange import _split_hash

    live = pa.table({"bucket": pa.array([0, 1, 0], pa.int64()),
                     "v": pa.array(["a", "b", "c"], pa.string())})
    bare = pa.table({})          # schema-less empty
    out = ray.get(_split_hash.options(num_returns=2)
                  .remote("bucket", 2, live, bare))
    assert sum(t.num_rows for t in out) == 3
    assert out[1]["v"].to_pylist() == ["b"]
    # all-empty input yields empties, not a crash
    out = ray.get(_split_hash.options(num_returns=2)
                  .remote("bucket", 2, bare))
    assert all(t.num_rows == 0 for t in out)
