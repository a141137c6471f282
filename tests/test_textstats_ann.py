"""Text-analysis stages + similarity search + multimodal plumbing."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from cdx_toolkit_ray.stages import ann, multimodal, textstats

pytestmark = pytest.mark.usefixtures("ray_session")


def test_token_count():
    t = pa.table({"text": ["a b  c", "", None, "don't stop-me now!"]})
    out = textstats.token_count_batch(t)
    assert out["n_tokens_ws"].to_pylist() == [3, 0, 0, 3]
    # regex: don ' t stop - me now ! = 8
    assert out["n_tokens_re"].to_pylist() == [3, 0, 0, 8]


def test_quality():
    t = pa.table({"text": ["the cat sat", ""]})
    out = textstats.quality_batch(t)
    r = out.to_pylist()[0]
    assert r["n_chars_actual"] == 11
    assert r["n_tokens_ws"] == 3
    assert r["mean_token_len"] == 3.0
    assert r["stopword_ratio"] == pytest.approx(1 / 3)
    r2 = out.to_pylist()[1]
    assert r2["n_tokens_ws"] == 0 and r2["stopword_ratio"] == 0.0


def test_lang_id():
    t = pa.table({"text": [
        "the cat and the dog in the house",
        "der Hund und die Katze ist nicht da",
        "el perro y la casa de los gatos",
        "le chat et les chiens des villes",
        "zzz qqq xxx",
    ]})
    out = textstats.lang_id_batch(t)
    assert out["lang_pred"].to_pylist() == ["en", "de", "es", "fr", "und"]


def test_fingerprint_deterministic():
    t = pa.table({"text": ["one two three four five six", ""]})
    fp = textstats.make_fingerprint_stage()
    a = fp(t)["fingerprint"].to_pylist()
    b = fp(t)["fingerprint"].to_pylist()
    assert a == b
    assert a[0] != 0 and a[1] == 0
    # small edit far from the min-gram usually keeps the fingerprint
    t2 = pa.table({"text": ["one two three four five six seven"]})
    assert isinstance(fp(t2)["fingerprint"].to_pylist()[0], int)


def _vec_ds(n=200, dim=16, seed=5):
    rng = np.random.RandomState(seed)
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(n)]
    return ray.data.from_items(rows), vecs


def test_cosine_topk_matches_numpy():
    ds, vecs = _vec_ds()
    q = vecs[0]
    got = ann.cosine_topk(ds, q, k=5, round_to=None).take_all()
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    sims = unit @ qn
    want = np.lexsort((np.arange(len(vecs)), -sims))[:5]
    assert [r["vec_id"] for r in got] == list(want)
    assert got[0]["vec_id"] == 0  # the query itself


def test_lsh_topk_recall():
    ds, vecs = _vec_ds(400)
    q = vecs[42]
    exact = [r["vec_id"] for r in
             ann.cosine_topk(ds, q, k=5, round_to=None).take_all()]
    approx = [r["vec_id"] for r in
              ann.lsh_topk(ds, q, k=5, dim=16, n_planes=6,
                           probe_bits=2).take_all()]
    assert 42 in approx
    assert len(set(exact) & set(approx)) >= 2  # decent recall on top-5


def test_pairwise_topk():
    ds, vecs = _vec_ds(100)
    out = ann.pairwise_topk(ds, vecs[:3], k=4).take_all()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for qi, rows in by_q.items():
        assert len(rows) == 4
        assert rows[0][("vec_id")] == qi  # self is the best match


def test_media_decode_plumbing():
    t = multimodal.fake_media_table(48)
    ds = ray.data.from_arrow(t)
    out = ds.map_batches(multimodal.MediaDecoder,
                         fn_constructor_kwargs={"decoder": "fake"},
                         batch_format="pyarrow", batch_size=16,
                         concurrency=2)
    rows = out.take_all()
    assert len(rows) == 48
    for r in rows:
        assert 8 <= r["width"] < 64 and 8 <= r["height"] < 64
        assert len(r["features"]) == 16
        assert abs(sum(r["features"]) - 1.0) < 1e-5


def test_media_decoder_stub_raises():
    with pytest.raises(NotImplementedError):
        multimodal.MediaDecoder(decoder="pil")


def test_frame_sampler():
    t = multimodal.fake_media_table(12)
    ds = ray.data.from_arrow(t)
    out = ds.map_batches(multimodal.FrameSampler,
                         fn_constructor_kwargs={"stride": 2},
                         batch_format="pyarrow", batch_size=8,
                         concurrency=2).take_all()
    for r in out:
        assert r["n_frames_sampled"] >= 0
        assert len(r["sampled_frames"]) <= len(r["payload"])


def test_normalize_batch_ascii_and_fallback():
    import duckdb
    import pandas as pd

    from cdx_toolkit_ray.queries import ORACLES

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": ["Mixed   CASE\twith\n\nruns ", "  trim me  ", None,
                 "Café au\tLait Àbc",     # non-ascii fallback
                 "Über  straße"],
    })
    got = ray.data.from_pandas(docs).map_batches(
        textstats.normalize_batch, batch_format="pyarrow") \
        .to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)[["doc_id", "text_norm"]]
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(ORACLES["normalize_text"] + " ORDER BY doc_id") \
        .df().astype({"doc_id": "int64"}).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert got["text_norm"][0] == "mixed case with runs"
    assert got["text_norm"][3] == "café au lait àbc"


def test_quantize_batch_properties():
    rng = np.random.default_rng(5)
    rows = [rng.normal(size=rng.integers(1, 9)).astype(np.float32)
            for _ in range(50)]
    rows.append(np.zeros(4, np.float32))        # all-zero vector
    rows.append(np.array([], np.float32))       # empty vector
    tbl = pa.table({"vec_id": pa.array(range(len(rows)), pa.int64()),
                    "embedding": pa.array([r.tolist() for r in rows],
                                          pa.list_(pa.float32()))})
    out = ann.quantize_batch(tbl)
    q = out["qvec"].to_pylist()
    ma = out["max_abs"].to_pylist()
    for r, qv, m in zip(rows, q, ma):
        assert len(qv) == len(r)
        if len(r) == 0 or not r.any():
            assert m == 0.0 and all(v == 0 for v in qv)
            continue
        assert m == pytest.approx(np.abs(r).max(), rel=0, abs=0)
        deq = np.array(qv, np.float64) * m / 127.0
        # dequantization error bound: half a quantization step
        assert np.abs(deq - r.astype(np.float64)).max() <= m / 254 + 1e-12
        assert max(abs(v) for v in qv) == 127  # max element saturates


def test_quantize_batch_on_sliced_listarray():
    """A sliced batch's ListArray has a values buffer longer than
    sum(lengths); quantize_batch must rebase offsets instead of raising
    (ADVICE regression)."""
    rng = np.random.default_rng(9)
    rows = [rng.normal(size=4).astype(np.float32).tolist()
            for _ in range(20)]
    tbl = pa.table({"vec_id": pa.array(range(20), pa.int64()),
                    "embedding": pa.array(rows, pa.list_(pa.float32()))})
    sliced = tbl.slice(5, 10)
    out = ann.quantize_batch(sliced)
    whole = ann.quantize_batch(tbl)
    assert out["qvec"].to_pylist() == whole["qvec"].to_pylist()[5:15]
    assert out["max_abs"].to_pylist() == whole["max_abs"].to_pylist()[5:15]


def test_int8_topk_recall_and_determinism():
    """Quantized retrieval agrees closely with exact cosine on random
    unit-ish vectors and is partition-order independent."""
    from cdx_toolkit_ray.stages.ann import cosine_topk, int8_topk

    rng = np.random.default_rng(12)
    n, dim, k = 400, 32, 10
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(map(list, vecs.astype(float))),
                              pa.list_(pa.float32())),
    })
    q = vecs[0].astype(np.float64)
    ds = ray.data.from_arrow(tbl)
    exact = cosine_topk(ds, q, k=k).to_pandas()["vec_id"].tolist()
    quant = int8_topk(ds, q, k=k).to_pandas()["vec_id"].tolist()
    assert quant[0] == 0  # the query vector itself always wins
    assert len(set(exact) & set(quant)) >= 7, (exact, quant)

    quant2 = int8_topk(ds.repartition(9), q, k=k) \
        .to_pandas()["vec_id"].tolist()
    assert quant == quant2


def test_int8_topk_rejects_ragged():
    from cdx_toolkit_ray.stages.ann import int8_topk

    tbl = pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[1.0, 2.0], [1.0, 2.0, 3.0]],
                              pa.list_(pa.float32())),
    })
    with pytest.raises(Exception):
        int8_topk(ray.data.from_arrow(tbl), [1.0, 2.0], k=2) \
            .to_pandas()


def test_minmax_normalize_reference_and_degenerate_group():
    import pandas as pd

    from cdx_toolkit_ray.stages.textstats import minmax_normalize

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "doc_id": np.arange(300),
        "lang": rng.choice(["en", "de"], 300),
        "n_chars": rng.integers(10, 500, 300),
    })
    # degenerate group: every value identical -> v_norm 0
    df.loc[df.index[:5], "lang"] = "zz"
    df.loc[df.index[:5], "n_chars"] = 42
    got = minmax_normalize(ray.data.from_pandas(df).repartition(6),
                           "lang", "n_chars").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for lang, g in df.groupby("lang"):
        lo, hi = g.n_chars.min(), g.n_chars.max()
        sub = got[got.lang == lang]
        assert (sub.v_min == lo).all() and (sub.v_max == hi).all()
        if hi == lo:
            assert (sub.v_norm == 0).all()
        else:
            want = (sub.n_chars.to_numpy() - lo) * 1_000_000 // (hi - lo)
            assert (sub.v_norm.to_numpy() == want).all()
    zz = got[got.lang == "zz"]
    assert len(zz) == 5 and (zz.v_norm == 0).all()


def test_gopher_gate_rules_fire_individually():
    from cdx_toolkit_ray.stages.textstats import gopher_gate_batch

    long_ok = " ".join("the quick brown fox w%d jumps over" % i
                       for i in range(10))  # 70 words, stopwordy, varied
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            long_ok,                            # keeps
            "short doc",                        # n_words (+stopwords)
            " ".join(["the"] * 60),             # rep_word (+rep_2gram)
            " ".join("a%d" % i for i in range(60)),  # stopwords... wait
            "",                                 # n_words + stopwords
        ], pa.string()),
    })
    got = gopher_gate_batch(docs).to_pandas().set_index("doc_id")
    assert bool(got.loc[1, "keep"]) and got.loc[1, "reasons"] == ""
    assert not got.loc[2, "keep"]
    assert "n_words" in got.loc[2, "reasons"]
    assert not got.loc[3, "keep"]
    assert "rep_word" in got.loc[3, "reasons"]
    assert "rep_2gram" in got.loc[3, "reasons"]
    assert not got.loc[4, "keep"]
    assert "stopwords" in got.loc[4, "reasons"]
    assert not got.loc[5, "keep"]
    assert got.loc[5, "n_words"] == 0
    # reason order is the documented rule order
    assert got.loc[5, "reasons"].startswith("n_words")


def test_gopher_gate_matches_sql_reasons():
    import duckdb
    import pandas as pd

    from cdx_toolkit_ray.queries import ORACLES
    from cdx_toolkit_ray.stages.textstats import gopher_gate_batch

    rng = np.random.default_rng(8)
    vocab = ["the", "a", "fox", "jumps", "x1", "x2", "x3", "x4"]
    docs = pd.DataFrame({
        "doc_id": np.arange(200),
        "text": [" ".join(rng.choice(vocab, rng.integers(1, 80)))
                 for _ in range(200)],
    })
    got = gopher_gate_batch(pa.Table.from_pandas(docs)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(ORACLES["gopher_gate"] + " ORDER BY doc_id") \
        .df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_vocab_coverage_reference():
    import pandas as pd

    from cdx_toolkit_ray.stages.textstats import vocab_coverage

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["aa bb cc", "aa aa bb", "zz yy", ""],
    })
    # V=2 -> vocabulary {aa, bb} (aa:3, bb:2 beat cc:1/zz:1/yy:1)
    got = vocab_coverage(ray.data.from_pandas(docs), vocab_size=2,
                         num_buckets=3).to_pandas().set_index("doc_id")
    assert tuple(got.loc[1, ["n_tokens", "n_oov"]]) == (3, 1)   # cc
    assert tuple(got.loc[2, ["n_tokens", "n_oov"]]) == (3, 0)
    assert tuple(got.loc[3, ["n_tokens", "n_oov"]]) == (2, 2)
    assert tuple(got.loc[4, ["n_tokens", "n_oov", "oov_micro"]]) \
        == (0, 0, 0)
    assert got.loc[1, "oov_micro"] == 1_000_000 // 3
    # tie-break: with V=1 and equal counts, lexicographically smaller
    docs2 = pd.DataFrame({"doc_id": [1], "text": ["bb aa"]})
    got2 = vocab_coverage(ray.data.from_pandas(docs2), vocab_size=1) \
        .to_pandas()
    assert got2.iloc[0].n_oov == 1  # 'aa' kept, 'bb' OOV


def test_ivf_add_appends_without_rewriting(tmp_path):
    """ivf_add places increment rows in the frozen codebook's cells as
    NEW files (old files untouched) and probe-all search equals brute
    force over the union."""
    import glob as _glob
    import os

    import pandas as pd

    from cdx_toolkit_ray.stages.ann import (cosine_topk, ivf_add,
                                            ivf_build_index,
                                            ivf_search_index)

    rng = np.random.default_rng(4)
    vecs = rng.normal(size=(200, 16)).astype(np.float64)

    def mk(lo, hi):
        return ray.data.from_arrow(pa.table({
            "vec_id": pa.array(np.arange(lo, hi), pa.int64()),
            "embedding": pa.array([list(v) for v in vecs[lo:hi]],
                                  pa.list_(pa.float32())),
        }))

    idx = str(tmp_path / "ivf")
    ivf_build_index(mk(0, 120), idx, n_centroids=4)
    before = set(_glob.glob(os.path.join(idx, "ivf_cell=*", "*.parquet")))
    ivf_add(idx, mk(120, 200))
    after = set(_glob.glob(os.path.join(idx, "ivf_cell=*", "*.parquet")))
    assert before < after                       # strictly appended

    q = vecs[0]
    got = ivf_search_index(idx, q, k=10, nprobe=4).to_pandas()
    want = cosine_topk(mk(0, 200), q, k=10).to_pandas()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True))
    # the increment is actually searchable
    assert (got["vec_id"] >= 120).any() or (want["vec_id"] < 120).all()


def test_soft404_truth_table():
    import pyarrow as pa

    from cdx_toolkit_ray.stages.textstats import soft404_batch

    cases = [
        # (status, title, text, soft404, signal)
        ("200", "404 Not Found", "fine body", True, "title"),
        ("200", "Welcome", "PAGE NOT FOUND here", True, "body"),
        ("200", "Shop", "item does not exist", True, "body"),
        ("200", "Shop", "healthy content", False, None),
        ("404", "404 Not Found", "page not found", False, None),
        ("200", "Items", "we stock 404 items", False, None),
        # title wins the signal label when both hit
        ("200", "Page Not Found", "error 404 page", True, "title"),
        ("301", "not found", "not found", False, None),
    ]
    batch = pa.table({
        "url": pa.array([f"u{i}" for i in range(len(cases))]),
        "status": pa.array([c[0] for c in cases]),
        "title": pa.array([c[1] for c in cases]),
        "text": pa.array([c[2] for c in cases]),
    })
    out = soft404_batch(batch).to_pylist()
    for row, c in zip(out, cases):
        assert (row["soft404"], row["signal"]) == (c[3], c[4]), (row, c)


def test_soft404_nulls_and_empty():
    import pyarrow as pa

    from cdx_toolkit_ray.stages.textstats import soft404_batch

    batch = pa.table({
        "url": pa.array(["a", "b"]),
        "status": pa.array(["200", "200"]),
        "title": pa.array([None, "ok"], pa.string()),
        "text": pa.array(["page not found", None], pa.string()),
    })
    out = soft404_batch(batch).to_pylist()
    assert [r["soft404"] for r in out] == [True, False]
    empty = batch.slice(0, 0)
    assert soft404_batch(empty).num_rows == 0


def test_pq_partition_independent_and_adc_sane(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from cdx_toolkit_ray.stages.ann import (pq_codebook, pq_encode,
                                            pq_search_adc)

    rng = np.random.RandomState(3)
    n, dim = 200, 64
    mat = rng.randn(n, dim).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in mat],
                              pa.list_(pa.float32())),
    })
    ds1 = ray.data.from_arrow(tbl)
    ds4 = ray.data.from_arrow(tbl).repartition(4)
    cb = pq_codebook(ds1, k=8, seed=0)
    codes1 = sorted(map(tuple, pq_encode(ds1, cb).to_pandas().values
                        .tolist()))
    codes4 = sorted(map(tuple, pq_encode(ds4, cb).to_pandas().values
                        .tolist()))
    assert codes1 == codes4 and len(codes1) == n * 4

    # ADC of the query against ITSELF must be the best-or-near-best
    # score (its own codeword is the closest by construction)
    q = mat[7].astype(np.float64)
    top = pq_search_adc(ds4, cb, q, k=10).take_all()
    assert len(top) == 10
    ids = [r["vec_id"] for r in top]
    scores = [r["score"] for r in top]
    assert scores == sorted(scores)
    # vec 7's own quantized distance can't beat exact reconstruction
    # by much — it must appear in the candidate set for n=200, k=8
    assert 7 in ids


def test_ivfpq_pruning_and_probe_all_parity(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from cdx_toolkit_ray.stages.ann import (ivfpq_build, ivfpq_search,
                                            pq_codebook, pq_search_adc)

    rng = np.random.RandomState(11)
    n, dim = 240, 64
    mat = rng.randn(n, dim).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in mat],
                              pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(tbl).repartition(3)
    idx = str(tmp_path / "ivfpq")
    ivfpq_build(ds, idx, n_cells=4, m=4, k=8)

    q = mat[5].astype(np.float64)
    # probe-all == plain PQ ADC over the whole corpus, row for row
    cb = pq_codebook(ray.data.from_arrow(tbl), k=8, seed=0)
    want = [(r["vec_id"], r["score"]) for r in
            pq_search_adc(ray.data.from_arrow(tbl), cb, q,
                          k=10).take_all()]
    got = [(r["vec_id"], r["score"]) for r in
           ivfpq_search(idx, q, k=10, nprobe=4).take_all()]
    assert got == want

    # nprobe=1 reads only ONE cell directory (prune-at-read)
    import glob
    all_cells = {p.split("cell=")[1].split("/")[0]
                 for p in glob.glob(idx + "/cell=*/*.parquet")}
    assert len(all_cells) == 4
    top1 = ivfpq_search(idx, q, k=10, nprobe=1).take_all()
    assert 0 < len(top1) <= 10
    # its candidates all come from the probed cell: scores are a
    # superset-restriction of the probe-all ranking
    sub = {r["vec_id"] for r in top1}
    assert sub <= {r["vec_id"] for r in
                   ivfpq_search(idx, q, k=n, nprobe=4).take_all()}


def test_script_profile_truth_table():
    import pyarrow as pa

    from cdx_toolkit_ray.stages.textstats import script_profile_batch

    rows = [
        (1, "hello world"),                     # latin only
        (2, "Привет мир"),                      # cyrillic
        (3, "abc Привет мир да да"),            # cyrillic outnumbers
        (4, "αβ 漢字 αβ"),                       # greek ties then wins? 4 vs 2
        (5, "123 !!! ..."),                     # none
        (6, None),                              # null text -> none
        (7, "ab αβ"),                           # 2 vs 2 tie -> latin first
    ]
    batch = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    out = script_profile_batch(batch)
    got = dict(zip(out["doc_id"].to_pylist(),
                   out["dominant_script"].to_pylist()))
    assert got == {1: "latin", 2: "cyrillic", 3: "cyrillic",
                   4: "greek", 5: "none", 6: "none", 7: "latin"}
    byid = {d: (la, cy) for d, la, cy in zip(
        out["doc_id"].to_pylist(), out["n_latin"].to_pylist(),
        out["n_cyrillic"].to_pylist())}
    assert byid[3] == (3, 13) and byid[7] == (2, 0)


def test_char_entropy_exact_values():
    import math

    import pyarrow as pa

    from cdx_toolkit_ray.stages.textstats import char_entropy_batch

    rows = [(1, "aaaa"),       # zero entropy
            (2, "abab"),       # ln 2
            (3, "abcd"),       # ln 4
            (4, ""),           # empty -> 0
            (5, None)]         # null -> 0
    batch = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    out = char_entropy_batch(batch)
    got = {d: (n, e) for d, n, e in zip(out["doc_id"].to_pylist(),
                                        out["n_chars"].to_pylist(),
                                        out["entropy_1e6"].to_pylist())}

    def ref(text):
        if not text:
            return 0, 0
        from collections import Counter
        n = len(text)
        s = sum(math.floor(c * math.log(n / c) * 1e6 + 0.5)
                for c in Counter(text).values())
        return n, s // n
    assert got == {d: ref(t) for d, t in rows}
    assert got[1] == (4, 0)
    assert got[2][1] == int(math.floor(2 * math.log(2) * 1e6 + .5)
                            * 2 // 4)


def test_rake_keywords_hand_computed():
    import pyarrow as pa

    from cdx_toolkit_ray.stages.textstats import rake_keywords_batch

    # doc 1: "deep learning of deep networks" ->
    #   phrases: ["deep learning", "deep networks"]
    #   freq: deep=2, learning=1, networks=1
    #   deg:  deep=2+2=4, learning=2, networks=2
    #   wscore(1000): deep=2000, learning=2000, networks=2000
    #   both phrases score 4000; tie -> phrase ASC
    t = rake_keywords_batch(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["deep learning of deep networks"], pa.string()),
    }), top_k=1)
    assert t.to_pylist() == [
        {"doc_id": 1, "phrase": "deep learning", "score": 4000}]

    # all-stopword and empty docs emit nothing
    t2 = rake_keywords_batch(pa.table({
        "doc_id": pa.array([2, 3], pa.int64()),
        "text": pa.array(["the of and", ""], pa.string())}))
    assert t2.num_rows == 0

    # duplicate phrase dedups; singleton run scores len*1000
    t3 = rake_keywords_batch(pa.table({
        "doc_id": pa.array([4], pa.int64()),
        "text": pa.array(["alpha the alpha the beta"], pa.string())}))
    rows = {r["phrase"]: r["score"] for r in t3.to_pylist()}
    # alpha: freq=2, deg=1+1=2 -> wscore=1000, phrase "alpha" = 1000
    # beta: freq=1, deg=1 -> 1000
    assert rows == {"alpha": 1000, "beta": 1000}


def test_signed_projection_exact_and_ragged_guard():
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data

    from cdx_toolkit_ray.stages.ann import (quantize_batch,
                                            signed_projection_batch)

    rng = np.random.RandomState(3)
    vecs = rng.normal(size=(5, 8)).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(5, dtype=np.int64)),
        "embedding": pa.array(list(map(list, vecs)),
                              pa.list_(pa.float32()))})
    q = quantize_batch(t)
    out = signed_projection_batch(q, dim_out=4, seed=7)
    # brute-force truth
    qv = np.stack([np.asarray(x) for x in
                   q["qvec"].to_pylist()]).astype(np.int64)
    signs = (np.random.RandomState(7).randint(0, 2, size=(8, 4))
             .astype(np.int64) * 2 - 1)
    want = qv @ signs
    got = out.to_pandas().pivot(index="vec_id", columns="dim_idx",
                                values="pval").values
    assert (got == want).all()

    ragged = pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "qvec": pa.array([[1, 2], [1, 2, 3]], pa.list_(pa.int8()))})
    with pytest.raises(ValueError):
        signed_projection_batch(ragged)


def test_embedding_outliers_finds_planted_outlier():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from cdx_toolkit_ray.stages.ann import embedding_outliers

    rng = np.random.RandomState(5)
    vecs = rng.normal(0, 0.1, size=(50, 8)).astype(np.float32)
    vecs[17] = 5.0    # far from everything
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(50, dtype=np.int64)),
        "embedding": pa.array(list(map(list, vecs)),
                              pa.list_(pa.float32()))}))
    out = embedding_outliers(ds, k=3).to_pandas()
    assert int(out.iloc[0]["vec_id"]) == 17
    assert list(out["rank"]) == [1, 2, 3]
    assert out.d2.is_monotonic_decreasing


def test_vocab_drift_identical_and_disjoint():
    import math

    import pyarrow as pa
    import pytest
    import ray.data

    from cdx_toolkit_ray.stages.textstats import vocab_drift

    same = ray.data.from_arrow(pa.table({
        "text": pa.array(["alpha beta gamma"] * 4, pa.string())}))
    out = vocab_drift(same, same).to_pandas().iloc[0]
    assert int(out.js_micro) == 0          # identical dists
    assert int(out.n_words) == 3

    a = ray.data.from_arrow(pa.table({
        "text": pa.array(["aaa bbb"], pa.string())}))
    b = ray.data.from_arrow(pa.table({
        "text": pa.array(["ccc ddd"], pa.string())}))
    out = vocab_drift(a, b).to_pandas().iloc[0]
    # disjoint vocab: JS = ln 2 (each word costs exactly c*ln2)
    ln2 = math.floor(1e6 * math.log(2.0) + 0.5)
    assert int(out.js_micro) == ln2
    assert int(out.n_words) == 4

    empty = ray.data.from_arrow(pa.table({
        "text": pa.array([], pa.string())}))
    with pytest.raises(ValueError):
        vocab_drift(a, empty).materialize()
