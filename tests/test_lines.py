"""Duplicate-line removal (stages/lines.py): truth tables vs a serial
Python reference, empty-line rules, full-boilerplate docs."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data


def _run(docs, min_docs=2):
    from cdx_toolkit_ray.stages.lines import dedup_lines

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(docs))), pa.int64()),
        "text": pa.array(docs, pa.string()),
    }))
    out = dedup_lines(ds, min_docs=min_docs, num_buckets=4).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _serial(docs, min_docs=2):
    from collections import Counter

    per_doc = [d.split("\n") for d in docs]
    c = Counter()
    for lines in per_doc:
        c.update({l for l in lines if l != ""})
    dup = {l for l, n in c.items() if n >= min_docs}
    out = []
    for i, lines in enumerate(per_doc):
        kept = [l for l in lines if l == "" or l not in dup]
        out.append((i, len(lines), len(kept), "\n".join(kept)))
    return out


@pytest.mark.parametrize("min_docs", [2, 3])
def test_matches_serial_reference(ray_session, min_docs):
    rng = np.random.default_rng(5)
    vocab = ["cookie banner", "nav home about", "unique %d" % 0,
             "accept all", "privacy policy", ""]
    docs = []
    for i in range(40):
        n = rng.integers(1, 8)
        lines = [vocab[j] if j < 5 else "own line %d-%d" % (i, j)
                 for j in rng.integers(0, 9, n)]
        docs.append("\n".join(lines))
    got = _run(docs, min_docs)
    want = _serial(docs, min_docs)
    for (i, nl, nk, ct), row in zip(want, got.itertuples()):
        assert row.doc_id == i and row.n_lines == nl \
            and row.n_kept == nk and row.clean_text == ct


def test_within_doc_repeat_counts_once(ray_session):
    # "x" twice in ONE doc -> only 1 distinct doc -> not boilerplate
    got = _run(["x\nx\ny", "z"])
    assert got.loc[0, "clean_text"] == "x\nx\ny"
    # ...but shared across two docs -> removed everywhere
    got = _run(["x\nx\ny", "x"])
    assert got.loc[0, "clean_text"] == "y"
    assert got.loc[1, "clean_text"] == ""
    assert got.loc[1, "n_kept"] == 0


def test_empty_lines_never_removed(ray_session):
    got = _run(["a\n\nb", "c\n\nd"])
    # "" appears in both docs but is formatting, not boilerplate
    assert got.loc[0, "clean_text"] == "a\n\nb"


def test_all_boilerplate_doc_yields_empty(ray_session):
    got = _run(["spam", "spam", "keep\nspam"])
    assert (got.loc[0, "clean_text"], got.loc[0, "n_kept"]) == ("", 0)
    assert got.loc[2, "clean_text"] == "keep"
    assert got.loc[2, "n_lines"] == 2
