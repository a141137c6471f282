"""Benchmark decontamination (cdx_toolkit_ray/stages/decontam.py)."""

import numpy as np
import pytest
import ray.data

from cdx_toolkit_ray.stages.decontam import (
    build_ngram_index,
    decontaminate,
)

pytestmark = pytest.mark.usefixtures("ray_session")

EVAL_Q = ("what is the capital of france and when was the eiffel "
          "tower built in paris")


@pytest.fixture(scope="module")
def corpora():
    test = ray.data.from_items([
        {"doc_id": 1000, "text": EVAL_Q},
        {"doc_id": 1001, "text": "solve for x in the quadratic equation "
                                 "x squared plus three x plus two"},
    ])
    train = ray.data.from_items([
        # verbatim leak of a full eval question
        {"doc_id": 0, "text": "intro words " + EVAL_Q + " outro words"},
        # partial overlap: one shared 5-gram window
        {"doc_id": 1, "text": "the capital of france and belgium are "
                              "both lovely in spring season always"},
        # clean
        {"doc_id": 2, "text": "completely unrelated text about maritime "
                              "navigation and celestial observation at sea"},
        # short doc (< k words -> single all-words gram, no index hit)
        {"doc_id": 3, "text": "tiny doc"},
        # empty doc
        {"doc_id": 4, "text": ""},
    ])
    return train, test


def test_index_is_sorted_distinct(corpora):
    _, test = corpora
    idx = build_ngram_index(test, shingle_k=5)
    assert idx.dtype == np.uint64
    assert (np.diff(idx.astype(np.uint64)) > 0).all()


def test_decontaminate_flags(corpora):
    train, test = corpora
    out = decontaminate(train, test, shingle_k=5).to_pandas() \
        .set_index("doc_id").sort_index()
    # verbatim leak: many hits, flagged
    assert out.loc[0, "n_hits"] >= 5 and out.loc[0, "contaminated"] == 1
    # single-window overlap: exactly one shared 5-gram
    assert out.loc[1, "n_hits"] == 1 and out.loc[1, "contaminated"] == 1
    # clean docs
    assert out.loc[2, "n_hits"] == 0 and out.loc[2, "contaminated"] == 0
    assert out.loc[3, "n_hits"] == 0
    # empty doc has no grams at all
    assert out.loc[4, "n_grams"] == 0 and out.loc[4, "contaminated"] == 0
    # n_grams counts distinct windows
    assert out.loc[2, "n_grams"] == 11 - 5 + 1


def test_min_hits_threshold(corpora):
    train, test = corpora
    out = decontaminate(train, test, shingle_k=5, min_hits=2) \
        .to_pandas().set_index("doc_id")
    assert out.loc[0, "contaminated"] == 1   # many hits
    assert out.loc[1, "contaminated"] == 0   # one hit < 2


def test_empty_test_set(corpora):
    train, _ = corpora
    empty = ray.data.from_items([{"doc_id": 1, "text": ""}])
    out = decontaminate(train, empty, shingle_k=5).to_pandas()
    assert (out["n_hits"] == 0).all()
    assert (out["contaminated"] == 0).all()
