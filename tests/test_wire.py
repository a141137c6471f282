"""CDX wire decoders (S3/S4) vs the reference's OWN golden corpus."""

import json
import os

import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

REF_MOCK = ("/root/reference/tests/data/mock_responses/test_cli/"
            "test_basics.jsonl")


def test_pywb_jsonl_decode():
    from cdx_toolkit_ray.sources.wire import decode_cdx_response

    body = ('{"urlkey": "org,example)/", "timestamp": "20240101000000", '
            '"url": "https://example.org/", "status": "200"}\n'
            '{"urlkey": "org,example)/a", "timestamp": "20240102000000", '
            '"url": "https://example.org/a", "status": "301", '
            '"redirect": "https://example.org/"}')
    caps = decode_cdx_response(body)
    assert len(caps) == 2
    assert caps[0]["urlkey"] == "org,example)/"
    assert caps[1]["redirect"] == "https://example.org/"


def test_ia_list_of_lists_decode():
    from cdx_toolkit_ray.sources.wire import decode_cdx_response

    body = json.dumps([
        ["urlkey", "timestamp", "original", "mimetype", "statuscode",
         "digest", "length"],
        ["org,example)/", "20240101000000", "https://example.org/",
         "text/html", "200", "AAAA", "123"],
    ])
    caps = decode_cdx_response(body)
    assert len(caps) == 1
    # IA names renamed to the pywb vocabulary (compat dialect)
    assert caps[0]["url"] == "https://example.org/"
    assert caps[0]["mime"] == "text/html"
    assert caps[0]["status"] == "200"
    assert "original" not in caps[0]


def test_404_handling():
    from cdx_toolkit_ray.sources.wire import decode_cdx_response

    assert decode_cdx_response('{"error": "No Captures found"}', 404) == []
    assert decode_cdx_response("[]") == []
    with pytest.raises(ValueError):
        decode_cdx_response("<html>not found</html>", 404)
    with pytest.raises(ValueError):
        decode_cdx_response("garbage")


@pytest.mark.skipif(not os.path.exists(REF_MOCK),
                    reason="reference golden corpus not present")
def test_reference_golden_corpus_roundtrip():
    """Decode the reference repo's recorded CDX responses end-to-end
    through the Dataset ingest path and check capture-shape invariants."""
    from cdx_toolkit_ray.sources.wire import read_cdx_responses

    df = read_cdx_responses(REF_MOCK).to_pandas()
    # the recorded session contains real capture rows
    caps = df[df.urlkey.notna()]
    assert len(caps) > 0
    assert (caps.timestamp.str.len() == 14).all()
    assert caps.urlkey.str.contains(r"\)").all()
    assert set(caps.status.dropna()) <= {str(s) for s in range(200, 600)} \
        | {"-"}
