"""CDX wire-format decoders (SURVEY.md S3/S4): pywb JSONL and IA
list-of-lists response bodies -> Arrow capture tables.

Reference semantics reproduced (cdx_toolkit/__init__.py:54-88):

* 404 bodies that are ``{"error": ...}`` / ``{"message": ...}`` are an
  EMPTY result, any other 404 body is an error
* a body starting ``{`` is pywb JSONL (one capture dict per line)
* a body starting ``[`` is IA's JSON list-of-lists — header row of IA
  field names zipped into dicts and renamed to the pywb vocabulary
  (compat.py:27-38; here :func:`cdx_toolkit_ray.compat.munge_fields`)

The batch decoder turns a Dataset of response bodies into a flat
captures Dataset — the ingest path for recorded CDX responses (the
reference's own golden corpus format) next to the Parquet-native path.
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data

from ..compat import munge_fields

# union of static + dynamic capture fields (SURVEY.md §1.1); all
# nullable strings on the wire — typed casts happen downstream
CAPTURE_WIRE_FIELDS = [
    "urlkey", "timestamp", "url", "mime", "mime-detected", "status",
    "digest", "length", "offset", "filename", "redirect", "languages",
    "encoding", "charset",
]


def decode_cdx_response(text: str, status_code: int = 200) -> list[dict]:
    """One response body -> list of pywb-named capture dicts."""
    if status_code == 404:
        if text.startswith("{"):
            j = json.loads(text)
            if "error" in j or "message" in j:
                return []
        raise ValueError("404 seen for API call")
    if not text:
        return []
    if text.startswith("{"):
        return [json.loads(line) for line in text.splitlines() if line]
    if text.startswith("["):
        if text.startswith("[]"):
            return []
        lines = json.loads(text)
        fields = lines.pop(0)
        return munge_fields(fields, lines)
    raise ValueError("cannot decode response, first bytes are "
                     + repr(text[:50]))


def captures_to_table(dicts: list[dict]) -> pa.Table:
    """Capture dicts -> Arrow table over the unioned wire schema
    (absent dynamic fields -> null, unknown extras dropped)."""
    cols = {f: [d.get(f) for d in dicts] for f in CAPTURE_WIRE_FIELDS}
    return pa.table({f: pa.array(v, pa.string()) for f, v in cols.items()})


def decode_responses_batch(batch: pa.Table,
                           text_col: str = "response_text",
                           status_col: str | None = None) -> pa.Table:
    """map_batches fn: response bodies -> flattened captures."""
    texts = batch[text_col].to_pylist()
    if status_col and status_col in batch.column_names:
        statuses = batch[status_col].to_pylist()
    else:
        statuses = [200] * len(texts)
    out: list[dict] = []
    for t, s in zip(texts, statuses):
        out.extend(decode_cdx_response(t or "", int(s or 200)))
    return captures_to_table(out)


def read_cdx_responses(path: str, text_col: str = "response_text",
                       status_col: str | None = "response_status_code"
                       ) -> ray.data.Dataset:
    """Recorded-responses JSONL file(s) (the reference's mock format:
    one ``{method, url, request_params, response_status_code,
    response_text, ...}`` object per line) -> captures Dataset."""
    ds = ray.data.read_json(path)

    def decode(batch: pa.Table) -> pa.Table:
        return decode_responses_batch(batch, text_col, status_col)

    return ds.map_batches(decode, batch_format="pyarrow")
