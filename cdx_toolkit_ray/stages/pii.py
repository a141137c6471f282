"""PII detection + redaction over a text column.

Training-data hygiene pass: count and mask emails, IPv4 addresses and
phone numbers before a corpus ships. Entirely a stateless vectorized
``map_batches`` stage — polars ``str.count_matches`` /
``str.replace_all`` native kernels, no per-row Python, no shuffle —
so it streams at reader speed at any scale.

Pattern notes: the three regexes are deliberately alternation-free and
use only syntax with identical semantics in rust-regex (polars), RE2
(DuckDB) and Python ``re`` — that's what lets the DuckDB oracle
(queries.ORACLES["pii_redact"]) value-check the REDACTED STRING
byte-for-byte, not just the counts. Replacement order is fixed
(email, then IP, then phone) and counts are taken on the original
text.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"

PATTERNS = (("email", EMAIL_RE, "<EMAIL>"),
            ("ip", IPV4_RE, "<IP>"),
            ("phone", PHONE_RE, "<PHONE>"))


def pii_redact_batch(batch: pa.Table, text_col: str = "text",
                     out_col: str = "redacted") -> pa.Table:
    """Append ``n_email`` / ``n_ip`` / ``n_phone`` (match counts on the
    original text) and ``out_col`` (the masked text)."""
    import polars as pl

    t = pl.DataFrame({"t": pl.from_arrow(
        batch[text_col].combine_chunks())}).with_columns(
            pl.col("t").fill_null(""))
    exprs = []
    red = pl.col("t")
    for name, pat, repl in PATTERNS:
        exprs.append(pl.col("t").str.count_matches(pat)
                     .cast(pl.Int64).alias("n_" + name))
        red = red.str.replace_all(pat, repl)
    out = t.select(exprs + [red.alias(out_col)])
    for c in out.columns:
        batch = batch.append_column(c, out[c].to_arrow())
    return batch


def pii_redact(ds: ray.data.Dataset, text_col: str = "text",
               out_col: str = "redacted") -> ray.data.Dataset:
    """Streaming PII pass: adds counts + the redacted text column."""
    return ds.map_batches(
        lambda b: pii_redact_batch(b, text_col, out_col),
        batch_format="pyarrow", batch_size=None)
