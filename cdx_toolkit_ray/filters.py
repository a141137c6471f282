"""CDX filter-language compiler -> vectorized pyarrow.compute predicates.

The reference forwards filter strings to the CDX server
(cocrawler/cdx_toolkit README.md:147-180 documents the language;
cdx_toolkit/compat.py:10-24 translates dialects). This engine executes
them locally: each ``[modifier]field:expression`` compiles to a
pyarrow.compute kernel applied per Arrow batch inside ``map_batches``.

pywb modifiers ('cc' dialect):
    ``''``   substring match          ``!``   inverted substring
    ``=``    exact string             ``!=``  inverted exact
    ``~``    full-match regex         ``!~``  inverted regex

IA dialect: ``field:regex`` full-match regex and ``!field:regex`` only.

Multiple filters AND together. Fields are matched against the captures
table columns; values are compared as strings (the wire format of every
CDX field is a string).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc

from .compat import munge_filter

_PYWB_MODS = ("!~", "!=", "~", "=", "!")  # longest-first


@dataclass(frozen=True)
class CompiledFilter:
    field: str
    op: str          # 'contains' | 'exact' | 'regex'
    expr: str
    invert: bool

    def mask(self, batch: pa.Table) -> pa.ChunkedArray:
        if self.field not in batch.column_names:
            # Missing dynamic field: no row can match a positive
            # predicate; every row passes an inverted one.
            n = batch.num_rows
            return pa.chunked_array([pa.array([self.invert] * n, pa.bool_())])
        col = pc.cast(batch[self.field], pa.string())
        if self.op == "contains":
            m = pc.match_substring(col, self.expr)
        elif self.op == "exact":
            m = pc.equal(col, self.expr)
        else:  # full-match regex
            m = pc.match_substring_regex(col, "^(?:" + self.expr + ")$")
        m = pc.fill_null(m, False)
        if self.invert:
            m = pc.invert(m)
        return m


def parse_filter(f: str, source: str = "cc") -> CompiledFilter:
    """Parse one ``[mod]field:expr`` string in the given dialect."""
    if source == "ia":
        invert = f.startswith("!")
        body = f[1:] if invert else f
        field, _, expr = body.partition(":")
        if not _:
            raise ValueError("filter missing ':': " + f)
        # IA wire names -> our (pywb-named) columns for local execution
        from .compat import PYWB_FROM_IA
        field = PYWB_FROM_IA.get(field, field)
        return CompiledFilter(field=field, op="regex", expr=expr, invert=invert)

    mod = ""
    for m in _PYWB_MODS:
        if f.startswith(m):
            mod = m
            break
    body = f[len(mod):]
    field, _, expr = body.partition(":")
    if not _:
        raise ValueError("filter missing ':': " + f)
    op = {"": "contains", "!": "contains",
          "=": "exact", "!=": "exact",
          "~": "regex", "!~": "regex"}[mod]
    invert = mod.startswith("!")
    return CompiledFilter(field=field, op=op, expr=expr, invert=invert)


def compile_filters(filters, source: str = "cc") -> list[CompiledFilter]:
    """Munge dialect field names then parse every filter string."""
    if filters is None:
        return []
    if isinstance(filters, str):
        filters = (filters,)
    return [parse_filter(f, source) for f in munge_filter(filters, source)]


def apply_filters(batch: pa.Table, compiled: list[CompiledFilter]) -> pa.Table:
    """AND all compiled predicates over one Arrow batch (vectorized)."""
    if not compiled or batch.num_rows == 0:
        return batch
    mask = compiled[0].mask(batch)
    for cf in compiled[1:]:
        mask = pc.and_(mask, cf.mask(batch))
    return batch.filter(mask)


class FilterStage:
    """map_batches callable applying a compiled filter list per batch."""

    def __init__(self, filters, source: str = "cc"):
        self.compiled = compile_filters(filters, source)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return apply_filters(batch, self.compiled)
