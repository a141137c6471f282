"""RFC 9309 robots rule matching with wildcards and precedence.

The frontier's robots gate (pipelines/frontier.py) implements the
original REP the reference's politeness layer assumes: per-host
Disallow PREFIXES only (reference myrequests.py treats robots policy
as fixed per-host intervals; the gate adds prefix disallows).  RFC
9309 §2.2.2-2.2.3 standardizes the richer dialect every major crawler
speaks: ``Allow`` lines, ``*`` (any char sequence, including empty)
and ``$`` (end anchor) inside rule paths, and the precedence rule —
the LONGEST matching rule wins; on a length tie between an allow and
a disallow, the least restrictive (allow) wins; a url no rule matches
is allowed.

This module evaluates that dialect vectorized:

- each distinct rule pattern compiles ONCE to an anchored regex
  (``re.escape`` per literal segment, ``*`` -> ``.*``, trailing
  ``$`` -> ``$``), and is applied to all candidate paths in one
  polars ``str.contains`` pass — the per-distinct-prefix-length loop
  of the frontier gate, generalized to per-distinct-pattern;
- the winner per url is one lexsort + run-length pass over the
  candidate (row, -pattern_len, -allow, pattern) matches — no
  per-url Python;
- the rules table is the robots small side: broadcast once via
  ``ray.put`` under the same assumption the frontier gate documents
  (O(hosts x rules-per-host) rows).  Above that budget the same
  kernel runs inside a host-bucket exchange (co-locate urls with
  their host's rules) — the ``robots_gate_distributed`` shape; the
  broadcast path is what fixture-scale and per-node rule caches use.

Matching is against the url PATH (query string excluded here; RFC
9309 matches path + optional query — pass paths with query attached
if that behavior is wanted, the kernel is byte-based either way).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray
import ray.data


def compile_rule(pattern: str) -> str:
    """REP rule path -> anchored regex string (rust-regex/RE2/Python
    compatible: no backrefs, no lookaround).

    ``*`` matches any sequence incl. empty; a ``$`` as the FINAL
    character anchors the end (elsewhere ``$`` is literal, per the
    REP's de-facto grammar); everything else is literal.
    """
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = ".*".join(re.escape(seg) for seg in body.split("*"))
    return "^" + rx + ("$" if anchored else "")


def robots_wildcard_gate(urls: ray.data.Dataset,
                         rules: ray.data.Dataset, *,
                         host_col: str = "host",
                         path_col: str = "path",
                         rule_col: str = "rule",
                         allow_col: str = "allow",
                         keep_cols: tuple[str, ...] = (),
                         rules_budget_rows: int = 2_000_000
                         ) -> ray.data.Dataset:
    """urls(host, path, ...) x rules(host, rule, allow) ->
    (host, path, *keep_cols, allowed: bool, rule: winning rule | null).

    Precedence per RFC 9309: longest matching rule wins; allow wins a
    length tie; deterministic rule-string tiebreak after that; no
    match -> allowed with a null rule.
    """
    rule_rows = rules.select_columns([host_col, rule_col, allow_col]) \
        .take_all()
    if len(rule_rows) > rules_budget_rows:
        raise ValueError(
            "robots_wildcard_gate: %d rules exceed the broadcast budget "
            "(%d) — route through a host-bucket exchange (the "
            "robots_gate_distributed shape) instead" %
            (len(rule_rows), rules_budget_rows))
    # group by distinct pattern: one regex pass per pattern, host
    # membership checked with a per-pattern host set
    groups: dict[tuple[str, bool], set] = {}
    for r in rule_rows:
        groups.setdefault((r[rule_col], bool(r[allow_col])),
                          set()).add(r[host_col])
    compiled = [(pat, allow, compile_rule(pat), hosts)
                for (pat, allow), hosts in sorted(groups.items())]
    rules_ref = ray.put(compiled)

    def gate(batch: pa.Table) -> pa.Table:
        import os

        os.environ.setdefault("POLARS_MAX_THREADS", "1")
        import polars as pl

        rls = ray.get(rules_ref)
        host = batch[host_col].to_numpy(zero_copy_only=False)
        path_pl = pl.from_arrow(
            batch[path_col].combine_chunks().cast(pa.string()))
        allowed, win_rule = match_rules(host, path_pl, rls)

        out = {host_col: batch[host_col], path_col: batch[path_col]}
        for c in keep_cols:
            out[c] = batch[c]
        out["allowed"] = pa.array(allowed)
        out["rule"] = pa.array(win_rule.tolist(), pa.string())
        return pa.table(out)

    return urls.map_batches(gate, batch_format="pyarrow",
                            batch_size=None)


def match_rules(host: np.ndarray, path_pl, compiled
                ) -> tuple[np.ndarray, np.ndarray]:
    """The matcher core: (host array, polars path Series, compiled
    rule list) -> (allowed bool array, winning-rule object array).
    One regex pass per distinct pattern (host membership via a
    unique-host gather), one lexsort winner pass."""
    n = len(host)
    # null hosts get the empty sentinel: no rule set carries it, so
    # such rows fall through to the allowed default
    host = np.array([h if h is not None else "" for h in host],
                    dtype=object)
    uhost, hinv = np.unique(host, return_inverse=True)

    cand_row, cand_len, cand_allow, cand_pat = [], [], [], []
    for pat, allow, rx, hosts in compiled:
        uh_mask = np.fromiter((h in hosts for h in uhost), bool,
                              len(uhost))
        if not uh_mask.any():
            continue
        in_host = uh_mask[hinv]
        # null paths never match (RFC: no path, no rule)
        hits = (path_pl.str.contains(rx).fill_null(False)
                .to_numpy() & in_host)
        idx = np.flatnonzero(hits)
        if len(idx):
            cand_row.append(idx)
            cand_len.append(np.full(len(idx), len(pat), np.int64))
            cand_allow.append(
                np.full(len(idx), 1 if allow else 0, np.int64))
            cand_pat.append(np.full(len(idx), pat, dtype=object))

    allowed = np.ones(n, bool)
    win_rule = np.full(n, None, dtype=object)
    if cand_row:
        row = np.concatenate(cand_row)
        ln = np.concatenate(cand_len)
        al = np.concatenate(cand_allow)
        pt = np.concatenate(cand_pat)
        order = np.lexsort((pt.astype(str), -al, -ln, row))
        rs = row[order]
        first = np.ones(len(rs), bool)
        first[1:] = rs[1:] != rs[:-1]
        sel = order[first]
        allowed[row[sel]] = al[sel] == 1
        win_rule[row[sel]] = pt[sel]
    return allowed, win_rule


def compile_rules(rule_rows, *, host_col: str = "host",
                  rule_col: str = "rule", allow_col: str = "allow"):
    """Rule rows -> the compiled per-pattern list ``match_rules``
    consumes: [(pattern, allow, regex, host set)], deterministic
    order."""
    groups: dict[tuple[str, bool], set] = {}
    for r in rule_rows:
        groups.setdefault((r[rule_col], bool(r[allow_col])),
                          set()).add(r[host_col])
    return [(pat, allow, compile_rule(pat), hosts)
            for (pat, allow), hosts in sorted(groups.items())]


def robots_url_gate(rule_rows, *, url_col: str = "url",
                    host_col: str = "host", rule_col: str = "rule",
                    allow_col: str = "allow"):
    """Batch-filter form of the wildcard matcher for the crawl loop
    (``crawl_waves(url_gate=...)`` / ``run_crawl(url_gate=...,
    url_gate_tag='robotsv1')``): rows whose URL a robots rule
    disallows are dropped BEFORE the seen gate, so they are never
    offered, never fetched, and prune their subtrees. ``rule_rows``
    is the small-side rules list (host, rule, allow) compiled once
    into the closure — stateless and deterministic, safe to re-apply
    on resume. Host and path split from the full URL per batch; urls
    without a parseable host pass through (no rules can apply)."""
    compiled = compile_rules(rule_rows, host_col=host_col,
                             rule_col=rule_col, allow_col=allow_col)

    def gate(batch: pa.Table) -> pa.Table:
        import os

        os.environ.setdefault("POLARS_MAX_THREADS", "1")
        import polars as pl

        if batch.num_rows == 0:
            return batch
        u = pl.from_arrow(batch[url_col].combine_chunks()
                          .cast(pa.string()))
        host = u.str.extract(r"^[a-z][a-z0-9+.\-]*://([^/?#]+)", 1) \
            .to_numpy()
        path = (u.str.replace(r"^[a-z][a-z0-9+.\-]*://[^/?#]*", "")
                .str.replace(r"[?#].*$", ""))
        path = pl.Series([p if p else "/" for p in path.to_list()])
        allowed, _ = match_rules(host, path, compiled)
        return batch.filter(pa.array(allowed))

    return gate


def render_wildcard_robots_batch(batch: pa.Table, *,
                                 host_col: str = "host",
                                 rules_col: str = "rules"
                                 ) -> pa.Table:
    """One robots.txt body per host from its (prefix, allow) rule
    list — the RFC 9309 dialect render (``Allow:`` lines and ``*``/
    ``$`` rule paths, which the frontier's prefix renderer
    deliberately omits), with the same noise lines
    (comment, Sitemap) a parser must skip. ``rules_col`` is a list of
    ``{"rule": str, "allow": bool}`` structs."""
    hosts = batch[host_col].to_numpy(zero_copy_only=False)
    rules = batch[rules_col].to_pylist()
    bodies = []
    for h, rl in zip(hosts, rules):
        lines = ["# robots for %s" % h, "User-agent: *"]
        for r in (rl or []):
            lines.append("%s: %s" % ("Allow" if r["allow"]
                                     else "Disallow", r["rule"]))
        lines.append("Sitemap: https://%s/sitemap.xml" % h)
        bodies.append("\n".join(lines) + "\n")
    return pa.table({
        "host": pa.array(hosts, pa.string()),
        "robots_txt": pa.array(bodies, pa.string()),
    })


def parse_wildcard_robots_batch(batch: pa.Table, *,
                                host_col: str = "host",
                                text_col: str = "robots_txt"
                                ) -> pa.Table:
    """Raw robots.txt bodies -> one ``(host, rule, allow)`` row per
    Allow/Disallow line (wildcards preserved verbatim for the
    matcher; directive names case-insensitive; empty Disallow — the
    'allow everything' no-op — and noise lines dropped). The RFC 9309
    twin of pipelines/frontier.parse_robots_batch, feeding
    ``compile_rules``/``robots_wildcard_gate`` instead of the
    prefix-only gate."""
    import os

    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import polars as pl

    sch = pa.schema([("host", pa.string()), ("rule", pa.string()),
                     ("allow", pa.bool_())])
    if batch.num_rows == 0:
        return sch.empty_table()
    df = (pl.from_arrow(batch.select([host_col, text_col]))
          .rename({host_col: "host"})
          .with_columns(_ln=pl.col(text_col)
                        .str.extract_all(
                            r"(?im)^(allow|disallow):[ \t]*(\S*)"))
          .drop(text_col)
          .explode("_ln", empty_as_null=True)
          .drop_nulls("_ln")
          .with_columns(
              allow=pl.col("_ln").str.to_lowercase()
              .str.starts_with("allow"),
              rule=pl.col("_ln").str.replace(
                  r"(?i)^(allow|disallow):[ \t]*", ""))
          .drop("_ln")
          .filter(pl.col("rule") != ""))
    return df.select(["host", "rule", "allow"]).to_arrow().cast(sch)
