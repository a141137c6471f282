"""Late families: web-graph analytics (SCC/bow-tie/spam-mass/balls),
IR ranking (BM25 / Dirichlet QL, index-backed twins), JL projection,
mirror hosts — each def paired with its oracle inline."""

from . import _oracles as _prev
globals().update({k: v for k, v in vars(_prev).items()
                   if not k.startswith('__')})
del _prev


def q_graph_signals(sf_dir: str):
    """Link-spam triage composite: TrustRank trust, OPIC importance
    and 2-core membership joined per url into ONE table (and one
    oracle hash) — the three graph signals a frontier's spam gate
    reads together (low trust + high OPIC churn + out-of-core is the
    classic farm fingerprint). Composed from the three proven
    engines; urls lacking any signal (self-loop-only nodes drop out
    of the k-core graph) are excluded, matching the SQL inner join."""
    import polars as pl

    from ..canon import hash64_batch
    from ..stages.exchange import hash_bucket_apply
    from ..stages.links import (extract_links, kcore_peel, opic,
                               trust_rank)

    root = _fixture_root(sf_dir)
    pages = ray.data.read_parquet(root + "/pages.parquet",
                                  columns=["url", "text"])
    links = extract_links(pages)
    t = trust_rank(links, iterations=3)
    o = opic(links, rounds=3).select_columns(["url", "importance"])
    k = kcore_peel(links, k=2, rounds=3)
    nb = 32

    def tag(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        url = batch["url"].combine_chunks().cast(pa.string())
        cols = {"url": url}
        names = set(batch.column_names)
        cols["trust"] = (batch["trust"].combine_chunks()
                         if "trust" in names
                         else pa.nulls(n, pa.int64()))
        cols["importance"] = (batch["importance"].combine_chunks()
                              if "importance" in names
                              else pa.nulls(n, pa.int64()))
        if "in_core" in names:
            cols["in_core"] = batch["in_core"].combine_chunks().cast(
                pa.int8())
        else:
            cols["in_core"] = pa.nulls(n, pa.int8())
        h = hash64_batch(url)
        cols["_b"] = pa.array((h % np.uint64(nb)).astype(np.int64),
                              pa.int64())
        return pa.table(cols)

    def merge(tbl: pa.Table) -> pa.Table:
        df = pl.from_arrow(tbl)
        g = (df.group_by("url")
             .agg(trust=pl.col("trust").max(),
                  importance=pl.col("importance").max(),
                  in_core=pl.col("in_core").max())
             .drop_nulls(["trust", "importance", "in_core"])
             .with_columns(in_core=pl.col("in_core") == 1))
        return g.to_arrow()

    unioned = (t.map_batches(tag, batch_format="pyarrow",
                             batch_size=None)
               .union(o.map_batches(tag, batch_format="pyarrow",
                                    batch_size=None))
               .union(k.map_batches(tag, batch_format="pyarrow",
                                    batch_size=None)))
    return hash_bucket_apply(unioned, "_b", merge, num_buckets=nb)


QUERIES["graph_signals"] = q_graph_signals
# one hash across all three unrolled graph recurrences: each proven
# oracle becomes a CTE, inner-joined per url.
ORACLES["graph_signals"] = (
    "WITH tr AS (" + ORACLES["trustrank"] + "),\n op AS ("
    + ORACLES["opic"] + "),\n kc AS (" + ORACLES["kcore"] + ")\n"
    "SELECT tr.url, tr.trust, op.importance, kc.in_core\n"
    "FROM tr JOIN op ON op.url = tr.url JOIN kc ON kc.url = tr.url")


def q_simhash_pairs(sf_dir: str):
    """SimHash Hamming-distance near-dup pairs (Manku, Jain & Das
    Sarma, WWW 2007 — Google's web-scale near-dup detector): 64-bit
    simhash split into 4 blocks; pigeonhole makes block-equality
    buckets a ZERO-MISS candidate set for hamming <= 3, verified by
    popcount(xor). Oracle: the full chain in SQL — FNV word hashes,
    per-bit majority vote, block explode, the max_group boilerplate
    cap, the candidate join and the popcount verify."""
    from ..stages.dedup import simhash_hamming_pairs

    ds = ray.data.read_parquet(_tbl(sf_dir, "documents"),
                               columns=["doc_id", "text"])
    return simhash_hamming_pairs(ds, text_col="text", id_col="doc_id",
                                 max_hamming=3, max_group=512)


def _simhash_pairs_oracle(max_hamming: int = 3,
                          max_group: int = 512) -> str:
    """simhash_hamming_pairs in pure SQL (built on the simhash CTE of
    _simhash_oracle): block explode, per-block-value group cap,
    candidate join with id_a < id_b, popcount(xor) verify."""
    counts = ",\n       ".join(
        "sum(CASE WHEN (CAST(h AS UBIGINT) >> %d) & 1 = 1 "
        "THEN 1 ELSE 0 END) AS c%d" % (b, b) for b in range(64))
    terms = "\n         + ".join(
        "(CASE WHEN 2*c%d > n THEN CAST('%d' AS HUGEINT) ELSE 0 END)"
        % (b, 1 << b) for b in range(64))
    n_blocks = max_hamming + 1
    width = 64 // n_blocks
    vals = ",".join("(%d)" % c for c in range(n_blocks))
    return (r"""
WITH w AS (SELECT doc_id,
                  unnest(regexp_extract_all(lower(text), '\w+')) AS word
           FROM documents),
h AS (SELECT doc_id, %s AS h FROM w),
b AS (SELECT doc_id, count(*) AS n,
       %s
      FROM h GROUP BY doc_id),
s AS (SELECT doc_id,
         %s AS sim
      FROM b),
sim AS (SELECT d.doc_id, CAST(coalesce(s.sim, 0) AS UBIGINT) AS sh
        FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id),
ch AS (SELECT doc_id, sh, c.block_id,
              (sh >> (%d * c.block_id)) & %d AS block_val
       FROM sim, (VALUES %s) AS c(block_id)),
ok AS (SELECT block_id, block_val FROM ch
       GROUP BY block_id, block_val HAVING count(*) <= %d),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                bit_count(xor(a.sh, b.sh)) AS hd
         FROM ch a
         JOIN ok o ON o.block_id = a.block_id
                  AND o.block_val = a.block_val
         JOIN ch b ON b.block_id = a.block_id
                  AND b.block_val = a.block_val
                  AND a.doc_id < b.doc_id)
SELECT id_a, id_b, CAST(hd AS BIGINT) AS hamming
FROM cand WHERE hd <= %d
""" % (_FNV_SQL.format(s="word"), counts, terms, width,
       (1 << width) - 1, vals, max_group, max_hamming))


QUERIES["simhash_pairs"] = q_simhash_pairs
ORACLES["simhash_pairs"] = _simhash_pairs_oracle()


def q_harmonic_centrality(sf_dir: str):
    """EXACT neighborhood function + harmonic centrality at radius 3
    (Boldi & Vigna's axiomatically-preferred centrality for
    disconnected web graphs; the verification twin of q_hyperball):
    per url, ``ball`` = nodes within <= 3 forward hops and ``h_num`` =
    sum of 6//d over reachable nodes (lcm(1,2,3)=6 keeps 1/d exact
    integers). Edges bucket-cached once; each hop moves only the
    narrow (root, node) frontier through two exchanges. Oracle: a
    recursive-CTE walk with min-distance fold."""
    from ..stages.balls import neighborhood_function
    from ..stages.links import extract_links

    root = _fixture_root(sf_dir)
    pages = ray.data.read_parquet(root + "/pages.parquet",
                                  columns=["url", "text"])
    return neighborhood_function(extract_links(pages), radius=3)


def q_hyperball(sf_dir: str):
    """HyperBall (Boldi & Vigna): per-node ball-size ESTIMATES at
    radius 3 via mergeable 2^9-register HLL counters flowing along
    reversed edges — the 10^10-node scale path (per-node memory is
    constant; counters move, node sets never do). Deterministic
    (fixed splitmix64-finalized FNV hashes) but approximate: rows-only
    entry; q_harmonic_centrality is the exact twin and the accuracy
    bound is pytest-checked (tests/test_balls.py)."""
    from ..stages.balls import hyperball
    from ..stages.links import extract_links

    root = _fixture_root(sf_dir)
    pages = ray.data.read_parquet(root + "/pages.parquet",
                                  columns=["url", "text"])
    return hyperball(extract_links(pages), radius=3, p=9)


QUERIES["harmonic_centrality"] = q_harmonic_centrality
ORACLES["harmonic_centrality"] = r"""
WITH RECURSIVE hrefs AS (
  SELECT url AS src_url,
         unnest(regexp_extract_all(text, 'href=''([^'']*)''', 1)) AS href
  FROM read_parquet('%s/pages.parquet')),
rawlinks AS (
  SELECT src_url,
         CASE WHEN contains(href, '://') THEN href
              WHEN href LIKE '/%%' THEN
                regexp_extract(src_url, '^[a-z][a-z0-9+.\-]*://[^/]+')
                || href
              ELSE NULL END AS dst_url
  FROM hrefs WHERE dst_url IS NOT NULL),
e AS (SELECT DISTINCT src_url AS src, dst_url AS dst FROM rawlinks),
nodes AS (SELECT DISTINCT url FROM (
  SELECT src AS url FROM e UNION ALL SELECT dst AS url FROM e)),
walk (root, node, d) AS (
    SELECT url, url, 0 FROM nodes
  UNION
    SELECT w.root, e.dst, w.d + 1
    FROM walk w JOIN e ON e.src = w.node
    WHERE w.d < 3),
dist AS (SELECT root, node, min(d) AS d FROM walk GROUP BY root, node)
SELECT root AS url, CAST(count(*) AS BIGINT) AS ball,
       CAST(coalesce(sum(CASE WHEN d > 0 THEN 6 // d ELSE 0 END), 0)
            AS BIGINT) AS h_num
FROM dist GROUP BY root
""" % _FIXTURE_LINK


def _nav_links(sf_dir: str):
    """The bow-tie input graph: harvested hrefs with intra-host links
    made bidirectional (scc.with_intrahost_backlinks' documented
    navigation-graph model), cross-host links directed."""
    from ..stages.links import extract_links
    from ..stages.scc import with_intrahost_backlinks

    root = _fixture_root(sf_dir)
    pages = ray.data.read_parquet(root + "/pages.parquet",
                                  columns=["url", "text"])
    return with_intrahost_backlinks(extract_links(pages))


def q_scc(sf_dir: str):
    """Strongly connected components (the web-graph core primitive
    behind Broder 2000) by distributed forward-backward min-label
    partition refinement with pointer jumping — no transitive
    closure, narrow (node, label) messages over twice-bucket-cached
    edges, driver holds one change counter per round. Canonical label
    = lexicographic min url of the component. Oracle: recursive-CTE
    closure -> mutual-reachability classes."""
    from ..stages.scc import strongly_connected

    return strongly_connected(_nav_links(sf_dir))


def q_bowtie(sf_dir: str):
    """Broder bow-tie decomposition (WWW 2000): every node classified
    as core SCC / IN / OUT / TENDRIL (weakly attached; lumps Broder's
    tendrils+tubes) / DISC relative to the largest SCC. Flags
    propagate on the SCC condensation DAG; per-url rows move exactly
    twice. Oracle: the closure-CTE SCC plus three unary recursive
    reachability sets (from-core, to-core, weakly-to-core)."""
    from ..stages.scc import bowtie

    return bowtie(_nav_links(sf_dir))


_NAV_E_SQL = r"""
hrefs AS (
  SELECT url AS src_url,
         unnest(regexp_extract_all(text, 'href=''([^'']*)''', 1)) AS href
  FROM read_parquet('%s/pages.parquet')),
rawlinks AS (
  SELECT src_url,
         CASE WHEN contains(href, '://') THEN href
              WHEN href LIKE '/%%' THEN
                regexp_extract(src_url, '^[a-z][a-z0-9+.\-]*://[^/]+')
                || href
              ELSE NULL END AS dst_url
  FROM hrefs WHERE dst_url IS NOT NULL),
e AS (SELECT DISTINCT src, dst FROM (
    SELECT src_url AS src, dst_url AS dst FROM rawlinks
    UNION ALL
    SELECT dst_url AS src, src_url AS dst FROM rawlinks
    WHERE regexp_extract(src_url, '://([^/]+)', 1)
          = regexp_extract(dst_url, '://([^/]+)', 1))),
nodes AS (SELECT DISTINCT url FROM (
  SELECT src AS url FROM e UNION ALL SELECT dst AS url FROM e)),
reach (a, b) AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b),
sccm AS (
  SELECT n.url AS v,
         least(n.url, coalesce(
           min(CASE WHEN r2.a IS NOT NULL THEN r1.b END),
           n.url)) AS lbl
  FROM nodes n
  LEFT JOIN reach r1 ON r1.a = n.url
  LEFT JOIN reach r2 ON r2.a = r1.b AND r2.b = n.url
  GROUP BY n.url)
""" % _FIXTURE_LINK

QUERIES["scc"] = q_scc
QUERIES["bowtie"] = q_bowtie
ORACLES["scc"] = ("WITH RECURSIVE " + _NAV_E_SQL
                  + "SELECT v AS url, lbl AS scc FROM sccm")
ORACLES["bowtie"] = ("WITH RECURSIVE " + _NAV_E_SQL + r""",
sizes AS (SELECT lbl, count(*) AS n FROM sccm GROUP BY lbl),
core AS (SELECT lbl FROM sizes ORDER BY n DESC, lbl LIMIT 1),
cm AS (SELECT v FROM sccm WHERE lbl = (SELECT lbl FROM core)),
freach (v) AS (
  SELECT v FROM cm
  UNION
  SELECT e.dst FROM freach f JOIN e ON e.src = f.v),
breach (v) AS (
  SELECT v FROM cm
  UNION
  SELECT e.src FROM breach g JOIN e ON e.dst = g.v),
wreach (v) AS (
  SELECT v FROM cm
  UNION
  SELECT u FROM wreach w JOIN (
    SELECT src AS x, dst AS u FROM e
    UNION ALL SELECT dst AS x, src AS u FROM e) s ON s.x = w.v)
SELECT s.v AS url, s.lbl AS scc,
       CASE WHEN s.lbl = (SELECT lbl FROM core) THEN 'SCC'
            WHEN s.v IN (SELECT v FROM breach) THEN 'IN'
            WHEN s.v IN (SELECT v FROM freach) THEN 'OUT'
            WHEN s.v IN (SELECT v FROM wreach) THEN 'TENDRIL'
            ELSE 'DISC' END AS component
FROM sccm s""")


def q_spam_mass(sf_dir: str):
    """Spam mass (Gyöngyi, Berkhin, Garcia-Molina & Pedersen, VLDB
    2006 "Link spam detection based on mass estimation"): the share
    of a page's PageRank NOT explained by trusted sources —
    ``1000 - 1000*trust*ΣPR // (rank*ΣTR)`` in exact integer
    permille (the global-sum calibration is the paper's relative
    mass), clamped to [0, 1000]. High mass = rank propped up by the
    untrusted region = link-farm fingerprint; the demotion gate a
    frontier applies before spending fetch budget. Composed from the
    two proven integer recurrences (link_rank + trustrank); the
    driver holds exactly two scalar sums. Products are checked
    against int64 range and the stage falls back to exact
    arbitrary-precision Python ints on its (already per-bucket,
    narrow) rows if a web-scale sum would wrap — the DSIR/host-
    blocklist exactness convention."""
    import polars as pl

    from ..canon import hash64_batch
    from ..stages.exchange import hash_bucket_apply
    from ..stages.links import extract_links, link_rank, trust_rank

    root = _fixture_root(sf_dir)
    pages = ray.data.read_parquet(root + "/pages.parquet",
                                  columns=["url", "text"])
    links = extract_links(pages)
    pr = link_rank(links, iterations=3)
    tr = trust_rank(links, iterations=3)
    sum_pr = int(pr.sum("rank") or 0)
    sum_tr = int(tr.sum("trust") or 0)
    nb = 32

    def tag(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        url = batch["url"].combine_chunks().cast(pa.string())
        names = set(batch.column_names)
        cols = {"url": url,
                "rank": (batch["rank"].combine_chunks()
                         if "rank" in names
                         else pa.nulls(n, pa.int64())),
                "trust": (batch["trust"].combine_chunks()
                          if "trust" in names
                          else pa.nulls(n, pa.int64()))}
        h = hash64_batch(url)
        cols["_b"] = pa.array((h % np.uint64(nb)).astype(np.int64),
                              pa.int64())
        return pa.table(cols)

    def merge(tbl: pa.Table) -> pa.Table:
        sch = pa.schema([("url", pa.string()), ("rank", pa.int64()),
                         ("trust", pa.int64()),
                         ("spam_mass_permille", pa.int64())])
        if tbl.num_rows == 0:
            return sch.empty_table()
        df = (pl.from_arrow(tbl).group_by("url")
              .agg(rank=pl.col("rank").max(),
                   trust=pl.col("trust").max())
              .drop_nulls(["rank", "trust"]))
        rank = df["rank"].to_numpy()
        trust = df["trust"].to_numpy()
        if sum_tr <= 0:
            mass = np.full(len(rank), 1000, np.int64)
        elif (trust.astype(np.float64).max(initial=0.0) * 1000
              * sum_pr < 2**62
              and rank.astype(np.float64).max(initial=0.0)
              * sum_tr < 2**62):
            mass = 1000 - (1000 * trust * sum_pr) \
                // np.maximum(rank * sum_tr, 1)
        else:   # exact big-int fallback (documented convention)
            mass = np.array(
                [1000 - (1000 * int(t) * sum_pr)
                 // max(int(r) * sum_tr, 1)
                 for t, r in zip(trust.tolist(), rank.tolist())],
                np.int64)
        mass = np.clip(mass, 0, 1000)
        return pa.table({
            "url": df["url"].to_arrow().cast(pa.string()),
            "rank": pa.array(rank, pa.int64()),
            "trust": pa.array(trust, pa.int64()),
            "spam_mass_permille": pa.array(mass, pa.int64())})

    unioned = (pr.map_batches(tag, batch_format="pyarrow",
                              batch_size=None)
               .union(tr.map_batches(tag, batch_format="pyarrow",
                                     batch_size=None)))
    return hash_bucket_apply(unioned, "_b", merge, num_buckets=nb)


QUERIES["spam_mass"] = q_spam_mass
ORACLES["spam_mass"] = (
    "WITH lr AS (" + ORACLES["link_rank"] + "),\n tr AS ("
    + ORACLES["trustrank"] + """)
SELECT lr.url, lr.rank, tr.trust,
       greatest(0, least(1000,
         1000 - (1000 * CAST(tr.trust AS HUGEINT)
                 * (SELECT sum(CAST(rank AS HUGEINT)) FROM lr))
           // greatest(CAST(lr.rank AS HUGEINT)
                 * (SELECT sum(CAST(trust AS HUGEINT)) FROM tr), 1)
       )) :: BIGINT AS spam_mass_permille
FROM lr JOIN tr ON tr.url = lr.url""")


def q_distance_distribution(sf_dir: str):
    """Exact distance distribution N(d) at radius 3 — what HyperANF
    (Boldi, Rosa & Vigna 2011) estimates at web scale: one row per
    distance with the exact pair count (d=0 = node count), the input
    to effective-diameter / spid reports. Same bucket-cached
    multi-source BFS as harmonic_centrality; oracle = the recursive
    walk CTE grouped by min distance."""
    from ..stages.balls import distance_distribution
    from ..stages.links import extract_links

    root = _fixture_root(sf_dir)
    pages = ray.data.read_parquet(root + "/pages.parquet",
                                  columns=["url", "text"])
    return distance_distribution(extract_links(pages), radius=3)


QUERIES["distance_distribution"] = q_distance_distribution
ORACLES["distance_distribution"] = r"""
WITH RECURSIVE hrefs AS (
  SELECT url AS src_url,
         unnest(regexp_extract_all(text, 'href=''([^'']*)''', 1)) AS href
  FROM read_parquet('%s/pages.parquet')),
rawlinks AS (
  SELECT src_url,
         CASE WHEN contains(href, '://') THEN href
              WHEN href LIKE '/%%' THEN
                regexp_extract(src_url, '^[a-z][a-z0-9+.\-]*://[^/]+')
                || href
              ELSE NULL END AS dst_url
  FROM hrefs WHERE dst_url IS NOT NULL),
e AS (SELECT DISTINCT src_url AS src, dst_url AS dst FROM rawlinks),
nodes AS (SELECT DISTINCT url FROM (
  SELECT src AS url FROM e UNION ALL SELECT dst AS url FROM e)),
walk (root, node, d) AS (
    SELECT url, url, 0 FROM nodes
  UNION
    SELECT w.root, e.dst, w.d + 1
    FROM walk w JOIN e ON e.src = w.node
    WHERE w.d < 3),
dist AS (SELECT root, node, min(d) AS d FROM walk GROUP BY root, node)
SELECT d, CAST(count(*) AS BIGINT) AS n_pairs FROM dist GROUP BY d
""" % _FIXTURE_LINK


def q_signed_projection(sf_dir: str):
    """Signed random projection / JL sketch (Achlioptas 2001, Charikar
    2002): int8-quantize then project onto 16 fixed ±1 hyperplanes —
    the integer-exact embedding sketch an ANN prefilter scans instead
    of the full vector. Zero-shuffle streaming map; the ±1 matrix
    regenerates per worker from the seed (nothing ships). Oracle: the
    proven quantize CTE joined against the same matrix inlined as
    VALUES literals, summed per (vec, output dim)."""
    from ..stages.ann import quantize_batch, signed_projection_batch

    ds = ray.data.read_parquet(_tbl(sf_dir, "embeddings"),
                               columns=["vec_id", "embedding"])
    ds = ds.map_batches(quantize_batch, batch_format="pyarrow",
                        batch_size=None)
    return ds.map_batches(
        lambda b: signed_projection_batch(b, dim_out=16, seed=7),
        batch_format="pyarrow", batch_size=None)


def _signed_projection_oracle(dim_in: int = 64, dim_out: int = 16,
                              seed: int = 7) -> str:
    signs = (np.random.RandomState(seed)
             .randint(0, 2, size=(dim_in, dim_out)) * 2 - 1)
    vals = ",".join("(%d,%d,%d)" % (i, j, int(signs[i, j]))
                    for i in range(dim_in) for j in range(dim_out))
    return """
WITH q AS (
  SELECT vec_id, embedding,
         CAST(list_max(list_transform(embedding, x -> abs(x)))
              AS DOUBLE) AS max_abs
  FROM embeddings),
e AS (SELECT vec_id, max_abs, embedding,
             unnest(range(1, len(embedding) + 1)) AS i FROM q),
qv AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim_idx,
       CAST(CASE WHEN max_abs = 0 THEN 0
            ELSE round(CAST(embedding[i] AS DOUBLE) * 127.0 / max_abs)
            END AS BIGINT) AS qval
       FROM e),
s (i, j, v) AS (VALUES %s)
SELECT qv.vec_id, CAST(s.j AS BIGINT) AS dim_idx,
       CAST(sum(qv.qval * s.v) AS BIGINT) AS pval
FROM qv JOIN s ON s.i = qv.dim_idx
GROUP BY qv.vec_id, s.j
""" % vals


QUERIES["signed_projection"] = q_signed_projection
ORACLES["signed_projection"] = _signed_projection_oracle()


def q_bm25(sf_dir: str):
    """BM25 ranking (Robertson/Okapi, Lucene-default IDF) for the
    conjunctive query ``table hash merge`` — THE bag-of-words ranking
    function, in exact integer arithmetic: k1=6/5 and b=3/4 clear all
    denominators (num = 44·tf·Ttok, den = 20·tf·Ttok + 6·Ttok +
    18·dl·N), IDF quantizes to micro-nats (the lm.py convention),
    per-doc score is an order-free integer sum. One postings pass
    through one doc-bucket exchange; N and Ttok are the only driver
    scalars. Oracle: the identical chain in SQL with HUGEINT
    arithmetic."""
    from ..stages.invindex import bm25_search

    ds = ray.data.read_parquet(_tbl(sf_dir, "documents"),
                               columns=["doc_id", "text"])
    return bm25_search(ds, ["table", "hash", "merge"], mode="and")


QUERIES["bm25"] = q_bm25
ORACLES["bm25"] = r"""
WITH tok AS (SELECT doc_id,
                    unnest(regexp_extract_all(lower(text), '\w+')) AS w
             FROM documents),
tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
       FROM tok GROUP BY doc_id, w),
dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
stats AS (SELECT (SELECT count(*) FROM documents) AS n,
                 (SELECT sum(tf) FROM tf) AS ttok),
qt (w) AS (VALUES ('table'), ('hash'), ('merge')),
df AS (SELECT q.w, count(t.doc_id) AS df
       FROM qt q LEFT JOIN (SELECT DISTINCT w, doc_id FROM tf) t
            ON t.w = q.w GROUP BY q.w),
idf AS (SELECT w, CAST(floor(
          1e6 * ln((2 * (SELECT n FROM stats) + 2)
                   / CAST(2 * df + 1 AS DOUBLE)) + 0.5) AS BIGINT)
          AS idf
        FROM df),
m AS (SELECT t.doc_id, t.w, t.tf, d.dl
      FROM tf t JOIN qt q ON q.w = t.w
      JOIN dl d ON d.doc_id = t.doc_id),
c AS (SELECT m.doc_id,
        (CAST(i.idf AS HUGEINT) * 44 * m.tf * s.ttok)
        // (CAST(20 AS HUGEINT) * m.tf * s.ttok
            + 6 * s.ttok + 18 * m.dl * s.n) AS contrib
      FROM m JOIN idf i ON i.w = m.w, stats s)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matched,
       CAST(sum(contrib) AS BIGINT) AS score_1e6
FROM c GROUP BY doc_id HAVING count(*) = 3
"""


def q_temperature_mixture(sf_dir: str):
    """Temperature-2 mixture sampling (the T5/Gopher sqrt-share rule):
    each language's share of a 600-doc sample is proportional to
    isqrt(group size) — small domains up-weighted without going
    uniform. Exact integer chain (isqrt weights, floor quotas,
    splitmix64 winner keys); group sizes are an O(groups) driver
    dict. Oracle: the same chain with floor(sqrt) + row_number in
    SQL."""
    from ..stages.sampling import temperature_mixture

    ds = ray.data.read_parquet(_tbl(sf_dir, "documents"),
                               columns=["doc_id", "lang"])
    out = temperature_mixture(ds, "lang", budget=600, seed=0)
    return out.select_columns(["doc_id", "lang", "skey", "quota"])


QUERIES["temperature_mixture"] = q_temperature_mixture
ORACLES["temperature_mixture"] = ("""
WITH h AS MATERIALIZED (SELECT doc_id, lang,
                  """ + _seeded_key_sql() + """ AS raw
           FROM documents),
m AS MATERIALIZED (SELECT doc_id, lang,
                  """ + _sql_mix64("raw") + r""" AS skey
           FROM h),
sz AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
w AS (SELECT lang, CAST(floor(sqrt(n)) AS BIGINT) AS w FROM sz),
q AS (SELECT lang, 600 * w // (SELECT sum(w) FROM w) AS quota FROM w),
r AS (SELECT m.doc_id, m.lang, m.skey,
             row_number() OVER (PARTITION BY m.lang
                                ORDER BY m.skey, m.doc_id) AS rk
      FROM m)
SELECT r.doc_id, r.lang, r.skey, CAST(q.quota AS BIGINT) AS quota
FROM r JOIN q ON q.lang = r.lang WHERE r.rk <= q.quota
""")


def q_graph_report(sf_dir: str):
    """HyperANF summary report (Boldi, Rosa & Vigna 2011): effective
    diameter (90th pct, interpolated), mean distance and spid
    (variance/mean dispersion) of the radius-3 distance distribution,
    each an exact integer permille (big-int arithmetic over the <= 4
    distribution rows). Oracle: the walk CTE + the same closed-form
    integer expressions in HUGEINT."""
    from ..stages.balls import graph_report
    from ..stages.links import extract_links

    root = _fixture_root(sf_dir)
    pages = ray.data.read_parquet(root + "/pages.parquet",
                                  columns=["url", "text"])
    return graph_report(extract_links(pages), radius=3)


QUERIES["graph_report"] = q_graph_report
ORACLES["graph_report"] = ("""
WITH RECURSIVE dd AS ((""" + ORACLES["distance_distribution"] + r"""
)),
s AS (SELECT CAST(sum(n_pairs) AS HUGEINT) AS t,
             CAST(sum(d * n_pairs) AS HUGEINT) AS s1,
             CAST(sum(d * d * n_pairs) AS HUGEINT) AS s2 FROM dd),
cum AS (SELECT d, n_pairs,
               sum(n_pairs) OVER (ORDER BY d) AS c,
               coalesce(sum(n_pairs) OVER (
                 ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) AS cprev
        FROM dd),
ed AS (SELECT d, n_pairs, cprev FROM cum, s
       WHERE 10 * c >= 9 * s.t ORDER BY d LIMIT 1)
SELECT 'eff_diameter_90' AS metric,
       CAST(CASE WHEN (SELECT d FROM ed) = 0 THEN 0
            ELSE 1000 * ((SELECT d FROM ed) - 1)
                 + (1000 * (9 * (SELECT t FROM s)
                            - 10 * (SELECT cprev FROM ed)))
                   // (10 * (SELECT n_pairs FROM ed))
            END AS BIGINT) AS value_permille
UNION ALL
SELECT 'mean_distance',
       CAST(1000 * s1 // t AS BIGINT) FROM s
UNION ALL
SELECT 'spid',
       CAST(CASE WHEN s1 = 0 THEN 0
            ELSE (1000 * (t * s2 - s1 * s1)) // (t * s1)
            END AS BIGINT) FROM s
""")


def q_seed_cover(sf_dir: str):
    """Greedy max-cover seed selection (the (1-1/e) greedy rule):
    3 seeds, each round taking the url whose radius-2 forward ball
    covers the most not-yet-covered urls (ties to the smaller url) —
    how a production crawl builds a small seed list that still
    reaches most of the graph. Ball pair stream re-keyed once by node
    for covered-flag co-location; per round one uncovered-count
    scatter + one per-root fold; driver holds the winner + gain.
    Oracle: the walk CTE with all 3 greedy rounds unrolled."""
    from ..stages.balls import greedy_seed_cover
    from ..stages.links import extract_links

    root = _fixture_root(sf_dir)
    pages = ray.data.read_parquet(root + "/pages.parquet",
                                  columns=["url", "text"])
    return greedy_seed_cover(extract_links(pages), k=3, radius=2)


def _seed_cover_oracle(k: int = 3, radius: int = 2) -> str:
    base = r"""
WITH RECURSIVE hrefs AS (
  SELECT url AS src_url,
         unnest(regexp_extract_all(text, 'href=''([^'']*)''', 1)) AS href
  FROM read_parquet('%s/pages.parquet')),
rawlinks AS (
  SELECT src_url,
         CASE WHEN contains(href, '://') THEN href
              WHEN href LIKE '/%%' THEN
                regexp_extract(src_url, '^[a-z][a-z0-9+.\-]*://[^/]+')
                || href
              ELSE NULL END AS dst_url
  FROM hrefs WHERE dst_url IS NOT NULL),
e AS (SELECT DISTINCT src_url AS src, dst_url AS dst FROM rawlinks),
nodes AS (SELECT DISTINCT url FROM (
  SELECT src AS url FROM e UNION ALL SELECT dst AS url FROM e)),
walk (root, node, d) AS (
    SELECT url, url, 0 FROM nodes
  UNION
    SELECT w.root, e.dst, w.d + 1
    FROM walk w JOIN e ON e.src = w.node
    WHERE w.d < %d),
ball AS (SELECT DISTINCT root, node FROM walk)
""" % (_FIXTURE_LINK, radius)
    parts = []
    sel = []
    prev_cov = None
    for i in range(1, k + 1):
        src = "ball" if prev_cov is None else (
            "(SELECT root, node FROM ball WHERE node NOT IN "
            "(SELECT node FROM %s))" % prev_cov)
        parts.append(
            "r%d AS (SELECT root, count(*) AS c FROM %s AS b%d "
            "GROUP BY root)" % (i, src, i))
        parts.append(
            "w%d AS (SELECT root, c FROM r%d "
            "ORDER BY c DESC, root LIMIT 1)" % (i, i))
        cov_prev_term = "" if prev_cov is None else \
            "SELECT node FROM %s UNION " % prev_cov
        parts.append(
            "cov%d AS (SELECT DISTINCT node FROM (%sSELECT node "
            "FROM ball WHERE root = (SELECT root FROM w%d)))"
            % (i, cov_prev_term, i))
        prev_cov = "cov%d" % i
        sel.append("SELECT %d AS rank, root AS seed, "
                   "CAST(c AS BIGINT) AS gain FROM w%d" % (i, i))
    return (base.rstrip() + ",\n" + ",\n".join(parts) + "\n"
            + "\nUNION ALL ".join(sel))


QUERIES["seed_cover"] = q_seed_cover
ORACLES["seed_cover"] = _seed_cover_oracle()


def q_dirichlet_ql(sf_dir: str):
    """Dirichlet-smoothed query likelihood (Zhai & Lafferty 2001) for
    ``table hash merge``, μ=2000 — the LM-retrieval counterpart of
    bm25, scoring EVERY doc (absent terms fall back to the collection
    prior, so ranking needs only the doc-length row). Micro-nat
    integer quantization per (doc, term); cf/Ttok are a 3-entry dict
    + two driver scalars. Oracle: dl x query-terms cross join LEFT
    JOIN tf with the same quantized formula."""
    from ..stages.invindex import dirichlet_ql

    ds = ray.data.read_parquet(_tbl(sf_dir, "documents"),
                               columns=["doc_id", "text"])
    return dirichlet_ql(ds, ["table", "hash", "merge"], mu=2000)


QUERIES["dirichlet_ql"] = q_dirichlet_ql
ORACLES["dirichlet_ql"] = r"""
WITH tok AS (SELECT doc_id,
                    unnest(regexp_extract_all(lower(text), '\w+')) AS w
             FROM documents),
tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
       FROM tok GROUP BY doc_id, w),
dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
stats AS (SELECT (SELECT sum(tf) FROM tf) AS ttok),
qt (w) AS (VALUES ('table'), ('hash'), ('merge')),
cf AS (SELECT q.w, coalesce(sum(t.tf), 0) AS cf
       FROM qt q LEFT JOIN tf t ON t.w = q.w GROUP BY q.w),
x AS (SELECT d.doc_id, d.dl, c.w, c.cf, coalesce(t.tf, 0) AS tf
      FROM dl d CROSS JOIN cf c
      LEFT JOIN tf t ON t.doc_id = d.doc_id AND t.w = c.w),
sc AS (SELECT doc_id,
         CAST(floor(1e6 * ln(
           (tf * s.ttok + 2000 * cf)
           / CAST((dl + 2000) * s.ttok AS DOUBLE)) + 0.5) AS BIGINT)
           AS term,
         CASE WHEN tf > 0 THEN 1 ELSE 0 END AS hit
       FROM x, stats s)
SELECT doc_id, CAST(sum(hit) AS BIGINT) AS n_matched,
       CAST(sum(term) AS BIGINT) AS score_1e6
FROM sc GROUP BY doc_id
"""


def q_bm25_indexed(sf_dir: str):
    """Index-backed BM25 (stages/invindex.bm25_search with
    ``index_dir=``): build the hive-partitioned inverted index +
    doclen norms sidecar under /tmp, then rank the same conjunctive
    query reading ONLY the query terms' ``wb=`` buckets and the
    candidate docs' ``doclen/db=`` partitions, N/Ttok from meta.json
    — the physical plan a 100-TB corpus needs (no full-postings pass
    at query time). Oracle: the exact in-stream BM25 SQL; index-backed
    must hash-match it bit for bit."""
    import tempfile

    from ..stages.invindex import bm25_search, build_inverted_index

    ds = ray.data.read_parquet(_tbl(sf_dir, "documents"),
                               columns=["doc_id", "text"])
    with tempfile.TemporaryDirectory(prefix="bm25idx_") as tmp:
        idx = build_inverted_index(ds, tmp + "/idx", n_buckets=32)
        return bm25_search(None, ["table", "hash", "merge"],
                           mode="and", index_dir=idx).to_pandas()


QUERIES["bm25_indexed"] = q_bm25_indexed
ORACLES["bm25_indexed"] = ORACLES["bm25"]


def q_ql_indexed(sf_dir: str):
    """Index-backed Dirichlet QL (``index_dir=``): Ttok from
    meta.json, matched postings from the query terms' ``wb=`` buckets,
    doc lengths from the doclen sidecar (every doc is scored — that
    read IS the output). Oracle: the exact in-stream QL SQL."""
    import tempfile

    from ..stages.invindex import build_inverted_index, dirichlet_ql

    ds = ray.data.read_parquet(_tbl(sf_dir, "documents"),
                               columns=["doc_id", "text"])
    with tempfile.TemporaryDirectory(prefix="qlidx_") as tmp:
        idx = build_inverted_index(ds, tmp + "/idx", n_buckets=32)
        return dirichlet_ql(None, ["table", "hash", "merge"],
                            mu=2000, index_dir=idx).to_pandas()


QUERIES["ql_indexed"] = q_ql_indexed
ORACLES["ql_indexed"] = ORACLES["dirichlet_ql"]


def q_embedding_outliers(sf_dir: str):
    """Exact top-20 embedding outliers by scaled squared distance to
    the corpus centroid (``Σ_j (N·q_ij − S_j)²`` over the int8
    quantization — all-integer, reduction-order-free). Two streaming
    passes + per-block top-k prune; 65 driver scalars. Oracle: the
    quantize CTE, per-dim HUGEINT sums, the same scaled distance,
    ORDER BY d2 DESC, vec_id LIMIT 20."""
    from ..stages.ann import embedding_outliers

    ds = ray.data.read_parquet(_tbl(sf_dir, "embeddings"),
                               columns=["vec_id", "embedding"])
    return embedding_outliers(ds, k=20)


QUERIES["embedding_outliers"] = q_embedding_outliers
ORACLES["embedding_outliers"] = r"""
WITH q AS (
  SELECT vec_id, embedding,
         CAST(list_max(list_transform(embedding, x -> abs(x)))
              AS DOUBLE) AS max_abs
  FROM embeddings),
e AS (SELECT vec_id, max_abs, embedding,
             unnest(range(1, len(embedding) + 1)) AS i FROM q),
qv AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim_idx,
       CAST(CASE WHEN max_abs = 0 THEN 0
            ELSE round(CAST(embedding[i] AS DOUBLE) * 127.0 / max_abs)
            END AS HUGEINT) AS qval
       FROM e),
s AS (SELECT dim_idx, sum(qval) AS sj FROM qv GROUP BY dim_idx),
n AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM q),
d AS (SELECT qv.vec_id,
             sum((n.n * qv.qval - s.sj) * (n.n * qv.qval - s.sj))
               AS d2
      FROM qv JOIN s ON s.dim_idx = qv.dim_idx, n
      GROUP BY qv.vec_id),
r AS (SELECT vec_id, CAST(d2 AS BIGINT) AS d2,
             row_number() OVER (ORDER BY d2 DESC, vec_id) AS rank
      FROM d)
SELECT CAST(rank AS BIGINT) AS rank, vec_id, d2
FROM r WHERE rank <= 20
"""


def q_vocab_drift(sf_dir: str):
    """Crawl-to-crawl content drift as Jensen-Shannon divergence
    between the even-doc and odd-doc halves' unigram distributions
    (the bigram_lm split convention), in exact integer micro-nats —
    symmetric, bounded by ln 2 ~ 693,147 micro, threshold-able by a
    recrawl scheduler. One word-bucket exchange; totals are two
    driver scalars. Oracle: FULL OUTER word join + the identical
    quantized terms."""
    from ..stages.textstats import vocab_drift

    ds = ray.data.read_parquet(_tbl(sf_dir, "documents"),
                               columns=["doc_id", "text"])

    def half(par: int):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(ids % 2 == par))
        return fn

    a = ds.map_batches(half(0), batch_format="pyarrow",
                       batch_size=None)
    b = ds.map_batches(half(1), batch_format="pyarrow",
                       batch_size=None)
    return vocab_drift(a, b)


QUERIES["vocab_drift"] = q_vocab_drift
ORACLES["vocab_drift"] = r"""
WITH ta AS (SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS w
            FROM documents WHERE doc_id % 2 = 0),
tb AS (SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS w
       FROM documents WHERE doc_id % 2 = 1),
ca AS (SELECT w, CAST(count(*) AS BIGINT) AS c1 FROM ta GROUP BY w),
cb AS (SELECT w, CAST(count(*) AS BIGINT) AS c2 FROM tb GROUP BY w),
s AS (SELECT (SELECT sum(c1) FROM ca) AS t1,
             (SELECT sum(c2) FROM cb) AS t2),
j AS (SELECT coalesce(ca.c1, 0) AS c1, coalesce(cb.c2, 0) AS c2
      FROM ca FULL OUTER JOIN cb ON cb.w = ca.w),
terms AS (SELECT
    CASE WHEN c1 > 0 THEN CAST(floor(
      1e6 * c1 * ln(2.0 * c1 * s.t2 / (c1 * s.t2 + c2 * s.t1))
      + 0.5) AS BIGINT) ELSE 0 END AS ka,
    CASE WHEN c2 > 0 THEN CAST(floor(
      1e6 * c2 * ln(2.0 * c2 * s.t1 / (c1 * s.t2 + c2 * s.t1))
      + 0.5) AS BIGINT) ELSE 0 END AS kb
  FROM j, s)
SELECT CAST(count(*) AS BIGINT) AS n_words,
       (SELECT CAST(t1 AS BIGINT) FROM s) AS t_a,
       (SELECT CAST(t2 AS BIGINT) FROM s) AS t_b,
       CAST(sum(ka) // (SELECT t1 FROM s) AS BIGINT) AS kl_a_micro,
       CAST(sum(kb) // (SELECT t2 FROM s) AS BIGINT) AS kl_b_micro,
       CAST((sum(ka) // (SELECT t1 FROM s)
             + sum(kb) // (SELECT t2 FROM s)) // 2 AS BIGINT)
         AS js_micro
FROM terms
"""


def q_mirror_hosts(sf_dir: str):
    """Mirror-host detection (Bharat & Broder, WWW 1999): host pairs
    by shared URL paths with exact integer path-set Jaccard — the
    www./apex aliases in the fixture surface as true mirrors. Three
    narrow exchanges (shared_key_pairs_with_sizes, string docs):
    path pairs under a boilerplate cap, then per-host path-set sizes
    attached from bucket-co-located size ROWS — no driver-side
    per-host dict (the guard test forbids one). Oracle: the same
    capped self-join chain in SQL."""
    from ..stages.hosts import mirror_hosts

    root = _fixture_root(sf_dir)
    pages = ray.data.read_parquet(root + "/pages.parquet",
                                  columns=["url"])
    return mirror_hosts(pages, threshold_pct=50, min_shared=2)


QUERIES["mirror_hosts"] = q_mirror_hosts
ORACLES["mirror_hosts"] = r"""
WITH hp AS (SELECT DISTINCT
              regexp_extract(url, '://([^/]+)', 1) AS host,
              regexp_replace(url, '^[a-z][a-z0-9+.\-]*://[^/]+', '')
                AS path
            FROM read_parquet('%s/pages.parquet')
            WHERE regexp_extract(url, '://([^/]+)', 1) <> ''),
sz AS (SELECT host, CAST(count(*) AS BIGINT) AS n
       FROM hp GROUP BY host),
ok AS (SELECT path FROM hp GROUP BY path HAVING count(*) <= 256),
p AS (SELECT x.host AS a, y.host AS b,
             CAST(count(*) AS BIGINT) AS s
      FROM hp x
      JOIN ok o ON o.path = x.path
      JOIN hp y ON y.path = x.path AND x.host < y.host
      GROUP BY x.host, y.host HAVING count(*) >= 2)
SELECT p.a AS host_a, p.b AS host_b, p.s AS n_shared,
       sa.n AS n_a, sb.n AS n_b,
       (100 * p.s >= 50 * (sa.n + sb.n - p.s)) AS is_mirror
FROM p JOIN sz sa ON sa.host = p.a JOIN sz sb ON sb.host = p.b
""" % _FIXTURE_LINK



def q_fetch_http(sf_dir: str):
    """The reference's core loop over the REAL HTTP stack, end to end:
    politeness schedule -> fetcher actor pool -> stdlib-urllib
    HttpTransport against a loopback http.server that serves the
    deterministic fault schedule (status of attempt k =
    FAULT_STATUSES[(seed_order + k) % 8]) and each id's document text
    as body. No external network — everything is 127.0.0.1. Oracle:
    IDENTICAL to fetch_execute's serial SQL replay — live HTTP must
    reproduce the table transport bit for bit (an empty HTTP body
    marks an id absent from the payload table and maps back to SQL
    NULL; fixture texts are never empty)."""
    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    from ..pipelines.fetch import fetch_execute
    from ..pipelines.httpfetch import FaultScheduleServer, HttpTransport

    t = _pq.read_table(_tbl(sf_dir, "documents"),
                       columns=["doc_id", "text"])
    payloads = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    with FaultScheduleServer(payloads) as srv:
        base = srv.base_url

        def add_url(batch: pa.Table) -> pa.Table:
            u = ["%s/p/%d" % (base, s)
                 for s in batch["seed_order"].to_pylist()]
            return batch.append_column("fetch_url",
                                       pa.array(u, pa.string()))

        sched = (_frontier_over_seeds(sf_dir)
                 .filter(expr="host_rank >= 0")
                 .map_batches(add_url, batch_format="pyarrow",
                              batch_size=None))
        out = fetch_execute(sched,
                            HttpTransport(min_interval=0.0,
                                          timeout=30.0),
                            max_attempts=3, minimum_interval=3.0,
                            id_col="seed_order", url_col="fetch_url")

        def null_empty(batch: pa.Table) -> pa.Table:
            txt = batch["text"]
            mask = _pc.equal(_pc.coalesce(txt, ""), "")
            fixed = _pc.if_else(mask, pa.nulls(batch.num_rows,
                                               pa.string()), txt)
            return batch.set_column(batch.column_names.index("text"),
                                    "text", fixed)

        out = out.map_batches(null_empty, batch_format="pyarrow",
                              batch_size=None)
        # materialize while the loopback server is still alive
        return (out.select_columns(
            ["urlkey", "host", "seed_order", "fetch_ms", "n_attempts",
             "final_status", "fetch_action", "backoff_ms", "text"])
            .to_pandas())


QUERIES["fetch_http"] = q_fetch_http
ORACLES["fetch_http"] = ORACLES["fetch_execute"]


def q_fetch_replay(sf_dir: str):
    """Record/replay round trip, driver-checked: the politeness
    schedule is recorded ONCE serially through the fault-schedule
    transport (pipelines/cassette.record_cassette — the reference's
    record-then-mock harness shape), then the cassette replays through
    the DISTRIBUTED fetcher actor pool (ReplayTransport, strict
    unknown-request errors). Oracle: identical to fetch_execute's
    serial SQL replay — recording + replay must be lossless."""
    import tempfile

    from ..pipelines.cassette import ReplayTransport, record_cassette
    from ..pipelines.fetch import TableTransport, fetch_execute

    sched = _frontier_over_seeds(sf_dir).filter(expr="host_rank >= 0")
    sched_tbl = pa.Table.from_pandas(sched.to_pandas(),
                                     preserve_index=False)
    transport = TableTransport(_tbl(sf_dir, "documents"),
                               id_col="doc_id", text_col="text")
    with tempfile.TemporaryDirectory(prefix="cassette_") as tmp:
        cassette = record_cassette(sched_tbl, transport,
                                   tmp + "/c.parquet",
                                   max_attempts=3,
                                   minimum_interval=3.0,
                                   id_col="seed_order")
        out = fetch_execute(ray.data.from_arrow(sched_tbl),
                            ReplayTransport(cassette),
                            max_attempts=3, minimum_interval=3.0,
                            id_col="seed_order")
        return (out.select_columns(
            ["urlkey", "host", "seed_order", "fetch_ms", "n_attempts",
             "final_status", "fetch_action", "backoff_ms", "text"])
            .to_pandas())


QUERIES["fetch_replay"] = q_fetch_replay
ORACLES["fetch_replay"] = ORACLES["fetch_execute"]
