"""DUST safe-parameter mining (stages/dust.py)."""

import pyarrow as pa
import ray.data


def _run(rows, **kw):
    from cdx_toolkit_ray.stages.dust import dust_params

    ds = ray.data.from_arrow(pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "digest": pa.array([r[1] for r in rows], pa.string())}))
    df = dust_params(ds, num_buckets=4, **kw).to_pandas()
    return {(r.host, r.param): r for r in df.itertuples()}


def test_dust_safe_param_with_merge_evidence():
    # sid varies, content identical within the stripped class -> safe
    rows = [
        ("http://h.example/a?id=1&sid=7", "d1"),
        ("http://h.example/a?id=1&sid=8", "d1"),
        ("http://h.example/a?id=2&sid=7", "d2"),
    ]
    got = _run(rows)
    sid = got[("h.example", "sid")]
    assert sid.safe and sid.n_conflict == 0 and sid.n_multi == 1
    assert sid.n_classes == 2 and sid.n_urls == 3
    # id strip merges different digests -> conflict, unsafe
    i = got[("h.example", "id")]
    assert not i.safe and i.n_conflict >= 1


def test_dust_singleton_classes_are_not_vacuously_safe():
    rows = [
        ("http://h.example/a?tok=1&x=1", "d1"),
        ("http://h.example/b?tok=2&x=2", "d2"),
    ]
    got = _run(rows)
    # stripping tok never merges anything: zero conflicts but zero
    # multi classes -> NOT safe (no positive evidence)
    tok = got[("h.example", "tok")]
    assert tok.n_conflict == 0 and tok.n_multi == 0 and not tok.safe


def test_dust_single_param_url_and_queryless_rows():
    rows = [
        ("http://h.example/p?s=1", "d"),
        ("http://h.example/p?s=2", "d"),
        ("http://h.example/p", "d"),          # no query: ignored
        ("http://h.example/q", "d2"),         # no query: ignored
    ]
    got = _run(rows)
    assert set(got) == {("h.example", "s")}
    s = got[("h.example", "s")]
    # both rows land in the empty-rest class 'h.example/p?'
    assert s.n_classes == 1 and s.n_urls == 2 and s.n_multi == 1
    assert s.safe


def test_dust_duplicate_key_removed_as_a_unit():
    # a appears twice; stripping key 'a' removes BOTH pairs, and the
    # candidate row for 'a' exists once per url row
    rows = [
        ("http://h.example/p?a=1&a=2&b=9", "d"),
        ("http://h.example/p?a=3&a=4&b=9", "d"),
    ]
    got = _run(rows)
    a = got[("h.example", "a")]
    assert a.n_urls == 2 and a.n_classes == 1 and a.n_multi == 1
    assert a.safe
    b = got[("h.example", "b")]
    # stripping b leaves distinct a-pairs -> two singleton classes
    assert b.n_classes == 2 and b.n_multi == 0 and not b.safe


def test_dust_min_multi_threshold():
    rows = [
        ("http://h.example/a?id=1&sid=7", "d1"),
        ("http://h.example/a?id=1&sid=8", "d1"),
    ]
    assert _run(rows)[("h.example", "sid")].safe
    assert not _run(rows, min_multi=2)[("h.example", "sid")].safe


def test_dust_per_host_isolation():
    rows = [
        ("http://x.example/a?s=1", "d1"),
        ("http://x.example/a?s=2", "d1"),
        ("http://y.example/a?s=1", "e1"),
        ("http://y.example/a?s=2", "e2"),   # conflict only on y
    ]
    got = _run(rows)
    assert got[("x.example", "s")].safe
    assert not got[("y.example", "s")].safe
