"""Timestamp-algebra truth tables, lifted semantics-for-semantics from
the reference's tests (cocrawler/cdx_toolkit tests/unit/test_timeutils.py
and doctests in cdx_toolkit/timeutils.py)."""

import datetime

import pytest

from cdx_toolkit_ray import timeutils as tu


def test_pad_timestamp():
    assert tu.pad_timestamp("1998") == "19980101000000"
    assert tu.pad_timestamp("199802") == "19980201000000"
    assert tu.pad_timestamp("20240315123456") == "20240315123456"


def test_pad_timestamp_up():
    assert tu.pad_timestamp_up("199802") == "19980228235959"  # Feb always 28
    assert tu.pad_timestamp_up("200002") == "20000228235959"  # even leap years
    assert tu.pad_timestamp_up("2024") == "20241231235959"
    assert tu.pad_timestamp_up("202404") == "20240430235959"
    assert tu.pad_timestamp_up("2024063012") == "20240630125959"


def test_timestamp_roundtrip():
    assert tu.timestamp_to_time("1999") == 915148800.0
    assert tu.time_to_timestamp(915148800.0) == "19990101000000"
    assert tu.timestamp_to_time("20180101") == 1514764800.0


def test_unixtime_hint():
    with pytest.raises(ValueError):
        tu.timestamp_to_time("1524962339")  # a unixtime, not a cdx ts
    with pytest.raises(ValueError):
        tu.timestamp_to_time("not-a-ts")


def test_validate_timestamps():
    tu.validate_timestamps({"from_ts": "2018", "to": 2019, "closest": "20180101"})
    with pytest.raises(ValueError):
        tu.validate_timestamps({"from_ts": "20x8"})
    with pytest.raises(ValueError):
        tu.validate_timestamps({"to": 1.5})


def test_cc_index_to_time():
    assert tu.cc_index_to_time("2018-02") == 1515888000.0
    assert tu.cc_index_to_time_special("2012") == 1338508800.0
    assert tu.cc_index_to_time_special("2009-2010") == 1283299200.0
    assert tu.cc_index_to_time_special("2008-2009") == tu.timestamp_to_time("200901")
    assert tu.cc_index_to_time_special("1999") is None


def test_http_date_iso():
    assert tu.http_date_to_datetime("Thu, 26 Dec 2013 09:50:10 GMT") == \
        datetime.datetime(2013, 12, 26, 9, 50, 10)
    assert tu.datetime_to_iso_date(datetime.datetime(2013, 12, 26, 10, 11, 12)) == \
        "2013-12-26T10:11:12Z"


def test_vectorized_epoch():
    import pyarrow as pa

    arr = pa.array(["19990101000000", "20180101000000"])
    out = tu.timestamps_to_epoch(arr).to_pylist()
    assert out == [915148800.0, 1514764800.0]


def test_epoch_to_timestamps():
    import numpy as np

    out = tu.epoch_to_timestamps(np.array([915148800.0, 1514764800.0]))
    assert list(out) == ["19990101000000", "20180101000000"]
