"""WarcFileDataSource: Spark 4 Python DataSource registration —
file-grain partitions, glob filtering, loud empty-estate errors."""

from __future__ import annotations

import pytest

from pandas_analysis_with_postgres_spark.sources.pyds import (
    WarcFileDataSource,
    _WarcFileReader,
)

CRLF = "\r\n"


def _warc(doc_id: int, body: str) -> bytes:
    rec = (
        f"WARC/1.0{CRLF}WARC-Type: response{CRLF}"
        f"WARC-Record-ID: <urn:uuid:{doc_id}>{CRLF}"
        f"WARC-Target-URI: http://example.com/doc/{doc_id}{CRLF}"
        f"Content-Length: {len(body)}{CRLF}{CRLF}{body}{CRLF}{CRLF}"
    )
    return rec.encode()


@pytest.fixture()
def estate(tmp_path):
    for i, body in [(1, "alpha"), (2, "beta"), (7, "gamma")]:
        (tmp_path / f"doc_{i}.warc").write_bytes(_warc(i, body))
    (tmp_path / "notes.txt").write_bytes(b"not an archive")
    return str(tmp_path)


def test_registered_format_reads_records(spark, estate):
    spark.dataSource.register(WarcFileDataSource)
    got = {
        (r.doc_id, r.body)
        for r in spark.read.format("warcfile").load(estate).collect()
    }
    # the .txt file is excluded by the default *.warc glob
    assert got == {(1, "alpha"), (2, "beta"), (7, "gamma")}


def test_partitions_chunk_files_not_one_per_archive(estate):
    # per-file tasks price a crawl estate at Python-worker overhead
    # per archive (measured 84 ms/file); files chunk into at most
    # num_partitions tasks, each walking its contiguous slice
    assert len(_WarcFileReader({"path": estate}).partitions()) == 3
    parts = _WarcFileReader(
        {"path": estate, "num_partitions": "2"}
    ).partitions()
    assert len(parts) == 2
    assert sorted(sum((p.value for p in parts), [])) == sorted(
        sum((q.value for q in _WarcFileReader({"path": estate}).partitions()), [])
    )


def test_empty_estate_and_missing_path_are_loud(tmp_path):
    with pytest.raises(ValueError, match="no '\\*\\.warc'"):
        _WarcFileReader({"path": str(tmp_path)}).partitions()
    with pytest.raises(ValueError, match="requires a path"):
        _WarcFileReader({})


def test_glob_option_filters_listing(spark, estate):
    spark.dataSource.register(WarcFileDataSource)
    got = (
        spark.read.format("warcfile")
        .option("glob", "doc_1.warc")
        .load(estate)
        .collect()
    )
    assert [(r.doc_id, r.body) for r in got] == [(1, "alpha")]


# ------------------------------------------------- streaming reader

from pandas_analysis_with_postgres_spark.sources.pyds import (  # noqa: E402
    WarcStreamDataSource,
    _WarcStreamReader,
)


def _drain(r, start):
    """One planned micro-batch: latestOffset on the driver, partition
    plan for (start, end], executor-style read per partition."""
    end = r.latestOffset()
    parts = r.partitions(start, end)
    rows = [t for p in parts for t in r.read(p)]
    return rows, end, parts


def test_stream_reader_incremental_pickup_and_replay(estate, tmp_path):
    r = _WarcStreamReader({"path": estate})
    rows1, off1, _ = _drain(r, r.initialOffset())
    assert {t[0] for t in rows1} == {1, 2, 7} and off1 == {
        "last": "doc_7.warc"
    }
    # nothing new: empty partition plan, offset unchanged
    rows2, off2, parts2 = _drain(r, off1)
    assert rows2 == [] and parts2 == [] and off2 == off1
    # a file LANDS (monotone name contract: sorts after doc_7)
    import pathlib

    pathlib.Path(estate, "doc_9.warc").write_bytes(_warc(9, "delta"))
    rows3, off3, _ = _drain(r, off1)
    assert [(t[0], t[5]) for t in rows3] == [(9, "delta")]
    assert off3 == {"last": "doc_9.warc"}
    # recovery replay: partitions() is a pure function of the two
    # offsets, so re-planning a committed window lists the same files
    replay = [t for p in r.partitions(off1, off3) for t in r.read(p)]
    assert [(t[0], t[5]) for t in replay] == [(9, "delta")]
    first = [
        t for p in r.partitions(r.initialOffset(), off1) for t in r.read(p)
    ]
    assert [t[0] for t in first] == [1, 2, 7]
    r.commit(off3)  # no-op, must not raise


def test_stream_reader_plans_executor_partitions(estate):
    # the scale contract: the FULL DataSourceStreamReader — records
    # are read by tasks, not the driver. Pin (a) the class is the
    # partition-planned API, (b) a multi-file window plans >1
    # partition (chunked, capped), (c) each partition carries only
    # path strings (driver state is O(names)).
    from pyspark.sql.datasource import (
        DataSourceStreamReader,
        SimpleDataSourceStreamReader,
    )

    r = _WarcStreamReader({"path": estate, "num_partitions": "2"})
    assert isinstance(r, DataSourceStreamReader)
    assert not isinstance(r, SimpleDataSourceStreamReader)
    # the simple (driver-reading) hook is gone from the source
    assert "simpleStreamReader" not in WarcStreamDataSource.__dict__
    parts = r.partitions(r.initialOffset(), r.latestOffset())
    assert len(parts) == 2  # 3 files chunked into 2 tasks
    for p in parts:
        assert all(isinstance(x, str) for x in p.value)  # paths only
    # chunk cap respected when files exceed num_partitions
    r1 = _WarcStreamReader({"path": estate, "num_partitions": "1"})
    assert len(r1.partitions(r1.initialOffset(), r1.latestOffset())) == 1


def test_stream_source_drains_under_available_now(spark, estate):
    from pandas_analysis_with_postgres_spark.streaming import (
        run_available_now,
    )

    spark.dataSource.register(WarcStreamDataSource)
    got = run_available_now(
        spark.readStream.format("warcstream").load(estate)
    )
    assert {(r.doc_id, r.body) for r in got.collect()} == {
        (1, "alpha"), (2, "beta"), (7, "gamma"),
    }
