"""Unit tests for the pyevents streaming DataSource's range reader.

Pins the r7 O(n^2) fix: _RangePartition.read() must fetch ONLY the
row groups covering [start, end) — the first form of the reader read
the WHOLE file per 2000-row partition and sliced, which the sf10
streaming screen measured as 24x superlinear wall (218 s -> 3.0 s
after row-group pruning). End-to-end coverage (stream_python_source's
oracle) can't see the I/O shape, so the pruning gets a unit pin.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_playground_spark.sources.stream_pysource import (
    make_stream_datasource,
)

N_ROWS = 1_000
ROW_GROUP = 100  # -> 10 row groups


@pytest.fixture(scope="module")
def events_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("pyevents") / "events.parquet"
    n = N_ROWS
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [1_700_000_000_000_000_000 + i * 1_000_000_000 for i in range(n)],
                pa.timestamp("ns"),
            ),
            "user_id": pa.array([i % 7 for i in range(n)], pa.int64()),
            "event_type": pa.array(["a" if i % 2 else "b" for i in range(n)]),
            "value": pa.array([float(i) / 4 for i in range(n)]),
        }
    )
    pq.write_table(tbl, path, row_group_size=ROW_GROUP)
    assert pq.ParquetFile(path).metadata.num_row_groups == n // ROW_GROUP
    return str(path)


def _reader_and_partition_cls(path):
    ds = make_stream_datasource()(options={"path": path})
    reader = ds.streamReader(None)
    parts = reader.partitions({"row": 0}, {"row": N_ROWS})
    return reader, type(parts[0])


def _spy_read(monkeypatch, reader, partition):
    """Run reader.read(partition) with read_row_groups spied; return
    (row-group lists fetched, concatenated result table)."""
    calls: list[list[int]] = []
    real = pq.ParquetFile

    class Spy(real):
        def read_row_groups(self, groups, **kw):
            calls.append(list(groups))
            return super().read_row_groups(groups, **kw)

    monkeypatch.setattr(pq, "ParquetFile", Spy)
    batches = list(reader.read(partition))
    monkeypatch.setattr(pq, "ParquetFile", real)
    tbl = pa.Table.from_batches(batches) if batches else None
    return calls, tbl


def test_read_fetches_only_covering_row_groups(monkeypatch, events_file):
    reader, Part = _reader_and_partition_cls(events_file)
    calls, tbl = _spy_read(monkeypatch, reader, Part(events_file, 250, 430))
    # rows 250-429 live in groups 2 (200-300), 3 (300-400), 4 (400-500)
    assert calls == [[2, 3, 4]], calls
    assert tbl.column("event_id").to_pylist() == list(range(250, 430))


def test_read_at_file_head_fetches_one_group(monkeypatch, events_file):
    reader, Part = _reader_and_partition_cls(events_file)
    calls, tbl = _spy_read(monkeypatch, reader, Part(events_file, 0, 100))
    assert calls == [[0]], calls
    assert tbl.column("event_id").to_pylist() == list(range(0, 100))


def test_read_group_aligned_tail(monkeypatch, events_file):
    reader, Part = _reader_and_partition_cls(events_file)
    calls, tbl = _spy_read(monkeypatch, reader, Part(events_file, 900, 1000))
    assert calls == [[9]], calls
    assert tbl.column("event_id").to_pylist() == list(range(900, 1000))


def test_read_empty_range_reads_nothing(monkeypatch, events_file):
    reader, Part = _reader_and_partition_cls(events_file)
    calls, tbl = _spy_read(monkeypatch, reader, Part(events_file, 500, 500))
    assert calls == [], calls
    assert tbl is None


def test_offset_algebra_partitions_cover_exactly(events_file):
    """partitions() must tile [lo, hi) exactly: no gap, no overlap."""
    reader, _ = _reader_and_partition_cls(events_file)
    parts = reader.partitions({"row": 17}, {"row": 983})
    spans = sorted((p.start, p.end) for p in parts)
    assert spans[0][0] == 17 and spans[-1][1] == 983
    for (s0, e0), (s1, e1) in zip(spans, spans[1:]):
        assert e0 == s1


def test_read_preserves_timestamp_and_values(monkeypatch, events_file):
    """The ns->us/UTC cast keeps instant identity and value fidelity."""
    reader, Part = _reader_and_partition_cls(events_file)
    _, tbl = _spy_read(monkeypatch, reader, Part(events_file, 100, 102))
    assert tbl.schema.field("ts").type == pa.timestamp("us", tz="UTC")
    ts = tbl.column("ts").cast(pa.int64()).to_pylist()
    assert ts == [
        (1_700_000_000_000_000_000 + i * 1_000_000_000) // 1_000
        for i in (100, 101)
    ]
    assert tbl.column("value").to_pylist() == [25.0, 25.25]
