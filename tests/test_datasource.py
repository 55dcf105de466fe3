"""The Spark-4 Python DataSource for the daily dump feed: registration,
file-per-partition planning, dump_date filter pushdown pruning whole
files, row-level error policy."""

import gzip
import os

import pytest
from pyspark.sql import functions as F

DDL = "hash string, block_id bigint, fee double, time timestamp, dump_date date"


def _write_dump(dirpath, name, rows, header="hash\tblock_id\tfee\ttime"):
    with gzip.open(dirpath / name, "wt", encoding="utf-8") as fh:
        fh.write(header + "\n")
        for r in rows:
            fh.write("\t".join(r) + "\n")


@pytest.fixture()
def landing(tmp_path):
    d = tmp_path / "landing"
    d.mkdir()
    _write_dump(
        d,
        "blockchair_bitcoin_transactions_20240101.tsv.gz",
        [
            ("aa", "100", "0.5", "2024-01-01 10:00:00"),
            ("bb", "101", "", "2024-01-01 11:00:00"),  # empty cell -> NULL
        ],
    )
    _write_dump(
        d,
        "blockchair_bitcoin_transactions_20240102.tsv.gz",
        [("cc", "102", "1.25", "2024-01-02 09:30:00")],
    )
    # other table + non-dump junk must be ignored by the table router
    _write_dump(
        d,
        "blockchair_bitcoin_blocks_20240101.tsv.gz",
        [("zz", "1", "0", "2024-01-01 00:00:00")],
    )
    (d / "README.txt").write_text("not a dump")
    return d


@pytest.fixture()
def registered(spark):
    from blockchair_etl_spark.io.datasource import register_dump_source

    register_dump_source(spark)
    return spark


def _load(spark, landing, **opts):
    r = (
        spark.read.format("blockchair_dump")
        .option("path", str(landing))
        .option("table", "transactions")
        .option("schema_ddl", DDL)
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_reads_typed_rows_with_dump_date(registered, landing):
    df = _load(registered, landing)
    rows = {r.hash: r for r in df.collect()}
    assert set(rows) == {"aa", "bb", "cc"}  # blocks/README ignored
    assert rows["aa"].block_id == 100 and rows["aa"].fee == 0.5
    assert rows["bb"].fee is None  # empty cell
    assert str(rows["cc"].dump_date) == "2024-01-02"
    assert rows["aa"].time.hour == 10
    # one partition per dump file: planner-visible parallelism
    assert df.rdd.getNumPartitions() == 2


def test_dump_date_pushdown_prunes_files(registered, landing):
    df = _load(registered, landing)
    one_day = df.filter(F.col("dump_date") == "2024-01-02")
    assert {r.hash for r in one_day.collect()} == {"cc"}
    # the consumed filter prunes at PLANNING time: the scan has exactly
    # one partition (file), not two-then-filter
    assert one_day.rdd.getNumPartitions() == 1

    rng = df.filter(F.col("dump_date") >= "2024-01-02")
    assert rng.rdd.getNumPartitions() == 1
    lt = df.filter(F.col("dump_date") < "2024-01-02")
    assert {r.hash for r in lt.collect()} == {"aa", "bb"}
    assert lt.rdd.getNumPartitions() == 1
    # unsatisfiable range -> empty result, single placeholder partition
    none = df.filter(F.col("dump_date") > "2024-03-01")
    assert none.count() == 0

    # non-date filters are NOT consumed: Spark evaluates them post-scan
    # over the full file set, and results stay correct
    big = df.filter(F.col("block_id") >= 101)
    assert {r.hash for r in big.collect()} == {"bb", "cc"}


def test_row_error_policy(registered, landing, tmp_path):
    bad = tmp_path / "bad"
    bad.mkdir()
    _write_dump(
        bad,
        "blockchair_bitcoin_transactions_20240103.tsv.gz",
        [
            ("dd", "103", "2.0", "2024-01-03 01:00:00"),
            ("ee", "not_an_int", "0.1", "2024-01-03 02:00:00"),
        ],
    )
    with pytest.raises(Exception, match="cannot parse"):
        _load(registered, bad).collect()
    got = {r.hash: r for r in _load(registered, bad, mode="permissive").collect()}
    assert got["dd"].block_id == 103
    assert got["ee"].block_id is None  # unparseable cell nulled, row kept


def test_stream_reader_incremental_by_dump_date(registered, landing, tmp_path):
    """The streaming twin: offset = dump date. First drain picks up both
    days; a new day-3 file landed AFTER the first drain is the ONLY
    thing the second drain (same checkpoint) appends — source-native
    exactly-once by date range."""
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "stream_ckpt")

    def drain():
        q = (
            registered.readStream.format("blockchair_dump")
            .option("path", str(landing))
            .option("table", "transactions")
            .option("schema_ddl", DDL)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        q.awaitTermination(120)

    drain()
    first = {r.hash for r in registered.read.parquet(out).collect()}
    assert first == {"aa", "bb", "cc"}

    _write_dump(
        landing,
        "blockchair_bitcoin_transactions_20240103.tsv.gz",
        [("dd", "103", "2.0", "2024-01-03 01:00:00")],
    )
    drain()
    rows = registered.read.parquet(out).collect()
    assert {r.hash for r in rows} == {"aa", "bb", "cc", "dd"}
    # no duplicates: day 1-2 files were not re-read on the second drain
    assert len(rows) == 4
    assert str(next(r for r in rows if r.hash == "dd").dump_date) == "2024-01-03"


def test_stream_backfilled_file_within_horizon_is_read(registered, tmp_path):
    """A file landed for a date <= the committed offset (a backfill)
    must be read by the next batch: the offset pins per-date file sets
    for the trailing horizon, not just the max date (round-5 advice —
    the max-date-only offset silently skipped such files forever)."""
    d = tmp_path / "landing2"
    d.mkdir()
    _write_dump(
        d,
        "blockchair_bitcoin_transactions_20240101.tsv.gz",
        [("aa", "100", "0.5", "2024-01-01 10:00:00")],
    )
    _write_dump(
        d,
        "blockchair_bitcoin_transactions_20240103.tsv.gz",
        [("cc", "102", "1.25", "2024-01-03 09:30:00")],
    )
    out = str(tmp_path / "bf_out")
    ckpt = str(tmp_path / "bf_ckpt")

    def drain():
        q = (
            registered.readStream.format("blockchair_dump")
            .option("path", str(d))
            .option("table", "transactions")
            .option("schema_ddl", DDL)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert {r.hash for r in registered.read.parquet(out).collect()} == {"aa", "cc"}

    # 20240102 arrives AFTER 20240103 was committed — a backfill
    _write_dump(
        d,
        "blockchair_bitcoin_transactions_20240102.tsv.gz",
        [("bb", "101", "0.75", "2024-01-02 12:00:00")],
    )
    drain()
    rows = registered.read.parquet(out).collect()
    assert {r.hash for r in rows} == {"aa", "bb", "cc"}
    assert len(rows) == 3  # and nothing was re-read


def test_stream_replay_plans_identical_files_after_directory_change(spark, tmp_path):
    """Replaying a committed (start, end] range must plan the offset's
    PINNED file set even if the directory gained files since — the
    exactly-once contract a live re-listing cannot give."""
    from pyspark.sql.types import StructType

    from blockchair_etl_spark.io.datasource import BlockchairDumpStreamReader

    d = tmp_path / "landing3"
    d.mkdir()
    _write_dump(
        d,
        "blockchair_bitcoin_transactions_20240101.tsv.gz",
        [("aa", "100", "0.5", "2024-01-01 10:00:00")],
    )
    from pyspark.sql.types import _parse_datatype_string

    schema = _parse_datatype_string(DDL)
    rdr = BlockchairDumpStreamReader(
        schema, {"path": str(d), "table": "transactions"}
    )
    start = rdr.initialOffset()
    end = rdr.latestOffset()
    plan1 = sorted(p.path for p in rdr.partitions(start, end) if p.path)
    # a backfill lands into the pinned 2024-01-01 date after commit
    # (same table, different coin — so the table router DOES admit it)
    _write_dump(
        d,
        "blockchair_ethereum_transactions_20240101.tsv.gz",
        [("xx", "999", "0.1", "2024-01-01 23:00:00")],
    )
    plan2 = sorted(p.path for p in rdr.partitions(start, end) if p.path)
    assert plan1 == plan2  # replay unaffected by the directory change
    # ...and the NEXT batch delivers exactly the backfilled file
    end2 = rdr.latestOffset()
    delta = [p.path for p in rdr.partitions(end, end2) if p.path]
    assert [os.path.basename(p) for p in delta] == [
        "blockchair_ethereum_transactions_20240101.tsv.gz"
    ]


def test_stream_late_file_beyond_horizon_warns_not_silent(spark, tmp_path):
    """A file arriving for a date beyond the backfill horizon of the
    committed offset cannot be delivered under the offset contract —
    it must be surfaced (warning + counter), never dropped silently."""
    import warnings as _warnings

    from pyspark.sql.types import _parse_datatype_string

    from blockchair_etl_spark.io.datasource import BlockchairDumpStreamReader

    d = tmp_path / "landing4"
    d.mkdir()
    _write_dump(
        d,
        "blockchair_bitcoin_transactions_20240110.tsv.gz",
        [("aa", "100", "0.5", "2024-01-10 10:00:00")],
    )
    schema = _parse_datatype_string(DDL)
    rdr = BlockchairDumpStreamReader(
        schema,
        {"path": str(d), "table": "transactions", "backfill_horizon_days": "2"},
    )
    start = rdr.initialOffset()
    end = rdr.latestOffset()
    rdr.partitions(start, end)  # primes the known-file snapshot

    # a file 9 days late, far beyond the 2-day horizon of offset 0110
    _write_dump(
        d,
        "blockchair_bitcoin_transactions_20240101.tsv.gz",
        [("old", "1", "0.0", "2024-01-01 00:00:00")],
    )
    end2 = rdr.latestOffset()
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        planned = [p for p in rdr.partitions(end, end2) if p.path]
    assert not planned  # beyond horizon: not delivered...
    assert rdr.skipped_late_files == 1  # ...but counted
    assert any("beyond the 2-day backfill horizon" in str(w.message) for w in caught)


def test_stream_late_file_aging_out_within_transition_warns(spark, tmp_path):
    """r6 advice: a file backfilled into a date that ages OUT of the
    horizon within the same transition (start_floor < ymd <=
    start.last_date, but ymd <= end_floor because the feed jumped
    ahead) is undeliverable THAT batch — it must be warned in the batch
    that first observes it, not on some later partitions() call that
    may never come. The warn check runs against the END offset's
    horizon and the actually-planned file set."""
    import warnings as _warnings

    from pyspark.sql.types import _parse_datatype_string

    from blockchair_etl_spark.io.datasource import BlockchairDumpStreamReader

    d = tmp_path / "landing5"
    d.mkdir()
    _write_dump(
        d,
        "blockchair_bitcoin_transactions_20240110.tsv.gz",
        [("aa", "100", "0.5", "2024-01-10 10:00:00")],
    )
    schema = _parse_datatype_string(DDL)
    rdr = BlockchairDumpStreamReader(
        schema,
        {"path": str(d), "table": "transactions", "backfill_horizon_days": "2"},
    )
    start = rdr.initialOffset()
    end = rdr.latestOffset()  # last_date 0110, horizon floor 0108
    rdr.partitions(start, end)  # delivers 0110, primes the snapshot

    # the feed jumps to 0113 (new end_floor 0111) AND a file is
    # backfilled into 0109 — inside start's horizon, but aged out of
    # end's horizon within this one transition
    _write_dump(
        d,
        "blockchair_bitcoin_transactions_20240113.tsv.gz",
        [("new", "7", "1.0", "2024-01-13 09:00:00")],
    )
    _write_dump(
        d,
        "blockchair_bitcoin_transactions_20240109.tsv.gz",
        [("late", "2", "0.1", "2024-01-09 01:00:00")],
    )
    end2 = rdr.latestOffset()
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        planned = [p for p in rdr.partitions(end, end2) if p.path]
    names = {p.path.rsplit("/", 1)[-1] for p in planned}
    assert names == {"blockchair_bitcoin_transactions_20240113.tsv.gz"}
    assert rdr.skipped_late_files == 1
    assert any("20240109" in str(w.message) for w in caught)
    # the delivered 0113 file must NOT be flagged late
    assert not any("20240113" in str(w.message) for w in caught)
