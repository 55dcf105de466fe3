"""Spark-native Python DataSource for the daily dump feed.

The daily landing layout (``blockchair_<coin>_<type>_<YYYYMMDD>.tsv.gz``,
reference layout ``download_blockchair_data.py:235``) exposed through the
PySpark 4 DataSource API (`pyspark.sql.datasource`) instead of ad-hoc
path globbing:

    spark.dataSource.register(BlockchairDumpDataSource)
    df = (spark.read.format("blockchair_dump")
          .option("path", landing_dir)
          .option("table", "transactions")
          .option("schema_ddl", "hash string, time timestamp, fee bigint")
          .load())

What the integration buys over ``read_tsv`` + manual globs:

- **planner-visible partitioning**: ``partitions()`` returns one
  InputPartition per dump FILE, so Spark schedules file-granular tasks
  and the UI/AQE see the real split count;
- **pushed file pruning**: ``pushFilters`` consumes comparisons on the
  ``dump_date`` column (EqualTo / GreaterThan[OrEqual] /
  LessThan[OrEqual]) and prunes whole FILES at planning time — the
  daily-dump analog of parquet partition pruning; consumed filters are
  fully enforced by pruning (every row of a file shares the file's
  date), remaining filters go back to Spark untouched;
- **row-level error policy** where Spark's csv reader only offers
  per-file behavior on a custom feed: ``mode=permissive`` pads/clips
  ragged rows, default ``failfast`` raises with file+line context.

Scale note: the executor-side ``read()`` streams gzip text a line at a
time (no file-sized buffers); one task per file matches the feed's
natural unit of retry/skip. The reader object that ships to executors
carries only the file list and schema — no driver state.
"""

from __future__ import annotations

import gzip
import os
from datetime import date, datetime
from typing import TYPE_CHECKING, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import (
    BooleanType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StructType,
    TimestampType,
)

from .sources import parse_dump_filename

if TYPE_CHECKING:
    pass


class DumpFilePartition(InputPartition):
    def __init__(self, path: str, yyyymmdd: str):
        self.path = path
        self.yyyymmdd = yyyymmdd


def _coerce(raw: str, dtype):
    """TSV cell -> schema type; empty string is NULL (dump convention)."""
    if raw == "":
        return None
    if isinstance(dtype, (IntegerType, LongType)):
        return int(raw)
    if isinstance(dtype, (DoubleType, FloatType)):
        return float(raw)
    if isinstance(dtype, BooleanType):
        return raw.lower() in ("1", "true", "t", "yes")
    if isinstance(dtype, TimestampType):
        return datetime.strptime(raw, "%Y-%m-%d %H:%M:%S")
    if isinstance(dtype, DateType):
        return datetime.strptime(raw, "%Y-%m-%d").date()
    return raw


class BlockchairDumpReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.schema_struct = schema
        self.mode = (options.get("mode") or "failfast").lower()
        if self.mode not in ("failfast", "permissive"):
            raise ValueError(f"mode must be failfast|permissive, got {self.mode!r}")
        root = options.get("path")
        if not root:
            raise ValueError("option 'path' (landing directory) is required")
        table = options.get("table")
        coin = options.get("coin")
        files: list[tuple[str, str]] = []
        for name in sorted(os.listdir(root)):
            parsed = parse_dump_filename(name)
            if not parsed:
                continue
            f_coin, f_type, ymd = parsed
            if table and f_type != table:
                continue
            if coin and f_coin != coin:
                continue
            files.append((os.path.join(root, name), ymd))
        self.files = files
        # date bounds tightened by pushFilters (yyyymmdd strings compare
        # like the dates they encode)
        self.date_lo: str | None = None  # inclusive
        self.date_hi: str | None = None  # inclusive

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr == ("dump_date",) and isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ) and isinstance(f.value, date):
                ymd = f.value.strftime("%Y%m%d")
                if isinstance(f, EqualTo):
                    self._tighten(lo=ymd, hi=ymd)
                elif isinstance(f, GreaterThanOrEqual):
                    self._tighten(lo=ymd)
                elif isinstance(f, GreaterThan):
                    self._tighten(lo=_next_day(ymd))
                elif isinstance(f, LessThanOrEqual):
                    self._tighten(hi=ymd)
                else:  # LessThan
                    self._tighten(hi=_prev_day(ymd))
                continue  # consumed: fully enforced by file pruning
            yield f  # everything else evaluates in Spark post-scan

    def _tighten(self, lo: str | None = None, hi: str | None = None) -> None:
        if lo is not None and (self.date_lo is None or lo > self.date_lo):
            self.date_lo = lo
        if hi is not None and (self.date_hi is None or hi < self.date_hi):
            self.date_hi = hi

    def partitions(self) -> list[DumpFilePartition]:
        kept = [
            DumpFilePartition(path, ymd)
            for path, ymd in self.files
            if (self.date_lo is None or ymd >= self.date_lo)
            and (self.date_hi is None or ymd <= self.date_hi)
        ]
        # zero matching files still needs >= 1 partition for a valid scan
        return kept or [DumpFilePartition("", "")]

    def read(self, partition: DumpFilePartition):
        if not partition.path:
            return
        yield from _parse_dump_file(
            partition.path, partition.yyyymmdd, self.schema_struct.fields, self.mode
        )


def _parse_dump_file(path: str, yyyymmdd: str, fields, mode: str):
    """Executor-side TSV parse shared by the batch and stream readers."""
    dump_dt = datetime.strptime(yyyymmdd, "%Y%m%d").date()
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt", encoding="utf-8") as fh:
        header = fh.readline().rstrip("\n").split("\t")
        col_idx = {c: i for i, c in enumerate(header)}
        plan = []  # (header position | None for dump_date, field)
        for f in fields:
            if f.name == "dump_date":
                plan.append((None, f))
            elif f.name in col_idx:
                plan.append((col_idx[f.name], f))
            else:
                raise ValueError(
                    f"{path}: column {f.name!r} not in header {header}"
                )
        for lineno, line in enumerate(fh, start=2):
            cells = line.rstrip("\n").split("\t")
            if len(cells) != len(header) and mode == "failfast":
                raise ValueError(
                    f"{path}:{lineno}: expected {len(header)} "
                    f"cells, got {len(cells)}"
                )
            out = []
            for pos, f in plan:
                if pos is None:
                    out.append(dump_dt)
                    continue
                raw = cells[pos] if pos < len(cells) else ""
                try:
                    out.append(_coerce(raw, f.dataType))
                except ValueError:
                    if mode == "failfast":
                        raise ValueError(
                            f"{path}:{lineno}: cannot parse "
                            f"{raw!r} as {f.dataType.simpleString()}"
                        ) from None
                    out.append(None)
            yield tuple(out)


def _next_day(ymd: str) -> str:
    from datetime import timedelta

    return (datetime.strptime(ymd, "%Y%m%d") + timedelta(days=1)).strftime("%Y%m%d")


def _prev_day(ymd: str) -> str:
    from datetime import timedelta

    return (datetime.strptime(ymd, "%Y%m%d") - timedelta(days=1)).strftime("%Y%m%d")


class BlockchairDumpStreamReader(DataSourceStreamReader):
    """Streaming twin of the batch reader: the daily feed as an
    unbounded source.

    The offset is `{"last_date": "YYYYMMDD", "recent": {ymd: [names]}}`.
    ``last_date`` is the max dump date seen; ``recent`` pins the EXACT
    file basenames for the trailing ``backfill_horizon_days`` dates
    (default 3). Each micro-batch re-lists the landing dir (cheap: one
    readdir) and plans one partition per file; rows parse executor-side
    via the same `_parse_dump_file`.

    Why ``recent`` exists (round-5 advice): with a max-date-only offset,
    a file BACKFILLED into an already-committed date was silently never
    read (the batch reader would pick it up). Pinning the per-date file
    set makes such backfills first-class: the next batch plans exactly
    the names in ``end.recent`` minus ``start.recent``, so a late file
    within the horizon is read once, and replay of a committed batch
    re-reads the identical pinned set even if the directory has changed
    since. Dates older than the horizon keep the original date-range
    contract (immutable files, a date is complete once it ages out);
    a file appearing beyond the horizon is surfaced with a WARN and the
    ``skipped_late_files`` counter instead of being silently dropped.
    Offset size is bounded: horizon_days x files/day basenames."""

    def __init__(self, schema: StructType, options):
        self.schema_struct = schema
        self.mode = (options.get("mode") or "failfast").lower()
        self.root = options.get("path")
        if not self.root:
            raise ValueError("option 'path' (landing directory) is required")
        self.table = options.get("table")
        self.coin = options.get("coin")
        self.horizon_days = int(options.get("backfill_horizon_days") or 3)
        # Best-effort beyond-horizon late-file detection (in-memory per
        # reader; resets on restart — detection, not delivery).
        self._known_names: set[str] | None = None
        self.skipped_late_files = 0

    def _list(self) -> list[tuple[str, str]]:
        files = []
        for name in sorted(os.listdir(self.root)):
            parsed = parse_dump_filename(name)
            if not parsed:
                continue
            f_coin, f_type, ymd = parsed
            if self.table and f_type != self.table:
                continue
            if self.coin and f_coin != self.coin:
                continue
            files.append((os.path.join(self.root, name), ymd))
        return files

    def _horizon_floor(self, last_date: str) -> str:
        """Dates STRICTLY greater than this are pinned in the offset."""
        if last_date == "00000000":
            return "00000000"
        from datetime import timedelta

        d = datetime.strptime(last_date, "%Y%m%d") - timedelta(days=self.horizon_days)
        return d.strftime("%Y%m%d")

    def initialOffset(self) -> dict:
        return {"last_date": "00000000", "recent": {}}

    def latestOffset(self) -> dict:
        files = self._list()
        latest = max((ymd for _, ymd in files), default="00000000")
        floor = self._horizon_floor(latest)
        recent: dict[str, list[str]] = {}
        for path, ymd in files:
            if ymd > floor:
                recent.setdefault(ymd, []).append(os.path.basename(path))
        return {"last_date": latest, "recent": {d: sorted(n) for d, n in recent.items()}}

    def partitions(self, start: dict, end: dict):
        end_recent: dict[str, list[str]] = end.get("recent") or {}
        # Legacy checkpoint (max-date-only offset): fall back to the
        # date-range contract for this one transition — re-planning
        # already-read horizon dates from end.recent would duplicate.
        start_has_recent = isinstance(start.get("recent"), dict)
        start_recent: dict[str, list[str]] = start.get("recent") or {}
        kept: list[DumpFilePartition] = []
        # 1) horizon dates: plan exactly the pinned names new vs start —
        #    this is what picks up a file BACKFILLED into a committed
        #    date, and what makes replay byte-identical even if the
        #    directory changed after the offset was committed.
        for ymd in sorted(end_recent):
            prior = set(start_recent.get(ymd, []))
            if not start_has_recent and ymd <= start["last_date"]:
                continue
            for name in end_recent[ymd]:
                if name not in prior:
                    kept.append(DumpFilePartition(os.path.join(self.root, name), ymd))
        # 2) beyond-horizon dates inside (start, end]: the original
        #    date-range listing (a date is complete once it ages out of
        #    the horizon; files are immutable).
        end_floor = self._horizon_floor(end["last_date"])
        listed = self._list()
        for path, ymd in listed:
            if start["last_date"] < ymd <= end["last_date"] and ymd <= end_floor:
                kept.append(DumpFilePartition(path, ymd))
        # 3) best-effort detection of files arriving BEYOND the horizon
        #    of an already-committed range: too late to deliver under
        #    the offset contract, so surface loudly instead of silently
        #    dropping (round-5 advice).
        if self._known_names is None:
            self._known_names = {os.path.basename(p) for p, _ in listed}
        else:
            # Undeliverable = inside the END offset's completed range
            # (ymd <= end_floor) yet not planned by steps 1-2 of THIS
            # batch. Checking against start's horizon (pre-r7) missed
            # files backfilled into a date that ages out of the horizon
            # within the same transition (start_floor < ymd <=
            # end_floor but ymd <= start.last_date): neither planned
            # nor warned that batch — only warned on a LATER
            # partitions() call, or never if the stream stopped first.
            # A new file with ymd > end_floor is fine: the next
            # latestOffset pins it in `recent` and the next batch's
            # name-diff plans it.
            planned = {os.path.basename(p.path) for p in kept}
            for path, ymd in listed:
                name = os.path.basename(path)
                if name not in self._known_names:
                    self._known_names.add(name)
                    if ymd <= end_floor and name not in planned:
                        self.skipped_late_files += 1
                        import warnings

                        warnings.warn(
                            f"blockchair_dump stream: {name} arrived for "
                            f"date {ymd}, beyond the {self.horizon_days}-day "
                            f"backfill horizon of committed offset "
                            f"{start['last_date']} — NOT read; widen "
                            f"backfill_horizon_days or backfill via the "
                            f"batch reader (skipped_late_files="
                            f"{self.skipped_late_files})",
                            stacklevel=2,
                        )
        return kept or [DumpFilePartition("", "")]

    def read(self, partition: DumpFilePartition):
        if not partition.path:
            return
        yield from _parse_dump_file(
            partition.path, partition.yyyymmdd, self.schema_struct.fields, self.mode
        )

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint log; files are immutable


class BlockchairDumpDataSource(DataSource):
    """``format("blockchair_dump")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "blockchair_dump"

    def schema(self):
        ddl = self.options.get("schema_ddl")
        if not ddl:
            raise ValueError(
                "option 'schema_ddl' is required (explicit schema keeps the "
                "scan single-pass, same contract as read_tsv); include "
                "'dump_date date' to surface the per-file date column"
            )
        return ddl

    def reader(self, schema: StructType) -> BlockchairDumpReader:
        return BlockchairDumpReader(schema, self.options)

    def streamReader(self, schema: StructType) -> BlockchairDumpStreamReader:
        return BlockchairDumpStreamReader(schema, self.options)


def register_dump_source(spark) -> None:
    """Register the format and enable Python-source filter pushdown
    (off by default; runtime-settable, so a vanilla session works —
    same self-applied-conf contract as session.prepare_session)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(BlockchairDumpDataSource)
