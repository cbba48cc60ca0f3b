"""Spark 4 Python DataSource for the CRZ daily-dump drop directory.

The reference's stage 0 (`00_download_CRZ_DB.py:179-220`) enumerates a date
range, downloads one zip per day, and unzips it next to the previous days;
stage 1 then parses whatever is on disk. This source makes that layout a
first-class `spark.read.format("crz_dump")` table:

- one input partition per daily file → file-level **date-range pruning**
  (options `start_date`/`end_date` replace the reference's 130-line
  calendar clamp, S9) and natural task parallelism across days;
- reads the dumps **as the reference stores them** — `.zip` archives with
  the XML inside — which the built-in XML source cannot (it needs the
  files pre-extracted; codecs cover gzip, not zip archives);
- lxml-`recover=True` semantics (S2): an unparseable file yields one row
  with the error in `_corrupt_record` instead of failing the scan, and a
  `dump_date` column carries the file's date partition key.

This is the supported engine-extension surface for "a source Spark lacks"
— pure Python, registered per-session, executors receive pickled reader
instances; no JVM code. The nested attachment links survive as a proper
`array<string>` column. At 100 TB (decades × daily files) `partitions()`
returns thousands of file splits; pruning happens before any task launches.

Schema mirrors the flat 22-column contracts table of `01_parse_xml.py:202`
(FIXTURES.md §B1); heavy nested supplements stay with the native-XML reader
(`sources/xml.py`) — both sources feed the same stage-2 filter chain.
"""

from __future__ import annotations

import datetime as _dt
import io
import os
import re
import zipfile
import xml.etree.ElementTree as ET

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

_SCALAR_FIELDS = [
    "nazov", "id", "inner_id",
    "objednavatel_ico", "objednavatel", "objednavatel_adresa",
    "dodavatel_ico", "dodavatel", "dodavatel_adresa",
    "datum_zverejnenia", "datum_podpisu", "datum_platnosti",
    "datum_ucinnosti", "posledna_zmena",
    "cena_konecna", "cena_podpisana", "rezort", "typ", "stav",
]

DUMP_SCHEMA = (
    ", ".join(f"{f} string" for f in _SCALAR_FIELDS)
    + ", prilohy_odkazy array<string>, n_prilohy int"
    + ", dump_date date, _corrupt_record string"
)

_DATE_RE = re.compile(r"(\d{4}-\d{2}-\d{2})")


class DumpFilePartition(InputPartition):
    def __init__(self, path: str, dump_date: _dt.date):
        self.path = path
        self.dump_date = dump_date


def _parse_contracts(xml_bytes: bytes, dump_date: _dt.date):
    """One daily dump's bytes → row tuples (ElementTree; a ParseError is
    surfaced as one corrupt-record row, cf. `01_parse_xml.py:18-21`)."""
    try:
        root = ET.fromstring(xml_bytes)
    except ET.ParseError as exc:
        yield tuple(
            [None] * len(_SCALAR_FIELDS) + [None, None, dump_date, str(exc)]
        )
        return
    contracts = (
        [root] if root.tag == "contract" else root.iter("contract")
    )
    for c in contracts:
        row = [
            (c.findtext(f) or None) for f in _SCALAR_FIELDS
        ]
        links = [
            a.findtext("odkaz")
            for a in c.findall("./prilohy/priloha")
            if a.findtext("odkaz") is not None
        ]
        yield tuple(row + [links, len(links), dump_date, None])


class CRZDumpReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("crz_dump: 'path' option (or load(path)) required")
        self.start = options.get("start_date")
        self.end = options.get("end_date")

    def partitions(self):
        parts = []
        for name in sorted(os.listdir(self.path)):
            if not name.endswith((".xml", ".zip")):
                continue
            m = _DATE_RE.search(name)
            if not m:
                continue
            day = m.group(1)
            # S9 date clamp as partition pruning: out-of-range files are
            # never opened and never become tasks.
            if (self.start and day < self.start) or (self.end and day > self.end):
                continue
            parts.append(
                DumpFilePartition(
                    os.path.join(self.path, name), _dt.date.fromisoformat(day)
                )
            )
        return parts

    def read(self, partition: DumpFilePartition):
        # The reference stores each day as a zip archive with the XML inside
        # (00_download_CRZ_DB.py:201-216) — _read_dump_file opens members
        # in-process; no pre-extraction step.
        yield from _read_dump_file(partition.path, partition.dump_date)


def _read_dump_file(path: str, dump_date: _dt.date):
    if path.endswith(".zip"):
        with zipfile.ZipFile(path) as zf:
            for member in zf.namelist():
                if member.endswith(".xml"):
                    with zf.open(member) as fh:
                        yield from _parse_contracts(fh.read(), dump_date)
    else:
        with io.open(path, "rb") as fh:
            yield from _parse_contracts(fh.read(), dump_date)


class CRZDumpStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the drop-dir source: each new daily file is a
    micro-batch (the reference's re-run-for-new-dates loop,
    `00_download_CRZ_DB.py:47-117`, with the checkpoint replacing its
    manual date bookkeeping). The offset is the lexicographically-last
    consumed filename — date-named files make name order = date order —
    so restart/replay (`readBetweenOffsets`) is exact: the files in
    (start, end] are re-parsed deterministically."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("crz_dump: 'path' option (or load(path)) required")
        self.start_date = options.get("start_date")
        self.end_date = options.get("end_date")

    def _eligible(self) -> list[str]:
        out = []
        for name in sorted(os.listdir(self.path)):
            if not name.endswith((".xml", ".zip")):
                continue
            m = _DATE_RE.search(name)
            if not m:
                continue
            day = m.group(1)
            if (self.start_date and day < self.start_date) or (
                self.end_date and day > self.end_date
            ):
                continue
            out.append(name)
        return out

    def initialOffset(self) -> dict:
        return {"last": ""}

    def _rows_for(self, names: list[str]):
        # Materialized list behind an iterator — the simple-stream harness
        # requires the iterator protocol AND pickles the batch for its
        # prefetch cache (a list_iterator pickles; a generator does not).
        # A daily dump is bounded, so per-micro-batch materialization is
        # the intended tradeoff of the "simple" reader API.
        rows: list[tuple] = []
        for name in names:
            day = _dt.date.fromisoformat(_DATE_RE.search(name).group(1))
            rows.extend(_read_dump_file(os.path.join(self.path, name), day))
        return iter(rows)

    def read(self, start: dict):
        names = [n for n in self._eligible() if n > start.get("last", "")]
        end = {"last": names[-1]} if names else dict(start)
        return self._rows_for(names), end

    def readBetweenOffsets(self, start: dict, end: dict):
        lo, hi = start.get("last", ""), end.get("last", "")
        return self._rows_for(
            [n for n in self._eligible() if lo < n <= hi]
        )


class CRZDumpDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "crz_dump"

    def schema(self) -> str:
        return DUMP_SCHEMA

    def reader(self, schema) -> CRZDumpReader:
        return CRZDumpReader(self.options)

    def simpleStreamReader(self, schema) -> CRZDumpStreamReader:
        return CRZDumpStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> "CRZDumpWriter":
        return CRZDumpWriter(self.options, schema, overwrite)


def register(spark) -> None:
    """Register the format for this session: `spark.read.format("crz_dump")`."""
    spark.dataSource.register(CRZDumpDataSource)


class DumpCommit(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


class CRZDumpWriter(DataSourceWriter):
    """Batch writer: pipe-delimited CSV, one part file per task, with a
    driver-side manifest commit — the S7 sink (`to_csv(sep='|')`,
    `01_parse_xml.py:208` etc.) as a proper two-phase distributed write.

    Tasks write `part-<uuid>.csv` directly (names are unique, so a retry
    never clobbers another task's file) and return (filename, n_rows);
    only `commit()` — which runs once, on the driver, after every task
    succeeded — writes the `_MANIFEST` naming the committed files. A
    failed/speculated task's orphan file is ignored by any manifest-aware
    reader and removed by `abort()`. This is the same visibility contract
    a Hadoop committer gives parquet at 100 TB: readers see all-or-nothing.
    """

    def __init__(self, options: dict, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("crz_dump writer requires a path")
        self.field_names = [f.name for f in schema.fields]
        self.overwrite = overwrite

    def write(self, iterator) -> DumpCommit:
        import csv
        import uuid as _uuid

        os.makedirs(self.path, exist_ok=True)
        name = f"part-{_uuid.uuid4().hex}.csv"
        n = 0
        with open(os.path.join(self.path, name), "w", newline="") as fh:
            w = csv.writer(fh, delimiter="|")
            w.writerow(self.field_names)
            for row in iterator:
                w.writerow(["" if v is None else v for v in row])
                n += 1
        return DumpCommit(name, n)

    def commit(self, messages) -> None:
        committed = {m.filename for m in messages}
        if self.overwrite:
            # mode("overwrite") must not leave stale part files from prior
            # writes visible to non-manifest-aware readers (plain
            # spark.read.csv globs the directory): delete every part file
            # the new manifest does not name. Runs once, on the driver,
            # after all tasks succeeded — same all-or-nothing window as the
            # manifest write itself.
            for name in os.listdir(self.path):
                if name.startswith("part-") and name not in committed:
                    try:
                        os.remove(os.path.join(self.path, name))
                    except OSError:
                        pass
        manifest = os.path.join(self.path, "_MANIFEST")
        with open(manifest, "w") as fh:
            for m in messages:
                fh.write(f"{m.filename}\t{m.n_rows}\n")

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass
