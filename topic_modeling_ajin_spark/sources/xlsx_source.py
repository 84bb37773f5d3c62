"""Registered ``xlsx`` connector via Spark 4's public Python DataSource API.

``read_xlsx`` (``io.py``) is a deliberate driver-side parse for human-sized
single workbooks; this module lifts the SAME parse core into a first-class
``spark.read.format("xlsx")`` source so workbook parsing runs in EXECUTOR
Python workers — one input partition per worksheet, so a many-sheet export
(the reference's multi-sheet results workbooks, ``preprocessing.py:561-607``)
parses in parallel and composes with every downstream DataFrame operator.

Usage:
    spark.dataSource.register(XlsxDataSource)
    df = spark.read.format("xlsx").load("/path/wb.xlsx")            # sheet 1
    df = spark.read.format("xlsx").option("sheet", "2").load(p)     # n-th
    df = spark.read.format("xlsx").option("sheets", "all").load(p)  # union

All values surface as strings (the engine's explicit-cast stance); in
``sheets=all`` mode the union schema is by header name (first sheet wins on
order) with a leading ``_sheet`` column carrying the sheet display name.
"""

from __future__ import annotations

import zipfile
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StringType, StructField, StructType

from .io import _resolve_sheet_part, _xlsx_columns, _xlsx_sheet_cells, _xlsx_sheets

_SHEET_COL = "_sheet"


def _sheet_schema_names(z: zipfile.ZipFile, part: str) -> list[str]:
    rows = _xlsx_sheet_cells(z, part)
    if not rows:
        return []
    _, names = _xlsx_columns(rows[0], rows[1:])
    return names


class XlsxDataSource(DataSource):
    """``format("xlsx")``: options ``path`` (required), ``sheet`` (1-based
    index, default 1) or ``sheets="all"``."""

    @classmethod
    def name(cls) -> str:
        return "xlsx"

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("xlsx source requires a path: .load('/file.xlsx')")
        return path

    def schema(self) -> StructType:
        # driver-side planning parse: the union-over-ALL-rows column rule
        # (a data cell under a blank header must surface) means schema
        # inference walks every row once on the driver; executors then
        # re-parse only their own sheet. Acceptable for the human-sized
        # workbooks xlsx is for — pass an explicit .schema(...) to skip
        # the planning parse entirely
        with zipfile.ZipFile(self._path()) as z:
            if self.options.get("sheets", "").lower() == "all":
                fields = [StructField(_SHEET_COL, StringType())]
                seen = {_SHEET_COL}
                for _, part in _xlsx_sheets(z):
                    for n in _sheet_schema_names(z, part):
                        if n not in seen:
                            seen.add(n)
                            fields.append(StructField(n, StringType()))
                return StructType(fields)
            sheet = int(self.options.get("sheet", "1"))
            names = _sheet_schema_names(z, _resolve_sheet_part(z, sheet))
            if not names:
                raise ValueError(f"empty worksheet in {self._path()}")
            if len(set(names)) != len(names):
                # Arrow refuses duplicate field names on the DataSource
                # read path (batch/schema mismatch at VectorLoader), and
                # name-keyed row assembly would silently serve the first
                # column's values for every duplicate — fail at PLANNING
                # with the workaround named (r5 review)
                raise ValueError(
                    f"duplicate header names {sorted(names)} in "
                    f"{self._path()} — rename the columns, or use "
                    "sources.io.read_xlsx (positional, supports "
                    "duplicate headers)"
                )
            return StructType([StructField(n, StringType()) for n in names])

    def reader(self, schema: StructType) -> "XlsxReader":
        return XlsxReader(self._path(), self.options, schema)


class XlsxReader(DataSourceReader):
    def __init__(self, path: str, options, schema: StructType) -> None:
        self.path = path
        self.all_sheets = options.get("sheets", "").lower() == "all"
        self.sheet = int(options.get("sheet", "1"))
        self.field_names = [f.name for f in schema.fields]

    def partitions(self) -> list[InputPartition]:
        # one partition per worksheet: sheets parse independently, so a
        # many-sheet workbook fans out across executor Python workers
        with zipfile.ZipFile(self.path) as z:
            if self.all_sheets:
                return [InputPartition((name, part)) for name, part in _xlsx_sheets(z)]
            part = _resolve_sheet_part(z, self.sheet)
        return [InputPartition((None, part))]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        sheet_name, part = partition.value
        with zipfile.ZipFile(self.path) as z:
            rows = _xlsx_sheet_cells(z, part)
        if not rows:
            return
        header, data = rows[0], rows[1:]
        cols, names = _xlsx_columns(header, data)
        if not self.all_sheets and names == self.field_names:
            # single-sheet: the schema was built positionally from this
            # very sheet, so align by POSITION — name-keyed mapping would
            # collapse duplicate headers onto the first column and
            # diverge from read_xlsx (r5 review)
            for r in data:
                yield tuple(r.get(c) for c in cols)
            return
        # sheets=all (or a sheet whose shape changed since planning):
        # align by header name; within one sheet a duplicated header
        # serves its FIRST column (the union schema has one field per
        # name by construction)
        by_name: dict[str, str] = {}
        for col, name in zip(cols, names):
            by_name.setdefault(name, col)
        want = self.field_names
        for r in data:
            out = []
            for f in want:
                if f == _SHEET_COL and self.all_sheets:
                    out.append(sheet_name)
                else:
                    letter = by_name.get(f)
                    out.append(None if letter is None else r.get(letter))
            yield tuple(out)
