"""Source/sink surface beyond the native parquet path (SURVEY §2.1).

The reference reads Excel/CSV with inferred schemas and writes Excel
workbooks (S1–S5, ``preprocessing.py:303,531``, ``BERTopic_Analysis.py:
136-138``). The engine's equivalents, Spark-first:

- CSV scan with an EXPLICIT schema + permissive/coerce nulling — the
  distributed analogue of ``pd.read_csv`` + ``errors='coerce'`` (bad cells
  become null, then ``na.drop`` downstream, SURVEY §1.3);
- text-lines scan for the stopword file (S3): one term per line, trimmed,
  blanks dropped — returned as a plain tuple for broadcasting into array
  expressions (the reference's ``set[str]``, ``preprocessing.py:82-86``);
- parquet sinks, partitioned — the native output path; partition columns
  give free partition pruning to every downstream reader;
- CSV sink for interchange;
- Excel export shim (S4/S5): DRIVER-side only, over already-collected
  small report tables, gated behind an import-try (openpyxl is not a
  runtime dependency of the engine);
- ML model persistence (S8): thin wrappers over ``Model.write().save()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

CSV_OPTIONS = {
    "header": "true",
    "encoding": "UTF-8",
    "mode": "PERMISSIVE",  # malformed cells -> null, like errors='coerce'
}


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """CSV scan (S2) with an explicit schema. No ``inferSchema`` — a 100 TB
    CSV would be scanned twice just to guess types the caller already
    knows; the explicit schema also makes malformed-value coercion
    deterministic."""
    reader = spark.read.schema(schema)
    for k, v in CSV_OPTIONS.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """CSV sink. ``single_file`` coalesces to one partition — only for
    small report tables; large outputs keep their partitioning."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", "true").csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSON-lines scan — the de-facto interchange format of crawl and
    training-data pipelines (one JSON object per line; what a CommonCrawl
    WET post-processor or an annotation vendor actually delivers).

    Explicit schema, like ``read_csv``: inference would scan the data
    twice to guess types the caller already knows. PERMISSIVE mode with
    a named corrupt-record column: a malformed line lands with its RAW
    text in ``corrupt_col`` and nulls elsewhere, so ingest can
    quarantine (filter + sink the corrupt rows) instead of silently
    dropping them — at 100 TB a tenth of a percent of bad lines is
    millions of documents someone must be able to audit. Spark caveat,
    handled here: the corrupt column must be part of the read schema,
    and a query referencing ONLY that column is rejected by Spark
    (internal raw-record pushdown), so quarantine filters should also
    touch a data column or cache first."""
    if corrupt_col not in schema.fieldNames():
        from pyspark.sql.types import StringType, StructField

        schema = StructType(
            list(schema.fields) + [StructField(corrupt_col, StringType())]
        )
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def write_jsonl(df: DataFrame, path: str, single_file: bool = False) -> None:
    """JSON-lines sink (interchange with non-Spark consumers). Large
    outputs keep their partitioning; ``single_file`` is for small report
    tables only."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(path)


def read_stopwords(spark: SparkSession, path: str) -> tuple[str, ...]:
    """Text-lines stopword source (S3): one term per line, strip, drop
    blanks (``preprocessing.py:82-86``). Collected to the driver (the
    reference file is ~1,380 lines; even a million-term lexicon is MBs)
    and returned as a tuple ready for ``F.lit``-array broadcast or
    ``StopWordsRemover.stopWords``."""
    lines = spark.read.text(path)
    rows = (
        lines.select(F.trim("value").alias("w"))
        .filter(F.col("w") != "")
        .collect()
    )
    return tuple(r["w"] for r in rows)


def write_parquet(
    df: DataFrame, path: str, partition_by: tuple[str, ...] = ()
) -> None:
    """Parquet sink, optionally hive-partitioned. Partition columns become
    directories ⇒ any downstream filter on them prunes whole files before
    a single row is read."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def export_excel(tables: dict[str, "object"], path: str) -> bool:
    """Multi-sheet Excel export (S5, ``preprocessing.py:552-569``) —
    DRIVER-side, for small collected report tables (pandas DataFrames).
    Dependency-free since round 3: written via the same stdlib zip+XML
    machinery ``read_xlsx`` parses, so the Excel round-trip works in a
    bare container (VERDICT r2 item 8). Always returns True (kept
    boolean for source compatibility with the formerly gated shim)."""
    import pandas as pd

    sheets = {}
    for sheet, pdf in tables.items():
        assert isinstance(pdf, pd.DataFrame)
        name = sheet[:31]  # Excel's hard sheet-name limit
        if name in sheets:
            raise ValueError(
                f"sheet name collision after Excel's 31-char truncation: "
                f"{sheet!r} -> {name!r} already used; rename the sheets"
            )
        sheets[name] = [list(pdf.columns)] + pdf.values.tolist()
    write_xlsx(sheets, path)
    return True


_XLSX_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_REL_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_PKG_REL_NS = "http://schemas.openxmlformats.org/package/2006/relationships"


def _col_letter(i: int) -> str:
    """0-based column index → Excel letters (A, B, … Z, AA …)."""
    s = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        s = chr(ord("A") + r) + s
    return s


def write_xlsx(sheets: dict[str, list[list]], path: str) -> None:
    """Dependency-free multi-sheet xlsx sink (SURVEY S5): an xlsx is a zip
    of XML parts, all writable with the stdlib. Strings go as inline
    strings (no sharedStrings table — the reader handles both), numbers as
    native values, None/NaN cells are omitted. Each ``sheets`` value is a
    list of rows (first row = header by convention)."""
    import zipfile
    from xml.sax.saxutils import escape

    def cell_xml(ref: str, v) -> str:
        if v is None:
            return ""
        if isinstance(v, float) and v != v:  # NaN
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v!r}</v></c>'
        return (
            f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
            f"{escape(str(v))}</t></is></c>"
        )

    names = [n[:31] or f"Sheet{i + 1}" for i, n in enumerate(sheets)]
    if len(set(names)) != len(names):
        raise ValueError(
            "duplicate sheet names after Excel's 31-char truncation: "
            f"{names!r} — Excel rejects workbooks with repeated names"
        )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        overrides = "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
            for i in range(len(names))
        )
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/'
            'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            f"{overrides}</Types>",
        )
        z.writestr(
            "_rels/.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<Relationships xmlns="{_PKG_REL_NS}">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
            'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>",
        )
        sheet_tags = "".join(
            f'<sheet name="{escape(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, n in enumerate(names)
        )
        z.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<workbook xmlns="{_XLSX_NS}" xmlns:r="{_REL_NS}">'
            f"<sheets>{sheet_tags}</sheets></workbook>",
        )
        rels = "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats'
            '.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<Relationships xmlns="{_PKG_REL_NS}">{rels}</Relationships>',
        )
        for i, rows in enumerate(sheets.values()):
            body = []
            for ri, row in enumerate(rows):
                cells = "".join(
                    cell_xml(f"{_col_letter(ci)}{ri + 1}", v)
                    for ci, v in enumerate(row)
                )
                body.append(f'<row r="{ri + 1}">{cells}</row>')
            z.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                f'<worksheet xmlns="{_XLSX_NS}">'
                f'<sheetData>{"".join(body)}</sheetData></worksheet>',
            )


def save_model(model, path: str) -> None:
    """Model persistence (S8): ``LDA_Analysis.py:281-284`` /
    ``BERTopic_Analysis.py:1022-1037`` → ``ml.Model.write().save()``."""
    model.write().overwrite().save(path)


def load_model(model_cls, path: str):
    return model_cls.load(path)


def read_xlsx(spark: SparkSession, path: str, sheet: int = 1) -> DataFrame:
    """Excel scan (SURVEY S1) without any optional dependency: xlsx is a
    zip of XML, and the two storage modes pandas would read (sharedStrings
    and inline strings) parse with the stdlib. First row = header; every
    value surfaces as a string column (the engine's explicit-cast stance —
    the reference relies on pandas inference, ``preprocessing.py:303``).

    Driver-side parse by design: Excel is an ingest/export edge format for
    human-sized workbooks, not a 100 TB columnar source — the first thing a
    real pipeline does is land it in Parquet (``write_parquet``)."""
    import zipfile

    z = zipfile.ZipFile(path)
    rows = _xlsx_sheet_cells(z, _resolve_sheet_part(z, sheet))
    if not rows:
        raise ValueError(f"empty worksheet in {path}")
    header_cells, data = rows[0], rows[1:]
    cols, names = _xlsx_columns(header_cells, data)
    return spark.createDataFrame(
        [tuple(r.get(c) for c in cols) for r in data], names
    )


def _xlsx_sheet_cells(z, part: str) -> list[dict[str, str | None]]:
    """Parse one worksheet part into per-row {column-letter: value} dicts
    (sharedStrings and inlineStr storage both supported). The shared parse
    core of ``read_xlsx`` (driver-side) and the registered ``xlsx``
    Python DataSource (executor-side)."""
    import re
    from xml.etree import ElementTree as ET

    m = "{" + _XLSX_NS + "}"
    shared: list[str] = []
    if "xl/sharedStrings.xml" in z.namelist():
        for si in ET.fromstring(z.read("xl/sharedStrings.xml")).iter(m + "si"):
            shared.append("".join(t.text or "" for t in si.iter(m + "t")))
    root = ET.fromstring(z.read(part))
    rows: list[dict[str, str | None]] = []
    for row in root.iter(m + "row"):
        cells: dict[str, str | None] = {}
        for c in row.findall(m + "c"):
            col = re.match(r"[A-Z]+", c.get("r", "A")).group(0)
            t = c.get("t")
            if t == "inlineStr":
                val: str | None = "".join(
                    tt.text or "" for tt in c.iter(m + "t")
                )
            else:
                v = c.find(m + "v")
                val = None if v is None else (
                    shared[int(v.text)] if t == "s" else v.text
                )
            cells[col] = val
        rows.append(cells)
    return rows


def _xlsx_columns(
    header_cells: dict[str, str | None], data: list[dict[str, str | None]]
) -> tuple[list[str], list[str]]:
    """(column letters, surfaced names) for a parsed sheet. Column set =
    union over ALL rows, not just the header: a data cell in a column with
    a blank header must surface (named by its letter), not silently drop."""
    all_cols: set[str] = set(header_cells)
    for r in data:
        all_cols.update(r)
    cols = sorted(all_cols, key=lambda c: (len(c), c))
    names = [header_cells.get(c) or c for c in cols]
    return cols, names


def _xlsx_sheets(z) -> list[tuple[str, str]]:
    """(display name, worksheet part) for every sheet, in workbook order,
    resolved through ``xl/workbook.xml``'s sheet list and its relationship
    targets instead of assuming parts are named ``sheet{n}.xml`` — writers
    are free to number parts arbitrarily. Falls back to the physical names
    for minimal zips without rels."""
    from xml.etree import ElementTree as ET

    m = "{" + _XLSX_NS + "}"
    rns = "{" + _REL_NS + "}"
    pr = "{" + _PKG_REL_NS + "}"
    try:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        targets = {
            r.get("Id"): r.get("Target") for r in rels.iter(pr + "Relationship")
        }
        out: list[tuple[str, str]] = []
        for i, sh in enumerate(wb.iter(m + "sheet")):
            target = targets[sh.get(rns + "id")]
            if target.startswith("/"):  # package-absolute target
                part = target.lstrip("/")
            else:
                part = target if target.startswith("xl/") else "xl/" + target
            out.append((sh.get("name") or f"Sheet{i + 1}", part))
        if not out:
            raise KeyError("no sheets")
        return out
    except (KeyError, IndexError, StopIteration, ET.ParseError):
        import re

        def sheet_no(name: str) -> tuple[int, str]:
            # numeric sort, NOT lexicographic: sheet10.xml must follow
            # sheet9.xml, or `sheet=2` on a rels-less 10+-sheet workbook
            # would resolve sheet10.xml (r5 review)
            m2 = re.search(r"sheet(\d+)\.xml$", name)
            return (int(m2.group(1)) if m2 else 1 << 30, name)

        return [
            (n.rsplit("/", 1)[-1].removesuffix(".xml"), n)
            for n in sorted(z.namelist(), key=sheet_no)
            if n.startswith("xl/worksheets/sheet") and n.endswith(".xml")
        ]


def _resolve_sheet_part(z, sheet: int) -> str:
    """Worksheet part of the n-th sheet (1-based, workbook order)."""
    try:
        return _xlsx_sheets(z)[sheet - 1][1]
    except IndexError:
        return f"xl/worksheets/sheet{sheet}.xml"
