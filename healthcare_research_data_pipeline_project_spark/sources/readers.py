"""Ingestion readers — parity with the reference's declared source
formats (`healthcare-data-pipeline-main.py:139`: csv, json, hl7, fhir;
S1 JDBC ingest `:141-166`; S3 parquet deps).

csv/json/parquet are native Spark sources (pushdown + pruning for
free). HL7 v2 is pipe/caret-delimited text — parsed entirely with
Catalyst string expressions (no Python UDF, no external hl7 lib).
FHIR bundles are JSON — `spark.read.json` + nested-field projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    reader = spark.read.option("header", "true")
    if schema is None:
        reader = reader.option("inferSchema", "true")
    else:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    query: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **options: str,
) -> DataFrame:
    """Epic-Clarity-style SQL ingest (`ingest_epic_clarity`, reference
    `:141-166`) → Spark JDBC source. The reference pulls the full
    result set into one pandas frame; here the read itself is
    partitioned (predicate-ranged parallel scans) when a numeric
    partition column is supplied — the 100 TB-safe shape.

    Spark's JDBC source rejects `query` together with
    `partitionColumn`, so the partitioned path wraps the query as a
    derived table under `dbtable` (the documented equivalent)."""
    reader = spark.read.format("jdbc").option("url", url)
    if partition_column is not None:
        reader = (
            reader.option("dbtable", f"({query}) spark_q")
            .option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    else:
        reader = reader.option("query", query)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


# ---------------------------------------------------------------------------
# HL7 v2 (pipe-delimited segments), pure-expression parser
# ---------------------------------------------------------------------------
def read_hl7(spark: SparkSession, path: str) -> DataFrame:
    """Parse HL7 v2 messages from text files: one message per line
    group separated by MSH segments is out of scope for flat files —
    this reader expects one segment per line (the common line-oriented
    export) and returns (segment_type, fields array) rows plus typed
    projections for MSH/PID/OBX, entirely JVM-side."""
    lines = spark.read.text(path).withColumnRenamed("value", "raw")
    seg = lines.select(
        F.split("raw", r"\|").alias("f"),
        F.col("raw"),
    ).select(
        F.col("f")[0].alias("segment_type"),
        F.col("f").alias("fields"),
        "raw",
    )
    return seg


def hl7_patients(segments: DataFrame) -> DataFrame:
    """PID segments → typed patient rows (PID-3 id, PID-5 name
    components split on '^', PID-7 DOB, PID-8 gender)."""
    pid = segments.filter(F.col("segment_type") == "PID")
    name = F.split(F.col("fields")[5], r"\^")
    return pid.select(
        F.col("fields")[3].alias("patient_id"),
        name[0].alias("family_name"),
        name[1].alias("given_name"),
        F.to_date(F.col("fields")[7], "yyyyMMdd").alias("birth_date"),
        F.col("fields")[8].alias("gender"),
    )


def hl7_observations(segments: DataFrame) -> DataFrame:
    """OBX segments → typed observation rows (OBX-3 code^name, OBX-5
    value, OBX-6 units, OBX-8 abnormal flag)."""
    obx = segments.filter(F.col("segment_type") == "OBX")
    code = F.split(F.col("fields")[3], r"\^")
    return obx.select(
        code[0].alias("obs_code"),
        code[1].alias("obs_name"),
        F.col("fields")[5].cast("double").alias("obs_value"),
        F.col("fields")[6].alias("obs_units"),
        F.col("fields")[8].alias("abnormal_flag"),
    )


# ---------------------------------------------------------------------------
# FHIR (JSON bundles)
# ---------------------------------------------------------------------------
def read_fhir_bundle(spark: SparkSession, path: str) -> DataFrame:
    """FHIR Bundle JSON → one row per entry resource. Schema inference
    handles arbitrary resource shapes; callers project the resource
    types they need (see `fhir_patients`)."""
    bundles = spark.read.option("multiLine", "true").json(path)
    return bundles.select(F.explode("entry").alias("entry")).select("entry.resource.*")


def fhir_patients(resources: DataFrame) -> DataFrame:
    """Patient resources → flat rows (id, name, gender, birthDate)."""
    p = resources.filter(F.col("resourceType") == "Patient")
    return p.select(
        F.col("id").alias("patient_id"),
        F.col("name")[0]["family"].alias("family_name"),
        F.col("name")[0]["given"][0].alias("given_name"),
        F.col("gender").alias("gender"),
        F.to_date("birthDate").alias("birth_date"),
    )


# ---------------------------------------------------------------------------
# Columnar + raw-corpus sources (beyond the reference's csv/json/hl7/
# fhir): ORC as the second native columnar interchange format, line
# text for raw document corpora, and binaryFile for multimodal blobs
# (image/audio payloads enter as whole-file binary rows that feed
# multimodal/binary_ops; files > maxPartitionBytes are NOT split, so
# at 100 TB the blob store should hold many medium files, not few
# giant ones).
# ---------------------------------------------------------------------------
def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Native ORC scan — same pushdown/pruning guarantees as parquet."""
    return spark.read.orc(path)


def read_text(spark: SparkSession, path: str, wholetext: bool = False) -> DataFrame:
    """Line-per-row text corpus (`value` column); `wholetext=True`
    yields one row per file (document-per-file corpora). NB: must go
    through the .text(wholetext=) kwarg — the pyspark wrapper passes
    its own default which silently overrides .option("wholetext")."""
    return spark.read.text(path, wholetext=wholetext)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Whole-file binary rows: (path, modificationTime, length, content)
    — the ingestion edge for image/audio/video blobs. Pair with
    multimodal.binary_ops for decode/feature plumbing."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


# ---------------------------------------------------------------------------
# Excel ingestion (reference dep surface: openpyxl/fastparquet,
# healthcare-pipeline-requirements.txt:19-21; SURVEY S3). Excel files
# are driver-side small ingest by nature (the reference reads them into
# one pandas frame too) — the Spark frame they become is what scales.
# ---------------------------------------------------------------------------
def _read_xlsx_stdlib(path: str, sheet: str | None = None) -> "tuple[list, list]":
    """Minimal .xlsx parser (zip of XML, stdlib only): returns
    (header, rows). Handles shared strings, inline strings, and
    numbers — the shapes a tabular export produces. Used when
    pandas has no Excel engine installed (openpyxl absent)."""
    import re as _re
    import zipfile
    from xml.etree import ElementTree as ET

    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall("m:si", ns):
                shared.append("".join(t.text or "" for t in si.iter(
                    "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}t")))
        # resolve sheet name → sheetN.xml via workbook order (first by default)
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        names = [s.get("name") for s in wb.find("m:sheets", ns)]
        idx = names.index(sheet) + 1 if sheet is not None else 1
        body = ET.fromstring(z.read(f"xl/worksheets/sheet{idx}.xml"))
        rows: list[list] = []
        for row in body.find("m:sheetData", ns):
            vals: dict[int, object] = {}
            # the r= cell reference is OPTIONAL in OOXML: writers that
            # omit it imply "next column after the previous cell", so
            # track a positional cursor as the fallback
            next_col = 1
            for c in row.findall("m:c", ns):
                ref = c.get("r") or ""
                m_ref = _re.match(r"[A-Z]+", ref)
                if m_ref:
                    col = 0
                    for ch in m_ref.group(0):
                        col = col * 26 + (ord(ch) - 64)
                else:
                    col = next_col
                next_col = col + 1
                t = c.get("t", "n")
                if t == "inlineStr":
                    is_el = c.find("m:is", ns)
                    v = "".join(x.text or "" for x in is_el.iter(
                        "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}t"))
                else:
                    v_el = c.find("m:v", ns)
                    if v_el is None:
                        continue
                    v = shared[int(v_el.text)] if t == "s" else (
                        float(v_el.text) if "." in v_el.text or "e" in
                        v_el.text.lower() else int(v_el.text))
                vals[col - 1] = v
            width = max(vals) + 1 if vals else 0
            rows.append([vals.get(i) for i in range(width)])
    header = [str(h) for h in rows[0]] if rows else []
    width = len(header)
    out = [r + [None] * (width - len(r)) for r in rows[1:]]
    return header, out


def read_excel(
    spark: SparkSession, path: str, sheet: str | None = None
) -> DataFrame:
    """Excel (.xlsx) → DataFrame. Prefers `pandas.read_excel` (openpyxl
    engine) when installed — matching the reference's dependency
    (`healthcare-pipeline-requirements.txt:19`) — else falls back to a
    stdlib parser so ingestion works in minimal environments. First row
    is the header, as in `pandas.read_excel` defaults."""
    try:
        import pandas as pd

        pdf = pd.read_excel(path, sheet_name=sheet or 0)
        return spark.createDataFrame(pdf)
    except ImportError:  # pandas itself or its excel engine missing
        header, rows = _read_xlsx_stdlib(path, sheet)
        return spark.createDataFrame(rows, schema=header)
