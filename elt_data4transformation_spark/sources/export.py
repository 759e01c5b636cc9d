"""Dataset export sink (S25) and identifier whitelist guard (P7).

Reference: study_scraper/export.py:45-85 — findings.csv + studies.csv
with list cells '|'-joined, plus a manifest.json describing the export;
storage/postgres.py:1320-1336 — view names validated against an
alnum+underscore whitelist before interpolation (injection guard).
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def validate_identifier(name: str) -> str:
    """P7: allow only alnum+underscore identifiers (must not start with
    a digit); raises ValueError otherwise. Use before interpolating any
    caller-supplied table/view/column name into SQL text."""
    if not _IDENT_RE.match(name or ""):
        raise ValueError(f"invalid identifier: {name!r}")
    return name


def _join_list_cells(df: DataFrame) -> DataFrame:
    """'|'-join every array column (the reference's CSV list-cell
    convention, export.py:45-85)."""
    for name, dtype in df.dtypes:
        if dtype.startswith("array<"):
            df = df.withColumn(name, F.array_join(F.col(name), "|"))
    return df


def export_dataset(
    tables: dict[str, DataFrame], out_dir: str, single_file: bool = True
) -> dict:
    """S25: write each named DataFrame as CSV under out_dir/<name>/ and
    a manifest.json beside them. Returns the manifest dict.

    ``single_file=True`` coalesces each table to one CSV part (the
    reference emits one findings.csv / studies.csv); at scale pass
    False and each table stays a partitioned directory of parts.
    """
    os.makedirs(out_dir, exist_ok=True)
    manifest: dict = {"tables": {}, "list_cell_delimiter": "|"}
    for name, df in tables.items():
        validate_identifier(name)
        out = _join_list_cells(df)
        if single_file:
            out = out.coalesce(1)
        path = os.path.join(out_dir, name)
        out.write.mode("overwrite").option("header", True).csv(path)
        manifest["tables"][name] = {
            "path": path,
            "columns": out.columns,
            "row_count": df.count(),
        }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest
