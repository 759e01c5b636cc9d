"""GENESIS (Destatis) cubefile decode — Spark-first, zero Python UDFs.

The reference's Destatis connector fetches raw cubes via the official
``data/cubefile`` endpoint and persists the ASCII payload verbatim
(connectors/destatis_connector.py:464-530 — it never parses the
format). This module supplies the missing decode half as a
distributed operator over the PUBLICLY DOCUMENTED GENESIS cubefile
layout (GENESIS-Online handbook; the same layout open-source clients
like pystatis consume):

    K;DQ;FACH-SCHL;GHH-ART;...          <- K record: declares the
    D;61221BJ002;;...                      schema of following D rows
    K;DQA;NAME;RHF-BSR;RHF-ACHSE        <- axes (order = fact order)
    D;DINSG;1;1
    K;DQZ;NAME;ZI-RHF-BSR;ZI-RHF-ACHSE  <- time variable
    D;JAHR;2;2
    K;DQI;NAME;ME-NAME;DST;TYP;NKM-STELLEN   <- measures (order =
    D;PRE001;EUR;JAHR;D;2                       fact group order)
    K;QEI;FACH-SCHL;ZI-WERT;WERT;QUALITAET;GESPERRT;WERT-VERFAELSCHT
    D;DINSG;2020;1234,5;e;;0            <- the FACT section: one axis
    ...                                    code per DQA axis, the time
                                           value, then one
                                           (value, quality, locked,
                                           falsified) group per DQI
                                           measure

Decode strategy, built for the format's actual shape at scale: the
header section (everything before ``K;QEI``) is a handful of lines
per cube, while the QEI fact section is the bulk (millions of lines
for big cubes). So the header is parsed per cube with array
higher-order functions on the small line array (one row per cube),
and the fact section is EXPLODED to one row per line and parsed with
pure column expressions (split/slice/element_at) joined against the
tiny broadcast header frame — fully distributed, whole-stage codegen,
no Python in the loop. German decimal commas are normalized and the
documented missing-value codes (``...``, ``.``, ``-``, ``/``, ``x``)
become NULL values with their quality flag retained.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# documented GENESIS missing-value codes (value withheld / not
# applicable / unreliable) — decoded as NULL, quality flag kept
MISSING_CODES = ("...", ".", "-", "/", "x", "")


def _k_tag(line):
    """'K;DQA;NAME;...' -> 'K;DQA' (record-type key of a K line)."""
    return F.substring_index(line, ";", 2)


def _section(lines, tag: str):
    """The D-row payload lines of header section ``tag``: lines
    strictly between the ``K;<tag>`` record and the next K record,
    in file order. A cubefile missing the ``K;<tag>`` header decodes
    to an EMPTY array (array_position returns 0 when absent; without
    the ``start > 0`` guard every line index would satisfy the range
    test and D rows of earlier sections would be mis-attributed)."""
    idx = F.transform(lines, lambda line, i: F.struct(i.alias("i"), line.alias("l")))
    start = F.array_position(F.transform(lines, _k_tag), F.lit(f"K;{tag}"))
    # first K line after the section header (array_position is 1-based)
    later_k = F.filter(
        idx, lambda x: (x["i"] + 1 > start) & x["l"].startswith("K;")
    )
    nxt = F.when(F.size(later_k) > 0, F.element_at(later_k, 1)["i"] + 1).otherwise(
        F.size(lines) + 1
    )
    return F.transform(
        F.filter(
            idx,
            lambda x: (start > 0)
            & (x["i"] + 1 > start)
            & (x["i"] + 1 < nxt)
            & x["l"].startswith("D;"),
        ),
        lambda x: x["l"],
    )


def cube_headers(
    df: DataFrame, id_col: str = "cube_id", payload_col: str = "payload"
) -> DataFrame:
    """Per-cube header frame: (id, axes array<string> in axis order,
    measures array<string> in measure order, time_var, qei_pos —
    1-based line number of the K;QEI record). One output row per
    cube; tiny by construction (headers are bounded), so it
    broadcasts into the fact parse."""
    lines = F.split(F.col(payload_col), "\r?\n")
    name_of = lambda section: F.transform(  # noqa: E731
        section, lambda d: F.element_at(F.split(d, ";"), 2)
    )
    return df.select(
        F.col(id_col),
        name_of(_section(lines, "DQA")).alias("axes"),
        name_of(_section(lines, "DQI")).alias("measures"),
        # try_element_at: a cube missing its DQZ D-row has no time
        # variable (NULL), not an ANSI out-of-bounds stage failure
        F.try_element_at(name_of(_section(lines, "DQZ")), F.lit(1)).alias(
            "time_var"
        ),
        F.array_position(F.transform(lines, _k_tag), F.lit("K;QEI")).alias(
            "qei_pos"
        ),
    )


def parse_cubefile(
    df: DataFrame, id_col: str = "cube_id", payload_col: str = "payload"
) -> DataFrame:
    """Decode GENESIS cubefiles into a long-form fact frame:
    (cube_id, dims, time_var, time_code, measure, value double,
    quality, locked boolean). ``dims`` is the sorted
    ``axis=code|...`` rendering (same convention as the JSON-stat
    flattener). Malformed fact lines (fewer tokens than the declared
    axes + measure groups need) are dropped, never crash the decode —
    the corrupt-input quarantine rule every codec in this repo
    follows."""
    hdr = cube_headers(df, id_col, payload_col)
    facts = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(payload_col), "\r?\n")).alias(
            "_ln", "_line"
        ),
    )
    # qei_pos == 0 means the K;QEI header is absent — without the
    # guard every header D row would be mis-read as a fact line
    j = facts.join(F.broadcast(hdr), id_col).filter(
        (F.col("qei_pos") > 0)
        & (F.col("_ln") + 1 > F.col("qei_pos"))
        & F.col("_line").startswith("D;")
    )
    toks = F.split(F.col("_line"), ";")
    n_axes = F.size("axes")
    j = j.select(
        id_col,
        "time_var",
        # dims: zip the declared axis order with this line's codes
        F.array_join(
            F.array_sort(
                F.zip_with(
                    "axes",
                    F.slice(toks, 2, F.size("axes")),
                    lambda a, c: F.concat(a, F.lit("="), c),
                )
            ),
            "|",
        ).alias("dims"),
        # try_element_at: a mangled fact line shorter than the axis
        # count must quarantine to NULL, not ANSI-error the stage
        F.try_element_at(toks, n_axes + 2).alias("time_code"),
        F.posexplode("measures").alias("_mi", "measure"),
        toks.alias("_toks"),
        n_axes.alias("_na"),
        F.size("measures").alias("_nm"),
    )
    base = F.col("_na") + 2 + F.col("_mi") * 4  # 4 fields per measure
    raw_val = F.element_at("_toks", base + 1)
    need = F.col("_na") + 2 + F.col("_nm") * 4
    return (
        j.filter(F.size("_toks") >= need)  # quarantine truncated lines
        .select(
            id_col,
            "dims",
            "time_var",
            "time_code",
            "measure",
            F.when(
                raw_val.isin(*MISSING_CODES), F.lit(None).cast("double")
            )
            .otherwise(
                # try_cast: an undocumented junk value token decodes to
                # NULL (quality flag retained) instead of an ANSI
                # cast error killing the whole cube
                F.replace(raw_val, F.lit(","), F.lit(".")).try_cast(
                    "double"
                )
            )
            .alias("value"),
            F.nullif(F.element_at("_toks", base + 2), F.lit("")).alias(
                "quality"
            ),
            (F.element_at("_toks", base + 3) == "1").alias("locked"),
        )
    )


def encode_cubefile(
    cube_code: str,
    axes: list[str],
    time_var: str,
    measures: list[tuple[str, str]],
    facts: list[tuple],
) -> str:
    """Render a GENESIS cubefile string from python-side rows — the
    fixture/round-trip twin of parse_cubefile (tests prove
    parse(encode(x)) == x). ``measures`` are (name, unit) pairs;
    ``facts`` rows are (axis codes..., time code, then per measure:
    (value str, quality, locked str)). Mirrors the documented layout
    exactly: K record first, D rows after, QEI fact section last."""
    out = ["* GENESIS-Tabellenexport (synthetic fixture)"]
    out.append("K;DQ;FACH-SCHL;GHH-ART;GHM-WERTE-JN;GENESIS-VBD;REGIOSTAT;EU-VBD")
    out.append(f"D;{cube_code};;N;N;N;N")
    out.append("K;DQA;NAME;RHF-BSR;RHF-ACHSE")
    for i, a in enumerate(axes):
        out.append(f"D;{a};{i + 1};{i + 1}")
    out.append("K;DQZ;NAME;ZI-RHF-BSR;ZI-RHF-ACHSE")
    out.append(f"D;{time_var};{len(axes) + 1};{len(axes) + 1}")
    out.append("K;DQI;NAME;ME-NAME;DST;TYP;NKM-STELLEN")
    for name, unit in measures:
        out.append(f"D;{name};{unit};{time_var};D;2")
    qei_fields = ";".join(
        ["FACH-SCHL"] * len(axes)
        + ["ZI-WERT"]
        + ["WERT;QUALITAET;GESPERRT;WERT-VERFAELSCHT"] * len(measures)
    )
    out.append(f"K;QEI;{qei_fields}")
    for row in facts:
        cells = list(row[: len(axes) + 1])
        for g in row[len(axes) + 1 :]:
            val, quality, locked = g
            cells += [val, quality, locked, "0"]
        out.append("D;" + ";".join(str(c) for c in cells))
    return "\n".join(out)
