"""OAI-PMH (Dublin Core) record decoder (SURVEY §2.1 S19:
study_scraper/discovery/ssoar.py:133-237).

The reference harvests SSOAR via OAI-PMH `ListRecords` XML and turns
each `<oai:record>` into a flat candidate row: skip records whose
header carries status="deleted", first `dc:title` wins, canonical URL
is the first http `dc:identifier`, the DOI is fished out of the same
identifier list, ISO 639-2 language codes fold to 639-1, and the
resumption token drives pagination.

Spark shape: XML decoding is a source decode with no built-in
namespace-aware operator, so it runs as an Arrow-batched
``mapInPandas`` over the XML-response column (same pattern as the
JSON-stat flattener) — per-partition stdlib ElementTree, no driver
loop, no row-at-a-time Python UDF. Fetching is the ingestion layer's
job; this operator takes the response body column.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Optional
from xml.etree import ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame

OAI_NS = {
    "oai": "http://www.openarchives.org/OAI/2.0/",
    "oai_dc": "http://www.openarchives.org/OAI/2.0/oai_dc/",
    "dc": "http://purl.org/dc/elements/1.1/",
}

# ISO 639-2 -> 639-1 (ssoar.py:48-54)
LANG_MAP = {"deu": "de", "ger": "de", "eng": "en", "fra": "fr", "fre": "fr"}

OUT_SCHEMA = (
    "external_id string, title string, canonical_url string, doi string, "
    "authors string, publisher string, abstract string, language string, "
    "subjects string, resumption_token string"
)


def _dc_texts(dc: ET.Element, tag: str) -> list[str]:
    out = []
    for el in dc.findall(f"dc:{tag}", OAI_NS):
        if el.text and el.text.strip():
            out.append(el.text.strip())
    return out


def decode_oai(xml: str) -> Iterator[dict]:
    """Parse one ListRecords response; yields one dict per kept record
    (ssoar.py:149-237 semantics; list fields '|'-joined)."""
    # falsy / non-string payloads (NULL response cell in production)
    # would raise TypeError inside ET.fromstring and fail the whole
    # stage — skip them like any other undecodable record
    if not xml or not isinstance(xml, str):
        return
    try:
        root = ET.fromstring(xml)
    except (ET.ParseError, TypeError, ValueError):
        return
    tok_el = root.find(".//oai:resumptionToken", OAI_NS)
    token: Optional[str] = (
        tok_el.text.strip() if tok_el is not None and tok_el.text else None
    )
    for rec in root.findall(".//oai:record", OAI_NS):
        header = rec.find("oai:header", OAI_NS)
        if header is not None and header.get("status") == "deleted":
            continue
        ident = header.find("oai:identifier", OAI_NS) if header is not None else None
        external_id = ident.text.strip() if ident is not None and ident.text else ""
        dc = rec.find(".//oai_dc:dc", OAI_NS)
        if dc is None:
            continue
        titles = _dc_texts(dc, "title")
        if not titles:
            continue
        identifiers = _dc_texts(dc, "identifier")
        canonical_url = next((u for u in identifiers if u.startswith("http")), None)
        if not canonical_url:
            continue
        doi = next(
            (
                u
                for u in identifiers
                if "doi.org/" in u
                or u.lower().startswith("doi:")
                or u.startswith("10.")
            ),
            None,
        )
        langs = [
            LANG_MAP.get(lang.lower(), lang.lower())
            for lang in _dc_texts(dc, "language")
        ]
        yield {
            "external_id": external_id or canonical_url,
            "title": titles[0],
            "canonical_url": canonical_url,
            "doi": doi,
            "authors": "|".join(_dc_texts(dc, "creator")),
            "publisher": (_dc_texts(dc, "publisher") or [None])[0],
            "abstract": "\n".join(_dc_texts(dc, "description")) or None,
            "language": langs[0] if langs else None,
            "subjects": "|".join(_dc_texts(dc, "subject")),
            "resumption_token": token,
        }


def parse_oai_responses(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """mapInPandas decode: one output row per kept OAI record."""

    cols = [c.split(" ")[0] for c in OUT_SCHEMA.split(", ")]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for xml in pdf[xml_col]:
                out.extend(decode_oai(xml))
            yield pd.DataFrame(out, columns=cols)

    return df.mapInPandas(fn, OUT_SCHEMA)
