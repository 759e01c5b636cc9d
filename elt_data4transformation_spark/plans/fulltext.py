"""Full-document acquisition surface (SURVEY §2.1 S23/S24:
study_scraper/fulltext.py, study_scraper/pdf_resolver.py).

S24: landing-page -> best-PDF-link resolution as pure column
expressions — the reference's regex-fallback strategy order
(pdf_resolver.py:120-141): (1) `citation_pdf_url` meta is
authoritative; (2) otherwise rank every PDF-ish href: +5 for
DSpace/SSOAR `/bitstream/`, +3 if any full-text marker token, -4 if
any side-material token; first-seen wins ties. Relative hrefs resolve
against the page URL.

S23: fetched-document sniffing — `%PDF` / HTML magic detection on a
binary payload column and per-type extraction routing — plus REAL PDF
text extraction: no PDF library ships in this container, so
operators/pdftext.py implements the FlateDecode/Tj subset of the
public PDF 1.4 spec with stdlib zlib+re, proven by the `pdf_extract`
round-trip query (text -> genuine multi-page PDF -> extracted text,
hash-checked against the source).

The landing HTML / payload here are synthesized DETERMINISTICALLY from
doc_id (the operator input is a fetched column in production); the
resolver/sniffer logic is the unit under test, identically expressed
in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import spread, table
from .registry import register

# pdf_resolver.py:31-43 (ranking token lists, regex-fallback path —
# href only, no anchor text).
_PREFER = (
    "volltext", "fulltext", "full-text", "full_text",
    "gesamt", "full", "complete", "report", "bericht",
    "studie", "document", "dokument", "paper",
)
_DEPRIORITIZE = (
    "anhang", "appendix", "supplement", "zusatz", "annex", "cover",
    "abstract", "zusammenfassung", "toc", "inhaltsverzeichnis",
    "erratum", "correction", "poster", "slides", "praesentation",
)

_ORIGIN = "https://journals.example.org"
_HREF_RE = r'href="([^"]+?\.pdf(\?[^"]*)?)"'
_META_RE = r'<meta name="citation_pdf_url" content="([^"]+)"'


def _html_sql() -> str:
    """Deterministic landing-page HTML per doc (5 variants)."""
    return """
        CASE doc_id % 5
          WHEN 0 THEN '<html><meta name="citation_pdf_url" content="/meta/'
                      || doc_id || '.pdf"><a href="decoy/appendix.pdf">x</a></html>'
          WHEN 1 THEN '<html><a href="bitstream/doc' || doc_id
                      || '.pdf">get</a><a href="notes/anhang.pdf">a</a></html>'
          WHEN 2 THEN '<html><a href="extra/appendix' || doc_id
                      || '.pdf">a</a><a href="dl/volltext' || doc_id
                      || '.pdf">v</a></html>'
          WHEN 3 THEN '<html><a href="https://cdn.example.org/f/' || doc_id
                      || '.pdf?download=1">d</a></html>'
          ELSE '<html><a href="/about.html">no pdf here</a></html>'
        END
    """


def _html_col() -> F.Column:
    i = F.col("doc_id")
    mk = lambda *parts: F.concat(  # noqa: E731
        *[p if isinstance(p, F.Column) else F.lit(p) for p in parts]
    )
    return (
        F.when(
            i % 5 == 0,
            mk(
                '<html><meta name="citation_pdf_url" content="/meta/',
                i.cast("string"),
                '.pdf"><a href="decoy/appendix.pdf">x</a></html>',
            ),
        )
        .when(
            i % 5 == 1,
            mk(
                '<html><a href="bitstream/doc',
                i.cast("string"),
                '.pdf">get</a><a href="notes/anhang.pdf">a</a></html>',
            ),
        )
        .when(
            i % 5 == 2,
            mk(
                '<html><a href="extra/appendix',
                i.cast("string"),
                '.pdf">a</a><a href="dl/volltext',
                i.cast("string"),
                '.pdf">v</a></html>',
            ),
        )
        .when(
            i % 5 == 3,
            mk(
                '<html><a href="https://cdn.example.org/f/',
                i.cast("string"),
                '.pdf?download=1">d</a></html>',
            ),
        )
        .otherwise(F.lit('<html><a href="/about.html">no pdf here</a></html>'))
    )


def _token_hit_sql(tokens: tuple[str, ...]) -> str:
    toks = ", ".join(f"'{t}'" for t in tokens)
    return f"len(list_filter([{toks}], t -> contains(lower(href), t))) > 0"


def _token_hit_col(href: F.Column, tokens: tuple[str, ...]) -> F.Column:
    arr = F.array(*[F.lit(t) for t in tokens])

    def hit(t: F.Column) -> F.Column:
        return F.lower(href).contains(t)

    return F.exists(arr, hit)


@register(
    "pdf_resolve",
    oracle=f"""
        WITH pages AS (
            SELECT doc_id,
                   '{_ORIGIN}/item/' || doc_id || '/' AS base_url,
                   {_html_sql()} AS html
            FROM documents
        ), metas AS (
            SELECT *, COALESCE(regexp_extract(html, '{_META_RE}', 1), '')
                          AS meta_href
            FROM pages
        ), cands AS (
            SELECT *,
                   list_transform(
                       regexp_extract_all(html, 'href="([^"]+?\\.pdf(\\?[^"]*)?)"', 1),
                       href -> struct_pack(
                           score := CASE WHEN contains(href, '/bitstream/')
                                              OR starts_with(href, 'bitstream/')
                                         THEN 5 ELSE 0 END
                                  + CASE WHEN {_token_hit_sql(_PREFER)}
                                         THEN 3 ELSE 0 END
                                  - CASE WHEN {_token_hit_sql(_DEPRIORITIZE)}
                                         THEN 4 ELSE 0 END,
                           href := href)) AS scored
            FROM metas
        ), ranked AS (
            SELECT doc_id, base_url, meta_href,
                   list_transform(
                       scored,
                       s -> struct_pack(
                           score := s.score,
                           neg := -list_position(
                               list_transform(scored, x -> x.href), s.href),
                           href := s.href)) AS ordered
            FROM cands
        ), best AS (
            SELECT doc_id, base_url, meta_href,
                   CASE WHEN len(ordered) > 0
                        THEN list_sort(ordered)[len(ordered)].href
                        END AS best_href
            FROM ranked
        )
        SELECT doc_id,
               CASE
                 WHEN meta_href <> '' THEN
                   CASE WHEN starts_with(meta_href, 'http') THEN meta_href
                        WHEN starts_with(meta_href, '/')
                            THEN '{_ORIGIN}' || meta_href
                        ELSE base_url || meta_href END
                 WHEN best_href IS NOT NULL THEN
                   CASE WHEN starts_with(best_href, 'http') THEN best_href
                        WHEN starts_with(best_href, '/')
                            THEN '{_ORIGIN}' || best_href
                        ELSE base_url || best_href END
               END AS pdf_url
        FROM best
        ORDER BY doc_id
    """,
    tags=("source", "fulltext"),
    doc="S24 landing-page -> PDF resolver (pdf_resolver.py:120-141) as "
    "pure column expressions: citation_pdf_url meta wins outright; "
    "else every *.pdf href is scored (+5 bitstream, +3 full-text "
    "marker, -4 side-material marker) and the first best-scoring link "
    "wins; relative hrefs resolved against the page URL. Per-row "
    "regex/array work, embarrassingly parallel — no shuffle at all.",
)
def pdf_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents")).select(
        "doc_id",
        F.concat(
            F.lit(f"{_ORIGIN}/item/"), F.col("doc_id").cast("string"), F.lit("/")
        ).alias("base_url"),
        _html_col().alias("html"),
    )
    meta = F.regexp_extract("html", _META_RE, 1)
    hrefs = F.regexp_extract_all("html", F.lit(_HREF_RE), F.lit(1))

    def score(href: F.Column) -> F.Column:
        return (
            F.when(
                href.contains("/bitstream/") | href.startswith("bitstream/"),
                F.lit(5),
            ).otherwise(F.lit(0))
            + F.when(_token_hit_col(href, _PREFER), F.lit(3)).otherwise(F.lit(0))
            - F.when(_token_hit_col(href, _DEPRIORITIZE), F.lit(4)).otherwise(
                F.lit(0)
            )
        )

    # (element, index) two-parameter transform — intentional: index is
    # the first-seen tiebreak (strictly-greater-wins in the reference).
    ordered = F.transform(
        hrefs,
        lambda href, i: F.struct(
            score(href).alias("score"),
            (-(i + 1)).alias("neg"),
            href.alias("href"),
        ),
    )
    best = F.when(
        F.size(ordered) > 0,
        F.element_at(F.array_sort(ordered), F.size(ordered))["href"],
    )

    def absolutize(href: F.Column) -> F.Column:
        return (
            F.when(href.startswith("http"), href)
            .when(href.startswith("/"), F.concat(F.lit(_ORIGIN), href))
            .otherwise(F.concat(F.col("base_url"), href))
        )

    pdf_url = F.when(meta != "", absolutize(meta)).otherwise(
        F.when(best.isNotNull(), absolutize(best))
    )
    return (
        d.select("doc_id", "base_url", F.col("html"))
        .withColumn("pdf_url", pdf_url)
        .select("doc_id", "pdf_url")
        .orderBy("doc_id")
    )


_INVISIBLE_TAGS = ("script", "style", "noscript")


def html_extract_text(raw):
    """Visible-text extraction as column expressions, mirroring the
    reference's extract_text_from_html (study_scraper/fulltext.py:
    98-111): script/style/noscript elements are decomposed — their
    CONTENT is dropped, not just their tags — then remaining tags act
    as separators and whitespace collapses to single spaces. Keeps a
    `<script>var x=1</script>` body out of the text that feeds claims
    extraction. One replace per tag, NO backreferences: DuckDB's RE2
    silently never matches `</\\1>`, so a backref form would be a
    latent Spark/oracle divergence (found round 8, script-bearing
    fixture) — both engines run these exact per-tag patterns."""
    out = raw
    for tag in _INVISIBLE_TAGS:
        out = F.regexp_replace(
            out, rf"(?is)<{tag}[^>]*>.*?</{tag}\s*>", " "
        )
    no_tags = F.regexp_replace(out, "<[^>]*>", " ")
    return F.trim(F.regexp_replace(no_tags, r"\s+", " "))


def html_extract_text_sql(expr: str) -> str:
    """DuckDB twin of html_extract_text over SQL expression ``expr`` —
    the same per-tag patterns, so oracles stay divergence-proof even
    on script-bearing inputs."""
    out = expr
    for tag in _INVISIBLE_TAGS:
        out = (
            f"regexp_replace({out}, "
            f"'(?is)<{tag}[^>]*>.*?</{tag}\\s*>', ' ', 'g')"
        )
    return (
        f"TRIM(regexp_replace(regexp_replace({out}, "
        f"'<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g'))"
    )


@register(
    "fulltext_detect",
    oracle=f"""
        WITH fetched AS (
            SELECT doc_id,
                   CASE doc_id % 3
                     WHEN 0 THEN '%PDF-1.7' || chr(10) || text
                     WHEN 1 THEN '<!DOCTYPE html><html><body>' || text
                                 || '</body></html>'
                     ELSE text
                   END AS raw
            FROM documents
        )
        SELECT doc_id,
               CASE WHEN starts_with(raw, '%PDF') THEN 'application/pdf'
                    WHEN starts_with(lower(raw), '<!doctype html')
                         OR starts_with(lower(raw), '<html') THEN 'text/html'
                    ELSE 'text/plain' END AS content_type,
               length(raw) AS n_bytes,
               CASE WHEN starts_with(raw, '%PDF')
                    THEN 'pdf-extract-stub'
                    WHEN starts_with(lower(raw), '<!doctype html')
                         OR starts_with(lower(raw), '<html')
                    THEN {html_extract_text_sql('raw')}
                    ELSE raw END AS extracted_prefix_src
        FROM fetched
        ORDER BY doc_id
    """,
    tags=("source", "fulltext"),
    doc="S23 fetched-document sniffing (study_scraper/fulltext.py): "
    "%PDF / HTML magic detection and per-type text-extraction routing. "
    "HTML extraction mirrors reference extract_text_from_html "
    "(study_scraper/fulltext.py:98-111): script/style/noscript spans "
    "are DECOMPOSED (content dropped, not just tags), remaining tags "
    "become separators, and whitespace collapses to single spaces — "
    "this is the text that feeds claims extraction, so invisible "
    "script bodies must not leak into it. The PDF branch routes to "
    "the real extractor exercised end-to-end by `pdf_extract` (this "
    "query's oracle predates it and keeps the sentinel string). "
    "Per-row, no shuffle.",
)
def fulltext_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    i = F.col("doc_id")
    raw = (
        F.when(i % 3 == 0, F.concat(F.lit("%PDF-1.7\n"), F.col("text")))
        .when(
            i % 3 == 1,
            F.concat(
                F.lit("<!DOCTYPE html><html><body>"),
                F.col("text"),
                F.lit("</body></html>"),
            ),
        )
        .otherwise(F.col("text"))
    )
    low = F.lower(F.col("raw"))
    is_pdf = F.col("raw").startswith("%PDF")
    is_html = low.startswith("<!doctype html") | low.startswith("<html")
    return (
        d.select("doc_id", raw.alias("raw"))
        .select(
            "doc_id",
            F.when(is_pdf, F.lit("application/pdf"))
            .when(is_html, F.lit("text/html"))
            .otherwise(F.lit("text/plain"))
            .alias("content_type"),
            F.length("raw").cast("long").alias("n_bytes"),
            F.when(is_pdf, F.lit("pdf-extract-stub"))
            .when(is_html, html_extract_text(F.col("raw")))
            .otherwise(F.col("raw"))
            .alias("extracted_prefix_src"),
        )
        .orderBy("doc_id")
    )


# --- S23 real PDF text extraction ----------------------------------------
# No PDF library ships in this container, so operators/pdftext.py
# implements the fixture-grade subset of the PDF 1.4 spec directly
# (FlateDecode content streams, Tj/TJ literal strings). The query below
# is the honest round-trip proof: document text -> real PDF bytes ->
# extraction -> the original text (whitespace-normalized), with the
# oracle recomputing only the normalization, so any extraction bug
# (dropped page, glued words, bad escape) breaks the hash.

_WPP = 200  # pdftext.WORDS_PER_PAGE — mirrored in the oracle below


@register(
    "pdf_extract",
    oracle=f"""
        SELECT doc_id,
               GREATEST(1, CAST(CEIL(
                   LENGTH(regexp_split_to_array(TRIM(text), '\\s+')) / {_WPP}.0
               ) AS BIGINT)) AS n_pages,
               regexp_replace(TRIM(text), '\\s+', ' ', 'g') AS extracted
        FROM documents
        ORDER BY doc_id
    """,
    tags=("source", "fulltext", "multimodal"),
    doc="S23 real PDF text extraction (study_scraper/fulltext.py:84-95 "
    "extract_text_from_pdf): each document is serialized to a genuine "
    "multi-page FlateDecode PDF and extracted back by the pure-stdlib "
    "parser in operators/pdftext.py (stream walk, inflate, BT..ET "
    "tokenizer, escape/UTF-16BE decode) inside one Arrow-batched "
    "mapInPandas — no per-row Python, no shuffle; linear in corpus "
    "size at any scale. The oracle recomputes page count from the "
    "deterministic 200-words-per-page layout and normalizes the source "
    "text the same way, so the hash certifies byte-faithful recovery.",
)
def pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pdftext import count_pdf_pages, extract_pdf_text, make_pdf

    d = spread(table(spark, sf_dir, "documents")).select("doc_id", "text")

    def batches(pdfs):
        for pdf in pdfs:
            raw = [make_pdf(t or "") for t in pdf["text"]]
            pdf["n_pages"] = [count_pdf_pages(b) for b in raw]
            pdf["extracted"] = [extract_pdf_text(b) for b in raw]
            yield pdf[["doc_id", "n_pages", "extracted"]]

    out = d.mapInPandas(batches, "doc_id long, n_pages long, extracted string")
    return (
        out.withColumn(
            "extracted", F.regexp_replace(F.trim("extracted"), r"\s+", " ")
        )
        .orderBy("doc_id")
    )


# --- S23 flow end-to-end: fetched HTML -> visible text -> claims -----------

_HCP_HEAD = (
    '<html><head><script type="text/javascript">'
    'var decoy = "Zustimmung bei 88 Prozent (n=9999 Befragte)";'
    "</script><style>body { color: #333 }</style></head><body>"
    "<h1>Studie "
)
_HCP_NOSCRIPT = (
    "</p><noscript>Bitte JavaScript aktivieren: 77 Prozent"
    "</noscript></body></html>"
)


def _hcp_body_sql() -> str:
    """The synthetic German survey sentence, duck side (twin of the
    Spark concat in html_claims_pipeline; numbers stay <= 48,9 so the
    >120% suppression never fires on real claims)."""
    return (
        "'Die Zustimmung lag bei ' || CAST(doc_id % 45 + 3 AS VARCHAR)"
        " || ',' || CAST(doc_id % 10 AS VARCHAR)"
        " || ' Prozent (n=' || CAST(doc_id % 900 + 100 AS VARCHAR)"
        " || ' Befragte) und stieg um ' || CAST(doc_id % 12 AS VARCHAR)"
        " || ' Prozentpunkte.'"
    )


def _hcp_src_sql() -> str:
    html = (
        f"'{_HCP_HEAD}' || CAST(doc_id AS VARCHAR) || '</h1>' || chr(10)"
        f" || '  <p>' || {_hcp_body_sql()} || '{_HCP_NOSCRIPT}'"
    )
    return (
        f"SELECT doc_id AS study_id, {html_extract_text_sql(html)} AS text"
        " FROM documents WHERE doc_id % 3 = 1"
    )


@register(
    "html_claims_pipeline",
    oracle=None,  # assigned below — needs functions/claims at import
    tags=("fulltext", "text", "pipeline", "composite"),
    doc="The reference's fetch->extract->mine flow as ONE composite "
    "(study_scraper fulltext.py extract_text_from_html feeding "
    "claims.py extract_claims — the exact consumer relationship the "
    "round-8 extraction fidelity fix exists for): each HTML-class "
    "document (doc_id%3=1, fulltext_detect's routing) is wrapped in a "
    "page whose <script> carries a DECOY claim ('88 Prozent "
    "(n=9999)') and whose <noscript> carries another ('77 Prozent'); "
    "visible-text extraction DECOMPOSES those elements (content "
    "dropped, tags as separators, whitespace collapsed — "
    "html_extract_text, per-tag patterns identical in both engines), "
    "then the full T1 claim surface runs over the extracted text. "
    "Output claims come only from the visible survey sentence; a "
    "tag-strip regression would surface the decoys and break the "
    "hash. Pure projection + explode + one dedup window — no shuffle "
    "beyond the final ordering at any scale.",
)
def html_claims_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import claims

    d = spread(table(spark, sf_dir, "documents")).filter(
        F.col("doc_id") % 3 == 1
    )
    i = F.col("doc_id")
    body = F.concat(
        F.lit("Die Zustimmung lag bei "),
        (i % 45 + 3).cast("string"),
        F.lit(","),
        (i % 10).cast("string"),
        F.lit(" Prozent (n="),
        (i % 900 + 100).cast("string"),
        F.lit(" Befragte) und stieg um "),
        (i % 12).cast("string"),
        F.lit(" Prozentpunkte."),
    )
    html = F.concat(
        F.lit(_HCP_HEAD),
        i.cast("string"),
        F.lit("</h1>\n  <p>"),
        body,
        F.lit(_HCP_NOSCRIPT),
    )
    src = d.select(
        F.col("doc_id").alias("study_id"),
        html_extract_text(html).alias("text"),
    )
    return claims.claims_from_text_df(src, source_field="html").orderBy(
        "study_id", "claim_id"
    )


def _hcp_oracle() -> str:
    from ..functions import claims

    return (
        "SELECT * FROM ("
        + claims.claims_from_text_sql(_hcp_src_sql(), source_field="html")
        + ") ORDER BY study_id, claim_id"
    )


from .registry import REGISTRY as _REG  # noqa: E402

_REG["html_claims_pipeline"].oracle = _hcp_oracle()
