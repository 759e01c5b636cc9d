"""Concept-weighted token vectors (reference T7/T8:
study_scraper/clustering.py:42-221).

The reference's offline semantic backend: normalize a question to
tokens (fold umlauts, drop stopwords/short tokens, naive
singularization), map tokens that CONTAIN a known bilingual concept
key (compound-safe substring match — "klimaschutzgesetz" emits both
"climate" and "law") to canonical concept tokens at weight 2.0, leave
other tokens at weight 1.0, and compare sparse vectors by cosine.

Everything here is built from one set of constants with Spark and
DuckDB twins so the oracle can never drift from the plan:

- ``doc_terms(df)``        — Spark: doc -> (id, term, w) sparse rows
- ``doc_terms_sql(...)``   — the identical DuckDB CTE chain
- ``question_vector(q)``   — the pure-Python reference semantics, used
  to turn the (constant) query string into literal weight rows that
  are embedded verbatim into BOTH engines' plans. A search query is a
  constant, so its vector is computed once on the driver and
  broadcast, never recomputed per row.

Deviation (declared): accent folding uses a fixed translate() table on
both engines instead of full NFKD decomposition — identical on the
corpus's alphabet, and identical-by-construction between the two
engines, which is what the oracle gate needs.

Scale: the concept table is ~70 rows — the substring theta-join is a
broadcast nested-loop over a tiny table, JVM-side, inside whole-stage
codegen. Token rows shuffle once on (id, term) for the vector
aggregate (map-side partial sum applies) and once on id for the final
cosine — no global collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Bilingual concept map: any token CONTAINING a key emits the
# canonical concept token(s) at CONCEPT_WEIGHT. Mirrors
# study_scraper/clustering.py:42-115 (incl. the polarity guards and
# the deliberate absence of a bare "rent" key).
CONCEPTS: dict[str, tuple[str, ...]] = {
    "atomkraft": ("nuclear",),
    "atomenergie": ("nuclear",),
    "atomausstieg": ("nuclear",),
    "kernenergie": ("nuclear",),
    "kernkraft": ("nuclear",),
    "nuclear": ("nuclear",),
    "klima": ("climate",),
    "climate": ("climate",),
    "tempolimit": ("speedlimit",),
    "speed": ("speedlimit",),
    "migration": ("migration",),
    "einwanderung": ("migration",),
    "zuwanderung": ("migration",),
    "immigration": ("migration",),
    "asyl": ("asylum",),
    "asylum": ("asylum",),
    "rente": ("pension",),
    "pension": ("pension",),
    "steuer": ("tax",),
    "tax": ("tax",),
    "miete": ("housing",),
    "wohnung": ("housing",),
    "housing": ("housing",),
    "retirement": ("pension",),
    "verteidigung": ("defense",),
    "defense": ("defense",),
    "defence": ("defense",),
    "bundeswehr": ("defense",),
    "military": ("military",),
    "wehrpflicht": ("conscription",),
    "wehrdienst": ("conscription",),
    "conscription": ("conscription",),
    "gesetz": ("law",),
    "law": ("law",),
    "kraftwerk": ("plant",),
    "plant": ("plant",),
    "verbot": ("ban",),
    "ban": ("ban",),
    "ausstieg": ("phaseout",),
    "phase": ("phaseout",),
    "abschaff": ("abolish",),
    "abolish": ("abolish",),
    "rückgängig": ("return",),
    "ruckgangig": ("return",),
    "return": ("return",),
    "energie": ("energy",),
    "energy": ("energy",),
    "kohle": ("coal",),
    "coal": ("coal",),
    "erneuerbar": ("renewable",),
    "renewable": ("renewable",),
}

CONCEPT_WEIGHT = 2.0

STOPWORDS = tuple(
    """
    the a an of to in for on and or should be is are was were do does
    germany german germans its it this that with about more most
    der die das den dem des ein eine einen einem einer und oder soll
    sollte sollten ist sind war waren fuer mit ueber mehr sich
    machen werden wieder wollen will
    """.split()
)

# Fixed accent-fold table (both engines' translate() is char-for-char).
_FOLD_SRC = "äöüàáâéèêëíìîïóòôúùûçñ"
_FOLD_DST = "aouaaaeeeeiiiiooouuucn"


def concept_pairs(
    extra: dict[str, tuple[str, ...]] | None = None,
) -> list[tuple[str, str]]:
    """(key, concept) rows for the join table, reference map + extras."""
    merged = dict(CONCEPTS)
    if extra:
        merged.update(extra)
    return [(k, c) for k, cs in sorted(merged.items()) for c in cs]


# --- pure-Python twin (drives the constant query-side vectors) -----------


def _fold(text: str) -> str:
    text = text.lower().replace("ß", "ss")
    return text.translate(str.maketrans(_FOLD_SRC, _FOLD_DST))


def question_vector(
    question: str, extra: dict[str, tuple[str, ...]] | None = None
) -> dict[str, float]:
    """Sparse weighted-token vector (clustering.py:141-158 semantics)."""
    import re

    pairs = concept_pairs(extra)
    vec: dict[str, float] = {}
    for tok in re.split(r"[^a-z0-9]+", _fold(question)):
        if not tok or tok in STOPWORDS or len(tok) < 2:
            continue
        if len(tok) > 3 and tok.endswith("s") and not tok.endswith("ss"):
            tok = tok[:-1]
        concepts = [c for key, c in pairs if key in tok]
        if concepts:
            for c in concepts:
                vec[c] = vec.get(c, 0.0) + CONCEPT_WEIGHT
        else:
            vec[tok] = vec.get(tok, 0.0) + 1.0
    return vec


# --- Spark side ----------------------------------------------------------


def doc_terms(
    spark: SparkSession,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra: dict[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """(id, term, w) sparse-vector rows for each document.

    explode(tokens) -> normalize -> broadcast substring-join against
    the tiny concept table -> groupBy(id, term) sum — one shuffle,
    map-side partial aggregation applies.
    """
    folded = F.translate(
        F.regexp_replace(F.lower(F.col(text_col)), "ß", "ss"),
        _FOLD_SRC,
        _FOLD_DST,
    )
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(folded, "[^a-z0-9]+")).alias("tok"),
    ).filter((F.length("tok") >= 2) & ~F.col("tok").isin(*STOPWORDS))
    sing = F.when(
        (F.length("tok") > 3)
        & F.col("tok").endswith("s")
        & ~F.col("tok").endswith("ss"),
        F.expr("substring(tok, 1, length(tok) - 1)"),
    ).otherwise(F.col("tok"))
    toks = toks.select("id", sing.alias("tok"))
    cdf = spark.createDataFrame(concept_pairs(extra), "key string, concept string")
    hit = toks.join(
        F.broadcast(cdf), F.col("tok").contains(F.col("key")), "left"
    )
    terms = hit.select(
        "id",
        F.coalesce("concept", "tok").alias("term"),
        F.when(F.col("concept").isNull(), F.lit(1.0))
        .otherwise(F.lit(CONCEPT_WEIGHT))
        .alias("w"),
    )
    return terms.groupBy("id", "term").agg(F.sum("w").alias("w"))


# --- DuckDB twin ---------------------------------------------------------


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def doc_terms_sql(
    source_sql: str = "SELECT doc_id AS id, text FROM documents",
    extra: dict[str, tuple[str, ...]] | None = None,
) -> str:
    """CTE chain producing the identical (id, term, w) rows in DuckDB.

    Emits CTEs: ``__toks``, ``__sing``, ``__concepts``, ``vec`` —
    embed inside ``WITH {doc_terms_sql(...)}`` and select from
    ``vec``.
    """
    stop = ", ".join(_sql_quote(s) for s in STOPWORDS)
    values = ", ".join(
        f"({_sql_quote(k)}, {_sql_quote(c)})" for k, c in concept_pairs(extra)
    )
    return f"""
        __toks AS (
            SELECT id, unnest(string_split_regex(
                       translate(replace(lower(text), 'ß', 'ss'),
                                 {_sql_quote(_FOLD_SRC)},
                                 {_sql_quote(_FOLD_DST)}),
                       '[^a-z0-9]+')) AS tok
            FROM ({source_sql})
        ),
        __sing AS (
            SELECT id,
                   CASE WHEN length(tok) > 3 AND tok LIKE '%s'
                             AND tok NOT LIKE '%ss'
                        THEN substr(tok, 1, length(tok) - 1)
                        ELSE tok END AS tok
            FROM __toks
            WHERE length(tok) >= 2 AND tok NOT IN ({stop})
        ),
        __concepts(key, concept) AS (
            SELECT * FROM (VALUES {values}) AS t(key, concept)
        ),
        vec AS (
            SELECT id, COALESCE(c.concept, s.tok) AS term,
                   SUM(CASE WHEN c.concept IS NULL THEN 1.0
                            ELSE {CONCEPT_WEIGHT} END) AS w
            FROM __sing s LEFT JOIN __concepts c ON contains(s.tok, c.key)
            GROUP BY 1, 2
        )"""
