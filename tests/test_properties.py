"""Property-based tests (hypothesis) for the pure decode/parse kernels.

The reference has no property tests (SURVEY §5); these pin the
invariants that the oracle hash-matching relies on: parse round-trips,
decode cardinality, clustering similarity bounds. All pure Python — no
SparkSession — so they run in milliseconds and cannot flake on engine
nondeterminism.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from elt_data4transformation_spark.operators.jsonstat import (
    decode_jsonstat,
    decode_jsonstat_status,
)
from elt_data4transformation_spark.plans.cluster import _jaccard
from elt_data4transformation_spark.sources.connectors import (
    SlidingWindowRateLimiter,
    backoff_delays,
)

# --- German number formatting round-trip ----------------------------------
# (the column expression twins are exercised by the oracle tests; this
# pins the FORMAT the expressions assume)


def _format_german(value: float, decimals: int) -> str:
    s = f"{value:,.{decimals}f}"  # 1,234,567.89
    return s.replace(",", "\x00").replace(".", ",").replace("\x00", ".")


def _parse_german(s: str) -> float | None:
    """Reference semantics (claims.py:136-155): dot-groups-of-3 =
    thousands; comma = decimal. Python twin of the column expression."""
    import re

    if re.match(r"^-?\d{1,3}(\.\d{3})+(,\d+)?$", s):
        s = s.replace(".", "").replace(",", ".")
    elif "," in s:
        s = s.replace(",", ".")
    try:
        return float(s)
    except ValueError:
        return None


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=10**9),
    st.integers(min_value=0, max_value=99),
)
def test_german_number_roundtrip(whole: int, frac: int):
    value = whole + frac / 100.0
    s = _format_german(value, 2)
    parsed = _parse_german(s)
    assert parsed is not None
    assert math.isclose(parsed, value, rel_tol=0, abs_tol=1e-6)


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=1000, max_value=10**9))
def test_german_thousands_integer(n: int):
    s = _format_german(float(n), 0)  # e.g. '6.063'
    assert _parse_german(s) == float(n)


# --- JSON-stat decode invariants ------------------------------------------


@st.composite
def jsonstat_cubes(draw):
    n_dims = draw(st.integers(min_value=1, max_value=3))
    sizes = [draw(st.integers(min_value=1, max_value=4)) for _ in range(n_dims)]
    total = math.prod(sizes)
    dim_ids = [f"d{i}" for i in range(n_dims)]
    dimension = {
        d: {
            "category": {
                "index": {f"{d}c{j}": j for j in range(sz)},
            }
        }
        for d, sz in zip(dim_ids, sizes)
    }
    values = draw(
        st.lists(
            st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False)),
            min_size=total,
            max_size=total,
        )
    )
    return {"id": dim_ids, "size": sizes, "dimension": dimension, "value": values}


@settings(max_examples=100, deadline=None)
@given(jsonstat_cubes())
def test_jsonstat_decode_cardinality_and_labels(doc):
    points = list(decode_jsonstat(doc))
    nonnull = [v for v in doc["value"] if v is not None]
    assert len(points) == len(nonnull)
    # row-major order: values come back in offset order
    assert [v for _, v in points] == [float(v) for v in nonnull]
    for dims, _ in points:
        assert set(dims) == set(doc["id"])
        for d, label in dims.items():
            assert label.startswith(f"{d}c")  # resolved through the index


@settings(max_examples=50, deadline=None)
@given(jsonstat_cubes(), st.data())
def test_jsonstat_status_alignment(doc, data):
    total = len(doc["value"])
    status_keys = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=max(total - 1, 0)),
            max_size=3,
            unique=True,
        )
    )
    doc = {**doc, "status": {str(k): "p" for k in status_keys}}
    pts = list(decode_jsonstat_status(doc))
    # status attaches to exactly the points whose offset is flagged
    nonnull_offsets = [i for i, v in enumerate(doc["value"]) if v is not None]
    expected_flags = [
        "p" if off in status_keys else None for off in nonnull_offsets
    ]
    assert [s for _, _, s in pts] == expected_flags


# --- similarity bounds ----------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.frozensets(st.text(min_size=1, max_size=5), max_size=8),
    st.frozensets(st.text(min_size=1, max_size=5), max_size=8),
)
def test_jaccard_bounds_and_symmetry(a, b):
    j = _jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert j == _jaccard(b, a)
    if a and a == b:
        assert j == 1.0
    if not (a & b):
        assert j == 0.0


# --- connector policy invariants ------------------------------------------


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=1, max_value=5),
    st.floats(min_value=0.1, max_value=60.0),
    st.one_of(st.none(), st.floats(min_value=0.0, max_value=10**6)),
)
def test_backoff_never_exceeds_caps(attempts, base, retry_after):
    delays = backoff_delays(attempts, base_s=base, retry_after_s=retry_after)
    assert len(delays) == attempts
    assert all(d <= 120.0 for d in delays[:1])
    assert all(d <= 30.0 for d in delays[1:])


@settings(max_examples=50, deadline=None)
@given(st.lists(st.floats(min_value=0.0, max_value=1000.0), max_size=30))
def test_rate_limiter_never_admits_over_budget(stamps):
    rl = SlidingWindowRateLimiter(max_requests=5, window_s=10.0)
    admitted_in_window: list[float] = []
    for t in sorted(stamps):
        if rl.wait_time(t) == 0.0:
            rl.record(t)
            admitted_in_window.append(t)
            recent = [x for x in admitted_in_window if x > t - 10.0]
            assert len(recent) <= 5


# --- claim value parsing: differential vs the reference algorithm ----------
# (study_scraper/claims.py:136-155 _value_to_float, ported verbatim as
# the ground truth; the DuckDB twin of claim_value_sql is exercised via
# duckdb directly so all three implementations must agree)


def _reference_value_to_float(token: str):
    """Verbatim port of claims.py:136-155 (the semantics under test)."""
    try:
        if "," in token:
            head, tail = token.rsplit(",", 1)
            if tail.isdigit() and len(tail) == 3 and head.replace(".", "").isdigit():
                return float(token.replace(",", "").replace(".", ""))
            return float(token.replace(",", "."))
        if "." in token:
            head, tail = token.rsplit(".", 1)
            if tail.isdigit() and len(tail) == 3 and head.replace(",", "").isdigit():
                return float(token.replace(".", ""))
            return float(token)
        return float(token)
    except ValueError:
        return None


@st.composite
def _claim_tokens(draw):
    """Tokens shaped like the claim regexes produce: \\d+([.,]\\d+)? and
    dot/space-grouped thousands variants."""
    kind = draw(st.integers(0, 4))
    whole = draw(st.integers(0, 99999))
    if kind == 0:
        return str(whole)
    if kind == 1:
        frac = draw(st.integers(0, 99999))
        sep = draw(st.sampled_from([",", "."]))
        return f"{whole}{sep}{frac}"
    if kind == 2:  # dot-grouped thousands
        groups = draw(st.lists(st.integers(0, 999), min_size=1, max_size=3))
        return str(whole % 999) + "".join(f".{g:03d}" for g in groups)
    if kind == 3:  # thousands + decimal comma
        g = draw(st.integers(0, 999))
        frac = draw(st.integers(0, 99))
        return f"{whole % 999}.{g:03d},{frac}"
    return f"{whole % 999},{draw(st.integers(0, 999)):03d}"  # comma thousands


@given(_claim_tokens())
@settings(max_examples=300, deadline=None)
def test_claim_value_sql_matches_reference(token):
    import duckdb

    from elt_data4transformation_spark.functions.claims import claim_value_sql

    expected = _reference_value_to_float(token.replace(" ", ""))
    (got,) = (
        duckdb.connect()
        .execute("SELECT " + claim_value_sql(f"'{token}'"))
        .fetchone()
    )
    assert got == expected, (token, got, expected)


# --- PDF writer/extractor round-trip (operators/pdftext.py) ---------------
# The pdf_extract oracle only certifies the corpus texts; these pin the
# round-trip for ARBITRARY text, including PDF-delimiter characters,
# both string-literal encodings, and any page count.

_pdf_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",),  # no lone surrogates
        blacklist_characters="\x00",
    ),
    max_size=2000,
)


@given(_pdf_text)
@settings(max_examples=200, deadline=None)
def test_pdf_roundtrip_arbitrary_text(text):
    from elt_data4transformation_spark.operators import pdftext as P

    got = P.extract_pdf_text(P.make_pdf(text))
    assert " ".join(got.split()) == " ".join(text.split())


@given(st.integers(min_value=0, max_value=1200))
@settings(max_examples=30, deadline=None)
def test_pdf_page_count_matches_layout(n_words):
    from elt_data4transformation_spark.operators import pdftext as P

    text = " ".join(f"w{i}" for i in range(n_words))
    pdf = P.make_pdf(text)
    expect = max(1, -(-n_words // P.WORDS_PER_PAGE))
    assert P.count_pdf_pages(pdf) == expect


@given(st.binary(max_size=400))
@settings(max_examples=100, deadline=None)
def test_pdf_extractor_never_raises_on_garbage(data):
    from elt_data4transformation_spark.operators import pdftext as P

    out = P.extract_pdf_text(data)
    assert isinstance(out, str)
    assert isinstance(P.count_pdf_pages(data), int)


@given(
    st.lists(st.integers(0, 15), min_size=1, max_size=400),
    st.integers(2, 8),
)
@settings(max_examples=200, deadline=None)
def test_misra_gries_superset_guarantee(xs, k):
    """Any item with count > n/k must survive a single MG(k) pass."""
    from collections import Counter

    from elt_data4transformation_spark.operators.sketches import misra_gries

    surv = misra_gries(iter(xs), k)
    assert len(surv) <= k
    for item, c in Counter(xs).items():
        if c > len(xs) / k:
            assert item in surv, (item, c, len(xs), k, surv)


@given(
    st.lists(st.integers(0, 15), min_size=1, max_size=400),
    st.integers(2, 8),
    st.lists(st.integers(1, 50), min_size=1, max_size=6),
)
@settings(max_examples=200, deadline=None)
def test_partitioned_misra_gries_union_is_superset(xs, k, cuts):
    """The heavy_hitters query's two-phase correctness: the UNION of
    per-partition MG(k) survivors contains every GLOBAL item with
    count > n/k, for ANY partitioning (pigeonhole + per-pass
    guarantee) — so the exact recount restricted to candidates loses
    nothing."""
    from collections import Counter

    from elt_data4transformation_spark.operators.sketches import misra_gries

    parts, rest = [], xs
    for c in cuts:
        parts.append(rest[:c])
        rest = rest[c:]
    parts.append(rest)
    cand = set()
    for p in parts:
        cand |= set(misra_gries(iter(p), k))
    for item, c in Counter(xs).items():
        if c > len(xs) / k:
            assert item in cand, (item, c, len(xs), k)


@settings(max_examples=120, deadline=None)
@given(
    st.integers(0, 10_000),
    st.lists(
        st.tuples(st.integers(0, 5_000), st.integers(0, 255)),
        min_size=1,
        max_size=8,
    ),
    st.integers(0, 5_000),
)
def test_jpeg_decode_mutations_only_raise_valueerror(seed, muts, cut):
    """The quarantine contract as a PROPERTY (ADVICE round-6): for a
    valid JPEG arbitrarily byte-mutated and/or truncated, read_jpeg
    either decodes or raises ValueError — never KeyError/IndexError/
    struct.error, which would escape the callers' quarantine handlers
    and kill a Spark stage. Covers both writer shapes (4:4:4 plain and
    4:2:0 with restart markers)."""
    import numpy as np

    from elt_data4transformation_spark.operators import jpegcodec as J

    rng = np.random.default_rng(seed)
    w, h = 8 + seed % 12, 8 + seed % 7
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    if seed % 2:
        data = J.write_jpeg(w, h, px.tobytes(), 90)
    else:
        data = J.write_jpeg(
            w, h, px.tobytes(), 90, subsampling="420", restart_interval=2
        )
    mut = bytearray(data)
    for off, val in muts:
        mut[off % len(mut)] = val
    payload = bytes(mut)[: max(2, cut % (len(mut) + 1))]
    try:
        J.read_jpeg(payload)
    except ValueError:
        pass  # the one permitted failure mode


@settings(max_examples=100, deadline=None)
@given(
    st.integers(0, 10_000),
    st.lists(
        st.tuples(st.integers(0, 5_000), st.integers(0, 255)),
        min_size=1,
        max_size=8,
    ),
    st.integers(0, 5_000),
)
def test_container_codecs_mutations_only_raise_valueerror(seed, muts, cut):
    """Same quarantine property for the other binary decoders: AVI
    MJPEG containers, IMA ADPCM WAV, and PNG under arbitrary byte
    mutation/truncation either decode or raise ValueError (zlib.error
    and struct.error are also caught by every mapInPandas caller and
    count as quarantined) — nothing else may escape."""
    import struct as _struct
    import zlib

    import numpy as np

    from elt_data4transformation_spark.operators import (
        adpcmcodec,
        avicodec,
        jpegcodec,
        pngcodec,
    )

    rng = np.random.default_rng(seed)
    w, h = 8 + seed % 8, 8 + seed % 5
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    frame = jpegcodec.write_jpeg(w, h, px.tobytes(), 90)
    samples = (rng.integers(-3000, 3000, size=64)).astype(np.int16)
    from elt_data4transformation_spark.operators import pdftext

    payloads = {
        "avi": (avicodec.read_avi_mjpeg, avicodec.write_avi_mjpeg(w, h, [frame] * 2)),
        "adpcm": (adpcmcodec.read_wav_adpcm, adpcmcodec.write_wav_adpcm(samples, 8000)),
        "png": (pngcodec.read_png, pngcodec.write_png(w, h, px.tobytes())),
        # best-effort extractor: partial/empty text is fine, raising isn't
        "pdf": (
            lambda b: (pdftext.extract_pdf_text(b), pdftext.count_pdf_pages(b)),
            pdftext.make_pdf("Umfrage 42 Prozent " * 30),
        ),
    }
    quarantine = (ValueError, zlib.error, _struct.error)
    for name, (reader, data) in payloads.items():
        mut = bytearray(data)
        for off, val in muts:
            mut[off % len(mut)] = val
        payload = bytes(mut)[: max(2, cut % (len(mut) + 1))]
        try:
            reader(payload)
        except quarantine:
            pass  # the permitted (caller-caught) failure modes


# --- round-8 ask #5: fuzz the remaining decoders ---------------------------

_JSON_VALS = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(-5, 10**6)
    | st.floats(allow_nan=False, allow_infinity=False)
    | st.text(max_size=8),
    lambda ch: st.lists(ch, max_size=4)
    | st.dictionaries(st.text(max_size=6), ch, max_size=4),
    max_leaves=8,
)

# every structural location the decoder touches
_JSONSTAT_PATHS = [
    ("id",),
    ("size",),
    ("size", 0),
    ("size", 1),
    ("value",),
    ("value", 2),
    ("status",),
    ("status", "3"),
    ("dimension",),
    ("dimension", "geo"),
    ("dimension", "geo", "category"),
    ("dimension", "geo", "category", "index"),
    ("dimension", "geo", "category", "index", "DE"),
    ("dimension", "geo", "category", "label"),
    ("dimension", "geo", "category", "label", "DE"),
    ("dimension", "time", "category", "index"),
]


def _valid_jsonstat() -> dict:
    return {
        "id": ["geo", "time"],
        "size": [2, 3],
        "value": [1.0, None, 3.0, 4.0, 5.0, 6.0],
        "status": {"0": "p", "3": "e"},
        "dimension": {
            "geo": {
                "category": {
                    "index": {"DE": 0, "FR": 1},
                    "label": {"DE": "Germany", "FR": "France"},
                }
            },
            "time": {
                "category": {"index": {"2020": 0, "2021": 1, "2022": 2}}
            },
        },
    }


def _set_path(doc, path, val):
    node = doc
    for p in path[:-1]:
        try:
            node = node[p]
        except (KeyError, IndexError, TypeError):
            return  # an earlier mutation already changed the shape
    try:
        node[path[-1]] = val
    except (IndexError, TypeError):
        pass


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(_JSONSTAT_PATHS), _JSON_VALS),
        min_size=1,
        max_size=4,
    ),
    _JSON_VALS,
)
def test_jsonstat_decode_mutations_never_raise(muts, whole):
    """SURVEY M1's 'malformed indexes skipped' rule as a PROPERTY
    (round-7 VERDICT ask #5): decode_jsonstat / decode_jsonstat_status
    over a structurally mutated payload either yield well-typed points
    or skip — they may NEVER raise, because the mapInPandas callers
    trap only json.loads errors and anything escaping kills the Spark
    stage. Also feeds a wholly arbitrary JSON value as the doc."""
    import json as _j

    from elt_data4transformation_spark.operators.jsonstat import (
        decode_jsonstat,
        decode_jsonstat_status,
    )

    doc = _valid_jsonstat()
    for path, val in muts:
        _set_path(doc, path, val)
    # round-trip through JSON so the doc is exactly what json.loads
    # would hand the decoder (str keys, no tuples)
    doc = _j.loads(_j.dumps(doc))
    for dims, v in decode_jsonstat(doc):
        assert isinstance(v, float)
        assert all(
            isinstance(k, str) and isinstance(x, str)
            for k, x in dims.items()
        )
    for dims, v, stt in decode_jsonstat_status(doc):
        assert isinstance(v, float)
        assert stt is None or isinstance(stt, str)
    for _ in decode_jsonstat(whole if isinstance(whole, dict) else whole):
        pass


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(
                ["drop", "dup", "truncate_line", "mangle_k", "junk",
                 "swap", "cut_fields", "badval"]
            ),
            st.integers(0, 50),
        ),
        min_size=1,
        max_size=5,
    )
)
def test_cubefile_parse_mutations_never_raise(spark, muts):
    """Round-7 VERDICT ask #5 / round-6 ADVICE bug class as a
    PROPERTY: GENESIS cubefiles with missing/mangled/reordered
    K-headers, truncated or junk fact lines, and undecodable value
    tokens must parse to well-typed rows or drop the malformed lines
    — the column-expression decode may never raise (ANSI element_at/
    cast errors would kill the stage for EVERY cube in the batch)."""
    from elt_data4transformation_spark.operators import cubefile

    payload = cubefile.encode_cubefile(
        "99999FUZZ",
        axes=["A1", "A2"],
        time_var="JAHR",
        measures=[("M1", "EUR"), ("M2", "Anzahl")],
        facts=[
            ("x1", "y1", "2021", ("10,25", "e", "0"), ("3", "", "1")),
            ("x2", "y2", "2022", ("...", "", "0"), ("0,5", "p", "0")),
        ],
    )
    lines = payload.split("\n")
    for op, i in muts:
        if not lines:
            break
        i %= len(lines)
        if op == "drop":
            del lines[i]
        elif op == "dup":
            lines.insert(i, lines[i])
        elif op == "truncate_line":
            lines[i] = lines[i][: max(1, len(lines[i]) // 2)]
        elif op == "mangle_k":
            lines[i] = "K;" + lines[i]
        elif op == "junk":
            lines.insert(i, "Z;\x00;;;not;a;record")
        elif op == "swap":
            j = (i * 7 + 3) % len(lines)
            lines[i], lines[j] = lines[j], lines[i]
        elif op == "cut_fields":
            lines[i] = ";".join(lines[i].split(";")[:2])
        elif op == "badval":
            lines[i] = "D;x9;y9;2029;NaNe;q;0;0;zz,z;;0;0"
    mutated = "\n".join(lines)
    df = spark.createDataFrame(
        [("c0", mutated), ("c1", payload)], ["cube_id", "payload"]
    )
    hdr = cubefile.cube_headers(df).collect()
    assert len(hdr) == 2
    for r in cubefile.parse_cubefile(df).collect():
        assert r["value"] is None or isinstance(r["value"], float)
        assert r["locked"] is None or isinstance(r["locked"], bool)
        assert r["dims"] is None or isinstance(r["dims"], str)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(_JSONSTAT_PATHS), _JSON_VALS),
        min_size=1,
        max_size=4,
    )
)
def test_jsonstat_spark_variant_mutations_never_raise(spark, muts):
    """The pure-DataFrame flattener must share the decoder's
    quarantine contract: ANSI element_at on a size/id mismatch, %
    by a zero size, a missing dimension map key, or duplicate index
    positions would otherwise kill the stage for the whole batch.
    Several mutated payloads ride one DataFrame per example."""
    import json as _j

    from elt_data4transformation_spark.operators.jsonstat import (
        flatten_jsonstat_spark,
    )

    docs = []
    for i in range(3):
        doc = _valid_jsonstat()
        for path, val in muts[i % len(muts) :]:
            _set_path(doc, path, val)
        docs.append((f"r{i}", _j.dumps(doc)))
    docs.append(("ok", _j.dumps(_valid_jsonstat())))
    df = spark.createDataFrame(docs, "record_id string, payload string")
    rows = flatten_jsonstat_spark(df).collect()
    # the untouched payload always decodes its 5 non-null points
    assert len([r for r in rows if r["record_id"] == "ok"]) == 5
    for r in rows:
        assert r["value"] is None or isinstance(r["value"], float)


# --- round-9 ask #8: per-codec fuzz at the layer container fuzz misses -----


@settings(max_examples=120, deadline=None)
@given(
    st.integers(0, 10_000),
    st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(0, 255)),
        min_size=1,
        max_size=6,
    ),
    st.integers(0, 10_000),
)
def test_png_idat_filter_mutations_only_raise_valueerror(seed, muts, cut):
    """Round-9 VERDICT ask #8: PNG quarantine at the FILTER layer.
    Whole-file mutation (the container property above) nearly always
    dies in the zlib stream or a chunk CRC before the filter dispatch
    runs. Here the POST-zlib raw scanline bytes are mutated (filter
    type bytes included — 5..255 are invalid) and/or truncated, then
    re-deflated with the chunk CRC recomputed, so the decode reaches
    the filter/reconstruction code with arbitrary garbage. Contract:
    decode or ValueError — never IndexError/KeyError out of the
    filter tables."""
    import struct as _struct
    import zlib

    import numpy as np

    from elt_data4transformation_spark.operators import pngcodec as P

    rng = np.random.default_rng(seed)
    w, h = 4 + seed % 9, 4 + seed % 6
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    data = P.write_png(w, h, px.tobytes())
    # parse the writer's chunks to get the IHDR body and IDAT payload
    pos, ihdr, idat = 8, None, b""
    while pos + 8 <= len(data):
        (n,) = _struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + n]
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat += body
        pos += 12 + n
    raw = bytearray(zlib.decompress(idat))
    for off, val in muts:
        raw[off % len(raw)] = val
    payload = bytes(raw)[: max(1, cut % (len(raw) + 1))]
    rebuilt = (
        data[:8]
        + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"IDAT", zlib.compress(payload))
        + P._chunk(b"IEND", b"")
    )
    try:
        P.read_png(rebuilt)
    except ValueError:
        pass  # the one permitted failure mode


@settings(max_examples=150, deadline=None)
@given(
    st.integers(0, 10_000),
    st.integers(-32768, 32767),
    st.integers(0, 255),
    st.integers(0, 255),
    st.integers(0, 65535),
)
def test_adpcm_block_header_mutations_only_raise_valueerror(
    seed, pred, index_byte, reserved, align
):
    """Round-9 VERDICT ask #8: IMA ADPCM quarantine at the BLOCK
    layer. The per-block header (int16 predictor, step index,
    reserved) and the fmt chunk's block_align are overwritten with
    arbitrary values IN PLACE (RIFF framing stays valid, so the
    decode always reaches the block loop). index > 88 must raise
    ValueError — not index the 89-entry step table out of range;
    block_align < 4 must report a truncated block, not loop or
    divide by zero."""
    import struct as _struct

    import numpy as np

    from elt_data4transformation_spark.operators import adpcmcodec as A

    rng = np.random.default_rng(seed)
    samples = rng.integers(-3000, 3000, size=300).astype(np.int16)
    data = bytearray(A.write_wav_adpcm(samples, 8000))
    # patch the first block header (4 bytes after the data chunk id+len)
    di = bytes(data).index(b"data") + 8
    data[di : di + 4] = _struct.pack("<hBB", pred, index_byte, reserved)
    # patch fmt block_align (fmt body offset 12: <HHIIHH -> 2+2+4+4)
    fi = bytes(data).index(b"fmt ") + 8 + 12
    data[fi : fi + 2] = _struct.pack("<H", align)
    try:
        A.read_wav_adpcm(bytes(data))
    except ValueError:
        pass  # the one permitted failure mode
