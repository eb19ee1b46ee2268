"""Scalar-function parity tests against the reference semantics
(SURVEY.md §5.2; citations into /root/reference/etl_ui.py)."""

import re

from pyspark.sql import functions as F

from fefal_etl_spark.functions import (
    encode_existe_responsavel,
    encode_sim_nao_null,
    encode_sim_nao_tristate,
    extract_content_in_brackets,
    is_numeric_string,
    normalize_text,
    py_normalize_text,
    remove_entity_prefixes,
    round_half_even,
    split_sentences,
    split_sentences_portable,
    to_numeric_coerce,
    to_timestamp_coerce,
    validate_numeric,
)


def run1(spark, col_expr, values, in_type="string"):
    df = spark.createDataFrame([(v,) for v in values], f"v {in_type}")
    return [r[0] for r in df.select(col_expr(F.col("v")).alias("o")).collect()]


# --- F1 normalize_text (etl_ui.py:322-331) ---------------------------------

NORM_CASES = [
    ("  Município   de  AVEIRO ", "municipio de aveiro"),
    ("São João\tda\nMadeira", "sao joao da madeira"),
    ("ÀÁÂÃÄ çÇ éêí óôõ úü ñ", "aaaaa cc eei ooo uu n"),
    ("already plain", "already plain"),
    ("", ""),
    (None, ""),
    ("   ", ""),
]


def test_normalize_text_matches_python_reference(spark):
    got = run1(spark, normalize_text, [v for v, _ in NORM_CASES])
    for (src, want), g in zip(NORM_CASES, got):
        assert g == want, (src, g)
        # driver-side twin agrees (used for column-name metadata ops)
        assert py_normalize_text(src) == want


def test_normalize_idempotent(spark):
    vals = [v for v, _ in NORM_CASES if v]
    once = run1(spark, normalize_text, vals)
    twice = run1(spark, normalize_text, once)
    assert once == twice


# --- F2 remove_prefixes (etl_ui.py:52-56, 22-25) ---------------------------


def test_remove_entity_prefixes(spark):
    cases = [
        ("Município de Aveiro", "aveiro"),
        ("Camara Municipal  de  Braga", "braga"),
        ("CM Lisboa", "lisboa"),
        ("C M Porto", "porto"),
        ("Freguesia de Alvalade", "alvalade"),
        ("União das Freguesias de X e Y", "x e y"),
        ("Junta de Freguesia do Beato", "beato"),
        ("Hospital de Braga", "hospital de braga"),  # no entity prefix
        ("Municipality of Foo", "municipality of foo"),  # EN doesn't match
    ]
    got = run1(spark, remove_entity_prefixes, [c for c, _ in cases])
    for (src, want), g in zip(cases, got):
        assert g == want, (src, g)


# --- F3 extract_content_in_brackets (etl_ui.py:57-62) ----------------------


def test_extract_content_in_brackets(spark):
    cases = [
        ("Quantos formandos? [Excel Avançado]", "Excel Avançado"),
        ("[A] e [B]", "A"),  # first match only
        ("sem brackets  ", "sem brackets"),  # fallback = trimmed original
        ("Presencial - [Manhã]", "Manhã"),
        ("[]", ""),  # empty group
        ("[ x ]", "x"),  # group content trimmed
    ]
    got = run1(spark, extract_content_in_brackets, [c for c, _ in cases])
    for (src, want), g in zip(cases, got):
        assert g == want, (src, g)


# --- F8/F9/F10 encodings (etl_ui.py:263-270, 289-293, 408) -----------------


def test_encodings_asymmetry(spark):
    vals = ["Sim", "sim ", "Não", "nao", "NÃO ", "talvez", "", None, "1"]
    f8 = run1(spark, encode_sim_nao_null, vals)
    f9 = run1(spark, encode_sim_nao_tristate, vals)
    f10 = run1(spark, encode_existe_responsavel, vals)
    assert f8 == [1, 1, 0, 0, 0, None, None, None, None]
    assert f9 == [1, 1, 0, 0, 0, -1, -1, -1, -1]
    # F10 lowercases but does NOT strip accents or whitespace:
    # "nao" → NULL, "não" → 0, "sim " (trailing space) → NULL
    assert f10 == [1, None, 0, None, None, None, None, None, None]


# --- F11 numeric-string detection (etl_ui.py:542-543) ----------------------


def test_is_numeric_string_matches_python(spark):
    vals = ["12", "3.0", " 42 ", "12.", ".5", "1.2.3", "-3", "1e5", "abc", "", None]

    def ref(t):  # the reference's test: texto.replace(".", "", 1).isdigit()
        if t is None:
            return False
        return t.strip().replace(".", "", 1).isdigit()

    got = run1(spark, is_numeric_string, vals)
    for v, g in zip(vals, got):
        assert bool(g) == ref(v), v


# --- F15/F16 numeric coercions (etl_ui.py:180, 227-232) --------------------


def test_validate_numeric(spark):
    cases = [
        ("7", 7),
        ("3.9", 3),  # int(float()) truncates
        ("-5", 0),  # clamped
        ("-0.9", 0),
        ("abc", 0),  # parse failure → 0
        ("", 0),
        (None, 0),
        (" 42 ", 42),
        ("1e2", 100),  # float("1e2") works in the reference too
    ]
    got = run1(spark, validate_numeric, [c for c, _ in cases])
    for (src, want), g in zip(cases, got):
        assert g == want, (src, g)


def test_to_numeric_coerce(spark):
    got = run1(spark, to_numeric_coerce, ["1.5", "abc", None, " 2 "])
    assert got == [1.5, None, None, 2.0]


# --- F12 timestamp coercion ------------------------------------------------


def test_to_timestamp_coerce(spark):
    got = run1(spark, to_timestamp_coerce, ["2024-01-02 03:04:05", "garbage", None])
    assert got[0] is not None and got[0].year == 2024
    assert got[1] is None and got[2] is None


# --- F17 banker's rounding (etl_ui.py:184) ---------------------------------


def test_round_half_even_matches_numpy(spark):
    import numpy as np

    vals = [0.5, 1.5, 2.5, 3.5, -0.5, -1.5, 2.4, 2.6]
    got = run1(spark, lambda c: round_half_even(c), vals, in_type="double")
    want = [float(np.round(v)) for v in vals]
    assert got == want


# --- X2 sentence split vs the reference's exact Python regex ---------------

REF_SPLIT = r"(?<=[.!?;/|])\s+|,\s+(?=[A-ZÁÉÍÓÚÂÊÎÔÛÃÕÇ])"


def ref_split(texto):
    if not isinstance(texto, str) or not texto.strip():
        return []
    frases = re.split(REF_SPLIT, texto.strip())
    return [f.strip() for f in frases if f.strip()]


SENT_CASES = [
    "Bom. Queremos mais! Sim; ok",
    "Primeira frase, Segunda maiúscula, terceira minúscula não separa",
    "Multi  espaços.   Depois | pipe / barra",
    "Á acentuada, Ção próxima",
    "sem pontuacao nenhuma",
    "", None, "   ",
    "fim com ponto. ",
    "a.. b",
]


def test_split_sentences_matches_reference_regex(spark):
    got = run1(spark, split_sentences, SENT_CASES)
    for src, g in zip(SENT_CASES, got):
        assert list(g) == ref_split(src), (src, g)


def test_split_sentences_portable_equivalent(spark):
    exact = run1(spark, split_sentences, SENT_CASES)
    portable = run1(spark, split_sentences_portable, SENT_CASES)
    assert exact == portable


# --- F4-F7, F19 remaining scalar helpers -----------------------------------


def test_entity_key_and_helpers(spark):
    from pyspark.sql import functions as F

    from fefal_etl_spark.functions import (
        clean_header,
        contains_any,
        entity_key,
        to_lisbon,
        truncate_ellipsis,
    )

    df = spark.createDataFrame(
        [("aveiro", "municipios", "A\nB ", "Gestão[comentario]", "x" * 80)],
        "a string, b string, h string, k string, long_s string",
    )
    row = df.select(
        entity_key(F.col("a"), F.col("b")).alias("key"),
        clean_header(F.col("h")).alias("h"),
        contains_any(F.col("k"), ["comentario"]).alias("is_comment"),
        contains_any(F.col("k"), ["formandos"]).alias("is_formando"),
        contains_any(F.col("k"), []).alias("empty_keys"),
        truncate_ellipsis(F.col("long_s")).alias("trunc"),
    ).collect()[0]
    assert row["key"] == "aveiro||municipios"  # etl_ui.py:92-93
    assert row["h"] == "A B"
    assert row["is_comment"] is True and row["is_formando"] is False
    assert row["empty_keys"] is False
    assert row["trunc"] == "x" * 70 + "..." and len(row["trunc"]) == 73


def test_to_lisbon_tz(spark):
    from pyspark.sql import functions as F

    from fefal_etl_spark.functions import to_lisbon

    df = spark.createDataFrame(
        [("2024-07-01 12:00:00",), ("2024-01-01 12:00:00",)], "ts string"
    )
    got = [
        r["l"].hour
        for r in df.select(
            to_lisbon(F.col("ts").cast("timestamp")).alias("l")
        ).collect()
    ]
    assert got == [13, 12]  # WEST (UTC+1) in July, WET (UTC+0) in January
