"""Non-ASCII coverage for the general (Unicode) tokenizer.

The fixture corpus is ASCII-only, where ``wordcount_unicode``
degenerates to the ASCII wordcount — so the oracle parity check never
exercises the inputs where ``[^\\p{L}]+`` actually matters. These
tests pin the multilingual behavior directly: expected token lists on
accented/Cyrillic/CJK text, and Java-regex ≡ DuckDB-RE2 agreement on
the same strings (the premise of the wordcount_unicode oracle).
"""

from __future__ import annotations

from dist_map_reduce_spark.operators.wordcount import (
    TOKEN_PATTERN_UNICODE,
    words,
)

TEXTS = [
    (1, "Café déjà-vu naïve"),
    (2, "日本語のテキスト and English"),
    (3, "Привет мир 123 foo_bar"),
    (4, "mixé: ñandú 漢字42字"),
    (5, "--- 42 ---"),  # no letters at all -> no tokens
]

EXPECTED = {
    1: ["Café", "déjà", "vu", "naïve"],
    2: ["日本語のテキスト", "and", "English"],
    3: ["Привет", "мир", "foo", "bar"],
    4: ["mixé", "ñandú", "漢字", "字"],
    5: [],
}


def test_unicode_tokenizer_non_ascii(spark):
    docs = spark.createDataFrame(TEXTS, "doc_id long, text string")
    got = words(docs, pattern=TOKEN_PATTERN_UNICODE).collect()
    by_doc: dict[int, list[str]] = {doc_id: [] for doc_id, _ in TEXTS}
    for row in got:
        by_doc[row.doc_id].append(row.word)
    # words() preserves within-document token order (explode of split)
    assert by_doc == EXPECTED


def test_unicode_tokenizer_matches_duckdb_re2(spark, duck):
    """Java regex and RE2 both implement \\p{L}; their Unicode tables
    can drift between versions, so assert they agree on the actual
    scripts used here (Latin-with-diacritics, Cyrillic, Han,
    Hiragana/Katakana) — the exact premise the wordcount_unicode
    oracle rests on."""
    docs = spark.createDataFrame(TEXTS, "doc_id long, text string")
    spark_tokens = {
        (r.doc_id, r.word)
        for r in words(docs, pattern=TOKEN_PATTERN_UNICODE).collect()
    }
    duck.execute("CREATE OR REPLACE TABLE _unicode_docs (doc_id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO _unicode_docs VALUES (?, ?)", TEXTS)
    duck_tokens = {
        (doc_id, word)
        for doc_id, word in duck.execute(
            r"""
            SELECT doc_id, unnest(string_split_regex(text, '[^\p{L}]+')) AS word
            FROM _unicode_docs
            """
        ).fetchall()
        if word != ""
    }
    assert spark_tokens == duck_tokens


def test_bpe_pretokenizer_arms_java_equals_re2(spark):
    """The fixture corpus is ASCII word soup, so the oracle parity
    check for text_bpe_pretoken_counts never exercises contractions,
    Unicode letter runs, digit runs, or punctuation runs. Pin the
    split on crafted inputs: expected token lists, and Java-regex ≡
    DuckDB-RE2 agreement on the same strings (the premise of the
    oracle)."""
    import duckdb
    from pyspark.sql import functions as F

    from dist_map_reduce_spark.functions.text_bpe import PRETOKEN_PATTERN

    texts = [
        (1, "don't we'll I'm it's"),
        (2, "Café costs 42 euros—really?!"),
        (3, "Привет мир 3.14"),
        (4, "  double  spaces  "),
        (5, "漢字42字 mixed"),
    ]
    expected = {
        1: ["don", "'t", " we", "'ll", " I", "'m", " it", "'s"],
        2: ["Café", " costs", " 42", " euros", "—", "really", "?!"],
        3: ["Привет", " мир", " 3", ".", "14"],
        4: ["  ", "double", "  ", "spaces", "  "],
        5: ["漢字", "42", "字", " mixed"],
    }
    df = spark.createDataFrame(texts, "doc_id int, text string").select(
        "doc_id",
        F.regexp_extract_all(
            "text", F.lit(PRETOKEN_PATTERN), F.lit(0)
        ).alias("toks"),
    )
    got_spark = {r.doc_id: r.toks for r in df.collect()}
    assert got_spark == expected

    con = duckdb.connect()
    sql_pat = PRETOKEN_PATTERN.replace("'", "''")
    got_duck = {
        i: con.execute(
            f"SELECT regexp_extract_all(?, '{sql_pat}')", [t]
        ).fetchone()[0]
        for i, t in texts
    }
    assert got_duck == expected
