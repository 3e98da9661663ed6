"""Crafted-string tests for the quality gate and PII redaction —
the behaviors the synthetic corpus (clean, single-line, all-alpha)
cannot exercise."""

from __future__ import annotations


def test_quality_filter_rules(spark):
    from pyspark.sql import functions as F

    from cae_polars_tools_spark.operators.text import (
        QUALITY_MIN_STOPWORDS,
        QUALITY_MIN_WORDS,
        quality_signals,
    )

    good = "the quick brown fox jumps over the lazy dog " * 10  # 90 words, stopwords
    short = "too short"
    no_stop = "alpha beta gamma delta " * 20  # no stopwords
    numeric = "123 456 789 000 " * 20  # fails alpha_frac
    df = spark.createDataFrame(
        [(1, good.strip()), (2, short), (3, no_stop.strip()), (4, numeric.strip())],
        ["doc_id", "text"],
    )
    s = quality_signals("text")
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", *[e.alias(n) for n, e in s.items()]
        ).collect()
    }
    assert rows[1]["n_words"] >= QUALITY_MIN_WORDS
    assert rows[1]["n_stopwords"] >= QUALITY_MIN_STOPWORDS
    assert rows[2]["n_words"] < QUALITY_MIN_WORDS
    assert rows[3]["n_stopwords"] == 0
    assert rows[4]["alpha_frac"] == 0.0
    # "the quick brown fox jumps over the lazy dog" = 35 chars / 9 words
    assert abs(rows[1]["mean_word_len"] - (35 / 9)) < 1e-12


def test_redact_pii_crafted_strings(spark):
    from pyspark.sql import functions as F

    from cae_polars_tools_spark.operators.text import redact_pii

    cases = [
        (1, "contact me at jane.doe+spam@example.co.uk today", "<EMAIL>"),
        (2, "server at 192.168.0.1 went down", "<IP>"),
        (3, "call +1 (555) 123-4567 now", "<PHONE>"),
        (4, "no pii here at all", None),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in cases], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r["red"]
        for r in df.select(
            "doc_id", redact_pii("text").alias("red")
        ).collect()
    }
    assert out[1] == "contact me at <EMAIL> today"
    assert out[2] == "server at <IP> went down"
    assert "<PHONE>" in out[3] and "555" not in out[3]
    assert out[4] == "no pii here at all"


def test_redact_pii_matches_duckdb_dialect(spark):
    """The PII regexes must mean the same thing to Java regex and
    DuckDB/RE2 — the property the corpus oracle relies on, checked on
    strings that actually contain PII (the corpus is clean)."""
    import duckdb

    from cae_polars_tools_spark.operators.text import (
        PII_REDACT_SQL,
        redact_pii,
    )

    texts = [
        "a@b.io and c.d-e@f-g.h2z.com mixed with 10.0.0.255 and +44 20 7946 0958",
        "edge: 1.2.3.4.5 partial, x@y.z not-an-ip 999.999.999.999",
        "(555) 000-1111 ext and bare digits 12345678901",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "text"])
    spark_out = {
        r["i"]: r["red"]
        for r in df.select("i", redact_pii("text").alias("red")).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        duck = con.execute(
            f"SELECT {PII_REDACT_SQL} FROM (SELECT ? AS text)", [t]
        ).fetchone()[0]
        assert spark_out[i] == duck, (i, spark_out[i], duck)


def test_repetition_signals_crafted_strings(spark):
    """Crafted documents pin the signal semantics: a heavily repeated
    bigram, a fully distinct text, and the one-word edge (empty bigram
    array, not a descending-sequence artifact)."""
    from pyspark.sql import functions as F

    from cae_polars_tools_spark.operators.text import repetition_signals

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),       # one bigram repeated 3x
            (2, "all words are different"),   # no repetition
            (3, "solo"),                      # one word: no bigrams
        ],
        "doc_id long, text string",
    )
    s = repetition_signals("text")
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            s["n_words"].alias("n_words"),
            s["dup_word_frac"].alias("dup_word_frac"),
            s["bigrams"].alias("bigrams"),
        ).collect()
    }
    assert rows[1]["n_words"] == 4
    assert rows[1]["dup_word_frac"] == 0.75  # 1 distinct of 4
    assert rows[1]["bigrams"] == ["spam spam"] * 3
    assert rows[2]["dup_word_frac"] == 0.0
    assert rows[2]["bigrams"] == [
        "all words", "words are", "are different"
    ]
    assert rows[3]["n_words"] == 1
    assert rows[3]["bigrams"] == []


def test_repetition_signals_accept_column_argument(spark):
    """The helper takes a Column, not just a name (regression: an
    earlier draft formatted the column name into F.expr)."""
    from pyspark.sql import functions as F

    from cae_polars_tools_spark.operators.text import repetition_signals

    df = spark.createDataFrame([(1, "A B a b")], "doc_id long, t string")
    s = repetition_signals(F.lower(F.col("t")))
    (row,) = df.select(
        s["dup_word_frac"].alias("f"), s["bigrams"].alias("b")
    ).collect()
    assert row["f"] == 0.5  # lowercased: a b a b → 2 distinct of 4
    assert row["b"] == ["a b", "b a", "a b"]


def test_html_to_text_semantics(spark):
    """Crafted-markup semantics of the extraction chain: script/style/
    comment removal, block tags as breaks, entity decode order
    (&amp;lt; stays literal '&lt;'), whitespace collapse."""
    from cae_polars_tools_spark.operators.text import html_to_text

    cases = {
        "<p>Hello <b>world</b></p>": "Hello world",
        "<script>var x = '<p>';</script>after": "after",
        "<style>p { color: red }</style>text": "text",
        "<!-- secret -->visible": "visible",
        "a &lt;tag&gt; &amp; more": 'a <tag> & more',
        "&amp;lt; stays entity": "&lt; stays entity",
        "one<br>two<div>three</div>": "one two three",
        "  spaced   \t out  ": "spaced out",
        "<SCRIPT>UPPER</SCRIPT>kept": "kept",  # case-insensitive
    }
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(cases)], "id long, text string"
    )
    got = {
        r["id"]: r["clean"]
        for r in df.select(
            "id", html_to_text("text").alias("clean")
        ).collect()
    }
    for i, (src, want) in enumerate(cases.items()):
        assert got[i] == want, (src, got[i])


def test_normalize_unicode_semantics(spark):
    """NFC composes the decomposed é; NFKC folds the ﬁ ligature and
    full-width digits; casefold maps ß→ss (lower would not); the
    confusable fold maps the Cyrillic homoglyph 'а' to Latin 'a'."""
    from cae_polars_tools_spark.operators.text import normalize_unicode

    nfd_cafe = "café"  # e + combining acute
    rows = [
        (0, nfd_cafe),
        (1, "café"),  # precomposed
        (2, "ﬁle STRASSE straße"),  # ﬁ ligature + ß
        (3, "pаypal"),  # Cyrillic а
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id",
            normalize_unicode(
                "text", form="NFKC", casefold=True, fold_confusables=True
            ).alias("n"),
        ).collect()
    }
    assert got[0] == got[1] == "café"
    assert got[2] == "file strasse strasse"
    assert got[3] == "paypal"
    # NFC keeps compatibility forms (ligature survives)
    nfc_only = df.filter("doc_id = 2").select(
        normalize_unicode("text", form="NFC", casefold=False).alias("n")
    ).first()["n"]
    assert nfc_only.startswith("ﬁle")
    import pytest

    with pytest.raises(ValueError, match="form must be one of"):
        normalize_unicode("text", form="NFX")


def test_normalized_unicode_collapses_in_exact_dedup(spark):
    """The point of the operator: NFC-vs-NFD duplicates that
    dedup_exact's raw fingerprint keeps apart collapse to ONE group
    once the text is canonicalized first."""
    from cae_polars_tools_spark.operators.text import (
        fingerprint,
        normalize_unicode,
    )

    df = spark.createDataFrame(
        [(0, "café menu"), (1, "café menu"), (2, "other doc")],
        "doc_id long, text string",
    )
    raw = df.select(fingerprint("text").alias("fp")).distinct().count()
    assert raw == 3  # byte-different twins survive the raw fingerprint
    canon = (
        df.select(
            fingerprint(normalize_unicode("text", form="NFC")).alias("fp")
        )
        .distinct()
        .count()
    )
    assert canon == 2  # twins share a fingerprint after canonicalization
