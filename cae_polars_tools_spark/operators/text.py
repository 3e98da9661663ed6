"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are JVM-side built-ins (split / filter /
aggregate / regexp) — whole-stage-codegen friendly, no Python in the
row path. The one Pandas-UDF operator (char-n-gram language ID) is
Arrow-batched and clearly marked.

These have no counterpart in the reference (its data model has no
strings, SURVEY §2.2 'ABSENT'); they're the north-star extensions for
LLM data pipelines, designed operator-by-operator for 100 TB:
per-document expressions are embarrassingly parallel — zero shuffles.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cae_polars_tools_spark.io import (
    SPREAD_HEAVY_BYTES,
    SPREAD_NO_CAP,
    read_table,
    spread,
)
from cae_polars_tools_spark.plans.registry import register

# Word-tokenization shared by text + dedup operators. Single-space
# split matches the synthetic corpus; swap for a regex in real data.
TOKEN_SPLIT = " "
# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
BPE_REGEX = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"
STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "on", "is", "for")

LANG_MARKERS = {
    "en": ("the", "a", "and", "of", "is"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
}


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, TOKEN_SPLIT)


def normalized(col: Column | str) -> Column:
    """Whitespace-collapsed lowercase normalization (dedup canonical form)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(c), r"\s+", " ")


def fingerprint(col: Column | str) -> Column:
    """128-bit document fingerprint: md5 of the normalized text.
    Deterministic, engine-portable, collision-safe at any corpus size."""
    return F.md5(normalized(col))


NORMALIZED_SQL = "regexp_replace(lower(text), '\\s+', ' ', 'g')"
FINGERPRINT_SQL = f"md5({NORMALIZED_SQL})"


# A pragmatic single-codepoint confusable fold (Unicode TR39's idea,
# not its full data table): the Cyrillic and Greek letters that render
# identically to Basic Latin in most fonts — the homoglyphs actually
# seen in spam/SEO corpora. Applied AFTER casefold, so only lowercase
# mappings are needed. Deliberately small and documented rather than
# shipping a 10k-row table nobody audits.
CONFUSABLES = {
    # Cyrillic
    "а": "a", "е": "e", "о": "o", "р": "p", "с": "c", "х": "x",
    "у": "y", "і": "i", "ѕ": "s", "ј": "j", "ԁ": "d", "ɡ": "g",
    # Greek
    "ο": "o", "α": "a", "ν": "v", "τ": "t", "κ": "k", "ρ": "p",
}
_CONFUSABLE_TRANS = str.maketrans(CONFUSABLES)

_UNICODE_FORMS = ("NFC", "NFD", "NFKC", "NFKD")


def normalize_unicode(
    col: Column | str,
    form: str = "NFC",
    casefold: bool = True,
    fold_confusables: bool = False,
) -> Column:
    """Unicode canonicalization — the pre-dedup stage every
    multilingual corpus needs BEFORE :func:`fingerprint`: a composed
    "é" (U+00E9) and its decomposed twin "e"+U+0301 are byte-different
    md5 inputs but the same text to every reader, so without this an
    exact-dedup pass silently keeps both.

    Pipeline (each step optional/configurable): ``unicodedata
    .normalize(form)`` (NFC canonical-composes; NFKC additionally
    folds compatibility forms — ligatures, full-width digits), then
    ``str.casefold()`` (the Unicode case fold — maps ß→ss where
    ``lower`` doesn't), then the documented ``CONFUSABLES`` homoglyph
    fold. Arrow-batched pandas UDF (per-document, embarrassingly
    parallel, zero shuffle); DuckDB's ``nfc_normalize()`` gives the
    NFC path a value-level cross-engine oracle
    (``text_normalize``)."""
    if form not in _UNICODE_FORMS:
        raise ValueError(
            f"normalize_unicode: form must be one of {_UNICODE_FORMS}, "
            f"got {form!r}"
        )
    c = F.col(col) if isinstance(col, str) else col

    @F.pandas_udf("string")
    def norm(s: pd.Series) -> pd.Series:
        import unicodedata

        def one(t):
            if t is None:
                return None
            t = unicodedata.normalize(form, t)
            if casefold:
                t = t.casefold()
            if fold_confusables:
                t = t.translate(_CONFUSABLE_TRANS)
            return t

        return s.map(one)

    return norm(c)


# ---------------------------------------------------------------------------
# Corpus entries
# ---------------------------------------------------------------------------


@register(
    "text_stats",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   length(text) AS n_chars,
                   string_split(text, ' ') AS toks,
                   regexp_extract_all(text, '{BPE_REGEX}') AS bpe
            FROM documents
        )
        SELECT doc_id,
               n_chars,
               len(toks) AS n_tokens,
               len(bpe) AS n_bpe_tokens,
               CAST(n_chars AS DOUBLE) / len(toks) AS chars_per_token,
               CAST(len(list_filter(toks, x -> x IN {STOPWORDS!r})) AS DOUBLE)
                   / len(toks) AS stopword_ratio
        FROM t
    """.replace("'{BPE_REGEX}'", f"'{BPE_REGEX}'"),
    tags=("text", "extension"),
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring statistics per document: length, whitespace and
    BPE-ish token counts, chars/token, stopword ratio. Pure per-row
    expressions — no shuffle at any scale."""
    # JVM-only downstream (split/regex/HOF filters — no Python worker):
    # no byte cap, full fan-out (SPREAD_NO_CAP rationale in io.py; cold
    # driver-methodology A/B: 0.47 -> 0.29 s vs the 256 KiB cap)
    d = spread(
        read_table(spark, sf_dir, "documents"), target_bytes=SPREAD_NO_CAP
    )
    toks = tokens("text")
    bpe = F.regexp_extract_all(F.col("text"), F.lit(BPE_REGEX), 0)
    n_toks = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_toks.alias("n_tokens"),
        F.size(bpe).alias("n_bpe_tokens"),
        (F.length("text").cast("double") / n_toks).alias("chars_per_token"),
        (n_stop.cast("double") / n_toks).alias("stopword_ratio"),
    )


def _marker_count(toks: Column, markers: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))


@register(
    "text_language_id",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), s AS (
            SELECT doc_id,
               len(list_filter(toks, x -> x IN ('the','a','and','of','is'))) AS c_en,
               len(list_filter(toks, x -> x IN ('el','la','de','que','y'))) AS c_es,
               len(list_filter(toks, x -> x IN ('der','die','das','und','ist'))) AS c_de,
               len(list_filter(toks, x -> x IN ('le','la','les','et','est'))) AS c_fr
            FROM t
        )
        SELECT doc_id,
               CASE
                 WHEN greatest(c_en, c_es, c_de, c_fr) = 0 THEN 'und'
                 WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
                 WHEN c_es >= c_de AND c_es >= c_fr THEN 'es'
                 WHEN c_de >= c_fr THEN 'de'
                 ELSE 'fr'
               END AS detected_lang
        FROM s
    """,
    tags=("text", "extension"),
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID (deterministic heuristic; precedence
    en>es>de>fr on ties, 'und' when no markers hit). The char-n-gram
    profile variant is `text_language_chargram`."""
    # JVM-only downstream — same SPREAD_NO_CAP rationale as text_stats
    # (cold A/B: 0.46 -> 0.37 s vs the 256 KiB cap)
    d = spread(
        read_table(spark, sf_dir, "documents"), target_bytes=SPREAD_NO_CAP
    )
    toks = tokens("text")
    counts = {
        lang: _marker_count(toks, markers).alias(f"c_{lang}")
        for lang, markers in LANG_MARKERS.items()
    }
    s = d.select("doc_id", *counts.values())
    best = F.greatest(F.col("c_en"), F.col("c_es"), F.col("c_de"), F.col("c_fr"))
    detected = (
        F.when(best == 0, F.lit("und"))
        .when(
            (F.col("c_en") >= F.col("c_es"))
            & (F.col("c_en") >= F.col("c_de"))
            & (F.col("c_en") >= F.col("c_fr")),
            F.lit("en"),
        )
        .when((F.col("c_es") >= F.col("c_de")) & (F.col("c_es") >= F.col("c_fr")), F.lit("es"))
        .when(F.col("c_de") >= F.col("c_fr"), F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return s.select("doc_id", detected.alias("detected_lang"))


@register(
    "text_fingerprint",
    oracle=f"""
        SELECT doc_id,
               {FINGERPRINT_SQL} AS fp,
               length({NORMALIZED_SQL}) AS n_norm_chars
        FROM documents
    """,
    tags=("text", "extension"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over normalized text (the exact-dedup
    key). Per-row, shuffle-free."""
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        fingerprint("text").alias("fp"),
        F.length(normalized("text")).alias("n_norm_chars"),
    )


_CHARGRAM_PROFILES = {
    "en": ("the", "ing", "ion", "and", "ed "),
    "es": ("que", "ión", "ado", "la ", "os "),
    "de": ("der", "ein", "ich", "sch", "en "),
    "fr": ("les", "ent", "tio", "eur", "de "),
}


def _chargram_oracle() -> str:
    """DuckDB twin of the pandas-UDF scorer: non-overlapping substring
    counts via the length-difference identity
    ``(len(t) - len(replace(t, g, ''))) / len(g)`` (replace and
    regex-findall are both greedy left-to-right, so the counts agree),
    argmax with the same first-max tie-break as ``numpy.argmax`` over
    the sorted language order, 'und' when every score is zero.

    PRECONDITION (asserted by tests/test_corpus_oracle.py::
    test_corpus_text_is_ascii): DuckDB ``length`` counts CHARACTERS
    while the UDF counts over the raw string — identical only for
    ASCII text, which the synthetic corpus is."""
    langs = sorted(_CHARGRAM_PROFILES)
    score = {
        lang: " + ".join(
            f"(length(t) - length(replace(t, '{g}', ''))) / {len(g)}"
            for g in _CHARGRAM_PROFILES[lang]
        )
        for lang in langs
    }
    cols = ",\n                   ".join(
        f"CAST({score[lang]} AS BIGINT) AS c_{lang}" for lang in langs
    )
    # numpy argmax = FIRST maximum in langs order
    conds = []
    for i, lang in enumerate(langs):
        later = [f"c_{lang} >= c_{o}" for o in langs[i + 1 :]]
        conds.append(
            ("WHEN " + " AND ".join(later) + f" THEN '{lang}'")
            if later
            else f"ELSE '{lang}'"
        )
    case = (
        "CASE WHEN greatest("
        + ", ".join(f"c_{la}" for la in langs)
        + ") = 0 THEN 'und' "
        + " ".join(conds)
        + " END"
    )
    return f"""
        WITH s AS (SELECT doc_id, lower(text) AS t FROM documents),
        c AS (
            SELECT doc_id,
                   {cols}
            FROM s
        )
        SELECT doc_id, {case} AS detected_lang FROM c
    """


@register(
    "text_language_chargram",
    oracle=_chargram_oracle(),
    tags=("text", "extension", "pandas-udf"),
    window_rank=1,
)
def text_language_chargram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-trigram-profile language ID as an Arrow-batched Pandas UDF
    (the realistic n-gram heuristic; deterministic fixed profiles).
    Demonstrates the vectorized-Python escape hatch for logic built-ins
    can't express; still per-row → shuffle-free at any scale. The
    DuckDB oracle recomputes the same non-overlapping substring counts
    and argmax tie-break in SQL (previously rows-only)."""
    from pyspark.sql.functions import pandas_udf

    profiles = _CHARGRAM_PROFILES
    langs = sorted(profiles)

    @pandas_udf("string")
    def detect(texts: pd.Series) -> pd.Series:
        import numpy as np

        lower = texts.str.lower()
        scores = np.zeros((len(texts), len(langs)), dtype=np.int64)
        for j, lang in enumerate(langs):
            for gram in profiles[lang]:
                scores[:, j] += lower.str.count(gram, flags=0).fillna(0).astype(int)
        best = scores.argmax(axis=1)
        out = [langs[b] if scores[i, b] > 0 else "und" for i, b in enumerate(best)]
        return pd.Series(out)

    d = spread(read_table(spark, sf_dir, "documents"))
    return d.select("doc_id", detect(F.col("text")).alias("detected_lang"))


# ---------------------------------------------------------------------------
# Gopher-style quality filtering + PII redaction — the two curation
# passes every LLM ingest pipeline runs document-by-document. Both are
# pure JVM expression pipelines: zero shuffle, embarrassingly parallel
# at any corpus size.
# ---------------------------------------------------------------------------

# Rule thresholds follow the published Gopher data-curation heuristics
# (Rae et al. 2021, "Scaling Language Models", Table A1), adapted to
# the synthetic corpus scale: the word-count floor is the binding rule
# here (docs are 10-99 words), the rest guard real-crawl pathologies.
QUALITY_MIN_WORDS = 50
QUALITY_MAX_WORDS = 100_000
QUALITY_MEAN_WORD_LEN = (3.0, 10.0)
QUALITY_MIN_ALPHA_FRAC = 0.8
QUALITY_MIN_STOPWORDS = 2


def quality_signals(col: Column | str) -> dict[str, Column]:
    """Per-document quality signals as named JVM expressions:
    word count, mean word length, fraction of words containing an
    alphabetic character, stopword count. All ratios are exact double
    divisions of integer counts — engine-portable bit-for-bit."""
    t = tokens(col)
    n_words = F.size(t)
    char_sum = F.aggregate(
        F.transform(t, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    alpha = F.size(F.filter(t, lambda x: x.rlike("[a-zA-Z]")))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(stop_arr, x)))
    return {
        "n_words": n_words,
        "mean_word_len": char_sum.cast("double") / n_words,
        "alpha_frac": alpha.cast("double") / n_words,
        "n_stopwords": n_stop,
    }


@register(
    "text_quality_filter",
    oracle=f"""
        WITH s AS (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_words,
                   CAST(list_sum(list_transform(string_split(text, ' '),
                        x -> length(x))) AS DOUBLE)
                       / len(string_split(text, ' ')) AS mean_word_len,
                   CAST(len(list_filter(string_split(text, ' '),
                        x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
                       / len(string_split(text, ' ')) AS alpha_frac,
                   len(list_filter(string_split(text, ' '),
                        x -> x IN {STOPWORDS!r})) AS n_stopwords
            FROM documents
        )
        SELECT doc_id, n_words, mean_word_len, alpha_frac, n_stopwords,
               (n_words BETWEEN {QUALITY_MIN_WORDS} AND {QUALITY_MAX_WORDS})
               AND (mean_word_len BETWEEN {QUALITY_MEAN_WORD_LEN[0]}
                                      AND {QUALITY_MEAN_WORD_LEN[1]})
               AND (alpha_frac >= {QUALITY_MIN_ALPHA_FRAC})
               AND (n_stopwords >= {QUALITY_MIN_STOPWORDS}) AS keep
        FROM s
    """,
    tags=("text", "quality", "extension"),
    window_rank=1,
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality gate: per-doc signals + a keep
    verdict from the published rule thresholds. Pure expressions —
    zero shuffle; at 100 TB this is a map-only pass whose selectivity
    feeds the downstream dedup/pack stages."""
    return quality_filter(spread(read_table(spark, sf_dir, "documents")))


def quality_filter(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Reusable Gopher-rule quality gate: ``(doc_id, signals…, keep)``.
    Map-only JVM expressions, so the SAME code runs on batch and
    streaming frames (equivalence pinned in test_streaming)."""
    s = quality_signals(text_col)
    keep = (
        F.col("n_words").between(QUALITY_MIN_WORDS, QUALITY_MAX_WORDS)
        & F.col("mean_word_len").between(*QUALITY_MEAN_WORD_LEN)
        & (F.col("alpha_frac") >= QUALITY_MIN_ALPHA_FRAC)
        & (F.col("n_stopwords") >= QUALITY_MIN_STOPWORDS)
    )
    return docs.select(
        "doc_id", *[expr.alias(name) for name, expr in s.items()]
    ).withColumn("keep", keep)


# PII patterns: the RE2-compatible subset (no lookaround, no
# backreferences) so Spark's Java regex and DuckDB/RE2 agree exactly.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-\s]{7,}[0-9]", "<PHONE>"),
)


def redact_pii(col: Column | str) -> Column:
    """Chained regexp_replace over the PII pattern table — emails,
    IPv4 addresses, phone-shaped digit runs → typed placeholder
    tokens. JVM regex, zero shuffle; order matters (emails first so
    their digits never half-match the phone pattern)."""
    c = F.col(col) if isinstance(col, str) else col
    for _name, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


PII_REDACT_SQL = "text"
for _name, _pat, _repl in PII_PATTERNS:
    PII_REDACT_SQL = (
        f"regexp_replace({PII_REDACT_SQL}, '{_pat}', '{_repl}', 'g')"
    )


@register(
    "text_pii_redact",
    oracle=f"""
        SELECT doc_id,
               {PII_REDACT_SQL} AS redacted,
               ({PII_REDACT_SQL} != text) AS changed
        FROM documents
    """,
    tags=("text", "pii", "extension"),
    window_rank=1,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass over the corpus (emails / IPs / phones →
    placeholders) + a changed flag. The synthetic corpus is clean, so
    the flag is all-false here; the pattern semantics are pinned by
    crafted-string unit tests (tests/test_text_quality.py)."""
    d = spread(read_table(spark, sf_dir, "documents"))
    red = redact_pii("text")
    return d.select(
        "doc_id",
        red.alias("redacted"),
        (red != F.col("text")).alias("changed"),
    )


VOCAB_TOP_K = 200


@register(
    "text_vocabulary",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ),
        stats AS (
            SELECT token,
                   COUNT(*) AS tf,
                   COUNT(DISTINCT doc_id) AS df
            FROM tok GROUP BY token
        )
        SELECT token, tf, df
        FROM stats
        ORDER BY tf DESC, token ASC
        LIMIT {VOCAB_TOP_K}
    """,
    tags=("text", "vocabulary", "extension"),
    window_rank=1,
)
def text_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics: the top-{K} tokens by total term
    frequency, with document frequency — the token-level census every
    tokenizer/vocab-building step starts from. explode → one
    aggregation keyed by token (map-side combined; a 100 TB corpus has
    a bounded vocabulary, so the shuffle carries one partial row per
    (partition × distinct token)) → bounded top-k. The (tf DESC,
    token ASC) order is total, so the LIMIT cut is engine-portable;
    all counts are exact integers."""
    d = spread(read_table(spark, sf_dir, "documents"))
    return (
        d.select("doc_id", F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.count_distinct(F.col("doc_id")).alias("df"),
        )
        .orderBy(F.col("tf").desc(), F.col("token").asc())
        .limit(VOCAB_TOP_K)
    )


TFIDF_TOP_TERMS = 5


@register(
    "text_tfidf_topk",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ),
        tf AS (
            SELECT doc_id, token, COUNT(*) AS tf
            FROM tok GROUP BY doc_id, token
        ),
        idf AS (
            SELECT token,
                   ln((1.0 + (SELECT COUNT(*) FROM documents))
                      / (1.0 + COUNT(DISTINCT doc_id))) + 1.0 AS idf
            FROM tok GROUP BY token
        ),
        scored AS (
            SELECT tf.doc_id, tf.token,
                   CAST(tf.tf AS DOUBLE) * idf.idf AS score,
                   ROW_NUMBER() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY CAST(tf.tf AS DOUBLE) * idf.idf DESC,
                                tf.token ASC
                   ) AS rnk
            FROM tf JOIN idf ON tf.token = idf.token
        )
        SELECT doc_id, token, rnk, ROUND(score, 6) AS tfidf
        FROM scored WHERE rnk <= {TFIDF_TOP_TERMS}
    """,
    tags=("text", "tfidf", "extension"),
    window_rank=1,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{K} characteristic terms per document by smoothed TF-IDF
    (``tf · (ln((1+N)/(1+df)) + 1)``) — the classic relevance
    weighting a retrieval/labeling stage runs over a curated corpus.

    Shapes for 100 TB: term frequencies are one map-side-combined
    (doc, token) aggregation; the IDF table is vocabulary-bounded and
    arrives via broadcast, so the corpus-sized side never reshuffles
    for it; the per-document top-k window partitions on doc_id with
    per-key cardinality bounded by distinct terms per document. The
    (score DESC, token ASC) order is total, and ln() is bit-identical
    across engines (verified), so the rank cut is portable."""
    d = spread(read_table(spark, sf_dir, "documents"))
    tok = d.select("doc_id", F.explode(tokens("text")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n"))
    # df falls out of the tf frame for free: it already holds exactly
    # one row per (doc, token), so a plain count per token IS the
    # document frequency — re-aggregating `tok` with count_distinct
    # would repeat the corpus scan + explode and pay a two-phase
    # distinct over every (doc, token) row
    idf = (
        tf.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token",
            (
                F.log((1.0 + F.col("n")) / (1.0 + F.col("df"))) + 1.0
            ).alias("idf"),
        )
    )
    score = F.col("tf").cast("double") * F.col("idf")
    w = Window.partitionBy("doc_id").orderBy(
        score.desc(), F.col("token").asc()
    )
    return (
        tf.join(F.broadcast(idf), "token")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TFIDF_TOP_TERMS)
        .select(
            "doc_id", "token", "rnk", F.round(score, 6).alias("tfidf")
        )
    )


# Gopher-style repetition thresholds (the published rules are
# line/paragraph/n-gram based; the corpus has single-line documents,
# so the signals here are the word-level analogues).
REP_MAX_DUP_WORD_FRAC = 0.5
REP_MAX_TOP_BIGRAM_FRAC = 0.08


def repetition_signals(col: Column | str) -> dict[str, Column]:
    """Word-level repetition signals as JVM expressions:

    * ``dup_word_frac`` — fraction of word occurrences that repeat an
      earlier word (``1 − distinct/total``); pure array HOFs, O(n)
      per document, zero shuffle.
    * ``bigrams`` — the adjacent word-2-gram array (the input to the
      distributed top-bigram aggregation; Gopher's "top n-gram
      fraction" needs a per-doc mode, which is a groupBy, not a HOF —
      an O(n²) ``filter``-per-distinct HOF would blow up on real
      multi-thousand-word documents).

    Bigrams pair the array with its own 1-shifted slice via
    ``zip_with``: the zip pads the shorter side with null, the
    null-propagating ``concat`` turns the padded tail pair into null,
    and the ``filter`` drops it — so a one-word document yields an
    empty bigram array with no conditional.
    """
    t = tokens(col)
    n = F.size(t)
    shifted = F.slice(t, 2, F.greatest(n - 1, F.lit(0)))
    bigrams = F.filter(
        F.zip_with(t, shifted, lambda a, b: F.concat(a, F.lit(" "), b)),
        lambda x: x.isNotNull(),
    )
    return {
        "n_words": n,
        "dup_word_frac": (
            F.lit(1.0) - F.size(F.array_distinct(t)).cast("double") / n
        ),
        "bigrams": bigrams,
    }


@register(
    "text_repetition",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        s AS (
            SELECT doc_id, len(w) AS n_words,
                   1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w)
                       AS dup_word_frac,
                   list_transform(generate_series(1, len(w) - 1),
                                  i -> w[i] || ' ' || w[i + 1]) AS bgs
            FROM t
        ),
        c AS (
            SELECT doc_id, bg, count(*) AS n
            FROM (SELECT doc_id, unnest(bgs) AS bg FROM s)
            GROUP BY doc_id, bg
        ),
        m AS (SELECT doc_id, max(n) AS top_n FROM c GROUP BY doc_id)
        SELECT s.doc_id, s.n_words, s.dup_word_frac,
               CAST(m.top_n AS DOUBLE) / (s.n_words - 1)
                   AS top_bigram_frac,
               (s.dup_word_frac <= {REP_MAX_DUP_WORD_FRAC})
               AND (CAST(m.top_n AS DOUBLE) / (s.n_words - 1)
                    <= {REP_MAX_TOP_BIGRAM_FRAC}) AS keep
        FROM s JOIN m USING (doc_id)
    """,
    tags=("text", "quality", "extension"),
    window_rank=1,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: per-document duplicate-word
    fraction and top-bigram fraction, plus the keep verdict — the
    repetition half of the published quality rules
    (``text_quality_filter`` covers the length/alpha/stopword half).

    Scale shape: ``dup_word_frac`` is a zero-shuffle HOF pass. The
    top-bigram mode is explode → one map-side-combined
    ``(doc, bigram)`` count → per-doc max — two partial-aggregated
    shuffles whose key cardinality is bounded by distinct bigrams per
    doc, never all-pairs. All ratios are exact integer divisions in
    IEEE doubles, so the DuckDB oracle matches bit-for-bit.

    HEAVY spread tier: the per-doc n-gram passes cost seconds per MB
    (interleaved A/B at sf0.1: 2.01 s at the 256 KiB text default vs
    1.35 s at 64 KiB ≈ the all-cores 1.31 floor)."""
    d = spread(
        read_table(spark, sf_dir, "documents"),
        target_bytes=SPREAD_HEAVY_BYTES,
    )
    return repetition_report(d)


def repetition_report(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition signals + keep verdict over any frame
    with an id and a text column (the reusable form of the
    ``text_repetition`` corpus entry — see its docstring for the
    scale shape). Documents with fewer than two words have no bigrams
    and are dropped (nothing to judge repetition on)."""
    s = repetition_signals(text_col)
    base = df.select(
        F.col(id_col),
        s["n_words"].alias("n_words"),
        s["dup_word_frac"].alias("dup_word_frac"),
        F.explode(s["bigrams"]).alias("bg"),
    )
    counts = base.groupBy(
        id_col, "n_words", "dup_word_frac", "bg"
    ).agg(F.count(F.lit(1)).alias("n"))
    top = counts.groupBy(id_col, "n_words", "dup_word_frac").agg(
        F.max("n").alias("top_n")
    )
    top_frac = F.col("top_n").cast("double") / (F.col("n_words") - 1)
    return top.select(
        id_col,
        "n_words",
        "dup_word_frac",
        top_frac.alias("top_bigram_frac"),
        (
            (F.col("dup_word_frac") <= REP_MAX_DUP_WORD_FRAC)
            & (top_frac <= REP_MAX_TOP_BIGRAM_FRAC)
        ).alias("keep"),
    )


@register(
    "text_logprob",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ),
        freq AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
        tot AS (SELECT sum(n) AS t FROM freq),
        lp AS (
            SELECT token, ln(CAST(n AS DOUBLE) / t) AS lp
            FROM freq, tot
        )
        SELECT doc_id,
               count(*) AS n_tokens,
               round(avg(lp), 6) AS avg_logprob
        FROM tok JOIN lp USING (token)
        GROUP BY doc_id
    """,
    tags=("text", "quality", "extension"),
    window_rank=1,
)
def text_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring: each document's mean token
    log-probability under the corpus's own unigram distribution — the
    model-based quality signal (CCNet/KenLM-style perplexity
    filtering collapses to exactly this shape with a 1-gram model;
    higher-order models swap the broadcast table, not the plan).

    Scale shape mirrors ``text_tfidf_topk``: training is ONE
    map-side-combined token count (vocabulary-bounded output); the
    total-count scalar rides a broadcast cross join; scoring re-joins
    the token stream to the BROADCAST logprob table — the corpus-sized
    side never shuffles for the model — and the per-doc mean is one
    partial-aggregated groupBy. ``ln()`` is bit-identical across
    engines (pinned by the tfidf suite); the mean is rounded to 1e-6
    to absorb summation-order ulps."""
    d = spread(read_table(spark, sf_dir, "documents"))
    return logprob_report(d)


def logprob_report(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document ``(id, n_tokens, avg_logprob)`` under the frame's
    own unigram distribution — the reusable form of the
    ``text_logprob`` corpus entry (see its docstring for the scale
    shape), so the pipeline example and the oracle-gated entry share
    one implementation instead of drifting copies."""
    tok = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("token")
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    tot = freq.agg(F.sum("n").alias("t"))
    lp = (
        freq.crossJoin(F.broadcast(tot))
        .select(
            "token",
            F.log(F.col("n").cast("double") / F.col("t")).alias("lp"),
        )
    )
    return (
        tok.join(F.broadcast(lp), "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("lp"), 6).alias("avg_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# HTML → text extraction (C4/CommonCrawl-style document prep)
# ---------------------------------------------------------------------------

# (pattern, replacement) pairs applied IN ORDER; all RE2-compatible
# (no backreferences), so Spark's Java regex and DuckDB agree exactly.
_HTML_STRIP_STEPS: tuple[tuple[str, str], ...] = (
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?is)</?(p|br|div|h[1-6]|li|tr|table)[^>]*>", " \n"),  # block breaks
    (r"<[^>]+>", " "),  # any remaining tag
)

# entity decode AFTER tag stripping; &amp; LAST so '&amp;lt;' decodes
# to the literal '&lt;' and not to '<'
_HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def html_to_text(col: Column | str) -> Column:
    """Extract readable text from HTML: drop script/style/comment
    blocks, turn block-level tags into line breaks, strip every other
    tag, decode the common entities, collapse whitespace. Pure JVM
    ``regexp_replace``/``replace`` chain — zero shuffle, no UDF, and
    every pattern is RE2-compatible so the DuckDB oracle reproduces
    the output byte-for-byte."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in _HTML_STRIP_STEPS:
        c = F.regexp_replace(c, pat, repl)
    for ent, ch in _HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def _html_strip_sql(expr: str) -> str:
    for pat, repl in _HTML_STRIP_STEPS:
        p = pat.replace("'", "''")
        r = repl.replace("'", "''").replace("\n", "\\n")
        expr = f"regexp_replace({expr}, '{p}', e'{r}', 'g')"
    for ent, ch in _HTML_ENTITIES:
        ch_sql = ch.replace("'", "''")
        expr = f"replace({expr}, '{ent}', '{ch_sql}')"
    return f"trim(regexp_replace({expr}, '\\s+', ' ', 'g'))"


# deterministic demo wrapper: the corpus has no HTML, so each doc's
# text is embedded in a fixed page skeleton (with entities + junk the
# op must remove) and the extraction chain runs on REAL markup
_HTML_WRAP_SPARK = (
    "concat('<html><head><style>p{color:red}</style>"
    "<script>var x=1;</script></head><body><!-- hidden -->"
    "<h1>Doc &amp; title</h1><p class=\"a\">', text, "
    "'</p><br><i>fin&nbsp;</i></body></html>')"
)
_HTML_WRAP_SQL = _HTML_WRAP_SPARK  # identical ANSI concat on both engines


@register(
    "text_html_strip",
    oracle=f"""
        SELECT doc_id,
               {_html_strip_sql(_HTML_WRAP_SQL)} AS clean_text
        FROM documents
    """,
    tags=("text", "html", "extension"),
    window_rank=1,
)
def text_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML extraction end-to-end, value-checked: each document is
    wrapped in a fixed page skeleton (script + style + comment +
    entities + block tags) and ``html_to_text`` must recover the
    readable text — DuckDB runs the same RE2-safe chain, so the
    comparison is byte-exact. Zero shuffle, pure codegen."""
    d = spread(read_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        html_to_text(F.expr(_HTML_WRAP_SPARK)).alias("clean_text"),
    )


# ---------------------------------------------------------------------------
# Interpolated bigram LM scoring — the next rung of CCNet-style
# model-based filtering above `text_logprob`'s unigram.
# ---------------------------------------------------------------------------

BIGRAM_LAMBDA = 0.75  # interpolation weight on the bigram term


@register(
    "text_bigram_logprob",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(string_split(text, ' ')) AS token,
                   generate_subscripts(string_split(text, ' '), 1) AS ord
            FROM documents
        ),
        bi AS (
            SELECT doc_id,
                   lag(token) OVER (PARTITION BY doc_id ORDER BY ord) AS prev,
                   token
            FROM tok
        ),
        bi2 AS (SELECT * FROM bi WHERE prev IS NOT NULL),
        cbig AS (SELECT prev, token, count(*) AS cb FROM bi2 GROUP BY prev, token),
        cprev AS (SELECT prev, sum(cb) AS cp FROM cbig GROUP BY prev),
        uni AS (SELECT token, count(*) AS cu FROM tok GROUP BY token),
        tot AS (SELECT sum(cu) AS n FROM uni),
        p AS (
            SELECT cbig.prev, cbig.token,
                   ln({BIGRAM_LAMBDA} * (CAST(cb AS DOUBLE) / cp)
                      + {1 - BIGRAM_LAMBDA} * (CAST(cu AS DOUBLE) / n)) AS lp
            FROM cbig
            JOIN cprev USING (prev)
            JOIN uni ON uni.token = cbig.token, tot
        )
        SELECT doc_id,
               count(*) AS n_bigrams,
               round(avg(lp), 6) AS avg_logprob
        FROM bi2 JOIN p USING (prev, token)
        GROUP BY doc_id
    """,
    tags=("text", "quality", "extension", "lm"),
    window_rank=1,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram LM scoring: each document's mean
    ``ln(λ·P(cur|prev) + (1−λ)·P(cur))`` under the corpus's own
    counts — one rung above the unigram entry toward KenLM-style
    perplexity filtering, with the interpolation keeping unseen-pair
    mass finite without held-out smoothing state.

    Scale shape: ONE doc-keyed window builds the bigram stream
    (posexplode + lag share the doc_id partitioning), the count
    tables partial-aggregate map-side, and the probability table —
    distinct-bigram-bounded, a vocabulary property rather than a
    corpus-size property — joins back on (prev, token). The λ·x+μ·y
    expression is written identically on both engines, so only
    summation order separates them (1e-6 rounding contract)."""
    d = spread(read_table(spark, sf_dir, "documents"))
    lam = BIGRAM_LAMBDA
    tok = d.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "token")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bi = (
        tok.withColumn("prev", F.lag("token").over(w))
        .filter(F.col("prev").isNotNull())
        .select("doc_id", "prev", "token")
    )
    cbig = bi.groupBy("prev", "token").agg(F.count(F.lit(1)).alias("cb"))
    cprev = cbig.groupBy("prev").agg(F.sum("cb").alias("cp"))
    uni = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cu"))
    tot = uni.agg(F.sum("cu").alias("n"))
    p = (
        cbig.join(cprev, "prev")
        .join(uni, "token")
        .crossJoin(F.broadcast(tot))
        .select(
            "prev",
            "token",
            F.log(
                F.lit(lam) * (F.col("cb").cast("double") / F.col("cp"))
                + F.lit(1 - lam) * (F.col("cu").cast("double") / F.col("n"))
            ).alias("lp"),
        )
    )
    return (
        bi.join(p, ["prev", "token"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("lp"), 6).alias("avg_logprob"),
        )
    )


# ASCII printable charset (32..126) — the corpus precondition asserted
# by test_corpus_text_is_ascii; the per-char count chain below is a
# FIXED left fold over this range in BOTH engines, so the floating
# addition order is bit-identical by construction.
_ENTROPY_CODES = range(32, 127)

_ENTROPY_ORACLE = """
        SELECT doc_id,
               ROUND((CASE WHEN cnt32 > 0 THEN -((cnt32/n) * ln(cnt32/n)) ELSE 0.0 END)
               + (CASE WHEN cnt33 > 0 THEN -((cnt33/n) * ln(cnt33/n)) ELSE 0.0 END)
               + (CASE WHEN cnt34 > 0 THEN -((cnt34/n) * ln(cnt34/n)) ELSE 0.0 END)
               + (CASE WHEN cnt35 > 0 THEN -((cnt35/n) * ln(cnt35/n)) ELSE 0.0 END)
               + (CASE WHEN cnt36 > 0 THEN -((cnt36/n) * ln(cnt36/n)) ELSE 0.0 END)
               + (CASE WHEN cnt37 > 0 THEN -((cnt37/n) * ln(cnt37/n)) ELSE 0.0 END)
               + (CASE WHEN cnt38 > 0 THEN -((cnt38/n) * ln(cnt38/n)) ELSE 0.0 END)
               + (CASE WHEN cnt39 > 0 THEN -((cnt39/n) * ln(cnt39/n)) ELSE 0.0 END)
               + (CASE WHEN cnt40 > 0 THEN -((cnt40/n) * ln(cnt40/n)) ELSE 0.0 END)
               + (CASE WHEN cnt41 > 0 THEN -((cnt41/n) * ln(cnt41/n)) ELSE 0.0 END)
               + (CASE WHEN cnt42 > 0 THEN -((cnt42/n) * ln(cnt42/n)) ELSE 0.0 END)
               + (CASE WHEN cnt43 > 0 THEN -((cnt43/n) * ln(cnt43/n)) ELSE 0.0 END)
               + (CASE WHEN cnt44 > 0 THEN -((cnt44/n) * ln(cnt44/n)) ELSE 0.0 END)
               + (CASE WHEN cnt45 > 0 THEN -((cnt45/n) * ln(cnt45/n)) ELSE 0.0 END)
               + (CASE WHEN cnt46 > 0 THEN -((cnt46/n) * ln(cnt46/n)) ELSE 0.0 END)
               + (CASE WHEN cnt47 > 0 THEN -((cnt47/n) * ln(cnt47/n)) ELSE 0.0 END)
               + (CASE WHEN cnt48 > 0 THEN -((cnt48/n) * ln(cnt48/n)) ELSE 0.0 END)
               + (CASE WHEN cnt49 > 0 THEN -((cnt49/n) * ln(cnt49/n)) ELSE 0.0 END)
               + (CASE WHEN cnt50 > 0 THEN -((cnt50/n) * ln(cnt50/n)) ELSE 0.0 END)
               + (CASE WHEN cnt51 > 0 THEN -((cnt51/n) * ln(cnt51/n)) ELSE 0.0 END)
               + (CASE WHEN cnt52 > 0 THEN -((cnt52/n) * ln(cnt52/n)) ELSE 0.0 END)
               + (CASE WHEN cnt53 > 0 THEN -((cnt53/n) * ln(cnt53/n)) ELSE 0.0 END)
               + (CASE WHEN cnt54 > 0 THEN -((cnt54/n) * ln(cnt54/n)) ELSE 0.0 END)
               + (CASE WHEN cnt55 > 0 THEN -((cnt55/n) * ln(cnt55/n)) ELSE 0.0 END)
               + (CASE WHEN cnt56 > 0 THEN -((cnt56/n) * ln(cnt56/n)) ELSE 0.0 END)
               + (CASE WHEN cnt57 > 0 THEN -((cnt57/n) * ln(cnt57/n)) ELSE 0.0 END)
               + (CASE WHEN cnt58 > 0 THEN -((cnt58/n) * ln(cnt58/n)) ELSE 0.0 END)
               + (CASE WHEN cnt59 > 0 THEN -((cnt59/n) * ln(cnt59/n)) ELSE 0.0 END)
               + (CASE WHEN cnt60 > 0 THEN -((cnt60/n) * ln(cnt60/n)) ELSE 0.0 END)
               + (CASE WHEN cnt61 > 0 THEN -((cnt61/n) * ln(cnt61/n)) ELSE 0.0 END)
               + (CASE WHEN cnt62 > 0 THEN -((cnt62/n) * ln(cnt62/n)) ELSE 0.0 END)
               + (CASE WHEN cnt63 > 0 THEN -((cnt63/n) * ln(cnt63/n)) ELSE 0.0 END)
               + (CASE WHEN cnt64 > 0 THEN -((cnt64/n) * ln(cnt64/n)) ELSE 0.0 END)
               + (CASE WHEN cnt65 > 0 THEN -((cnt65/n) * ln(cnt65/n)) ELSE 0.0 END)
               + (CASE WHEN cnt66 > 0 THEN -((cnt66/n) * ln(cnt66/n)) ELSE 0.0 END)
               + (CASE WHEN cnt67 > 0 THEN -((cnt67/n) * ln(cnt67/n)) ELSE 0.0 END)
               + (CASE WHEN cnt68 > 0 THEN -((cnt68/n) * ln(cnt68/n)) ELSE 0.0 END)
               + (CASE WHEN cnt69 > 0 THEN -((cnt69/n) * ln(cnt69/n)) ELSE 0.0 END)
               + (CASE WHEN cnt70 > 0 THEN -((cnt70/n) * ln(cnt70/n)) ELSE 0.0 END)
               + (CASE WHEN cnt71 > 0 THEN -((cnt71/n) * ln(cnt71/n)) ELSE 0.0 END)
               + (CASE WHEN cnt72 > 0 THEN -((cnt72/n) * ln(cnt72/n)) ELSE 0.0 END)
               + (CASE WHEN cnt73 > 0 THEN -((cnt73/n) * ln(cnt73/n)) ELSE 0.0 END)
               + (CASE WHEN cnt74 > 0 THEN -((cnt74/n) * ln(cnt74/n)) ELSE 0.0 END)
               + (CASE WHEN cnt75 > 0 THEN -((cnt75/n) * ln(cnt75/n)) ELSE 0.0 END)
               + (CASE WHEN cnt76 > 0 THEN -((cnt76/n) * ln(cnt76/n)) ELSE 0.0 END)
               + (CASE WHEN cnt77 > 0 THEN -((cnt77/n) * ln(cnt77/n)) ELSE 0.0 END)
               + (CASE WHEN cnt78 > 0 THEN -((cnt78/n) * ln(cnt78/n)) ELSE 0.0 END)
               + (CASE WHEN cnt79 > 0 THEN -((cnt79/n) * ln(cnt79/n)) ELSE 0.0 END)
               + (CASE WHEN cnt80 > 0 THEN -((cnt80/n) * ln(cnt80/n)) ELSE 0.0 END)
               + (CASE WHEN cnt81 > 0 THEN -((cnt81/n) * ln(cnt81/n)) ELSE 0.0 END)
               + (CASE WHEN cnt82 > 0 THEN -((cnt82/n) * ln(cnt82/n)) ELSE 0.0 END)
               + (CASE WHEN cnt83 > 0 THEN -((cnt83/n) * ln(cnt83/n)) ELSE 0.0 END)
               + (CASE WHEN cnt84 > 0 THEN -((cnt84/n) * ln(cnt84/n)) ELSE 0.0 END)
               + (CASE WHEN cnt85 > 0 THEN -((cnt85/n) * ln(cnt85/n)) ELSE 0.0 END)
               + (CASE WHEN cnt86 > 0 THEN -((cnt86/n) * ln(cnt86/n)) ELSE 0.0 END)
               + (CASE WHEN cnt87 > 0 THEN -((cnt87/n) * ln(cnt87/n)) ELSE 0.0 END)
               + (CASE WHEN cnt88 > 0 THEN -((cnt88/n) * ln(cnt88/n)) ELSE 0.0 END)
               + (CASE WHEN cnt89 > 0 THEN -((cnt89/n) * ln(cnt89/n)) ELSE 0.0 END)
               + (CASE WHEN cnt90 > 0 THEN -((cnt90/n) * ln(cnt90/n)) ELSE 0.0 END)
               + (CASE WHEN cnt91 > 0 THEN -((cnt91/n) * ln(cnt91/n)) ELSE 0.0 END)
               + (CASE WHEN cnt92 > 0 THEN -((cnt92/n) * ln(cnt92/n)) ELSE 0.0 END)
               + (CASE WHEN cnt93 > 0 THEN -((cnt93/n) * ln(cnt93/n)) ELSE 0.0 END)
               + (CASE WHEN cnt94 > 0 THEN -((cnt94/n) * ln(cnt94/n)) ELSE 0.0 END)
               + (CASE WHEN cnt95 > 0 THEN -((cnt95/n) * ln(cnt95/n)) ELSE 0.0 END)
               + (CASE WHEN cnt96 > 0 THEN -((cnt96/n) * ln(cnt96/n)) ELSE 0.0 END)
               + (CASE WHEN cnt97 > 0 THEN -((cnt97/n) * ln(cnt97/n)) ELSE 0.0 END)
               + (CASE WHEN cnt98 > 0 THEN -((cnt98/n) * ln(cnt98/n)) ELSE 0.0 END)
               + (CASE WHEN cnt99 > 0 THEN -((cnt99/n) * ln(cnt99/n)) ELSE 0.0 END)
               + (CASE WHEN cnt100 > 0 THEN -((cnt100/n) * ln(cnt100/n)) ELSE 0.0 END)
               + (CASE WHEN cnt101 > 0 THEN -((cnt101/n) * ln(cnt101/n)) ELSE 0.0 END)
               + (CASE WHEN cnt102 > 0 THEN -((cnt102/n) * ln(cnt102/n)) ELSE 0.0 END)
               + (CASE WHEN cnt103 > 0 THEN -((cnt103/n) * ln(cnt103/n)) ELSE 0.0 END)
               + (CASE WHEN cnt104 > 0 THEN -((cnt104/n) * ln(cnt104/n)) ELSE 0.0 END)
               + (CASE WHEN cnt105 > 0 THEN -((cnt105/n) * ln(cnt105/n)) ELSE 0.0 END)
               + (CASE WHEN cnt106 > 0 THEN -((cnt106/n) * ln(cnt106/n)) ELSE 0.0 END)
               + (CASE WHEN cnt107 > 0 THEN -((cnt107/n) * ln(cnt107/n)) ELSE 0.0 END)
               + (CASE WHEN cnt108 > 0 THEN -((cnt108/n) * ln(cnt108/n)) ELSE 0.0 END)
               + (CASE WHEN cnt109 > 0 THEN -((cnt109/n) * ln(cnt109/n)) ELSE 0.0 END)
               + (CASE WHEN cnt110 > 0 THEN -((cnt110/n) * ln(cnt110/n)) ELSE 0.0 END)
               + (CASE WHEN cnt111 > 0 THEN -((cnt111/n) * ln(cnt111/n)) ELSE 0.0 END)
               + (CASE WHEN cnt112 > 0 THEN -((cnt112/n) * ln(cnt112/n)) ELSE 0.0 END)
               + (CASE WHEN cnt113 > 0 THEN -((cnt113/n) * ln(cnt113/n)) ELSE 0.0 END)
               + (CASE WHEN cnt114 > 0 THEN -((cnt114/n) * ln(cnt114/n)) ELSE 0.0 END)
               + (CASE WHEN cnt115 > 0 THEN -((cnt115/n) * ln(cnt115/n)) ELSE 0.0 END)
               + (CASE WHEN cnt116 > 0 THEN -((cnt116/n) * ln(cnt116/n)) ELSE 0.0 END)
               + (CASE WHEN cnt117 > 0 THEN -((cnt117/n) * ln(cnt117/n)) ELSE 0.0 END)
               + (CASE WHEN cnt118 > 0 THEN -((cnt118/n) * ln(cnt118/n)) ELSE 0.0 END)
               + (CASE WHEN cnt119 > 0 THEN -((cnt119/n) * ln(cnt119/n)) ELSE 0.0 END)
               + (CASE WHEN cnt120 > 0 THEN -((cnt120/n) * ln(cnt120/n)) ELSE 0.0 END)
               + (CASE WHEN cnt121 > 0 THEN -((cnt121/n) * ln(cnt121/n)) ELSE 0.0 END)
               + (CASE WHEN cnt122 > 0 THEN -((cnt122/n) * ln(cnt122/n)) ELSE 0.0 END)
               + (CASE WHEN cnt123 > 0 THEN -((cnt123/n) * ln(cnt123/n)) ELSE 0.0 END)
               + (CASE WHEN cnt124 > 0 THEN -((cnt124/n) * ln(cnt124/n)) ELSE 0.0 END)
               + (CASE WHEN cnt125 > 0 THEN -((cnt125/n) * ln(cnt125/n)) ELSE 0.0 END)
               + (CASE WHEN cnt126 > 0 THEN -((cnt126/n) * ln(cnt126/n)) ELSE 0.0 END), 6) AS entropy
        FROM (
            SELECT doc_id,
                   CAST(length(text) AS DOUBLE) AS n,
                   CAST(length(text) - length(replace(text, chr(32), '')) AS DOUBLE) AS cnt32,
                   CAST(length(text) - length(replace(text, chr(33), '')) AS DOUBLE) AS cnt33,
                   CAST(length(text) - length(replace(text, chr(34), '')) AS DOUBLE) AS cnt34,
                   CAST(length(text) - length(replace(text, chr(35), '')) AS DOUBLE) AS cnt35,
                   CAST(length(text) - length(replace(text, chr(36), '')) AS DOUBLE) AS cnt36,
                   CAST(length(text) - length(replace(text, chr(37), '')) AS DOUBLE) AS cnt37,
                   CAST(length(text) - length(replace(text, chr(38), '')) AS DOUBLE) AS cnt38,
                   CAST(length(text) - length(replace(text, chr(39), '')) AS DOUBLE) AS cnt39,
                   CAST(length(text) - length(replace(text, chr(40), '')) AS DOUBLE) AS cnt40,
                   CAST(length(text) - length(replace(text, chr(41), '')) AS DOUBLE) AS cnt41,
                   CAST(length(text) - length(replace(text, chr(42), '')) AS DOUBLE) AS cnt42,
                   CAST(length(text) - length(replace(text, chr(43), '')) AS DOUBLE) AS cnt43,
                   CAST(length(text) - length(replace(text, chr(44), '')) AS DOUBLE) AS cnt44,
                   CAST(length(text) - length(replace(text, chr(45), '')) AS DOUBLE) AS cnt45,
                   CAST(length(text) - length(replace(text, chr(46), '')) AS DOUBLE) AS cnt46,
                   CAST(length(text) - length(replace(text, chr(47), '')) AS DOUBLE) AS cnt47,
                   CAST(length(text) - length(replace(text, chr(48), '')) AS DOUBLE) AS cnt48,
                   CAST(length(text) - length(replace(text, chr(49), '')) AS DOUBLE) AS cnt49,
                   CAST(length(text) - length(replace(text, chr(50), '')) AS DOUBLE) AS cnt50,
                   CAST(length(text) - length(replace(text, chr(51), '')) AS DOUBLE) AS cnt51,
                   CAST(length(text) - length(replace(text, chr(52), '')) AS DOUBLE) AS cnt52,
                   CAST(length(text) - length(replace(text, chr(53), '')) AS DOUBLE) AS cnt53,
                   CAST(length(text) - length(replace(text, chr(54), '')) AS DOUBLE) AS cnt54,
                   CAST(length(text) - length(replace(text, chr(55), '')) AS DOUBLE) AS cnt55,
                   CAST(length(text) - length(replace(text, chr(56), '')) AS DOUBLE) AS cnt56,
                   CAST(length(text) - length(replace(text, chr(57), '')) AS DOUBLE) AS cnt57,
                   CAST(length(text) - length(replace(text, chr(58), '')) AS DOUBLE) AS cnt58,
                   CAST(length(text) - length(replace(text, chr(59), '')) AS DOUBLE) AS cnt59,
                   CAST(length(text) - length(replace(text, chr(60), '')) AS DOUBLE) AS cnt60,
                   CAST(length(text) - length(replace(text, chr(61), '')) AS DOUBLE) AS cnt61,
                   CAST(length(text) - length(replace(text, chr(62), '')) AS DOUBLE) AS cnt62,
                   CAST(length(text) - length(replace(text, chr(63), '')) AS DOUBLE) AS cnt63,
                   CAST(length(text) - length(replace(text, chr(64), '')) AS DOUBLE) AS cnt64,
                   CAST(length(text) - length(replace(text, chr(65), '')) AS DOUBLE) AS cnt65,
                   CAST(length(text) - length(replace(text, chr(66), '')) AS DOUBLE) AS cnt66,
                   CAST(length(text) - length(replace(text, chr(67), '')) AS DOUBLE) AS cnt67,
                   CAST(length(text) - length(replace(text, chr(68), '')) AS DOUBLE) AS cnt68,
                   CAST(length(text) - length(replace(text, chr(69), '')) AS DOUBLE) AS cnt69,
                   CAST(length(text) - length(replace(text, chr(70), '')) AS DOUBLE) AS cnt70,
                   CAST(length(text) - length(replace(text, chr(71), '')) AS DOUBLE) AS cnt71,
                   CAST(length(text) - length(replace(text, chr(72), '')) AS DOUBLE) AS cnt72,
                   CAST(length(text) - length(replace(text, chr(73), '')) AS DOUBLE) AS cnt73,
                   CAST(length(text) - length(replace(text, chr(74), '')) AS DOUBLE) AS cnt74,
                   CAST(length(text) - length(replace(text, chr(75), '')) AS DOUBLE) AS cnt75,
                   CAST(length(text) - length(replace(text, chr(76), '')) AS DOUBLE) AS cnt76,
                   CAST(length(text) - length(replace(text, chr(77), '')) AS DOUBLE) AS cnt77,
                   CAST(length(text) - length(replace(text, chr(78), '')) AS DOUBLE) AS cnt78,
                   CAST(length(text) - length(replace(text, chr(79), '')) AS DOUBLE) AS cnt79,
                   CAST(length(text) - length(replace(text, chr(80), '')) AS DOUBLE) AS cnt80,
                   CAST(length(text) - length(replace(text, chr(81), '')) AS DOUBLE) AS cnt81,
                   CAST(length(text) - length(replace(text, chr(82), '')) AS DOUBLE) AS cnt82,
                   CAST(length(text) - length(replace(text, chr(83), '')) AS DOUBLE) AS cnt83,
                   CAST(length(text) - length(replace(text, chr(84), '')) AS DOUBLE) AS cnt84,
                   CAST(length(text) - length(replace(text, chr(85), '')) AS DOUBLE) AS cnt85,
                   CAST(length(text) - length(replace(text, chr(86), '')) AS DOUBLE) AS cnt86,
                   CAST(length(text) - length(replace(text, chr(87), '')) AS DOUBLE) AS cnt87,
                   CAST(length(text) - length(replace(text, chr(88), '')) AS DOUBLE) AS cnt88,
                   CAST(length(text) - length(replace(text, chr(89), '')) AS DOUBLE) AS cnt89,
                   CAST(length(text) - length(replace(text, chr(90), '')) AS DOUBLE) AS cnt90,
                   CAST(length(text) - length(replace(text, chr(91), '')) AS DOUBLE) AS cnt91,
                   CAST(length(text) - length(replace(text, chr(92), '')) AS DOUBLE) AS cnt92,
                   CAST(length(text) - length(replace(text, chr(93), '')) AS DOUBLE) AS cnt93,
                   CAST(length(text) - length(replace(text, chr(94), '')) AS DOUBLE) AS cnt94,
                   CAST(length(text) - length(replace(text, chr(95), '')) AS DOUBLE) AS cnt95,
                   CAST(length(text) - length(replace(text, chr(96), '')) AS DOUBLE) AS cnt96,
                   CAST(length(text) - length(replace(text, chr(97), '')) AS DOUBLE) AS cnt97,
                   CAST(length(text) - length(replace(text, chr(98), '')) AS DOUBLE) AS cnt98,
                   CAST(length(text) - length(replace(text, chr(99), '')) AS DOUBLE) AS cnt99,
                   CAST(length(text) - length(replace(text, chr(100), '')) AS DOUBLE) AS cnt100,
                   CAST(length(text) - length(replace(text, chr(101), '')) AS DOUBLE) AS cnt101,
                   CAST(length(text) - length(replace(text, chr(102), '')) AS DOUBLE) AS cnt102,
                   CAST(length(text) - length(replace(text, chr(103), '')) AS DOUBLE) AS cnt103,
                   CAST(length(text) - length(replace(text, chr(104), '')) AS DOUBLE) AS cnt104,
                   CAST(length(text) - length(replace(text, chr(105), '')) AS DOUBLE) AS cnt105,
                   CAST(length(text) - length(replace(text, chr(106), '')) AS DOUBLE) AS cnt106,
                   CAST(length(text) - length(replace(text, chr(107), '')) AS DOUBLE) AS cnt107,
                   CAST(length(text) - length(replace(text, chr(108), '')) AS DOUBLE) AS cnt108,
                   CAST(length(text) - length(replace(text, chr(109), '')) AS DOUBLE) AS cnt109,
                   CAST(length(text) - length(replace(text, chr(110), '')) AS DOUBLE) AS cnt110,
                   CAST(length(text) - length(replace(text, chr(111), '')) AS DOUBLE) AS cnt111,
                   CAST(length(text) - length(replace(text, chr(112), '')) AS DOUBLE) AS cnt112,
                   CAST(length(text) - length(replace(text, chr(113), '')) AS DOUBLE) AS cnt113,
                   CAST(length(text) - length(replace(text, chr(114), '')) AS DOUBLE) AS cnt114,
                   CAST(length(text) - length(replace(text, chr(115), '')) AS DOUBLE) AS cnt115,
                   CAST(length(text) - length(replace(text, chr(116), '')) AS DOUBLE) AS cnt116,
                   CAST(length(text) - length(replace(text, chr(117), '')) AS DOUBLE) AS cnt117,
                   CAST(length(text) - length(replace(text, chr(118), '')) AS DOUBLE) AS cnt118,
                   CAST(length(text) - length(replace(text, chr(119), '')) AS DOUBLE) AS cnt119,
                   CAST(length(text) - length(replace(text, chr(120), '')) AS DOUBLE) AS cnt120,
                   CAST(length(text) - length(replace(text, chr(121), '')) AS DOUBLE) AS cnt121,
                   CAST(length(text) - length(replace(text, chr(122), '')) AS DOUBLE) AS cnt122,
                   CAST(length(text) - length(replace(text, chr(123), '')) AS DOUBLE) AS cnt123,
                   CAST(length(text) - length(replace(text, chr(124), '')) AS DOUBLE) AS cnt124,
                   CAST(length(text) - length(replace(text, chr(125), '')) AS DOUBLE) AS cnt125,
                   CAST(length(text) - length(replace(text, chr(126), '')) AS DOUBLE) AS cnt126
            FROM documents
        )
    """


@register(
    "text_entropy",
    oracle=_ENTROPY_ORACLE,
    tags=("text", "quality", "extension"),
    window_rank=1,
)
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-level Shannon entropy — the classic
    gibberish/binary/boilerplate signal (low entropy = repeated
    characters or templates, high = random bytes; natural language
    sits in a narrow band).

    Scale shape: NO explode, NO shuffle. The naive formulation
    (explode per character, groupBy(doc, char)) shuffles one row per
    CHARACTER of the corpus — at 100 TB that is the corpus itself,
    multiplied. Instead the charset is fixed ASCII (the corpus
    precondition, asserted by test_corpus_text_is_ascii), and the
    entropy folds over an Arrow-batched per-doc byte histogram (one
    numpy bincount pass per doc — 95 string-replace scans cost ~3 s at
    sf0.1; this runs in ~0.3 s), embarrassingly parallel. The fold
    order over the charset is fixed ascending and identical in the SQL
    oracle's +-chain, so every double matches bit-for-bit before the
    JVM-side 1e-6 rounding (Spark/DuckDB ROUND are half-up; numpy's is
    banker's, so the rounding stays out of the UDF)."""
    import numpy as np

    @F.pandas_udf("double")
    def ent_udf(texts: pd.Series) -> pd.Series:
        if not len(texts):
            return pd.Series([], dtype="float64")
        # one bincount pass per doc (bytes == chars under the ASCII
        # precondition), then a VECTORIZED fold over the charset in
        # ascending code order — the same left-fold order as the SQL
        # oracle's +-chain, so the doubles agree before rounding
        counts = np.zeros((len(texts), 128), dtype=np.float64)
        lens = np.empty(len(texts), dtype=np.float64)
        for i, t in enumerate(texts):
            b = np.frombuffer(t.encode("ascii"), dtype=np.uint8)
            counts[i, :] = np.bincount(b, minlength=128)[:128]
            lens[i] = len(b)
        acc = np.zeros(len(texts), dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            for code in _ENTROPY_CODES:
                c = counts[:, code]
                p = c / lens
                term = np.where(c > 0, -(p * np.log(p)), 0.0)
                acc = acc + term
        return pd.Series(acc)

    docs = spread(read_table(spark, sf_dir, "documents"))
    # round JVM-side: Spark/DuckDB ROUND share half-up semantics,
    # Python/numpy round is banker's
    return docs.select(
        "doc_id", F.round(ent_udf(F.col("text")), 6).alias("entropy")
    )


@register(
    "text_ttr_stats",
    oracle="""
        WITH cnt AS (
            SELECT doc_id, u.tok, COUNT(*) AS c
            FROM (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM documents),
                 unnest(toks) AS u(tok)
            GROUP BY doc_id, u.tok
        )
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(COUNT(*) FILTER (c = 1) AS BIGINT) AS n_hapax,
               ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS ttr
        FROM cnt GROUP BY doc_id
    """,
    tags=("text", "quality", "extension"),
    window_rank=1,
)
def text_ttr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity quality signals per document: token count,
    type count (distinct tokens), hapax-legomena count (tokens
    occurring exactly once) and the type-token ratio — the
    low-diversity/SEO-spam detector that complements the repetition
    filter (``text_repetition`` catches repeated PHRASES; a low TTR
    catches keyword-stuffed or template text with no phrase-level
    repeats).

    Scale shape: token and type counts are row-local JVM expressions
    (``size`` / ``array_distinct`` — whole-stage codegen); only the
    hapax count needs per-token multiplicities, computed in one
    Arrow-batched pandas UDF (a Counter per doc — never an exploded
    corpus-wide groupBy). Zero shuffles at any scale."""

    @F.pandas_udf("long")
    def hapax_udf(texts: pd.Series) -> pd.Series:
        from collections import Counter

        import numpy as np

        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            c = Counter((t or "").split(TOKEN_SPLIT))
            out[i] = sum(1 for v in c.values() if v == 1)
        return pd.Series(out)

    d = spread(read_table(spark, sf_dir, "documents"))
    toks = tokens("text")
    n_tokens = F.size(toks).cast("long")
    n_types = F.size(F.array_distinct(toks)).cast("long")
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_types.alias("n_types"),
        hapax_udf(F.col("text")).alias("n_hapax"),
        F.round(n_types.cast("double") / n_tokens, 6).alias("ttr"),
    )


@register(
    "text_normalize",
    oracle="""
        SELECT doc_id,
               lower(nfc_normalize(text)) AS norm_text,
               lower(nfc_normalize(text)) <> text AS changed
        FROM documents
    """,
    tags=("text", "normalize", "extension"),
    window_rank=1,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode canonicalization over the corpus — NFC + casefold via
    :func:`normalize_unicode`, the stage a multilingual pipeline runs
    BEFORE exact dedup so composed/decomposed twins share a
    fingerprint. DuckDB's ``nfc_normalize()`` + ``lower()`` is the
    value-level oracle for this path (casefold ≡ lower on the ASCII
    corpus; the non-ASCII semantics — ß→ss, ligature folds, homoglyph
    folds — are pinned by unit tests in test_text_quality.py).
    Per-document Arrow-batched map: zero shuffle at any scale."""
    d = spread(read_table(spark, sf_dir, "documents"))
    norm = normalize_unicode("text", form="NFC", casefold=True)
    return d.select(
        "doc_id",
        norm.alias("norm_text"),
        (norm != F.col("text")).alias("changed"),
    )
