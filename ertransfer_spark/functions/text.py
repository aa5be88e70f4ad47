"""Text normalization / tokenization Column expressions (SURVEY §2.7 F1-F4).

Reference semantics being reproduced (citations into /root/reference):
- char cleanup: tab→space and literal 'nan' stripping,
  splitters/KNN-Join/splitter.py:30-33,46-50  → :func:`clean_text`
- tokenize (nltk word_tokenize analog), splitters/KNN-Join/splitter.py:17
  → :func:`tokens` — we pin a deterministic regex tokenizer (lower +
  split on non-alphanumeric) so the Spark plan, the pandas oracle, and
  the DuckDB oracle SQL byte-match.
- stopword removal + stemming, splitters/KNN-Join/splitter.py:16-19,40-43
  → :func:`remove_stopwords`, :func:`stem_tokens` (suffix-stripper; nltk
  is not in the image so the stemmer is our own pinned spec).
- q-gram generation (q∈2..5, set or multiset),
  splitters/KNN-Join/splitter.py:72-78, settings.py:2-11 → :func:`qgrams`.

Everything here is a native Column expression (whole-stage codegen);
the only Python is the stemmer's pandas UDF, Arrow-batched.

The module also exports the DuckDB-SQL equivalents used by
``__spark_entry__.oracle_sql`` so tokenization parity is kept in ONE place.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- the pinned tokenization spec ------------------------------------------
# lower() then split on runs of non-alphanumeric, drop empties.
TOKEN_SPLIT_RE = "[^a-z0-9]+"

# DuckDB expression templates ({col} is substituted). Keeping them beside the
# Spark expressions is what guarantees oracle parity.
DUCKDB_TOKENS = (
    "list_filter(regexp_split_to_array(lower({col}), '[^a-z0-9]+'), t -> t <> '')"
)
DUCKDB_NORM = "trim(regexp_replace(lower({col}), '[^a-z0-9]+', ' ', 'g'))"

# Small pinned English stopword list (public, the usual top function words).
STOPWORDS = [
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "from",
    "has", "he", "in", "is", "it", "its", "of", "on", "or", "that", "the",
    "to", "was", "were", "will", "with", "this", "i", "you", "not", "they",
]


def clean_text(col: Column | str) -> Column:
    """Tab→space, strip literal 'nan', collapse whitespace, trim.

    Parity: splitters/KNN-Join/splitter.py:30-33 (tab replace) and :46-50
    ('nan' strip after str-cast of NaN cells).
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.coalesce(c, F.lit(""))
    c = F.regexp_replace(c, "\t", " ")
    c = F.regexp_replace(c, r"\bnan\b", "")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c


def normalize(col: Column | str) -> Column:
    """lower + non-alphanumeric→space + collapse + trim. The canonical
    string every similarity/tokenization derives from (mirrors
    DUCKDB_NORM exactly)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(F.coalesce(c, F.lit("")))
    c = F.regexp_replace(c, "[^a-z0-9]+", " ")
    return F.trim(c)


def tokens(col: Column | str) -> Column:
    """Array of word tokens per the pinned spec (mirrors DUCKDB_TOKENS)."""
    c = F.col(col) if isinstance(col, str) else col
    arr = F.split(F.lower(F.coalesce(c, F.lit(""))), TOKEN_SPLIT_RE)
    return F.filter(arr, lambda t: t != F.lit(""))


def distinct_tokens(col: Column | str) -> Column:
    return F.array_distinct(tokens(col))


def remove_stopwords(tokens_col: Column, stopwords: list[str] | None = None) -> Column:
    """Drop stopwords from a token array (parity: splitter.py:16-19,40-43).

    Uses array_except against a literal array — stays JVM-side; at scale the
    literal is embedded in the plan (tiny), no broadcast needed.
    """
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS)])
    return F.array_except(tokens_col, sw)


def stem_tokens(tokens_col: Column) -> Column:
    """Pinned light suffix-stripper over a token array, JVM-side.

    The reference uses nltk Snowball (splitters/KNN-Join/splitter.py:16-19);
    nltk is not in this image so the *spec* here is our own, shared verbatim
    with the pandas oracle (oracle/pandas_oracle.py:stem). Rules applied
    longest-first, once: sses→ss, ies→i, ing→'', ed→'', s→'' (len guards).
    """
    def rules(t: Column) -> Column:
        n = F.length(t)
        return (
            F.when((n > 4) & t.endswith("sses"), t.substr(F.lit(1), n - 2))
            .when((n > 4) & t.endswith("ies"), t.substr(F.lit(1), n - 2))
            .when((n > 5) & t.endswith("ing"), t.substr(F.lit(1), n - 3))
            .when((n > 4) & t.endswith("ed"), t.substr(F.lit(1), n - 2))
            .when((n > 3) & t.endswith("s") & ~t.endswith("ss"), t.substr(F.lit(1), n - 1))
            .otherwise(t)
        )

    return F.transform(tokens_col, rules)


def qgrams(col: Column | str, q: int = 3, multiset: bool = False) -> Column:
    """Character q-grams of the normalized string (F4).

    Parity: pyJedAI tokenization='qgrams'[,'_multiset'] with q∈{2..5}
    (splitters/KNN-Join/splitter.py:72-78, settings.py:2-11). Set semantics
    unless ``multiset``. Pure Column expr — sequence + substr transform —
    so it codegens; no UDF.

    The normalized string is LET-BOUND via a 1-element-array transform:
    Catalyst has no common-subexpression elimination inside lambda bodies,
    so referencing ``normalize(col)`` directly from the per-gram lambda
    would re-run the regexp normalization once PER GRAM (O(len²) per row —
    measured ~10× wall on prose columns). Binding it to a lambda variable
    evaluates it exactly once per row; output values are identical.
    """
    def body(s: Column) -> Column:
        n = F.length(s)
        return F.when(
            n < q, F.when(n > 0, F.array(s)).otherwise(F.array().cast("array<string>"))
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), n - F.lit(q - 1)),
                lambda i: s.substr(i, F.lit(q)),
            )
        )

    grams = F.transform(F.array(normalize(col)), body)[0]
    return grams if multiset else F.array_distinct(grams)


# --- word n-gram shingles (the blocking token for repetitive corpora) ------
# Spark SQL array indexing is 0-based; DuckDB list indexing is 1-based —
# both expressions below emit exactly size-1 bigrams / size-2 trigrams.
SPARK_TOKENS_SQL = "filter(split(lower(coalesce({col}, '')), '[^a-z0-9]+'), t -> t != '')"
DUCKDB_TOKENS_SQL = (
    "list_filter(regexp_split_to_array(lower(coalesce({col}, '')), '[^a-z0-9]+'), t -> t <> '')"
)
SPARK_BIGRAMS_SQL = (
    "array_distinct(if(size({ts}) < 2, slice({ts}, 1, 0), "
    "transform(sequence(1, size({ts}) - 1), i -> concat({ts}[i-1], ' ', {ts}[i]))))"
)
DUCKDB_BIGRAMS_SQL = (
    "list_distinct(list_transform(range(1, greatest(len({ts}), 1)), "
    "i -> {ts}[i] || ' ' || {ts}[i+1]))"
)
SPARK_TRIGRAMS_SQL = (
    "array_distinct(if(size({ts}) < 3, slice({ts}, 1, 0), "
    "transform(sequence(1, size({ts}) - 2), i -> concat({ts}[i-1], ' ', {ts}[i], ' ', {ts}[i+1]))))"
)
DUCKDB_TRIGRAMS_SQL = (
    "list_distinct(list_transform(range(1, greatest(len({ts}) - 1, 1)), "
    "i -> {ts}[i] || ' ' || {ts}[i+1] || ' ' || {ts}[i+2]))"
)


def word_shingles(text_col: str, n: int = 2) -> Column:
    """Distinct word n-gram shingles of a text column (n ∈ {2, 3}).

    The standard MinHash shingling unit: for corpora with small
    vocabularies (agent transcripts, log-like text) unigram token sets are
    near-identical across documents, so blocking/dedup tokens must be
    shingles to stay selective.

    The tokenize expression is LET-BOUND (``transform(array(toks), ts ->
    shingles)[0]``) instead of textually substituted into the shingle
    template: the template references ``{ts}`` five times, two of them
    inside the per-shingle lambda, and Catalyst performs no common-
    subexpression elimination across lambda boundaries — direct
    substitution re-runs the full split/filter tokenization ~2·n_tokens
    times per row (measured 2× the whole stage at sf0.1). Values are
    identical; the bound form evaluates tokenization once per row."""
    toks = SPARK_TOKENS_SQL.format(col=text_col)
    tpl = {2: SPARK_BIGRAMS_SQL, 3: SPARK_TRIGRAMS_SQL}[n]
    body = tpl.format(ts="ts")
    return F.expr(f"transform(array({toks}), ts -> {body})[0]")


def serialize_pair(a: Column | str, b: Column | str, sep: str = " [SEP] ") -> Column:
    """F9 (string part): one-string pair serialization — dader/unicorn join
    the two records' agValues with ``' [SEP] '`` into a single ``pairs``
    column (methods/dader/transform.py:24-26, methods/unicorn/
    transform.py:26-31). The wordpiece encode itself is the (out-of-scope)
    transformer path; this is the seam a fine-tuned LM would consume."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.concat_ws(sep, F.coalesce(ca, F.lit("")), F.coalesce(cb, F.lit("")))


def instruction_template(a: Column | str, b: Column | str) -> Column:
    """F12: unicorn's instruction templating —
    ``"does X [SEP] matches with Y"`` (methods/unicorn/transform.py:26-28)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.format_string("does %s [SEP] matches with %s", ca, cb)


def duckdb_qgrams_sql(col: str, q: int = 3, multiset: bool = False) -> str:
    """DuckDB expression mirroring :func:`qgrams` (for oracle_sql)."""
    norm = DUCKDB_NORM.format(col=col)
    grams = (
        f"CASE WHEN length({norm}) < {q} THEN "
        f"  CASE WHEN length({norm}) > 0 THEN [{norm}] ELSE []::VARCHAR[] END "
        f"ELSE list_transform(range(1, length({norm}) - {q - 2}), i -> substr({norm}, i, {q})) END"
    )
    if not multiset:
        grams = f"list_distinct({grams})"
    return grams
