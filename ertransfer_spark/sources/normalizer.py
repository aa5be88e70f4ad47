"""CSV ingestion with delimiter sniffing + schema normalization.

Reference parity (/root/reference/splitters/random-split/normanizer.py):
- S2 delimiter sniffing: detect the separator from the first line among
  ``, ; | % > #`` (normanizer.py:21-23,62-67) — here a 1-line head probe
  via spark.read.text().limit(1), then a single spark.read.csv with the
  detected sep (the full file is scanned exactly once, distributed).
- S3 file/column normalization: rename the match columns ``D1,D2`` (and
  variants) to ``tableA_id,tableB_id``; require an ``id`` column
  (normanizer.py:7-18,26-40,69-81).
- S1 encoding repair: malformed rows are kept PERMISSIVE with a
  ``_corrupt`` capture column instead of pandas' encoding_errors='replace'
  (splitters/KNN-Join/splitter.py:160-162).

All attribute columns are cast to string and NaN-normalized to '' —
the reference's astype(str)+fillna contract
(splitters/KNN-Join/splitter.py:28-33).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CANDIDATE_SEPS = [",", ";", "|", "%", ">", "#"]

# aliases the reference renames to the canonical match-edge contract
_MATCH_RENAMES = {
    "d1": "tableA_id",
    "d2": "tableB_id",
    "ltable_id": "tableA_id",
    "rtable_id": "tableB_id",
    "idtablea": "tableA_id",
    "idtableb": "tableB_id",
}


def _local_name(col: str) -> str:
    """RDF-URI column header → its local name (segment after the last
    ``/`` or ``#``): the d5_imdb_tmdb pair files carry headers like
    ``https://www.scads.de/movieBenchmark/ontology/title``, and dotted
    URIs break Spark column resolution (``.`` is the nested-field
    accessor). Non-URI names pass through untouched."""
    if "://" not in col:
        return col
    for sep in ("#", "/"):
        if sep in col:
            col = col.rsplit(sep, 1)[1]
            break
    return col


def _localize_columns(df: DataFrame) -> DataFrame:
    """Rename URI-shaped headers to their local names; on a collision
    (two URIs sharing a local name) keep the originals untouched."""
    new = [_local_name(c) for c in df.columns]
    if new == df.columns or len(set(new)) != len(new):
        return df
    return df.toDF(*new)


def sniff_separator(spark: SparkSession, path: str) -> str:
    """Detect the delimiter from the header line (normanizer.py:21-23)."""
    head = spark.read.text(path).limit(1).collect()
    if not head:
        return ","
    line = head[0][0]
    counts = {s: line.count(s) for s in CANDIDATE_SEPS}
    best = max(counts, key=lambda s: counts[s])
    return best if counts[best] > 0 else ","


def read_csv_normalized(
    spark: SparkSession,
    path: str,
    require_id: bool = True,
) -> DataFrame:
    """Sniff-sep CSV scan → canonical relation: ``id`` long + all other
    columns string (''-filled). Raises if ``require_id`` and no id column
    (normanizer.py:73-75 hard-requires it)."""
    sep = sniff_separator(spark, path)
    df = spark.read.csv(
        path,
        header=True,
        sep=sep,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt",
    )
    cols = {c.lower(): c for c in df.columns}
    if "id" in cols and cols["id"] != "id":
        df = df.withColumnRenamed(cols["id"], "id")
    if require_id and "id" not in [c.lower() for c in df.columns]:
        raise ValueError(f"{path}: required column 'id' not found (have {df.columns})")
    out_cols = []
    for c in df.columns:
        if c == "_corrupt":
            continue
        # backtick-quote: URI headers contain '.', Spark's nested-field accessor
        ref = F.col(f"`{c}`" if "." in c else c)
        if c.lower() == "id":
            out_cols.append(ref.cast("long").alias("id"))
        else:
            out_cols.append(F.coalesce(ref.cast("string"), F.lit("")).alias(c))
    return _localize_columns(df.select(*out_cols))


def read_matches_normalized(spark: SparkSession, path: str) -> DataFrame:
    """Match-edge CSV → (tableA_id, tableB_id) longs, alias-renamed
    (normanizer.py:26-40)."""
    sep = sniff_separator(spark, path)
    df = spark.read.csv(path, header=True, sep=sep)
    for c in df.columns:
        tgt = _MATCH_RENAMES.get(c.lower().strip())
        if tgt:
            df = df.withColumnRenamed(c, tgt)
    need = {"tableA_id", "tableB_id"}
    if not need <= set(df.columns):
        raise ValueError(f"{path}: cannot find match columns in {df.columns}")
    return df.select(
        F.col("tableA_id").cast("long").alias("tableA_id"),
        F.col("tableB_id").cast("long").alias("tableB_id"),
    )


def read_pair_split(
    spark: SparkSession, path: str, prefix_ids: bool = True
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """DeepMatcher-style labeled pair CSV (``tableA_id, tableA_<attr>...,
    tableB_id, tableB_<attr>..., label``) → (pairs, records_a, records_b).

    This is the reference matcher benchmark's input shape — its methods
    train on ``train.csv`` and evaluate on ``test.csv`` committed per
    dataset (methods/deepmatcher/entrypoint.py:36-61,
    methods/magellan/entrypoint.py) — and because the attribute values are
    INLINE, it also unlocks datasets whose tableB.csv is not committed
    (d9_dblp_scholar, d11_itunes_amazon).

    Returns:
    - pairs: (a_id, b_id, label double) — ids ``a_``/``b_``-prefixed when
      ``prefix_ids`` (the two tables share a 0-based id space);
    - records_a/records_b: one row per distinct id with the side's
      attribute columns (``tableA_``/``tableB_`` prefixes stripped),
      deduplicated across however many pair rows mention the id.

    Scale note: ``multiLine=True`` is required (d2's description fields
    quote embedded newlines) and makes each CSV FILE non-splittable — one
    task per file. Fine for labeled pair splits (thousands of rows by
    construction: they are hand-labeled); for bulk data use parquet or
    newline-sanitized CSV so the scan parallelizes.
    """
    sep = sniff_separator(spark, path)
    df = spark.read.csv(
        path, header=True, sep=sep, multiLine=True, escape='"', encoding="UTF-8"
    )
    cols = df.columns
    if "label" not in [c.lower() for c in cols]:
        raise ValueError(f"{path}: pair split needs a 'label' column (have {cols})")

    def _side(tag: str, out_prefix: str) -> DataFrame:
        side_cols = [c for c in cols if c.lower().startswith(tag.lower())]
        id_src = next(c for c in side_cols if c.lower() == f"{tag.lower()}_id")
        id_expr = F.col(id_src).cast("long").cast("string")
        if prefix_ids:
            id_expr = F.concat(F.lit(out_prefix), id_expr)
        non_id = [c for c in side_cols if c.lower() != f"{tag.lower()}_id"]
        stripped = [c[len(tag) + 1 :] for c in non_id]
        # URI headers (d5) → local names, unless that would collide
        local = [_local_name(s) for s in stripped]
        if len(set(local)) != len(local):
            local = stripped
        attrs = [
            F.coalesce(F.col(f"`{c}`" if "." in c else c).cast("string"), F.lit("")).alias(out)
            for c, out in zip(non_id, local)
        ]
        return df.select(id_expr.alias("id"), *attrs).dropDuplicates(["id"])

    a_pre = "a_" if prefix_ids else ""
    b_pre = "b_" if prefix_ids else ""
    a_id = F.col("tableA_id").cast("long").cast("string")
    b_id = F.col("tableB_id").cast("long").cast("string")
    pairs = df.select(
        (F.concat(F.lit(a_pre), a_id) if prefix_ids else a_id).alias("a_id"),
        (F.concat(F.lit(b_pre), b_id) if prefix_ids else b_id).alias("b_id"),
        F.col("label").cast("double").alias("label"),
    )
    return pairs, _side("tableA", "a_"), _side("tableB", "b_")


def column_intersection(a: DataFrame, b: DataFrame, keep: tuple = ("id",)) -> tuple:
    """P2: restrict both sides to their common columns (schema-intersection
    projection, splitters/DeepBlocker/splitter.py:39-41) — order preserved
    from side A."""
    common = [c for c in a.columns if c in set(b.columns) or c in keep]
    return a.select(*common), b.select(*[c for c in common if c in b.columns])


TRANSCRIPT_TURN_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp_ntz"
)


def read_jsonl_transcripts(
    spark: SparkSession,
    path: str,
    strict: bool = False,
) -> DataFrame:
    """JSONL transcript scan → the canonical turn relation
    (conv_id, turn_idx, role, text, tool, ts) of the input_hint.

    JSON-Lines is the de-facto interchange format for LLM conversation
    corpora, so the engine accepts it natively alongside CSV/parquet.
    Scale discipline:

    - the schema is EXPLICIT (``TRANSCRIPT_TURN_SCHEMA``) — schema
      inference would add a full extra pass over the data before the real
      scan, prohibitive at 100 TB;
    - ``ts`` is ``timestamp_ntz`` (ISO-8601 wall-clock, no session-TZ
      dependence — the same TZ-proof contract as the parquet events
      table);
    - malformed lines follow the CSV path's S1 contract: PERMISSIVE with
      a ``_corrupt`` capture column, excluded from the returned relation
      (``strict=True`` switches to FAILFAST so the scan raises on the
      first bad line instead);
    - rows missing ``conv_id`` or ``turn_idx`` are unusable for ordered
      turn aggregation and are dropped with the corrupt lines;
    - ``text`` is ''-normalized (the astype(str)+fillna contract,
      splitters/KNN-Join/splitter.py:28-33).
    """
    df = spark.read.json(
        path,
        schema=TRANSCRIPT_TURN_SCHEMA + ", _corrupt string",
        mode="FAILFAST" if strict else "PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt",
    )
    return (
        df.filter(
            F.col("_corrupt").isNull()
            & F.col("conv_id").isNotNull()
            & F.col("turn_idx").isNotNull()
        )
        .select(
            "conv_id",
            "turn_idx",
            "role",
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
            "tool",
            "ts",
        )
    )
