"""Non-ASCII oracle-parity regression for binary_meta (ADVICE round 2).

The sf* documents fixtures are ASCII-only, which would have masked a
byte_sum divergence between the Spark side (sums actual UTF-8 bytes)
and a DuckDB oracle summing per-character code points ('é' → 233 vs
195+169). The oracle now decodes hex pairs of encode(text); this test
pins that equivalence on a corpus that exercises 2-byte, 3-byte and
4-byte UTF-8 sequences plus NULL and empty text, so a future fixture
regeneration with non-ASCII content cannot silently flip the gate.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest


DOCS = pd.DataFrame(
    {
        "doc_id": [0, 1, 2, 3, 4, 5],
        "text": [
            "plain ascii only",
            "café naïve résumé",          # 2-byte seqs
            "日本語 テスト",            # 3-byte seqs (CJK)
            "emoji \U0001f600\U0001f680 mix",                   # 4-byte seqs
            "",                                                  # empty
            None,                                                # null
        ],
    }
)


def test_binary_meta_matches_oracle_on_nonascii(spark, tmp_path):
    import __spark_entry__ as entry

    sf_dir = tmp_path / "sf_nonascii"
    sf_dir.mkdir()
    DOCS.to_parquet(sf_dir / "documents.parquet", index=False)

    sdf = entry.queries()["binary_meta"](spark, str(sf_dir)).toPandas()

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir / 'documents.parquet'}'"
    )
    ddf = con.sql(entry.oracle_sql()["binary_meta"]).df()

    s = sdf.sort_values("doc_id").reset_index(drop=True)
    d = ddf.sort_values("doc_id").reset_index(drop=True)
    assert sorted(s.columns) == sorted(d.columns)
    for c in ["n_bytes", "byte_sum"]:
        assert s[c].astype("int64").tolist() == d[c].astype("int64").tolist(), c
    assert s["content_tag"].tolist() == d["content_tag"].tolist()

    # ground truth spot-checks: UTF-8 byte semantics, not code points
    row = s.set_index("doc_id")
    assert int(row.loc[1, "n_bytes"]) == len("café naïve résumé".encode("utf-8"))
    assert int(row.loc[1, "byte_sum"]) == sum("café naïve résumé".encode("utf-8"))
    assert int(row.loc[3, "n_bytes"]) == len("emoji 😀🚀 mix".encode("utf-8"))
    assert int(row.loc[4, "n_bytes"]) == 0 and row.loc[4, "content_tag"] == "empty"
    assert int(row.loc[5, "n_bytes"]) == 0 and row.loc[5, "content_tag"] == "empty"
