"""Physical-plan audit over every contract query → PLAN_AUDIT.md.

For each `__spark_entry__.queries()` entry this captures
`df.explain("formatted")` and greps the plan for the scale smells the
brief calls out, writing a one-line verdict per query plus the evidence
lines (scan pushdown, codegen spans, exchange shapes) to PLAN_AUDIT.md:

- **CartesianProduct / BroadcastNestedLoopJoin** — fail unless the query
  is on the explicit allowlist (broadcast-tiny totals / centroid joins,
  each justified inline below).
- **Exchange SinglePartition** — reported as a note with a count, not a
  hard failure: a GLOBAL aggregate (`df.agg(...)` with no groupBy)
  legitimately merges map-side partials through one partition, which is
  O(partitions) rows, scale-safe. The dangerous shape — a data-scale
  `Window` over a single partition — was eliminated from the engine
  (CLAUDE.md: broadcast self-joins replace global windows), and the audit
  separately reports every `Window` node so a regression is visible.
- **BatchEvalPython** (row-at-a-time Python UDF) — always a failure; the
  engine's Python surface must be Arrow (`ArrowEvalPython`,
  `FlatMapGroupsInPandas`, `MapInPandas`, `FlatMapCoGroupsInPandas`).
- **Scan parquet** nodes — the audit records `PushedFilters` and
  `ReadSchema` so column pruning / predicate pushdown are visible per
  query (the transcript tables are read with explicit projections; the
  TPC-H-ish relational queries must show non-empty pushed filters).
- **WholeStageCodegen** span count — reported (wider is better; zero
  spans on a JVM-expression query would mean something broke codegen).

Plan audit runs at sf0.001: physical plan SHAPE is scale-invariant (the
same operators, exchanges, and pushdowns appear at any SF; only AQE's
runtime coalescing differs), and several queries execute driver-side
probe actions during construction (adaptive-kernel dictionary probes,
block counts, localCheckpoints), so the smallest SF keeps the audit
cheap.

Exit code 1 if any query fails a hard check — CI-able.
"""
from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# (query, node) pairs that are allowed to carry a nominally-suspicious
# node, each with the reason the shape is scale-safe.
ALLOW = {
    # kl_association compares per-key distributions against the global
    # one: the global side is a single aggregated row (one GROUP BY over
    # the events table), broadcast-nested-loop-joined back. O(1) rows.
    ("kl_association", "BroadcastNestedLoopJoin"): "1-row global-distribution frame",
    ("kl_divergence", "BroadcastNestedLoopJoin"): "1-row totals frame",
    # threshold sweeps join the ≤100-row bucket grid to itself with a >=
    # condition (the windowless cumulative-sum form — see CLAUDE.md).
    ("threshold_sweep", "BroadcastNestedLoopJoin"):
        "≤100-row bucket-grid >= self-join + 1-row totals crossJoin",
    ("tokenize_stats", "BroadcastNestedLoopJoin"): "1-row corpus-totals frame",
    ("tfidf_pair_cosine", "BroadcastNestedLoopJoin"): "1-row corpus-count frame",
    # IVF joins every vector against the BROADCAST n_lists-row centroid
    # table to pick its nearest list(s) — O(n_lists) per row, the standard
    # IVF assignment shape.
    ("ann_ivf_topk", "BroadcastNestedLoopJoin"): "broadcast n_lists-row centroids",
}


def audit_one(name: str, df) -> dict:
    # Execute the query's own queryExecution first (cheap at sf0.001):
    # AQE-wrapped plans show neither codegen ids nor the runtime-chosen
    # join strategies until isFinalPlan=true, and the FINAL plan is the
    # one worth auditing.
    df.collect()
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()

    failures: list[str] = []
    notes: list[str] = []

    for node in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        if node in plan:
            why = ALLOW.get((name, node))
            if why:
                notes.append(f"{node}: allowed ({why})")
            else:
                failures.append(node)
    n_single = plan.count("Exchange SinglePartition")
    if n_single:
        notes.append(f"{n_single} single-partition exchange(s) (global aggs)")
    n_window = plan.count(") Window")
    if n_window:
        notes.append(f"{n_window} Window node(s)")
    if "BatchEvalPython" in plan:
        failures.append("BatchEvalPython (row-at-a-time Python UDF)")

    # formatted mode annotates nodes with "[codegen id : N]" — distinct ids
    # = number of WholeStageCodegen spans
    codegen = len(set(re.findall(r"\[codegen id : (\d+)\]", plan)))
    arrow = sorted(
        set(
            re.findall(
                r"(ArrowEvalPython|FlatMapGroupsInPandas|FlatMapCoGroupsInPandas|MapInPandas)",
                plan,
            )
        )
    )
    scans = []
    for m in re.finditer(r"\(\d+\) Scan parquet[^\n]*\n((?:[^\n]*\n){1,8})", plan):
        block = m.group(1)
        loc = re.search(r"Location:.*?\[([^\]]*)\]", block)
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", block)
        rs = re.search(r"ReadSchema: (.*)", block)
        table = Path(loc.group(1)).name if loc and loc.group(1) else "?"
        scans.append(
            {
                "table": table,
                "pushed": pushed.group(1) if pushed else "",
                "read_schema": (rs.group(1).strip() if rs else "")[:160],
            }
        )

    return {
        "name": name,
        "failures": failures,
        "notes": notes,
        "codegen_spans": codegen,
        "arrow_nodes": arrow,
        "scans": scans,
        "n_exchanges": plan.count("Exchange "),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2] if len(sys.argv) > 2 else None

    import __spark_entry__ as entrymod
    from ertransfer_spark.session import get_spark

    spark = get_spark("plan-audit", cpus=8, shuffle_partitions=16)
    results = []
    for name, fn in entrymod.queries().items():
        if only and name != only:
            continue
        try:
            results.append(audit_one(name, fn(spark, sf_dir)))
        except Exception as e:  # noqa: BLE001 — audit everything, report at end
            results.append(
                {"name": name, "failures": [f"audit error: {type(e).__name__}: {e}"],
                 "notes": [], "codegen_spans": 0, "arrow_nodes": [], "scans": [],
                 "n_exchanges": 0}
            )
        r = results[-1]
        status = "FAIL" if r["failures"] else "ok"
        print(f"[{status:>4}] {r['name']}: codegen={r['codegen_spans']} "
              f"exchanges={r['n_exchanges']} {';'.join(r['failures'])}", flush=True)

    bad = [r for r in results if r["failures"]]
    out = [
        "# PLAN_AUDIT — physical-plan checks over every contract query",
        "",
        f"Generated by `python scripts/plan_audit.py {sf_dir}`. "
        f"{len(results)} queries audited, **{len(bad)} hard failures**.",
        "",
        "Hard checks: no `CartesianProduct`/`BroadcastNestedLoopJoin` outside the",
        "justified allowlist (broadcast 1-row totals / ≤100-row grids / n_lists-row",
        "centroid tables) and no `BatchEvalPython` (all Python is Arrow-batched).",
        "Reported per query: WholeStageCodegen span count, exchange count,",
        "single-partition exchanges (global-agg partial merges — O(partitions)",
        "rows, scale-safe), Window nodes, Arrow nodes, and every parquet scan's",
        "pushed filters + read schema (predicate pushdown / column pruning",
        "evidence).",
        "",
        "| query | verdict | codegen spans | exchanges | arrow nodes | notes |",
        "|---|---|---|---|---|---|",
    ]
    for r in results:
        verdict = "**FAIL**: " + "; ".join(r["failures"]) if r["failures"] else "ok"
        out.append(
            f"| {r['name']} | {verdict} | {r['codegen_spans']} | "
            f"{r['n_exchanges']} | {', '.join(r['arrow_nodes']) or '—'} | "
            f"{'; '.join(r['notes']) or '—'} |"
        )
    out += ["", "## Parquet scans (pushdown / pruning evidence)", ""]
    for r in results:
        if not r["scans"]:
            continue
        out.append(f"### {r['name']}")
        for s in r["scans"]:
            out.append(
                f"- `{s['table']}` PushedFilters=[{s['pushed']}] "
                f"ReadSchema=`{s['read_schema']}`"
            )
        out.append("")
    Path(REPO / "PLAN_AUDIT.md").write_text("\n".join(out) + "\n")
    print(f"\nwrote PLAN_AUDIT.md — {len(bad)} failures")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
