"""End-to-end CLI test on the reference's file contract (tableA.csv,
tableB.csv, matches.csv → train/valid/test/predictions/clusters/metrics)."""

from __future__ import annotations

import csv
import json
import subprocess
import sys
from pathlib import Path

from tests.test_tabular_and_skew import _fodors_zagats_like

REPO = Path(__file__).resolve().parent.parent


def _write_csv(path, header, rows):
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


def test_cli_run_reference_contract(tmp_path):
    rows_a, rows_b, matches = _fodors_zagats_like(n=50, seed=4)
    ds = tmp_path / "dataset"
    ds.mkdir()
    _write_csv(ds / "tableA.csv", ["id", "name", "phone_number", "street"], rows_a)
    _write_csv(ds / "tableB.csv", ["id", "name", "phone_number", "street"], rows_b)
    _write_csv(ds / "matches.csv", ["D1", "D2"], matches)  # reference alias names

    out_dir = tmp_path / "out"
    proc = subprocess.run(
        [sys.executable, "-m", "ertransfer_spark.cli", "run", str(ds), str(out_dir),
         "--k", "5", "--cpus", "4"],
        capture_output=True, text=True, cwd=str(REPO), timeout=500,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads([l for l in proc.stdout.splitlines() if l.startswith("{")][-1])
    assert summary["f1"] >= 0.9, summary

    for artifact in ["train.csv", "valid.csv", "test.csv", "predictions.csv",
                     "clusters.csv", "metrics.txt"]:
        assert (out_dir / artifact).exists(), artifact
    with open(out_dir / "predictions.csv") as f:
        header = f.readline().strip().split(",")
    assert {"a_id", "b_id", "label", "prob_class1"} <= set(header)


def test_cli_d1_recipe_real_dataset(tmp_path):
    """The reference's d1 settings (clean=True, QGram=4, dice, reverse) as
    ONE CLI invocation over the committed fodors-zagats dataset, with the
    RF matcher and per-attribute features — the 'switch to this repo and
    run your dataset' contract. Measured 0.893 (pipeline-test regime with
    its own split/checkpoint layout measures 0.90)."""
    import pytest

    d1 = Path("/root/reference/datasets/d1_fodors_zagats")
    if not d1.exists():
        pytest.skip("reference datasets not present")
    out_dir = tmp_path / "out"
    proc = subprocess.run(
        [sys.executable, "-m", "ertransfer_spark.cli", "run", str(d1), str(out_dir),
         "--clean", "--qgram", "4", "--metric", "dice", "--reverse",
         "--k", "5", "--algorithm", "rf",
         "--attrs", "name,phone_number,street", "--cpus", "8"],
        capture_output=True, text=True, cwd=str(REPO), timeout=500,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads([l for l in proc.stdout.splitlines() if l.startswith("{")][-1])
    assert summary["f1"] >= 0.85, summary


def test_cli_flag_to_config_plumbing():
    """Parser → PipelineConfig mapping for the newer knobs (no Spark):
    --direction/--no-multiset/--max-token-df/--attr-extra reach the config
    the CLI builds — a regression net for flag wiring, since the end-to-end
    CLI tests above only exercise the d1 recipe's subset."""
    from ertransfer_spark.cli import build_parser

    p = build_parser()
    args = p.parse_args(
        ["run", "in", "out", "--qgram", "5", "--no-multiset",
         "--max-token-df", "1000", "--direction", "union",
         "--attr-extra", "num:price,date:released", "--attrs", "price,released"]
    )
    assert args.qgram == 5 and args.no_multiset
    assert args.max_token_df == 1000 and args.direction == "union"
    attr_extra = tuple(tuple(x.split(":", 1)) for x in args.attr_extra.split(","))
    assert attr_extra == (("num", "price"), ("date", "released"))


def test_cli_train_params_coercion():
    """--train-params name=value pairs coerce ints/floats, via the SAME
    parse_train_params function cmd_run calls (not a test-local copy)."""
    from ertransfer_spark.cli import build_parser, parse_train_params

    p = build_parser()
    args = p.parse_args(
        ["run", "in", "out", "--train-params",
         "numTrees=100,maxDepth=16,subsamplingRate=0.8,impurity=entropy"]
    )

    tp = parse_train_params(args.train_params)
    assert tp == {"numTrees": 100, "maxDepth": 16,
                  "subsamplingRate": 0.8, "impurity": "entropy"}
