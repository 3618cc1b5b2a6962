"""The driver runs ``bench.py`` at the end of every round and records its
single JSON stdout line; this guards the contract without paying for a
real genome-scale run (detect, the link probe and the reference engine
are stubbed)."""

import importlib.util
import json
import pathlib
import sys

import numpy as np
import pandas as pd


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", pathlib.Path(__file__).parents[1] / "bench.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_bench_prints_one_contract_json_line(tmp_path, monkeypatch, capsys):
    bench = _load_bench()

    cool = tmp_path / "g.cool"
    cool.write_bytes(b"")
    monkeypatch.setattr(bench, "ensure_genome", lambda: cool)
    monkeypatch.setattr(bench, "measure_link", lambda: (25e6, 25e6, 0.03))

    def fake_detect(cool_path, prefix):
        pd.DataFrame(
            {
                "chrom1": ["c1"],
                "start1": [0],
                "start2": [0],
                "bin1": [0],
                "bin2": [0],
                "score": [0.9],
            }
        ).to_csv(str(prefix) + ".tsv", sep="\t", index=False)

    monkeypatch.setattr(bench, "run_detect", fake_detect)
    monkeypatch.setattr(
        bench, "baseline_band",
        lambda *a: (np.zeros((8, 4)), np.zeros(8, bool)),
    )
    # pin the baseline to the stubbed reference engine
    monkeypatch.setattr(
        bench, "run_reference_engine", lambda *a, **k: 0.5
    )

    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, "bench stdout must be exactly one line"
    rec = json.loads(out[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in rec, key
    assert rec["unit"] == "windows/s"
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
    # honesty keys the round reports rely on
    assert len(rec["walls_s"]) in (2, 3)  # 3rd pass fires on contention
    assert rec["wall_s"] == min(rec["walls_s"])
    assert "attributable_s" in rec["link"]
    assert rec["baseline"].startswith("reference chromosight")


def test_bench_falls_back_to_reimplementation(tmp_path, monkeypatch, capsys):
    bench = _load_bench()
    cool = tmp_path / "g.cool"
    cool.write_bytes(b"")
    monkeypatch.setattr(bench, "ensure_genome", lambda: cool)
    monkeypatch.setattr(bench, "measure_link", lambda: (25e6, 25e6, 0.03))
    monkeypatch.setattr(bench, "run_detect", lambda *a: None)
    monkeypatch.setattr(
        bench, "baseline_band",
        lambda *a: (np.zeros((8, 4)), np.zeros(8, bool)),
    )
    monkeypatch.setattr(
        bench, "run_reference_engine", lambda *a, **k: None
    )
    monkeypatch.setattr(bench, "run_baseline", lambda *a: (0.25, 3))
    bench.main()
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["baseline"] == "reference-formulation reimplementation"
    assert rec["recall_planted_loops"] is None
