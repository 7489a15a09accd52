"""gen_metadata tool: scan + k-shot subset round-trips on synthetic data."""
import json
import os

import numpy as np
import subprocess
import sys

from aa_clip_iqm_tpu.data.synthetic import generate

TOOL = os.path.join(os.path.dirname(__file__), "..", "tools", "gen_metadata.py")


def _run(*args):
    out = subprocess.run([sys.executable, TOOL, *args], capture_output=True,
                         text=True)
    assert out.returncode == 0, out.stderr
    return out.stdout


def _rows(path):
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def test_scan_mvtec_matches_generated_metadata(tmp_path):
    root = str(tmp_path)
    data_path, meta_path = generate(root, n_normal=3, n_anomalous=4, size=32,
                                    class_names=("widget", "gadget"), seed=1)
    out = str(tmp_path / "scanned.jsonl")
    _run("scan-mvtec", "--data_root", data_path, "--out", out,
         "--good_name", "good")
    scanned = _rows(out)
    reference = _rows(meta_path)

    def key(rows):
        return sorted((r["image_path"], r["label"], r.get("mask_path"))
                      for r in rows)

    assert key(scanned) == key(reference)
    assert sum(r["label"] for r in scanned) == 8  # 4 anomalous x 2 classes


def test_subset_kshot(tmp_path):
    root = str(tmp_path)
    _, meta_path = generate(root, n_normal=6, n_anomalous=6, size=32,
                            class_names=("widget", "gadget"), seed=2)
    out = str(tmp_path / "4-shot.jsonl")
    _run("subset", "--full", meta_path, "--shot", "4", "--out", out)
    rows = _rows(out)
    assert len(rows) == 8  # 4 per class
    for class_name in ("widget", "gadget"):
        cls = [r for r in rows if r["class_name"] == class_name]
        assert len(cls) == 4
        assert sum(r["label"] for r in cls) == 2  # balanced half anomalous

    # determinism
    out2 = str(tmp_path / "again.jsonl")
    _run("subset", "--full", meta_path, "--shot", "4", "--out", out2)
    assert _rows(out2) == rows


def test_aot_smoke_tool():
    """tools/aot_smoke.py AOT-partitions + compiles the flagship-scale DP+TP
    programs on a self-provisioned virtual 8-device mesh. Opt-in (compiles
    ViT-L-shape programs, ~1 min on one CPU core):

        AACLIP_SCALE_TESTS=1 python -m pytest tests/test_tools.py -k aot
    """
    import pytest

    if not os.environ.get("AACLIP_SCALE_TESTS"):
        pytest.skip("flagship-scale AOT smoke is opt-in (AACLIP_SCALE_TESTS=1)")
    tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "aot_smoke.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    out = subprocess.run([sys.executable, tool], capture_output=True,
                         text=True, env=env, timeout=1800)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "AOT smoke OK" in out.stdout


def test_parity_run_dry_run(tmp_path):
    """tools/parity_run.py end-to-end on synthetic data + random tiny
    backbone (VERDICT r2 next-round item 1): tables land on disk, deltas vs
    an anchor table drive the exit code (0 in budget, 1 out of budget)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import parity_run

    from aa_clip_iqm_tpu.data.synthetic import register_synthetic

    root = str(tmp_path)
    generate(root, n_normal=4, n_anomalous=4, size=56, seed=7,
             class_names=("widget",))
    metadata_root = register_synthetic(root)

    base = ["--model_name", "tiny-test", "--img_size", "56",
            "--random_backbone", "--datasets", "Synth",
            "--metadata_root", metadata_root, "--image_batch_size", "4",
            "--compute_dtype", "float32"]

    out1 = str(tmp_path / "rep1")
    assert parity_run.main(base + ["--out", out1]) == 0
    with open(os.path.join(out1, "report.json")) as f:
        summary = json.load(f)
    avg = summary["datasets"]["Synth"]["average"]
    assert set(avg) == {"pixel AUC", "pixel AP", "image AUC", "image AP"}
    assert summary["datasets"]["Synth"]["pass"] is None  # no anchor table
    assert os.path.isfile(os.path.join(out1, "Synth.txt"))
    assert os.path.isfile(os.path.join(out1, "report.md"))

    # Anchor table at the measured numbers -> PASS.
    table = str(tmp_path / "anchor.json")
    with open(table, "w") as f:
        json.dump({"Synth": avg}, f)
    out2 = str(tmp_path / "rep2")
    assert parity_run.main(base + ["--out", out2,
                                   "--anchor_table", table]) == 0
    with open(os.path.join(out2, "report.json")) as f:
        assert json.load(f)["datasets"]["Synth"]["pass"] is True

    # Anchor shifted beyond the budget -> FAIL exit code.
    shifted = dict(avg)
    shifted["pixel AUC"] = avg["pixel AUC"] + 5.0
    with open(table, "w") as f:
        json.dump({"Synth": shifted}, f)
    out3 = str(tmp_path / "rep3")
    assert parity_run.main(base + ["--out", out3,
                                   "--anchor_table", table]) == 1
    with open(os.path.join(out3, "report.json")) as f:
        rep = json.load(f)
    assert rep["failed"] == ["Synth"]
    assert abs(rep["datasets"]["Synth"]["delta"]["pixel AUC"] + 5.0) < 1e-6

    # int8 tier variant: runs end-to-end and reports its own numbers.
    out4 = str(tmp_path / "rep4")
    assert parity_run.main(base + ["--out", out4,
                                   "--quantize_backbone", "int8"]) == 0
    with open(os.path.join(out4, "report.json")) as f:
        repq = json.load(f)
    assert "quantized backbone (int8)" in repq["weights"]
    assert np.isfinite(repq["datasets"]["Synth"]["average"]["pixel AUC"])


def test_shipped_anchor_table_schema():
    """docs/expected_anchors.json: the parity_run default anchor table —
    valid schema, provenance clearly labeled unverified, numeric metrics."""
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "expected_anchors.json")
    with open(path) as f:
        table = json.load(f)
    prov = table["_provenance"]
    assert "UNVERIFIED" in prov["status"]
    assert "2503.06661" in prov["source"]
    metrics = {"pixel AUC", "pixel AP", "image AUC", "image AP"}
    datasets = {k: v for k, v in table.items() if not k.startswith("_")}
    assert set(datasets) == {"MVTec", "VisA"}
    for name, row in datasets.items():
        assert row, name
        for metric, value in row.items():
            assert metric in metrics, (name, metric)
            assert isinstance(value, (int, float)) and 0 < value <= 100


def test_parity_run_default_anchor_table_is_shipped_file():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import parity_run

    args = parity_run.build_parser().parse_args([])
    assert os.path.isfile(args.anchor_table)
    assert os.path.basename(args.anchor_table) == "expected_anchors.json"
