"""gen_metadata tool: scan + k-shot subset round-trips on synthetic data."""
import json
import os
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
