"""Canonical vendored dataset metadata (VERDICT round-1 item 2).

The reference vendors the exact evaluation splits as JSONL
(/root/reference/dataset/metadata/*/full-shot.jsonl, 14,149 rows across 11
datasets, consumed at dataset/__init__.py:226-233). These are pure data — the
official per-dataset test splits — and are vendored verbatim under
aa_clip_iqm_tpu/data/metadata/ so `metadata_path()`'s packaged default
resolves with no flags. Row/class counts below were computed from the
reference snapshot; any drift means the splits no longer match the paper's.
"""
import json
import os

import pytest

from aa_clip_iqm_tpu.data.registry import DATASETS
from aa_clip_iqm_tpu.data.registry import metadata_path

# dataset -> (rows, classes, n_normal, n_anomalous)
EXPECTED = {
    "MVTec": (1725, 15, 467, 1258),
    "VisA": (2162, 12, 962, 1200),
    "MPDD": (458, 6, 176, 282),
    "BTAD": (741, 3, 451, 290),
    "Brain": (3715, 1, 640, 3075),
    "Liver": (1493, 1, 833, 660),
    "Retina": (1805, 1, 1041, 764),
    "Colon_clinicDB": (612, 1, 0, 612),
    "Colon_colonDB": (380, 1, 0, 380),
    "Colon_cvc300": (60, 1, 0, 60),
    "Colon_Kvasir": (1000, 1, 0, 1000),
}


def _rows(ds):
    path = metadata_path(ds, metadata_root=None)
    assert os.path.exists(path), f"packaged metadata missing for {ds}: {path}"
    with open(path) as f:
        return [json.loads(line) for line in f]


def test_total_row_count():
    # 14,151 JSON rows (== the reference's "14,149 lines" by wc -l; two of
    # its files lack a trailing newline).
    assert sum(v[0] for v in EXPECTED.values()) == 14151
    assert sum(len(_rows(ds)) for ds in EXPECTED) == 14151


@pytest.mark.parametrize("ds", sorted(EXPECTED))
def test_per_dataset_counts(ds, monkeypatch):
    monkeypatch.delenv("AACLIP_METADATA_ROOT", raising=False)
    rows = _rows(ds)
    n_rows, n_classes, n_norm, n_abn = EXPECTED[ds]
    assert len(rows) == n_rows
    classes = sorted({r["class_name"] for r in rows})
    assert len(classes) == n_classes
    # splits must cover exactly the registry's class list, same names
    assert classes == sorted(DATASETS[ds]["classes"].keys())
    labels = [int(r["label"]) for r in rows]
    assert labels.count(0) == n_norm and labels.count(1) == n_abn
    # schema: every row has the reference's four keys (README.md:29-33)
    for r in rows[:25]:
        assert {"image_path", "label", "class_name"} <= set(r)
        if int(r["label"]) == 1:
            assert "mask_path" in r
