"""HTTP serving front-end: endpoints, codecs, batching, error mapping."""
import base64
import io
import json
import logging
import os
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax

from aa_clip_iqm_tpu.configs import TrainConfig, tiny_test_config
from aa_clip_iqm_tpu.data.synthetic import generate, register_synthetic
from aa_clip_iqm_tpu.models import adapters as adapters_mod
from aa_clip_iqm_tpu.models.clip import init_clip_params
from aa_clip_iqm_tpu.serving import AnomalyDetector, MicroBatchingService
from aa_clip_iqm_tpu.train.driver import run_training

IMG = 56


@pytest.fixture(scope="module")
def server_stack(tmp_path_factory):
    """Trained tiny model -> detector (+extra class) -> micro-batcher ->
    live HTTP server on an ephemeral port."""
    from aa_clip_iqm_tpu.cli.serve import make_server, serve_forever_in_thread
    from aa_clip_iqm_tpu.train import checkpoint as ckpt

    root = str(tmp_path_factory.mktemp("servehttp"))
    generate(root, n_normal=4, n_anomalous=4, size=IMG, seed=7,
             class_names=("widget",))
    metadata_root = register_synthetic(root)
    cfg = tiny_test_config(IMG)
    frozen = init_clip_params(jax.random.PRNGKey(0), cfg.clip)
    trainable = adapters_mod.init_adapter_params(jax.random.PRNGKey(1), cfg)
    save_path = os.path.join(root, "ckpt")
    train_cfg = TrainConfig(
        dataset="Synth", img_size=IMG, training_mode="full_shot", shot=-1,
        text_batch_size=4, image_batch_size=4, text_epoch=1, image_epoch=1,
        save_path=save_path, compute_dtype="float32")
    run_training(frozen, trainable, cfg, train_cfg,
                 logging.getLogger("serve"), metadata_root=metadata_root)

    restored_text = ckpt.load_stage1(save_path, trainable["text_adapter"])
    trainable = dict(trainable)
    trainable["text_adapter"] = restored_text["params"]
    trainable = ckpt.load_stage2(save_path, trainable,
                                 latest_numbered=True)["params"]
    det = AnomalyDetector(frozen, trainable, cfg, "Synth", img_size=IMG,
                          adapted_text=True, compute_dtype=np.float32,
                          use_pallas=False, batch_buckets=(1, 4, 8))
    a = np.asarray(det.anchors["widget"])
    det.anchors["gizmo"] = np.ascontiguousarray(a[:, ::-1])
    svc = MicroBatchingService(det, max_batch=8, max_latency_ms=50.0)
    server = make_server(svc, IMG,
                         {"source": "test", "dataset": "Synth",
                          "classes": det.class_names()},
                         host="127.0.0.1", port=0, request_timeout=120.0)
    serve_forever_in_thread(server)
    base = "http://%s:%d" % server.server_address
    yield base, det, root
    server.shutdown()
    server.server_close()
    svc.close()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, json.loads(r.read())


def _post(url, data, content_type):
    req = urllib.request.Request(
        url, data=data, headers={"Content-Type": content_type})
    try:
        with urllib.request.urlopen(req, timeout=150) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _npy_bytes(arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def _decode_map(entry):
    assert entry["encoding"] == "npy"
    return np.load(io.BytesIO(base64.b64decode(entry["b64"])),
                   allow_pickle=False)


def test_health_and_classes(server_stack):
    base, det, _ = server_stack
    status, body = _get(base + "/v1/health")
    assert status == 200 and body["status"] == "ok"
    assert body["img_size"] == IMG and body["dataset"] == "Synth"
    assert sorted(body["classes"]) == sorted(det.class_names())
    status, body = _get(base + "/v1/classes")
    assert status == 200 and "widget" in body["classes"]


def test_predict_npy_roundtrip(server_stack, rng):
    """Raw .npy route: score+map match the detector called directly."""
    base, det, _ = server_stack
    image = rng.standard_normal((3, IMG, IMG)).astype(np.float32)
    status, body = _post(base + "/v1/predict?class_name=widget",
                         _npy_bytes(image), "application/octet-stream")
    assert status == 200
    ref_maps, ref_scores = det.predict(image[None], "widget")
    np.testing.assert_allclose(body["score"], ref_scores[0], rtol=1e-4)
    amap = _decode_map(body["map"])
    assert amap.shape == (IMG, IMG)
    np.testing.assert_allclose(amap, ref_maps[0], rtol=1e-4, atol=1e-5)
    # map=none -> score-only response
    status, body = _post(base + "/v1/predict?class_name=widget&map=none",
                         _npy_bytes(image), "application/octet-stream")
    assert status == 200 and "map" not in body


def test_predict_json_image_file(server_stack):
    """JSON route with base64 image-file bytes: server-side preprocessing
    matches predict_paths (same PIL-parity pipeline)."""
    base, det, root = server_stack
    img_dir = os.path.join(root, "Synth", "widget", "test", "defect")
    path = os.path.join(img_dir, sorted(os.listdir(img_dir))[0])
    with open(path, "rb") as f:
        raw = f.read()
    payload = json.dumps({
        "class_name": "widget",
        "image_b64": base64.b64encode(raw).decode()}).encode()
    status, body = _post(base + "/v1/predict", payload, "application/json")
    assert status == 200
    ref_maps, ref_scores = det.predict_paths([path], "widget")
    np.testing.assert_allclose(body["score"], ref_scores[0], rtol=1e-4)
    np.testing.assert_allclose(_decode_map(body["map"]), ref_maps[0],
                               rtol=1e-4, atol=1e-5)


def test_predict_png_overlay(server_stack, rng):
    cv2 = pytest.importorskip("cv2")
    base, _, _ = server_stack
    image = rng.standard_normal((3, IMG, IMG)).astype(np.float32)
    status, body = _post(base + "/v1/predict?class_name=widget&map=png",
                         _npy_bytes(image), "application/octet-stream")
    assert status == 200 and body["map"]["encoding"] == "png"
    png = np.frombuffer(base64.b64decode(body["map"]["b64"]), np.uint8)
    overlay = cv2.imdecode(png, cv2.IMREAD_COLOR)
    assert overlay.shape == (IMG, IMG, 3)


def test_predict_batch_mixed_classes(server_stack, rng):
    """Batch endpoint: mixed classes in one request; per-item unknown-class
    failure doesn't poison the others."""
    base, det, _ = server_stack
    images = rng.standard_normal((3, 3, IMG, IMG)).astype(np.float32)
    names = ["widget", "gizmo", "widget"]
    reqs = [{"class_name": c,
             "npy_b64": base64.b64encode(_npy_bytes(images[i])).decode()}
            for i, c in enumerate(names)]
    reqs.append({"class_name": "nope",
                 "npy_b64": base64.b64encode(_npy_bytes(images[0])).decode()})
    status, body = _post(base + "/v1/predict_batch",
                         json.dumps({"requests": reqs}).encode(),
                         "application/json")
    assert status == 200
    results = body["results"]
    assert len(results) == 4
    for i, c in enumerate(names):
        ref_maps, ref_scores = det.predict(images[i:i + 1], c)
        np.testing.assert_allclose(results[i]["score"], ref_scores[0],
                                   rtol=1e-4)
        np.testing.assert_allclose(_decode_map(results[i]["map"]),
                                   ref_maps[0], rtol=1e-4, atol=1e-5)
    assert results[3]["status"] == 404
    assert "unknown class" in results[3]["error"]


def test_concurrent_requests_coalesce(server_stack, rng):
    """Parallel clients all succeed (and ride the micro-batcher)."""
    from concurrent.futures import ThreadPoolExecutor

    base, det, _ = server_stack
    images = rng.standard_normal((6, 3, IMG, IMG)).astype(np.float32)
    names = ["widget", "gizmo"] * 3

    def call(i):
        return _post(
            base + f"/v1/predict?class_name={names[i]}&map=none",
            _npy_bytes(images[i]), "application/octet-stream")

    with ThreadPoolExecutor(max_workers=6) as ex:
        out = list(ex.map(call, range(6)))
    for i, (status, body) in enumerate(out):
        assert status == 200
        ref_maps, ref_scores = det.predict(images[i:i + 1], names[i])
        np.testing.assert_allclose(body["score"], ref_scores[0], rtol=1e-4)


def test_error_mapping(server_stack, rng):
    base, _, _ = server_stack
    image = rng.standard_normal((3, IMG, IMG)).astype(np.float32)
    # unknown endpoint
    status, body = _post(base + "/v1/nope", b"x", "application/octet-stream")
    assert status == 404
    # missing class name
    status, body = _post(base + "/v1/predict", _npy_bytes(image),
                         "application/octet-stream")
    assert status == 400 and "class" in body["error"]
    # unknown class
    status, body = _post(base + "/v1/predict?class_name=nope",
                         _npy_bytes(image), "application/octet-stream")
    assert status == 404 and "unknown class" in body["error"]
    # wrong shape
    status, body = _post(base + "/v1/predict?class_name=widget",
                         _npy_bytes(image[:, :8]), "application/octet-stream")
    assert status == 400 and "expected" in body["error"]
    # invalid npy payload
    status, body = _post(base + "/v1/predict?class_name=widget",
                         b"not an npy", "application/octet-stream")
    assert status == 400
    # invalid JSON
    status, body = _post(base + "/v1/predict", b"{broken",
                         "application/json")
    assert status == 400
    # batch: malformed body
    status, body = _post(base + "/v1/predict_batch",
                         json.dumps({"requests": []}).encode(),
                         "application/json")
    assert status == 400
    # bad map mode
    status, body = _post(base + "/v1/predict?class_name=widget&map=wat",
                         _npy_bytes(image), "application/octet-stream")
    assert status == 400


def test_error_closes_keepalive_connection(server_stack, rng):
    """Error paths may respond before draining the request body; on an
    HTTP/1.1 keep-alive connection the server must send Connection: close so
    leftover body bytes are never parsed as the next request line."""
    import http.client

    base, _, _ = server_stack
    host, port = base.removeprefix("http://").split(":")
    conn = http.client.HTTPConnection(host, int(port), timeout=120)
    try:
        conn.request("POST", "/v1/nope", body=b"x" * 1024,
                     headers={"Content-Type": "application/octet-stream"})
        resp = conn.getresponse()
        assert resp.status == 404
        assert resp.getheader("Connection", "").lower() == "close"
        resp.read()
    finally:
        conn.close()
    # A fresh request after the error still works (server thread survived).
    status, body = _get(base + "/v1/health")
    assert status == 200 and body["status"] == "ok"
