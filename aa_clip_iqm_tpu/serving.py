"""High-level serving API: one object from checkpoint to anomaly maps.

The reference has no serving surface (its only consumers are the train/eval
CLIs). For production use this wraps model assembly, checkpoint restore,
anchor caching, and the fused jitted predict program behind one class:

    from aa_clip_iqm_tpu.serving import AnomalyDetector

    det = AnomalyDetector.from_checkpoint("ckpt/baseline", dataset="MVTec")
    maps, scores = det.predict(images, class_name="bottle")   # numpy in/out
    maps, scores = det.predict_paths(["a.png", "b.png"], "bottle")

Anchors are computed once per dataset and cached in HBM; each distinct batch
shape compiles once. Works zero-shot (no checkpoint: raw CLIP anchors +
untrained adapters are allowed but quality needs a trained checkpoint).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .configs import ModelConfig
from .data.datasets import _load_image_u8
from .data.registry import DOMAINS
from .evaluation.predict import make_predict_fn
from .loader import build_model_config, init_trainable, load_frozen_backbone
from .train import checkpoint as ckpt
from .train.driver import compute_frozen_anchors


#: Default compile-once batch buckets. predict() pads ragged caller batches
#: up to the smallest fitting bucket and splits oversize batches into
#: largest-bucket chunks, so the number of distinct compiled programs is
#: bounded by len(buckets) no matter what batch sizes callers send (a fresh
#: ViT-L shape costs minutes of compile).
DEFAULT_BATCH_BUCKETS = (1, 8, 16, 32)


def _bucketed(images, buckets, split, run):
    """Bucket fit/pad/split shared by the four predict entry points.

    Empty batches short-circuit to empty (0, H, W)/(0,) results; batches
    larger than the biggest bucket are split into largest-bucket chunks via
    ``split(start, stop)`` (re-entering the public method so each chunk is
    bucketed in turn); everything else is zero-padded up to the smallest
    fitting bucket and dispatched once through ``run(padded, bucket, n)``,
    which slices the pad rows back off.
    """
    n = images.shape[0]
    if n == 0:
        return (np.zeros((0,) + tuple(images.shape[-2:]), np.float32),
                np.zeros((0,), np.float32))
    fitting = [b for b in buckets if b >= n]
    if not fitting:
        bucket = buckets[-1]
        maps, scores = zip(*(split(i, min(i + bucket, n))
                             for i in range(0, n, bucket)))
        return np.concatenate(maps), np.concatenate(scores)
    bucket = fitting[0]
    if bucket != n:
        images = np.concatenate(
            [images, np.zeros((bucket - n,) + tuple(images.shape[1:]),
                              images.dtype)], axis=0)
    return run(images, bucket, n)


class AnomalyDetector:
    """Batched anomaly-map inference for one dataset's class vocabulary."""

    def __init__(self, frozen, trainable, model_cfg: ModelConfig,
                 dataset: str, img_size: int = 518, adapted_text: bool = True,
                 compute_dtype=jnp.bfloat16, use_pallas: bool = True,
                 text_weight: float = 0.6, iqm_weight: float = 0.4,
                 batch_buckets: Sequence[int] = DEFAULT_BATCH_BUCKETS,
                 quantize: Optional[str] = None):
        # use_pallas is safe on any backend: the attention wrapper falls back
        # to the XLA path off-TPU (ops/attention._packed_pallas_ok).
        if quantize is not None:
            # Serve-time int8 backbone tier (numerics bounds in
            # docs/DESIGN.md). "int8_attn" quantizes only the attention
            # projections so the MLP keeps the fused fp Pallas kernel;
            # "int8_mlp" quantizes only the MLP (fused int8 kernel) and
            # keeps the attention projections in compute dtype. Anchors
            # are computed BELOW with the full-precision text tower either
            # way (the quantized pytree shares it), so only the visual
            # block matmuls change. A "+smooth" suffix adds SmoothQuant
            # outlier migration, calibrated here on the production-adapted
            # tower (seeded random batch; pass real images via
            # ops.quant.calibrate_ln_amax + quantize_backbone_tier to
            # calibrate on data instead).
            from .ops.quant import quantize_backbone_auto

            frozen = quantize_backbone_auto(frozen, quantize,
                                            cfg=model_cfg,
                                            trainable=trainable,
                                            use_pallas=use_pallas)
        self.frozen = frozen
        self.trainable = trainable
        self.cfg = model_cfg
        self.dataset = dataset
        self.img_size = img_size
        self.domain = DOMAINS.get(dataset, "Industrial")
        if not batch_buckets or any(b <= 0 for b in batch_buckets):
            raise ValueError(
                f"batch_buckets must be non-empty positive ints, "
                f"got {batch_buckets!r}")
        self._buckets = tuple(sorted(set(int(b) for b in batch_buckets)))
        self._predict = make_predict_fn(
            model_cfg, img_size, self.domain, compute_dtype=compute_dtype,
            use_pallas=use_pallas, text_weight=text_weight,
            iqm_weight=iqm_weight)
        self.anchors: Dict[str, jnp.ndarray] = compute_frozen_anchors(
            frozen, trainable, model_cfg, dataset, adapted=adapted_text,
            compute_dtype=compute_dtype)

    # ------------------------------------------------------------------
    @classmethod
    def from_checkpoint(cls, save_path: Optional[str], dataset: str,
                        img_size: int = 518, backbone: Optional[str] = None,
                        allow_random_backbone: bool = False,
                        model_name: str = "ViT-L-14-336",
                        **kwargs) -> "AnomalyDetector":
        """Assemble from a training save_path (or None for zero-shot)."""
        cfg = build_model_config(model_name=model_name, img_size=img_size)
        frozen = load_frozen_backbone(cfg, backbone,
                                      allow_random=allow_random_backbone)
        trainable = init_trainable(cfg)
        adapted_text = False
        if save_path:
            trainable, adapted_text, _ = ckpt.restore_adapters(
                save_path, trainable, require_stage2=False)
        return cls(frozen, trainable, cfg, dataset, img_size=img_size,
                   adapted_text=adapted_text, **kwargs)

    # ------------------------------------------------------------------
    def class_names(self) -> List[str]:
        return list(self.anchors.keys())

    def predict(self, images: np.ndarray,
                class_name: str) -> Tuple[np.ndarray, np.ndarray]:
        """images: (B, 3, H, W), H=W=img_size — float32 CLIP-normalized, or
        uint8 raw pixels (normalized on device, bit-identically; 4x less
        host->device transfer, the predict_paths default).
        Returns (anomaly maps (B, H, W) float32, image scores (B,)).

        Ragged batch sizes are padded up to the smallest fitting bucket from
        `batch_buckets` before dispatch; batches larger than the biggest
        bucket are split into largest-bucket chunks. The jitted program
        therefore compiles at most once per *bucket* — never once per caller
        batch shape (ViT-L compiles cost minutes on a fresh cache). Padding
        is sliced off the outputs.
        """
        if class_name not in self.anchors:
            raise KeyError(
                f"unknown class {class_name!r}; available: {self.class_names()}")

        def run(padded, bucket, n):
            anchor = self.anchors[class_name]
            anchors_b = jnp.broadcast_to(anchor[None],
                                         (bucket,) + anchor.shape)
            maps, scores = self._predict(self.frozen, self.trainable,
                                         jnp.asarray(padded), anchors_b)
            return np.asarray(maps)[:n], np.asarray(scores)[:n]

        return _bucketed(images, self._buckets,
                         lambda i, j: self.predict(images[i:j], class_name),
                         run)

    def predict_multi(self, images: np.ndarray,
                      class_names: Sequence[str]
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """Mixed-class batch: images[i] scored against class_names[i]'s
        anchor. Same bucketing/compiled programs as predict() — the fused
        program already takes per-sample anchors, so heterogeneous requests
        ride one device batch instead of fragmenting into per-class calls
        (the MicroBatchingService flush path)."""
        n = images.shape[0]
        if len(class_names) != n:
            raise ValueError(
                f"{n} images but {len(class_names)} class names")
        unknown = [c for c in class_names if c not in self.anchors]
        if unknown:
            raise KeyError(
                f"unknown class {unknown[0]!r}; available: "
                f"{self.class_names()}")

        def run(padded, bucket, n):
            pad_names = list(class_names) + [class_names[-1]] * (bucket - n)
            anchors_b = jnp.stack([self.anchors[c] for c in pad_names],
                                  axis=0)
            maps, scores = self._predict(self.frozen, self.trainable,
                                         jnp.asarray(padded), anchors_b)
            return np.asarray(maps)[:n], np.asarray(scores)[:n]

        return _bucketed(images, self._buckets,
                         lambda i, j: self.predict_multi(images[i:j],
                                                         class_names[i:j]),
                         run)

    def predict_paths(self, paths: Sequence[str],
                      class_name: str) -> Tuple[np.ndarray, np.ndarray]:
        """Load, preprocess (bicubic resize) and predict. Ships uint8 to the
        device and normalizes there (bit-identical to host normalize_clip;
        see evaluation.predict._device_normalize) — 4x less transfer on
        remote-attached accelerators."""
        images = np.stack([
            _load_image_u8(p, self.img_size) for p in paths
        ])
        return self.predict(images, class_name)


def _flatten_tree(tree, prefix=""):
    """Dict/list pytree -> {'a/#0/c': array}. List/tuple positions get
    '#<i>' path segments so the exact structure round-trips ('/' and '#'
    never start real keys in these pytrees)."""
    out = {}
    items = (tree.items() if isinstance(tree, dict)
             else ((f"#{i}", v) for i, v in enumerate(tree)))
    for k, v in items:
        key = f"{prefix}{k}"
        if isinstance(v, (dict, list, tuple)):
            out.update(_flatten_tree(v, key + "/"))
        else:
            out[key] = v
    return out


def _unflatten_tree(flat):
    out: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v

    def listify(node):
        if not isinstance(node, dict):
            return node
        node = {k: listify(v) for k, v in node.items()}
        if node and all(k.startswith("#") for k in node):
            return [node[f"#{i}"] for i in range(len(node))]
        return node

    return listify(out)


def export_predictor(detector: AnomalyDetector, out_dir: str,
                     batch_sizes: Sequence[int] = (1, 8, 16),
                     weights: str = "external") -> None:
    """Serialize the fused predict program to deployable artifacts.

    Writes, per batch bucket, a `jax.export` StableHLO artifact, plus the
    per-class anchors (`anchors.npz`) and a `manifest.json`. A deployment
    loads them with :class:`ExportedPredictor` — no model code, config
    registry, or checkpoint layout needed at serve time, and no tracing or
    Python-side model execution (the artifact is the compiled program's
    portable StableHLO; the target runtime re-specializes it on load).

    weights="external" (default): the program takes the weight pytrees as
    call arguments and they ship as raw arrays in `weights.npz` — the
    program artifact stays small and loads instantly. weights="baked"
    embeds them as StableHLO constants (fully self-contained artifact, but
    at ViT-L scale that is a ~1.3 GB MLIR module whose deserialization
    takes tens of minutes on one core — measured; prefer external).

    Artifacts are platform-checked by jax.export: export on the platform you
    will serve on (TPU artifacts from a TPU process). No reference analogue
    (the reference has no serving surface; new capability per SURVEY §7).
    """
    import json
    import os

    from jax import export as jexport

    if weights not in ("external", "baked"):
        raise ValueError(f"weights must be 'external' or 'baked', got {weights!r}")
    if not batch_sizes or any(int(b) <= 0 for b in batch_sizes):
        raise ValueError(
            f"batch_sizes must be non-empty positive ints, got {batch_sizes!r}")
    os.makedirs(out_dir, exist_ok=True)
    img, e = detector.img_size, detector.cfg.clip.embed_dim
    bf16_keys: list = []

    if weights == "external":
        fn = detector._predict  # already jitted with (frozen, trainable, ...)
        frozen_sds = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), detector.frozen)
        trainable_sds = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            detector.trainable)

        def specs(b):
            return (frozen_sds, trainable_sds,
                    jax.ShapeDtypeStruct((b, 3, img, img), jnp.float32),
                    jax.ShapeDtypeStruct((b, e, 2), jnp.float32))

        flat = {**_flatten_tree({"frozen": detector.frozen}),
                **_flatten_tree({"trainable": detector.trainable})}
        # npz cannot represent bfloat16: store such leaves as float32 and
        # record them so the loader restores the exact exported dtypes (the
        # serialized program's signature is dtype-strict).
        bf16_keys = [k for k, v in flat.items()
                     if jnp.asarray(v).dtype == jnp.bfloat16]
        np.savez(os.path.join(out_dir, "weights.npz"),
                 **{k: (np.asarray(v, np.float32) if k in set(bf16_keys)
                        else np.asarray(v)) for k, v in flat.items()})
    else:
        def baked(images, anchors):
            return detector._predict(detector.frozen, detector.trainable,
                                     images, anchors)

        fn = jax.jit(baked)

        def specs(b):
            return (jax.ShapeDtypeStruct((b, 3, img, img), jnp.float32),
                    jax.ShapeDtypeStruct((b, e, 2), jnp.float32))

    for b in batch_sizes:
        exp = jexport.export(fn)(*specs(b))
        with open(os.path.join(out_dir, f"predict_b{b}.bin"), "wb") as f:
            f.write(exp.serialize())
    np.savez(os.path.join(out_dir, "anchors.npz"),
             **{k: np.asarray(v) for k, v in detector.anchors.items()})
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump({
            "img_size": img,
            "embed_dim": e,
            "dataset": detector.dataset,
            "domain": detector.domain,
            "batch_sizes": sorted(batch_sizes),
            "classes": detector.class_names(),
            "platforms": list(exp.platforms),
            "weights": weights,
            "bf16_keys": bf16_keys,
        }, f, indent=1)


class ExportedPredictor:
    """Serve anomaly maps from `export_predictor` artifacts.

    Mirrors :meth:`AnomalyDetector.predict` (numpy in/out, bucketed batches)
    but needs only the artifact directory — weights and scoring pipeline are
    inside the serialized programs.

        pred = ExportedPredictor("exported/")
        maps, scores = pred.predict(images, "bottle")
    """

    def __init__(self, path: str):
        import json
        import os

        with open(os.path.join(path, "manifest.json")) as f:
            self.manifest = json.load(f)
        self.img_size = self.manifest["img_size"]
        self.domain = self.manifest["domain"]
        self.anchors = {k: jnp.asarray(v) for k, v in
                        np.load(os.path.join(path, "anchors.npz")).items()}
        self._path = path
        self._programs: Dict[int, object] = {}
        self._weights = None
        if self.manifest.get("weights", "baked") == "external":
            bf16 = set(self.manifest.get("bf16_keys", []))
            flat = {k: jnp.asarray(v, jnp.bfloat16 if k in bf16 else None)
                    for k, v in
                    np.load(os.path.join(path, "weights.npz")).items()}
            tree = _unflatten_tree(flat)
            self._weights = (tree["frozen"], tree["trainable"])

    def class_names(self) -> List[str]:
        return list(self.manifest["classes"])

    def _program(self, bucket: int):
        if bucket not in self._programs:
            import os

            from jax import export as jexport

            with open(os.path.join(self._path,
                                   f"predict_b{bucket}.bin"), "rb") as f:
                self._programs[bucket] = jexport.deserialize(f.read())
        return self._programs[bucket]

    def predict(self, images: np.ndarray,
                class_name: str) -> Tuple[np.ndarray, np.ndarray]:
        """images: (B, 3, H, W) float32 CLIP-normalized -> (maps, scores)."""
        if class_name not in self.anchors:
            raise KeyError(
                f"unknown class {class_name!r}; available: {self.class_names()}")
        img = self.img_size
        if images.ndim != 4 or images.shape[1:] != (3, img, img):
            raise ValueError(
                f"expected (B, 3, {img}, {img}) images (the exported "
                f"programs are shape-specialized), got {images.shape}")

        def run(padded, bucket, n):
            anchor = self.anchors[class_name]
            anchors_b = jnp.broadcast_to(anchor[None],
                                         (bucket,) + anchor.shape)
            return self._call(padded, anchors_b, n)

        return _bucketed(images, self.manifest["batch_sizes"],
                         lambda i, j: self.predict(images[i:j], class_name),
                         run)

    def predict_multi(self, images: np.ndarray,
                      class_names: Sequence[str]
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """Mixed-class batch over the exported programs (per-sample anchors;
        same contract as AnomalyDetector.predict_multi)."""
        n = images.shape[0]
        if len(class_names) != n:
            raise ValueError(
                f"{n} images but {len(class_names)} class names")
        unknown = [c for c in class_names if c not in self.anchors]
        if unknown:
            raise KeyError(
                f"unknown class {unknown[0]!r}; available: "
                f"{self.class_names()}")
        img = self.img_size
        if images.ndim != 4 or images.shape[1:] != (3, img, img):
            raise ValueError(
                f"expected (B, 3, {img}, {img}) images (the exported "
                f"programs are shape-specialized), got {images.shape}")

        def run(padded, bucket, n):
            pad_names = list(class_names) + [class_names[-1]] * (bucket - n)
            anchors_b = jnp.stack([self.anchors[c] for c in pad_names],
                                  axis=0)
            return self._call(padded, anchors_b, n)

        return _bucketed(images, self.manifest["batch_sizes"],
                         lambda i, j: self.predict_multi(images[i:j],
                                                         class_names[i:j]),
                         run)

    def _call(self, images, anchors_b, n):
        program = self._program(anchors_b.shape[0])
        if self._weights is not None:
            frozen, trainable = self._weights
            maps, scores = program.call(frozen, trainable,
                                        jnp.asarray(images), anchors_b)
        else:
            maps, scores = program.call(jnp.asarray(images), anchors_b)
        return np.asarray(maps)[:n], np.asarray(scores)[:n]


class MicroBatchingService:
    """Request-coalescing front-end for AnomalyDetector.

    Concurrent callers submit single images; a background worker drains the
    queue and runs the coalesced window as ONE bucketed device batch — the
    fused program takes per-sample anchors, so a mixed-class window needs no
    per-class fragmentation (detectors exposing only single-class predict()
    fall back to per-class dispatch). A serving deployment thus feeds the
    TPU large shape-stable batches instead of many batch-1 dispatches. No
    reference analogue (the reference has no serving surface); new
    capability per SURVEY §7.

        svc = MicroBatchingService(det, max_batch=32, max_latency_ms=5)
        fut = svc.submit(image, "bottle")      # non-blocking
        amap, score = fut.result()
        svc.close()

    `detector` is anything with the bucketed-predict contract
    (`predict(images, class_name) -> (maps, scores)`): a live
    :class:`AnomalyDetector` or an artifact-backed :class:`ExportedPredictor`.
    """

    _STOP = object()

    def __init__(self, detector, max_batch: int = 32,
                 max_latency_ms: float = 5.0):
        import queue
        import threading

        self.detector = detector
        self.max_batch = max_batch
        self.max_latency = max_latency_ms / 1000.0
        self._queue: "queue.Queue" = queue.Queue()
        self._closed = False
        # Serializes the closed-check-then-put in submit() against close()'s
        # closed-set-then-STOP: without it a submit could pass the check,
        # lose the CPU, and enqueue behind the sentinel after the worker's
        # shutdown drain already ran — an unresolvable Future.
        self._lock = threading.Lock()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, image: np.ndarray, class_name: str):
        """image: (3, H, W) CLIP-normalized. Returns a Future resolving to
        (anomaly map (H, W), image score).

        Raises RuntimeError once close() has been called — a submit racing
        with close() either wins (its future resolves normally) or its
        request is failed with RuntimeError by the worker's shutdown drain;
        no future is ever silently dropped.
        """
        from concurrent.futures import Future

        if image.ndim != 3:
            raise ValueError(f"expected one (3, H, W) image, got {image.shape}")
        # Full shape validation happens HERE, synchronously, so a malformed
        # request fails only its own caller. Deferring it to the batch-time
        # np.stack would fail every future coalesced into the same window
        # (requests from unrelated callers/classes share one device batch).
        size = getattr(self.detector, "img_size", None)
        if size is not None and image.shape != (3, size, size):
            raise ValueError(
                f"expected one (3, {size}, {size}) image for this detector, "
                f"got {image.shape}")
        fut: Future = Future()
        with self._lock:
            if self._closed:
                raise RuntimeError("MicroBatchingService is closed")
            self._queue.put((image, class_name, fut))
        return fut

    def predict(self, image: np.ndarray, class_name: str):
        """Blocking single-image convenience wrapper around submit()."""
        return self.submit(image, class_name).result()

    def close(self):
        """Idempotent shutdown: in-flight requests still resolve; anything
        enqueued behind the STOP sentinel is drained with RuntimeError."""
        with self._lock:
            if not self._closed:
                self._closed = True
                self._queue.put(self._STOP)
        self._worker.join()

    # ------------------------------------------------------------------
    def _run(self):
        import queue
        import time

        while True:
            item = self._queue.get()
            if item is self._STOP:
                self._drain()
                return
            batch = [item]
            deadline = time.monotonic() + self.max_latency
            # Coalesce whatever arrives within the latency window.
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is self._STOP:
                    self._flush(batch)
                    self._drain()
                    return
                batch.append(nxt)
            self._flush(batch)

    @staticmethod
    def _settle(fut, result=None, exc=None):
        """Resolve a request Future, tolerating caller-side cancel().

        submit() hands out raw Futures that stay PENDING until flushed, so a
        caller's cancel() (a client giving up mid-compile) succeeds;
        set_result on a cancelled Future raises InvalidStateError, which
        would escape _run and kill the worker thread for good. Claiming the
        future first skips cancelled ones atomically."""
        if not fut.set_running_or_notify_cancel():
            return  # cancelled by the caller; nothing to deliver
        if exc is not None:
            fut.set_exception(exc)
        else:
            fut.set_result(result)

    def _drain(self):
        """Fail any requests that raced past close() behind the sentinel."""
        import queue

        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                return
            if item is not self._STOP:
                self._settle(item[2], exc=RuntimeError(
                    "MicroBatchingService closed before "
                    "this request was served"))

    def _flush(self, batch):
        multi = getattr(self.detector, "predict_multi", None)
        if multi is None:
            return self._flush_by_class(batch)
        # Mixed-class fast path: the fused program takes per-sample anchors,
        # so the whole coalesced window rides ONE device batch regardless of
        # class mix (per-class dispatch fragments batches under mixed load).
        # Unknown classes are failed individually so one bad request cannot
        # poison the batch.
        try:
            known = set(self.detector.class_names())
        except Exception:
            known = None
        valid = []
        for item in batch:
            if known is not None and item[1] not in known:
                self._settle(item[2], exc=KeyError(
                    f"unknown class {item[1]!r}; available: {sorted(known)}"))
            else:
                valid.append(item)
        if not valid:
            return
        futs = [f for _, _, f in valid]
        try:
            images = np.stack([img for img, _, _ in valid]).astype(np.float32)
            maps, scores = multi(images, [c for _, c, _ in valid])
        except Exception as exc:  # propagate to every waiter
            for f in futs:
                self._settle(f, exc=exc)
            return
        for i, f in enumerate(futs):
            self._settle(f, result=(maps[i], scores[i]))

    def _flush_by_class(self, batch):
        """Fallback for detectors exposing only single-class predict()."""
        by_class: Dict[str, list] = {}
        for image, class_name, fut in batch:
            by_class.setdefault(class_name, []).append((image, fut))
        for class_name, items in by_class.items():
            futs = [f for _, f in items]
            try:
                images = np.stack([img for img, _ in items]).astype(np.float32)
                maps, scores = self.detector.predict(images, class_name)
            except Exception as exc:  # propagate to every waiter
                for f in futs:
                    self._settle(f, exc=exc)
                continue
            for i, f in enumerate(futs):
                self._settle(f, result=(maps[i], scores[i]))
