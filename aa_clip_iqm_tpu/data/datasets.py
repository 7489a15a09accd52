"""JSONL datasets: loading, CLIP preprocessing, joint geometric augmentation.

Rebuilds the reference data pipeline (dataset/__init__.py:13-270) without
torchvision: PIL for decode + bicubic/nearest resize, numpy/cv2 for the
augmentations, emitting numpy batches ready for device transfer.

Semantics preserved:
  - metadata JSONL rows {image_path, label, class_name, mask_path}.
  - train transform: per-channel ColorJitter (brightness/contrast/saturation
    0.5, each applied with p=0.7; image stage only, not text stage) at the
    ORIGINAL resolution, then CLIP bicubic resize + normalize (the
    reference's transform_x order); mask nearest-resized and binarized; then
    *joint* geometric augmentation on the stacked 4-channel image+mask:
    rotation ±30° p=0.5, translate ±0.15 p=0.5, H/V flip p=0.5 each
    (dataset/__init__.py:37-102).
  - test (BaseSingleClassDataset): no augmentation, class-filtered.
  - few-shot metadata files {shot}-shot.jsonl; full-shot.jsonl otherwise.
The reference's dead `prompt_image` key (survey Q7, a collate hazard with no
consumer) is intentionally dropped.
"""
from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np
from PIL import Image

from . import native as native_pipeline
from .registry import CLASS_NAMES, DATA_PATH, IMAGE_MEAN, IMAGE_STD, metadata_path

_MEAN = np.asarray(IMAGE_MEAN, np.float32).reshape(3, 1, 1)
_STD = np.asarray(IMAGE_STD, np.float32).reshape(3, 1, 1)


def _use_native() -> bool:
    """The C++ pipeline (native/image_pipeline.cpp) is the default transform
    backend; AACLIP_NATIVE=0 forces the PIL/cv2 fallback."""
    return (os.environ.get("AACLIP_NATIVE", "1") != "0"
            and native_pipeline.available())


def _data_workers() -> int:
    """Per-sample decode parallelism (the reference's DataLoader num_workers=4,
    train.py:380, as threads instead of processes: PIL decode and the ctypes
    C++ transforms release the GIL, so threads scale on multi-core hosts with
    zero IPC/serialization cost). Default 1 = the current serial path."""
    try:
        n = int(os.environ.get("AACLIP_DATA_WORKERS", "1"))
    except ValueError:
        return 1
    return max(1, n)


_EXECUTOR = None
_EXECUTOR_WORKERS = 0


def _executor(workers: int):
    """Process-wide decode pool, resized lazily if the knob changes."""
    global _EXECUTOR, _EXECUTOR_WORKERS
    if _EXECUTOR is None or _EXECUTOR_WORKERS != workers:
        if _EXECUTOR is not None:
            _EXECUTOR.shutdown(wait=False)
        from concurrent.futures import ThreadPoolExecutor
        _EXECUTOR = ThreadPoolExecutor(max_workers=workers,
                                       thread_name_prefix="aaclip-data")
        _EXECUTOR_WORKERS = workers
    return _EXECUTOR


def load_metadata(meta_path: str, class_name: Optional[str] = None) -> List[dict]:
    rows = []
    with open(meta_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            if class_name is None or row["class_name"] == class_name:
                rows.append(row)
    return rows


def _load_image(path: str, img_size: int) -> np.ndarray:
    """RGB bicubic resize -> CHW float32 in [0,1] (native fast path when
    compiled; PIL parity verified in tests/test_native_pipeline.py)."""
    img = np.asarray(Image.open(path).convert("RGB"), np.uint8)
    return _resize_bicubic_u8(img, img_size)


def _load_mask(path: str, img_size: int) -> np.ndarray:
    """Grayscale nearest resize -> (1, H, W) binary float32."""
    m = Image.open(path).convert("L")
    if _use_native():
        return native_pipeline.resize_nearest_mask(np.asarray(m), img_size)[None]
    arr = (np.asarray(m.resize((img_size, img_size), Image.NEAREST)) != 0
           ).astype(np.float32)
    return arr[None]


def normalize_clip(img01: np.ndarray) -> np.ndarray:
    return (img01 - _MEAN) / _STD


def _load_image_u8(path: str, img_size: int) -> np.ndarray:
    """RGB bicubic resize -> CHW uint8 (the quantized pixels the float path
    divides by 255 — PIL's resize output IS uint8, so this is lossless).
    Transfer format for device-side normalization: 4x less host->device
    bandwidth than normalized float32, which dominates end-to-end eval on
    bandwidth-limited links (~150 MB/s here: 154 MB/sweep -> 38 MB)."""
    img01 = _load_image(path, img_size)  # CHW float32, values k/255 exactly
    return np.rint(img01 * 255.0).astype(np.uint8)


def _pil_gray(img_u8: np.ndarray) -> np.ndarray:
    """PIL Image.convert('L') exact: rounded 16.16 fixed-point ITU-R 601-2
    luma — (19595 R + 38470 G + 7471 B + 0x8000) >> 16 (Pillow convert.c
    L24/L). img_u8: (H, W, 3) uint8 -> (H, W) uint8."""
    r = img_u8[..., 0].astype(np.uint32)
    g = img_u8[..., 1].astype(np.uint32)
    b = img_u8[..., 2].astype(np.uint32)
    return ((19595 * r + 38470 * g + 7471 * b + 0x8000) >> 16).astype(np.uint8)


def _pil_blend(degenerate: np.ndarray, img_u8: np.ndarray, f) -> np.ndarray:
    """PIL Image.blend exact (Pillow Blend.c): in1 + alpha*(in2-in1) in
    float32, clamped to [0, 255], C-cast truncation back to uint8."""
    d = degenerate.astype(np.float32)
    out = d + np.float32(f) * (img_u8.astype(np.float32) - d)
    return np.clip(out, 0.0, 255.0).astype(np.uint8)


def _color_jitter(rng: np.random.Generator, img_u8: np.ndarray,
                  factors=None) -> np.ndarray:
    """Brightness/contrast/saturation jitter (strength 0.5, each applied
    with p=0.7) on (H, W, 3) uint8, byte-identical to the PIL ImageEnhance
    chain the reference's torchvision ColorJitter executes:
    Brightness = blend from black; Contrast = blend from the rounded
    ImageStat mean of the L image; Color = blend from the L image.

    Runs at the ORIGINAL image resolution, before the bicubic resize — the
    reference's transform_x composes [ColorJitter ×3, Resize, ToTensor,
    Normalize] (dataset/__init__.py:48-67), so the contrast/saturation
    grayscale statistics come from the full-resolution image and the
    jittered uint8 result is what gets resampled. ``factors`` overrides the
    three draw factors for the parity test."""
    img = img_u8
    fb, fc, fs = factors if factors is not None else (None, None, None)
    if factors is not None or rng.random() < 0.7:
        f = fb if fb is not None else rng.uniform(0.5, 1.5)
        img = _pil_blend(np.zeros_like(img), img, f)
    if factors is not None or rng.random() < 0.7:
        f = fc if fc is not None else rng.uniform(0.5, 1.5)
        # ImageEnhance.Contrast: int(ImageStat.Stat(L).mean + 0.5).
        mean = int(float(_pil_gray(img).mean()) + 0.5)
        img = _pil_blend(np.full_like(img, mean), img, f)
    if factors is not None or rng.random() < 0.7:
        f = fs if fs is not None else rng.uniform(0.5, 1.5)
        img = _pil_blend(_pil_gray(img)[..., None], img, f)
    return img


def _resize_bicubic_u8(u8_hwc: np.ndarray, img_size: int) -> np.ndarray:
    """(H, W, 3) uint8 -> [0,1] CHW float32 through the same bicubic kernels
    as _load_image (native fast path or PIL)."""
    if u8_hwc.shape[:2] == (img_size, img_size):
        return u8_hwc.astype(np.float32).transpose(2, 0, 1) / 255.0
    if _use_native():
        return native_pipeline.resize_bicubic_rgb(u8_hwc, img_size)
    arr = np.asarray(Image.fromarray(u8_hwc).resize((img_size, img_size),
                                                    Image.BICUBIC),
                     np.float32) / 255.0
    return arr.transpose(2, 0, 1)


def _joint_geometric(rng: np.random.Generator, stacked: np.ndarray) -> np.ndarray:
    """Rotation/translate/flip applied identically to all channels.

    stacked: (C, H, W) with image channels + mask channel. Nearest-neighbor
    warp — torchvision RandomRotation/RandomAffine default to NEAREST, so the
    reference's mask channel stays exactly binary through the augmentation;
    matching that keeps our loss targets binary too.
    """
    c, h, w = stacked.shape
    use_native = _use_native()

    def warp(chw, M):
        if use_native:
            return native_pipeline.warp_affine_chw(chw, np.asarray(M),
                                                   bilinear=False)
        import cv2

        return cv2.warpAffine(
            chw.transpose(1, 2, 0), np.asarray(M, np.float32), (w, h),
            flags=cv2.INTER_NEAREST).transpose(2, 0, 1)

    def rotation_matrix(angle_deg):
        # cv2.getRotationMatrix2D about the pixel-center of the image.
        a = np.deg2rad(angle_deg)
        cx, cy = w / 2 - 0.5, h / 2 - 0.5
        cos, sin = np.cos(a), np.sin(a)
        return np.array([[cos, sin, (1 - cos) * cx - sin * cy],
                         [-sin, cos, sin * cx + (1 - cos) * cy]], np.float64)

    img = stacked
    if rng.random() < 0.5:  # rotation ±30°
        img = warp(img, rotation_matrix(rng.uniform(-30.0, 30.0)))
    if rng.random() < 0.5:  # translate ±0.15
        tx = rng.uniform(-0.15, 0.15) * w
        ty = rng.uniform(-0.15, 0.15) * h
        img = warp(img, np.array([[1, 0, tx], [0, 1, ty]], np.float64))
    if rng.random() < 0.5:
        img = img[:, :, ::-1]
    if rng.random() < 0.5:
        img = img[:, ::-1, :]
    return np.ascontiguousarray(img)


class TrainDataset:
    """Reference BaseDataset (dataset/__init__.py:13-121).

    text=True (stage 1) skips the color jitter; geometric augmentation is
    joint on image+mask in both stages.
    """

    def __init__(self, data_path: str, meta_path: str, img_size: int,
                 text: bool = False, seed: int = 111):
        self.data_path = data_path
        self.img_size = img_size
        self.text = text
        self.meta = load_metadata(meta_path)
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self._draws = 0  # per-sample RNG counter for the multi-worker path

    def __len__(self):
        return len(self.meta)

    def __getitem__(self, idx: int) -> dict:
        return self._get(idx, self.rng)

    def _get(self, idx: int, rng: np.random.Generator) -> dict:
        meta = self.meta[idx]
        path = os.path.join(self.data_path, meta["image_path"])
        if self.text:
            img01 = _load_image(path, self.img_size)
        else:
            # Jitter BEFORE the resize, at original resolution (reference
            # transform_x order — see _color_jitter).
            raw = np.asarray(Image.open(path).convert("RGB"), np.uint8)
            img01 = _resize_bicubic_u8(_color_jitter(rng, raw),
                                       self.img_size)
        img = normalize_clip(img01)
        if meta["label"]:
            mask = _load_mask(os.path.join(self.data_path, meta["mask_path"]),
                              self.img_size)
        else:
            mask = np.zeros((1, self.img_size, self.img_size), np.float32)
        stacked = _joint_geometric(rng, np.concatenate([img, mask], axis=0))
        return {
            "image": stacked[:3],
            "mask": stacked[3:4],
            "label": np.int64(meta["label"]),
            "file_name": meta["image_path"],
            "class_name": meta["class_name"],
        }

    def epoch_batches(self, epoch: int, batch_size: int,
                      start_batch: int = 0, drop_last: bool = False):
        """Deterministic per-epoch batch stream for resumable training.

        The shuffle order derives from (seed, epoch) and every sample's
        augmentation RNG from (seed, epoch, position-in-epoch), so the
        stream is a pure function of (dataset seed, epoch): a run resumed
        mid-epoch skips ``start_batch`` batches and continues with
        bit-identical data, and the output is identical whether samples
        decode serially or on the AACLIP_DATA_WORKERS thread pool. The
        reference can only resume at epoch granularity
        (train.py:356-375); this is the in-epoch tier the training driver
        builds step checkpoints on.

        ``start_batch`` skips whole batches without decoding them (the
        shuffle order is cheap; the expensive decode/augment work only
        happens for batches actually yielded)."""
        order = np.arange(len(self.meta))
        rng = np.random.default_rng((self.seed, epoch))
        rng.shuffle(order)
        workers = _data_workers()
        for b, start in enumerate(range(0, len(order), batch_size)):
            idxs = order[start:start + batch_size]
            if drop_last and len(idxs) < batch_size:
                break
            if b < start_batch:
                continue
            jobs = [(int(i),
                     np.random.default_rng((self.seed, epoch, start + j)))
                    for j, i in enumerate(idxs)]
            if workers > 1:
                items = list(_executor(workers).map(
                    lambda job: self._get(*job), jobs))
            else:
                items = [self._get(*job) for job in jobs]
            yield collate(items)

    def batches(self, batch_size: int, shuffle: bool = True, drop_last: bool = False):
        """With AACLIP_DATA_WORKERS>1, samples decode/augment on the thread
        pool with per-sample counter-derived RNG streams — deterministic for
        a given (seed, epoch order) regardless of thread interleaving, but a
        *different* stream than the serial path (exactly the trade torch
        DataLoader workers make, train.py:380). workers=1 keeps the legacy
        sequential stream bit-for-bit."""
        order = np.arange(len(self.meta))
        if shuffle:
            self.rng.shuffle(order)
        workers = _data_workers()
        for start in range(0, len(order), batch_size):
            idxs = order[start:start + batch_size]
            if drop_last and len(idxs) < batch_size:
                break
            if workers > 1:
                draws = range(self._draws, self._draws + len(idxs))
                self._draws += len(idxs)
                jobs = [(int(i), np.random.default_rng((self.seed, d)))
                        for i, d in zip(idxs, draws)]
                items = list(_executor(workers).map(
                    lambda job: self._get(*job), jobs))
            else:
                items = [self[int(i)] for i in idxs]
            yield collate(items)


class SingleClassTestDataset:
    """Reference BaseSingleClassDataset (dataset/__init__.py:124-208)."""

    def __init__(self, data_path: str, meta_path: str, img_size: int,
                 class_name: str, logger=None, device_normalize: bool = False):
        # device_normalize: emit CHW uint8 images (the lossless quantized
        # resize output) for device-side CLIP normalization instead of
        # host-normalized float32 — 4x less host->device transfer; the
        # predict program (evaluation.predict.make_predict_fn) normalizes
        # uint8 inputs on device with bit-identical fp32 math.
        self.data_path = data_path
        self.img_size = img_size
        self.class_name = class_name
        self.device_normalize = device_normalize
        self.meta = load_metadata(meta_path, class_name=class_name)
        if logger:
            logger.info(f"Class name: {class_name}")
            logger.info(f"Sample number: {len(self.meta)}")
            logger.info("=====================================")

    def __len__(self):
        return len(self.meta)

    def __getitem__(self, idx: int) -> dict:
        meta = self.meta[idx]
        path = os.path.join(self.data_path, meta["image_path"])
        if self.device_normalize:
            img = _load_image_u8(path, self.img_size)
        else:
            img = normalize_clip(_load_image(path, self.img_size))
        if meta["label"]:
            mask = _load_mask(os.path.join(self.data_path, meta["mask_path"]),
                              self.img_size)
        else:
            mask = np.zeros((1, self.img_size, self.img_size), np.float32)
        return {
            "image": img,
            "mask": mask,
            "label": np.int64(meta["label"]),
            "file_name": meta["image_path"],
            "class_name": meta["class_name"],
        }

    def batches(self, batch_size: int, pad_to_batch: bool = False):
        """Sequential batches; optionally zero-pad the tail batch to a fixed
        size (static shapes for jit) with a validity mask.

        Eval decode is RNG-free, so AACLIP_DATA_WORKERS>1 parallelizes the
        per-sample map order-preservingly with output identical to serial —
        this is the host-bound half of end-to-end eval (docs/DESIGN.md)."""
        workers = _data_workers()
        for start in range(0, len(self.meta), batch_size):
            idxs = range(start, min(start + batch_size, len(self.meta)))
            if workers > 1:
                items = list(_executor(workers).map(self.__getitem__, idxs))
            else:
                items = [self[i] for i in idxs]
            batch = collate(items)
            n = len(items)
            if pad_to_batch and n < batch_size:
                pad = batch_size - n
                for key in ("image", "mask"):
                    batch[key] = np.concatenate(
                        [batch[key], np.zeros((pad,) + batch[key].shape[1:],
                                              batch[key].dtype)], axis=0)
                batch["label"] = np.concatenate(
                    [batch["label"], np.zeros(pad, np.int64)])
            batch["n_valid"] = n
            yield batch


def prefetch(iterator, depth: int = 2):
    """Background-thread prefetcher: overlaps host-side decode/augment with
    device compute (the reference relies on torch DataLoader workers,
    train.py:380; here one thread suffices since jax dispatch is async).

    Shuts the worker down cleanly if the consumer abandons the generator
    (exception mid-epoch): the worker's blocking put is bounded by a stop
    flag, so no thread or decoded-batch memory leaks.
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()
    sentinel = object()
    err = []

    def worker():
        try:
            for item in iterator:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            # the sentinel must actually land (a full queue would otherwise
            # drop it and hang the consumer); the stop flag bounds the wait
            while not stop.is_set():
                try:
                    q.put(sentinel, timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass


def collate(items: List[dict]) -> dict:
    """Stack sample dicts into a batch. Images keep uint8 (the
    device_normalize transfer format — a float32 cast here would both
    quadruple the host->device bytes AND make the predict program skip its
    on-device CLIP normalization, silently running the backbone on raw
    0..255 pixels); float images are host-normalized already and stay
    float32."""
    img = np.stack([it["image"] for it in items])
    if img.dtype != np.uint8:
        img = img.astype(np.float32)
    out = {
        "image": img,
        "mask": np.stack([it["mask"] for it in items]).astype(np.float32),
        "label": np.asarray([it["label"] for it in items], np.int64),
        "file_name": [it["file_name"] for it in items],
        "class_name": [it["class_name"] for it in items],
    }
    return out


def get_dataset(dataset_name: str, img_size: int, training_mode: Optional[str],
                shot: int = -1, stage: str = "train", logger=None,
                metadata_root: Optional[str] = None, seed: int = 111,
                device_normalize: bool = False):
    """Dispatcher with reference semantics (dataset/__init__.py:211-270).

    device_normalize (test/visualize stages): uint8 images for device-side
    CLIP normalization — see SingleClassTestDataset."""
    if dataset_name not in DATA_PATH:
        raise KeyError(
            f"Dataset {dataset_name!r} not found; available: "
            f"{sorted(DATA_PATH)}")
    if stage == "train":
        if training_mode == "few_shot" and shot <= 0:
            raise ValueError("shot should be positive in few_shot mode")
        eff_shot = shot if training_mode == "few_shot" else -1
        meta = metadata_path(dataset_name, eff_shot, metadata_root)
        data_path = DATA_PATH[dataset_name.split("-")[0]]
        text_ds = TrainDataset(data_path, meta, img_size, text=True, seed=seed)
        image_ds = TrainDataset(data_path, meta, img_size, text=False,
                                seed=seed + 1)
        return text_ds, image_ds
    if stage in ("test", "visualize"):
        meta = metadata_path(dataset_name, -1, metadata_root)
        datasets = {}
        for c in CLASS_NAMES[dataset_name]:
            ds = SingleClassTestDataset(
                DATA_PATH[dataset_name], meta, img_size, c,
                logger=logger if stage == "test" else None,
                device_normalize=device_normalize)
            if len(ds) == 0:
                # Partial datasets (e.g. a subset download) just skip the
                # absent classes instead of failing the whole sweep.
                if logger:
                    logger.warning("class %s has no samples; skipping", c)
                continue
            datasets[c] = ds
        return datasets
    raise ValueError(f"stage {stage} not found; available: train, test, visualize")
