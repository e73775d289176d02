"""Datasets: KITTI train/eval pairs, Sintel sequences, consecutive video frames.

Framework-native (no torch Dataset/DataLoader): each dataset is a plain
indexable object returning numpy NHWC samples; batching/prefetch lives in
``opticalflow_tpu.data.loader``.

Sources mirrored:

  * :class:`KittiFlowTrain` — "<img1> <img2> <flow_png>" list file or
    auto-scan of ``image_2``/``flow_occ`` **temporal** neighbors, reduced
    augmentation, upsize-if-small, random 320×896 crop, 30% h-flip
    (``data_processing_or.py:160-294``).  Note the reference's alternate
    pipeline pairs ``image_2`` with ``image_3`` — a stereo pair, not a
    temporal one (``data_processing.py:93-94``); that layout is supported
    explicitly via ``pairing="stereo"`` but the temporal default fixes it.
  * :class:`KittiPairsEval` — KITTI 2012/2015 eval pairs *_10/*_11 with
    16-bit GT flow (``inference_kitti.py:134-202``).
  * :class:`SintelPairs` — MPI-Sintel clean/final with ``.flo`` GT (the
    EPE-1.83/2.31 benchmark config, README:36).
  * :class:`ConsecutiveFrames` — frame_t/frame_{t+1} pairs from a directory
    or video file for self-supervised training (``train_pseudo.py:23-62``).
"""

from __future__ import annotations

import os
from glob import glob
from typing import List, Optional, Sequence, Tuple

import numpy as np

from opticalflow_tpu.io.flo import read_flo
from opticalflow_tpu.io.images import load_image
from opticalflow_tpu.io.kitti import read_flow_png
from opticalflow_tpu.data import augment as aug

__all__ = ["KittiFlowTrain", "KittiPairsEval", "SintelPairs",
           "ConsecutiveFrames"]


def _resize_flow(flow, h, w):
    import cv2
    fh, fw = flow.shape[:2]
    if (fh, fw) == (h, w):
        return flow
    u = cv2.resize(flow[..., 0], (w, h)) * (w / float(fw))
    v = cv2.resize(flow[..., 1], (w, h)) * (h / float(fh))
    return np.stack([u, v], axis=-1).astype(np.float32)


class KittiFlowTrain:
    """KITTI fine-tuning samples: dict(images (H,W,6) [0,1], flow (H,W,2),
    valid (H,W)) at a fixed crop size."""

    def __init__(self, root: str, list_file: Optional[str] = None,
                 crop_hw: Tuple[int, int] = (320, 896),
                 augment: bool = True, flip_prob: float = 0.3,
                 pairing: str = "temporal", seed: int = 0):
        self.crop_h, self.crop_w = crop_hw
        self.augment = augment
        self.flip_prob = flip_prob
        self.seed = seed
        self.samples: List[Tuple[str, str, str]] = []
        if list_file:
            with open(list_file) as f:
                for line in f:
                    parts = line.split()
                    if len(parts) == 3:
                        self.samples.append(tuple(parts))
        else:
            img_dir = os.path.join(root, "image_2")
            flow_dir = os.path.join(root, "flow_occ")
            imgs = sorted(glob(os.path.join(img_dir, "*.png")))
            if pairing == "temporal":
                for a, b in zip(imgs[:-1], imgs[1:]):
                    stem = os.path.splitext(os.path.basename(a))[0]
                    fp = os.path.join(flow_dir, f"{stem}.png")
                    if os.path.isfile(fp):
                        self.samples.append((a, b, fp))
            elif pairing == "stereo":
                for a in imgs:
                    b = a.replace("image_2", "image_3")
                    stem = os.path.splitext(os.path.basename(a))[0]
                    fp = os.path.join(flow_dir, f"{stem}.png")
                    if os.path.isfile(b) and os.path.isfile(fp):
                        self.samples.append((a, b, fp))
            else:
                raise ValueError(f"unknown pairing {pairing!r}")
        if not self.samples:
            raise FileNotFoundError(f"no KITTI training samples under {root}")

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int):
        return self.get(idx, epoch=0)

    def get(self, idx: int, epoch: int = 0):
        """Deterministic per-(seed, epoch, idx) sample — the data-iterator
        state needed for exact resume."""
        import cv2
        rng = np.random.default_rng((self.seed, epoch, idx))
        p1, p2, pf = self.samples[idx]
        im1 = load_image(p1).astype(np.float32) / 255.0
        im2 = load_image(p2).astype(np.float32) / 255.0
        flow, valid = read_flow_png(pf)

        if self.augment:
            im1, im2, flow, valid = aug.reduced_affine(im1, im2, flow,
                                                       valid, rng)
        h, w = im1.shape[:2]
        nh, nw = max(h, self.crop_h), max(w, self.crop_w)
        if (nh, nw) != (h, w):  # upsize-if-small, scaling flow vectors
            im1 = cv2.resize(im1, (nw, nh))
            im2 = cv2.resize(im2, (nw, nh))
            flow = _resize_flow(flow, nh, nw)
            valid = cv2.resize(valid.astype(np.float32), (nw, nh),
                               interpolation=cv2.INTER_NEAREST) > 0.5
        im1, im2, flow, valid = aug.random_crop(
            (im1, im2, flow, np.asarray(valid)),
            (self.crop_h, self.crop_w), rng)
        if self.augment and rng.random() < self.flip_prob:
            im1, im2, flow, valid = aug.hflip(im1, im2, flow.copy(), valid)
        return {
            "images": np.concatenate([im1, im2], axis=-1).astype(np.float32),
            "flow": flow.astype(np.float32),
            "valid": valid.astype(np.float32),
        }


class KittiPairsEval:
    """KITTI 2012/2015 evaluation pairs with sparse GT.

    2015 layout: image_2/XXXXXX_10.png + _11.png, flow_occ|flow_noc;
    2012 layout: colored_0 (fallback image_0).  Returns full-res uint8
    frames + GT flow + validity (``inference_kitti.py:134-202``).
    """

    def __init__(self, root: str, year: int = 2015, split: str = "training",
                 flow_kind: str = "flow_occ"):
        base = os.path.join(root, split)
        img_dir = None
        for cand in (("image_2",) if year == 2015
                     else ("colored_0", "image_0", "image_2")):
            d = os.path.join(base, cand)
            if os.path.isdir(d):
                img_dir = d
                break
        if img_dir is None:
            raise FileNotFoundError(f"no KITTI image dir under {base}")
        self.flow_dir = os.path.join(base, flow_kind)
        firsts = sorted(glob(os.path.join(img_dir, "*_10.png")))
        self.pairs = []
        for f in firsts:
            s = f.replace("_10.png", "_11.png")
            stem = os.path.basename(f)
            gt = os.path.join(self.flow_dir, stem)
            if os.path.isfile(s):
                self.pairs.append((f, s, gt if os.path.isfile(gt) else None))
        if not self.pairs:
            raise FileNotFoundError(f"no *_10/_11 pairs in {img_dir}")

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, idx: int):
        p1, p2, pf = self.pairs[idx]
        out = {
            "im1": load_image(p1), "im2": load_image(p2),
            "stem": os.path.splitext(os.path.basename(p1))[0],
        }
        if pf:
            flow, valid = read_flow_png(pf)
            out["flow"] = flow
            out["valid"] = valid
        return out


class SintelPairs:
    """MPI-Sintel frame pairs with .flo GT for clean/final EPE evaluation."""

    def __init__(self, root: str, render: str = "clean",
                 split: str = "training",
                 sequences: Optional[Sequence[str]] = None):
        img_root = os.path.join(root, split, render)
        flow_root = os.path.join(root, split, "flow")
        if not os.path.isdir(img_root):
            raise FileNotFoundError(img_root)
        seqs = sequences or sorted(os.listdir(img_root))
        self.pairs = []
        for seq in seqs:
            frames = sorted(glob(os.path.join(img_root, seq, "frame_*.png")))
            for a, b in zip(frames[:-1], frames[1:]):
                stem = os.path.splitext(os.path.basename(a))[0]
                gt = os.path.join(flow_root, seq, f"{stem}.flo")
                self.pairs.append((a, b, gt if os.path.isfile(gt) else None,
                                   f"{seq}/{stem}"))
        if not self.pairs:
            raise FileNotFoundError(f"no Sintel pairs under {img_root}")

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, idx: int):
        p1, p2, pf, stem = self.pairs[idx]
        out = {"im1": load_image(p1), "im2": load_image(p2), "stem": stem}
        if pf:
            out["flow"] = read_flo(pf)
        return out


class ConsecutiveFrames:
    """frame_t / frame_{t+1} pairs for self-supervised training, from a
    directory of frames or a video file (``train_pseudo.py:23-62``)."""

    def __init__(self, source: str, size_hw: Tuple[int, int] = (384, 512),
                 stride: int = 1, preset: str = "rgb_imagenet"):
        self.size_hw = size_hw
        self.preset = preset
        if os.path.isdir(source):
            self.frames = sorted(
                glob(os.path.join(source, "*.png"))
                + glob(os.path.join(source, "*.jpg")))
            self.video = None
        else:
            self.video = source
            import cv2
            cap = cv2.VideoCapture(source)
            n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
            cap.release()
            self.frames = list(range(n))
        self.stride = stride
        self.index = [(i, i + stride)
                      for i in range(0, len(self.frames) - stride)]
        if not self.index:
            raise FileNotFoundError(f"not enough frames in {source}")
        import threading
        self._cap = None            # cached capture: one container open per
        self._cap_pos = -1          # dataset, sequential reads seek-free
        self._cache: dict = {}      # last few decoded frames (pair overlap)
        self._lock = threading.Lock()   # Loader fetches from worker threads

    def __len__(self):
        return len(self.index)

    def _read(self, key):
        if self.video is None:
            return load_image(self.frames[key])
        # One cached VideoCapture + positional bookkeeping: the old
        # open-seek-read-release per frame cost 2N container opens per
        # epoch and a CAP_PROP_POS_FRAMES seek decodes from the previous
        # keyframe (a whole GOP for long-GOP H.264) — ruinous on a 1-core
        # host where CPU competes with the compile helper.  Sequential
        # access (pair reads, eval order) now never seeks, and the tiny
        # frame cache serves the (i, i+s) / (i+1, i+1+s) overlap.
        import cv2
        with self._lock:
            hit = self._cache.get(key)
            if hit is not None:
                return hit
            if self._cap is None:
                self._cap = cv2.VideoCapture(self.video)
                self._cap_pos = 0
            if key != self._cap_pos:
                self._cap.set(cv2.CAP_PROP_POS_FRAMES, key)
            ok, frame = self._cap.read()
            self._cap_pos = key + 1
            if not ok:
                raise RuntimeError(
                    f"failed to read frame {key} of {self.video}")
            rgb = np.ascontiguousarray(frame[..., ::-1])  # BGR → RGB
            self._cache[key] = rgb
            while len(self._cache) > 4:
                self._cache.pop(next(iter(self._cache)))
            return rgb

    def __getitem__(self, idx: int):
        import cv2
        from opticalflow_tpu.io.images import preprocess_pair
        a, b = self.index[idx]
        h, w = self.size_hw
        im1 = cv2.resize(self._read(a), (w, h))
        im2 = cv2.resize(self._read(b), (w, h))
        return {"images": preprocess_pair(im1, im2, self.preset)[0]}
