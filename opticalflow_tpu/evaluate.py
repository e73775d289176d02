"""Dataset evaluation runners: KITTI (EPE + Fl-all) and Sintel (EPE).

Mirrors ``inference_kitti.py:227-263`` (pad-to-/64, finest flow, upsample to
GT size, nanmean summaries) and the Sintel benchmark config from README:36
(clean 1.83 / final 2.31 for the canonical weights).

TPU-native difference: evaluation batches pairs of identical padded shape
through one jitted program instead of a per-pair batch-1 Python loop, and
the flow upsampling runs on device.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from opticalflow_tpu.utils import metrics as M

__all__ = ["evaluate_pairs", "evaluate_kitti", "evaluate_sintel"]


def evaluate_pairs(engine, dataset, *, preset: str = "bgr_unit",
                   size_mode: str = "pad",
                   batch: int = 8,
                   save_dir: Optional[str] = None,
                   save_format: str = "kitti_png",
                   limit: Optional[int] = None,
                   verbose: bool = True) -> Dict[str, float]:
    """Evaluate any dataset yielding {im1, im2, stem[, flow[, valid]]}.

    Pairs are grouped by frame shape and pushed through
    ``engine.flow_from_pairs`` ``batch`` at a time — one jitted program per
    (batch, shape), with the final partial chunk padded to the compiled batch
    size (its extra outputs discarded).  Per-pair metrics are unchanged from
    the reference semantics.  With a sharded engine, ``batch`` must be a
    multiple of the mesh's ``data`` axis.

    ``size_mode``: "pad" replicates ``inference_kitti.py`` (v2, the better
    pipeline); "resize" replicates the distorting-resize convention of
    ``inference.py`` (v1) and ``script_pwc.py``.  Returns {"epe": mean,
    "fl_all": mean%} (NaN-mean over pairs, like the reference)."""
    batch = max(1, int(batch))
    n = len(dataset) if limit is None else min(limit, len(dataset))

    # group indices by frame shape so each group batches at constant shape
    # (KITTI/Sintel are constant-shape; mixed datasets still work)
    groups: Dict[tuple, list] = {}
    samples = [dataset[i] for i in range(n)]
    for i, s in enumerate(samples):
        groups.setdefault(tuple(s["im1"].shape), []).append(i)

    results = {}
    for idxs in groups.values():
        for start in range(0, len(idxs), batch):
            chunk = idxs[start:start + batch]
            # pad the final chunk to the compiled batch size
            padded = chunk + [chunk[-1]] * (batch - len(chunk))
            flows = engine.flow_from_pairs(
                [samples[i]["im1"] for i in padded],
                [samples[i]["im2"] for i in padded],
                preset=preset, size_mode=size_mode)
            for k, i in enumerate(chunk):
                results[i] = np.asarray(flows[k])

    epes, fls = [], []
    for i, s in enumerate(samples):
        flow = results[i]
        if save_dir:
            import os
            os.makedirs(save_dir, exist_ok=True)
            stem = s["stem"].replace("/", "_")
            if save_format == "flo":
                from opticalflow_tpu.io.flo import write_flo
                write_flo(os.path.join(save_dir, f"{stem}.flo"), flow)
            else:
                from opticalflow_tpu.io.kitti import write_flow_png
                write_flow_png(os.path.join(save_dir, f"{stem}.png"), flow)
        if "flow" in s:
            valid = s.get("valid")
            e = M.epe(flow, s["flow"], valid)
            f = M.fl_all(flow, s["flow"], valid)
            epes.append(e)
            fls.append(f)
            if verbose:
                print(f"{s['stem']} | EPE: {e:.3f} | Fl-all: {f:.2f}%")
    out = {
        "epe": float(np.nanmean(epes)) if epes else float("nan"),
        "fl_all": float(np.nanmean(fls)) if fls else float("nan"),
        "num_pairs": n,
    }
    if verbose:
        print("=" * 60)
        print(f"Mean EPE:    {out['epe']:.3f}")
        print(f"Mean Fl-all: {out['fl_all']:.2f}%")
    return out


def evaluate_kitti(engine, root: str, *, year: int = 2015,
                   flow_kind: str = "flow_occ", preset: str = "rgb_imagenet",
                   batch: int = 8,
                   save_dir: Optional[str] = None,
                   limit: Optional[int] = None) -> Dict[str, float]:
    """KITTI sparse-GT evaluation (1242×375, replicate-pad to /64)."""
    from opticalflow_tpu.data.datasets import KittiPairsEval
    ds = KittiPairsEval(root, year=year, flow_kind=flow_kind)
    return evaluate_pairs(engine, ds, preset=preset, batch=batch,
                          save_dir=save_dir, limit=limit)


def evaluate_sintel(engine, root: str, *, render: str = "clean",
                    preset: str = "bgr_unit",
                    batch: int = 8,
                    save_dir: Optional[str] = None,
                    limit: Optional[int] = None) -> Dict[str, float]:
    """MPI-Sintel clean/final EPE over the training split (dense GT);
    optionally dump predictions as Middlebury .flo files."""
    from opticalflow_tpu.data.datasets import SintelPairs
    ds = SintelPairs(root, render=render)
    return evaluate_pairs(engine, ds, preset=preset, batch=batch,
                          save_dir=save_dir, save_format="flo", limit=limit)
