"""Torch-CPU oracle for parity tests — NOT part of the framework.

A compact, loop-built torch replica of the reference PWC-DC architecture
(reference /root/reference/models/PWCNet.py) with a CPU correlation that
implements the CUDA extension's semantics (channel-MEAN of products, zero
padding — correlation_cuda_kernel.cu:104-143).  Used only as a numerical
oracle: random torch weights are exported through
``opticalflow_tpu.models.torch_import`` and the JAX model must reproduce the
torch forward to float32 tolerance.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

PYR = (3, 16, 32, 64, 96, 128, 196)
EST = (128, 128, 96, 64, 32)
SCALES = {5: 0.625, 4: 1.25, 3: 2.5, 2: 5.0}


def corr_mean(f1: torch.Tensor, f2: torch.Tensor, md: int = 4) -> torch.Tensor:
    """CUDA-path correlation semantics on CPU: out[:, (tj+md)*(2md+1)+(ti+md)]
    = mean_c f1[:, c, y, x] * f2[:, c, y+tj, x+ti], zero-padded."""
    b, c, h, w = f1.shape
    f2p = F.pad(f2, (md, md, md, md))
    outs = []
    for tj in range(-md, md + 1):
        for ti in range(-md, md + 1):
            shifted = f2p[:, :, md + tj:md + tj + h, md + ti:md + ti + w]
            outs.append((f1 * shifted).mean(dim=1, keepdim=True))
    return torch.cat(outs, dim=1)


def ref_warp(x: torch.Tensor, flo: torch.Tensor, thr: float) -> torch.Tensor:
    """The reference warp (models/PWCNet.py:141-177) on CPU: (W-1)-normalized
    grid + torch-2.x default grid_sample (align_corners=False), ones-mask."""
    b, c, h, w = x.shape
    ys, xs = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    grid = torch.stack((xs, ys)).float()[None].repeat(b, 1, 1, 1)
    vgrid = grid + flo
    vx = 2.0 * vgrid[:, 0] / max(w - 1, 1) - 1.0
    vy = 2.0 * vgrid[:, 1] / max(h - 1, 1) - 1.0
    vgrid = torch.stack((vx, vy), dim=3)
    out = F.grid_sample(x, vgrid)
    mask = F.grid_sample(torch.ones_like(x), vgrid)
    mask = (mask >= thr).float()
    return out * mask


class OraclePWC(nn.Module):
    """Loop-built replica of PWCDCNet / PWCDCNet_old for oracle use."""

    def __init__(self, variant: str = "new", md: int = 4):
        super().__init__()
        self.variant = variant
        self.md = md
        self.thr = 0.9999 if variant == "new" else 0.999
        m = nn.ModuleDict()
        act = lambda i, o, s, p=1, d=1: nn.Sequential(
            nn.Conv2d(i, o, 3, s, p, d), nn.LeakyReLU(0.1))
        for lvl in range(1, 7):
            ci, co = PYR[lvl - 1], PYR[lvl]
            if variant == "new":
                names = ([f"conv{lvl}a", f"conv{lvl}aa", f"conv{lvl}b"]
                         if lvl < 6 else ["conv6aa", "conv6a", "conv6b"])
                for k, name in enumerate(names):
                    m[name] = act(ci if k == 0 else co, co, 2 if k == 0 else 1)
            else:
                m[f"conv{lvl}a"] = act(ci, co, 2)
                m[f"conv{lvl}b"] = act(co, co, 1)
        nd = (2 * md + 1) ** 2
        for lvl in (6, 5, 4, 3, 2):
            od = nd if lvl == 6 else nd + PYR[lvl] + 4
            cum = od
            for i, ch in enumerate(EST):
                m[f"conv{lvl}_{i}"] = act(cum, ch, 1)
                cum += ch
            m[f"predict_flow{lvl}"] = nn.Conv2d(cum, 2, 3, 1, 1)
            if lvl > 2:
                m[f"deconv{lvl}"] = nn.ConvTranspose2d(2, 2, 4, 2, 1)
                m[f"upfeat{lvl}"] = nn.ConvTranspose2d(cum, 2, 4, 2, 1)
        dc_in = nd + PYR[2] + 4 + sum(EST)
        for i, (ch, d) in enumerate(
                ((128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1)), 1):
            m[f"dc_conv{i}"] = act(dc_in if i == 1 else prev, ch, 1, d, d)
            prev = ch
        m["dc_conv7"] = nn.Conv2d(32, 2, 3, 1, 1)
        self.m = m

    def state_dict_flat(self):
        return {k[len("m."):]: v for k, v in self.state_dict().items()}

    def _dense(self, x, lvl):
        order = ((True,) * 5 if self.variant == "new"
                 else (False, True, False, False, False))
        for i, cf in enumerate(order):
            y = self.m[f"conv{lvl}_{i}"](x)
            x = torch.cat((y, x) if cf else (x, y), dim=1)
        return x

    def _pyr(self, im):
        feats = []
        x = im
        for lvl in range(1, 7):
            if self.variant == "new":
                names = ([f"conv{lvl}a", f"conv{lvl}aa", f"conv{lvl}b"]
                         if lvl < 6 else ["conv6aa", "conv6a", "conv6b"])
            else:
                names = [f"conv{lvl}a", f"conv{lvl}b"]
            for n in names:
                x = self.m[n](x)
            feats.append(x)
        return dict(zip(range(1, 7), feats))

    def forward(self, x, train=False):
        c1 = self._pyr(x[:, :3])
        c2 = self._pyr(x[:, 3:])
        flows = {}
        for lvl in (6, 5, 4, 3, 2):
            if lvl == 6:
                xin = F.leaky_relu(corr_mean(c1[6], c2[6], self.md), 0.1)
            else:
                warped = ref_warp(c2[lvl], up_flow * SCALES[lvl], self.thr)
                corr = F.leaky_relu(corr_mean(c1[lvl], warped, self.md), 0.1)
                xin = torch.cat((corr, c1[lvl], up_flow, up_feat), dim=1)
            feat = self._dense(xin, lvl)
            flows[lvl] = self.m[f"predict_flow{lvl}"](feat)
            if lvl > 2:
                up_flow = self.m[f"deconv{lvl}"](flows[lvl])
                up_feat = self.m[f"upfeat{lvl}"](feat)
        dc = feat
        for i in range(1, 7):
            dc = self.m[f"dc_conv{i}"](dc)
        flows[2] = flows[2] + self.m["dc_conv7"](dc)
        if train:
            return tuple(flows[l] for l in (2, 3, 4, 5, 6))
        return flows[2]
