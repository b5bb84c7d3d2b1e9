"""SUPERSEDED torch baseline (rounds 1-3): the same policy architecture
re-implemented compactly in the reference's framework (PyTorch), measured on
this host's CPU.  ``bench.py``'s ``vs_baseline`` now comes from
``bench_torch_reference.py``, which imports and drives the reference code
itself; this module is kept as the independent cross-check of those numbers.

Architecture mirrored (2x foundation fallback kwargs, agent.py:16-36):
128×128×3 uint8 → /255 → Impala CNN (width 8: chans 128/256/256, 2 residual
blocks each, GroupNorm) → dense 256 → linear 2048 → 4 transformer blocks
(16 heads, 128-frame window KV cache, relative bias) → heads (8641 + 121).
"""

from __future__ import annotations

import math
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

# configured by set_width(); defaults = 2x foundation
HID = 2048
HEADS = 16
N_BLOCKS = 4
MAXLEN = 128
CHANS = (128, 256, 256)
NBASIS = 10


def set_width(width: int) -> None:
    """Scale the module-level architecture to a foundation width multiple."""
    global HID, CHANS
    HID = 1024 * width
    CHANS = tuple(int(4 * width * c) for c in (16, 32, 32))


class ConvBlock(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.n0 = nn.GroupNorm(1, ch)
        self.c0 = nn.Conv2d(ch, ch, 3, padding=1, bias=False)
        self.n1 = nn.GroupNorm(1, ch)
        self.c1 = nn.Conv2d(ch, ch, 3, padding=1, bias=False)

    def forward(self, x):
        h = F.relu(self.c0(self.n0(x)))
        h = F.relu(self.c1(self.n1(h)))
        return x + h


class DownStack(nn.Module):
    def __init__(self, cin, cout, first_norm=True):
        super().__init__()
        self.norm = nn.GroupNorm(1, cin) if first_norm else None
        self.conv = nn.Conv2d(cin, cout, 3, padding=1, bias=not first_norm)
        self.post = nn.GroupNorm(1, cout)
        self.blocks = nn.ModuleList([ConvBlock(cout) for _ in range(2)])

    def forward(self, x):
        if self.norm is not None:
            x = self.norm(x)
        x = F.relu(self.conv(x))
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        x = self.post(x)
        for b in self.blocks:
            x = b(x)
        return x


class TransformerBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.ln = nn.LayerNorm(HID)
        self.q = nn.Linear(HID, HID)
        self.k = nn.Linear(HID, HID, bias=False)
        self.v = nn.Linear(HID, HID, bias=False)
        self.proj = nn.Linear(HID, HID)
        self.r = nn.Linear(HID, NBASIS * HEADS)
        self.b_nd = nn.Parameter(torch.randn(NBASIS, MAXLEN) * 0.2)
        self.mlp_ln = nn.LayerNorm(HID)
        self.mlp0 = nn.Linear(HID, HID * 4, bias=False)
        self.mlp1 = nn.Linear(HID * 4, HID)

    def forward(self, x, cache_k, cache_v):
        # x: (B, 1, HID) single-step with MAXLEN cache
        xn = self.ln(x)
        q = self.q(xn).view(-1, 1, HEADS, HID // HEADS).transpose(1, 2)
        k_new = self.k(xn)
        v_new = self.v(xn)
        k_full = torch.cat([cache_k, k_new], dim=1)
        v_full = torch.cat([cache_v, v_new], dim=1)
        cache_k, cache_v = k_full[:, 1:], v_full[:, 1:]
        kh = k_full.view(-1, MAXLEN + 1, HEADS, HID // HEADS).transpose(1, 2)
        vh = v_full.view(-1, MAXLEN + 1, HEADS, HID // HEADS).transpose(1, 2)
        d = HID // HEADS
        logits = torch.matmul(q.float(), kh.float().transpose(-1, -2)) / d
        rb = self.r(xn).view(-1, 1, HEADS, NBASIS).transpose(1, 2)  # (B,H,1,n)
        band = self.b_nd[:, torch.arange(MAXLEN - 1, -1, -1)]  # (n, MAXLEN)
        extra = torch.einsum("bhtn,nT->bhtT", rb.float(), band.float())
        logits[..., 1:] = logits[..., 1:] + extra[..., : MAXLEN]
        w = torch.softmax(logits, dim=-1)
        a = torch.matmul(w, vh.float()).transpose(1, 2).reshape(-1, 1, HID)
        x = xn + self.proj(a)
        return x + self.mlp1(F.relu(self.mlp0(self.mlp_ln(x)))), cache_k, cache_v


class Policy2x(nn.Module):
    def __init__(self):
        super().__init__()
        stacks = []
        cin = 3
        for i, ch in enumerate(CHANS):
            stacks.append(DownStack(cin, ch, first_norm=i > 0))
            cin = ch
        self.stacks = nn.ModuleList(stacks)
        flat = CHANS[-1] * 16 * 16
        self.dense_ln = nn.LayerNorm(flat)
        self.dense = nn.Linear(flat, 256, bias=False)
        self.lin_ln = nn.LayerNorm(256)
        self.lin = nn.Linear(256, HID, bias=False)
        self.blocks = nn.ModuleList([TransformerBlock() for _ in range(N_BLOCKS)])
        self.last_ln = nn.LayerNorm(HID)
        self.last = nn.Linear(HID, HID, bias=False)
        self.final_ln = nn.LayerNorm(HID)
        self.pi_buttons = nn.Linear(HID, 8641)
        self.pi_camera = nn.Linear(HID, 121)
        self.value = nn.Linear(HID, 1)

    def forward(self, img, caches):
        x = img.float() / 255.0
        b = x.shape[0]
        x = x.permute(0, 3, 1, 2)
        for s in self.stacks:
            x = s(x)
        x = x.reshape(b, -1)
        x = F.relu(self.dense(self.dense_ln(x)))
        x = F.relu(self.lin(self.lin_ln(x))).view(b, 1, HID)
        new_caches = []
        for blk, (ck, cv) in zip(self.blocks, caches):
            x, ck, cv = blk(x, ck, cv)
            new_caches.append((ck, cv))
        x = F.relu(x)
        x = F.relu(self.last(self.last_ln(x)))
        x = self.final_ln(x)
        logits_b = F.log_softmax(self.pi_buttons(x).float() / 2.0, dim=-1)
        logits_c = F.log_softmax(self.pi_camera(x).float() / 2.0, dim=-1)
        u = torch.rand_like(logits_b)
        ab = torch.argmax(logits_b - torch.log(-torch.log(u)), dim=-1)
        u = torch.rand_like(logits_c)
        ac = torch.argmax(logits_c - torch.log(-torch.log(u)), dim=-1)
        return ab, ac, self.value(x), new_caches


def measure_policy_step_fps(n_streams: int = 64, n_steps: int = 3, warmup: int = 1,
                            width: int = 2) -> float:
    set_width(width)
    torch.set_num_threads(max(1, torch.get_num_threads()))
    with torch.no_grad():
        model = Policy2x().eval()
        caches = [
            (torch.zeros(n_streams, MAXLEN, HID), torch.zeros(n_streams, MAXLEN, HID))
            for _ in range(N_BLOCKS)
        ]
        img = torch.randint(0, 255, (n_streams, 128, 128, 3), dtype=torch.uint8)
        for _ in range(warmup):
            _, _, _, caches = model(img, caches)
        t0 = time.perf_counter()
        for _ in range(n_steps):
            ab, ac, v, caches = model(img, caches)
        dt = time.perf_counter() - t0
    return n_streams * n_steps / dt


if __name__ == "__main__":
    print(measure_policy_step_fps())
