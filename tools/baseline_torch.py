"""Measure the PyTorch-reference-equivalent training throughput on host CPU.

The reference repo commits no throughput numbers (BASELINE.md), so this
script establishes the comparison point for bench.py's ``vs_baseline``: a
torch implementation of the same BrainEncoder architecture
(``meg_decoding/models.py:341-383`` semantics: SpatialAttention → per-subject
1×1 convs via the reference's Python batch loop → 5 ConvBlocks → final convs
→ CLIP loss) with the reference's training step (Adam, per-batch update).

Run once; writes tools/baseline_measured.json. Not imported by the framework.
"""

import json
import os
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

torch.manual_seed(0)

B, C, T = 64, 208, 360
D1, D2, Fdim, K = 270, 320, 1024, 32
NUM_SUBJECTS = 27


class SpatialAttention(nn.Module):
    def __init__(self, loc, d1=D1, k_dim=K):
        super().__init__()
        k = torch.arange(k_dim).repeat_interleave(k_dim).float()
        l = torch.arange(k_dim).repeat(k_dim).float()
        x, y = torch.tensor(loc[:, 0]), torch.tensor(loc[:, 1])
        phi = 2 * torch.pi * (torch.outer(k, x) + torch.outer(l, y))
        self.register_buffer("cos", torch.cos(phi).float())
        self.register_buffer("sin", torch.sin(phi).float())
        self.z_re = nn.Parameter(torch.rand(d1, k_dim * k_dim))
        self.z_im = nn.Parameter(torch.rand(d1, k_dim * k_dim))

    def forward(self, X):
        a = self.z_re @ self.cos + self.z_im @ self.sin
        wts = F.softmax(a, dim=-1)
        return torch.einsum("oi,bit->bot", wts, X)


class SubjectBlock(nn.Module):
    def __init__(self, loc, d1=D1, k_dim=K, num_subjects=NUM_SUBJECTS):
        super().__init__()
        self.sa = SpatialAttention(loc, d1, k_dim)
        self.conv = nn.Conv1d(d1, d1, 1)
        self.subject_layer = nn.ModuleList(
            [nn.Conv1d(d1, d1, 1, bias=False) for _ in range(num_subjects)]
        )

    def forward(self, X, subject_idxs):
        X = self.conv(self.sa(X))
        # the reference's per-sample Python loop (models.py:270-272)
        return torch.cat(
            [self.subject_layer[i](x.unsqueeze(0)) for i, x in zip(subject_idxs, X)]
        )


class ConvBlock(nn.Module):
    def __init__(self, k, d1=D1, d2=D2):
        super().__init__()
        cin = d1 if k == 0 else d2
        self.k = k
        self.conv0 = nn.Conv1d(cin, d2, 3, padding="same")
        self.bn0 = nn.BatchNorm1d(d2)
        self.conv1 = nn.Conv1d(d2, d2, 3, padding="same")
        self.bn1 = nn.BatchNorm1d(d2)
        self.conv2 = nn.Conv1d(d2, 2 * d2, 3, padding="same")

    def forward(self, X):
        h = self.conv0(X) if self.k == 0 else self.conv0(X) + X
        h = F.gelu(self.bn0(h))
        h = F.gelu(self.bn1(self.conv1(h) + h))
        return F.glu(self.conv2(h), dim=-2)


class BrainEncoder(nn.Module):
    def __init__(self, loc, d1=D1, d2=D2, f_dim=Fdim, k_dim=K,
                 num_subjects=NUM_SUBJECTS, seq2seq=False):
        super().__init__()
        self.seq2seq = seq2seq
        self.subject_block = SubjectBlock(loc, d1, k_dim, num_subjects)
        self.blocks = nn.Sequential(*[ConvBlock(k, d1, d2) for k in range(5)])
        self.f1 = nn.Conv1d(d2, 2 * d2, 1)
        self.f2 = nn.Conv1d(2 * d2, f_dim, 1)

    def forward(self, X, subject_idxs):
        X = self.subject_block(X, subject_idxs)
        X = self.blocks(X)
        X = F.gelu(self.f2(F.gelu(self.f1(X))))
        return X if self.seq2seq else X.mean(-1)


def clip_loss(x, y, temp):
    x = x.flatten(1)  # seq2seq (B, F, T) → (B, F·T); no-op for (B, F)
    y = y.flatten(1)
    x = x / x.norm(dim=-1, keepdim=True)
    y = y / y.norm(dim=-1, keepdim=True)
    logits = x @ y.T * torch.exp(temp)
    t = torch.arange(x.shape[0])
    ce = nn.CrossEntropyLoss()
    return (ce(logits, t) + ce(logits.T, t)) / 2


def _measure(n_threads: int, n_steps: int = 5) -> float:
    torch.set_num_threads(n_threads)
    rng = np.random.RandomState(0)
    loc = rng.rand(C, 2).astype(np.float32)
    model = BrainEncoder(loc)
    temp = nn.Parameter(torch.tensor(5.1))
    opt = torch.optim.Adam(list(model.parameters()) + [temp], lr=3e-4)
    X = torch.randn(B, C, T)
    Y = torch.randn(B, Fdim)
    subs = torch.randint(0, NUM_SUBJECTS, (B,))

    # warmup
    for _ in range(2):
        opt.zero_grad()
        loss = clip_loss(model(X, subs), Y, temp)
        loss.backward()
        opt.step()

    t0 = time.time()
    for _ in range(n_steps):
        opt.zero_grad()
        loss = clip_loss(model(X, subs), Y, temp)
        loss.backward()
        opt.step()
    dt = time.time() - t0
    return B * n_steps / dt


def main():
    # both denominators: the honest one is all cores (the reference's own
    # framing is 20 cores, README.md:26); 1-thread kept for context
    n_cores = os.cpu_count() or 1
    sps_multi = _measure(n_cores)
    sps_single = _measure(1)
    out = {
        # bench.py's vs_baseline divides by this (multi-threaded) number
        "torch_cpu_train_samples_per_sec": sps_multi,
        "torch_cpu_train_samples_per_sec_1thread": sps_single,
        "num_threads": n_cores,
        "batch_size": B,
        "steps_timed": 5,
        "sec_per_step": B / sps_multi,
    }
    path = os.path.join(os.path.dirname(__file__), "baseline_measured.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
