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
    def __init__(self, loc):
        super().__init__()
        k = torch.arange(K).repeat_interleave(K).float()
        l = torch.arange(K).repeat(K).float()
        x, y = torch.tensor(loc[:, 0]), torch.tensor(loc[:, 1])
        phi = 2 * torch.pi * (torch.outer(k, x) + torch.outer(l, y))
        self.register_buffer("cos", torch.cos(phi).float())
        self.register_buffer("sin", torch.sin(phi).float())
        self.z_re = nn.Parameter(torch.rand(D1, K * K))
        self.z_im = nn.Parameter(torch.rand(D1, K * K))

    def forward(self, X):
        a = self.z_re @ self.cos + self.z_im @ self.sin
        wts = F.softmax(a, dim=-1)
        return torch.einsum("oi,bit->bot", wts, X)


class SubjectBlock(nn.Module):
    def __init__(self, loc):
        super().__init__()
        self.sa = SpatialAttention(loc)
        self.conv = nn.Conv1d(D1, D1, 1)
        self.subject_layer = nn.ModuleList(
            [nn.Conv1d(D1, D1, 1, bias=False) for _ in range(NUM_SUBJECTS)]
        )

    def forward(self, X, subject_idxs):
        X = self.conv(self.sa(X))
        # the reference's per-sample Python loop (models.py:270-272)
        return torch.cat(
            [self.subject_layer[i](x.unsqueeze(0)) for i, x in zip(subject_idxs, X)]
        )


class ConvBlock(nn.Module):
    def __init__(self, k):
        super().__init__()
        cin = D1 if k == 0 else D2
        self.k = k
        self.conv0 = nn.Conv1d(cin, D2, 3, padding="same")
        self.bn0 = nn.BatchNorm1d(D2)
        self.conv1 = nn.Conv1d(D2, D2, 3, padding="same")
        self.bn1 = nn.BatchNorm1d(D2)
        self.conv2 = nn.Conv1d(D2, 2 * D2, 3, padding="same")

    def forward(self, X):
        h = self.conv0(X) if self.k == 0 else self.conv0(X) + X
        h = F.gelu(self.bn0(h))
        h = F.gelu(self.bn1(self.conv1(h) + h))
        return F.glu(self.conv2(h), dim=-2)


class BrainEncoder(nn.Module):
    def __init__(self, loc):
        super().__init__()
        self.subject_block = SubjectBlock(loc)
        self.blocks = nn.Sequential(*[ConvBlock(k) for k in range(5)])
        self.f1 = nn.Conv1d(D2, 2 * D2, 1)
        self.f2 = nn.Conv1d(2 * D2, Fdim, 1)

    def forward(self, X, subject_idxs):
        X = self.subject_block(X, subject_idxs)
        X = self.blocks(X)
        return F.gelu(self.f2(F.gelu(self.f1(X)))).mean(-1)


def clip_loss(x, y, temp):
    x = x / x.norm(dim=-1, keepdim=True)
    y = y / y.norm(dim=-1, keepdim=True)
    logits = x @ y.T * torch.exp(temp)
    t = torch.arange(x.shape[0])
    ce = nn.CrossEntropyLoss()
    return (ce(logits, t) + ce(logits.T, t)) / 2


def main():
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

    n_steps = 5
    t0 = time.time()
    for _ in range(n_steps):
        opt.zero_grad()
        loss = clip_loss(model(X, subs), Y, temp)
        loss.backward()
        opt.step()
    dt = time.time() - t0
    sps = B * n_steps / dt
    out = {
        "torch_cpu_train_samples_per_sec": sps,
        "batch_size": B,
        "num_threads": torch.get_num_threads(),
        "steps_timed": n_steps,
        "sec_per_step": dt / n_steps,
    }
    path = os.path.join(os.path.dirname(__file__), "baseline_measured.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
