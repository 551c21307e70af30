"""Measure the reference's ER throughput shape on torch (this host).

The reference repo publishes no numbers (BASELINE.md) and torchvision is not
installed here, so this builds an equivalent torch model (BasicBlock
[2,2,2,2], nf=20 — the same architecture as reference models/resnet.py:112)
and times the reference's ER hot loop (agents/exp_replay.py:34-92: forward/
backward on a bs=10 batch, random retrieve of 10 from a 1k buffer, forward/
backward on memory, SGD step, reservoir update). The resulting images/sec is
recorded in BASELINE.md and used as bench.py's vs_baseline denominator.
"""

import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class Block(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.c1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.b1 = nn.BatchNorm2d(cout)
        self.c2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.b2 = nn.BatchNorm2d(cout)
        self.short = None
        if stride != 1 or cin != cout:
            self.short = nn.Sequential(nn.Conv2d(cin, cout, 1, stride, bias=False),
                                       nn.BatchNorm2d(cout))

    def forward(self, x):
        out = F.relu(self.b1(self.c1(x)))
        out = self.b2(self.c2(out))
        out = out + (self.short(x) if self.short else x)
        return F.relu(out)


class ReducedResNet18(nn.Module):
    def __init__(self, n_classes=10, nf=20):
        super().__init__()
        self.conv1 = nn.Conv2d(3, nf, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(nf)
        layers = []
        cin = nf
        for stage, stride in enumerate((1, 2, 2, 2)):
            cout = nf * 2 ** stage
            layers += [Block(cin, cout, stride), Block(cout, cout, 1)]
            cin = cout
        self.trunk = nn.Sequential(*layers)
        self.linear = nn.Linear(nf * 8, n_classes)

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.trunk(out)
        out = F.avg_pool2d(out, 4).flatten(1)
        return self.linear(out)


def main(n_steps=60, warmup=10):
    torch.manual_seed(0)
    model = ReducedResNet18()
    print("params:", sum(p.numel() for p in model.parameters()))
    opt = torch.optim.SGD(model.parameters(), lr=0.1)
    mem_size = 1000
    buf_x = torch.zeros(mem_size, 3, 32, 32)
    buf_y = torch.zeros(mem_size, dtype=torch.long)
    cur = 0
    seen = 0
    g = np.random.RandomState(0)
    times = []
    for i in range(n_steps):
        x = torch.from_numpy(g.rand(10, 3, 32, 32).astype(np.float32))
        y = torch.from_numpy(g.randint(0, 10, 10))
        t0 = time.time()
        opt.zero_grad()
        loss = F.cross_entropy(model(x), y)
        loss.backward()
        if cur > 0:
            idx = torch.from_numpy(g.choice(cur, min(10, cur), replace=False))
            loss_m = F.cross_entropy(model(buf_x[idx]), buf_y[idx])
            loss_m.backward()
        opt.step()
        # reservoir update
        for j in range(10):
            if cur < mem_size:
                buf_x[cur], buf_y[cur] = x[j], y[j]
                cur += 1
            else:
                r = g.randint(0, seen + j + 1)
                if r < mem_size:
                    buf_x[r], buf_y[r] = x[j], y[j]
        seen += 10
        if i >= warmup:
            times.append(time.time() - t0)
    sec_per_step = float(np.mean(times))
    print(f"torch-cpu ER: {sec_per_step*1000:.1f} ms/step, "
          f"{10.0/sec_per_step:.1f} stream imgs/sec")


if __name__ == "__main__":
    main()
