"""Agent-ordering experiment on the hard synthetic stream.

Continual-learning sanity: replay agents must beat regularization-only
agents, which must beat finetune, on the same class-incremental stream.
Writes a markdown table to stdout. Run on TPU: python tools/agent_comparison.py
"""

import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

from ocl_tpu.config import default_params
from ocl_tpu.data import continuum, prepare_test_loaders
from ocl_tpu.registry import agents


def run_agent(name, n_runs=3, **kw):
    base = dict(data="synthetic", num_tasks=5, synthetic_size=400,
                synthetic_difficulty=0.85, mem_size=500, eps_mem_batch=10,
                test_batch=128, verbose=False, learning_rate=0.05)
    base.update(kw)
    p = default_params(agent=name, **base)
    stream = continuum(p.data, p.cl_type, p)
    np.random.seed(p.seed)
    accs, fgts = [], []
    for r in range(n_runs):
        stream.new_run()
        agent = agents[p.agent](p)
        state = agent.init_state(jax.random.PRNGKey(r))
        loaders = prepare_test_loaders(stream.test_data(), p)
        tmp = []
        for x, y, labels in stream:
            state = agent.train_learner(state, x, y)
            tmp.append(agent.evaluate(state, loaders))
        tmp = np.array(tmp)
        accs.append(np.mean(tmp[-1]))
        fgts.append(np.mean(np.max(tmp, axis=0) - tmp[-1]))
    return float(np.mean(accs)), float(np.mean(fgts))


CONFIGS = [
    ("finetune", "ER", dict(mem_size=0, eps_mem_batch=0)),
    ("EWC++",    "EWC", dict(lambda_=100)),
    ("LwF",      "LWF", {}),
    ("ER",       "ER", {}),
    ("MIR",      "ER", dict(retrieve="MIR", subsample=50)),
    ("ER+GSS",   "ER", dict(update="GSS")),
    ("ASER",     "ER", dict(update="ASER", retrieve="ASER", k=3)),
    ("SCR(NCM)", "SCR", dict(eps_mem_batch=50, temp=0.07)),
    ("GDumb",    "GDUMB", dict(mem_epoch=10)),
]

if __name__ == "__main__":
    rows = []
    for label, name, kw in CONFIGS:
        t0 = time.time()
        acc, fgt = run_agent(name, **kw)
        rows.append((label, acc, fgt, time.time() - t0))
        print(f"| {label:9s} | {acc:.3f} | {fgt:.3f} | {rows[-1][3]:.0f}s |",
              flush=True)
    print("\n| Agent | Avg_End_Acc | Avg_End_Fgt | wall |")
    print("|---|---|---|---|")
    for label, acc, fgt, w in rows:
        print(f"| {label} | {acc:.3f} | {fgt:.3f} | {w:.0f}s |")
