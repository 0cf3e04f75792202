"""One-off experiment: XLA row-gather throughput at the grouped-grad-gather
shapes (render/pallas/composite_pallas.py _composite_core_bwd). The round-4
full-res profile showed this single gather costs 39 ms/iter at 1.75M pairs —
the largest stage of a mapping iteration — while the same-table end-slot
gather (sequential-ish indices) runs 3x faster per row. Quantify what the
cost actually follows: split width, column count, index locality, row count.

In-loop timing (K iterations inside one jit, inputs perturbed per iteration)
— per-call block_until_ready timing does NOT block properly through the axon
tunnel and reports dispatch time only.

Usage: python scripts/exp_gather.py [--p 1835008] [--pad 1966080]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_loop(name, body, x0, K=20, reps=3):
    import numpy as np
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        def f(i, carry):
            x, acc = carry
            out = body(x + acc * 1e-30 + jnp.float32(i) * 1e-9)
            leaves = [
                jnp.sum(l[..., :1].astype(jnp.float32)) if l.ndim
                else l.astype(jnp.float32)
                for l in jax.tree.leaves(out)
            ]
            return (x, acc + sum(leaves) * 1e-20)

        _, acc = jax.lax.fori_loop(0, K, f, (x, jnp.float32(0.0)))
        return acc

    jax.block_until_ready(run(x0))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0))
        ts.append((time.perf_counter() - t0) / K)
    t = float(np.median(ts))
    print(f"{name:<40s} {t*1e3:8.2f} ms/iter")
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=1835008)  # pair_cap (index count)
    ap.add_argument("--pad", type=int, default=0)  # table rows (P_pad)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    p = args.p
    pad = args.pad or int(p * 1.08) // 128 * 128
    print(f"backend={jax.default_backend()} p={p} pad={pad}")
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.uniform(-1, 1, (pad, 16)).astype(np.float32))
    idx_rand = jnp.asarray(rng.permutation(pad)[:p].astype(np.int32))
    idx_seq = jnp.sort(idx_rand)

    def split_gather(tbl, idx, k):
        cols = tbl.shape[1]
        step = cols // k
        outs = [
            tbl[:, i * step:(i + 1) * step].at[idx].get(
                mode="fill", fill_value=0.0)
            for i in range(k)
        ]
        return jnp.concatenate(outs, axis=1)

    for name, idx in [("random", idx_rand), ("sorted", idx_seq)]:
        for k in (1, 2, 4):
            timed_loop(f"gather {name} split={k}",
                       lambda t_, idx=idx, k=k: split_gather(t_, idx, k),
                       table)
        timed_loop(f"gather {name} 8col",
                   lambda t_, idx=idx: t_[:, :8].at[idx].get(
                       mode="fill", fill_value=0.0),
                   table)
        timed_loop(f"scatter-add {name}",
                   lambda t_, idx=idx: jnp.zeros((pad, 16), jnp.float32)
                   .at[idx].add(t_[:p]),
                   table)



def transposed_variants():
    """Variants matching the REAL backward path: the table arrives as
    [16, pad] (kernel layout) and is .T'd before the row gather."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from splatam_tpu.render.pallas import composite_pallas as CP

    p, pad = 1835008, 1981696
    rng = np.random.default_rng(0)
    tt = jnp.asarray(rng.uniform(-1, 1, (16, pad)).astype(np.float32))
    idx = jnp.asarray(rng.permutation(pad)[:p].astype(np.int32))

    def split_gather(tbl, idx, k):
        cols = tbl.shape[1]
        step = cols // k
        outs = [tbl[:, i*step:(i+1)*step].at[idx].get(mode="fill", fill_value=0.0)
                for i in range(k)]
        return jnp.concatenate(outs, axis=1)

    for k in (1, 2, 4):
        timed_loop(f"T-source gather split={k}",
                   lambda t_, k=k: split_gather(t_.T, idx, k).T, tt)
    timed_loop("T-source _split_row_gather (current)",
               lambda t_: CP._split_row_gather(t_.T, idx).T, tt)
    timed_loop("T-source explicit transpose then split=4",
               lambda t_: split_gather(jnp.asarray(t_.T, order='C') if False
                                       else jax.lax.transpose(t_, (1, 0)),
                                       idx, 4).T, tt)
    # gather along axis 1 directly from the [16, pad] layout
    timed_loop("axis1 gather from [16,pad]",
               lambda t_: t_.at[:, idx].get(mode="fill", fill_value=0.0), tt)


if __name__ == "__main__":
    import sys
    if "--transposed" in sys.argv:
        transposed_variants()
    else:
        main()
