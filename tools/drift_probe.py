"""Perf-drift attribution probe (VERDICT r3 Weak #5).

The headline bench drifted 7.87 (r1) -> 8.57 (r2) -> 8.83 s/sample (r3)
while the measured within-session spread was only 3.4%. This probe
splits one bench repeat into:

* ``device_s``  — the jitted 300-step scan program alone, timed with
  block_until_ready around the device computation (no python metric
  handling, no corruption setup, no per_model construction);
* ``e2e_s``     — the full ``engine.optimize`` path the bench times;
* ``host_s``    — the difference: dispatch + host-side metric transfer
  and per-sample curve construction (this host is single-core, so any
  concurrent process — e.g. a pretraining run — inflates it).

Usage: python tools/drift_probe.py [--repeat 3] [--batch 4]
       [--out docs/perf_split.md]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--repeat', type=int, default=3)
    ap.add_argument('--batch', type=int, default=4)
    ap.add_argument('--ts', type=int, default=300)
    ap.add_argument('--out', type=Path, default=None)
    args = ap.parse_args(argv)

    from bench import build_workload
    from red_diffeq_tpu.utils.data_trans import v_normalize

    engine, op, mu0, v_true_j, y, run, backend = build_workload(
        batch=args.batch, ts=args.ts)

    # The same program optimize() dispatches, prepared exactly as it
    # would be (zero corruption -> y unchanged, mask of ones).
    mu = jnp.asarray(mu0, jnp.float32)
    mu_true_norm = v_normalize(jnp.asarray(v_true_j, jnp.float32))
    y32 = jnp.asarray(y, jnp.float32)
    mask = jnp.ones_like(y32)
    optimizer, run_scan_p, _ = engine._get_program(
        'diffusion', args.ts, 0.03, 0.75, True, mu.shape, y32.shape, op)
    params = engine.diffusion_model.params
    opt_state = optimizer.init(mu)
    key = jax.random.PRNGKey(8888)
    key, _, _ = jax.random.split(key, 3)
    step_keys = jax.random.split(key, args.ts)

    def device_only():
        (mu_f, _), metrics = run_scan_p((mu, opt_state), step_keys, y32,
                                        mask, mu_true_norm, params)
        jax.block_until_ready((mu_f, metrics))
        return metrics

    # Warm both paths (shared program: one compile)
    device_only()
    run(args.ts)

    dev, e2e, xfer = [], [], []
    for _ in range(max(1, args.repeat)):
        t0 = time.time()
        metrics = device_only()
        dev.append(time.time() - t0)
        t0 = time.time()
        _ = {k: np.asarray(v) for k, v in metrics.items()}
        xfer.append(time.time() - t0)
        t0 = time.time()
        run(args.ts)
        e2e.append(time.time() - t0)

    med = lambda xs: sorted(xs)[len(xs) // 2]
    b = args.batch
    result = {
        'batch': b, 'ts': args.ts, 'backend': backend,
        'repeats': args.repeat,
        'device_s_per_sample': round(med(dev) / b, 3),
        'metric_transfer_s_per_sample': round(med(xfer) / b, 3),
        'e2e_s_per_sample': round(med(e2e) / b, 3),
        'host_dispatch_s_per_sample': round((med(e2e) - med(dev)) / b, 3),
        'device_min': round(min(dev) / b, 3),
        'device_max': round(max(dev) / b, 3),
        'e2e_min': round(min(e2e) / b, 3),
        'e2e_max': round(max(e2e) / b, 3),
    }
    print(json.dumps(result))

    if args.out:
        lines = [
            '# Headline-bench time split (drift attribution)',
            '',
            f'batch={b}, ts={args.ts}, backend={backend}, '
            f'{args.repeat} repeats (medians; per-sample seconds).',
            '',
            '| component | s/sample |',
            '|---|---|',
            f'| device: jitted {args.ts}-step scan '
            f'(block_until_ready) | {result["device_s_per_sample"]} |',
            f'| metric transfer + np conversion | '
            f'{result["metric_transfer_s_per_sample"]} |',
            f'| end-to-end engine.optimize | '
            f'{result["e2e_s_per_sample"]} |',
            f'| implied host+dispatch overhead (e2e - device) | '
            f'{result["host_dispatch_s_per_sample"]} |',
            '',
            f'Ranges: device {result["device_min"]}..'
            f'{result["device_max"]}, e2e {result["e2e_min"]}..'
            f'{result["e2e_max"]}.',
            '',
            'Reading: if the device row is stable across rounds while '
            'e2e moves, the drift lives in dispatch/tunnel/host load '
            '(this host is single-core — a concurrent pretraining run '
            'inflates the host share), not in the kernels.',
        ]
        args.out.write_text('\n'.join(lines) + '\n')
        print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
