"""Headline benchmark: full-batch OpenFWI RED-DiffEq inversion.

Workload parity with the reference baseline (BASELINE.md): 70x70 velocity
grid, nt=1000 FD steps, ns=5 shots, 300 Adam steps with the diffusion
(RED) regularizer and the full dim-64 U-Net, seed 8888. The reference's
captured number is ~675.6 s/sample at batch 1 on an unspecified CUDA GPU
(example/example_openfwi.ipynb).

Prints ONE JSON line:
  {"metric": ..., "value": seconds_per_sample, "unit": "s/sample",
   "vs_baseline": speedup_factor}

``--repeat N`` times N runs after the warmup and reports the MEDIAN as
the headline value plus min/max/spread_pct fields, so run-to-run
variance (session/tunnel effects) is measured rather than asserted.
``--batch B`` selects the batch size (amortizes fixed per-dispatch cost
over more samples; see docs/scaling.md for the batch sweep).
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_S_PER_SAMPLE = 675.58
DEFAULT_BATCH = 4
TS = 300


def build_workload(batch=DEFAULT_BATCH, ts=TS, prewarm=False):
    """Build the exact headline workload: returns (engine, op, mu0,
    v_true_j, y, run) where run(ts) executes one full inversion and
    blocks. Shared with tools/drift_probe.py so the perf-drift split is
    measured on the same program the headline reports."""
    from red_diffeq_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from red_diffeq_tpu.core.inversion import InversionEngine
    from red_diffeq_tpu.models.diffusion import GaussianDiffusion
    from red_diffeq_tpu.models.unet import Unet
    from red_diffeq_tpu.solvers.acoustic import FWIForward
    from red_diffeq_tpu.utils.data_trans import (
        prepare_initial_model, s_normalize_none, v_denormalize, v_normalize,
    )

    ctx = dict(n_grid=70, nt=1000, dx=10.0, dt=0.001, nbc=120, f=15.0,
               sz=10, gz=10, ng=70, ns=5)
    backend = 'pallas' if jax.default_backend() == 'tpu' else 'xla'
    op = FWIForward(ctx, normalize=True, v_denorm_func=v_denormalize,
                    s_norm_func=s_normalize_none, backend=backend, chunk=20)

    model = Unet(dim=64, dim_mults=(1, 2, 4, 8), channels=1)
    diffusion = GaussianDiffusion(model, image_size=72, timesteps=1000,
                                  sampling_timesteps=250,
                                  objective='pred_noise')
    diffusion.init_params(jax.random.PRNGKey(0))
    # Use the self-pretrained prior when present (QUALITY.md) so the
    # reported SSIM reflects the real method, not a random denoiser.
    from pathlib import Path as _P
    ckpt = _P('pretrained_models/model-synthetic-ema.ckpt')
    if ckpt.exists():
        from red_diffeq_tpu.io.checkpoints import load_diffusion_params
        load_diffusion_params(diffusion, str(ckpt))

    # Synthetic OpenFWI-style truths (held-out seed). Observations come
    # from a dt/2 + dx/2 refined solver at the same physical acquisition
    # — NOT from the inversion operator itself — so the reported SSIM
    # carries an honest forward-model mismatch (no inverse crime).
    from red_diffeq_tpu.io.synthetic import generate_mixed_dataset
    from red_diffeq_tpu.solvers.acoustic import refined_ctx, \
        upsample_velocity
    v_true = generate_mixed_dataset(batch, seed=8888)
    v_true_j = jnp.asarray(v_true)
    op_obs = FWIForward(refined_ctx(ctx, factor=2), sample_temporal=2,
                        normalize=True, v_denorm_func=v_denormalize,
                        s_norm_func=s_normalize_none, backend='xla',
                        chunk=20)
    y = op_obs(v_normalize(jnp.asarray(upsample_velocity(v_true, 2))))

    init = np.concatenate([
        prepare_initial_model(v_true[b:b + 1], 'smoothed', sigma=10.0)
        for b in range(batch)])
    mu0 = jnp.pad(jnp.asarray(init), ((0, 0), (0, 0), (1, 1), (1, 1)))

    engine = InversionEngine(diffusion, regularization='diffusion',
                             sigma_x0=1e-4)
    if prewarm:
        engine.warm_compile(mu0.shape, y.shape, op, ts=ts, lr=0.03,
                            reg_lambda=0.75, regularization='diffusion')

    def run(ts=ts):
        mu, per_model = engine.optimize(
            mu0, v_true_j, y, op, ts=ts, lr=0.03, reg_lambda=0.75,
            key=jax.random.PRNGKey(8888), use_scan=True, progress=False)
        jax.block_until_ready(mu)
        return per_model

    return engine, op, mu0, v_true_j, y, run, backend


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--repeat', type=int, default=3,
                    help='timed runs after warmup; median is the '
                         'headline, min/max/spread are reported so '
                         'run-to-run variance is measured (default 3 '
                         'adds ~1 min total)')
    ap.add_argument('--batch', type=int, default=DEFAULT_BATCH,
                    help='samples per inversion (fixed dispatch cost '
                         'amortizes over the batch; docs/scaling.md has '
                         'the sweep)')
    args = ap.parse_args(argv)
    batch = args.batch

    _, _, _, _, _, run, backend = build_workload(batch=batch, ts=TS)

    run(TS)                      # compile + warm run
    times = []
    for _ in range(max(1, args.repeat)):
        t0 = time.time()
        per_model = run(TS)      # timed run
        times.append(time.time() - t0)

    per_sample = sorted(t / batch for t in times)
    s_per_sample = per_sample[len(per_sample) // 2]  # median
    final_ssim = float(np.mean([pm['ssim'][-1] for pm in per_model]))
    result = {
        'metric': 'openfwi_red_diffeq_inversion_time',
        'value': round(s_per_sample, 3),
        'unit': 's/sample',
        'vs_baseline': round(BASELINE_S_PER_SAMPLE / s_per_sample, 2),
        'batch': batch,
        'ts': TS,
        'backend': backend,
        'final_ssim_synthetic': round(final_ssim, 4),
        'obs': 'refined_dt/2_dx/2',
    }
    if len(per_sample) > 1:
        result.update({
            'repeats': len(per_sample),
            'min': round(per_sample[0], 3),
            'max': round(per_sample[-1], 3),
            'spread_pct': round(100.0 * (per_sample[-1] - per_sample[0])
                                / s_per_sample, 1),
        })
    print(json.dumps(result))


def _main_with_retry():
    """One self-re-exec on transient device faults.

    The tunneled chip occasionally reports UNAVAILABLE (device fault /
    pool blip); the grant then takes ~5-8 min to reclaim and the same
    run succeeds verbatim in a fresh process. Since this script is the
    driver's single shot at the round's headline number, retry once —
    a fresh process is required because a failed backend init poisons
    the current one.
    """
    import os
    import sys
    try:
        main()
    except Exception as e:
        transient = 'UNAVAILABLE' in str(e) or 'Unavailable' in str(e)
        if not transient or os.environ.get('BENCH_RETRIED') == '1':
            raise
        print(f'transient device fault ({type(e).__name__}); '
              're-executing once after grant-reclaim wait', file=sys.stderr)
        time.sleep(420)
        os.environ['BENCH_RETRIED'] = '1'
        os.execv(sys.executable, [sys.executable] + sys.argv)


if __name__ == '__main__':
    _main_with_retry()
