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

Outage behavior (VERDICT r4, Next #1): the tunneled chip can go hard
down, in which case backend init hangs forever — so before building
anything this script probes the device in a timeout-bounded subprocess,
and a watchdog bounds the whole run. On unrecoverable device failure it
prints ONE machine-readable diagnostic JSON line (same ``metric``/
``unit`` keys, plus ``error`` and the last in-tree good measurement
from BENCH_LAST_GOOD.json) and exits 0, instead of dying on the driver
timeout with nothing parseable. Transient faults retry ONCE in a fresh
process with ``--repeat 1`` and no sleep — the fresh process's first
dispatch naturally blocks until the device grant is reclaimed.
"""
import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

BASELINE_S_PER_SAMPLE = 675.58
DEFAULT_BATCH = 4
TS = 300
METRIC = 'openfwi_red_diffeq_inversion_time'
LAST_GOOD_PATH = Path(__file__).resolve().parent / 'BENCH_LAST_GOOD.json'
# Sized above the runbook's observed *healthy* first-dispatch worst case
# (527 s cold, ~5-8 min post-outage grant reclaim) so a slow-but-alive
# chip is not misreported as an outage.
PROBE_TIMEOUT_S = int(os.environ.get('BENCH_PROBE_TIMEOUT_S', '900'))
WATCHDOG_S = int(os.environ.get('BENCH_WATCHDOG_S', '2400'))


def _diagnostic_exit(msg):
    """Print one machine-readable JSON line and exit 0. The line keeps
    the normal metric/unit keys so downstream parsers see a schema, but
    carries ``error`` instead of ``value`` — a failed capture must never
    masquerade as a fresh measurement."""
    out = {'metric': METRIC, 'unit': 's/sample', 'error': msg}
    try:
        last = json.loads(LAST_GOOD_PATH.read_text())
        out['last_good'] = last
    except Exception:
        pass
    print(json.dumps(out), flush=True)
    os._exit(0)


def _probe_device():
    """Check the default backend can init AND dispatch, inside a
    subprocess bounded by PROBE_TIMEOUT_S (a wedged tunnel hangs client
    construction with no exception — only a subprocess timeout catches
    it). The timeout is sized for the ~5-8 min grant-reclaim first
    dispatch, which this probe also absorbs so the timed runs don't."""
    code = ('import jax, jax.numpy as jnp;'
            'jax.block_until_ready(jnp.zeros((), jnp.float32) + 1.0);'
            'print(jax.default_backend())')
    try:
        p = subprocess.run([sys.executable, '-c', code],
                           timeout=PROBE_TIMEOUT_S, text=True,
                           stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    except subprocess.TimeoutExpired:
        return False, (f'device client init/dispatch timed out after '
                       f'{PROBE_TIMEOUT_S}s (tunnel wedged or chip down)')
    if p.returncode != 0:
        tail = (p.stdout or '').strip().splitlines()[-3:]
        return False, 'device probe failed: ' + ' | '.join(tail)
    return True, p.stdout.strip().splitlines()[-1]


def _start_watchdog():
    """If the timed run itself wedges mid-flight, emit the diagnostic
    line before the driver's timeout turns the round into rc=124."""
    import threading
    t = threading.Timer(
        WATCHDOG_S, lambda: _diagnostic_exit(
            f'bench watchdog fired after {WATCHDOG_S}s '
            f'(device likely wedged mid-run)'))
    t.daemon = True
    t.start()
    return t


def build_workload(batch=DEFAULT_BATCH, ts=TS, smoke=False, bf16=False):
    """Build the exact headline workload: returns (engine, op, mu0,
    v_true_j, y, run, backend) where run(ts) executes one full inversion
    and blocks; ``run.prior`` records whether the denoiser carries the
    shipped checkpoint or random init. Shared with tools/drift_probe.py
    so the perf-drift split is measured on the same program the headline
    reports.

    ``smoke=True`` swaps in a tiny problem (16x16 grid, nt=60, dim-8
    denoiser, no pretrained prior) so the whole main() pipeline —
    argparse, build, timed runs, JSON emission — is executable in the
    CPU test suite in seconds. Smoke results never touch
    BENCH_LAST_GOOD.json."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from red_diffeq_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from red_diffeq_tpu.core.inversion import InversionEngine
    from red_diffeq_tpu.models.diffusion import GaussianDiffusion
    from red_diffeq_tpu.models.unet import Unet
    from red_diffeq_tpu.solvers.acoustic import FWIForward
    from red_diffeq_tpu.utils.data_trans import (
        prepare_initial_model, s_normalize_none, v_denormalize, v_normalize,
    )

    if smoke:
        ctx = dict(n_grid=16, nt=60, dx=10.0, dt=0.001, nbc=20, f=15.0,
                   sz=10, gz=10, ng=16, ns=2)
        unet_dim, unet_mults, image_size, timesteps = 8, (1, 2), 18, 20
    else:
        ctx = dict(n_grid=70, nt=1000, dx=10.0, dt=0.001, nbc=120, f=15.0,
                   sz=10, gz=10, ng=70, ns=5)
        unet_dim, unet_mults, image_size, timesteps = 64, (1, 2, 4, 8), 72, 1000
    backend = 'pallas' if jax.default_backend() == 'tpu' else 'xla'
    op = FWIForward(ctx, normalize=True, v_denorm_func=v_denormalize,
                    s_norm_func=s_normalize_none, backend=backend, chunk=20)

    model = Unet(dim=unet_dim, dim_mults=unet_mults, channels=1)
    diffusion = GaussianDiffusion(model, image_size=image_size,
                                  timesteps=timesteps,
                                  sampling_timesteps=min(250, timesteps),
                                  objective='pred_noise',
                                  half_precision=bf16)
    diffusion.init_params(jax.random.PRNGKey(0))
    # Use the self-pretrained prior when present (QUALITY.md) so the
    # reported SSIM reflects the real method, not a random denoiser.
    # Timing is prior-independent (identical program either way), so
    # the headline perf number is valid even when no checkpoint exists
    # — e.g. right after the 2026-08-19 VM reset destroyed the trained
    # prior (docs/outage_runbook.md, failure mode 5) — but the result
    # JSON records which case it was (``prior`` key) so a low
    # final_ssim_synthetic is attributable.
    from pathlib import Path as _P
    ckpt = _P('pretrained_models/model-synthetic-ema.ckpt')
    prior = 'random-init (timing-only; SSIM not meaningful)'
    if ckpt.exists() and not smoke:
        from red_diffeq_tpu.io.checkpoints import load_diffusion_params
        load_diffusion_params(diffusion, str(ckpt))
        prior = str(ckpt)

    # Synthetic OpenFWI-style truths (held-out seed). Observations come
    # from a dt/2 + dx/2 refined solver at the same physical acquisition
    # — NOT from the inversion operator itself — so the reported SSIM
    # carries an honest forward-model mismatch (no inverse crime).
    from red_diffeq_tpu.io.synthetic import generate_mixed_dataset
    from red_diffeq_tpu.solvers.acoustic import refined_ctx, \
        upsample_velocity
    n_grid = ctx['n_grid']
    v_true = generate_mixed_dataset(batch, h=n_grid, w=n_grid, seed=8888)
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

    def run(ts=ts, segment=None):
        mu, per_model = engine.optimize(
            mu0, v_true_j, y, op, ts=ts, lr=0.03, reg_lambda=0.75,
            key=jax.random.PRNGKey(8888), use_scan=True, progress=False,
            segment_steps=segment)
        jax.block_until_ready(mu)
        return per_model

    # Provenance for the result JSON without widening the 7-tuple
    # every caller unpacks (tools/drift_probe.py shares this builder).
    run.prior = prior
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
    ap.add_argument('--segment', type=int, default=None,
                    help='split the ts-step scan into dispatches of at '
                         'most N steps (same math, ~1 ULP; needed '
                         'when one long dispatch trips the tunnel\'s '
                         'execution limit — batch 16 at ts=300 is a '
                         '~150 s dispatch, which faults; ~35 s '
                         'dispatches complete. See docs/outage_runbook.md '
                         'failure mode 6)')
    ap.add_argument('--bf16', action='store_true',
                    help='run the U-Net denoiser in bf16 (weights + '
                         'activations, fp32 I/O and schedule math - the '
                         'tpu.bf16_unet config path); an operating-point '
                         'sweep flag, never recorded as last-good')
    ap.add_argument('--smoke', action='store_true',
                    help='tiny workload so the full pipeline is '
                         'executable in the CPU suite; never a headline '
                         'number and never recorded as last-good')
    args = ap.parse_args(argv)
    batch = args.batch
    ts = 4 if args.smoke else TS

    import numpy as np

    _, _, _, _, _, run, backend = build_workload(batch=batch, ts=ts,
                                                 smoke=args.smoke,
                                                 bf16=args.bf16)

    run(ts, args.segment)        # compile + warm run
    times = []
    for _ in range(max(1, args.repeat)):
        t0 = time.time()
        per_model = run(ts, args.segment)  # timed run
        times.append(time.time() - t0)

    per_sample = sorted(t / batch for t in times)
    s_per_sample = per_sample[len(per_sample) // 2]  # median
    final_ssim = float(np.mean([pm['ssim'][-1] for pm in per_model]))
    from red_diffeq_tpu.ops.stencil import X_STENCIL_LAYOUT
    result = {
        'metric': METRIC,
        'value': round(s_per_sample, 3),
        'unit': 's/sample',
        'vs_baseline': round(BASELINE_S_PER_SAMPLE / s_per_sample, 2),
        'batch': batch,
        'ts': ts,
        'backend': backend,
        # provenance: which x-stencil layout produced this number
        # (effective == requested here; bench uses chunk=20, which every
        # layout supports without downgrade)
        'layout': X_STENCIL_LAYOUT,
        'final_ssim_synthetic': round(final_ssim, 4),
        'prior': run.prior,
        'obs': 'refined_dt/2_dx/2',
    }
    if args.segment is not None:
        result['segment'] = args.segment
    if args.bf16:
        result['unet_precision'] = 'bf16'
    if args.smoke:
        result['smoke'] = True
    if len(per_sample) > 1:
        result.update({
            'repeats': len(per_sample),
            'min': round(per_sample[0], 3),
            'max': round(per_sample[-1], 3),
            'spread_pct': round(100.0 * (per_sample[-1] - per_sample[0])
                                / s_per_sample, 1),
        })
    print(json.dumps(result), flush=True)
    # Record the measurement so a future outage can report the last
    # good in-tree number alongside its error diagnostics. Only the
    # headline configuration qualifies — a --batch 16 sweep or other
    # operating point must not replace the number README/BENCH_r*.json
    # quote (they are batch-DEFAULT_BATCH).
    if (batch == DEFAULT_BATCH and not args.smoke
            and args.segment is None and not args.bf16):
        try:
            LAST_GOOD_PATH.write_text(json.dumps(
                {'when': time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime()),
                 **result}, indent=1) + '\n')
        except OSError:
            pass


def _strip_repeat_args(argv):
    """Drop every spelling of --repeat (``--repeat 3`` / ``--repeat=3``)
    so the transient-fault retry can append ``--repeat 1``."""
    return [a for i, a in enumerate(argv)
            if not (a.startswith('--repeat')
                    or (i > 0 and argv[i - 1] == '--repeat'))]


def _main_with_retry():
    """Bounded fault handling around main().

    * Probe first: a wedged tunnel hangs backend init with no exception,
      so probe in a subprocess with a timeout and emit the diagnostic
      JSON line immediately if the device is unreachable.
    * Watchdog: bounds the whole run so a mid-flight wedge still
      produces a parseable line inside the driver's window.
    * Transient faults (UNAVAILABLE / pool blip): the same run succeeds
      verbatim in a fresh process once the device grant is reclaimed
      (~5-8 min, absorbed by the retried process's own first dispatch —
      no sleep here). Retry ONCE, with --repeat 1 to fit the window.
    """
    ok, msg = _probe_device()
    if not ok:
        _diagnostic_exit(msg)
    _start_watchdog()
    try:
        main()
    except Exception as e:
        transient = 'UNAVAILABLE' in str(e) or 'Unavailable' in str(e)
        if not transient or os.environ.get('BENCH_RETRIED') == '1':
            _diagnostic_exit(f'bench failed: {type(e).__name__}: '
                             f'{str(e)[:300]}')
        print(f'transient device fault ({type(e).__name__}); '
              're-executing once with --repeat 1', file=sys.stderr)
        os.environ['BENCH_RETRIED'] = '1'
        os.execv(sys.executable,
                 [sys.executable] + _strip_repeat_args(sys.argv)
                 + ['--repeat', '1'])


if __name__ == '__main__':
    _main_with_retry()
