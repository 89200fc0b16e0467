"""Eval-vs-milestone: inversion quality as a function of prior
training progress.

For each Trainer milestone checkpoint, load its EMA weights and run the
reference inversion workload (70x70, nt=1000, ns=5, ts=300, diffusion
regularization) on held-out synthetic samples under both observation
protocols. Because U-Net params are a traced program argument
(core/inversion.py), every milestone reuses ONE compiled program — the
whole sweep costs one compile + K executions.

Also summarizes the training-loss curve from training_losses-<k>.json
so prior quality and optimization progress can be read side by side
(VERDICT r2 next-step #1: show saturation, reconcile prior versions).

Usage:
    python tools/milestone_eval.py \
        [--ckpts pretrained_models/milestones_archive/model-*.ckpt ...] \
        [--n 4] [--ts 300] [--out docs/milestone_eval.md]
"""
import argparse
import json
import re
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def loss_curve_summary(run_dir: Path):
    """(step, mean-loss-of-trailing-1k-steps) from the newest losses JSON."""
    files = {int(m.group(1)): f
             for f in run_dir.glob('training_losses-*.json')
             if (m := re.match(r'training_losses-(\d+)\.json$', f.name))}
    if not files:
        return []
    data = json.loads(files[max(files)].read_text())
    losses = data.get('losses', [])
    # Trainer entries are {'step': int, 'loss': float} dicts
    vals = np.asarray([x['loss'] if isinstance(x, dict) else float(x)
                       for x in losses], np.float64)
    if not len(vals):
        return []
    window = min(1000, len(vals))
    stride = max(window, len(vals) // 20)
    points = list(range(window, len(vals) + 1, stride))
    # Always include the curve's end — the final training loss is the
    # number the saturation table exists to show, and stride arithmetic
    # can otherwise stop up to stride-1 steps short of it.
    if points[-1] != len(vals):
        points.append(len(vals))
    return [(k, float(np.mean(vals[max(0, k - window):k])))
            for k in points]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--ckpts', type=Path, nargs='+', default=None,
                   help='Trainer milestone checkpoints (default: all under '
                        'pretrained_models/milestones_archive + train_run)')
    p.add_argument('--run', type=Path,
                   default=Path('pretrained_models/train_run'))
    p.add_argument('--n', type=int, default=4)
    p.add_argument('--ts', type=int, default=300)
    p.add_argument('--out', type=Path,
                   default=Path('docs/milestone_eval.md'))
    p.add_argument('--note', default=None,
                   help='extra provenance paragraph written under the '
                        'table (e.g. which checkpoints come from which '
                        'training run)')
    args = p.parse_args(argv)

    from red_diffeq_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    from red_diffeq_tpu.core.inversion import InversionEngine
    from red_diffeq_tpu.io.checkpoints import load_params
    from red_diffeq_tpu.io.synthetic import generate_mixed_dataset
    from red_diffeq_tpu.models.diffusion import GaussianDiffusion
    from red_diffeq_tpu.models.unet import Unet
    from red_diffeq_tpu.solvers.acoustic import (
        FWIForward, refined_ctx, upsample_velocity,
    )
    from red_diffeq_tpu.utils.data_trans import (
        prepare_initial_model, s_normalize_none, v_denormalize,
        v_normalize,
    )

    if args.ckpts is None:
        cands = {}
        for d in (Path('pretrained_models/milestones_archive'), args.run):
            for f in d.glob('model-*.ckpt'):
                m = re.match(r'model-(\d+)\.ckpt$', f.name)
                if m:
                    cands.setdefault(int(m.group(1)), f)
        args.ckpts = [cands[k] for k in sorted(cands)]
    if not args.ckpts:
        raise SystemExit('no milestone checkpoints found')

    ctx = dict(n_grid=70, nt=1000, dx=10.0, dt=0.001, nbc=120, f=15.0,
               sz=10, gz=10, ng=70, ns=5)
    backend = 'pallas' if jax.default_backend() == 'tpu' else 'xla'
    op = FWIForward(ctx, normalize=True, v_denorm_func=v_denormalize,
                    s_norm_func=s_normalize_none, backend=backend,
                    chunk=20)
    model = Unet(dim=64, dim_mults=(1, 2, 4, 8), channels=1)
    diffusion = GaussianDiffusion(model, image_size=72, timesteps=1000,
                                  objective='pred_noise')

    v_true = generate_mixed_dataset(args.n, seed=7777)
    v_true_j = jnp.asarray(v_true)
    y_clean = op(v_normalize(v_true_j))
    op_obs = FWIForward(refined_ctx(ctx, factor=2), sample_temporal=2,
                        normalize=True, v_denorm_func=v_denormalize,
                        s_norm_func=s_normalize_none, backend='xla',
                        chunk=20)
    y_refined = op_obs(v_normalize(jnp.asarray(
        upsample_velocity(v_true, factor=2))))
    init = np.concatenate([
        prepare_initial_model(v_true[b:b + 1], 'smoothed', sigma=10.0)
        for b in range(args.n)])
    mu0 = jnp.pad(jnp.asarray(init), ((0, 0), (0, 0), (1, 1), (1, 1)))

    rows = []
    # ONE engine -> the bundle object is stable -> one compiled program
    # reused across milestones (params are traced arguments).
    engine = InversionEngine(diffusion, regularization='diffusion',
                             sigma_x0=1e-4)
    for ck in args.ckpts:
        state = load_params(ck)
        step = state.get('step', '?')
        diffusion.params = (state['ema_params'] if 'ema_params' in state
                            else state)
        row = {'ckpt': str(ck), 'step': step}
        for obs_name, y in (('clean', y_clean), ('refined', y_refined)):
            t0 = time.time()
            _, pm = engine.optimize(
                mu0, v_true_j, y, op, ts=args.ts, lr=0.03,
                reg_lambda=0.75, key=jax.random.PRNGKey(8888),
                use_scan=True, progress=False)
            row[obs_name] = {
                'MAE': float(np.mean([m['mae'][-1] for m in pm])),
                'SSIM': float(np.mean([m['ssim'][-1] for m in pm])),
                'secs': round(time.time() - t0, 1),
            }
        rows.append(row)
        print(f"{ck} step={step} "
              f"clean MAE {row['clean']['MAE']:.4f} SSIM "
              f"{row['clean']['SSIM']:.4f} | refined MAE "
              f"{row['refined']['MAE']:.4f} SSIM "
              f"{row['refined']['SSIM']:.4f}", flush=True)

    # Order the table by training step (explicit --ckpts globs arrive
    # lexically: model-10 before model-2).
    rows.sort(key=lambda r: (not isinstance(r['step'], int), r['step']))

    try:
        curve = loss_curve_summary(args.run)
    except Exception as e:  # never lose the eval table to a summary bug
        print(f'loss-curve summary failed ({e!r}); table written without it')
        curve = []
    lines = [
        '# Prior quality vs training progress',
        '',
        f'Inversion: n={args.n} held-out samples, ts={args.ts}, nt=1000, '
        f'ns=5, diffusion reg lambda=0.75, seed 8888, backend={backend}. '
        'All milestones share ONE compiled program (params are traced '
        'arguments). Produced by `python tools/milestone_eval.py`.',
        '',
        '| milestone ckpt | train step | clean MAE | clean SSIM | '
        'refined MAE | refined SSIM |',
        '|---|---|---|---|---|---|',
    ]
    for r in rows:
        ckpt_path = Path(r['ckpt'])
        lines.append(
            f"| {ckpt_path.parent.name}/{ckpt_path.name} | {r['step']} | "
            f"{r['clean']['MAE']:.4f} | {r['clean']['SSIM']:.4f} | "
            f"{r['refined']['MAE']:.4f} | {r['refined']['SSIM']:.4f} |")
    if args.note:
        lines += ['', args.note]
    if curve:
        lines += ['', '## Training loss (trailing-1k mean)', '',
                  '| step | loss |', '|---|---|']
        lines += [f'| {s} | {l:.5f} |' for s, l in curve]
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text('\n'.join(lines) + '\n')
    # Machine-readable sidecar so downstream tools (pick_best_milestone)
    # select on the measured numbers instead of re-parsing the table.
    args.out.with_suffix('.json').write_text(json.dumps(rows, indent=1))
    print(f'wrote {args.out} (+ .json sidecar)')


if __name__ == '__main__':
    main()
