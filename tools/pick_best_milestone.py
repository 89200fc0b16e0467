"""Select the best-by-held-out-quality milestone of a training run and
export its EMA weights as the shipped prior.

This automates the early-stopping decision documented in
docs/milestone_eval.md (inversion quality is non-monotone in prior
training compute; the shipped prior is the best measured milestone).
Selection metric: refined-protocol SSIM (the honest, headline protocol
— BENCHMARKS.md), tie-broken by clean SSIM.

Usage:
    python tools/pick_best_milestone.py \
        --eval docs/milestone_eval_replication.md \
        [--out pretrained_models/model-synthetic-ema.ckpt]
"""
import argparse
import json
from pathlib import Path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--eval', type=Path, required=True,
                   help='milestone_eval output (.md path; reads the '
                        '.json sidecar)')
    p.add_argument('--out', type=Path,
                   default=Path('pretrained_models/model-synthetic-ema.ckpt'))
    args = p.parse_args(argv)

    sidecar = args.eval.with_suffix('.json')
    rows = json.loads(sidecar.read_text())
    rows = [r for r in rows if Path(r['ckpt']).exists()]
    if not rows:
        raise SystemExit(f'no existing checkpoints listed in {sidecar}')
    best = max(rows, key=lambda r: (r['refined']['SSIM'],
                                    r['clean']['SSIM']))
    print(f"best milestone: {best['ckpt']} (step {best['step']}) "
          f"refined SSIM {best['refined']['SSIM']:.4f} / "
          f"clean SSIM {best['clean']['SSIM']:.4f}")

    from red_diffeq_tpu.io.checkpoints import load_params, save_params
    state = load_params(Path(best['ckpt']))
    params = state['ema_params'] if 'ema_params' in state else state
    save_params(params, args.out)
    print(f"exported EMA -> {args.out}")


if __name__ == '__main__':
    main()
