"""Export the EMA denoiser weights from a Trainer milestone checkpoint.

The Trainer saves full state (params/opt/EMA/step) per milestone
(red_diffeq_tpu/models/trainer.py:save, capability parity with reference
models/diffusion.py:617-625); inference-side tools load a bare EMA param
tree (pretrained_models/model-synthetic-ema.ckpt). This extracts one
from the other.

Usage:
    python tools/export_ema.py [--run pretrained_models/train_run]
        [--milestone latest] [--out pretrained_models/model-synthetic-ema.ckpt]
"""
import argparse
import re
from pathlib import Path

from red_diffeq_tpu.io.checkpoints import load_params, save_params


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--run', type=Path,
                   default=Path('pretrained_models/train_run'))
    p.add_argument('--milestone', default='latest',
                   help="milestone number, or 'latest'")
    p.add_argument('--out', type=Path,
                   default=Path('pretrained_models/model-synthetic-ema.ckpt'))
    args = p.parse_args(argv)

    if args.milestone == 'latest':
        cands = {int(m.group(1)): f for f in args.run.glob('model-*.ckpt')
                 if (m := re.match(r'model-(\d+)\.ckpt$', f.name))}
        if not cands:
            raise FileNotFoundError(f'no model-<k>.ckpt under {args.run}')
        milestone = max(cands)
        src = cands[milestone]
    else:
        milestone = int(args.milestone)
        src = args.run / f'model-{milestone}.ckpt'

    state = load_params(src)
    if 'ema_params' not in state:
        raise KeyError(f'{src} has keys {sorted(state)}; expected a Trainer '
                       'checkpoint with ema_params')
    save_params(state['ema_params'], args.out)
    print(f'exported EMA params of milestone {milestone} '
          f'(step {state.get("step", "?")}) from {src} -> {args.out}')


if __name__ == '__main__':
    main()
