"""Generate the bench-method ablation config grid.

Reproduces the reference's ablation study layout
(reference ablation_results/{OpenFWI,Marmousi}_Ablation/*/config.yaml):
gradient-trick combinations {grad_norm, grad_smooth, model_blur} crossed
with (diffusion_ts, ts) budgets {(30, 10), (100, 10), (300, 1)}, for the
OpenFWI and Marmousi geometries.

Usage:
    python configs/ablation/generate_ablations.py [--out configs/ablation]
"""
import argparse
import itertools
from pathlib import Path

import yaml


def base_config(dataset: str) -> dict:
    wide = dataset == 'Marmousi'
    return {
        'pde': dict(n_grid=190 if wide else 70, nt=1000, dx=10.0, dt=0.001,
                    nbc=120, f=15.0, sz=10, gz=10, ng=190 if wide else 70,
                    ns=5),
        'model': dict(dim=64, dim_mults=[1, 2, 4, 8], flash_attn=False,
                      channels=1),
        'diffusion': dict(image_size=72, timesteps=1000,
                          sampling_timesteps=250, objective='pred_noise',
                          model_path='pretrained_models/model-4.ckpt'),
        'optimization': dict(
            lr=0.03, ts=10, diffusion_ts=30, regularization='none',
            reg_lambda=0.75, sigma=20.0 if wide else 10.0, sigma_x0=0.0001,
            initial_type='smoothed', noise_std=0.0, noise_type='gaussian',
            missing_number=0, grad_norm=False, grad_smooth=None,
            model_blur=False, grad_clip=1.0,
            use_patches=wide, patch_kernel_size=[70, 70] if wide else None,
            patch_stride=[1, 60] if wide else None),
        'data': dict(
            seismic_data_dir=f'dataset/{dataset}/Seismic_Data/',
            velocity_data_dir=f'dataset/{dataset}/Velocity_Data/',
            batch_size=1, data_pattern='*.npy', use_mmap=True),
        'experiment': dict(name='ablation', results_dir='ablation_results/',
                           save_intermediate=False, log_interval=10,
                           save_metrics=True, random_seed=8888),
        'tpu': dict(solver_backend='auto', solver_chunk=20, remat=True),
    }


TRICK_SETS = {
    'no_tricks': {},
    'grad_norm': {'grad_norm': True},
    'grad_smooth': {'grad_smooth': 1.0},
    'model_blur': {'model_blur': True},
    'all_tricks': {'grad_norm': True, 'grad_smooth': 1.0,
                   'model_blur': True},
}
BUDGETS = [(30, 10), (100, 10), (300, 1)]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--out', type=Path, default=Path(__file__).parent)
    args = p.parse_args(argv)
    count = 0
    for dataset in ('OpenFWI', 'Marmousi'):
        for (trick_name, tricks), (dts, ts) in itertools.product(
                TRICK_SETS.items(), BUDGETS):
            cfg = base_config(dataset)
            cfg['optimization'].update(tricks)
            cfg['optimization']['diffusion_ts'] = dts
            cfg['optimization']['ts'] = ts
            name = f'ablation_{trick_name}_dt{dts}_ts{ts}'
            cfg['experiment']['name'] = name
            out = args.out / f'{dataset}_Ablation' / f'{name}.yaml'
            out.parent.mkdir(parents=True, exist_ok=True)
            with open(out, 'w') as f:
                yaml.dump(cfg, f, default_flow_style=False, sort_keys=False)
            count += 1
    print(f'wrote {count} ablation configs under {args.out}')


if __name__ == '__main__':
    main()
