"""Synthetic dataset generation CLI.

The OpenFWI/Marmousi datasets the reference trains and evaluates on are
not distributable; this tool emits reference-layout .npy dataset
directories (Velocity_Data/<family>.npy + Seismic_Data/<family>.npy with
seismograms simulated by the forward operator) from the synthetic
generators, so every workflow — pretraining, inversion, benches —
runs self-contained.

Usage:
    red-diffeq-datagen --out dataset/OpenFWI --n 500 \
        --families FlatVel CurveVel FlatFault CurveFault
    red-diffeq-datagen --out dataset/Marmousi --n 8 --width 190 \
        --families CurveFault
"""
import argparse
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description='Generate synthetic datasets')
    p.add_argument('--out', type=Path, required=True,
                   help='dataset root (creates Velocity_Data/ and '
                        'Seismic_Data/)')
    p.add_argument('--n', type=int, default=100, help='samples per family')
    p.add_argument('--families', type=str, nargs='+',
                   default=['FlatVel', 'CurveVel', 'FlatFault',
                            'CurveFault'])
    p.add_argument('--height', type=int, default=70)
    p.add_argument('--width', type=int, default=70)
    p.add_argument('--nt', type=int, default=1000)
    p.add_argument('--ns', type=int, default=5)
    p.add_argument('--nbc', type=int, default=120)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--velocity_only', action='store_true',
                   help='skip seismogram simulation (pretraining only '
                        'needs velocities)')
    p.add_argument('--sim_batch', type=int, default=8,
                   help='simulation batch size')
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from red_diffeq_tpu.io.synthetic import generate_velocity_models
    from red_diffeq_tpu.solvers.acoustic import FWIForward
    from red_diffeq_tpu.utils.data_trans import (
        s_normalize_none, v_denormalize, v_normalize,
    )

    vel_dir = args.out / 'Velocity_Data'
    seis_dir = args.out / 'Seismic_Data'
    vel_dir.mkdir(parents=True, exist_ok=True)
    if not args.velocity_only:
        seis_dir.mkdir(parents=True, exist_ok=True)
        ctx = dict(n_grid=args.width, nt=args.nt, dx=10.0, dt=0.001,
                   nbc=args.nbc, f=15.0, sz=10, gz=10, ng=args.width,
                   ns=args.ns)
        op = FWIForward(ctx, normalize=True, v_denorm_func=v_denormalize,
                        s_norm_func=s_normalize_none)

    for i, fam in enumerate(args.families):
        vel = generate_velocity_models(args.n, args.height, args.width,
                                       family=fam, seed=args.seed + i)
        np.save(vel_dir / f'{fam}.npy', vel)
        print(f'{fam}: velocities {vel.shape} -> {vel_dir}', flush=True)
        if args.velocity_only:
            continue
        chunks = []
        for s in range(0, args.n, args.sim_batch):
            batch = jnp.asarray(vel[s:s + args.sim_batch])
            chunks.append(np.asarray(op(v_normalize(batch))))
            print(f'  simulated {min(s + args.sim_batch, args.n)}'
                  f'/{args.n}', flush=True)
        np.save(seis_dir / f'{fam}.npy', np.concatenate(chunks))
    print(f'dataset written to {args.out}')


if __name__ == '__main__':
    main()
