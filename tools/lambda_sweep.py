"""Regularization-strength sweep for a given prior checkpoint.

Refined (honest) observations, n=4 held-out samples, ts=300; sweeps
reg_lambda for the diffusion (RED) regularizer. Used for the round-4
prior-selection study (docs/milestone_eval.md): the 100k-step prior
peaks at SSIM 0.837 (lambda=0.1) while the 20k-step prior reaches
0.9033-0.9055 across lambda in [0.5, 1.5] -- retuning lambda does NOT
recover late-milestone priors, so early stopping is a property of the
prior, not of the coupling strength.

Usage: python tools/lambda_sweep.py [ckpt] [l1,l2,...]
"""
import json, sys, time
import jax, jax.numpy as jnp, numpy as np

from red_diffeq_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
from red_diffeq_tpu.core.inversion import InversionEngine
from red_diffeq_tpu.io.checkpoints import load_diffusion_params
from red_diffeq_tpu.io.synthetic import generate_mixed_dataset
from red_diffeq_tpu.models.diffusion import GaussianDiffusion
from red_diffeq_tpu.models.unet import Unet
from red_diffeq_tpu.solvers.acoustic import FWIForward, refined_ctx, upsample_velocity
from red_diffeq_tpu.utils.data_trans import (
    prepare_initial_model, s_normalize_none, v_denormalize, v_normalize)

ckpt = sys.argv[1] if len(sys.argv) > 1 else 'pretrained_models/model-synthetic-ema.ckpt'
lambdas = [float(x) for x in sys.argv[2].split(',')] if len(sys.argv) > 2 \
    else [0.4, 0.2, 0.1]

ctx = dict(n_grid=70, nt=1000, dx=10.0, dt=0.001, nbc=120, f=15.0,
           sz=10, gz=10, ng=70, ns=5)
op = FWIForward(ctx, normalize=True, v_denorm_func=v_denormalize,
                s_norm_func=s_normalize_none, backend='pallas', chunk=20)
model = Unet(dim=64, dim_mults=(1, 2, 4, 8), channels=1)
diffusion = GaussianDiffusion(model, image_size=72, timesteps=1000,
                              objective='pred_noise')
load_diffusion_params(diffusion, ckpt)

v_true = generate_mixed_dataset(4, seed=7777)
v_true_j = jnp.asarray(v_true)
op_obs = FWIForward(refined_ctx(ctx, 2), sample_temporal=2, normalize=True,
                    v_denorm_func=v_denormalize, s_norm_func=s_normalize_none,
                    backend='xla', chunk=20)
y = op_obs(v_normalize(jnp.asarray(upsample_velocity(v_true, 2))))
init = np.concatenate([prepare_initial_model(v_true[b:b+1], 'smoothed', sigma=10.0)
                       for b in range(4)])
mu0 = jnp.pad(jnp.asarray(init), ((0,0),(0,0),(1,1),(1,1)))

engine = InversionEngine(diffusion, regularization='diffusion', sigma_x0=1e-4)
for lam in lambdas:
    t0 = time.time()
    _, pm = engine.optimize(mu0, v_true_j, y, op, ts=300, lr=0.03,
                            reg_lambda=lam, key=jax.random.PRNGKey(8888),
                            use_scan=True, progress=False)
    print(json.dumps({'ckpt': ckpt, 'lambda': lam,
        'MAE': round(float(np.mean([m['mae'][-1] for m in pm])), 4),
        'SSIM': round(float(np.mean([m['ssim'][-1] for m in pm])), 4),
        'secs': round(time.time()-t0, 1)}), flush=True)
