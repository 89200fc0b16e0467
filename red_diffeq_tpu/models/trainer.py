"""Diffusion pretraining harness.

Capability parity with the reference Trainer
(red_diffeq/models/diffusion.py:574-694): Adam(lr, betas=(0.9, 0.99)),
gradient accumulation, global-norm gradient clipping, EMA weights with
update periodicity and warmup, milestone checkpoints with a losses JSON,
periodic EMA sampling. TPU-first differences:

* the train step (grad accumulation loop included) is ONE jitted program:
  micro-batches are scanned with ``lax.scan``, so accumulation costs no
  host round-trips;
* data parallelism is a ``jax.sharding`` NamedSharding over the 'data'
  mesh axis — XLA inserts the gradient all-reduce (the reference relies
  on HF Accelerate/DDP);
* mixed precision is bf16 on the model forward (optional), schedule math
  stays fp32; no loss-scaler needed (bf16 has fp32 range);
* checkpoints are flax-serialized state dicts (not pickled torch
  modules); sample grids are saved as .npy;
* FID is an inception-free proxy (``calculate_fid=True``): Fréchet
  distance in a frozen seed-stable conv feature space (see
  ``_fid_features``) — comparable across milestones AND across runs,
  unlike the reference's torchvision-inception FID which is
  unavailable on this stack.
"""
import json
import time
from dataclasses import dataclass
from pathlib import Path


import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from red_diffeq_tpu.models.diffusion import GaussianDiffusion


@dataclass
class EMAConfig:
    """Mirrors ema-pytorch behavior used by the reference
    (models/diffusion.py:596): step-gated, periodic, warmed-up decay."""
    decay: float = 0.995
    update_every: int = 10
    update_after_step: int = 100
    inv_gamma: float = 1.0
    power: float = 2.0 / 3.0


_FROZEN_FEATURE_SEED = 0x5EED
_FROZEN_FEATURE_CHANNELS = (16, 32, 64, 128)
_frozen_weights_cache = None


def _frozen_feature_weights():
    """Deterministic weights for the frozen FID feature extractor: 3x3
    stride-2 conv stack, orthogonal-ish He init from a FIXED seed. Random
    conv features are a known-usable FID space for non-natural images
    (seed-stable -> scores comparable across runs, priors, machines)."""
    global _frozen_weights_cache
    if _frozen_weights_cache is None:
        key = jax.random.PRNGKey(_FROZEN_FEATURE_SEED)
        ws = []
        c_in = 1
        for c_out in _FROZEN_FEATURE_CHANNELS:
            key, sub = jax.random.split(key)
            fan_in = 3 * 3 * c_in
            w = jax.random.normal(sub, (3, 3, c_in, c_out),
                                  jnp.float32) * np.sqrt(2.0 / fan_in)
            ws.append(w)
            c_in = c_out
        _frozen_weights_cache = tuple(ws)
    return _frozen_weights_cache


@jax.jit
def _frozen_feature_apply(ws, x):
    """(N, H, W, 1) in [-1, 1] -> (N, 128): stride-2 convs + leaky-relu,
    global mean pool."""
    for w in ws:
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(2, 2), padding='SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        x = jax.nn.leaky_relu(x, 0.2)
    return x.mean(axis=(1, 2))


def frechet_distance(feats_a: np.ndarray, feats_b: np.ndarray,
                     eps: float = 1e-6) -> float:
    """Fréchet distance between Gaussian fits of two feature sets
    (N, D): |mu_a - mu_b|^2 + tr(S_a + S_b - 2 (S_a S_b)^{1/2}).

    ``eps`` regularizes the covariances (eps*I) — with N < D samples the
    sample covariances are singular and sqrtm of their product can go
    NaN/complex-unstable (standard FID implementations do the same)."""
    import scipy.linalg

    mu_a, mu_b = feats_a.mean(0), feats_b.mean(0)
    offset = eps * np.eye(feats_a.shape[1])
    s_a = np.cov(feats_a, rowvar=False) + offset
    s_b = np.cov(feats_b, rowvar=False) + offset
    covmean = scipy.linalg.sqrtm(s_a @ s_b)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    diff = mu_a - mu_b
    return float(diff @ diff + np.trace(s_a) + np.trace(s_b)
                 - 2.0 * np.trace(covmean))


def _ema_decay_at(step, cfg: EMAConfig):
    """Warmup schedule 1 - (1 + t/inv_gamma)^-power, clamped to [0, decay]
    (ema-pytorch's default ramp)."""
    t = jnp.maximum(step - cfg.update_after_step - 1, 0).astype(jnp.float32)
    value = 1.0 - (1.0 + t / cfg.inv_gamma) ** (-cfg.power)
    return jnp.where(t <= 0, 0.0, jnp.clip(value, 0.0, cfg.decay))


class TensorDataset:
    """In-memory dataset of velocity maps (the diffusion_train path feeds
    raw tensors, reference scripts/diffusion_train.py:22-61)."""

    def __init__(self, data: np.ndarray):
        self.data = np.asarray(data, np.float32)

    def __len__(self):
        return len(self.data)

    def sample_batch(self, rng: np.random.RandomState, batch_size: int):
        idx = rng.randint(0, len(self.data), size=batch_size)
        return self.data[idx]


class ImageFolderDataset:
    """Image-folder dataset (capability parity with the reference
    ``Dataset``, models/diffusion.py:556-573): recursive glob over image
    extensions, resize so the short side equals ``image_size``, center
    crop, optional horizontal-flip augmentation, values in [0, 1] with
    shape (C, H, W). Decoding happens lazily per sampled batch."""

    def __init__(self, folder, image_size: int,
                 exts=('jpg', 'jpeg', 'png', 'tiff'),
                 augment_horizontal_flip: bool = False,
                 convert_image_to: str = None):
        self.folder = Path(folder)
        self.image_size = int(image_size)
        self.augment_horizontal_flip = augment_horizontal_flip
        self.convert_image_to = convert_image_to
        self.paths = sorted(p for ext in exts
                            for p in self.folder.glob(f'**/*.{ext}'))
        if not self.paths:
            raise FileNotFoundError(
                f'no images with extensions {exts} under {self.folder}')

    def __len__(self):
        return len(self.paths)

    def _load(self, path):
        from PIL import Image
        img = Image.open(path)
        if self.convert_image_to:
            img = img.convert(self.convert_image_to)
        s = self.image_size
        w, h = img.size
        scale = s / min(w, h)
        img = img.resize((max(s, round(w * scale)),
                          max(s, round(h * scale))), Image.BILINEAR)
        w, h = img.size
        left, top = (w - s) // 2, (h - s) // 2
        img = img.crop((left, top, left + s, top + s))
        arr = np.asarray(img, np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[None]                       # (1, H, W)
        else:
            arr = arr.transpose(2, 0, 1)          # (C, H, W)
        return arr

    def sample_batch(self, rng: np.random.RandomState, batch_size: int):
        idx = rng.randint(0, len(self.paths), size=batch_size)
        batch = np.stack([self._load(self.paths[i]) for i in idx])
        if self.augment_horizontal_flip:
            flip = rng.rand(batch_size) < 0.5
            batch[flip] = batch[flip, :, :, ::-1]
        return batch


class Trainer:
    """Train a GaussianDiffusion denoiser (reference models/diffusion.py:574)."""

    def __init__(self, diffusion_model: GaussianDiffusion, dataset,
                 *, train_batch_size: int = 16,
                 gradient_accumulate_every: int = 1,
                 train_lr: float = 1e-4, train_num_steps: int = 100000,
                 ema_update_every: int = 10, ema_decay: float = 0.995,
                 adam_betas=(0.9, 0.99), save_and_sample_every: int = 10000,
                 num_samples: int = 25, results_folder: str = './results',
                 amp: bool = False, max_grad_norm: float = 1.0,
                 seed: int = 0, data_parallel: bool = True,
                 keep_last_checkpoints: int = 0,
                 calculate_fid: bool = False, num_fid_samples: int = 64,
                 device_data: bool = True,
                 device_data_max_bytes: int = 4 * 1024**3):
        assert train_batch_size * gradient_accumulate_every >= 16, \
            'effective batch size should be at least 16'
        assert int(num_samples ** 0.5) ** 2 == num_samples, \
            'number of samples must have an integer square root'
        self.diffusion = diffusion_model
        self.dataset = dataset
        self.batch_size = train_batch_size
        self.grad_accum = gradient_accumulate_every
        self.train_num_steps = train_num_steps
        self.save_and_sample_every = save_and_sample_every
        self.num_samples = num_samples
        self.max_grad_norm = max_grad_norm
        self.keep_last_checkpoints = keep_last_checkpoints
        self.results_folder = Path(results_folder)
        self.results_folder.mkdir(parents=True, exist_ok=True)
        self.ema_cfg = EMAConfig(decay=ema_decay,
                                 update_every=ema_update_every)
        self.amp = amp
        # Sample-quality metric (reference models/diffusion.py:603-607
        # gates an optional torchvision-inception FID). TPU-native proxy:
        # Fréchet distance in a FROZEN seed-stable random-conv feature
        # space (inception-free; comparable across milestones AND across
        # runs/priors — see _fid_features).
        self.calculate_fid = calculate_fid
        self.num_fid_samples = num_fid_samples
        self.fid_scores = []
        self.step = 0
        self.training_losses = []
        self._np_rng = np.random.RandomState(seed)
        self._key = jax.random.PRNGKey(seed)

        if diffusion_model.params is None:
            diffusion_model.init_params(jax.random.PRNGKey(seed))
        self.params = diffusion_model.params
        self.ema_params = jax.tree.map(jnp.copy, self.params)

        self.optimizer = optax.chain(
            optax.clip_by_global_norm(max_grad_norm),
            optax.adam(train_lr, b1=adam_betas[0], b2=adam_betas[1]),
        )
        self.opt_state = self.optimizer.init(self.params)

        # Data sharding: batch over all local devices ('data' axis).
        self._sharding = None
        if data_parallel and len(jax.devices()) > 1:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
            mesh = Mesh(np.array(jax.devices()), ('data',))
            self._sharding = NamedSharding(mesh, P('data'))

        self._train_step = jax.jit(self._make_train_step())
        self._train_multi = jax.jit(self._make_train_multi())
        # Device-resident data: an in-memory TensorDataset that fits in
        # HBM is transferred ONCE and batches are gathered on device from
        # int32 indices — the host path would otherwise stream
        # ~B*H*W*4 bytes per step through the (slow, ~85 MB/s when
        # tunneled) host->device link, which measured as the training
        # bottleneck (2 steps/s host-bound vs chip-bound after).
        self._data_dev = None
        # Single-device only: under data-parallel sharding the batch
        # stream keeps the host path (its P(None, 'data') placement);
        # replicating the dataset per device would multiply HBM use.
        # ``device_data_max_bytes`` bounds the dataset's HBM claim (the
        # params/opt-state/activations share the same HBM — tune down on
        # small-HBM or large-model configs); train() additionally falls
        # back to the host path if the upload itself fails.
        self._device_data = (
            device_data and isinstance(dataset, TensorDataset)
            and self._sharding is None
            and dataset.data.nbytes <= device_data_max_bytes)
        if self._device_data:
            self._train_multi_idx = jax.jit(self._make_train_multi_idx())

    # -- jitted step -----------------------------------------------------

    def _make_train_step(self):
        diffusion = self.diffusion
        optimizer = self.optimizer
        grad_accum = self.grad_accum
        ema_cfg = self.ema_cfg
        amp = self.amp

        def loss_fn(params, batch, key):
            if amp:
                # True mixed precision: fp32 master weights (the
                # optimizer state stays fp32), bf16 model forward.
                # The batch stays fp32 — q_sample's schedule math is
                # fp32 by design and p_losses casts the model INPUT to
                # the params' dtype, which is what actually puts the
                # U-Net matmuls on the bf16 path.
                params_c = jax.tree.map(
                    lambda p: p.astype(jnp.bfloat16)
                    if p.dtype == jnp.float32 else p, params)
                loss = diffusion.loss(params_c, batch, key)
                return loss.astype(jnp.float32)
            return diffusion.loss(params, batch, key)

        def train_step(params, opt_state, ema_params, step, batches, key):
            """``batches``: (grad_accum, B, C, H, W) micro-batches."""
            keys = jax.random.split(key, grad_accum)

            def accum(carry, xs):
                g_sum, l_sum = carry
                mb, k = xs
                loss, g = jax.value_and_grad(loss_fn)(params, mb, k)
                g_sum = jax.tree.map(jnp.add, g_sum, g)
                return (g_sum, l_sum + loss), None

            zero = jax.tree.map(jnp.zeros_like, params)
            (g_sum, loss_sum), _ = jax.lax.scan(
                accum, (zero, 0.0), (batches, keys))
            grads = jax.tree.map(lambda g: g / grad_accum, g_sum)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)

            # EMA (periodic, warmed-up decay; copy before update_after_step)
            new_step = step + 1
            do_update = (new_step % ema_cfg.update_every) == 0
            decay = _ema_decay_at(new_step, ema_cfg)

            def upd(e, p):
                e_new = e * decay + p * (1.0 - decay)
                return jnp.where(do_update, e_new, e)

            ema_params = jax.tree.map(upd, ema_params, params)
            return params, opt_state, ema_params, new_step, loss_sum / grad_accum

        return train_step

    def _make_train_multi(self):
        """Scan K train steps in one dispatch — on remote-tunneled TPUs
        the per-dispatch round trip (~50 ms) would otherwise dominate."""
        step_fn = self._make_train_step()

        def multi(params, opt_state, ema_params, step, batches_stack, key):
            keys = jax.random.split(key, batches_stack.shape[0])

            def body(carry, xs):
                params, opt_state, ema_params, step = carry
                batches, k = xs
                params, opt_state, ema_params, step, loss = step_fn(
                    params, opt_state, ema_params, step, batches, k)
                return (params, opt_state, ema_params, step), loss

            (params, opt_state, ema_params, step), losses = jax.lax.scan(
                body, (params, opt_state, ema_params, step),
                (batches_stack, keys))
            return params, opt_state, ema_params, step, losses

        return multi

    def _make_train_multi_idx(self):
        """Like _make_train_multi, but batches are GATHERED ON DEVICE
        from the resident dataset by an (K, grad_accum, B) int32 index
        stack — per-call host->device traffic is ~KB instead of
        ~K*accum*B*H*W*4 bytes."""
        step_fn = self._make_train_step()

        def multi(params, opt_state, ema_params, step, idx_stack, key,
                  data):
            keys = jax.random.split(key, idx_stack.shape[0])

            def body(carry, xs):
                params, opt_state, ema_params, step = carry
                idx, k = xs
                batches = jnp.take(data, idx.reshape(-1), axis=0)
                batches = batches.reshape(idx.shape + data.shape[1:])
                params, opt_state, ema_params, step, loss = step_fn(
                    params, opt_state, ema_params, step, batches, k)
                return (params, opt_state, ema_params, step), loss

            (params, opt_state, ema_params, step), losses = jax.lax.scan(
                body, (params, opt_state, ema_params, step),
                (idx_stack, keys))
            return params, opt_state, ema_params, step, losses

        return multi

    # -- checkpointing (reference models/diffusion.py:617-649) ----------

    def save(self, milestone):
        state = {
            'step': self.step,
            'params': self.params,
            'ema_params': self.ema_params,
            'opt_state': self.opt_state,
            'version': '0.1.0',
        }
        path = self.results_folder / f'model-{milestone}.ckpt'
        from red_diffeq_tpu.io.checkpoints import atomic_write_bytes
        atomic_write_bytes(path, serialization.to_bytes(state))
        # RNG sidecar: the numpy batch-index stream and the JAX noise key
        # must survive resume, or the run replays the constructor seed's
        # sequence (re-showing early batches and breaking the
        # device-data determinism story). Sidecar file (not in the
        # ckpt dict) so older checkpoints keep loading.
        mt = self._np_rng.get_state()
        np.savez(self.results_folder / f'rng-{milestone}.npz',
                 mt_keys=mt[1], mt_pos=mt[2], mt_has_gauss=mt[3],
                 mt_cached=mt[4],
                 jax_key=np.asarray(jax.random.key_data(self._key)))
        with open(self.results_folder
                  / f'training_losses-{milestone}.json', 'w') as f:
            json.dump({'step': self.step, 'milestone': milestone,
                       'losses': self.training_losses,
                       'num_losses': len(self.training_losses)}, f, indent=2)
        if self.keep_last_checkpoints > 0:
            ckpts = sorted(self.results_folder.glob('model-*.ckpt'),
                           key=lambda p: int(p.stem.split('-')[1]))
            for old in ckpts[:-self.keep_last_checkpoints]:
                old.unlink()

    def load(self, milestone):
        path = self.results_folder / f'model-{milestone}.ckpt'
        template = {
            'step': 0, 'params': self.params, 'ema_params': self.ema_params,
            'opt_state': self.opt_state, 'version': '',
        }
        with open(path, 'rb') as f:
            state = serialization.from_bytes(template, f.read())
        self.step = int(state['step'])
        losses_file = self.results_folder / f'training_losses-{milestone}.json'
        if losses_file.exists():
            self.training_losses = json.loads(
                losses_file.read_text()).get('losses', [])
        # FID history must survive resume too, or the next milestone's
        # dump overwrites fid_scores.json with only post-resume entries.
        # Truncate to entries at or before the resumed step — resuming
        # an EARLIER milestone must not resurrect future entries that
        # the re-run will append again (duplicate milestones).
        fid_file = self.results_folder / 'fid_scores.json'
        if fid_file.exists():
            try:
                scores = json.loads(fid_file.read_text())
                self.fid_scores = [e for e in scores
                                   if e.get('step', 0) <= self.step]
            except ValueError:
                pass
        rng_file = self.results_folder / f'rng-{milestone}.npz'
        if rng_file.exists():
            d = np.load(rng_file)
            self._np_rng.set_state(('MT19937', d['mt_keys'],
                                    int(d['mt_pos']),
                                    int(d['mt_has_gauss']),
                                    float(d['mt_cached'])))
            key_data = jnp.asarray(d['jax_key'])
            if jnp.issubdtype(self._key.dtype, jax.dtypes.prng_key):
                self._key = jax.random.wrap_key_data(key_data)
            else:
                self._key = key_data.astype(self._key.dtype)
            print('restored RNG state (batch-index stream + noise key)',
                  flush=True)
        else:
            print('warning: no RNG sidecar for this milestone — resumed '
                  'run replays the constructor-seed batch/noise sequence',
                  flush=True)
        print(f"loading from version {state['version']}", flush=True)
        # Move the restored (numpy) state to device EXPLICITLY and block:
        # leaving it implicit makes the first train dispatch absorb the
        # ~570 MB transfer plus the backend's one-time first-dispatch
        # warmup — on a remote-tunneled device that is many minutes of
        # apparent freeze with no log output (observed: >8 min).
        t0 = time.time()
        self.params, self.ema_params, self.opt_state = jax.device_put(
            (state['params'], state['ema_params'], state['opt_state']))
        jax.block_until_ready(self.opt_state)
        print(f'resume state on device in {time.time() - t0:.0f}s',
              flush=True)

    # -- loop ------------------------------------------------------------

    def _next_batches_np(self) -> np.ndarray:
        """(grad_accum, B, C, H, W) micro-batch stack on the host."""
        return np.stack([
            self.dataset.sample_batch(self._np_rng, self.batch_size)
            for _ in range(self.grad_accum)])

    def _put(self, stack_np: np.ndarray, scan_axis: bool):
        """ONE host->device transfer for a whole multi-step batch stack.
        Per-micro-batch transfers would pay the device-dispatch round
        trip k x grad_accum times per call — on remote-tunneled devices
        (~50 ms each) that used to dominate the step time."""
        if self._sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            spec = (P(None, None, 'data') if scan_axis
                    else P(None, 'data'))
            return jax.device_put(stack_np,
                                  NamedSharding(self._sharding.mesh, spec))
        return jnp.asarray(stack_np)

    def _next_batches(self):
        """(grad_accum, B, C, H, W) micro-batch stack, device-sharded."""
        return self._put(self._next_batches_np(), scan_axis=False)

    def _next_idx_np(self, k: int) -> np.ndarray:
        """(k, grad_accum, B) int32 batch indices — the SAME rng call
        sequence as sample_batch, so device-resident and host-streamed
        runs follow identical training trajectories."""
        n = len(self.dataset)
        return np.stack([
            np.stack([self._np_rng.randint(0, n, size=self.batch_size)
                      for _ in range(self.grad_accum)])
            for _ in range(k)]).astype(np.int32)

    def train(self, log_every: int = 100, steps_per_call: int = 20):
        t0 = time.time()
        step0 = self.step  # rate must not credit pre-resume steps
        if self._device_data and self._data_dev is None:
            tput = time.time()
            try:
                self._data_dev = self._put(self.dataset.data,
                                           scan_axis=False)
                jax.block_until_ready(self._data_dev)
            except Exception as e:  # e.g. HBM OOM at upload
                print(f'device-resident dataset upload failed ({e!r}); '
                      f'falling back to host batch streaming', flush=True)
                self._data_dev = None
                self._device_data = False
            else:
                print(f'dataset resident on device '
                      f'({self.dataset.data.nbytes / 1e9:.2f} GB '
                      f'in {time.time() - tput:.0f}s)', flush=True)
        while self.step < self.train_num_steps:
            # How many steps until the next milestone boundary?
            to_milestone = self.save_and_sample_every - (
                self.step % self.save_and_sample_every)
            k = min(steps_per_call, self.train_num_steps - self.step,
                    to_milestone)
            self._key, sub = jax.random.split(self._key)
            if self._device_data:
                (self.params, self.opt_state, self.ema_params, new_step,
                 losses) = self._train_multi_idx(
                    self.params, self.opt_state, self.ema_params,
                    self.step, jnp.asarray(self._next_idx_np(k)), sub,
                    self._data_dev)
            else:
                batches_stack = self._put(
                    np.stack([self._next_batches_np() for _ in range(k)]),
                    scan_axis=True)
                (self.params, self.opt_state, self.ema_params, new_step,
                 losses) = self._train_multi(self.params, self.opt_state,
                                             self.ema_params, self.step,
                                             batches_stack, sub)
            losses = np.asarray(losses)
            for i, lv in enumerate(losses):
                self.training_losses.append({'step': self.step + i,
                                             'loss': float(lv)})
            self.step = int(new_step)
            if self.step % log_every < k:
                rate = (self.step - step0) / (time.time() - t0)
                print(f'step {self.step}/{self.train_num_steps} '
                      f'loss {float(losses[-1]):.4f} '
                      f'({rate:.1f} steps/s)', flush=True)
            if self.step % self.save_and_sample_every == 0:
                milestone = self.step // self.save_and_sample_every
                self._sample_and_save(milestone)
        print('training complete')

    def _fid_features(self, images) -> np.ndarray:
        """(N, C, H, W) in [0, 1] -> (N, 128) features from a FROZEN
        seed-stable random conv net (4 stride-2 conv + leaky-relu layers,
        global mean pool). The weights derive from a fixed PRNG seed —
        identical on every run and machine — so Fréchet scores are
        comparable ACROSS runs and priors, unlike the r2 proxy that used
        the EMA denoiser's own bottleneck (self-referential: scoring the
        generator with its own features)."""
        ws = _frozen_feature_weights()
        x = jnp.asarray(images, jnp.float32) * 2.0 - 1.0   # [0,1]->[-1,1]
        x = jnp.transpose(x, (0, 2, 3, 1))                  # NCHW -> NHWC
        feats = _frozen_feature_apply(ws, x)
        return np.asarray(feats)

    def _fid_score(self, milestone) -> float:
        """Fréchet distance between generated and real samples in a frozen
        seed-stable conv feature space (inception-free, cross-run
        comparable FID proxy)."""
        n = self.num_fid_samples
        ema = self.diffusion.with_params(self.ema_params)
        gen, done = [], 0
        while done < n:
            self._key, sub = jax.random.split(self._key)
            k = min(self.batch_size, n - done)
            gen.append(np.asarray(ema.sample(batch_size=k, key=sub)))
            done += k
        gen = np.concatenate(gen)
        real = self.dataset.sample_batch(self._np_rng, n)
        f_gen = self._fid_features(gen)
        f_real = self._fid_features(real)
        score = frechet_distance(f_gen, f_real)
        self.fid_scores.append({'step': self.step, 'milestone': milestone,
                                'fid_frozen': score})
        with open(self.results_folder / 'fid_scores.json', 'w') as f:
            json.dump(self.fid_scores, f, indent=2)
        return score

    def _sample_and_save(self, milestone):
        ema_diffusion = self.diffusion.with_params(self.ema_params)
        self._key, sub = jax.random.split(self._key)
        samples = ema_diffusion.sample(batch_size=self.num_samples, key=sub)
        np.save(self.results_folder / f'sample-{milestone}.npy',
                np.asarray(samples))
        if self.calculate_fid:
            score = self._fid_score(milestone)
            print(f'milestone {milestone}: fid_frozen {score:.4f}',
                  flush=True)
        self.save(milestone)
