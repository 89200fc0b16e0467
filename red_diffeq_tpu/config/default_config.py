"""Default configuration for the TPU-native RED-DiffEq framework.

Mirrors the reference configuration surface (reference:
red_diffeq/config/default_config.py:3-69) — six sections: pde, model,
diffusion, optimization, data, experiment — plus a TPU-specific `tpu`
section controlling the solver backend, precision and sharding mesh.
"""
import ml_collections


def get_config() -> ml_collections.ConfigDict:
    config = ml_collections.ConfigDict()

    # --- PDE / acquisition geometry (reference default_config.py:6-16) ---
    config.pde = ml_collections.ConfigDict()
    config.pde.n_grid = 70       # physics grid size (square unless ng differs)
    config.pde.nt = 1000         # number of FD time steps
    config.pde.dx = 10.0         # grid spacing [m]
    config.pde.dt = 0.001        # time step [s]
    config.pde.nbc = 120         # absorbing sponge width [cells]
    config.pde.f = 15.0          # Ricker peak frequency [Hz]
    config.pde.sz = 10           # source depth [m]
    config.pde.gz = 10           # receiver depth [m]
    config.pde.ng = 70           # number of receivers
    config.pde.ns = 5            # number of sources (shots)

    # --- Denoiser U-Net (reference default_config.py:18-22) ---
    config.model = ml_collections.ConfigDict()
    config.model.dim = 64
    config.model.dim_mults = (1, 2, 4, 8)
    config.model.flash_attn = False
    config.model.channels = 1

    # --- Diffusion schedule (reference default_config.py:24-29) ---
    config.diffusion = ml_collections.ConfigDict()
    config.diffusion.image_size = 72
    config.diffusion.timesteps = 1000
    config.diffusion.sampling_timesteps = 250
    config.diffusion.objective = 'pred_noise'
    config.diffusion.model_path = 'pretrained_models/model-4.ckpt'

    # --- Inversion optimization (reference default_config.py:31-44) ---
    config.optimization = ml_collections.ConfigDict()
    config.optimization.lr = 0.03
    config.optimization.ts = 300
    config.optimization.diffusion_ts = 1
    config.optimization.regularization = 'diffusion'
    config.optimization.reg_lambda = 0.75
    config.optimization.use_time_weight = False
    # Maximum timestep for diffusion regularization (None = model's max).
    config.optimization.fixed_timestep = None
    config.optimization.sigma = 10.0
    config.optimization.sigma_x0 = 0.0001
    config.optimization.initial_type = 'smoothed'
    config.optimization.noise_std = 0.0
    config.optimization.noise_type = 'gaussian'
    config.optimization.missing_number = 0

    # --- Data (reference default_config.py:46-51) ---
    config.data = ml_collections.ConfigDict()
    config.data.seismic_data_dir = 'dataset/OpenFWI/Seismic_Data/'
    config.data.velocity_data_dir = 'dataset/OpenFWI/Velocity_Data/'
    config.data.batch_size = 1
    config.data.data_pattern = '*.npy'
    config.data.use_mmap = True

    # --- Experiment (reference default_config.py:53-59) ---
    config.experiment = ml_collections.ConfigDict()
    config.experiment.name = 'red_diffeq_default'
    config.experiment.results_dir = 'experiment/'
    config.experiment.save_intermediate = False
    config.experiment.log_interval = 10
    config.experiment.save_metrics = True
    config.experiment.random_seed = None

    # --- TPU-specific knobs (new; no reference equivalent) ---
    config.tpu = ml_collections.ConfigDict()
    # 'pallas' = fused multi-step VMEM-resident stencil kernel;
    # 'xla'    = pure lax.scan + jnp stencil (portable, runs on CPU).
    # 'auto'   = pallas on TPU, xla elsewhere.
    config.tpu.solver_backend = 'auto'
    # Time steps fused per Pallas kernel invocation / remat chunk.
    config.tpu.solver_chunk = 20
    # Rematerialization policy for the adjoint: 'chunk' saves the wavefield
    # carry only at chunk boundaries (O(nt / chunk) memory).
    config.tpu.remat = True
    # Mesh axis sizes; data axis shards the sample batch, shot axis shards
    # sources. (1, 1) = single chip.
    config.tpu.mesh_data = 1
    config.tpu.mesh_shot = 1
    # bf16 for the U-Net forward pass (schedule math stays fp32).
    config.tpu.bf16_unet = False

    return config


def get_marmousi_config() -> ml_collections.ConfigDict:
    """Marmousi preset (reference default_config.py:63-69)."""
    config = get_config()
    config.data.seismic_data_dir = 'dataset/Marmousi/Seismic_Data/'
    config.data.velocity_data_dir = 'dataset/Marmousi/Velocity_Data/'
    config.data.batch_size = 1
    config.experiment.name = 'marmousi_inversion'
    return config
