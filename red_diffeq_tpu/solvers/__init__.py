from red_diffeq_tpu.solvers.acoustic import (
    FWIForward, Geometry, forward_modeling, ricker, sponge_profile,
)
