from red_diffeq_tpu.core.inversion import InversionEngine, make_inversion_step
from red_diffeq_tpu.core.losses import observation_loss, total_loss
from red_diffeq_tpu.core.metrics import MetricsCalculator, calculate_metrics
