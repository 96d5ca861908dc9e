from densepoints_tpu.utils.logging import StageMetrics, log
