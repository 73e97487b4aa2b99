from ray_tracing_octrees_tpu.utils.logging import get_logger
from ray_tracing_octrees_tpu.utils.profiling import FrameProfiler, StageTimer

__all__ = ["get_logger", "FrameProfiler", "StageTimer"]
