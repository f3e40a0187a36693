from temporalalignnet_tpu.utils.logging import MetricsWriter, device_memory_stats
from temporalalignnet_tpu.utils.meters import AverageMeter, ProgressMeter
from temporalalignnet_tpu.utils.profiling import StepBreakdown, StepTimer, trace

__all__ = [
    "MetricsWriter",
    "device_memory_stats",
    "AverageMeter",
    "ProgressMeter",
    "StepBreakdown",
    "StepTimer",
    "trace",
]
