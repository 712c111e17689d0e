from vaegan_tpu.utils.imaging import save_image_grid
from vaegan_tpu.utils.metrics import JsonlSink, MetricsLogger, StdoutSink

__all__ = ["MetricsLogger", "StdoutSink", "JsonlSink", "save_image_grid"]
