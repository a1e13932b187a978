from ccmh.utils.logger import get_logger, MetricsWriter

__all__ = ["get_logger", "MetricsWriter"]
