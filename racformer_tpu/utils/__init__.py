from .logging import MetricLogger, init_logging
