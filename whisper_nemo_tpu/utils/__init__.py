from .cleanup import cleanup
from .logging import get_logger

__all__ = ["cleanup", "get_logger"]
