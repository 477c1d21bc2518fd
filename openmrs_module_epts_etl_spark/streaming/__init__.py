from .runner import StreamingCdcRunner

__all__ = ["StreamingCdcRunner"]
