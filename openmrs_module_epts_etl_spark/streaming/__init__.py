from .runner import StreamingCdcRunner
from .stateful import conversation_progress, progress_oracle

__all__ = ["StreamingCdcRunner", "conversation_progress", "progress_oracle"]
