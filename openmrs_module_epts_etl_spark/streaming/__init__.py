from .runner import ProgressLedger, StreamingCdcRunner
from .stateful import conversation_progress, progress_oracle

__all__ = ["ProgressLedger", "StreamingCdcRunner", "conversation_progress", "progress_oracle"]
