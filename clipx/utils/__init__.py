from clipx.utils.profiling import StageTimers, device_trace  # noqa: F401
from clipx.utils.locking import SingleWriterLock, LockHeldError  # noqa: F401
