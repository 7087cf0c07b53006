from moip_aira_tpu.engine.worker_spec import Cell, LockGroup, WorkerSpec
from moip_aira_tpu.engine.scheduler import Scheduler

__all__ = ["Cell", "LockGroup", "WorkerSpec", "Scheduler"]
