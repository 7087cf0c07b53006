from moip_aira_tpu.core.store import Result, Solutions

__all__ = ["Result", "Solutions"]
