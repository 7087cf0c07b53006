from moip_aira_tpu.parallel.symgroup import sym_perms, max_workers

__all__ = ["sym_perms", "max_workers"]
