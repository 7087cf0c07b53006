from moip_aira_tpu.solver.status import SolveStatus

__all__ = ["SolveStatus"]
