from vsr_tpu.models.propainter.raft import RAFT, raft_bi_flows
from vsr_tpu.models.propainter.flow_completion import RecurrentFlowCompleteNet

__all__ = ["RAFT", "raft_bi_flows", "RecurrentFlowCompleteNet"]
