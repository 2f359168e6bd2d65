from pysparkflow.engine.acceptor import GreedyAcceptor, loop_erase
from pysparkflow.engine.metrics import RoundMetrics

__all__ = ["GreedyAcceptor", "loop_erase", "RoundMetrics"]
