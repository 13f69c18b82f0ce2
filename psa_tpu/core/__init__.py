"""Core data structures and the SED engine."""
from .trajectory import Trajectory
from .sed import SED, average_seds
from .calculator import SEDCalculator

__all__ = ["Trajectory", "SED", "SEDCalculator", "average_seds"]
