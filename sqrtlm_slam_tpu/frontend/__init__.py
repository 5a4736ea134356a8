"""Visual frontend: ORB extraction, Hamming matching, BoW place recognition."""

from . import matching, orb
from .orb import Keypoints, ORBConfig

__all__ = ["orb", "matching", "Keypoints", "ORBConfig"]
