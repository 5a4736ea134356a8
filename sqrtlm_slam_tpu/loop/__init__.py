from .database import KeyFrameDatabase  # noqa: F401
from .closing import LoopCloser, LoopClosingConfig  # noqa: F401
