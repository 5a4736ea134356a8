from .timing import StageTimer, TicToc  # noqa: F401
from .config import SequenceConfig, kitti_sequence_config  # noqa: F401
