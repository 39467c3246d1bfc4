from .flags import *  # noqa: F401,F403
from .batch import ReadBatch  # noqa: F401
