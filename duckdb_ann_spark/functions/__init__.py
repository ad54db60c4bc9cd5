from .distance import *  # noqa: F401,F403
