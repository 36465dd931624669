from .containers import (  # noqa: F401
    CRAWLING_REWARDS,
    TRAJECTORY_TRACKING_REWARDS,
    RewardCtx,
    get_container,
)
