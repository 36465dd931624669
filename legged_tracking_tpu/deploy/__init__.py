from .lcm_lite import LCMLite, LCMType  # noqa: F401
from .policy_runtime import PolicyRuntime  # noqa: F401
