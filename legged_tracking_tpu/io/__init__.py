from .checkpoint import export_policy_npz  # noqa: F401
