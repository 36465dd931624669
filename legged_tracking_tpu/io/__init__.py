from .checkpoint import export_policy_npz, restore_checkpoint, save_checkpoint  # noqa: F401
