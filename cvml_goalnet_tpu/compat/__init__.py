"""Migration compatibility: import reference-format PyTorch checkpoints."""

from cvml_goalnet_tpu.compat.torch_import import import_reference_state_dict

__all__ = ["import_reference_state_dict"]
