from .attention import mask_to_bias, mha, mha_xla
from .basic import dense, dropout, gelu, group_norm, layer_norm, stochastic_depth
from .conv import conv1d, pos_conv_embed, weight_norm_kernel
from .ctc import CTCLoss, ctc_loss_fn
from .specaugment import apply_spec_augmentation, compute_mask_indices

__all__ = [
    "mha",
    "mha_xla",
    "mask_to_bias",
    "dense",
    "dropout",
    "gelu",
    "group_norm",
    "layer_norm",
    "stochastic_depth",
    "conv1d",
    "pos_conv_embed",
    "weight_norm_kernel",
    "CTCLoss",
    "ctc_loss_fn",
    "apply_spec_augmentation",
    "compute_mask_indices",
]
