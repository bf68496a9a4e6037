from . import conv_frontend, flash_attention

__all__ = ["flash_attention", "conv_frontend"]
