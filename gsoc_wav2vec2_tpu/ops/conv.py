"""1-D convolutions for the waveform front-end and positional embedding.

JAX equivalents of the reference's Keras `Conv1D` and the torch-style
weight-normalised grouped conv (`/root/reference/src/wav2vec2/
tensorflow_addons.py:5-58`, `encoder.py:153-193`).

Layout convention: activations are (B, T, C) ("NWC") and kernels are
(K, C_in // groups, C_out) ("WIO") — the TF Conv1D layout, which maps
directly onto `lax.conv_general_dilated` and keeps the torch→JAX weight
converter a pure transpose.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .basic import gelu


def conv1d(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: int = 1,
    padding="VALID",
    groups: int = 1,
) -> jax.Array:
    """Strided 1-D convolution, (B, T, C_in) -> (B, T', C_out)."""
    y = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride,),
        padding=padding,
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def weight_norm_kernel(weight_v: jax.Array, weight_g: jax.Array) -> jax.Array:
    """Recompose a conv kernel from its weight-norm decomposition.

    `kernel = l2_normalize(weight_v, axes=(1, 2)) * weight_g` with
    `weight_v` of shape (K, C_in // groups, C_out) and `weight_g` of shape
    (K, 1, 1): each kernel-position slice is normalised over the channel
    axes.  This matches `torch.nn.utils.weight_norm(conv, dim=2)` after the
    (2, 1, 0) transpose into TF layout — reference
    `tensorflow_addons.py:16-21,36-48` and `convert_torch_to_tf.py:114-115`,
    verified by the reference's `tests/test_wav2vec2.py:239-282`.
    """
    v32 = weight_v.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(v32), axis=(1, 2), keepdims=True))
    return (v32 / norm * weight_g.astype(jnp.float32)).astype(weight_v.dtype)


def init_weight_g(weight_v: jax.Array) -> jax.Array:
    """`weight_g` initialiser: the per-kernel-position norm of `weight_v`.

    Reference `tensorflow_addons.py:36-48`.
    """
    v32 = weight_v.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(v32), axis=(1, 2), keepdims=True))
    return norm.astype(weight_v.dtype)


def pos_conv_embed(
    x: jax.Array,
    params: dict,
    kernel_size: int,
    groups: int,
    is_gelu_approx: bool = False,
    training: bool = False,
    mesh=None,
    use_pallas: bool = True,
) -> jax.Array:
    """Convolutional relative positional embedding.

    Weight-normed grouped conv (kernel 128, 16 groups), symmetric pad of
    `kernel // 2` on the time axis, crop of the trailing timestep when the
    kernel is even, then GELU.  Reference `encoder.py:153-181` (the crop is
    the `is_padding_wrong` branch at :175-180).  The caller adds the result
    to the hidden states (`encoder.py:265`).

    On TPU in bf16 the grouped conv runs as a Pallas im2col kernel
    (`ops/pallas/pos_conv.py`) — XLA's grouped-conv lowering is the single
    least efficient op of the forward pass (~7% MXU).  Training uses the
    kernel's custom-VJP variant (`pos_conv_fused_train`): dx and dW are the
    same im2col structure, so stage 2 (pos conv trainable) avoids XLA's
    grouped conv in both directions.  Multi-device meshes keep the XLA
    path (GSPMD cannot partition the opaque custom call).
    """
    import os

    kernel = weight_norm_kernel(params["weight_v"], params["weight_g"])
    if (
        use_pallas
        and jax.default_backend() == "tpu"
        and x.dtype == jnp.bfloat16
        and kernel_size % 2 == 0
        # under a multi-device mesh GSPMD would gather the opaque custom
        # call onto every device; the XLA conv partitions fine there
        and (mesh is None or mesh.size == 1)
        and os.environ.get("W2V2_FUSED_POS_CONV", "1") != "0"
    ):
        from .pallas.pos_conv import (
            TAP_BLOCK,
            pos_conv_blocked,
            pos_conv_fused,
            pos_conv_fused_train,
            supports_length,
        )

        if kernel_size % TAP_BLOCK == 0 and x.shape[-1] % groups == 0:
            gelu_approx = is_gelu_approx or x.dtype == jnp.bfloat16
            if not supports_length(x.shape[1]):
                # the im2col window lives whole in VMEM per (batch, group);
                # past MAX_T the time-blocked driver runs the same kernel
                # per tile with k/2-frame halos (bitwise-identical rows)
                if training and params.get("bias") is None:
                    pass  # biasless training path stays on XLA below
                else:
                    return pos_conv_blocked(
                        x, kernel, params.get("bias"),
                        kernel_size=kernel_size, groups=groups,
                        gelu_approx=gelu_approx, training=training,
                    )
            elif not training:
                return pos_conv_fused(
                    x, kernel, params.get("bias"),
                    kernel_size=kernel_size, groups=groups,
                    gelu_approx=gelu_approx,
                )
            elif params.get("bias") is not None:
                return pos_conv_fused_train(
                    x, kernel, params["bias"],
                    kernel_size=kernel_size, groups=groups,
                    gelu_approx=gelu_approx,
                )
    pad = kernel_size // 2
    y = conv1d(
        x,
        kernel,
        bias=params.get("bias"),
        stride=1,
        padding=((pad, pad),),
        groups=groups,
    )
    if kernel_size % 2 == 0:
        y = y[:, :-1, :]
    return gelu(y, approximate=is_gelu_approx)
