"""Convolution primitives lowered for the TPU MXU.

Layout is NHWC activations / HWIO kernels throughout — the native layouts for XLA:TPU,
which tile the channel contraction onto the 128x128 systolic array without transposes
(the torch reference is NCHW/OIHW; see reference README.md:148-170).

``conv_transpose2d`` is lowered as ``lax.conv_general_dilated`` with *lhs dilation*
and a spatially flipped kernel rather than ``lax.conv_transpose``: input dilation is
the form the TPU conv emitter pattern-matches best, and it reproduces
``torch.nn.ConvTranspose2d`` semantics exactly (needed for parity with the reference's
4x4-stride-2 upsample blocks, README.md:156-160).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

_DN = lax.conv_dimension_numbers  # cached builder


def _pair(v: Union[int, Tuple[int, int]]) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)  # type: ignore[return-value]


def conv2d(
    x: jax.Array,
    kernel: jax.Array,
    stride: Union[int, Tuple[int, int]] = 1,
    padding: Union[int, Tuple[int, int]] = 0,
    preferred_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """2-D cross-correlation, matching ``torch.nn.functional.conv2d``.

    Args:
        x: (N, H, W, C_in) activations.
        kernel: (KH, KW, C_in, C_out) filter (HWIO).
        stride / padding: int or (h, w) pair; symmetric zero padding like torch.
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dn = _DN(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=dn,
        preferred_element_type=preferred_dtype,
    )


def conv_transpose2d(
    x: jax.Array,
    kernel: jax.Array,
    stride: Union[int, Tuple[int, int]] = 2,
    padding: Union[int, Tuple[int, int]] = 1,
    output_padding: Union[int, Tuple[int, int]] = 0,
    preferred_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """2-D transposed convolution matching ``torch.nn.ConvTranspose2d``.

    torch's transposed conv with (k, s, p) is the gradient of a conv; expressed
    directly it is: dilate the input by s (insert s-1 zeros between elements), pad
    spatially with (k-1-p) low / (k-1-p+output_padding) high, and cross-correlate with
    the spatially *flipped* kernel whose in/out channels are swapped.

    Args:
        x: (N, H, W, C_in).
        kernel: (KH, KW, C_in, C_out) — note: stored in the *forward* orientation;
            this function performs the flip. Output spatial size is
            (H-1)*s - 2p + k + output_padding (torch formula).
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    oph, opw = _pair(output_padding)
    kh, kw = kernel.shape[0], kernel.shape[1]
    # flip spatial taps; keep HWIO layout (in=latent channels contract).
    k = jnp.flip(kernel, axis=(0, 1))
    dn = _DN(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    pad_h = (kh - 1 - ph, kh - 1 - ph + oph)
    pad_w = (kw - 1 - pw, kw - 1 - pw + opw)
    return lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding=(pad_h, pad_w),
        lhs_dilation=(sh, sw),
        dimension_numbers=dn,
        preferred_element_type=preferred_dtype,
    )


def avg_pool(x: jax.Array, window: int, stride: Optional[int] = None) -> jax.Array:
    """Average pooling matching ``torch.nn.functional.avg_pool2d(x, window)``:
    VALID padding (floors odd sizes), stride defaults to the window size
    (reference README.md:471 uses window 4).

    For the common stride == window case this lowers as crop + reshape + mean,
    which XLA:TPU fuses into a single VPU pass and differentiates cleanly
    (``lax.reduce_window`` with a generic computation has no reverse-mode rule).
    """
    stride = window if stride is None else stride
    n, h, w, c = x.shape
    if stride == window:
        oh, ow = h // window, w // window
        x = x[:, : oh * window, : ow * window, :]
        x = x.reshape(n, oh, window, ow, window, c)
        return jnp.mean(x, axis=(2, 4))
    summed = lax.reduce_window(
        x,
        jnp.zeros((), x.dtype),
        lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )
    return summed / jnp.asarray(window * window, x.dtype)
