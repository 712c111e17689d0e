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

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

_DN = lax.conv_dimension_numbers  # cached builder


def _pair(v: Union[int, Tuple[int, int]]) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)  # type: ignore[return-value]


# opt-in alternative lowering for k4/s2/p1 transposed convs (see conv_transpose2d)
PHASE_DECOMPOSE_CONV_TRANSPOSE = False


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

    On TPU the input-dilated form burns s*s MXU work on zeros, so when the output
    size decomposes cleanly this lowers as a *phase decomposition* instead: one
    stride-1 conv per output phase (each seeing only the kernel taps that actually
    touch it) followed by a depth-to-space interleave — identical sums, regrouped,
    zero wasted MXU cycles.

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
    if (PHASE_DECOMPOSE_CONV_TRANSPOSE and (sh, sw) == (2, 2) and (kh, kw) == (4, 4)
            and (ph, pw) == (1, 1) and (oph, opw) == (0, 0)):
        # measured on v5e: XLA's own dilated-conv lowering already avoids the zero
        # work, and the explicit interleave costs an extra memory pass — so this
        # stays opt-in (kept for other topologies / future shapes).
        return _conv_transpose_phase2(x, kernel, preferred_dtype)
    # general fallback: lhs-dilated cross-correlation with the flipped kernel
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


def _conv_transpose_phase2(x: jax.Array, kernel: jax.Array,
                           preferred_dtype: Optional[jnp.dtype]) -> jax.Array:
    """k=4, s=2, p=1 transposed conv as 4 phase convs + interleave (exact).

    Derivation (1-D, per axis): with the flipped kernel g[t] = w[3-t], output
    y[i] = sum_t g[t] * xd[i + t] where xd is x dilated by 2 and padded by
    (k-1-p) = 2 on each side; xd[j] = x[(j-2)/2] when j even (0-based), else 0.
    For even output i = 2m: contributing taps are t in {0, 2} ->
        y[2m] = g[0] x[m-1+... ] ... concretely y[2m] = g[0]*x[m-1]? Work in code:
        j = i + t must satisfy (j - 2) even and 0 <= (j-2)/2 < H.
        i=2m: t=0 -> j=2m -> x[m-1]; t=2 -> j=2m+2 -> x[m].
        i=2m+1: t=1 -> j=2m+2 -> x[m]; t=3 -> j=2m+4 -> x[m+1].
    So the even phase is a stride-1 size-2 conv with taps (g0, g2) over (x[m-1], x[m])
    and the odd phase with taps (g1, g3) over (x[m], x[m+1]). In 2-D this becomes
    4 phase kernels of shape (2, 2, I, O) with per-phase asymmetric padding.
    """
    g = jnp.flip(kernel, axis=(0, 1))  # (4, 4, I, O)
    n, h, w, _ = x.shape
    dn = _DN(x.shape, (2, 2) + kernel.shape[2:], ("NHWC", "HWIO", "NHWC"))

    # taps and paddings per phase: even uses rows/cols {0, 2} with pad (1, 0)
    # (x[m-1], x[m]); odd uses {1, 3} with pad (0, 1) (x[m], x[m+1]).
    idx = {0: jnp.array([0, 2]), 1: jnp.array([1, 3])}
    pad = {0: (1, 0), 1: (0, 1)}
    phases = []
    for pr in (0, 1):
        row = jnp.take(g, idx[pr], axis=0)
        for pc in (0, 1):
            kk = jnp.take(row, idx[pc], axis=1)  # (2, 2, I, O)
            y = lax.conv_general_dilated(
                x, kk, window_strides=(1, 1),
                padding=(pad[pr], pad[pc]),
                dimension_numbers=dn,
                preferred_element_type=preferred_dtype,
            )
            phases.append(y)
    o = phases[0].shape[-1]
    # interleave: phases ordered (even,even), (even,odd), (odd,even), (odd,odd)
    stacked = jnp.stack(phases, axis=3).reshape(n, h, w, 2, 2, o)
    out = jnp.transpose(stacked, (0, 1, 3, 2, 4, 5)).reshape(n, 2 * h, 2 * w, o)
    return out


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
