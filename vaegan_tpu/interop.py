"""torch <-> tpu-vaegan weight interop.

BASELINE.json requires output fidelity to the PyTorch reference image-for-image at
fixed seeds. PyTorch's RNG streams (kaiming init, randn_like, dropout) cannot be
reproduced with jax.random, so exact parity is achieved by *importing* torch-side
tensors (SURVEY.md §7 hard-part 4): train or init the reference modules in torch,
export ``state_dict()``, convert here, and the JAX forward matches to float tolerance.

Layout conversions (torch -> ours):
- Conv2d weight (O, I, KH, KW)          -> HWIO (KH, KW, I, O)
- ConvTranspose2d weight (I, O, KH, KW) -> HWIO (KH, KW, I, O)
- Linear weight (out, in)               -> (in, out)
- the first linear after the critic's flatten additionally permutes its input rows
  from torch's (C, H, W) flatten order to our NHWC (H, W, C) order
- BatchNorm2d weight/bias/running_mean/running_var -> scale/bias + batch_stats
- spectral_norm's weight_orig/weight_u/weight_v -> kernel + spectral {u, v}
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np


def conv_weight(w: np.ndarray) -> np.ndarray:
    """(O, I, KH, KW) -> (KH, KW, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def conv_transpose_weight(w: np.ndarray) -> np.ndarray:
    """(I, O, KH, KW) -> (KH, KW, I, O)."""
    return np.transpose(w, (2, 3, 0, 1))


def linear_weight(w: np.ndarray, pool_shape: Optional[Tuple[int, int, int]] = None) -> np.ndarray:
    """(out, in) -> (in, out). ``pool_shape=(C, H, W)`` permutes the input rows of a
    linear that consumes a flattened conv map (torch flattens C,H,W; we flatten H,W,C).
    """
    if pool_shape is not None:
        c, h, w_ = pool_shape
        w = w.reshape(w.shape[0], c, h, w_).transpose(0, 2, 3, 1).reshape(w.shape[0], -1)
    return np.ascontiguousarray(w.T)


def _to_np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return np.copy(t)
    # torch tensor without importing torch. Copy: .numpy() returns a VIEW of the
    # torch buffer, and jnp.asarray on the CPU backend can alias that memory —
    # a later in-place torch op (e.g. spectral norm's out= power iteration) would
    # silently mutate the converted array.
    return np.copy(t.detach().cpu().numpy())


def _set(tree: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def torch_state_dict_to_variables(
    state_dict: Mapping[str, Any],
    *,
    name_map: Optional[Mapping[str, str]] = None,
    first_linear: Optional[str] = None,
    pool_shape: Optional[Tuple[int, int, int]] = None,
) -> Dict[str, Any]:
    """Convert a torch ``state_dict`` into flax-style variable collections.

    torch module paths map onto our module names; dots become tree levels. The
    reference uses ``Sequential`` shortcuts (``shortcut.0`` conv / ``shortcut.1``
    BN, README.md:150-153) which map to our ``shortcut_conv`` / ``shortcut_bn``.

    Args:
        state_dict: torch name -> tensor.
        name_map: optional exact-name rewrites applied before the generic rules.
        first_linear: module path (ours) of the linear consuming the flattened conv
            map, e.g. ``"linear_1"``; its weight gets the ``pool_shape`` row permute.
        pool_shape: (C, H, W) of the tensor that was flattened into that linear.

    Returns: ``{"params": ..., "batch_stats": ..., "spectral": ...}`` (collections
    present only if non-empty).
    """
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    spectral: Dict[str, Any] = {}

    items = {}
    for k, v in state_dict.items():
        if name_map and k in name_map:
            k = name_map[k]
        k = k.replace("shortcut.0", "shortcut_conv").replace("shortcut.1", "shortcut_bn")
        items[k] = _to_np(v)

    for key, val in items.items():
        path = tuple(key.split("."))
        mod, leaf = path[:-1], path[-1]
        if leaf == "num_batches_tracked":
            continue
        if leaf in ("weight", "weight_orig"):
            if val.ndim == 4:
                # conv vs conv-transpose: torch convT weights are (I, O, KH, KW)
                # but shapes alone can't distinguish square kernels, so use the
                # reference's structure: ONLY conv1 and the shortcut conv of an
                # upsample-mode block are ConvTranspose2d (README.md:156-160);
                # conv2 is a plain Conv2d even inside upsample blocks.
                in_upsample = any("upsample" in p for p in path)
                layer = path[-2] if len(path) >= 2 else ""
                transposed = in_upsample and layer in ("conv1", "shortcut_conv")
                if transposed:
                    _set(params, mod + ("kernel",), conv_transpose_weight(val))
                else:
                    _set(params, mod + ("kernel",), conv_weight(val))
            elif val.ndim == 2:
                ps = pool_shape if (first_linear and ".".join(mod).endswith(first_linear)) else None
                _set(params, mod + ("kernel",), linear_weight(val, ps))
            elif val.ndim == 1:  # BatchNorm weight
                _set(params, mod + ("scale",), val)
            else:
                raise ValueError(f"unexpected weight rank for {key}: {val.shape}")
        elif leaf == "bias":
            _set(params, mod + ("bias",), val)
        elif leaf == "running_mean":
            _set(batch_stats, mod + ("mean",), val)
        elif leaf == "running_var":
            _set(batch_stats, mod + ("var",), val)
        elif leaf == "weight_u":
            _set(spectral, mod + ("u",), val)
        elif leaf == "weight_v":
            _set(spectral, mod + ("v",), val)
        else:
            raise ValueError(f"unhandled state_dict entry {key!r}")

    out: Dict[str, Any] = {}
    if params:
        out["params"] = params
    if batch_stats:
        out["batch_stats"] = batch_stats
    if spectral:
        out["spectral"] = spectral
    return out


# --- reference-notebook state_dict layouts ----------------------------------
#
# The reference wraps its block dicts one module deeper than we do:
# ``UnsupervisedGeneratorNetwork.encoder`` is an ``Encoder`` whose own attribute
# ``encoder`` holds the Sequential(OrderedDict) of blocks (README.md:236 / 291),
# so generator keys read ``encoder.encoder.encoder-depth_0-level_0...``; its
# ``Discriminator.res_layers`` is a Sequential of per-stage Sequentials
# (README.md:453 / 488-498), so critic keys read ``res_layers.0.0...``. These map
# the keys onto our single-level module names before the generic conversion.

_RES_LAYERS_RE = re.compile(r"^res_layers\.(\d+)\.(\d+)\.")


def reference_generator_to_variables(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert the reference ``UnsupervisedGeneratorNetwork.state_dict()``."""
    mapped = {}
    for k, v in state_dict.items():
        if k.startswith("encoder.encoder."):
            k = "encoder." + k[len("encoder.encoder."):]
        elif k.startswith("decoder.decoder."):
            k = "decoder." + k[len("decoder.decoder."):]
        mapped[k] = v
    return torch_state_dict_to_variables(mapped)


def reference_discriminator_to_variables(
    state_dict: Mapping[str, Any], pool_shape: Tuple[int, int, int],
) -> Dict[str, Any]:
    """Convert the reference ``Discriminator.state_dict()``. ``pool_shape`` is the
    (C, H, W) of the avg-pool output feeding ``linear_1`` (flatten-order permute)."""
    mapped = {
        _RES_LAYERS_RE.sub(lambda m: f"res_layers_{m.group(1)}_{m.group(2)}.", k): v
        for k, v in state_dict.items()
    }
    return torch_state_dict_to_variables(
        mapped, first_linear="linear_1", pool_shape=pool_shape)


def reference_dropout_masks_to_collection(
    named_masks, kind: str,
) -> Dict[str, Any]:
    """Recorded torch dropout masks -> a flax ``masks`` collection.

    ``named_masks``: ordered ``(torch_module_path, mask)`` pairs as captured from
    ONE forward of the reference's generator (``kind="generator"``) or
    discriminator (``kind="discriminator"``) — mask is the NCHW 0/1 keep-mask the
    torch module actually applied (elementwise ``nn.Dropout`` full-shape, or
    ``nn.Dropout2d`` channel-shape (N, C, 1, 1), README.md:144/381). Returns the
    collection tree to pass as ``{"masks": ...}`` into ``apply`` (each
    :class:`vaegan_tpu.models.layers.Dropout` site reads its ``mask`` leaf
    instead of drawing, enabling dropout-ACTIVE one-step parity)."""
    tree: Dict[str, Any] = {}
    for name, mask in named_masks:
        if kind == "generator":
            if name.startswith("encoder.encoder."):
                name = "encoder." + name[len("encoder.encoder."):]
            elif name.startswith("decoder.decoder."):
                name = "decoder." + name[len("decoder.decoder."):]
        elif kind == "discriminator":
            name = _RES_LAYERS_RE.sub(
                lambda m: f"res_layers_{m.group(1)}_{m.group(2)}.", name)
        else:
            raise ValueError(f"unknown kind {kind!r}")
        m = _to_np(mask)
        if m.ndim != 4:
            raise ValueError(f"mask for {name} has rank {m.ndim}, expected 4")
        # NCHW -> NHWC (also maps torch's channel mask (N,C,1,1) to our (N,1,1,C))
        m = np.ascontiguousarray(m.transpose(0, 2, 3, 1)).astype(bool)
        _set(tree, tuple(name.split(".")) + ("mask",), m)
    return tree


# --- reverse direction: our variables -> torch state_dict --------------------

def conv_weight_inv(w: np.ndarray) -> np.ndarray:
    """(KH, KW, I, O) -> (O, I, KH, KW) — inverse of :func:`conv_weight`."""
    return np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))


def conv_transpose_weight_inv(w: np.ndarray) -> np.ndarray:
    """(KH, KW, I, O) -> (I, O, KH, KW) — inverse of
    :func:`conv_transpose_weight` (the (2, 3, 0, 1) permutation is involutive)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def linear_weight_inv(w: np.ndarray, pool_shape: Optional[Tuple[int, int, int]] = None) -> np.ndarray:
    """(in, out) -> (out, in) — inverse of :func:`linear_weight`, including the
    HWC->CHW flatten-row permute when ``pool_shape`` is given."""
    w = np.ascontiguousarray(w.T)
    if pool_shape is not None:
        c, h, w_ = pool_shape
        w = w.reshape(w.shape[0], h, w_, c).transpose(0, 3, 1, 2).reshape(w.shape[0], -1)
    return np.ascontiguousarray(w)


def _walk(tree: Mapping[str, Any], path: Tuple[str, ...], out: Dict[Tuple[str, ...], np.ndarray]) -> None:
    for k, v in tree.items():
        if isinstance(v, Mapping):
            _walk(v, path + (k,), out)
        else:
            out[path + (k,)] = np.asarray(v)


def variables_to_torch_state_dict(
    variables: Mapping[str, Any],
    *,
    first_linear: Optional[str] = None,
    pool_shape: Optional[Tuple[int, int, int]] = None,
    num_batches_tracked: int = 0,
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`torch_state_dict_to_variables`: flax-style variable
    collections -> a torch-layout ``state_dict`` (numpy values; pass through
    ``torch.from_numpy`` to load). Spectral-norm-wrapped kernels (module present
    in the ``spectral`` collection) emit ``weight_orig``/``weight_u``/``weight_v``;
    BatchNorm modules (present in ``batch_stats``) additionally emit
    ``num_batches_tracked`` so ``load_state_dict(strict=True)`` accepts the
    result. Module names are OUR names (``shortcut_conv`` etc.) — the
    ``reference_*_from_variables`` helpers rewrite them to the notebook's paths.

    ``num_batches_tracked``: our state does not track torch's BN step counter
    (it only matters under ``momentum=None`` cumulative averaging, which the
    reference never uses — its BNs run the default momentum=0.1). If you plan
    to CONTINUE TRAINING the export in torch with ``momentum=None``, pass a
    large count here: with the default 0, torch's first update weights the new
    batch 1/(0+1)=1.0 and overwrites the imported running statistics.
    """
    params: Dict[Tuple[str, ...], np.ndarray] = {}
    stats: Dict[Tuple[str, ...], np.ndarray] = {}
    spec: Dict[Tuple[str, ...], np.ndarray] = {}
    _walk(variables.get("params", {}), (), params)
    _walk(variables.get("batch_stats", {}), (), stats)
    _walk(variables.get("spectral", {}), (), spec)
    sn_mods = {p[:-1] for p in spec}
    bn_mods = {p[:-1] for p in stats}

    out: Dict[str, np.ndarray] = {}
    for path, val in params.items():
        mod, leaf = path[:-1], path[-1]
        name = ".".join(mod)
        if leaf == "kernel":
            wname = "weight_orig" if mod in sn_mods else "weight"
            if val.ndim == 4:
                # same structural rule as the forward mapping: only conv1 and the
                # shortcut conv of an upsample-mode block are ConvTranspose2d
                in_upsample = any("upsample" in p for p in mod)
                transposed = in_upsample and mod and mod[-1] in ("conv1", "shortcut_conv")
                w = conv_transpose_weight_inv(val) if transposed else conv_weight_inv(val)
            elif val.ndim == 2:
                ps = pool_shape if (first_linear and name.endswith(first_linear)) else None
                w = linear_weight_inv(val, ps)
            else:
                raise ValueError(f"unexpected kernel rank for {name}: {val.shape}")
            out[f"{name}.{wname}"] = w
        elif leaf == "scale":  # BatchNorm weight
            out[f"{name}.weight"] = val
        elif leaf == "bias":
            out[f"{name}.bias"] = val
        else:
            raise ValueError(f"unhandled params leaf {leaf!r} at {name}")
    for path, val in stats.items():
        mod, leaf = path[:-1], path[-1]
        name = ".".join(mod)
        key = {"mean": "running_mean", "var": "running_var"}.get(leaf)
        if key is None:
            raise ValueError(f"unhandled batch_stats leaf {leaf!r} at {name}")
        out[f"{name}.{key}"] = val
    for mod in bn_mods:
        out[".".join(mod) + ".num_batches_tracked"] = np.asarray(
            num_batches_tracked, np.int64)
    for path, val in spec.items():
        mod, leaf = path[:-1], path[-1]
        name = ".".join(mod)
        if leaf not in ("u", "v"):
            raise ValueError(f"unhandled spectral leaf {leaf!r} at {name}")
        out[f"{name}.weight_{leaf}"] = val
    return {k.replace("shortcut_conv", "shortcut.0").replace("shortcut_bn", "shortcut.1"): v
            for k, v in out.items()}


_RES_LAYERS_INV_RE = re.compile(r"^res_layers_(\d+)_(\d+)\.")


def reference_generator_from_variables(variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Our generator variables -> the reference
    ``UnsupervisedGeneratorNetwork.state_dict()`` key layout (the notebook nests
    its block Sequential one level deeper: ``encoder.encoder.*`` /
    ``decoder.decoder.*``, README.md:236/291)."""
    sd = variables_to_torch_state_dict(variables)
    out = {}
    for k, v in sd.items():
        if k.startswith("encoder."):
            k = "encoder.encoder." + k[len("encoder."):]
        elif k.startswith("decoder."):
            k = "decoder.decoder." + k[len("decoder."):]
        out[k] = v
    return out


def reference_discriminator_from_variables(
    variables: Mapping[str, Any], pool_shape: Tuple[int, int, int],
) -> Dict[str, np.ndarray]:
    """Our critic variables -> the reference ``Discriminator.state_dict()`` key
    layout (``res_layers.<stage>.<block>``, README.md:453/488-498)."""
    sd = variables_to_torch_state_dict(
        variables, first_linear="linear_1", pool_shape=pool_shape)
    return {_RES_LAYERS_INV_RE.sub(lambda m: f"res_layers.{m.group(1)}.{m.group(2)}.", k): v
            for k, v in sd.items()}


def critic_pool_shape(cfg) -> Tuple[int, int, int]:
    """(C, H, W) of the critic's avg-pool output for a :class:`Config` — the
    ``pool_shape`` the flatten-row permute needs (README.md:451-458)."""
    d, s = cfg.discriminator, cfg.data.image_size
    s = -(-s // d.num_stride_conv1)          # ceil-div: SAME/pad-1 stride conv
    for st in d.num_strides_res:
        s = -(-s // st)
    s //= d.pool_size                        # avg_pool2d floors
    return (d.num_features_res[-1], s, s)


def export_reference_state_dicts(cfg, state):
    """One-call export of a trained :class:`TrainState` to the reference
    notebook's ``state_dict`` layouts: ``(generator_sd, discriminator_sd)``,
    loadable into its ``UnsupervisedGeneratorNetwork`` / ``Discriminator`` with
    ``strict=True`` (wrap values in ``torch.from_numpy``)."""
    gen_sd = reference_generator_from_variables(
        {"params": state.g_params, "batch_stats": state.g_stats})
    disc_sd = reference_discriminator_from_variables(
        {"params": state.d_params, "batch_stats": state.d_stats,
         "spectral": state.d_spectral},
        pool_shape=critic_pool_shape(cfg))
    return gen_sd, disc_sd


def _graft(template_tree, imported_tree, what: str):
    """Replace ``template_tree``'s leaves with ``imported_tree``'s, enforcing
    identical structure and shapes (clear errors beat orbax restore mismatches
    three commands later)."""
    import jax

    t_struct = jax.tree_util.tree_structure(template_tree)
    i_struct = jax.tree_util.tree_structure(imported_tree)
    if t_struct != i_struct:
        t_paths = {jax.tree_util.keystr(p) for p, _ in
                   jax.tree_util.tree_flatten_with_path(template_tree)[0]}
        i_paths = {jax.tree_util.keystr(p) for p, _ in
                   jax.tree_util.tree_flatten_with_path(imported_tree)[0]}
        raise ValueError(
            f"{what}: imported tree does not match the config's model structure; "
            f"missing={sorted(t_paths - i_paths)[:8]} "
            f"unexpected={sorted(i_paths - t_paths)[:8]} "
            f"(is --preset/--config the architecture this state_dict came from?)")
    def leaf(t, i):
        i = np.asarray(i)
        if tuple(t.shape) != tuple(i.shape):
            raise ValueError(
                f"{what}: shape mismatch {tuple(i.shape)} vs expected "
                f"{tuple(t.shape)} — wrong architecture config for this state_dict")
        return i.astype(t.dtype)
    return jax.tree.map(leaf, template_tree, imported_tree)


def import_reference_state_dicts(cfg, gen_sd: Mapping[str, Any],
                                 disc_sd: Optional[Mapping[str, Any]] = None):
    """Build a :class:`TrainState` from the reference notebook's ``state_dict``
    layouts (the inverse of :func:`export_reference_state_dicts`).

    ``gen_sd`` is ``UnsupervisedGeneratorNetwork.state_dict()``; ``disc_sd`` is
    ``Discriminator.state_dict()`` (optional — the reference's experiment only
    returns the trained generator, README.md:935, so a critic may not exist; a
    fresh-initialized critic is kept in that case). Optimizer states are fresh
    (torch optimizer internals are not portable) and ``step`` starts at 0."""
    import jax

    from vaegan_tpu.train.state import create_train_state

    template = create_train_state(
        cfg, jax.random.key(cfg.train.seed, impl=cfg.train.rng_impl))
    gv = reference_generator_to_variables(gen_sd)
    state = template.replace(
        g_params=_graft(template.g_params, gv["params"], "generator params"),
        g_stats=_graft(template.g_stats, gv.get("batch_stats", {}),
                       "generator batch_stats"),
    )
    if state.g_ema is not None:
        state = state.replace(g_ema=jax.tree.map(np.copy, state.g_params))
    if disc_sd is not None:
        dv = reference_discriminator_to_variables(
            disc_sd, pool_shape=critic_pool_shape(cfg))
        state = state.replace(
            d_params=_graft(template.d_params, dv["params"], "critic params"),
            d_stats=_graft(template.d_stats, dv.get("batch_stats", {}),
                           "critic batch_stats"),
            d_spectral=_graft(template.d_spectral, dv.get("spectral", {}),
                              "critic spectral (u, v)"),
        )
    return state
