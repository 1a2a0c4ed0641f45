"""Fused QLoRA: pack param trees into FlexLinear's quant/lora collections.

The memory-scalable LoRA formulation (vs the merge-based one in
`models/lora.py`): the frozen base is stored int8 (or bf16) in a
``quant`` collection, trainable low-rank factors live in a ``lora``
collection, and every FlexLinear computes
``x @ dequant(W) + (x @ a) @ b`` locally — no whole-model effective
weight set ever exists (RESULTS.md 7B finding).

Apply shape::

    residual, quant = pack_qlora_frozen(params, targets=spec.target_modules)
    lora = init_qlora_factors(rng, params, spec)
    out = model.apply({"params": residual, "quant": quant, "lora": lora}, ...)
    # differentiate w.r.t. `lora` only

Also: `init_params_leafwise` — materialize + quantize a big model's
random init one leaf at a time (fp32 whole-tree init of 7B is 28 GB;
leafwise peak is one kernel).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dalm_tpu.models.lora import LoraSpec, _target_kernel_paths
from dalm_tpu.models.quant import quantize_tensor, quantize_tensor_int4

logger = logging.getLogger(__name__)


def _walk_kernels(params: Any, path=()):
    """Yield (path_tuple, leaf) for every 2-D 'kernel' leaf."""
    if isinstance(params, dict):
        for k, v in params.items():
            if k == "kernel" and hasattr(v, "ndim") and v.ndim == 2:
                yield path + (k,), v
            else:
                yield from _walk_kernels(v, path + (k,))


def _set(tree: dict, path: tuple, value) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _del(tree: dict, path: tuple) -> None:
    node = tree
    for k in path[:-1]:
        node = node[k]
    del node[path[-1]]
    # prune empty parents
    def prune(t):
        if not isinstance(t, dict):
            return False
        for k in list(t):
            if prune(t[k]):
                del t[k]
        return len(t) == 0

    prune(tree)


def pack_qlora_frozen(
    params: Any,
    quantize: "bool | str" = True,
    min_size: int = 4096,
) -> Tuple[dict, dict]:
    """Move every large 2-D kernel out of ``params`` into a ``quant`` tree.

    Returns (residual_params, quant_tree). Kernels smaller than
    ``min_size`` elements (and all non-kernel leaves) stay in params.
    The quant tree stores int8+scale under the kernel's module path
    (``quantize=False`` → bf16 storage, bnb-less frozen-base mode;
    ``quantize="int4"`` → nibble-packed int4 with per-group scales —
    the serving-storage tier, half int8's HBM bytes;
    ``quantize="nf4"`` → same packing decoded through the NormalFloat4
    codebook — bitsandbytes-parity 4-bit quality,
    `/root/reference/dalm/models/retriever_only_base_model.py:85-91`).
    """

    residual = jax.tree.map(lambda x: x, params)  # shallow-structured copy
    residual = jax.device_get(residual) if False else _deep_dict(residual)
    quant: dict = {}
    n = 0
    for path, kernel in list(_walk_kernels(params)):
        if kernel.size < min_size:
            continue
        module_path = path[:-1]  # strip "kernel"
        if quantize in ("int4", "nf4", "int4pc"):
            if quantize == "nf4":
                from dalm_tpu.models.quant import quantize_tensor_nf4

                qt = quantize_tensor_nf4(jnp.asarray(kernel))
                _set(quant, module_path + ("nf4",), qt["nf4"])
            elif quantize == "int4pc":
                from dalm_tpu.models.quant import quantize_tensor_int4pc

                qt = quantize_tensor_int4pc(jnp.asarray(kernel))
                _set(quant, module_path + ("pcol",), qt["pcol"])
            else:
                qt = quantize_tensor_int4(jnp.asarray(kernel))
            _set(quant, module_path + ("q4",), qt["q4"])
            _set(quant, module_path + ("scale4",), qt["scale4"])
        elif quantize:
            qt = quantize_tensor(jnp.asarray(kernel))
            _set(quant, module_path + ("q",), qt["__int8__"])
            _set(quant, module_path + ("scale",), qt["scale"])
        else:
            _set(quant, module_path + ("w",), jnp.asarray(kernel, jnp.bfloat16))
        _del(residual, path)
        n += 1
    logger.info("packed %d kernels into the quant collection (quantize=%s)", n, quantize)
    return residual, quant


def init_qlora_factors(rng: jax.Array, params: Any, spec: LoraSpec) -> dict:
    """Trainable ``lora`` collection for the spec's target modules.

    ``a ~ N(0, 0.02) * (alpha/r)`` (scaling pre-folded), ``b = 0``.
    """
    lora: dict = {}
    count = 0
    for path in _target_kernel_paths(params, spec):
        kernel = params
        for k in path:
            kernel = kernel[k]
        d_in, d_out = kernel.shape
        rng, a_rng = jax.random.split(rng)
        module_path = tuple(path[:-1])
        a = jax.random.normal(a_rng, (d_in, spec.rank), jnp.float32) * 0.02 * spec.scaling
        _set(lora, module_path + ("a",), a)
        _set(lora, module_path + ("b",), jnp.zeros((spec.rank, d_out), jnp.float32))
        count += 1
    if count == 0:
        raise ValueError(f"no kernels matched LoRA targets {spec.target_modules}")
    return lora


def init_packed_leafwise(
    model,
    rng: jax.Array,
    example_args: tuple,
    spec: Optional[LoraSpec] = None,
    quantize: bool = True,
    min_size: int = 4096,
    dtype=jnp.bfloat16,
) -> Tuple[dict, dict, Optional[dict]]:
    """Random-init a big model DIRECTLY into packed QLoRA storage.

    Never materializes the full-precision tree: each abstract leaf is
    generated, quantized (if a big kernel), and the transient freed
    before the next — peak extra memory is one kernel. For 7B: resident
    int8 ≈ 7 GB instead of 28 GB fp32 + 7 GB (RESULTS.md finding).

    Returns (residual_params, quant_tree, lora_tree-or-None).
    """
    from dalm_tpu.core.mesh import unbox

    abstract = jax.eval_shape(lambda r: model.init(r, *example_args), rng)["params"]
    abstract = unbox(abstract)

    target_paths = set()
    if spec is not None:
        target_paths = {tuple(p) for p in _target_kernel_paths(abstract, spec)}

    residual: dict = {}
    quant: dict = {}
    lora: dict = {} if spec is not None else None

    quantize_jit = jax.jit(quantize_tensor)

    def gen_leaf(key, struct, names):
        if len(struct.shape) >= 2:
            return (jax.random.normal(key, struct.shape, jnp.float32) * 0.02).astype(dtype)
        if names and names[-1] == "scale":
            return jnp.ones(struct.shape, dtype)
        return jnp.zeros(struct.shape, dtype)

    flat, _ = jax.tree_util.tree_flatten_with_path(abstract)
    key = rng
    for path, struct in flat:
        names = tuple(getattr(p, "key", "") for p in path)
        key, sub = jax.random.split(key)
        is_big_kernel = names[-1] == "kernel" and len(struct.shape) == 2 and int(
            np.prod(struct.shape)
        ) >= min_size
        module_path = names[:-1]
        if is_big_kernel:
            leaf = gen_leaf(sub, struct, names)
            if quantize:
                qt = quantize_jit(leaf)
                del leaf  # free the transient before the next leaf
                _set(quant, module_path + ("q",), qt["__int8__"])
                _set(quant, module_path + ("scale",), qt["scale"])
            else:
                _set(quant, module_path + ("w",), leaf)
        else:
            _set(residual, names, gen_leaf(sub, struct, names))
        if spec is not None and names in target_paths:
            d_in, d_out = struct.shape
            key, a_rng = jax.random.split(key)
            _set(lora, module_path + ("a",),
                 jax.random.normal(a_rng, (d_in, spec.rank), jnp.float32) * 0.02 * spec.scaling)
            _set(lora, module_path + ("b",), jnp.zeros((spec.rank, d_out), jnp.float32))
    return residual, quant, lora


def init_packed_on_device(
    model,
    rng: jax.Array,
    example_args: tuple,
    spec: Optional[LoraSpec] = None,
    quantize: "bool | str" = True,
    min_size: int = 4096,
    dtype=jnp.bfloat16,
    example_kwargs: Optional[dict] = None,
) -> Tuple[dict, dict, Optional[dict]]:
    """Like :func:`init_packed_leafwise` but as ONE compiled program.
    ``quantize``: True = int8, "int4" = nibble-packed 4-bit (serving tier).

    Per-leaf host dispatches are latency-bound on tunneled transports
    (hundreds of round trips for a 7B tree); here the whole generate+
    quantize pipeline traces into a single XLA program — serial schedule,
    per-leaf transients freed as the program runs, one dispatch total.
    """
    from dalm_tpu.core.mesh import unbox

    kw = example_kwargs or {}
    abstract = jax.eval_shape(lambda r: model.init(r, *example_args, **kw), rng)["params"]
    abstract = unbox(abstract)
    target_paths = set()
    if spec is not None:
        target_paths = {tuple(p) for p in _target_kernel_paths(abstract, spec)}
    flat, _ = jax.tree_util.tree_flatten_with_path(abstract)
    plan = [(tuple(getattr(p, "key", "") for p in path), s) for path, s in flat]

    def build(key):
        residual: dict = {}
        quant: dict = {}
        lora: dict = {} if spec is not None else None
        for names, struct in plan:
            import zlib

            tag = zlib.crc32("/".join(names).encode()) & 0x7FFFFFFF
            _, sub = jax.random.split(jax.random.fold_in(key, tag))
            module_path = names[:-1]
            big_kernel = (
                names[-1] == "kernel"
                and len(struct.shape) == 2
                and int(np.prod(struct.shape)) >= min_size
            )
            if big_kernel:
                leaf = (jax.random.normal(sub, struct.shape, jnp.float32) * 0.02).astype(dtype)
                if quantize in ("int4", "nf4", "int4pc"):
                    if quantize == "nf4":
                        from dalm_tpu.models.quant import quantize_tensor_nf4

                        qt = quantize_tensor_nf4(leaf)
                        _set(quant, module_path + ("nf4",), qt["nf4"])
                    elif quantize == "int4pc":
                        from dalm_tpu.models.quant import quantize_tensor_int4pc

                        qt = quantize_tensor_int4pc(leaf)
                        _set(quant, module_path + ("pcol",), qt["pcol"])
                    else:
                        qt = quantize_tensor_int4(leaf)
                    _set(quant, module_path + ("q4",), qt["q4"])
                    _set(quant, module_path + ("scale4",), qt["scale4"])
                elif quantize:
                    qt = quantize_tensor(leaf)
                    _set(quant, module_path + ("q",), qt["__int8__"])
                    _set(quant, module_path + ("scale",), qt["scale"])
                else:
                    _set(quant, module_path + ("w",), leaf)
            elif len(struct.shape) >= 2:
                _set(residual, names, (jax.random.normal(sub, struct.shape, jnp.float32) * 0.02).astype(dtype))
            elif names[-1] == "scale":
                _set(residual, names, jnp.ones(struct.shape, dtype))
            else:
                _set(residual, names, jnp.zeros(struct.shape, dtype))
            if spec is not None and names in target_paths:
                d_in, d_out = struct.shape
                _, a_rng = jax.random.split(jax.random.fold_in(key, tag ^ 0x5A5A))
                _set(lora, module_path + ("a",),
                     jax.random.normal(a_rng, (d_in, spec.rank), jnp.float32) * 0.02 * spec.scaling)
                _set(lora, module_path + ("b",), jnp.zeros((spec.rank, d_out), jnp.float32))
        return residual, quant, lora if spec is not None else {}

    residual, quant, lora = jax.jit(build)(rng)
    return residual, quant, (lora if spec is not None else None)


def quantize_tensor_np(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side symmetric per-column int8 (same math as quantize_tensor)."""
    w = np.asarray(w, np.float32)
    absmax = np.max(np.abs(w), axis=0, keepdims=True)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, scale


def load_hf_decoder_packed(
    path: str,
    spec: Optional[LoraSpec] = None,
    quantize: bool = True,
    min_size: int = 4096,
    rng: Optional[jax.Array] = None,
    dtype=jnp.bfloat16,
) -> Tuple[Any, dict, dict, Optional[dict]]:
    """Stream a Llama-family HF checkpoint directly into packed storage.

    Tensors are read one at a time from safetensors, quantized on HOST
    (numpy), and shipped to device as int8 — the full-precision model
    never exists on device and host peak is one tensor. This is how a
    real 7B checkpoint enters the fused-QLoRA runtime on a 16 GB chip.

    Returns (config, residual_params, quant_tree, lora_tree-or-None).
    """
    from dalm_tpu.models.hf_loader import load_hf_decoder

    # Reuse the (small-tensor) mapping logic by loading the converted
    # tree lazily: hf_loader materializes numpy on host (OK — host RAM),
    # then we stream each kernel to device quantized.
    cfg, host_params = load_hf_decoder(path, dtype=dtype)

    residual: dict = {}
    quant: dict = {}
    lora: dict = {} if spec is not None else None
    if rng is None:
        rng = jax.random.PRNGKey(0)
    target_paths = set()
    if spec is not None:
        target_paths = {tuple(p) for p in _target_kernel_paths(host_params, spec)}

    flat, _ = jax.tree_util.tree_flatten_with_path(host_params)
    for p, leaf in flat:
        names = tuple(getattr(x, "key", "") for x in p)
        module_path = names[:-1]
        big_kernel = names[-1] == "kernel" and leaf.ndim == 2 and leaf.size >= min_size
        if big_kernel and quantize:
            q, scale = quantize_tensor_np(leaf)
            _set(quant, module_path + ("q",), jax.device_put(q))
            _set(quant, module_path + ("scale",), jax.device_put(scale))
        elif big_kernel:
            _set(quant, module_path + ("w",), jax.device_put(np.asarray(leaf, jnp.bfloat16)))
        else:
            _set(residual, names, jax.device_put(jnp.asarray(leaf, dtype)))
        if spec is not None and names in target_paths:
            d_in, d_out = leaf.shape
            rng, a_rng = jax.random.split(rng)
            _set(lora, module_path + ("a",),
                 jax.random.normal(a_rng, (d_in, spec.rank), jnp.float32) * 0.02 * spec.scaling)
            _set(lora, module_path + ("b",), jnp.zeros((spec.rank, d_out), jnp.float32))
    return cfg, residual, quant, (lora if spec is not None else None)


def unpack_to_params(residual: Any, quant: Any, dtype=None) -> dict:
    """Reconstruct a full-precision param tree from packed QLoRA storage.

    Host-side (numpy): dequantizes each packed kernel (``q * scale`` or
    the stored bf16 ``w``) back into its module's ``kernel`` slot. Used
    to export a merge-path-loadable base when training ran fully packed
    and no pre-pack tree ever existed.
    """
    import ml_dtypes

    out_dtype = np.dtype(dtype) if dtype is not None else np.dtype(ml_dtypes.bfloat16)
    residual = jax.device_get(residual)
    quant = jax.device_get(quant)
    out = _deep_dict(residual)

    def walk(node, path):
        if isinstance(node, dict) and ("q" in node or "w" in node):
            if "q" in node:
                kernel = np.asarray(node["q"], np.float32) * np.asarray(node["scale"], np.float32)
            else:
                kernel = np.asarray(node["w"], np.float32)
            _set(out, path + ("kernel",), kernel.astype(out_dtype))
        elif isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))

    walk(quant, ())
    return out


def factors_to_flat(lora_tree: dict, spec: LoraSpec) -> Dict[str, dict]:
    """Fused ``lora`` collection → the flat merge-format adapter dict
    (``{"path/to/kernel": {lora_a, lora_b}}``, scaling un-folded) so one
    adapter file format serves both runtimes."""
    flat: Dict[str, dict] = {}

    def walk(node, path):
        if isinstance(node, dict) and "a" in node and "b" in node:
            flat["/".join(path + ("kernel",))] = {
                "lora_a": node["a"] / spec.scaling,
                "lora_b": node["b"],
            }
        elif isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))

    walk(lora_tree, ())
    return flat


def flat_to_factors(flat: Dict[str, dict], spec: LoraSpec) -> dict:
    """Inverse of :func:`factors_to_flat` (scaling re-folded into a)."""
    tree: dict = {}
    for path_str, ab in flat.items():
        module_path = tuple(path_str.split("/"))[:-1]
        _set(tree, module_path + ("a",), jnp.asarray(ab["lora_a"]) * spec.scaling)
        _set(tree, module_path + ("b",), jnp.asarray(ab["lora_b"]))
    return tree


def _deep_dict(tree):
    if isinstance(tree, dict):
        return {k: _deep_dict(v) for k, v in tree.items()}
    return tree


def init_params_leafwise(model, rng: jax.Array, example_args: tuple, dtype=jnp.bfloat16):
    """Random-init a big model one leaf at a time in ``dtype``.

    ``jax.eval_shape`` gives the abstract tree (no memory); each leaf is
    then materialized directly in the target dtype — peak extra memory is
    a single kernel, vs a whole fp32 tree (28 GB for 7B) for plain init.
    Weights are N(0, 0.02) for >=2-D leaves, zeros for 1-D (biases), ones
    for norm scales — statistically equivalent to the module initializers
    for the purpose of memory/compile proofs and fresh pretraining.
    """
    from dalm_tpu.core.mesh import unbox

    abstract = jax.eval_shape(lambda r: model.init(r, *example_args), rng)["params"]
    abstract = unbox(abstract)

    flat, treedef = jax.tree_util.tree_flatten_with_path(abstract)
    leaves = []
    key = rng
    for path, shape_struct in flat:
        key, sub = jax.random.split(key)
        names = [getattr(p, "key", "") for p in path]
        if len(shape_struct.shape) >= 2:
            leaf = (jax.random.normal(sub, shape_struct.shape, jnp.float32) * 0.02).astype(dtype)
        elif names and names[-1] == "scale":
            leaf = jnp.ones(shape_struct.shape, dtype)
        else:
            leaf = jnp.zeros(shape_struct.shape, dtype)
        leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)
