"""Policy model base: networks as pure functions of a flat θ vector.

Reference surfaces being replaced:
* CPU stack `Policy` (es_distributed/policies.py:15-113): TF graph +
  `set_trainable_flat`/`get_trainable_flat` concat/slice assign machinery
  (tf_util.py:224-246).
* GPU stack `BaseModel` (gpu neuroevolution/models/base.py:26-192):
  per-slot weight variables with scatter loads and IndexedBatchMatMul so one
  graph evaluates B different policies (ops/indexedmatmul.cpp).

TPU-native design: a model is a frozen dataclass holding its `ParamSpec`
list; `act(theta, obs, key, ctx)` is a pure function. Population evaluation
is `jax.vmap(model.act)` over stacked [B, D] thetas — XLA lowers the vmapped
dense/conv layers to batched MXU GEMMs, which is exactly what the custom
IndexedBatchMatMul CUDA kernel hand-built (SURVEY §2.2 item 4); no custom
kernel is needed. Non-trainable context (ob stats, VBN ref stats) is passed
via `ctx` instead of living in graph variables.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops import flat
from ..ops.flat import ParamSpec


def dense(parts: Dict[str, jax.Array], name: str, x: jax.Array) -> jax.Array:
    """x @ w + b for specs named `{name}/w`, `{name}/b`
    (tf_util.py:150-162 dense; base.py:84-99)."""
    return x @ parts[f"{name}/w"] + parts[f"{name}/b"]


def _same_pads(size: int, k: int, s: int) -> Tuple[int, int]:
    """TF SAME padding: total = max((ceil(size/s)-1)·s + k - size, 0),
    split low/high with the extra element on the high side."""
    out = -(-size // s)
    total = max((out - 1) * s + k - size, 0)
    return total // 2, total - total // 2


def extract_patches(x: jax.Array, k: int, stride: int, padding: str) -> jax.Array:
    """[N, H, W, C] → [N, H', W', k·k·C] im2col patches, feature order
    (i, j, c) — matching an HWIO weight reshaped to [k·k·C, O].

    Pure data movement (pad + k² strided slices + stack): no identity-kernel
    conv, no gather; XLA fuses it into the consuming GEMM's operand
    generation. This is the reference GPU stack's extract_image_patches
    (base.py:54-66) done the XLA way."""
    n, h, w, c = x.shape
    if padding == "SAME":
        (pt, pb), (pl_, pr) = _same_pads(h, k, stride), _same_pads(w, k, stride)
        x = jnp.pad(x, ((0, 0), (pt, pb), (pl_, pr), (0, 0)))
        h, w = h + pt + pb, w + pl_ + pr
    h2 = (h - k) // stride + 1
    w2 = (w - k) // stride + 1
    slices = [
        x[:, i : i + (h2 - 1) * stride + 1 : stride, j : j + (w2 - 1) * stride + 1 : stride, :]
        for i in range(k)
        for j in range(k)
    ]
    patches = jnp.stack(slices, axis=3)  # [N, H', W', k·k, C]
    return patches.reshape(n, h2, w2, k * k * c)


def conv2d(
    parts: Dict[str, jax.Array],
    name: str,
    x: jax.Array,
    stride: int,
    padding: str = "SAME",
) -> jax.Array:
    """NHWC conv with HWIO weights + bias (tf_util.py:133-148 conv), computed
    as im2col patches @ weight-matrix (base.py:54-82's exact contraction).

    Why not `lax.conv_general_dilated`: under `vmap` with per-member weights
    (the population forward) XLA's conv batching rule emits a
    feature_group_count=B grouped convolution whose tiny per-group channel
    counts starve the MXU (measured ~1.6k member-steps/s flat in B on v5e).
    Patches + matmul instead vmaps to ONE batched GEMM [B,P,K]·[B,K,O] that
    XLA tiles straight onto the MXU — the TPU-native equivalent of the
    reference's IndexedBatchMatMul (ops/indexedmatmul.cpp:145-214).

    Accepts unbatched [H, W, C] input (the per-member single-frame case) and
    adds/removes the batch dim so it vmaps cleanly over the population."""
    w = parts[f"{name}/w"]
    b = parts[f"{name}/b"]
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    kh, kw, cin, cout = w.shape
    assert kh == kw, "square kernels only (all reference nets use square kernels)"
    patches = extract_patches(x, kh, stride, padding)
    n, h2, w2, kk = patches.shape
    y = patches.reshape(n, h2 * w2, kk) @ w.reshape(kk, cout).astype(patches.dtype)
    y = y.reshape(n, h2, w2, cout) + b.reshape((1, 1, 1, -1))
    return y[0] if squeeze else y


def batch_conv2d(
    w: jax.Array,  # [B, k, k, cin, cout] per-member HWIO weights
    x: jax.Array,  # [B, H, W, cin]
    stride: int,
    padding: str = "SAME",
    bias: Optional[jax.Array] = None,  # [B, cout] or None
) -> jax.Array:
    """Population conv: every member convolves ITS frame with ITS weights —
    the IndexedBatchMatMul contraction (ops/indexedmatmul.cpp:145-214) as a
    single batch-explicit einsum [B,P,K]·[B,K,O] instead of vmap-of-conv2d.
    Batch-explicit so XLA sees ONE batched GEMM with the member dim as the
    true batch dimension (a vmapped per-member GEMM lowers the same way but
    gives the compiler less fusion freedom around it)."""
    B, kh, kw, cin, cout = w.shape
    patches = extract_patches(x, kh, stride, padding)  # [B, h2, w2, kk·cin]
    wmat = w.reshape(B, kh * kw * cin, cout).astype(patches.dtype)
    y = jnp.einsum("bhwk,bko->bhwo", patches, wmat, preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias[:, None, None, :].astype(y.dtype)
    return y


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:
        return False


def pop_matvec(x: jax.Array, W: jax.Array, impl: str = "auto") -> jax.Array:
    """y[b] = x[b] @ W[b] — the per-member fully-connected layer of a
    population forward ([B,K]·[B,K,N] → [B,N] f32). ~98% of the VBN-DQN's
    weight bytes sit in its fc layer, so this batched mat-vec IS the
    population forward's HBM-bandwidth bill; on TPU it routes to the Pallas
    member-pipelined kernel (ops/pallas_forward.py), elsewhere to a batched
    einsum. `impl`: 'auto' (pallas iff TPU) | 'pallas' | 'xla'."""
    if impl == "pallas" or (impl == "auto" and _on_tpu()):
        from ..ops.pallas_forward import population_linear

        return population_linear(x, W)
    return jnp.einsum("bk,bkn->bn", x, W, preferred_element_type=jnp.float32).astype(jnp.float32)


NONLINS = {
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "lrelu": lambda x: jnp.maximum(x, 0.2 * x),  # tf_util lrelu default leak 0.2
    "elu": jax.nn.elu,
}


@dataclasses.dataclass(frozen=True)
class Model:
    """Base for all policies. Subclasses define `specs` (via `build_specs`)
    and `act`."""

    def __post_init__(self):
        object.__setattr__(self, "_specs", tuple(self.build_specs()))

    @property
    def specs(self) -> Tuple[ParamSpec, ...]:
        return self._specs

    @property
    def num_params(self) -> int:
        return flat.total_dim(self.specs)

    def build_specs(self) -> Sequence[ParamSpec]:
        raise NotImplementedError

    # ----------------------------------------------------------------- init

    def init_theta(self, key: jax.Array) -> jax.Array:
        """Fresh flat θ with each layer's initializer (normc etc.)."""
        return flat.init_theta(key, self.specs)

    def reinit_theta(self, theta: jax.Array) -> jax.Array:
        """CPU-GA reinitialize: normalize existing weight columns, zero biases
        (tf_util.py:122-130; used by ga.py:256-260 genome reconstruction)."""
        return flat.reinit_theta(theta, self.specs)

    def scale_by(self, style: str = "fan_in") -> jax.Array:
        """[D] per-element genome init scale (base.py:166-175)."""
        return flat.scale_by_vector(self.specs, style)

    def unflatten(self, theta: jax.Array) -> Dict[str, jax.Array]:
        return flat.unflatten(theta, self.specs)

    # ------------------------------------------------------------------ act

    def act_parts(self, parts: Dict[str, jax.Array], obs: jax.Array, key: Optional[jax.Array] = None, ctx=None):
        """Single-member action from pre-unflattened (and `prepare_parts`-ed)
        parameter parts. Subclasses implement this; `act` wraps it."""
        raise NotImplementedError

    def act(self, theta: jax.Array, obs: jax.Array, key: Optional[jax.Array] = None, ctx=None):
        """Single-member action. Population use: jax.vmap(self.act)."""
        return self.act_parts(self.prepare_parts(self.unflatten(theta)), obs, key, ctx)

    def prepare_parts(self, parts: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        """Per-parameter post-processing applied ONCE per rollout, outside
        the step loop (e.g. compute-dtype casts). Must be elementwise /
        shape-polymorphic: it is applied to both [.] and stacked [B, .]
        parts."""
        return parts

    def prepare_batch_params(self, params):
        """Hoist flat-θ unflattening (and `prepare_parts`) out of the rollout
        step loop. Without this, the slice/reshape of every weight matrix
        re-materializes INSIDE `lax.while_loop`/`scan` each step — at Atari
        scale that is an extra ~2·B·D·4 bytes of HBM traffic per step and was
        measured to cost 2.5× end-to-end on v5e. Idempotent: prepared params
        (dict thetas) and bare/opaque params pass through unchanged."""
        if not (isinstance(params, tuple) and len(params) == 2):
            return params
        thetas, ctx = params
        if thetas is not None and not isinstance(thetas, dict):
            thetas = self.prepare_parts(jax.vmap(self.unflatten)(thetas))
        return (thetas, ctx)

    def batch_act_parts(self, parts, obs, keys, ctx):
        """Population action selection from stacked [B, ...] parts. Default:
        vmap of the per-member act. Models with batch-explicit fast paths
        (conv nets routing their fc through `pop_matvec`) override this."""
        return jax.vmap(lambda p, o, k: self.act_parts(p, o, k, ctx))(parts, obs, keys)

    def prepare_batch_params_chunked(self, params, chunk: int):
        """`prepare_batch_params` in member chunks, concatenated on device.

        The eager whole-population prepare materializes the f32 parts views
        AND the compute-dtype copies simultaneously — at LargeDQN B=384 that
        is ~15.6 GB (f32 θ-stack 6.2 + f32 parts 6.2 + bf16 layout 3.2) and
        OOMs a 16 GB-HBM chip. Chunking bounds the f32 intermediates to
        O(chunk·D) while the output stays the full prepared (compute-dtype)
        pytree. ctx pytrees with leading member axes are sliced alongside."""
        if not (isinstance(params, tuple) and len(params) == 2):
            return params
        thetas, ctx = params
        if thetas is None or isinstance(thetas, dict):
            return params
        B = thetas.shape[0]
        if chunk >= B:
            return self.prepare_batch_params(params)

        def slice_ctx(s, e):
            if ctx is None:
                return None
            return jax.tree_util.tree_map(
                lambda x: x[s:e] if hasattr(x, "shape") and x.ndim and x.shape[0] == B else x,
                ctx,
            )

        parts_chunks = []
        for s in range(0, B, chunk):
            p, _ = self.prepare_batch_params((thetas[s : s + chunk], slice_ctx(s, s + chunk)))
            parts_chunks.append(p)
        parts = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *parts_chunks
        )
        return (parts, ctx)

    def make_batch_act(self):
        """act_fn for the rollout engine: (params, obs[B,...], keys[B]) →
        actions[B,...]. `params` is (thetas [B, D] — or the prepared parts
        pytree, see `prepare_batch_params` — , ctx pytree broadcast or
        stacked [B, ...]). The returned function carries a `.prepare`
        attribute the rollout engines call once before their step loops."""

        def batch_act(params, obs, keys):
            parts, ctx = self.prepare_batch_params(params)
            return self.batch_act_parts(parts, obs, keys, ctx)

        batch_act.prepare = self.prepare_batch_params
        return batch_act

    # VBN protocol (overridden by models that need a ref batch;
    # policies.py:319-330, batchnorm.py:52-123)
    @property
    def needs_ref_batch(self) -> bool:
        return False

    @property
    def needs_ob_stat(self) -> bool:
        return False
