"""3D Vision Transformer trunk, TPU-first.

Behavioural parity with the reference trunk (/root/reference/model/vit.py):
pre-LN blocks `x + attn(LN(x))`, `x + mlp(LN(x))` (vit.py:139-144, DropPath is
commented out there and therefore absent here too), LayerNorm eps 1e-6, qkv
bias, GELU MLP with hidden = dim * mlp_ratio.

TPU-first design choices:
- Patch embedding is patchify + Dense (mathematically identical to the
  reference's kernel==stride Conv3d, vit.py:65-74, but goes straight to the
  MXU with no im2col or conv lowering).
- Attention dispatches to the Pallas flash kernel or XLA fused attention
  (kernels/flash_attention.py), never materialising (N, N) scores in HBM on
  the flash path.
- Compute dtype is configurable (bf16 for throughput); params and LayerNorm
  statistics stay f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from vit_ae_plus_plus_tpu.configs import ViTConfig
from vit_ae_plus_plus_tpu.kernels import multihead_attention
from vit_ae_plus_plus_tpu.ops import patchify

# "xavier_uniform following official JAX ViT" (reference vit_autoenc.py:90-95)
dense_init = nn.initializers.xavier_uniform()
# torch trunc_normal_(std=.02) truncates at +-2.0 (=100 sigma) — effectively a
# plain normal, as the reference itself notes (vit_autoenc.py:83).
token_init = nn.initializers.normal(stddev=0.02)


def _dt(name: str):
    """Compute dtype by name. 'float64' resolves only under jax_enable_x64
    (the torch-oracle trajectory test); on TPU the real choices are
    float32/bfloat16."""
    return jnp.dtype(name)


class FusedLayerNorm(nn.Module):
    """LayerNorm routed through the Pallas fused kernel on TPU.

    NOT used by the trunks: measured IN-MODEL the custom call made the
    flagship step SLOWER (53.4 vs 57.3 vol/s) — the kernel wins the isolated
    lane-axis reductions, but pulling LN out of XLA's fusion graph forces
    extra HBM materialisation of activations that XLA previously fused into
    neighbouring matmul/convert ops. Kept (with kernels/fused_ln.py and its
    tests) as a drop-in component and a documented negative result; param
    names/shapes match flax nn.LayerNorm ('scale'/'bias'), off-TPU the
    equivalent jnp math runs instead (f32 statistics either way).
    """

    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if jax.default_backend() == "tpu":
            from vit_ae_plus_plus_tpu.kernels.fused_ln import fused_layernorm

            return fused_layernorm(x, scale, bias, self.epsilon).astype(self.dtype)
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = xf.var(-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(self.dtype)


class LNParams(nn.Module):
    """Parameter holder matching flax nn.LayerNorm ('scale'/'bias') for the
    fused LN+Dense path: the LN math runs inside kernels.fused_ln_dense, but
    the parameters keep their unfused names/paths so checkpoints are
    interchangeable between the fused and unfused graphs."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return scale, bias


class DenseParams(nn.Module):
    """Parameter holder matching nn.Dense ('kernel'/'bias') — see LNParams."""

    features: int
    in_dim: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", dense_init, (self.in_dim, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


def constrain_batch(x):
    """Pin a (B, ...) activation to P('data') under the ambient mesh (no-op
    otherwise). The FSDP path (parallel/fsdp.py) turns this on at every Block
    entry: with parameters 1/data-sharded, GSPMD would otherwise propagate the
    WEIGHT shardings into the residual stream and move (much larger)
    activations between layouts instead of all-gathering weights at their use
    sites — observed directly in the compiled HLO (activation-shaped
    all-gathers + all-to-alls) before this constraint existed."""
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or "data" not in mesh.axis_names or mesh.shape["data"] <= 1:
        return x
    if x.shape[0] % mesh.shape["data"]:
        return x  # indivisible batch (e.g. a batch-1 init/template pass)
    axis_types = dict(zip(mesh.axis_names, getattr(mesh, "axis_types", ())))
    if axis_types.get("data") != jax.sharding.AxisType.Auto:
        return x  # inside shard_map manual regions the spec would be illegal
    from jax.sharding import PartitionSpec as P

    return jax.lax.with_sharding_constraint(x, P("data"))


def _use_fused_ln(mode: str, dim: int, dtype, kind: str = "qkv") -> bool:
    """Gate for the fused LN+Dense kernel (kernels/fused_ln_dense.py).

    MEASURED NEGATIVE RESULT (round 3, TPU v5e, flagship B16 bf16 step) —
    'auto' therefore never fuses; 'on' forces fusion everywhere (tests /
    other hardware — NOT tensor-parallel-safe: the kernel holds the full W,
    keep the default under a model-sharded mesh); 'off' never.

    Isolated per-instance timings (fwd / fwd+bwd ms): enc qkv 1.36/1.92
    fused vs 1.70/2.15 XLA (a real ~0.5 ms/layer win), dec qkv 2.56/1.88 vs
    1.79/1.75 (loss), enc mlp 1.37/2.22 vs 1.41/2.14 and dec mlp 1.67/2.30
    vs 1.57/2.03 (wash/loss). IN-MODEL: all-fused 49.9 vol/s, encoder-qkv-
    only 60.1, unfused 61.7 — even the isolated-win configuration loses
    ~7 ms/step net. Together with round 2's standalone fused-LN result
    (53.4 vs 57.3) the lesson is now three-for-three: on this chip XLA's
    in-model fusion web around matmuls (residual adds, converts, epilogues)
    is worth more than any LN custom call saves, at every granularity tried
    — LN alone, LN+Dense everywhere, LN+Dense only where isolation wins.
    Only the attention kernels (far larger ops) overcome the boundary."""
    if mode == "on":
        return True
    if mode == "off":
        return False
    if mode != "auto":
        raise ValueError(f"ln_fusion must be 'auto'|'on'|'off', got {mode!r}")
    return False  # 'auto': measured net-negative on TPU v5e — see above


def _fused_ln_dense_call(x, ln_params, dense_params):
    from vit_ae_plus_plus_tpu.kernels.fused_ln_dense import fused_ln_dense

    scale, bias = ln_params
    kernel, b = dense_params
    return fused_ln_dense(
        x, scale, bias, kernel, b, 1e-6, jax.default_backend() != "tpu"
    )


class Mlp(nn.Module):
    """Transformer MLP (reference model/vit.py:78-96).

    `ln` (scale, bias): when given, the pre-MLP LayerNorm is fused into
    Dense_0 via the Pallas kernel and `x` must be the UN-normalised stream.
    """

    hidden_dim: int
    out_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, ln=None):
        if ln is not None:
            dp = DenseParams(self.hidden_dim, x.shape[-1], name="Dense_0")()
            x = _fused_ln_dense_call(x, ln, dp)
        else:
            x = nn.Dense(self.hidden_dim, kernel_init=dense_init, dtype=self.dtype,
                         name="Dense_0")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.out_dim, kernel_init=dense_init, dtype=self.dtype,
                     name="Dense_1")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class Attention(nn.Module):
    """Multi-head self-attention (reference model/vit.py:100-124) with the
    compute routed through kernels.multihead_attention."""

    num_heads: int
    attn_impl: str = "auto"
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, ln=None):
        b, n, c = x.shape
        head_dim = c // self.num_heads
        if ln is not None:
            # fused pre-LN + qkv projection: one Pallas program computes the
            # LN statistics and the (B, N, 3C) projection; the normalised
            # activations never reach HBM (kernels/fused_ln_dense.py)
            dp = DenseParams(3 * c, c, name="qkv")()
            qkv = _fused_ln_dense_call(x, ln, dp)
        else:
            qkv = nn.Dense(3 * c, kernel_init=dense_init, dtype=self.dtype,
                           name="qkv")(x)
        impl = self.attn_impl
        if impl == "auto":
            # packed-I/O kernel measured fastest in-model wherever it applies
            # (decoder 8L fwd+bwd 142 -> 126 ms, encoder 52 -> 49 — BASELINE.md);
            # it consumes the projection's (B, N, 3C) output with no per-head
            # HBM tensors. NOT for tensor-parallel runs (its lane dim is
            # replicated) — those set attn_impl explicitly.
            # the packed kernel's (B, N, 3C) lane dim must stay REPLICATED
            # (a contiguous 'model' shard would mix q/k/v) — under an ambient
            # mesh with a model axis > 1, 'auto' must not pick it
            abstract_mesh = jax.sharding.get_abstract_mesh()
            model_sharded = abstract_mesh.shape.get("model", 1) > 1
            packed_ok = (
                jax.default_backend() == "tpu"
                and not model_sharded
                and c % 128 == 0
                and 128 % head_dim == 0
                and 384 <= n
                and ((n + 127) // 128) * 128 <= 2048
            )
            if packed_ok:
                impl = "flash_packed"
        if impl == "flash_packed":
            from vit_ae_plus_plus_tpu.kernels.packed_flash import packed_flash_attention

            out = packed_flash_attention(
                qkv, head_dim, interpret=jax.default_backend() != "tpu"
            )
        else:
            qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
            q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))  # (B, H, N, Dh)
            out = multihead_attention(q, k, v, impl=impl)
            out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = nn.Dense(c, kernel_init=dense_init, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


def ln_stats_dtype(x, scale, bias, dtype, eps=1e-6):
    """LayerNorm with statistics computed in `dtype`.

    flax nn.LayerNorm pins its mean/var to at least f32; this is the opt-in
    `--ln-dtype bfloat16` lever (BASELINE.md): stats, normalisation and the
    affine all run at the compute precision, deleting the bf16->f32 converts
    that feed the reductions. Two-pass variance (not fast-variance): the
    mean(x^2) - mean(x)^2 cancellation is catastrophic in bf16."""
    xd = x.astype(dtype)
    mu = jnp.mean(xd, axis=-1, keepdims=True)
    d = xd - mu
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    y = d * jax.lax.rsqrt(var + jnp.asarray(eps, dtype))
    return y * scale.astype(dtype) + bias.astype(dtype)


class Block(nn.Module):
    """Pre-LN transformer block (reference model/vit.py:126-144).

    On TPU in bf16 the two LayerNorms fuse into their adjacent projections
    (norm1 -> attn.qkv, norm2 -> mlp.Dense_0) via the Pallas LN+Dense kernel;
    parameter names/paths are identical either way, so checkpoints are
    interchangeable between the fused and unfused graphs.
    """

    num_heads: int
    mlp_ratio: float = 4.0
    attn_impl: str = "auto"
    dropout: float = 0.0
    attn_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    ln_fusion: str = "auto"
    ln_dtype: str = "float32"  # "bfloat16": LN stats at compute precision
    batch_constraint: bool = False  # FSDP: see constrain_batch

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.batch_constraint:
            x = constrain_batch(x)
        dim = x.shape[-1]
        low_ln = self.ln_dtype == "bfloat16"
        fuse_qkv = _use_fused_ln(self.ln_fusion, dim, self.dtype, "qkv")
        fuse_mlp = _use_fused_ln(self.ln_fusion, dim, self.dtype, "mlp")
        if low_ln and (fuse_qkv or fuse_mlp):
            # the fused LN+Dense kernel computes its statistics in f32; a
            # forced fusion would otherwise silently override ln_dtype
            # (ADVICE r4) — make the conflict loud
            import warnings

            warnings.warn(
                "ln_fusion='on' routes LayerNorm through the fused LN+Dense "
                "kernel, whose statistics are f32 — ln_dtype='bfloat16' is "
                "ignored on fused blocks; drop one of the two flags",
                stacklevel=2,
            )
        attn = Attention(
            self.num_heads,
            attn_impl=self.attn_impl,
            dropout=self.attn_dropout,
            dtype=self.dtype,
            name="attn",
        )
        mlp = Mlp(
            int(dim * self.mlp_ratio), dim, dropout=self.dropout, dtype=self.dtype,
            name="mlp",
        )
        if fuse_qkv:
            x = x + attn(x, deterministic, ln=LNParams(dim, name="norm1")())
        elif low_ln:
            sc, bi = LNParams(dim, name="norm1")()  # same param paths
            x = x + attn(ln_stats_dtype(x, sc, bi, jnp.bfloat16), deterministic)
        else:
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
            x = x + attn(y, deterministic)
        if fuse_mlp:
            x = x + mlp(x, deterministic, ln=LNParams(dim, name="norm2")())
        elif low_ln:
            sc, bi = LNParams(dim, name="norm2")()
            x = x + mlp(ln_stats_dtype(x, sc, bi, jnp.bfloat16), deterministic)
        else:
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
            x = x + mlp(y, deterministic)
        return x


class PatchEmbed3D(nn.Module):
    """Patchify + Dense == the reference's stride-p Conv3d (vit.py:52-76)."""

    patch_size: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, volume):
        x = patchify(volume.astype(self.dtype), self.patch_size)
        return nn.Dense(self.embed_dim, kernel_init=dense_init, dtype=self.dtype, name="proj")(x)


class VisionTransformer3D(nn.Module):
    """Encoder-only 3D ViT for classification / SSL feature extraction.

    Parity: reference model/vit.py:147-297. pos_embed is LEARNED here
    (normal 0.02 init, vit.py:231) — unlike the MAE, whose table is fixed
    sincos. `forward_features` returns the fc_norm'd global mean over patch
    tokens when global_pool, else the post-norm cls token (vit.py:265-284).
    """

    cfg: ViTConfig

    def setup(self):
        c = self.cfg
        block_cls = nn.remat(Block) if c.remat_blocks else Block
        self.patch_embed = PatchEmbed3D(c.patch_size, c.embed_dim, dtype=_dt(c.dtype))
        self.cls_token = self.param("cls_token", token_init, (1, 1, c.embed_dim))
        self.pos_embed = self.param("pos_embed", token_init, (1, c.num_patches + 1, c.embed_dim))
        self.blocks = [
            block_cls(
                c.num_heads,
                c.mlp_ratio,
                attn_impl=c.attn_impl,
                dropout=c.drop_rate,
                attn_dropout=c.attn_drop_rate,
                dtype=_dt(c.dtype),
                ln_fusion=c.ln_fusion,
                ln_dtype=getattr(c, "ln_dtype", "float32"),
                batch_constraint=c.batch_shard_activations,
                name=f"blocks_{i}",
            )
            for i in range(c.depth)
        ]
        if c.global_pool:
            # global_pool deletes `norm` and adds `fc_norm` (reference vit.py:219-222)
            self.fc_norm = nn.LayerNorm(epsilon=1e-6, dtype=_dt(c.dtype))
        else:
            self.norm = nn.LayerNorm(epsilon=1e-6, dtype=_dt(c.dtype))
        if c.num_classes > 0:
            self.head = nn.Dense(c.num_classes, kernel_init=token_init, dtype=_dt(c.dtype))

    def forward_features(self, x, train: bool = False):
        c = self.cfg
        x = self.patch_embed(x)
        b = x.shape[0]
        cls = jnp.broadcast_to(self.cls_token.astype(x.dtype), (b, 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self.pos_embed.astype(x.dtype)
        for blk in self.blocks:
            x = blk(x, deterministic=not train)
        if c.global_pool:
            pooled = jnp.mean(x[:, 1:, :], axis=1)
            return self.fc_norm(pooled)
        x = self.norm(x)
        return x[:, 0]

    def __call__(self, x, train: bool = False):
        feats = self.forward_features(x, train=train)
        if self.cfg.num_classes > 0:
            return self.head(feats)
        return feats


# torch nn.Linear default init (kaiming_uniform(a=sqrt(5)) == uniform with
# variance 1/(3 fan_in)): the reference's predictor/projector heads are created
# AFTER the xavier re-init pass runs, so they keep torch defaults
# (vit_autoenc.py:241-268 — the apply() in the parent __init__ precedes them).
torch_linear_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class MLPHead(nn.Module):
    """SimSiam-style head: [Dense(no bias) -> BN -> ReLU] x n -> Dense.

    Covers both the 2-layer predictor (reference vit_autoenc.py:263-268) and
    the 3-layer projector (:255-262, final BN affine-free, no final Dense).
    BatchNorm uses batch statistics in training exactly like torch's
    BatchNorm1d over the flattened (B*L, D) token axis.
    """

    dim: int
    num_hidden: int = 1
    final_dense: bool = True  # predictor ends with a biased Dense
    final_bn_affine: bool = False  # projector ends with affine-free BN
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i in range(self.num_hidden):
            x = nn.Dense(
                self.dim, use_bias=False, kernel_init=torch_linear_init, dtype=self.dtype
            )(x)
            # dtype=None: flax promotes input+params (bf16/f32 inputs
            # compute in f32 exactly as a pinned f32 did; f64 stays f64 for
            # the x64 trajectory oracle)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=None
            )(x)
            x = nn.relu(x)
        if self.final_dense:
            x = nn.Dense(self.dim, kernel_init=torch_linear_init, dtype=self.dtype)(x)
        else:
            x = nn.Dense(
                self.dim, use_bias=False, kernel_init=torch_linear_init, dtype=self.dtype
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                use_bias=self.final_bn_affine,
                use_scale=self.final_bn_affine,
                dtype=None,
            )(x)
        return x


class VisionTransformer3DContrastive(nn.Module):
    """Classifier trunk + SimSiam heads for two-view stage-2 training.

    Parity: reference model/vit.py:301-337 — z = trunk(x) (head applied when
    num_classes > 0, as the reference's forward calls the full forward),
    optional projector, predictor; returns (p1, p2, stop_grad(z1),
    stop_grad(z2)). Trained with the legacy 2-view loop's negative-cosine
    objective (utils/train_one_epoch.py:117-181).
    """

    cfg: ViTConfig
    use_proj: bool = False

    def setup(self):
        # The reference routes the trunk's FULL forward (head applied) into
        # heads built at embed_dim (model/vit.py:311-337) — which can only
        # execute when num_classes == 0 (head = Identity); any other value
        # crashes there with a shape mismatch. We therefore build the only
        # runnable configuration: headless trunk, heads at embed_dim.
        trunk_cfg = ViTConfig(**{**self.cfg.__dict__, "num_classes": 0})
        self.trunk = VisionTransformer3D(trunk_cfg)
        self.heads = ContrastiveHeads(
            self.cfg.embed_dim, use_proj=self.use_proj, dtype=_dt(self.cfg.dtype)
        )

    def __call__(self, x1, x2, train: bool = True):
        z1 = self.trunk(x1, train=train)
        z2 = self.trunk(x2, train=train)
        p1, p2, z1, z2 = self.heads(z1, z2, train=train, apply_proj=self.use_proj)
        return p1, p2, jax.lax.stop_gradient(z1), jax.lax.stop_gradient(z2)


class ContrastiveHeads(nn.Module):
    """Predictor (+ optional projector) for two-view contrastive training.

    Parity: reference VisionTransformer3DContrastive (model/vit.py:301-337)
    and ContrastiveMAEViT heads (model/vit_autoenc.py:241-268).
    """

    dim: int
    use_proj: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.use_proj:
            self.projection_head = MLPHead(
                self.dim, num_hidden=2, final_dense=False, dtype=self.dtype, name="projector"
            )
        self.predictor = MLPHead(self.dim, num_hidden=1, final_dense=True, dtype=self.dtype)

    def __call__(self, z1, z2, train: bool = True, apply_proj: bool = False):
        if self.use_proj and apply_proj:
            z1 = self.projection_head(z1, train=train)
            z2 = self.projection_head(z2, train=train)
        elif self.use_proj and self.is_initializing():
            # materialise the projector params even though the MAE forward
            # never applies them — the reference BUILDS the projector but does
            # not use it (vit_autoenc.py:253-262 vs :270-285), so its weights
            # exist in checkpoints; flax only creates params for called modules
            _ = self.projection_head(z1, train=train)
        p1 = self.predictor(z1, train=train)
        p2 = self.predictor(z2, train=train)
        return p1, p2, z1, z2
