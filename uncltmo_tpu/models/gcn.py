"""ViG-style GCN bottleneck (Flax / NHWC).

TPU-native re-design of `models/unet_multi_filters/gcn_lib/` +
`GCNBlock`/`FFN` (`models/unet_multi_filters/Unet.py:20-99`).

The bottleneck grid is fixed at 12x12 = 144 nodes, so the dense KNN is a
144x144 distance matrix + top_k — a trivial pure-XLA op (two small matmuls
and a sort), not a custom kernel.  The max-relative graph conv becomes a
gather (`take_along_axis`) + max + two 1x1 "convs" that are plain matmuls on
the MXU.

Numerics parity notes:
* KNN distances use L2-normalized features (`gcn_lib/torch_edge.py:152-155`)
  and are computed under stop_gradient (torch.no_grad,
  `torch_edge.py:17`, `:62`).
* The (negated) fixed relative-position bias is the 2-D sincos embedding
  gram matrix (`gcn_lib/pos_embed.py:21-28`); it is deterministic, so it is
  regenerated at init instead of being stored as a parameter.
* MRConv2d interleaves [x, max_rel] channel-pairwise before the grouped
  (groups=4) 1x1 conv (`gcn_lib/torch_vertex.py:27-29`) — the converter and
  this module preserve that exact channel order.
* GELU is the exact (erf) variant (torch nn.GELU default).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from uncltmo_tpu.models.blocks import xavier_gain2


def sincos_pos_embed_2d(embed_dim: int, grid_size) -> np.ndarray:
    """2-D sine-cosine positional embedding, (H*W, embed_dim)
    (reference `gcn_lib/pos_embed.py:38-85`).  `grid_size` is an int
    (square, the reference's only case) or an (H, W) pair — whole-image
    bottlenecks are rectangular."""
    assert embed_dim % 4 == 0
    gh_n, gw_n = ((grid_size, grid_size) if isinstance(grid_size, int)
                  else grid_size)

    def emb_1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(gh_n, dtype=np.float32)
    grid_w = np.arange(gw_n, dtype=np.float32)
    # meshgrid(w, h): grid[0] varies along w (fastest axis), grid[1] along h.
    gw, gh = np.meshgrid(grid_w, grid_h)
    emb_h = emb_1d(embed_dim // 2, gw)
    emb_w = emb_1d(embed_dim // 2, gh)
    return np.concatenate([emb_h, emb_w], axis=1)


def relative_pos_bias(embed_dim: int, grid_size) -> np.ndarray:
    """-(2 * P P^T / dim): the additive KNN distance bias, (n, n)
    (reference `gcn_lib/pos_embed.py:21-28` negated at `torch_vertex.py:227`).
    `grid_size`: int or (H, W)."""
    p = sincos_pos_embed_2d(embed_dim, grid_size)
    rel = 2.0 * (p @ p.T) / p.shape[1]
    return (-rel).astype(np.float32)


def dense_knn(nodes: jnp.ndarray, k: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """k nearest neighbours of every node.

    nodes: (B, N, C) raw features.  Distances are computed on L2-normalized
    features with the relative-position bias added, all under stop_gradient.
    Returns int32 indices (B, N, k).
    """
    x = jax.lax.stop_gradient(nodes)
    x = x * jax.lax.rsqrt(
        jnp.sum(x * x, axis=-1, keepdims=True) + 1e-24)
    sq = jnp.sum(x * x, axis=-1, keepdims=True)        # (B, N, 1)
    # full precision: under jax_default_matmul_precision='bfloat16' the
    # cancellation-prone sq - 2xy + sq^T would flip near-tie neighbour
    # rankings vs the reference's f32 KNN (cost is negligible at N=144)
    dist = (sq - 2.0 * jnp.einsum("bnc,bmc->bnm", x, x,
                                  precision=jax.lax.Precision.HIGHEST)
            + jnp.swapaxes(sq, 1, 2))
    dist = dist + rel_pos[None]
    # whole-image mode can reach bottlenecks smaller than k+1 nodes
    # (e.g. a 32px input -> 2x2 grid); clamp instead of crashing top_k
    _, idx = jax.lax.top_k(-dist, min(k, dist.shape[-1]))
    return idx


class GroupedDense(nn.Module):
    """Grouped 1x1 conv over node features == block-diagonal matmul
    (reference `gcn_lib/torch_nn.py:54-78`, Conv2d(..., 1, groups=4))."""
    features: int
    groups: int = 4

    @nn.compact
    def __call__(self, x):  # x: (B, N, C)
        b, n, c = x.shape
        g = self.groups

        def grouped_xavier_gain2(key, shape, dtype=jnp.float32):
            # torch xavier_normal_(gain=sqrt(2)) on the grouped Conv2d
            # weight (O, I/g, 1, 1): fan_in = I/g (per group), fan_out = O
            # (`model_save_util.py:41-47` applied to `torch_nn.py:54-78`).
            # flax variance_scaling would count the group dim into fan_in
            # (= full I), starting this one layer ~21% smaller than every
            # other xavier_gain2 layer.
            _, in_pg, out_pg = shape
            std = np.sqrt(2.0) * np.sqrt(2.0 / (in_pg + out_pg * g))
            return jax.random.normal(key, shape, dtype) * std

        kernel = self.param("kernel", grouped_xavier_gain2,
                            (g, c // g, self.features // g))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jnp.einsum("bngi,gio->bngo", x.reshape(b, n, g, c // g), kernel)
        return y.reshape(b, n, self.features) + bias


def drop_path(x: jnp.ndarray, rate: float, deterministic: bool,
              rng=None) -> jnp.ndarray:
    """Per-sample stochastic depth (timm DropPath)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    return x * mask / keep


class GrapherFFN(nn.Module):
    """One Grapher_noBN + FFN pair (the single GCN bottleneck block,
    `models/unet_multi_filters/Unet.py:69-80` with blocks=[1])."""
    ch: int
    k: int = 9
    grid: int = 12
    drop_path_rate: float = 0.05

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        b, h, w, c = x.shape
        n = h * w
        if (h, w) == (self.grid, self.grid):
            rel_pos = jnp.asarray(relative_pos_bias(self.ch, self.grid))
        else:
            # Arbitrary bottleneck (whole-image inference): the bias is
            # deterministic sincos geometry, so REGENERATE it exactly for
            # the actual (h, w) layout.  The reference Grapher instead
            # bicubic-interpolates the stored n x n matrix
            # (`gcn_lib/torch_vertex.py:211-217`) — row-major index
            # interpolation that silently assumes a square layout (and a
            # gate on N alone would hand a 9x16 = 144-node bottleneck the
            # 12x12-layout bias verbatim).  Deviation documented; the
            # tiled/published path is always exactly grid x grid.
            rel_pos = jnp.asarray(
                relative_pos_bias(self.ch, (h, w))).astype(x.dtype)
        nodes_in = x.reshape(b, n, c)

        # ---- Grapher_noBN (`gcn_lib/torch_vertex.py:181-227`)
        shortcut = nodes_in
        nodes = nn.Dense(self.ch, kernel_init=xavier_gain2, name="fc1")(nodes_in)
        idx = dense_knn(nodes, self.k, rel_pos)              # (B, N, k)
        x_j = _gather_nodes(nodes, idx)                      # (B, N, k, C)
        rel = jnp.max(x_j - nodes[:, :, None, :], axis=2)    # (B, N, C)
        # channel-interleave [x, rel] -> 2C (`torch_vertex.py:28-29`)
        mr = jnp.stack([nodes, rel], axis=-1).reshape(b, n, 2 * c)
        mr = GroupedDense(2 * self.ch, groups=4, name="gconv")(mr)
        mr = jax.nn.gelu(mr, approximate=False)
        out = nn.Dense(self.ch, kernel_init=xavier_gain2, name="fc2")(mr)
        rng = self.make_rng("droppath") if not deterministic else None
        out = drop_path(out, self.drop_path_rate, deterministic, rng) + shortcut

        # ---- FFN (`models/unet_multi_filters/Unet.py:20-42`)
        shortcut = out
        y = nn.Dense(self.ch, kernel_init=xavier_gain2, name="ffn_fc1")(out)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.ch, kernel_init=xavier_gain2, name="ffn_fc2")(y)
        rng = self.make_rng("droppath") if not deterministic else None
        y = drop_path(y, self.drop_path_rate, deterministic, rng) + shortcut
        return y.reshape(b, h, w, c)


def _gather_nodes(nodes: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """nodes: (B, N, C), idx: (B, N, k) -> (B, N, k, C)."""
    b, n, c = nodes.shape
    k = idx.shape[-1]
    flat = jnp.take_along_axis(
        nodes[:, None, :, :],                # (B, 1, N, C)
        idx.reshape(b, 1, n * k, 1),         # (B, 1, N*k, 1)
        axis=2)
    return flat.reshape(b, n, k, c)


class GCNBlock(nn.Module):
    """pos_embed add + GrapherFFN (reference `Unet.py:44-99`)."""
    ch: int
    grid: int = 12
    k: int = 9
    drop_path_rate: float = 0.05

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, self.grid, self.grid, self.ch))
        if x.shape[1:3] != (self.grid, self.grid):
            # The reference adds the fixed 12x12 pos_embed by broadcast
            # (`Unet.py:93`), which CRASHES for any bottleneck that isn't
            # grid x grid — i.e. its non-tiled inference only runs on
            # inputs of exactly 16*(grid-1)+16 px.  Deviation (documented):
            # bicubic-resize the embedding to the actual bottleneck, the
            # standard ViG treatment and the same interpolation its own
            # Grapher applies to relative_pos.
            from uncltmo_tpu.ops.resize import bicubic_resize
            pos = bicubic_resize(pos.astype(x.dtype),
                                 x.shape[1], x.shape[2])
        x = x + pos
        return GrapherFFN(self.ch, self.k, self.grid, self.drop_path_rate,
                          name="grapher")(x, deterministic=deterministic)
