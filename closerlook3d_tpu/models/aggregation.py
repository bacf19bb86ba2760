"""The four local aggregation operator families — the scientific core.

Behavioral spec (SURVEY.md §2.4, paper arXiv:2007.01294 §3 eq. 1-5;
reference: pytorch/models/local_aggregation_operators.py):

  Common form: for query point i with padded neighborhood N(i) (ball
  query, max K, radius r), output
      y_i = R({ G(dp_ij, f_j) : j in N(i) }),  dp_ij = p_j - p_i,
  with masked reduction R in {max, avg, sum}. dp is normalized by the
  ball radius so every operator sees O(1) offsets (bf16-safe).

  1. PointWiseMLP:  G = MLP(concat of [dp | f_j | f_j - f_i] per
     ``feature_type``); best paper config dp_fi_df / 1 FC / max.
  2. PseudoGrid (KPConv-style): fixed kernel points in the unit ball;
     neighbor features are distributed to kernel points by linear
     correlation max(0, 1 - d/extent); per-kernel-point weight matrices;
     sum aggregation. Kernel point layouts come from the same
     energy-minimization procedure KPConv uses (deterministic, cached).
  3. AdaptiveWeight: small MLP on dp predicts a per-neighbor weight
     vector (optionally softmax-normalized over the neighborhood,
     optionally shared across channel groups); weighted reduction.
  4. PosPool (parameter-free): xyz variant multiplies channel thirds by
     (dx, dy, dz); sin_cos variant multiplies features elementwise by a
     transformer-style sinusoidal embedding of dp.

TPU notes: the jnp path below gathers [B,Nq,K,C] and lets XLA fuse
gather+encode+reduce; the fused Pallas kernels (ops/pallas/aggregation)
replace the hot inner body when enabled via ops.dispatch.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from closerlook3d_tpu.ops.grouping import (
    group_features,
    group_xyz,
    masked_avg,
    masked_max,
    masked_sum,
)

_REDUCTIONS = {"max": masked_max, "avg": masked_avg, "mean": masked_avg,
               "sum": masked_sum}


@functools.lru_cache(maxsize=None)
def kernel_point_layout(num_points: int, fixed: str = "center",
                        seed: int = 0) -> np.ndarray:
    """Deterministic kernel-point disposition in the unit ball.

    KPConv obtains its rigid layouts by minimizing repulsive electrostatic
    energy with points confined to a sphere (optionally one point fixed at
    the center). We run the same style of optimization in numpy with a
    fixed seed; the result is cached per (K, fixed).

    Returns [K, 3] float32 with max norm 1.
    """
    rng = np.random.default_rng(seed)
    k = num_points
    pts = rng.normal(size=(k, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True) + 1e-9
    pts *= rng.uniform(0.3, 1.0, size=(k, 1))
    if fixed == "center":
        pts[0] = 0.0
    lr = 0.01
    for _ in range(400):
        diff = pts[:, None, :] - pts[None, :, :]  # [K, K, 3]
        d = np.linalg.norm(diff, axis=-1) + 1e-9
        np.fill_diagonal(d, np.inf)
        force = (diff / d[..., None] ** 3).sum(axis=1)  # repulsion
        pts = pts + lr * force
        if fixed == "center":
            pts[0] = 0.0
        norms = np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-9)
        pts = np.where(norms > 1.0, pts / norms, pts)  # confine to ball
    scale = np.abs(pts).max() if k == 1 else np.linalg.norm(pts, axis=1).max()
    return (pts / max(scale, 1e-9)).astype(np.float32)


def _typical_spacing(kp: np.ndarray) -> float:
    """Mean nearest-neighbor distance among kernel points (influence scale)."""
    if kp.shape[0] < 2:
        return 1.0
    d = np.linalg.norm(kp[:, None] - kp[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    return float(d.min(axis=1).mean())


def sinusoidal_embedding(dp_hat: jax.Array, channels: int,
                         alpha: float = 100.0, beta: float = 1000.0
                         ) -> jax.Array:
    """Transformer-style positional embedding of relative offsets.

    [..., 3] -> [..., channels]; channels must be divisible by 6
    (3 coords x sin/cos x channels//6 frequencies). alpha/beta follow the
    PosPool paper's sin/cos variant (scale 100, temperature 1000) [L].

    Canonical layout (shared with the Pallas kernel): coordinate-major
    blocks of [sin(freq_0..n), cos(freq_0..n)].
    """
    assert channels % 6 == 0, "sin_cos PosPool needs channels % 6 == 0"
    ndim = channels // 6
    exps = jnp.arange(ndim, dtype=jnp.float32) / ndim
    freq = beta**exps  # [ndim]
    ang = alpha * dp_hat[..., None] / freq  # [..., 3, ndim]
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return emb.reshape(*dp_hat.shape[:-1], channels)


class LocalAggregation(nn.Module):
    """Uniform interface over the four operator families.

    __call__(query_xyz, support_xyz, support_features, neighbor_idx,
             neighbor_mask, train) -> [B, Nq, out_channels]
    """

    out_channels: int
    radius: float
    config: Any  # full experiment config (reads local_aggregation_type + subtree)
    dtype: Any = jnp.float32

    #: support-size cap for the fused kernels. All kernel families are
    #: chunk-skipping now (scratch accumulators + per-tile active-chunk
    #: flags; with Morton-sorted inputs each query tile touches 1-2
    #: support chunks, so cost is O(K*Nq*cs) regardless of Ns) — bounded
    #: only by the support feature block fitting VMEM.
    _CAP_CHUNKED = 32768

    def _fused_enabled(self, support_features, cap: int = 4096) -> bool:
        """Pallas eligibility: config switch, platform, O(Ns) scale cap."""
        cfg = self.config
        if cfg.use_pallas == "never":
            return False
        if cfg.use_pallas == "always":
            return True
        import jax
        on_tpu = jax.default_backend() not in ("cpu",)
        return on_tpu and support_features.shape[1] <= cap

    def _use_fused_pospool(self, support_features) -> bool:
        p = self.config.pospool
        c = support_features.shape[-1]
        if p.reduction not in ("avg", "sum"):
            return False
        if p.position_embedding == "xyz" and c % 3 == 0:
            return self._fused_enabled(support_features, self._CAP_CHUNKED)
        if p.position_embedding == "sin_cos" and c % 6 == 0:
            return self._fused_enabled(support_features, self._CAP_CHUNKED)
        return False

    def _use_fused_adaptive(self, support_features) -> bool:
        """The paper's default adaptive config (single linear FC on dp,
        no softmax) factorizes exactly through neighborhood moments."""
        p = self.config.adaptive_weight
        return (self._fused_enabled(support_features, self._CAP_CHUNKED)
                and p.local_input_feature == "dp" and p.fc_num == 1
                and not p.weight_softmax
                and p.reduction in ("avg", "sum"))

    @nn.compact
    def __call__(self, query_xyz, support_xyz, support_features,
                 neighbor_idx, neighbor_mask, train: bool = False):
        cfg = self.config
        agg_type = cfg.local_aggregation_type

        if agg_type == "pospool" and self._use_fused_pospool(support_features):
            from closerlook3d_tpu.ops.pallas.aggregation import pospool_fused
            out = pospool_fused(
                query_xyz.astype(jnp.float32),
                support_xyz.astype(jnp.float32),
                support_features, neighbor_idx, neighbor_mask,
                float(self.radius), cfg.pospool.position_embedding,
                cfg.pospool.reduction)
            return self._maybe_output_conv(out, cfg.pospool, train)

        if (agg_type == "adaptive_weight"
                and self._use_fused_adaptive(support_features)):
            out = self._adaptive_weight_fused(
                query_xyz, support_xyz, support_features, neighbor_idx,
                neighbor_mask)
            return self._maybe_output_conv(out, cfg.adaptive_weight, train)

        if (agg_type == "pointwisemlp"
                and self._use_fused_pointwisemlp(support_features)):
            out = self._pointwisemlp_factorized(
                query_xyz, support_xyz, support_features, neighbor_idx,
                neighbor_mask, train)
            return self._maybe_output_conv(out, cfg.pointwisemlp, train)

        if (agg_type == "pseudo_grid"
                and self._fused_enabled(support_features,
                                        self._CAP_CHUNKED)):
            out = self._pseudo_grid_fused(
                query_xyz, support_xyz, support_features, neighbor_idx,
                neighbor_mask)
            return self._maybe_output_conv(out, cfg.pseudo_grid, train)

        # two gathers: features in their own dtype, coordinates in f32
        # (bf16 absolute coordinates would corrupt dp — differences of
        # metre-scale values at ~0.1 radius; a combined f32 gather moves
        # 2x the feature bytes and measured slower at S3DIS scale)
        f = group_features(support_features, neighbor_idx)  # [B,Nq,K,C]
        pj = group_xyz(support_xyz.astype(jnp.float32), neighbor_idx)
        dp = (pj - query_xyz[:, :, None, :].astype(jnp.float32)) \
            / jnp.float32(self.radius)
        dp = dp.astype(f.dtype)

        if agg_type == "pospool":
            out = self._pospool(dp, f, neighbor_mask)
            ocfg = cfg.pospool
        elif agg_type == "pointwisemlp":
            out = self._pointwisemlp(dp, f, neighbor_mask, train)
            ocfg = cfg.pointwisemlp
        elif agg_type == "pseudo_grid":
            out = self._pseudo_grid(dp, f, neighbor_mask)
            ocfg = cfg.pseudo_grid
        elif agg_type == "adaptive_weight":
            out = self._adaptive_weight(dp, f, neighbor_mask, train)
            ocfg = cfg.adaptive_weight
        else:
            raise ValueError(f"unknown local_aggregation_type: {agg_type}")

        return self._maybe_output_conv(out, ocfg, train)

    def _maybe_output_conv(self, out, ocfg, train):
        if (getattr(ocfg, "output_conv", False)
                or out.shape[-1] != self.out_channels):
            from closerlook3d_tpu.models.nn_utils import ConvBN
            out = ConvBN(self.out_channels, self.config.batchnorm_momentum,
                         dtype=self.dtype)(out, train=train)
        return out

    # ---- operator families ------------------------------------------------

    def _pospool(self, dp, f, mask):
        p = self.config.pospool
        c = f.shape[-1]
        if p.position_embedding == "xyz":
            assert c % 3 == 0, "xyz PosPool needs channels % 3 == 0"
            g = c // 3
            enc = jnp.concatenate(
                [f[..., :g] * dp[..., 0:1],
                 f[..., g:2 * g] * dp[..., 1:2],
                 f[..., 2 * g:] * dp[..., 2:3]], axis=-1)
        elif p.position_embedding == "sin_cos":
            emb = sinusoidal_embedding(dp.astype(jnp.float32), c)
            enc = f * emb.astype(f.dtype)
        else:
            raise ValueError(p.position_embedding)
        return _REDUCTIONS[p.reduction](enc, mask)

    def _pointwisemlp(self, dp, f, mask, train):
        """Gather-based path. Masked BN over neighbor slots (see
        nn_utils.MaskedBatchNorm for the deviation note vs torch BN)."""
        from closerlook3d_tpu.models.nn_utils import MaskedBatchNorm
        p = self.config.pointwisemlp
        parts = []
        if "dp" in p.feature_type:
            parts.append(dp)
        if "fi" in p.feature_type:
            parts.append(f)
        if "df" in p.feature_type:
            # f_i = center feature. The ordered ball query sorts by
            # ascending distance, so slot 0 is EXACTLY the query's own
            # feature in same-resolution blocks (self at d=0) and the
            # in-radius 1-NN in strided blocks — the reference's
            # MaskedNearestQuery (N3) nearest-carrier convention at
            # stage transitions. Pinned by
            # tests/test_ops_neighbors.py::test_ball_query_slot0_*.
            parts.append(f - f[:, :, :1, :])
        h = jnp.concatenate(parts, axis=-1)
        for i in range(p.num_mlps):
            w = self.param(f"pw_kernel_{i}", nn.initializers.lecun_normal(),
                           (h.shape[-1], self.out_channels), jnp.float32)
            h = jnp.dot(h, w.astype(h.dtype),
                        precision=(jax.lax.Precision.HIGHEST
                                   if h.dtype == jnp.float32 else None))
            h = MaskedBatchNorm(
                self.out_channels, self.config.batchnorm_momentum,
                dtype=self.dtype, name=f"pw_bn_{i}")(h, mask, train)
            h = nn.relu(h)
        return _REDUCTIONS[p.reduction](h, mask)

    def _use_fused_pointwisemlp(self, support_features) -> bool:
        """The paper's best config (one FC, max pool) factorizes: the FC
        collapses to per-point projections; see ops/pallas/gather_reduce."""
        p = self.config.pointwisemlp
        return (self._fused_enabled(support_features, self._CAP_CHUNKED)
                and p.num_mlps == 1 and p.reduction == "max")

    def _pointwisemlp_factorized(self, query_xyz, support_xyz,
                                 support_features, idx, mask, train):
        from closerlook3d_tpu.models.nn_utils import MaskedBatchNorm
        from closerlook3d_tpu.ops.pallas.gather_reduce import (
            gather_sub_minmax, pwmlp_minmax_stats)

        cfg = self.config
        p = cfg.pointwisemlp
        c = support_features.shape[-1]
        cout = self.out_channels
        ft = p.feature_type
        din = ((3 if "dp" in ft else 0) + (c if "fi" in ft else 0)
               + (c if "df" in ft else 0))
        w = self.param("pw_kernel_0", nn.initializers.lecun_normal(),
                       (din, cout), jnp.float32)
        bn = MaskedBatchNorm(cout, cfg.batchnorm_momentum,
                             dtype=jnp.float32, name="pw_bn_0")
        inv_r = jnp.float32(1.0 / float(self.radius))
        # dtype-matched projections: bf16 models do single-pass bf16 MXU
        # matmuls with f32 accumulation (same treatment as the pospool /
        # moments kernels); f32 models keep HIGHEST.
        cdt = self.dtype
        prec = jax.lax.Precision.HIGHEST if cdt == jnp.float32 else None

        def _dot(x, ws):
            return jnp.dot(x.astype(cdt), ws.astype(cdt), precision=prec,
                           preferred_element_type=jnp.float32)

        fx = support_features
        g = jnp.zeros((*support_features.shape[:2], cout), jnp.float32)
        d = jnp.zeros((*query_xyz.shape[:2], cout), jnp.float32)
        off = 0
        if "dp" in ft:
            wdp = w[0:3]
            g = g + _dot(support_xyz.astype(jnp.float32) * inv_r, wdp)
            d = d + _dot(query_xyz.astype(jnp.float32) * inv_r, wdp)
            off = 3
        if "fi" in ft:
            g = g + _dot(fx, w[off:off + c])
            off += c
        if "df" in ft:
            wdf = w[off:off + c]
            g = g + _dot(fx, wdf)
            f0 = jnp.take_along_axis(fx, idx[:, :, 0][:, :, None], axis=1)
            d = d + _dot(f0, wdf)

        if train:
            # fused kernel: the "- d" of h commutes out of max/min, so
            # one pass yields the extrema AND the BN-stat sums from a
            # single one-hot build (see ops/pallas/gather_reduce)
            gmax, gmin, s1, s2 = pwmlp_minmax_stats(
                g.astype(cdt), (g * g).astype(cdt), idx, mask)
            hmax, hmin = gmax - d, gmin - d
            cnt = jnp.sum(mask, -1).astype(jnp.float32)[..., None]
            total = jnp.maximum(jnp.sum(cnt), 1.0)
            mean = jnp.sum(s1 - cnt * d, axis=(0, 1)) / total
            ex2 = jnp.sum(s2 - 2.0 * d * s1 + cnt * d * d,
                          axis=(0, 1)) / total
            var = jnp.maximum(ex2 - mean**2, 0.0)
            eff_s, eff_b = bn.stats_affine(mean, var, True)
        else:
            eff_s, eff_b = bn.stats_affine(None, None, False)
            hmax, hmin = gather_sub_minmax(
                g.astype(self.dtype), d.astype(self.dtype), idx, mask)
        # monotonicity: max_k relu(s*h+b) = relu(s*max h + b) for s>=0,
        # relu(s*min h + b) for s<0
        eff_s32 = eff_s.astype(jnp.float32)
        h = jnp.where(eff_s32 >= 0, eff_s32 * hmax, eff_s32 * hmin) \
            + eff_b.astype(jnp.float32)
        out = nn.relu(h)
        any_valid = jnp.any(mask, axis=-1, keepdims=True)
        return jnp.where(any_valid, out, 0.0).astype(self.dtype)

    def _pseudo_grid_fused(self, query_xyz, support_xyz,
                           support_features, idx, mask):
        """Fused kernel-point correlation (ops/pallas/pseudo_grid); the
        per-kernel-point weight matmul stays here so W gets ordinary
        autodiff and shares its name with the jnp path."""
        from closerlook3d_tpu.ops.pallas.pseudo_grid import pseudo_grid_fused
        p = self.config.pseudo_grid
        kp_np = kernel_point_layout(p.num_kernel_points,
                                    p.fixed_kernel_points)
        extent = float(p.KP_extent * _typical_spacing(kp_np))
        h = pseudo_grid_fused(
            query_xyz.astype(jnp.float32), support_xyz.astype(jnp.float32),
            support_features, idx, mask, jnp.asarray(kp_np),
            float(self.radius), extent, p.KP_influence)  # [B, Nq, Kp*C]
        w = self.param(
            "kernel_weights", nn.initializers.lecun_normal(),
            (h.shape[-1], self.out_channels), jnp.float32)
        out = h @ w.astype(h.dtype)
        if p.convolution_mode == "avg":
            cnt = jnp.sum(mask, axis=-1, keepdims=True).astype(out.dtype)
            out = out / jnp.maximum(cnt, 1.0)
        return out

    def _pseudo_grid(self, dp, f, mask):
        p = self.config.pseudo_grid
        kp_np = kernel_point_layout(p.num_kernel_points,
                                    p.fixed_kernel_points)
        extent = jnp.float32(p.KP_extent * _typical_spacing(kp_np))
        kp = jnp.asarray(kp_np, dtype=jnp.float32)
        d = jnp.linalg.norm(
            dp.astype(jnp.float32)[..., None, :] - kp, axis=-1
        )  # [B,Nq,K,Kp]
        if p.KP_influence == "linear":
            infl = jnp.maximum(1.0 - d / extent, 0.0)
        elif p.KP_influence == "constant":
            infl = (d <= extent).astype(jnp.float32)
        elif p.KP_influence == "gaussian":
            sig = extent * 0.3
            infl = jnp.exp(-(d**2) / (2 * sig**2))
        else:
            raise ValueError(p.KP_influence)
        infl = infl * mask[..., None].astype(infl.dtype)
        # distribute neighbor features onto kernel points, then one big
        # [Kp*C -> C_out] matmul (MXU-friendly form of per-KP weights)
        h = jnp.einsum("bnkp,bnkc->bnpc", infl.astype(f.dtype), f)
        b, nq, kpn, c = h.shape
        w = self.param(
            "kernel_weights",
            nn.initializers.lecun_normal(),
            (kpn * c, self.out_channels), jnp.float32)
        out = h.reshape(b, nq, kpn * c) @ w.astype(f.dtype)
        if p.convolution_mode == "avg":
            cnt = jnp.sum(mask, axis=-1, keepdims=True).astype(out.dtype)
            out = out / jnp.maximum(cnt, 1.0)
        return out

    def _adaptive_weight_fused(self, query_xyz, support_xyz,
                               support_features, idx, mask):
        """Factorized adaptive weight (single linear FC on dp, no softmax).

        y = R_k((W dp + b) ⊙ f) = Σ_d W_d ⊙ R(dp_d f) + b ⊙ R(f): exactly
        the neighborhood-moments kernel contracted with the FC params. The
        nn.Dense is instantiated identically to the jnp path (same param
        names); its kernel/bias are read out via basis vectors.
        """
        from closerlook3d_tpu.ops.pallas.moments import neighborhood_moments
        p = self.config.adaptive_weight
        c = support_features.shape[-1]
        assert c % p.shared_channels == 0
        cw = c // p.shared_channels
        dense = nn.Dense(cw, dtype=self.dtype, param_dtype=jnp.float32)
        basis = jnp.concatenate(
            [jnp.zeros((1, 3)), jnp.eye(3)], axis=0).astype(self.dtype)
        wb = dense(basis)  # [4, cw]: row 0 = bias, rows 1..3 = W_d + bias
        bias, wd = wb[0], wb[1:] - wb[0]

        mom = neighborhood_moments(
            query_xyz.astype(jnp.float32), support_xyz.astype(jnp.float32),
            support_features, idx, mask, float(self.radius), p.reduction)
        m0, mx, my, mz = jnp.split(mom, 4, axis=-1)

        def expand(v):  # [cw] -> [C] (channel c uses row c // shared)
            return (jnp.repeat(v, p.shared_channels)
                    if p.shared_channels > 1 else v)

        return (expand(bias) * m0 + expand(wd[0]) * mx
                + expand(wd[1]) * my + expand(wd[2]) * mz)

    def _adaptive_weight(self, dp, f, mask, train):
        from closerlook3d_tpu.models.nn_utils import ConvBN
        p = self.config.adaptive_weight
        c = f.shape[-1]
        assert c % p.shared_channels == 0
        cw = c // p.shared_channels
        parts = [dp]
        if "fi" in p.local_input_feature:
            parts.append(f)
        if "df" in p.local_input_feature:
            parts.append(f - f[:, :, :1, :])
        h = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else dp
        for _ in range(max(p.fc_num - 1, 0)):
            h = ConvBN(cw, self.config.batchnorm_momentum,
                       dtype=self.dtype)(h, train=train)
        w = nn.Dense(cw, dtype=self.dtype, param_dtype=jnp.float32)(h)
        if p.weight_softmax:
            w32 = w.astype(jnp.float32)
            w32 = jnp.where(mask[..., None], w32, -1e9)
            w = jax.nn.softmax(w32, axis=2).astype(f.dtype)
        if p.shared_channels > 1:
            w = jnp.repeat(w, p.shared_channels, axis=-1)
        return _REDUCTIONS[p.reduction](w * f, mask)
