"""Pallas-kernel exactness in interpret mode — CPU-runnable CI guard.

The kernels auto-interpret off-TPU (`knn_pallas._interpret_mode`), so the
kernel LOGIC (tiling, candidate metadata, packed selection keys, DMA
layout arithmetic) is exercised on every plain pytest run; the real-chip
lowering is covered by tests/test_tpu_kernels.py (APNERF_TPU_TESTS=1,
recorded per round in README). Small shapes — interpret mode executes
grid steps sequentially."""
import numpy as np

import jax.numpy as jnp


def _cloud(rng, M, P, spread=0.1):
    p = rng.normal(size=(P, 3)).astype(np.float32)
    q = (p[rng.integers(0, P, M)]
         + rng.normal(size=(M, 3)).astype(np.float32) * spread)
    return q, p


def test_knn_pallas_interpret_exact():
    from apnerf.kernels.knn_pallas import knn_pallas_sorted
    rng = np.random.default_rng(0)
    q, p = _cloud(rng, 512, 1500, spread=1.0)
    d2, idx = knn_pallas_sorted(jnp.asarray(q), jnp.asarray(p), k=8)
    full = ((q[:, None, :] - p[None]) ** 2).sum(-1)
    ref_d = np.sort(full, 1)[:, :8]
    np.testing.assert_allclose(np.sort(np.asarray(d2), 1), ref_d,
                               rtol=1e-4, atol=1e-6)
    got = np.take_along_axis(full, np.asarray(idx), axis=1)
    np.testing.assert_allclose(np.sort(got, 1), ref_d, rtol=1e-4, atol=1e-6)


def test_knn_radius_interpret_matches_bruteforce():
    from apnerf.kernels.knn_cells_pallas import knn_radius_pallas
    rng = np.random.default_rng(1)
    q, p = _cloud(rng, 512, 1500)
    r2 = 0.05
    d2, idx = knn_radius_pallas(jnp.asarray(q), jnp.asarray(p), k=8,
                                radius2=r2)
    d2 = np.asarray(d2)
    idx = np.asarray(idx)
    full = ((q[:, None, :] - p[None]) ** 2).sum(-1)
    ref_d = np.sort(full, 1)[:, :8]
    # within the radius the selection is exact up to the documented
    # 2^-11-relative key truncation; beyond it neighbours may be missing
    ok = ref_d[:, -1] <= r2
    got = np.take_along_axis(full, idx, axis=1)
    np.testing.assert_allclose(np.sort(got[ok], 1), ref_d[ok],
                               rtol=2 ** -10, atol=1e-7)
    # the kth selection key must agree with the true kth distance at the
    # cutoff decision for every query whose kth neighbour is in-radius
    assert (d2[ok][:, -1] <= r2 * (1 + 2 ** -10)).all()


def test_knn_radius_interpret_k12():
    from apnerf.kernels.knn_cells_pallas import knn_radius_pallas
    rng = np.random.default_rng(2)
    q, p = _cloud(rng, 256, 1200)
    r2 = 0.08
    d2, idx = knn_radius_pallas(jnp.asarray(q), jnp.asarray(p), k=12,
                                radius2=r2)
    full = ((q[:, None, :] - p[None]) ** 2).sum(-1)
    ref_d = np.sort(full, 1)[:, :12]
    ok = ref_d[:, -1] <= r2
    got = np.take_along_axis(full, np.asarray(idx), axis=1)
    np.testing.assert_allclose(np.sort(got[ok], 1), ref_d[ok],
                               rtol=2 ** -10, atol=1e-7)


def test_knn_count_interpret_matches_bruteforce():
    from apnerf.kernels.knn_cells_pallas import knn_count_pallas
    rng = np.random.default_rng(3)
    q, p = _cloud(rng, 512, 1500)
    r2 = 0.05
    cnt = np.asarray(knn_count_pallas(jnp.asarray(q), jnp.asarray(p),
                                      radius2=r2))
    full = ((q[:, None, :] - p[None]) ** 2).sum(-1)
    ref = (full <= r2).sum(-1)
    np.testing.assert_array_equal(cnt, ref)


def test_fused_agg_interpret_matches_xla():
    """kernels/agg_pallas vs the XLA shared-aggregation math (the block_fn
    formulation of temporal_points._aggregate_subgroup_shared): aggregated
    features, kth distances and the top-K selection must agree within bf16
    tolerance on random data, including invalid-candidate sentinels."""
    import jax
    from apnerf.kernels.agg_pallas import fused_subgroup_agg
    from apnerf.ops import encoding, nn

    rng = np.random.default_rng(5)
    S, share, kc, K, F, pe = 16, 4, 12, 8, 32, 10
    eps = 1e-6
    q = rng.normal(size=(S, share, 3)).astype(np.float32) * 0.2
    nbr = (q[:, :1] + rng.normal(size=(S, kc, 3)).astype(np.float32)
           * 0.1).astype(np.float32)
    # a few invalid candidates (sentinel positions)
    inv = rng.uniform(size=(S, kc)) < 0.15
    nbr[inv] = 2e9
    # random rotations (orthonormality not required by the math)
    rot = rng.normal(size=(S, kc, 3, 3)).astype(np.float32)
    feat = (rng.normal(size=(S, kc, F)).astype(np.float32) * 0.3)
    fin = 3 * (1 + 2 * pe) + F
    fp = nn.init_mlp(jax.random.PRNGKey(0), [fin] + [F] * 4)

    # kernel API: candidate-major tables, member-major outputs
    h, kd2 = fused_subgroup_agg(
        jnp.asarray(q), jnp.asarray(nbr.transpose(1, 0, 2)),
        jnp.asarray(rot.reshape(S, kc, 9).transpose(1, 0, 2)),
        jnp.asarray(feat.transpose(1, 0, 2), jnp.bfloat16), fp,
        share=share, K=K, eps=eps, sb=8)
    h = jnp.transpose(h, (1, 0, 2))
    kd2 = jnp.transpose(kd2, (1, 0))

    # ---- XLA reference (mirrors block_fn with agg_bf16) ---------------
    rel = q[:, :, None, :] - nbr[:, None, :, :]           # [S, sh, kc, 3]
    to_nn = (rel ** 2).sum(-1)
    ar = np.arange(kc)
    less = (to_nn[..., :, None] > to_nn[..., None, :]) | (
        (to_nn[..., :, None] == to_nn[..., None, :])
        & (ar[:, None] > ar[None, :]))
    rank = less.sum(-1)
    top = rank < K
    kd2_ref = np.where(top, to_nn, -np.inf).max(-1)
    w = np.where(top, 1.0 / (to_nn + eps), 0.0)
    w = w / np.maximum(w.sum(-1, keepdims=True), 1e-30)
    rc = np.einsum("mkab,mskb->mska", rot, rel)
    emb = np.asarray(encoding.poc_fre(jnp.asarray(rc),
                                      encoding.poc_freqs(pe)))
    x = np.concatenate(
        [emb, np.broadcast_to(feat[:, None], (S, share, kc, F))], -1)
    fpb = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16), fp)
    h_k = np.asarray(nn.mlp(fpb, jnp.asarray(x, jnp.bfloat16),
                            activation=nn.leaky_relu,
                            final_activation=nn.leaky_relu),
                     np.float32)
    h_ref = (h_k * w[..., None]).sum(2)

    # valid samples: those whose top-K stayed within real candidates
    ok = kd2_ref < 1e17
    np.testing.assert_allclose(np.asarray(kd2)[ok], kd2_ref[ok],
                               rtol=1e-5, atol=1e-6)
    assert ((np.asarray(kd2) > 1e17) == ~ok).all()
    np.testing.assert_allclose(np.asarray(h)[ok], h_ref[ok],
                               rtol=0.05, atol=0.05)


def test_scatter_kernel_interpret_matches_numpy():
    from apnerf.kernels.scatter_pallas import sorted_window_accumulate
    rng = np.random.default_rng(4)
    M, C, n_rows = 4096, 8, 3000
    idx = np.sort(rng.integers(0, n_rows, M)).astype(np.int32)
    upd = rng.normal(size=(M, C)).astype(np.float32)
    out = np.asarray(sorted_window_accumulate(jnp.asarray(idx),
                                              jnp.asarray(upd), n_rows))
    ref = np.zeros((n_rows, C), np.float32)
    np.add.at(ref, idx, upd)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_scatter_kernel_transposed_matches_numpy():
    """transposed=True returns out [C, n_rows] written in that layout by
    the kernel (the grid-gradient reduce's contiguous-stream mode)."""
    from apnerf.kernels.scatter_pallas import sorted_window_accumulate
    rng = np.random.default_rng(6)
    M, C, n_rows = 4096, 96, 3000
    idx = np.sort(rng.integers(0, n_rows, M)).astype(np.int32)
    upd = rng.normal(size=(M, C)).astype(np.float32)
    out = np.asarray(sorted_window_accumulate(jnp.asarray(idx),
                                              jnp.asarray(upd), n_rows,
                                              transposed=True))
    assert out.shape == (C, n_rows)
    ref = np.zeros((n_rows, C), np.float32)
    np.add.at(ref, idx, upd)
    np.testing.assert_allclose(out, ref.T, rtol=1e-5, atol=1e-5)


def test_grid_backward_scatter_path_interpret(monkeypatch):
    """The full custom-VJP grid gradient with the Pallas scatter path
    FORCED (as on TPU: sort + transposed window accumulation + shifted
    corner reduce) vs plain autodiff of the 8-corner gather."""
    import jax
    from apnerf.ops import grid as gridops

    # force the TPU branch decisions inside _corner_gather_bwd (the package
    # re-exports shadow the submodule, so fetch it from sys.modules)
    import importlib
    knnmod = importlib.import_module("apnerf.ops.knn")
    monkeypatch.setattr(knnmod, "_tpu_default", lambda: True)
    # ... while keeping the Pallas call itself in interpret mode on CPU
    kp = importlib.import_module("apnerf.kernels.knn_pallas")
    monkeypatch.setattr(kp, "_interpret_mode", lambda: True)
    monkeypatch.setenv("APNERF_SCATTER", "1")
    monkeypatch.setenv("APNERF_PACK8", "0")   # fwd residual path off-TPU

    rng = np.random.default_rng(7)
    sx = sy = sz = 9
    C = 12
    grid = rng.normal(size=(sx, sy, sz, C)).astype(np.float32)
    pts = rng.uniform(-1.1, 1.1, size=(2048, 3)).astype(np.float32)
    xyz_min = jnp.asarray([-1.0, -1.0, -1.0])
    xyz_max = jnp.asarray([1.0, 1.0, 1.0])

    def loss(g):
        v = gridops.grid_interp(g, jnp.asarray(pts), xyz_min, xyz_max)
        return (v * v).sum()

    dg = np.asarray(jax.grad(loss)(jnp.asarray(grid)))

    # reference: plain autodiff through a naive gather interp
    def interp_ref(g):
        shape = jnp.asarray(g.shape[:3], jnp.float32)
        u = (jnp.asarray(pts) - xyz_min) / (xyz_max - xyz_min) * (shape - 1.0)
        i0f = jnp.floor(u)
        i0 = i0f.astype(jnp.int32)
        frac = u - i0f
        gf = g.reshape(-1, C)
        out = 0.0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    ii = i0 + jnp.asarray([dx, dy, dz])
                    ok = jnp.all((ii >= 0) & (ii < jnp.asarray(g.shape[:3])),
                                 axis=-1)
                    lin = (jnp.clip(ii[:, 0], 0, sx - 1) * sy
                           + jnp.clip(ii[:, 1], 0, sy - 1)) * sz \
                        + jnp.clip(ii[:, 2], 0, sz - 1)
                    w = (jnp.where(dx, frac[:, 0], 1 - frac[:, 0])
                         * jnp.where(dy, frac[:, 1], 1 - frac[:, 1])
                         * jnp.where(dz, frac[:, 2], 1 - frac[:, 2])
                         * ok.astype(jnp.float32))
                    out = out + gf[lin] * w[:, None]
        return out

    dg_ref = np.asarray(jax.grad(
        lambda g: (interp_ref(g) ** 2).sum())(jnp.asarray(grid)))
    np.testing.assert_allclose(dg, dg_ref, rtol=1e-4, atol=1e-4)


def test_scatter_kernel_bf16_rows_close(monkeypatch):
    """APNERF_SCATTER_BF16=1 (lossy single-pass mode): each contribution is
    bf16-rounded before the fp32 accumulation, so the result must match the
    exact scatter within bf16 relative tolerance of the summed magnitude."""
    monkeypatch.setenv("APNERF_SCATTER_BF16", "1")
    # fresh process-level jit cache entry: the env is read at trace time,
    # and the exact test above may have traced the same shapes already
    from apnerf.kernels import scatter_pallas as sp
    sp.sorted_window_accumulate._clear_cache()
    rng = np.random.default_rng(5)
    M, C, n_rows = 4096, 8, 3000
    idx = np.sort(rng.integers(0, n_rows, M)).astype(np.int32)
    upd = rng.normal(size=(M, C)).astype(np.float32)
    out = np.asarray(sp.sorted_window_accumulate(jnp.asarray(idx),
                                                 jnp.asarray(upd), n_rows))
    ref = np.zeros((n_rows, C), np.float32)
    np.add.at(ref, idx, upd.astype(np.float32))
    scale = np.abs(upd).sum() / n_rows + 1.0
    np.testing.assert_allclose(out, ref, rtol=0.02, atol=0.02 * scale)
    sp.sorted_window_accumulate._clear_cache()


def test_featmlp_interpret_matches_xla():
    """featmlp_agg (PE + MLP + weighted K-reduce) vs the XLA bf16
    formulation, incl. pose-embedding bias folding and row padding."""
    import jax
    from apnerf.ops import nn, encoding
    from apnerf.kernels.featmlp_pallas import featmlp_agg

    rng = np.random.default_rng(0)
    M, K, F, pb, pd = 193, 8, 128, 10, 32   # M not a multiple of any block
    P = 3 * (1 + 2 * pb)
    rel = jnp.asarray(rng.normal(size=(M, K, 3)).astype(np.float32) * 0.1)
    feat = jnp.asarray(
        rng.normal(size=(M, K, F)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.random((M, K)).astype(np.float32))
    pe = jnp.asarray(rng.normal(size=(pd,)).astype(np.float32) * 0.1)
    fp = nn.init_mlp(jax.random.PRNGKey(0), [P + F + pd, F, F, F, F])
    fp_bf = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), fp)

    emb = encoding.poc_fre(rel, encoding.poc_freqs(pb))
    fi = jnp.concatenate(
        [emb.astype(jnp.bfloat16), feat,
         jnp.broadcast_to(pe.astype(jnp.bfloat16), (M, K, pd))], -1)
    h_ref = (nn.mlp(fp_bf, fi, activation=nn.leaky_relu,
                    final_activation=nn.leaky_relu).astype(jnp.float32)
             * w[..., None]).sum(1)
    h = featmlp_agg(rel, feat, w, fp_bf, K=K, pe_freqs=pb,
                    pose_embedding=pe, interpret=True)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                               rtol=2e-2, atol=5e-3)


def test_featmlp_interpret_no_pose_small_depth():
    """feat_depth=2 and no pose embedding (layer-count generality)."""
    import jax
    from apnerf.ops import nn, encoding
    from apnerf.kernels.featmlp_pallas import featmlp_agg

    rng = np.random.default_rng(1)
    M, K, F, pb = 64, 4, 32, 4
    P = 3 * (1 + 2 * pb)
    rel = jnp.asarray(rng.normal(size=(M, K, 3)).astype(np.float32) * 0.2)
    feat = jnp.asarray(
        rng.normal(size=(M, K, F)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.random((M, K)).astype(np.float32))
    fp = nn.init_mlp(jax.random.PRNGKey(3), [P + F, F, F])
    fp_bf = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), fp)

    emb = encoding.poc_fre(rel, encoding.poc_freqs(pb))
    fi = jnp.concatenate([emb.astype(jnp.bfloat16), feat], -1)
    h_ref = (nn.mlp(fp_bf, fi, activation=nn.leaky_relu,
                    final_activation=nn.leaky_relu).astype(jnp.float32)
             * w[..., None]).sum(1)
    h = featmlp_agg(rel, feat, w, fp_bf, K=K, pe_freqs=pb,
                    interpret=True)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                               rtol=2e-2, atol=5e-3)


def test_featmlp_grad_matches_xla_reference():
    """featmlp_agg is differentiable: the custom VJP routes the backward
    through the XLA bf16 formulation, so grads of a loss through the
    kernel must match grads of the same loss through the XLA path (both
    sides differentiate the identical _xla_reference expression; fwd
    values differ only by bf16 rounding order and do not enter a
    sum-loss cotangent)."""
    import jax
    from apnerf.ops import nn
    from apnerf.kernels.featmlp_pallas import featmlp_agg, _xla_reference

    rng = np.random.default_rng(7)
    M, K, F, pb, pd = 96, 8, 32, 5, 8
    P = 3 * (1 + 2 * pb)
    rel = jnp.asarray(rng.normal(size=(M, K, 3)).astype(np.float32) * 0.1)
    feat = jnp.asarray(
        rng.normal(size=(M, K, F)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.random((M, K)).astype(np.float32))
    pe = jnp.asarray(rng.normal(size=(pd,)).astype(np.float32) * 0.1)
    fp = nn.init_mlp(jax.random.PRNGKey(0), [P + F + pd, F, F, F])
    fp_bf = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), fp)
    cot = jnp.asarray(rng.normal(size=(M, F)).astype(np.float32))

    def loss_k(p, rel, feat, w, pe):
        h = featmlp_agg(rel, feat, w, p, K=K, pe_freqs=pb,
                        pose_embedding=pe, interpret=True)
        return (h * cot).sum()

    def loss_x(p, rel, feat, w, pe):
        return (_xla_reference(rel, feat, w, p, pe, pb) * cot).sum()

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(fp_bf, rel, feat, w, pe)
    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3, 4))(fp_bf, rel, feat, w, pe)
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(gx)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(1e-3, float(np.abs(b).max()))
        np.testing.assert_allclose(a / scale, b / scale, atol=1.5e-2)
