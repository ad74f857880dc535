"""Parity of the fused field+compositing render kernel (ops/pallas_render)
vs the unfused reference path (flax decoder + ops.volume_render), interpret
mode on CPU. The on-TPU path is exercised by bench.py."""
import numpy as np
import jax
import jax.numpy as jnp

from supnerf_tpu.models.nerf_mlp import CodeNeRFDecoder
from supnerf_tpu.ops.pallas_field import pack_decoder_params
from supnerf_tpu.ops.pallas_render import field_composite_pallas
from supnerf_tpu.ops.volume_render import volume_render


def _setup(R=24, S=8, W=64):
    model = CodeNeRFDecoder(shape_blocks=3, texture_blocks=1, W=W, latent_dim=W)
    key = jax.random.PRNGKey(0)
    rays_o = jnp.zeros((R, 3))
    vd = jax.random.normal(jax.random.PRNGKey(1), (R, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    z_vals = jnp.linspace(2.0, 6.0, S) + 0.01 * jax.random.uniform(
        jax.random.PRNGKey(4), (S,))
    xyz = rays_o[:, None, :] + vd[:, None, :] * z_vals[None, :, None]
    vds = jnp.broadcast_to(vd[:, None, :], xyz.shape)
    sc = jax.random.normal(jax.random.PRNGKey(2), (W,)) * 0.3
    tc = jax.random.normal(jax.random.PRNGKey(3), (W,)) * 0.3
    variables = model.init(key, xyz, vds, sc, tc)
    packed = pack_decoder_params(variables["params"], 3, 1)
    return model, variables, packed, xyz, vds, z_vals, sc, tc


def _reference(model, variables, xyz, vds, z_vals, sc, tc, white_bkgd):
    sig, rgb = model.apply(variables, xyz, vds, sc, tc)
    return volume_render(sig, rgb, z_vals[None, :], white_bkgd=white_bkgd)


def test_fused_render_matches_unfused_f32():
    model, variables, packed, xyz, vds, z_vals, sc, tc = _setup()
    rgb_ref, depth_ref, acc_ref = _reference(
        model, variables, xyz, vds, z_vals, sc, tc, False)
    rgb, depth, acc = field_composite_pallas(
        packed, xyz, vds, z_vals, sc, tc, dtype=jnp.float32, tile_m=32,
        interpret=True)
    # log-space exclusive cumprod vs jnp.cumprod: ~1e-5 relative in f32
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                               atol=3e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(depth_ref),
                               atol=3e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_ref),
                               atol=3e-4, rtol=1e-4)


def test_fused_render_white_bkgd_and_ray_padding():
    # R=19 not divisible by tile_r -> exercises ray padding; white bg on
    model, variables, packed, xyz, vds, z_vals, sc, tc = _setup(R=19)
    rgb_ref, depth_ref, acc_ref = _reference(
        model, variables, xyz, vds, z_vals, sc, tc, True)
    rgb, depth, acc = field_composite_pallas(
        packed, xyz, vds, z_vals, sc, tc, dtype=jnp.float32, tile_m=32,
        interpret=True, white_bkgd=True)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                               atol=3e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(depth_ref),
                               atol=3e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_ref),
                               atol=3e-4, rtol=1e-4)


def test_fused_render_vmapped_over_objects():
    model, variables, packed, xyz, vds, z_vals, sc, tc = _setup()
    B = 3
    scs = jnp.stack([sc * (i + 1) * 0.5 for i in range(B)])
    tcs = jnp.stack([tc * (i + 1) * 0.5 for i in range(B)])

    def one(s, t):
        return field_composite_pallas(
            packed, xyz, vds, z_vals, s, t, dtype=jnp.float32, tile_m=32,
            interpret=True)

    rgb_b, depth_b, acc_b = jax.vmap(one)(scs, tcs)
    for i in range(B):
        rgb_ref, depth_ref, acc_ref = _reference(
            model, variables, xyz, vds, z_vals, scs[i], tcs[i], False)
        np.testing.assert_allclose(np.asarray(rgb_b[i]), np.asarray(rgb_ref),
                                   atol=3e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(depth_b[i]),
                                   np.asarray(depth_ref), atol=3e-3, rtol=1e-4)


def test_fused_render_opaque_and_empty_rays():
    """Degenerate densities: very large sigma (opaque first sample) and zero
    sigma (acc_trans ~ 1, black/white background) keep the log-space
    transmittance finite and match the unfused path."""
    model, variables, packed, xyz, vds, z_vals, sc, tc = _setup(R=8)

    from supnerf_tpu.ops.pallas_field import field_forward_pallas

    # scale/shift the PRE-softplus sigma head: large -> opaque first samples
    # (transmittance underflows to 0), very negative -> empty space (acc ~ 1)
    for scale, shift in ((50.0, 5.0), (0.0, -50.0)):
        p2 = dict(packed)
        k, b = p2["w_sigma"]
        p2["w_sigma"] = (k * scale, b * scale + shift)
        sig, rgb = field_forward_pallas(
            p2, xyz, vds, sc, tc, dtype=jnp.float32, tile_m=32, interpret=True)
        rgb_ref, depth_ref, acc_ref = volume_render(
            sig.reshape(xyz.shape[0], xyz.shape[1], 1),
            rgb.reshape(xyz.shape[0], xyz.shape[1], 3), z_vals[None, :])
        rgb_f, depth_f, acc_f = field_composite_pallas(
            p2, xyz, vds, z_vals, sc, tc, dtype=jnp.float32, tile_m=32,
            interpret=True)
        assert np.all(np.isfinite(np.asarray(rgb_f)))
        np.testing.assert_allclose(np.asarray(acc_f), np.asarray(acc_ref),
                                   atol=3e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_ref),
                                   atol=3e-4, rtol=1e-4)


def _loss_weights(R):
    wr = jnp.asarray(np.random.default_rng(7).normal(size=(R, 3)), jnp.float32)
    wd = jnp.asarray(np.random.default_rng(8).normal(size=(R,)), jnp.float32)
    wa = jnp.asarray(np.random.default_rng(9).normal(size=(R,)), jnp.float32)
    return wr, wd, wa


def test_fused_render_gradients_match_autodiff():
    """field_composite_apply: gradients vs XLA autodiff of the unfused path
    (flax field + volume_render) for every differentiable input — xyz, the
    per-ray viewdir, the shared z_vals, and both codes."""
    from supnerf_tpu.ops.pallas_render import field_composite_apply

    for white in (False, True):
        model, variables, packed, xyz, vds, z_vals, sc, tc = _setup(R=19)
        R = xyz.shape[0]
        wr, wd, wa = _loss_weights(R)

        def loss_fused(xyz, vd, z_vals, sc, tc):
            rgb, depth, acc = field_composite_apply(
                packed, xyz, vd, z_vals, sc, tc, dtype=jnp.float32,
                tile_fwd=32, tile_bwd=32, interpret=True, white_bkgd=white)
            return (jnp.sum(rgb * wr) + jnp.sum(depth * wd)
                    + jnp.sum(acc * wa))

        def loss_ref(xyz, vd, z_vals, sc, tc):
            vdb = jnp.broadcast_to(vd[:, None, :], xyz.shape)
            sig, rgbs = model.apply(variables, xyz, vdb, sc, tc)
            rgb, depth, acc = volume_render(sig, rgbs, z_vals[None, :],
                                            white_bkgd=white)
            return (jnp.sum(rgb * wr) + jnp.sum(depth * wd)
                    + jnp.sum(acc * wa))

        vd = vds[:, 0, :]
        args = (xyz, vd, z_vals, sc, tc)
        v_f = float(loss_fused(*args))
        v_r = float(loss_ref(*args))
        np.testing.assert_allclose(v_f, v_r, rtol=1e-4)
        gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
        for name, a, b in zip(("xyz", "vd", "z_vals", "sc", "tc"), gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
                err_msg=f"{name} white={white}")


def test_fused_render_gradients_finite_at_degenerate_densities():
    """The manual compositing VJP stays finite where naive formulations NaN:
    fully opaque samples (transmittance underflows to the 1e-10 floor) and
    empty space. Checks against the unfused autodiff too (itself stable:
    jnp.cumprod form)."""
    from supnerf_tpu.ops.pallas_render import field_composite_apply

    model, variables, packed, xyz, vds, z_vals, sc, tc = _setup(R=8)
    R = xyz.shape[0]
    wr, wd, wa = _loss_weights(R)
    vd = vds[:, 0, :]
    for scale, shift in ((50.0, 5.0), (0.0, -50.0)):
        p2 = dict(packed)
        k, b = p2["w_sigma"]
        p2["w_sigma"] = (k * scale, b * scale + shift)
        v2 = {"params": dict(variables["params"],
                             sigma={"kernel": k * scale,
                                    "bias": b * scale + shift})}

        def loss_fused(xyz, vd, z_vals, sc, tc):
            rgb, depth, acc = field_composite_apply(
                p2, xyz, vd, z_vals, sc, tc, dtype=jnp.float32,
                tile_fwd=32, tile_bwd=32, interpret=True)
            return jnp.sum(rgb * wr) + jnp.sum(depth * wd) + jnp.sum(acc * wa)

        def loss_ref(xyz, vd, z_vals, sc, tc):
            vdb = jnp.broadcast_to(vd[:, None, :], xyz.shape)
            sig, rgbs = model.apply(v2, xyz, vdb, sc, tc)
            rgb, depth, acc = volume_render(sig, rgbs, z_vals[None, :])
            return jnp.sum(rgb * wr) + jnp.sum(depth * wd) + jnp.sum(acc * wa)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
            xyz, vd, z_vals, sc, tc)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
            xyz, vd, z_vals, sc, tc)
        for name, a, b in zip(("xyz", "vd", "z_vals", "sc", "tc"), gf, gr):
            assert np.all(np.isfinite(np.asarray(a))), name
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
                err_msg=f"{name} scale={scale}")


def test_fused_render_gradients_vmapped():
    """The differentiable fused render under vmap over objects (the TTO batch
    axis): per-object grads match the serial calls."""
    from supnerf_tpu.ops.pallas_render import field_composite_apply

    model, variables, packed, xyz, vds, z_vals, sc, tc = _setup()
    R = xyz.shape[0]
    wr, wd, wa = _loss_weights(R)
    B = 2
    scs = jnp.stack([sc * (i + 1) * 0.7 for i in range(B)])
    tcs = jnp.stack([tc * (i + 1) * 0.7 for i in range(B)])

    def loss_one(s, t):
        rgb, depth, acc = field_composite_apply(
            packed, xyz, vds, z_vals, s, t, dtype=jnp.float32,
            tile_fwd=32, tile_bwd=32, interpret=True)
        return jnp.sum(rgb * wr) + jnp.sum(depth * wd) + jnp.sum(acc * wa)

    g_b = jax.vmap(jax.grad(loss_one, argnums=(0, 1)))(scs, tcs)
    for i in range(B):
        g_i = jax.grad(loss_one, argnums=(0, 1))(scs[i], tcs[i])
        for name, a, b in zip(("sc", "tc"), g_i, (g_b[0][i], g_b[1][i])):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=2e-4, err_msg=name)


def test_positional_encoding_doubling_matches_exact():
    from supnerf_tpu.models.nerf_mlp import (
        positional_encoding,
        positional_encoding_doubling,
    )

    x = jnp.asarray(np.random.default_rng(5).uniform(-1, 1, (64, 3)),
                    jnp.float32)
    # recurrence error compounds ~1 ulp per doubling: ~1e-4 at the 10th
    # frequency — an order of magnitude below the bf16 cast (~2e-3 absolute
    # on sin values) the fused render path applies to the result
    for degree, atol in ((4, 2e-6), (10, 2e-4)):
        exact = np.asarray(positional_encoding(x, degree))
        fast = np.asarray(positional_encoding_doubling(x, degree))
        np.testing.assert_allclose(fast, exact, atol=atol)


# --------------------------------------------------------------------------
# AABB (per-ray z + hit mask) variant
# --------------------------------------------------------------------------

def _setup_aabb(R=21, S=8, W=64, n_miss=5):
    """Per-ray z rows (different bounds per ray) with the first n_miss rays
    missing the box: degenerate constant z rows (the renderer's (-1, -1)
    bounds) and hit=False, exactly the render_rays_aabb contract."""
    model, variables, packed, _, vds0, _, sc, tc = _setup(R=R, S=S, W=W)
    rng = np.random.default_rng(17)
    near = 2.0 + rng.uniform(0, 1.0, (R, 1))
    far = 5.0 + rng.uniform(0, 2.0, (R, 1))
    frac = np.sort(rng.uniform(0, 1, (R, S)), axis=1)
    z2d = near + (far - near) * frac
    hit = np.ones((R,), bool)
    hit[:n_miss] = False
    z2d[:n_miss] = -1.0                      # degenerate bounds for misses
    z2d = jnp.asarray(z2d, jnp.float32)
    hit = jnp.asarray(hit)
    vd = vds0[:, 0, :]
    xyz = vd[:, None, :] * z2d[:, :, None] * 0.3
    vds = jnp.broadcast_to(vd[:, None, :], xyz.shape)
    return model, variables, packed, xyz, vds, z2d, hit, sc, tc


def _reference_aabb(model, variables, xyz, vds, z2d, hit, sc, tc, white_bkgd):
    sig, rgb = model.apply(variables, xyz, vds, sc, tc)
    sig = jnp.where(hit[:, None, None], sig, 0.0)
    return volume_render(sig, rgb, z2d, white_bkgd=white_bkgd)


def test_fused_aabb_render_matches_unfused():
    from supnerf_tpu.ops.pallas_render import field_composite_aabb_pallas

    for white in (False, True):
        model, variables, packed, xyz, vds, z2d, hit, sc, tc = _setup_aabb()
        rgb_ref, depth_ref, acc_ref = _reference_aabb(
            model, variables, xyz, vds, z2d, hit, sc, tc, white)
        rgb, depth, acc = field_composite_aabb_pallas(
            packed, xyz, vds, z2d, hit, sc, tc, dtype=jnp.float32, tile_m=32,
            interpret=True, white_bkgd=white)
        np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                                   atol=3e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(depth), np.asarray(depth_ref),
                                   atol=3e-3, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_ref),
                                   atol=3e-4, rtol=1e-4)


def test_fused_aabb_gradients_match_autodiff():
    """field_composite_aabb_apply: gradients vs XLA autodiff of the unfused
    AABB path (hit-masked sigmas + per-ray volume_render) for xyz, the
    per-ray viewdir, the PER-RAY z_vals, and both codes; missed rays must get
    exactly zero xyz/z gradients (the unfused where(hit) semantics)."""
    from supnerf_tpu.ops.pallas_render import field_composite_aabb_apply

    model, variables, packed, xyz, vds, z2d, hit, sc, tc = _setup_aabb()
    R = xyz.shape[0]
    wr, wd, wa = _loss_weights(R)
    vd = vds[:, 0, :]

    def loss_fused(xyz, vd, z2d, sc, tc):
        rgb, depth, acc = field_composite_aabb_apply(
            packed, xyz, vd, z2d, hit, sc, tc, dtype=jnp.float32,
            tile_fwd=32, tile_bwd=32, interpret=True)
        return jnp.sum(rgb * wr) + jnp.sum(depth * wd) + jnp.sum(acc * wa)

    def loss_ref(xyz, vd, z2d, sc, tc):
        vdb = jnp.broadcast_to(vd[:, None, :], xyz.shape)
        rgb, depth, acc = _reference_aabb(
            model, variables, xyz, vdb, z2d, hit, sc, tc, False)
        return jnp.sum(rgb * wr) + jnp.sum(depth * wd) + jnp.sum(acc * wa)

    args = (xyz, vd, z2d, sc, tc)
    np.testing.assert_allclose(float(loss_fused(*args)),
                               float(loss_ref(*args)), rtol=1e-4)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for name, a, b in zip(("xyz", "vd", "z2d", "sc", "tc"), gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)
    # missed rays: zero gradient into geometry exactly
    miss = ~np.asarray(hit)
    assert np.all(np.asarray(gf[0])[miss] == 0.0)
    assert np.all(np.asarray(gf[2])[miss] == 0.0)


def test_fused_aabb_in_renderer_and_tto_loop():
    """Wire-level: render_rays_aabb with the fused composite hook matches the
    unfused call, and the AABB TTO loop runs on field_impl='pallas'."""
    from supnerf_tpu.render.renderer import render_rays_aabb
    from supnerf_tpu.ops.pallas_render import make_composite_aabb_fn

    model, variables, packed, _, _, _, _, sc, tc = _setup_aabb()
    K = jnp.asarray([[400.0, 0, 320], [0, 400, 180], [0, 0, 1]])
    roi = jnp.asarray([280.0, 140.0, 360.0, 220.0])
    cam = jnp.concatenate([jnp.eye(3), jnp.asarray([[0.0], [0.0], [-6.0]])],
                          axis=1)
    obj_sz = jnp.asarray([1.9, 4.6, 1.7])
    kern_kw = dict(shape_blocks=3, texture_blocks=1, dtype=jnp.float32,
                   tile_fwd=32, interpret=True)

    def field_fn(xyz, vd):
        return model.apply(variables, xyz, vd, sc, tc)

    kw = dict(n_samples=8, im_sz=8, shapenet_obj_cood=True, adjust_scale=0.5)
    out_ref = render_rays_aabb(field_fn, jax.random.PRNGKey(5), cam, K, roi,
                               obj_sz, **kw)
    out_f = render_rays_aabb(field_fn, jax.random.PRNGKey(5), cam, K, roi,
                             obj_sz, composite_fn=make_composite_aabb_fn(
                                 packed, kern_kw, sc, tc), **kw)
    assert bool(jnp.any(out_ref["hit"])), "fixture must hit the box"
    for k in ("rgb", "depth", "acc_trans"):
        np.testing.assert_allclose(np.asarray(out_f[k]),
                                   np.asarray(out_ref[k]),
                                   atol=3e-3, rtol=1e-3, err_msg=k)


def test_fused_train_render_full_grads_match_flax():
    """field_composite_train_pallas (training path): value + gradients for
    EVERY decoder weight/bias, the per-object codes, the raw points, the
    per-ray view directions, and the shared per-object z_vals must match flax
    autodiff of the unfused path (flax field + ops.volume_render). Exercises
    the in-VMEM compositing VJP merged with the sequential weight-grad
    accumulation and the per-object latent block streaming."""
    from supnerf_tpu.ops.pallas_render import field_composite_train_pallas

    model = CodeNeRFDecoder(shape_blocks=2, texture_blocks=1, W=128,
                            latent_dim=128)
    B, R, S = 2, 16, 8
    key = jax.random.PRNGKey(0)
    vd = jax.random.normal(jax.random.PRNGKey(1), (B, R, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    z_vals = (jnp.linspace(2.0, 6.0, S)[None, :]
              + 0.05 * jax.random.uniform(jax.random.PRNGKey(4), (B, S)))
    xyz = vd[:, :, None, :] * z_vals[:, None, :, None] * 0.3
    sc = jax.random.normal(jax.random.PRNGKey(2), (B, 128)) * 0.3
    tc = jax.random.normal(jax.random.PRNGKey(3), (B, 128)) * 0.3
    vds = jnp.broadcast_to(vd[:, :, None, :], xyz.shape)
    variables = model.init(key, xyz, vds, sc[:, None, None, :],
                           tc[:, None, None, :])
    params = variables["params"]
    wr, wd_, wa = _loss_weights(B * R)
    wr = wr.reshape(B, R, 3)
    wd_, wa = wd_.reshape(B, R), wa.reshape(B, R)

    def head(rgb, depth, acc):
        return (jnp.sum(rgb * wr) + jnp.sum(depth * wd_)
                + jnp.sum(acc * wa))

    def loss_flax(p, x, v, z, scb, tcb):
        vds_l = jnp.broadcast_to(v[:, :, None, :], x.shape)
        sig, rgb = model.apply({"params": p}, x, vds_l,
                               scb[:, None, None, :], tcb[:, None, None, :])
        return head(*volume_render(sig, rgb, z[:, None, :]))

    def loss_pallas(p, x, v, z, scb, tcb):
        from supnerf_tpu.ops.pallas_field import pack_decoder_params
        packed = pack_decoder_params(p, 2, 1)
        return head(*field_composite_train_pallas(
            packed, x, v, z, scb, tcb, shape_blocks=2, texture_blocks=1,
            dtype=jnp.float32, tile_fwd=64, tile_bwd=64, interpret=True))

    args = (params, xyz, vd, z_vals, sc, tc)
    v_ref, g_ref = jax.value_and_grad(loss_flax, argnums=(0, 1, 2, 3, 4, 5))(*args)
    v_pal, g_pal = jax.value_and_grad(loss_pallas, argnums=(0, 1, 2, 3, 4, 5))(*args)
    np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=1e-5)
    flat_ref = jax.tree_util.tree_flatten_with_path(g_ref[0])[0]
    flat_pal = jax.tree_util.tree_flatten_with_path(g_pal[0])[0]
    for (path, a), (_, b) in zip(flat_ref, flat_pal):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(path))
    for a, b, name in zip(g_ref[1:], g_pal[1:],
                          ["xyz", "viewdir", "z_vals", "shapecodes",
                           "texturecodes"]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_fused_train_render_white_bkgd_matches():
    """White-background value parity at a non-trivial (B, R, S) with uneven
    tiles-per-object (tile_bwd smaller than a full object)."""
    from supnerf_tpu.ops.pallas_render import field_composite_train_pallas
    from supnerf_tpu.ops.pallas_field import pack_decoder_params

    model = CodeNeRFDecoder(shape_blocks=3, texture_blocks=1, W=64,
                            latent_dim=64)
    B, R, S = 3, 8, 8
    vd = jax.random.normal(jax.random.PRNGKey(1), (B, R, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    z_vals = jnp.linspace(1.0, 4.0, S)[None, :] * jnp.ones((B, 1))
    xyz = vd[:, :, None, :] * z_vals[:, None, :, None] * 0.3
    sc = jax.random.normal(jax.random.PRNGKey(2), (B, 64)) * 0.3
    tc = jax.random.normal(jax.random.PRNGKey(3), (B, 64)) * 0.3
    vds = jnp.broadcast_to(vd[:, :, None, :], xyz.shape)
    variables = model.init(jax.random.PRNGKey(0), xyz, vds,
                           sc[:, None, None, :], tc[:, None, None, :])
    sig, rgb = model.apply(variables, xyz, vds, sc[:, None, None, :],
                           tc[:, None, None, :])
    ref = volume_render(sig, rgb, z_vals[:, None, :], white_bkgd=True)
    packed = pack_decoder_params(variables["params"], 3, 1)
    out = field_composite_train_pallas(
        packed, xyz, vds, z_vals, sc, tc, shape_blocks=3, texture_blocks=1,
        dtype=jnp.float32, tile_fwd=32, tile_bwd=32, interpret=True,
        white_bkgd=True)
    for a, b, name in zip(out, ref, ("rgb", "depth", "acc")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-4, err_msg=name)


def test_fused_train_render_data_grads_off():
    """data_grads=False (the train step's mode): weight/code gradients match
    the full-gradient path exactly, and the xyz/viewdir/z_vals cotangents
    come back as zeros without the kernel emitting their outputs."""
    from supnerf_tpu.ops.pallas_field import pack_decoder_params
    from supnerf_tpu.ops.pallas_render import field_composite_train_pallas

    model = CodeNeRFDecoder(shape_blocks=2, texture_blocks=1, W=128,
                            latent_dim=128)
    B, R, S = 2, 16, 8
    vd = jax.random.normal(jax.random.PRNGKey(1), (B, R, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    z_vals = (jnp.linspace(2.0, 6.0, S)[None, :]
              + 0.05 * jax.random.uniform(jax.random.PRNGKey(4), (B, S)))
    xyz = vd[:, :, None, :] * z_vals[:, None, :, None] * 0.3
    sc = jax.random.normal(jax.random.PRNGKey(2), (B, 128)) * 0.3
    tc = jax.random.normal(jax.random.PRNGKey(3), (B, 128)) * 0.3
    vds = jnp.broadcast_to(vd[:, :, None, :], xyz.shape)
    variables = model.init(jax.random.PRNGKey(0), xyz, vds,
                           sc[:, None, None, :], tc[:, None, None, :])
    params = variables["params"]

    def loss(p, x, v, z, scb, tcb, dg):
        packed = pack_decoder_params(p, 2, 1)
        rgb, depth, acc = field_composite_train_pallas(
            packed, x, v, z, scb, tcb, shape_blocks=2, texture_blocks=1,
            dtype=jnp.float32, tile_fwd=64, tile_bwd=64, interpret=True,
            data_grads=dg)
        return jnp.sum(rgb) + 0.3 * jnp.sum(depth) + 0.1 * jnp.sum(acc)

    args = (params, xyz, vd, z_vals, sc, tc)
    g_on = jax.grad(lambda *a: loss(*a, True), argnums=(0, 1, 3, 4, 5))(*args)
    g_off = jax.grad(lambda *a: loss(*a, False), argnums=(0, 1, 3, 4, 5))(*args)
    # weight + code grads identical
    for a, b in zip(jax.tree.leaves(g_on[0]), jax.tree.leaves(g_off[0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for on, off, name in ((g_on[3], g_off[3], "shapecodes"),
                          (g_on[4], g_off[4], "texturecodes")):
        np.testing.assert_array_equal(np.asarray(on), np.asarray(off),
                                      err_msg=name)
    # data cotangents: real when on, exactly zero when off
    assert float(jnp.abs(g_on[1]).max()) > 0
    np.testing.assert_array_equal(np.asarray(g_off[1]),
                                  np.zeros_like(np.asarray(g_off[1])))
    np.testing.assert_array_equal(np.asarray(g_off[2]),
                                  np.zeros_like(np.asarray(g_off[2])))
