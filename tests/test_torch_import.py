"""Reference .pth checkpoint import: structure and numerics."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from supnerf_tpu.models import SUPNeRF, build_model, init_model_variables
from supnerf_tpu.models.torch_import import (
    import_decoder,
    import_supnerf_state_dict,
)

HP = {"shape_blocks": 2, "texture_blocks": 1, "pose_blocks": 2,
      "regress_blocks": 2, "latent_dim": 32, "pose_shortcut": 1, "pred_wlh": 1}


def _rand_dense(rng, i, o):
    return {"weight": rng.normal(size=(o, i)).astype(np.float32) * 0.05,
            "bias": rng.normal(size=(o,)).astype(np.float32) * 0.05}


def _make_torch_decoder_sd(rng, W=32, shape_blocks=2, texture_blocks=1,
                           d_xyz=63, d_dir=27):
    sd = {}

    def put(name, d):
        sd[name + ".weight"] = d["weight"]
        sd[name + ".bias"] = d["bias"]

    put("encoding_xyz.0", _rand_dense(rng, d_xyz, W))
    for j in range(1, shape_blocks + 1):
        put(f"shape_latent_layer_{j}.0", _rand_dense(rng, W, W))
        put(f"shape_layer_{j}.0", _rand_dense(rng, W, W))
    put("encoding_shape", _rand_dense(rng, W, W))
    put("sigma.0", _rand_dense(rng, W, 1))
    put("encoding_viewdir.0", _rand_dense(rng, W + d_dir, W))
    for j in range(1, texture_blocks + 1):
        put(f"texture_latent_layer_{j}.0", _rand_dense(rng, W, W))
        put(f"texture_layer_{j}.0", _rand_dense(rng, W, W))
    put("rgb.0", _rand_dense(rng, W, W // 2))
    put("rgb.2", _rand_dense(rng, W // 2, 3))
    return sd


def _np_reference_decoder(sd, xyz, vd, sc, tc, shape_blocks=2, texture_blocks=1):
    """Pure-numpy forward of the reference decoder math using torch-layout
    weights (model_codenerf.py:39-63) — the import's numerical oracle."""
    def pe(x, L):
        y = np.concatenate([2.0**i * x for i in range(L)], -1)
        return np.concatenate([x, np.sin(y), np.cos(y)], -1)

    def lin(name, x):
        return x @ sd[name + ".weight"].T + sd[name + ".bias"]

    relu = lambda x: np.maximum(x, 0)
    softplus = lambda x: np.log1p(np.exp(x))
    x = pe(xyz, 10)
    d = pe(vd, 4)
    y = relu(lin("encoding_xyz.0", x))
    for j in range(1, shape_blocks + 1):
        y = y + relu(lin(f"shape_latent_layer_{j}.0", sc))
        y = relu(lin(f"shape_layer_{j}.0", y))
    y = lin("encoding_shape", y)
    sig = softplus(lin("sigma.0", y))
    y = np.concatenate([y, np.broadcast_to(d, y.shape[:-1] + d.shape[-1:])], -1)
    y = relu(lin("encoding_viewdir.0", y))
    for j in range(1, texture_blocks + 1):
        y = y + relu(lin(f"texture_latent_layer_{j}.0", tc))
        y = relu(lin(f"texture_layer_{j}.0", y))
    rgb = lin("rgb.2", relu(lin("rgb.0", y)))
    return sig, rgb


def test_decoder_import_numerics(rng):
    from supnerf_tpu.models.nerf_mlp import CodeNeRFDecoder

    sd = _make_torch_decoder_sd(rng)
    params = import_decoder(sd, 2, 1)
    model = CodeNeRFDecoder(shape_blocks=2, texture_blocks=1, W=32, latent_dim=32)
    xyz = rng.normal(size=(7, 4, 3)).astype(np.float32) * 0.3
    vd = rng.normal(size=(7, 4, 3)).astype(np.float32)
    sc = rng.normal(size=(32,)).astype(np.float32) * 0.2
    tc = rng.normal(size=(32,)).astype(np.float32) * 0.2
    sig, rgb = model.apply({"params": params}, jnp.asarray(xyz), jnp.asarray(vd),
                           jnp.asarray(sc), jnp.asarray(tc))
    sig_ref, rgb_ref = _np_reference_decoder(sd, xyz, vd, sc, tc)
    np.testing.assert_allclose(np.asarray(sig), sig_ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(rgb), rgb_ref, atol=2e-5)


def test_supnerf_import_structure(rng):
    """The imported tree must match a fresh init's structure exactly, and every
    torch tensor must be consumed."""
    model = build_model("supnerf", HP)
    ref_vars = init_model_variables(model, jax.random.PRNGKey(0), img_size=32)

    # synthesize a torch state_dict with matching shapes by EXPORTING the
    # fresh init through the inverse layout maps
    sd = {}

    def walk(tree, bs_tree, prefix_map):
        # build torch names from the flax init via shapes only
        pass

    # simpler: construct the torch sd by transposing the flax init leaves back
    from supnerf_tpu.models import torch_import as ti

    def dense_to_torch(name, p):
        sd[name + ".weight"] = np.asarray(p["kernel"]).T
        sd[name + ".bias"] = np.asarray(p["bias"])

    enc = ref_vars["params"]["img_encoder"]
    enc_bs = ref_vars["batch_stats"]["img_encoder"]

    def block_to_torch(prefix, bp, bbs):
        sd[prefix + ".conv1.weight"] = np.asarray(bp["Conv_0"]["kernel"]).transpose(3, 2, 0, 1)
        sd[prefix + ".bn1.weight"] = np.asarray(bp["BatchNorm_0"]["scale"])
        sd[prefix + ".bn1.bias"] = np.asarray(bp["BatchNorm_0"]["bias"])
        sd[prefix + ".bn1.running_mean"] = np.asarray(bbs["BatchNorm_0"]["mean"])
        sd[prefix + ".bn1.running_var"] = np.asarray(bbs["BatchNorm_0"]["var"])
        sd[prefix + ".conv2.weight"] = np.asarray(bp["Conv_1"]["kernel"]).transpose(3, 2, 0, 1)
        sd[prefix + ".bn2.weight"] = np.asarray(bp["BatchNorm_1"]["scale"])
        sd[prefix + ".bn2.bias"] = np.asarray(bp["BatchNorm_1"]["bias"])
        sd[prefix + ".bn2.running_mean"] = np.asarray(bbs["BatchNorm_1"]["mean"])
        sd[prefix + ".bn2.running_var"] = np.asarray(bbs["BatchNorm_1"]["var"])
        if "Conv_2" in bp:
            sd[prefix + ".downsample.0.weight"] = np.asarray(bp["Conv_2"]["kernel"]).transpose(3, 2, 0, 1)
            sd[prefix + ".downsample.1.weight"] = np.asarray(bp["BatchNorm_2"]["scale"])
            sd[prefix + ".downsample.1.bias"] = np.asarray(bp["BatchNorm_2"]["bias"])
            sd[prefix + ".downsample.1.running_mean"] = np.asarray(bbs["BatchNorm_2"]["mean"])
            sd[prefix + ".downsample.1.running_var"] = np.asarray(bbs["BatchNorm_2"]["var"])

    sd["img_encoder.conv1.weight"] = np.asarray(enc["conv1"]["kernel"]).transpose(3, 2, 0, 1)
    sd["img_encoder.bn1.weight"] = np.asarray(enc["bn1"]["scale"])
    sd["img_encoder.bn1.bias"] = np.asarray(enc["bn1"]["bias"])
    sd["img_encoder.bn1.running_mean"] = np.asarray(enc_bs["bn1"]["mean"])
    sd["img_encoder.bn1.running_var"] = np.asarray(enc_bs["bn1"]["var"])
    for layer in ["layer1", "layer2", "layer3", "layer4_shape", "layer4_texture",
                  "layer4_pose", "layer4_wlh"]:
        for bname, bp in enc[layer].items():
            i = int(bname.split("_")[1])
            block_to_torch(f"img_encoder.{layer}.{i}", bp, enc_bs[layer][bname])
    for h in ["shape", "texture", "pose"]:
        dense_to_torch(f"img_encoder.fc_{h}", enc[f"fc_{h}"])
    dense_to_torch("img_encoder.fc_uv", enc["fc_uv"])
    dense_to_torch("img_encoder.fc_wlh.0", enc["fc_wlh_hidden"])
    dense_to_torch("img_encoder.fc_wlh.2", enc["fc_wlh_out"])

    dec = ref_vars["params"]["decoder"]
    dense_to_torch("encoding_xyz.0", dec["encoding_xyz"])
    dense_to_torch("encoding_shape", dec["encoding_shape"])
    dense_to_torch("sigma.0", dec["sigma"])
    dense_to_torch("encoding_viewdir.0", dec["encoding_viewdir"])
    dense_to_torch("rgb.0", dec["rgb_hidden"])
    dense_to_torch("rgb.2", dec["rgb_out"])
    for j in range(1, 3):
        dense_to_torch(f"shape_latent_layer_{j}.0", dec[f"shape_latent_layer_{j}"])
        dense_to_torch(f"shape_layer_{j}.0", dec[f"shape_layer_{j}"])
    dense_to_torch("texture_latent_layer_1.0", dec["texture_latent_layer_1"])
    dense_to_torch("texture_layer_1.0", dec["texture_layer_1"])

    ref_p = ref_vars["params"]["pose_refiner"]
    for j in range(2):
        dense_to_torch(f"pose_layer_{j}.0", ref_p[f"pose_layer_{j}"])
        dense_to_torch(f"regress_layer_{j}.0", ref_p[f"regress_layer_{j}"])
    dense_to_torch("out_delta_layer", ref_p["out_delta_layer"])

    imported = import_supnerf_state_dict(model, sd)
    # structural match for params (batch_stats counts may differ since the
    # running stats live in a parallel tree)
    ref_flat = jax.tree_util.tree_flatten_with_path(ref_vars["params"])[0]
    imp_flat = jax.tree_util.tree_flatten_with_path(imported["params"])[0]
    ref_paths = {jax.tree_util.keystr(p): v.shape for p, v in ref_flat}
    imp_paths = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in imp_flat}
    assert ref_paths == imp_paths
    # round-trip equality on a few leaves
    np.testing.assert_allclose(
        np.asarray(imported["params"]["decoder"]["sigma"]["kernel"]),
        np.asarray(dec["sigma"]["kernel"]))
    np.testing.assert_allclose(
        np.asarray(imported["params"]["img_encoder"]["conv1"]["kernel"]),
        np.asarray(enc["conv1"]["kernel"]))

    # imported variables drive the model end to end
    img = jnp.ones((1, 32, 32, 3)) * 0.5
    (sc, tc, pc, uv, wlh), _ = model.apply(
        imported, img, True, method=SUPNeRF.encode_img, mutable=["batch_stats"])
    out_ref, _ = model.apply(ref_vars, img, True, method=SUPNeRF.encode_img,
                             mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(sc), np.asarray(out_ref[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(wlh), np.asarray(out_ref[4]), atol=1e-5)


def _make_torch_autorf_original_sd(rng, W=32, shape_blocks=3,
                                   texture_blocks=3, d_xyz=63, d_dir=27):
    """State_dict with the ORIGINAL AutoRF decoder layer set (reference
    model_autorf.py:138-151): no latent-projection layers, last texture
    layer and rgb take concat(feat, dir_pe)."""
    sd = {}

    def put(name, d):
        sd[name + ".weight"] = d["weight"]
        sd[name + ".bias"] = d["bias"]

    put("encoding_xyz.0", _rand_dense(rng, d_xyz, W))
    for j in range(shape_blocks - 1):
        put(f"shape_layer_{j}.0", _rand_dense(rng, W, W))
    put("sigma.0", _rand_dense(rng, W, 1))
    for j in range(texture_blocks - 2):
        put(f"texture_layer_{j}.0", _rand_dense(rng, W, W))
    put(f"texture_layer_{texture_blocks - 2}.0",
        _rand_dense(rng, W + d_dir, W))
    put("rgb.0", _rand_dense(rng, W + d_dir, 3))
    return sd


def _np_reference_autorf_original(sd, xyz, vd, sf0, tf0, shape_blocks=3,
                                  texture_blocks=3):
    """Numpy replica of the reference original-AutoRF forward
    (model_autorf.py:157-186: feature averaging with the positional feature
    between layers, sigmoid rgb)."""
    relu = lambda x: np.maximum(x, 0)

    def lin(name, x):
        return x @ sd[name + ".weight"].T + sd[name + ".bias"]

    def pe(x, L):
        f = 2.0 ** np.arange(L, dtype=np.float32)
        y = (x[..., None, :] * f[:, None]).reshape(*x.shape[:-1], -1)
        return np.concatenate([x, np.sin(y), np.cos(y)], -1)

    xpe, dpe = pe(xyz, 10), pe(vd, 4)
    pos = relu(lin("encoding_xyz.0", xpe))
    sf = np.broadcast_to(sf0, pos.shape)
    for j in range(shape_blocks - 1):
        sf = relu(lin(f"shape_layer_{j}.0", (sf + pos) / 2))
    sig = np.log1p(np.exp(lin("sigma.0", (sf + pos) / 2)))
    tf = np.broadcast_to(tf0, pos.shape)
    for j in range(texture_blocks - 2):
        tf = relu(lin(f"texture_layer_{j}.0", (tf + pos) / 2))
    tf = (tf + sf + pos) / 3
    tf = np.concatenate([tf, np.broadcast_to(dpe, tf.shape[:-1] + dpe.shape[-1:])], -1)
    tf = relu(lin(f"texture_layer_{texture_blocks - 2}.0", tf))
    tf = (tf + pos) / 2
    tf = np.concatenate([tf, np.broadcast_to(dpe, tf.shape[:-1] + dpe.shape[-1:])], -1)
    rgb = 1.0 / (1.0 + np.exp(-lin("rgb.0", tf)))
    return sig, rgb


def test_autorf_original_decoder_import_numerics(rng):
    """import_autorf_original_decoder: the flax AutoRFDecoder with imported
    weights reproduces the reference original-AutoRF forward byte-for-byte
    (previously this checkpoint family crashed the importer with a KeyError
    on the CodeNeRF-only layer names)."""
    from supnerf_tpu.models.nerf_mlp import AutoRFDecoder
    from supnerf_tpu.models.torch_import import import_autorf_original_decoder

    sd = _make_torch_autorf_original_sd(rng)
    params = import_autorf_original_decoder(sd, 3, 3)
    model = AutoRFDecoder(shape_blocks=3, texture_blocks=3, latent_dim=32)
    xyz = rng.normal(size=(5, 4, 3)).astype(np.float32) * 0.3
    vd = rng.normal(size=(5, 4, 3)).astype(np.float32)
    sf = rng.normal(size=(32,)).astype(np.float32) * 0.2
    tf = rng.normal(size=(32,)).astype(np.float32) * 0.2
    sig, rgb = model.apply({"params": params}, jnp.asarray(xyz),
                           jnp.asarray(vd), jnp.asarray(sf), jnp.asarray(tf))
    sig_ref, rgb_ref = _np_reference_autorf_original(sd, xyz, vd, sf, tf)
    np.testing.assert_allclose(np.asarray(sig), sig_ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(rgb), rgb_ref, atol=2e-5)


# ---------------------------------------------------------------------------
# Export (flax -> reference torch .pth): inverse-mapping and file round-trips.


def _assert_tree_equal(a, b):
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert jax.tree.structure(a) == jax.tree.structure(b)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_export_import_round_trip_supnerf():
    """export_state_dict is the exact inverse of import_supnerf_state_dict:
    variables -> torch sd -> variables is the identity (layouts, head
    mappings, BN param/stat split)."""
    from supnerf_tpu.models.torch_import import export_state_dict

    model = build_model("supnerf", HP)
    variables = init_model_variables(model, jax.random.PRNGKey(3))
    sd = export_state_dict(model, variables)
    back = import_supnerf_state_dict(model, sd)
    _assert_tree_equal(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        back)
    # the reference BN state_dict surface is complete (strict-load needs
    # num_batches_tracked for every BatchNorm)
    n_bn_scales = sum(1 for k in sd if k.endswith("running_mean"))
    n_tracked = sum(1 for k in sd if k.endswith("num_batches_tracked"))
    assert n_bn_scales == n_tracked > 0


@pytest.mark.parametrize("arch", ["autorfmix", "codenerf"])
def test_export_import_round_trip_other_archs(arch):
    from supnerf_tpu.models.torch_import import (
        export_state_dict,
        import_autorf_state_dict,
        import_codenerf_state_dict,
    )

    hp = {"shape_blocks": 2, "texture_blocks": 1, "latent_dim": 32}
    model = build_model(arch, hp)
    variables = init_model_variables(model, jax.random.PRNGKey(4))
    sd = export_state_dict(model, variables)
    if arch == "codenerf":
        back = import_codenerf_state_dict(model, sd)
        _assert_tree_equal(variables["params"], back["params"])
    else:
        back = import_autorf_state_dict(model, sd)
        _assert_tree_equal(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}, back)


def test_export_import_round_trip_autorf_original():
    from supnerf_tpu.models.autorf import AutoRF
    from supnerf_tpu.models.torch_import import (
        export_state_dict,
        import_autorf_state_dict,
    )

    model = AutoRF(shape_blocks=2, texture_blocks=2, latent_dim=32)
    variables = init_model_variables(model, jax.random.PRNGKey(5))
    sd = export_state_dict(model, variables)
    back = import_autorf_state_dict(model, sd)
    _assert_tree_equal(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        back)


def test_reference_checkpoint_file_round_trip(tmp_path):
    """save_reference_checkpoint writes a .pth that load_reference_checkpoint
    reads back to identical variables, and the mean codes honor the
    optimized_idx mask (reference load_pretrained_model :449-463)."""
    from supnerf_tpu.models.torch_import import (
        load_reference_checkpoint,
        save_reference_checkpoint,
    )

    model = build_model("supnerf", HP)
    variables = init_model_variables(model, jax.random.PRNGKey(6))
    rng = np.random.default_rng(0)
    shape_codes = rng.normal(size=(4, HP["latent_dim"])).astype(np.float32)
    tex_codes = rng.normal(size=(4, HP["latent_dim"])).astype(np.float32)
    optimized = np.array([1, 0, 2, 0], np.int64)
    path = str(tmp_path / "models.pth")
    save_reference_checkpoint(
        model, variables, shape_codes, tex_codes, path, niter=7, nepoch=3,
        instoken2idx={"tok_a": 0, "tok_b": 1}, optimized_idx=optimized)

    back_vars, mean_shape, mean_tex = load_reference_checkpoint(model, path)
    _assert_tree_equal(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        back_vars)
    np.testing.assert_allclose(mean_shape, shape_codes[[0, 2]].mean(0), rtol=1e-6)
    np.testing.assert_allclose(mean_tex, tex_codes[[0, 2]].mean(0), rtol=1e-6)

    import torch

    saved = torch.load(path, map_location="cpu", weights_only=False)
    assert set(saved.keys()) == {
        "model_params", "shape_code_params", "texture_code_params",
        "niter", "nepoch", "instoken2idx", "optimized_idx"}
    assert saved["niter"] == 7 and saved["nepoch"] == 3
    assert saved["instoken2idx"] == {"tok_a": 0, "tok_b": 1}


def test_export_torch_cli(tmp_path):
    """The export CLI converts a trainer save dir (orbax + hpam.json) into a
    reference-format models.pth."""
    import json

    from supnerf_tpu.cli.export_torch import main as export_main
    from supnerf_tpu.models.torch_import import load_reference_checkpoint
    from supnerf_tpu.training.checkpoints import save_checkpoint
    from supnerf_tpu.training.train_step import TrainConfig, init_train_state

    model = build_model("supnerf", HP)
    state = init_train_state(model, jax.random.PRNGKey(7), n_instances=2,
                             cfg=TrainConfig(latent_dim=HP["latent_dim"]),
                             img_size=64)
    save_dir = str(tmp_path / "ckpt")
    save_checkpoint(save_dir, jax.tree.map(np.asarray, state), nepoch=0,
                    instoken2idx={"a": 0, "b": 1})
    with open(f"{save_dir}/hpam.json", "w") as f:
        json.dump({"arch": "supnerf", "net_hyperparams": HP,
                   "in_img_sz": 64}, f)

    out = str(tmp_path / "exported.pth")
    assert export_main([save_dir, out]) == 0
    back_vars, _, _ = load_reference_checkpoint(model, out)
    np.testing.assert_array_equal(
        np.asarray(back_vars["params"]["decoder"]["sigma"]["kernel"]),
        np.asarray(state.params["decoder"]["sigma"]["kernel"]))
