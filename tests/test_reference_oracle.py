"""Parity tests against the reference implementation's OWN code as oracle.

The reference checkout (read-only, /root/reference) is used three ways:
  - src/model_codenerf.py imports cleanly (plain torch) and is instantiated
    directly; its random-init state_dict is imported into the JAX decoder and
    sigma/rgb outputs are compared.
  - volume_rendering3 (src/renderer.py:355-379) is extracted by AST from the
    reference source at test time (the module itself needs torchvision, which
    is absent) and run under torch as the compositing oracle.
  - fw_pose_one_step's delta composition (src/optimizer_nuscenes.py:509-551)
    is replicated in torch+scipy (pytorch3d is absent) as the refiner oracle.

These tests are skipped when the reference checkout is not present, so the
repo remains standalone.
"""
import ast
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference/src"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available")


def _load_reference_module(name):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        f"ref_{name}", os.path.join(REF, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _extract_reference_function(filename, funcname, namespace):
    """AST-extract a single top-level function from a reference source file
    and exec it in `namespace` (for modules whose imports are unavailable)."""
    src = open(os.path.join(REF, filename)).read()
    tree = ast.parse(src)
    node = next(n for n in tree.body
                if isinstance(n, ast.FunctionDef) and n.name == funcname)
    code = ast.get_source_segment(src, node)
    exec(compile(code, f"{filename}:{funcname}", "exec"), namespace)
    return namespace[funcname]


# --------------------------------------------------------------- CodeNeRF ---
@pytest.mark.parametrize("shape_blocks,texture_blocks", [(3, 1), (2, 2)])
def test_codenerf_decoder_vs_reference_torch_module(shape_blocks, texture_blocks):
    """Identical weights -> identical sigma/rgb between the reference torch
    CodeNeRF (model_codenerf.py:13,39-63) and the JAX decoder."""
    from supnerf_tpu.models.nerf_mlp import CodeNeRFDecoder
    from supnerf_tpu.models.torch_import import import_decoder

    ref_mod = _load_reference_module("model_codenerf")
    W, latent = 64, 48
    torch.manual_seed(0)
    ref = ref_mod.CodeNeRF(shape_blocks=shape_blocks,
                           texture_blocks=texture_blocks, W=W,
                           num_xyz_freq=10, num_dir_freq=4, latent_dim=latent)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = import_decoder(sd, shape_blocks, texture_blocks)
    model = CodeNeRFDecoder(shape_blocks=shape_blocks,
                            texture_blocks=texture_blocks, W=W,
                            latent_dim=latent)

    rng = np.random.default_rng(1)
    B, R, S = 2, 5, 4
    xyz = rng.normal(size=(B * R, S, 3)).astype(np.float32) * 0.4
    vd = rng.normal(size=(B * R, S, 3)).astype(np.float32)
    sc = rng.normal(size=(B, latent)).astype(np.float32) * 0.3
    tc = rng.normal(size=(B, latent)).astype(np.float32) * 0.3

    with torch.no_grad():
        sig_t, rgb_t = ref(torch.from_numpy(xyz), torch.from_numpy(vd),
                           torch.from_numpy(sc), torch.from_numpy(tc))
    sig_t, rgb_t = sig_t.numpy(), rgb_t.numpy()

    # the JAX decoder takes one code pair; compare per object
    for b in range(B):
        sl = slice(b * R, (b + 1) * R)
        sig_j, rgb_j = model.apply(
            {"params": params}, jnp.asarray(xyz[sl]), jnp.asarray(vd[sl]),
            jnp.asarray(sc[b]), jnp.asarray(tc[b]))
        np.testing.assert_allclose(np.asarray(sig_j), sig_t[sl], atol=1e-5)
        np.testing.assert_allclose(np.asarray(rgb_j), rgb_t[sl], atol=1e-5)


def test_codenerf_positional_encoding_vs_reference():
    """PE layout parity: the reference concatenates all frequencies' sin then
    cos (model_codenerf.py:4-10), not interleaved."""
    from supnerf_tpu.models.nerf_mlp import positional_encoding

    ref_mod = _load_reference_module("model_codenerf")
    x = np.linspace(-1.5, 1.5, 12).reshape(4, 3).astype(np.float32)
    ref = ref_mod.PE(torch.from_numpy(x), 10).numpy()
    ours = np.asarray(positional_encoding(jnp.asarray(x), 10))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


# ------------------------------------------------------- volume rendering ---
@pytest.mark.parametrize("white_bkgd", [False, True])
def test_volume_rendering3_vs_reference(white_bkgd):
    """Compositing parity vs the reference volume_rendering3
    (renderer.py:355-379), extracted from the reference source and run in
    torch. Checks rgb, depth, and the final accumulated transmittance."""
    from supnerf_tpu.ops.volume_render import volume_render

    vr3 = _extract_reference_function("renderer.py", "volume_rendering3",
                                      {"torch": torch})
    rng = np.random.default_rng(2)
    N, S = 64, 16
    sigmas = (rng.normal(size=(N, S, 1)).astype(np.float32) * 2).clip(-3, None)
    rgbs = rng.uniform(0, 1, size=(N, S, 3)).astype(np.float32)
    z_vals = np.sort(rng.uniform(8, 25, size=(N, S)).astype(np.float32), axis=-1)

    rgb_t, depth_t, acc_t = vr3(torch.from_numpy(sigmas),
                                torch.from_numpy(rgbs),
                                torch.from_numpy(z_vals),
                                white_bkgd=white_bkgd)
    rgb_j, depth_j, acc_j = volume_render(jnp.asarray(sigmas),
                                          jnp.asarray(rgbs),
                                          jnp.asarray(z_vals),
                                          white_bkgd=white_bkgd)
    np.testing.assert_allclose(np.asarray(rgb_j), rgb_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth_j), depth_t.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(acc_j), acc_t.numpy(), atol=1e-5)


# ------------------------------------------------------ pose composition ----
def _torch_compose_pose_delta(src_pose, delta, dim, K, K_inv):
    """Reference fw_pose_one_step delta composition
    (optimizer_nuscenes.py:530-551) in torch+scipy: axis-angle increment
    (delta[:3]*2pi), uv shift (delta[3:5]*dim), depth ratio (delta[5]+1),
    translation re-lifted through K^-1."""
    from scipy.spatial.transform import Rotation

    delta = delta.clone()
    delta[:, :3] *= 2 * np.pi
    delta[:, 3:5] *= dim.unsqueeze(-1)
    delta[:, 5] += 1

    rot_vec_src = torch.from_numpy(
        Rotation.from_matrix(src_pose[:, :, :3].numpy()).as_rotvec()
    ).to(torch.float32)
    pred_rot_vec = rot_vec_src + delta[:, :3]
    pred_R = torch.from_numpy(
        Rotation.from_rotvec(pred_rot_vec.numpy()).as_matrix()
    ).to(torch.float32)

    T_src = src_pose[:, :, 3:]
    src_pose_uv = torch.matmul(K, T_src)
    pred_u = src_pose_uv[:, 0] / src_pose_uv[:, 2] + delta[:, 3:4]
    pred_v = src_pose_uv[:, 1] / src_pose_uv[:, 2] + delta[:, 4:5]
    pred_Z = src_pose[:, 2, 3:] * delta[:, 5:]
    pred_T = torch.cat([pred_u * pred_Z, pred_v * pred_Z, pred_Z], dim=1).unsqueeze(-1)
    pred_T = torch.matmul(K_inv, pred_T)
    return torch.cat([pred_R, pred_T], dim=2)


def test_pose_delta_composition_vs_torch_oracle():
    from scipy.spatial.transform import Rotation

    from supnerf_tpu.tto.refiner import compose_pose_delta

    rng = np.random.default_rng(3)
    B = 8
    rotvecs = rng.normal(size=(B, 3)) * 0.8
    Rm = Rotation.from_rotvec(rotvecs).as_matrix().astype(np.float32)
    T = np.stack([rng.uniform(-5, 5, B), rng.uniform(-2, 2, B),
                  rng.uniform(10, 40, B)], axis=-1).astype(np.float32)
    src = np.concatenate([Rm, T[:, :, None]], axis=2)
    delta = (rng.normal(size=(B, 6)) * 0.05).astype(np.float32)
    dim = rng.uniform(80, 300, size=(B,)).astype(np.float32)
    K = np.broadcast_to(np.array(
        [[800.0, 0, 640], [0, 800, 360], [0, 0, 1]], np.float32), (B, 3, 3)).copy()
    K_inv = np.linalg.inv(K)

    expect = _torch_compose_pose_delta(
        torch.from_numpy(src.copy()), torch.from_numpy(delta.copy()),
        torch.from_numpy(dim), torch.from_numpy(K), torch.from_numpy(K_inv)
    ).numpy()

    got = np.asarray(jax.vmap(compose_pose_delta)(
        jnp.asarray(src), jnp.asarray(delta), jnp.asarray(dim),
        jnp.asarray(K), jnp.asarray(K_inv)))
    np.testing.assert_allclose(got, expect, atol=1e-4)


def test_refiner_normalization_vs_reference_chain():
    """project_box_corners_normalized must match the reference's
    corners_of_box_batch -> view_points_batch -> normalize_by_roi chain
    (fw_pose_one_step :518-521) re-derived with plain numpy."""
    from scipy.spatial.transform import Rotation

    from supnerf_tpu.tto.refiner import project_box_corners_normalized

    rng = np.random.default_rng(4)
    Rm = Rotation.from_rotvec(rng.normal(size=3) * 0.5).as_matrix()
    t = np.array([1.0, 0.5, 18.0])
    pose = np.concatenate([Rm, t[:, None]], axis=1).astype(np.float32)
    wlh = np.array([1.9, 4.6, 1.7], np.float32)
    roi = np.array([500.0, 220.0, 700.0, 380.0], np.float32)
    K = np.array([[800.0, 0, 640], [0, 800, 360], [0, 0, 1]], np.float32)

    # numpy re-derivation following reference utils.py:1076-1110 (nusc corner
    # order: x fwd/back +-l/2, y left/right +-w/2, z up/down +-h/2 pattern),
    # view_points (K projection, normalize) and normalize_by_roi
    # (center-shift + divide by the FULL max ROI side, utils.py:1190-1192).
    w, l, h = wlh
    x_c = np.array([1, 1, 1, 1, -1, -1, -1, -1]) * (l / 2)
    y_c = np.array([1, -1, -1, 1, 1, -1, -1, 1]) * (w / 2)
    z_c = np.array([1, 1, -1, -1, 1, 1, -1, -1]) * (h / 2)
    corners = pose[:, :3] @ np.vstack([x_c, y_c, z_c]) + pose[:, 3:]
    uvz = K @ corners
    uv = uvz[:2] / uvz[2]
    dim = max(roi[2] - roi[0], roi[3] - roi[1])
    center = np.array([(roi[0] + roi[2]) / 2, (roi[1] + roi[3]) / 2])
    uv_norm_expect = (uv - center[:, None]) / dim

    uv_norm, dim_got = project_box_corners_normalized(
        jnp.asarray(pose), jnp.asarray(wlh), jnp.asarray(roi), jnp.asarray(K))
    np.testing.assert_allclose(float(dim_got), dim, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(uv_norm).reshape(2, 8), uv_norm_expect, atol=1e-4)


# ------------------------------------------------------------ ImgEncoder ----
def _extract_reference_class(filename, classname, namespace):
    """AST-extract a top-level class from a reference source file and exec it
    in `namespace` (for modules whose imports are unavailable)."""
    src = open(os.path.join(REF, filename)).read()
    tree = ast.parse(src)
    node = next(n for n in tree.body
                if isinstance(n, ast.ClassDef) and n.name == classname)
    code = ast.get_source_segment(src, node)
    exec(compile(code, f"{filename}:{classname}", "exec"), namespace)
    return namespace[classname]


def _torchvision_resnet_primitives():
    """Plain-torch reconstructions of the torchvision resnet primitives the
    reference ImgEncoder imports (torchvision is absent from this image).
    Standard definitions; attribute names (conv1/bn1/conv2/bn2/downsample)
    match torchvision so state_dict keys are identical."""
    import torch.nn as nn

    def conv3x3(in_planes, out_planes, stride=1, groups=1, dilation=1):
        return nn.Conv2d(in_planes, out_planes, kernel_size=3, stride=stride,
                         padding=dilation, groups=groups, bias=False,
                         dilation=dilation)

    def conv1x1(in_planes, out_planes, stride=1):
        return nn.Conv2d(in_planes, out_planes, kernel_size=1, stride=stride,
                         bias=False)

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None,
                     groups=1, base_width=64, dilation=1, norm_layer=None):
            super().__init__()
            if norm_layer is None:
                norm_layer = nn.BatchNorm2d
            self.conv1 = conv3x3(inplanes, planes, stride)
            self.bn1 = norm_layer(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = conv3x3(planes, planes)
            self.bn2 = norm_layer(planes)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    return BasicBlock, conv1x1, conv3x3


@pytest.mark.parametrize("pred_wlh", [False, True])
def test_img_encoder_vs_reference_torch_module(pred_wlh):
    """Identical weights -> identical shape/texture/pose codes + uv (+ wlh)
    between the reference's OWN ImgEncoder (model_supnerf.py:17-152, extracted
    with reconstructed torchvision primitives) and the flax encoder loaded
    through torch_import.import_encoder — with BatchNorm normalizing by BATCH
    statistics (the reference never calls .eval(); survey 'hard parts' (a)).

    This is the checkpoint-import contract for the 48M-param encoder: any
    head/layer mapping mix-up, conv/BN transpose error, or BN-semantics drift
    fails here."""
    import math
    from typing import Any, Callable, List, Optional, Type, Union

    import torch.nn as nn

    from supnerf_tpu.models.encoder import ImgEncoder as FlaxImgEncoder
    from supnerf_tpu.models.torch_import import import_encoder

    BasicBlock, conv1x1, conv3x3 = _torchvision_resnet_primitives()
    ns = {"torch": torch, "nn": nn, "math": math, "Type": Type, "Any": Any,
          "Callable": Callable, "Union": Union, "List": List,
          "Optional": Optional, "BasicBlock": BasicBlock, "Bottleneck": None,
          "conv1x1": conv1x1, "conv3x3": conv3x3}
    RefImgEncoder = _extract_reference_class("model_supnerf.py", "ImgEncoder", ns)

    layers, latent = (3, 4, 6, 3), 256
    torch.manual_seed(0)
    ref = RefImgEncoder(BasicBlock, list(layers), num_classes=latent,
                        pred_wlh=pred_wlh)
    ref.train()  # batch-stats BN, matching the reference's usage

    img = np.random.default_rng(0).normal(
        size=(2, 3, 128, 128)).astype(np.float32) * 0.5
    with torch.no_grad():
        out_t = ref(torch.from_numpy(img), pose_shortcut=True)
    if pred_wlh:
        shape_t, tex_t, pose_t, uv_t, wlh_t = [o.numpy() for o in out_t]
    else:
        shape_t, tex_t, pose_t, uv_t = [o.numpy() for o in out_t]

    sd = {"img_encoder." + k: v.detach().numpy()
          for k, v in ref.state_dict().items()}
    params, stats = import_encoder(sd, pred_wlh=pred_wlh, layers=layers)
    flax_enc = FlaxImgEncoder(latent_dim=latent, layers=layers,
                              pred_wlh=pred_wlh, pose_shortcut=True)
    out_j = flax_enc.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(img.transpose(0, 2, 3, 1)), True,
        mutable=["batch_stats"])[0]

    np.testing.assert_allclose(np.asarray(out_j["shape"]), shape_t, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_j["texture"]), tex_t, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_j["pose"]), pose_t, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_j["uv"]), uv_t, atol=2e-3)
    if pred_wlh:
        np.testing.assert_allclose(np.asarray(out_j["wlh"]), wlh_t, atol=2e-3)


def test_ray_box_intersection_vs_reference():
    """geometry.rays.ray_box_intersection vs the reference's own numpy
    ray_box_intersection (utils.py:236-281), AST-extracted. The reference
    boolean-gathers (z_in, z_out) over the hit map; the repo keeps static
    shapes and returns (t_near, t_far, hit) — compare the gathered values
    and the hit map itself."""
    ns = {"np": np}
    ref_fn = _extract_reference_function("utils.py", "ray_box_intersection",
                                         ns)

    from supnerf_tpu.geometry import rays as rays_mod

    rng = np.random.default_rng(11)
    R = 257
    # origins around/inside the unit box, unit directions — includes rays
    # starting inside (t_near < 0 < t_far) and clear misses
    ro = rng.normal(0, 1.5, (R, 1, 3))
    rd = rng.normal(size=(R, 1, 3))
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)

    z_in, z_out, imap = ref_fn(ro, rd)
    t_near, t_far, hit = rays_mod.ray_box_intersection(
        jnp.asarray(ro, jnp.float32), jnp.asarray(rd, jnp.float32))
    hit = np.asarray(hit)

    np.testing.assert_array_equal(hit, imap)
    assert hit.any() and not hit.all(), "fixture needs both hits and misses"
    np.testing.assert_allclose(np.asarray(t_near)[imap], z_in, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_far)[imap], z_out, rtol=1e-4,
                               atol=1e-5)


def test_export_strict_loads_into_reference_supnerf():
    """Export contract: state_dicts written by torch_import.export_state_dict
    strict-load into the reference's OWN SUPNeRF module (model_supnerf.py:165
    extracted with reconstructed torchvision primitives) — any missing/extra
    key, shape mismatch, or layout transpose error raises — and the loaded
    reference module reproduces this framework's decoder field and pose-delta
    outputs. This is what makes models trained here usable from the reference
    framework (trainer_unified_nuscenes.py load_pretrained_model :449-452 is
    a strict load)."""
    import math
    from typing import Any, Callable, List, Optional, Type, Union

    import torch.nn as nn

    from supnerf_tpu.models import build_model, init_model_variables
    from supnerf_tpu.models.supnerf import SUPNeRF as FlaxSUPNeRF
    from supnerf_tpu.models.torch_import import export_state_dict

    BasicBlock, conv1x1, conv3x3 = _torchvision_resnet_primitives()
    ns = {"torch": torch, "nn": nn, "math": math, "Type": Type, "Any": Any,
          "Callable": Callable, "Union": Union, "List": List,
          "Optional": Optional, "BasicBlock": BasicBlock, "Bottleneck": None,
          "conv1x1": conv1x1, "conv3x3": conv3x3}
    _extract_reference_class("model_supnerf.py", "ImgEncoder", ns)
    _extract_reference_function("model_supnerf.py", "PE", ns)
    RefSUPNeRF = _extract_reference_class("model_supnerf.py", "SUPNeRF", ns)

    hp = {"shape_blocks": 2, "texture_blocks": 1, "pose_blocks": 2,
          "regress_blocks": 2, "latent_dim": 32, "pose_shortcut": 1,
          "pred_wlh": 1}
    model = build_model("supnerf", hp)
    variables = init_model_variables(model, jax.random.PRNGKey(11))
    sd = export_state_dict(model, variables)

    ref = RefSUPNeRF(shape_blocks=2, texture_blocks=1, pose_blocks=2,
                     regress_blocks=2, latent_dim=32, pose_shortcut=True,
                     pred_wlh=True)
    ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True)
    ref.train()

    rng = np.random.default_rng(2)
    R, S, latent = 6, 4, 32
    xyz = rng.normal(size=(R, S, 3)).astype(np.float32) * 0.4
    vd = rng.normal(size=(R, S, 3)).astype(np.float32)
    sc = rng.normal(size=(1, latent)).astype(np.float32) * 0.3
    tc = rng.normal(size=(1, latent)).astype(np.float32) * 0.3
    im_feat = rng.normal(size=(2, latent)).astype(np.float32)
    box_uv = rng.normal(size=(2, 16)).astype(np.float32)

    with torch.no_grad():
        sig_t, rgb_t = ref(torch.from_numpy(xyz), torch.from_numpy(vd),
                           torch.from_numpy(sc), torch.from_numpy(tc))
        delta_t = ref.pose_update(torch.from_numpy(im_feat),
                                  torch.from_numpy(box_uv)).numpy()

    sig_j, rgb_j = model.apply({"params": variables["params"]},
                               jnp.asarray(xyz), jnp.asarray(vd),
                               jnp.asarray(sc[0]), jnp.asarray(tc[0]))
    delta_j = model.apply({"params": variables["params"]},
                          jnp.asarray(im_feat), jnp.asarray(box_uv),
                          method=FlaxSUPNeRF.pose_update)

    np.testing.assert_allclose(np.asarray(sig_j), sig_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb_j), rgb_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(delta_j), delta_t, atol=1e-5)


# --------------------------------------------------------------- AutoRF -----
def test_autorf_vs_reference_torch_module():
    """Identical weights -> identical (shape_feat, texture_feat) codes AND
    identical (sigma, rgb) field outputs between the reference's OWN AutoRF
    (model_autorf.py:10-186: two-head ResNet encoder + original
    feature-averaging decoder, extracted with reconstructed torchvision
    primitives) and the flax AutoRF loaded through
    torch_import.import_autorf_state_dict — BatchNorm on batch statistics.

    Exercises the baseline-family checkpoint-import contract: the
    layer4_shape/layer4_texture/fc_* encoder mapping shared with AutoRFMix,
    and the averaging-decoder layer set ((feat+pos)/2 chains, the 3-way
    average, the two viewdir concats, Softplus sigma / Sigmoid rgb)."""
    import math
    from typing import Any, Callable, List, Optional, Type, Union

    import torch.nn as nn

    from supnerf_tpu.models.autorf import AutoRF as FlaxAutoRF
    from supnerf_tpu.models.torch_import import import_autorf_state_dict

    BasicBlock, conv1x1, conv3x3 = _torchvision_resnet_primitives()
    ns = {"torch": torch, "nn": nn, "math": math, "Type": Type, "Any": Any,
          "Callable": Callable, "Union": Union, "List": List,
          "Optional": Optional, "BasicBlock": BasicBlock, "Bottleneck": None,
          "conv1x1": conv1x1, "conv3x3": conv3x3}
    RefImgEncoder = _extract_reference_class("model_autorf.py", "ImgEncoder",
                                             ns)
    ns["ImgEncoder"] = RefImgEncoder
    ns["PE"] = _extract_reference_function("model_autorf.py", "PE", ns)
    RefAutoRF = _extract_reference_class("model_autorf.py", "AutoRF", ns)

    latent, sb, tb = 128, 5, 5
    torch.manual_seed(0)
    ref = RefAutoRF(shape_blocks=sb, texture_blocks=tb, latent_dim=latent)
    ref.train()  # batch-stats BN (the reference never calls .eval())

    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 3, 128, 128)).astype(np.float32) * 0.5
    with torch.no_grad():
        shape_t, tex_t = ref.encode_img(torch.from_numpy(img))

    # decoder input layout per the reference forward (model_autorf.py:160-
    # 163): xyz rows are [obj0 pixels..., obj1 pixels...] and the per-object
    # codes are repeated across each object's pixel rows
    B, N = 2, 12
    xyz = rng.normal(size=(B * N, 1, 3)).astype(np.float32) * 0.4
    vd = rng.normal(size=(B * N, 1, 3)).astype(np.float32)
    with torch.no_grad():
        sig_t, rgb_t = ref(torch.from_numpy(xyz), torch.from_numpy(vd),
                           shape_t, tex_t)

    flax_model = FlaxAutoRF(shape_blocks=sb, texture_blocks=tb,
                            latent_dim=latent)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = import_autorf_state_dict(flax_model, sd)

    (shape_j, tex_j), _ = flax_model.apply(
        variables, jnp.asarray(img.transpose(0, 2, 3, 1)), True,
        method=FlaxAutoRF.encode_img, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(shape_j), shape_t.numpy(),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(tex_j), tex_t.numpy(), atol=2e-3)

    sf = np.repeat(shape_t.numpy(), N, axis=0)[:, None, :]  # (B*N, 1, latent)
    tf = np.repeat(tex_t.numpy(), N, axis=0)[:, None, :]
    sig_j, rgb_j = flax_model.apply(
        {"params": variables["params"]}, jnp.asarray(xyz), jnp.asarray(vd),
        jnp.asarray(sf), jnp.asarray(tf))
    np.testing.assert_allclose(np.asarray(sig_j), sig_t.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(rgb_j), rgb_t.numpy(), atol=2e-3)


# ------------------------------------------------- export oracles (baselines)
def test_export_strict_loads_into_reference_codenerf():
    """Export contract for the CodeNeRF baseline: export_state_dict output
    strict-loads into the reference's OWN CodeNeRF module
    (model_codenerf.py:13, plain torch import) and reproduces this
    framework's sigma/rgb field outputs — models trained here move back to
    the reference framework (its load_pretrained_model is a strict load)."""
    from supnerf_tpu.models import build_model, init_model_variables
    from supnerf_tpu.models.torch_import import export_state_dict

    ref_mod = _load_reference_module("model_codenerf")
    sb, tb = 2, 2
    W = latent = 48     # the factory ties W to latent_dim (published configs)
    model = build_model("codenerf", {"shape_blocks": sb, "texture_blocks": tb,
                                     "latent_dim": latent})
    variables = init_model_variables(model, jax.random.PRNGKey(7))
    sd = export_state_dict(model, variables)

    ref = ref_mod.CodeNeRF(shape_blocks=sb, texture_blocks=tb, W=W,
                           num_xyz_freq=10, num_dir_freq=4, latent_dim=latent)
    ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True)
    ref.eval()

    rng = np.random.default_rng(3)
    R, S = 6, 4
    xyz = rng.normal(size=(R, S, 3)).astype(np.float32) * 0.4
    vd = rng.normal(size=(R, S, 3)).astype(np.float32)
    sc = rng.normal(size=(1, latent)).astype(np.float32) * 0.3
    tc = rng.normal(size=(1, latent)).astype(np.float32) * 0.3
    with torch.no_grad():
        sig_t, rgb_t = ref(torch.from_numpy(xyz), torch.from_numpy(vd),
                           torch.from_numpy(sc), torch.from_numpy(tc))
    sig_j, rgb_j = model.apply({"params": variables["params"]},
                               jnp.asarray(xyz), jnp.asarray(vd),
                               jnp.asarray(sc[0]), jnp.asarray(tc[0]))
    np.testing.assert_allclose(np.asarray(sig_j), sig_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb_j), rgb_t.numpy(), atol=1e-5)


@pytest.mark.parametrize("variant", ["autorf", "autorfmix"])
def test_export_strict_loads_into_reference_autorf(variant):
    """Export contract for the AutoRF baselines: export_state_dict output
    strict-loads into the reference's OWN AutoRF / AutoRFMix modules
    (model_autorf.py:123,190, extracted with reconstructed torchvision
    primitives) and the loaded reference module reproduces this framework's
    encoder codes AND field outputs. Together with the SUPNeRF test this
    makes the two-way torch interop cover all three architectures."""
    import math
    from typing import Any, Callable, List, Optional, Type, Union

    import torch.nn as nn

    from supnerf_tpu.models import init_model_variables
    from supnerf_tpu.models.autorf import AutoRF as FlaxAutoRF
    from supnerf_tpu.models.autorf import AutoRFMix as FlaxAutoRFMix
    from supnerf_tpu.models.torch_import import export_state_dict

    BasicBlock, conv1x1, conv3x3 = _torchvision_resnet_primitives()
    ns = {"torch": torch, "nn": nn, "math": math, "Type": Type, "Any": Any,
          "Callable": Callable, "Union": Union, "List": List,
          "Optional": Optional, "BasicBlock": BasicBlock, "Bottleneck": None,
          "conv1x1": conv1x1, "conv3x3": conv3x3}
    ns["ImgEncoder"] = _extract_reference_class("model_autorf.py",
                                                "ImgEncoder", ns)
    ns["PE"] = _extract_reference_function("model_autorf.py", "PE", ns)

    latent, sb, tb = 64, 2, 2
    if variant == "autorf":
        RefCls = _extract_reference_class("model_autorf.py", "AutoRF", ns)
        model = FlaxAutoRF(shape_blocks=sb, texture_blocks=tb,
                           latent_dim=latent)
        flax_cls = FlaxAutoRF
    else:
        RefCls = _extract_reference_class("model_autorf.py", "AutoRFMix", ns)
        model = FlaxAutoRFMix(shape_blocks=sb, texture_blocks=tb,
                              latent_dim=latent)
        flax_cls = FlaxAutoRFMix
    variables = init_model_variables(model, jax.random.PRNGKey(9),
                                     img_size=64)
    sd = export_state_dict(model, variables)

    ref = RefCls(shape_blocks=sb, texture_blocks=tb, latent_dim=latent)
    ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True)
    ref.train()    # batch-stats BN, the reference's usage (never .eval())

    rng = np.random.default_rng(4)
    img = rng.normal(size=(2, 3, 64, 64)).astype(np.float32) * 0.5
    with torch.no_grad():
        shape_t, tex_t = ref.encode_img(torch.from_numpy(img))
    (shape_j, tex_j), _ = model.apply(
        variables, jnp.asarray(img.transpose(0, 2, 3, 1)), True,
        method=flax_cls.encode_img, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(shape_j), shape_t.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(tex_j), tex_t.numpy(), atol=2e-3)

    B, N = 2, 8
    xyz = rng.normal(size=(B * N, 1, 3)).astype(np.float32) * 0.4
    vd = rng.normal(size=(B * N, 1, 3)).astype(np.float32)
    with torch.no_grad():
        if variant == "autorf":
            sig_t, rgb_t = ref(torch.from_numpy(xyz), torch.from_numpy(vd),
                               shape_t, tex_t)
            sf = np.repeat(shape_t.numpy(), N, axis=0)[:, None, :]
            tf = np.repeat(tex_t.numpy(), N, axis=0)[:, None, :]
            sig_j, rgb_j = model.apply(
                {"params": variables["params"]}, jnp.asarray(xyz),
                jnp.asarray(vd), jnp.asarray(sf), jnp.asarray(tf))
        else:
            # the reference AutoRFMix repeats per-object (B, latent) codes
            # across each object's pixel rows itself (model_autorf.py:231-236);
            # the flax decoder takes the pre-repeated (B*N, 1, latent) layout
            sig_t, rgb_t = ref(torch.from_numpy(xyz), torch.from_numpy(vd),
                               shape_t, tex_t)
            sf = np.repeat(shape_t.numpy(), N, axis=0)[:, None, :]
            tf = np.repeat(tex_t.numpy(), N, axis=0)[:, None, :]
            sig_j, rgb_j = model.apply(
                {"params": variables["params"]}, jnp.asarray(xyz),
                jnp.asarray(vd), jnp.asarray(sf), jnp.asarray(tf))
    np.testing.assert_allclose(np.asarray(sig_j), sig_t.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(rgb_j), rgb_t.numpy(), atol=2e-3)
