"""Model-based metrics: FID, LPIPS, AKD, AED, ID-similarity, pose.

Parity targets: metrics/pytorch_fid/fid_score.py:231-264 (FID protocol:
InceptionV3 pool3 2048-d, Frechet distance between dir stats),
metrics/cmp_lpips.py:11-47, metrics/extract.py:59-102,
metrics/cmp_id_similarity.py:43-64, metrics/norm_pose/cmp_pose_accuracy.py.

FID, LPIPS and AED run **natively on TPU** through JAX ports of the exact
backbones the reference uses (metrics/inception.py, lpips_jax.py,
openface.py) — the reference needs CUDA + torchvision/lpips for these;
here only the weight files are required (see tools/convert_metric_weights.py;
weight discovery below). AKD / ID-similarity / pose wrap third-party face
models (face_alignment, insightface, mediapipe) that have no
re-implementable open weights — they gate on their libraries with an
actionable message, exactly like a missing-CUDA reference install.

Weight discovery: env vars SAMT_INCEPTION_WEIGHTS / SAMT_LPIPS_WEIGHTS /
SAMT_OPENFACE_WEIGHTS point at a torch .pth or converted .npz; otherwise
$SAMT_WEIGHTS_DIR (default ~/.cache/samt_weights) is searched for
pt_inception-2015-12-05-6726825d.pth|inception.npz, lpips_vgg.npz|.pth,
openface.pth|.npz.
"""
from __future__ import annotations

import os
from os import path as osp
from typing import Dict, List, Optional

import numpy as np

from ..utils.registry import METRIC_REGISTRY


def frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6) -> float:
    """Frechet distance between gaussians (fid_score.py math)."""
    from scipy import linalg

    diff = mu1 - mu2
    covmean = np.atleast_2d(linalg.sqrtm(sigma1.dot(sigma2)))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm(
            (sigma1 + offset).dot(sigma2 + offset)
        )
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(
        diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
        - 2 * np.trace(covmean)
    )


def activation_statistics(features: np.ndarray):
    mu = np.mean(features, axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def _list_images(d: str) -> List[str]:
    exts = (".png", ".jpg", ".jpeg")
    return sorted(
        osp.join(d, f) for f in os.listdir(d) if f.lower().endswith(exts)
    )


def _require(module: str, what: str):
    try:
        return __import__(module)
    except ImportError as e:
        raise RuntimeError(
            f"Metric '{what}' needs the optional dependency '{module}' "
            f"(not available in this environment). PSNR/SSIM/L1 run "
            f"everywhere; FID/LPIPS/AED run natively given weight files."
        ) from e


# ---------------------------------------------------------------------------
# weight plumbing
# ---------------------------------------------------------------------------

def _weights_dir() -> str:
    return os.environ.get(
        "SAMT_WEIGHTS_DIR", osp.expanduser("~/.cache/samt_weights"))


def _find_weights(env_var: str, candidates: List[str],
                  what: str) -> Optional[str]:
    p = os.environ.get(env_var)
    if p:
        if not osp.exists(p):
            raise RuntimeError(f"{env_var}={p} does not exist")
        return p
    for name in candidates:
        c = osp.join(_weights_dir(), name)
        if osp.exists(c):
            return c
    return None


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def flatten_params(tree: Dict, prefix="") -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            flat.update(flatten_params(v, key + "/"))
        else:
            flat[key] = np.asarray(v)
    return flat


def _load_params(path: str, torch_converter) -> Dict:
    """Load a converted .npz param tree, or a torch .pth state_dict
    through `torch_converter`."""
    if path.endswith(".npz"):
        with np.load(path) as f:
            return _unflatten({k: f[k] for k in f.files})
    torch = _require("torch", "loading .pth weights")
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return torch_converter(sd)


def _missing(what: str, env_var: str, names: List[str],
             extra: str = "") -> RuntimeError:
    return RuntimeError(
        f"Metric '{what}' needs its backbone weights. Set {env_var} or "
        f"place one of {names} in {_weights_dir()} "
        f"(SAMT_WEIGHTS_DIR). Convert torch checkpoints with "
        f"tools/convert_metric_weights.py.{extra}"
    )


def _imread_rgb01(path: str, size=None) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise IOError(f"cannot read image {path}")
    if size is not None:
        img = cv2.resize(img, size, interpolation=cv2.INTER_LINEAR)
    return img[..., ::-1].astype(np.float32) / 255.0


def _resize_antialias01(img: np.ndarray, size) -> np.ndarray:
    """skimage.transform.resize-compatible anti-aliased downscale on a
    float [0,1] HWC image (reference extract.py:47 uses skimage, whose
    default anti_aliasing gaussian-prefilters with
    sigma = (downscale_factor - 1) / 2, mode 'mirror', then samples with
    half-pixel-center bilinear). cv2.INTER_LINEAR alone (no prefilter)
    systematically differs on 256->96; this matches skimage to edge-mode
    rounding."""
    import cv2
    from scipy.ndimage import gaussian_filter

    h, w = img.shape[:2]
    out_w, out_h = size
    sigma_h = max(0.0, ((h / out_h) - 1.0) / 2.0)
    sigma_w = max(0.0, ((w / out_w) - 1.0) / 2.0)
    if sigma_h > 0 or sigma_w > 0:
        img = gaussian_filter(img, (sigma_h, sigma_w, 0), mode="mirror")
    return cv2.resize(img, size, interpolation=cv2.INTER_LINEAR)


def _assert_paired_dirs(path_gt: str, path_generated: str, what: str):
    """Reference cmp_face_aed/akd assert df shapes match and file stems
    pair up row-for-row (extract.py:67-101); a mismatched or
    partially-written directory must be an error, not a silently wrong
    score. Returns the two sorted file lists."""
    f1, f2 = _list_images(path_gt), _list_images(path_generated)
    if len(f1) != len(f2):
        raise RuntimeError(
            f"{what}: frame-count mismatch between {path_gt} "
            f"({len(f1)}) and {path_generated} ({len(f2)})")
    for a, b in zip(f1, f2):
        # reference stem pairing strips the 1-char role suffix:
        # `file.split('.pn')[0][:-1]` pairs X_r <-> X_d / X_s
        sa = osp.splitext(osp.basename(a))[0][:-1]
        sb = osp.splitext(osp.basename(b))[0][:-1]
        if sa != sb:
            raise RuntimeError(
                f"{what}: unpaired frames '{osp.basename(a)}' vs "
                f"'{osp.basename(b)}'")
    return f1, f2


def _batched_apply(fn, images: List[np.ndarray], batch_size: int):
    """Run a jitted per-batch fn over a list with last-batch padding (keeps
    one compiled shape)."""
    feats = []
    n = len(images)
    for lo in range(0, n, batch_size):
        chunk = images[lo:lo + batch_size]
        pad = batch_size - len(chunk)
        batch = np.stack(chunk + [chunk[-1]] * pad)
        out = np.asarray(fn(batch))
        feats.append(out[:len(chunk)])
    return np.concatenate(feats, axis=0)


# ---------------------------------------------------------------------------
# FID (native)
# ---------------------------------------------------------------------------

@METRIC_REGISTRY.register(name="calculate_fid")
def calculate_fid(paths, batch_size: int = 32, **kwargs) -> float:
    """FID between two image directories — InceptionV3 pool3 features,
    batch 32 (fid_score.py:249-264), computed on-device."""
    import jax
    import jax.numpy as jnp
    from .inception import convert_torch_inception, extract_features

    wpath = _find_weights(
        "SAMT_INCEPTION_WEIGHTS",
        ["pt_inception-2015-12-05-6726825d.pth", "inception.npz",
         "pt_inception.pth"], "fid")
    if wpath is None:
        raise _missing("fid", "SAMT_INCEPTION_WEIGHTS",
                       ["pt_inception-2015-12-05-6726825d.pth",
                        "inception.npz"])
    params = jax.tree_util.tree_map(
        jnp.asarray, _load_params(wpath, convert_torch_inception))
    fn = jax.jit(lambda b: extract_features(params, b))

    stats = []
    for d in paths:
        files = _list_images(d)
        if not files:
            raise RuntimeError(f"FID: no images in {d}")
        imgs = [_imread_rgb01(f) for f in files]
        feats = _batched_apply(fn, imgs, batch_size)
        stats.append(activation_statistics(feats.astype(np.float64)))
    return frechet_distance(stats[0][0], stats[0][1],
                            stats[1][0], stats[1][1])


# ---------------------------------------------------------------------------
# LPIPS (native)
# ---------------------------------------------------------------------------

def _lpips_pairs(path1: str, path2: str):
    """cmp_lpips.py:30-35 pairing: path2 name is `name[:-6] + '_d.png'`
    when present, else the identical file name."""
    pairs = []
    for f in sorted(os.listdir(path1)):
        if not f.lower().endswith((".png", ".jpg", ".jpeg")):
            continue
        alt = f[:-6] + "_d.png"
        second = alt if osp.exists(osp.join(path2, alt)) else f
        pairs.append((osp.join(path1, f), osp.join(path2, second)))
    return pairs


@METRIC_REGISTRY.register(name="calculate_lpips")
def calculate_lpips(path1, path2, batch_size: int = 16, **kwargs) -> float:
    """Mean LPIPS(vgg) over paired files (cmp_lpips.py:11-47), on-device."""
    import jax
    import jax.numpy as jnp
    from .lpips_jax import convert_lpips_weights, lpips_distance

    wpath = _find_weights("SAMT_LPIPS_WEIGHTS",
                          ["lpips_vgg.npz", "lpips_vgg.pth"], "lpips")
    if wpath is None:
        raise _missing("lpips", "SAMT_LPIPS_WEIGHTS",
                       ["lpips_vgg.npz", "lpips_vgg.pth"])
    if wpath.endswith(".pth"):
        raise RuntimeError(
            "LPIPS .pth needs both the vgg16 backbone and the lin heads — "
            "merge them into lpips_vgg.npz with "
            "tools/convert_metric_weights.py --lpips <vgg16.pth> <lins.pth>")
    params = jax.tree_util.tree_map(
        jnp.asarray, _load_params(wpath, None))
    fn = jax.jit(lambda a, b: lpips_distance(params, a, b))

    pairs = _lpips_pairs(path1, path2)
    if not pairs:
        raise RuntimeError(f"LPIPS: no images in {path1}")
    dists = []
    for lo in range(0, len(pairs), batch_size):
        chunk = pairs[lo:lo + batch_size]
        pad = batch_size - len(chunk)
        chunk = chunk + [chunk[-1]] * pad
        # im2tensor protocol: uint8 -> x/127.5 - 1 (cmp_lpips.py:38-39)
        a = np.stack([_imread_rgb01(p[0]) for p in chunk]) * 2.0 - 1.0
        b = np.stack([_imread_rgb01(p[1]) for p in chunk]) * 2.0 - 1.0
        out = np.asarray(fn(a, b))
        dists.append(out[:batch_size - pad])
    return float(np.mean(np.concatenate(dists)))


# ---------------------------------------------------------------------------
# AED (native OpenFace embeddings)
# ---------------------------------------------------------------------------

def _openface_embed_dir(d: str, batch_size: int = 32) -> np.ndarray:
    import jax
    import jax.numpy as jnp
    from .openface import convert_openface_weights, embed_faces

    wpath = _find_weights("SAMT_OPENFACE_WEIGHTS",
                          ["openface.pth", "openface.npz"], "aed")
    if wpath is None:
        raise _missing("aed", "SAMT_OPENFACE_WEIGHTS",
                       ["openface.pth", "openface.npz"])
    params = jax.tree_util.tree_map(
        jnp.asarray, _load_params(wpath, convert_openface_weights))
    fn = jax.jit(lambda b: embed_faces(params, b))

    files = _list_images(d)
    if not files:
        raise RuntimeError(f"AED: no images in {d}")
    # extract.py:45-47 protocol: RGB -> BGR, skimage resize 96 (anti-
    # aliased, float [0,1] out)
    imgs = [_resize_antialias01(_imread_rgb01(f)[..., ::-1], (96, 96))
            for f in files]
    return _batched_apply(fn, imgs, batch_size)


@METRIC_REGISTRY.register(name="calculate_aed")
def calculate_aed(path_gt, path_generated, **kwargs) -> float:
    """Mean squared-L2 distance of OpenFace 128-d id embeddings between
    paired driving/generated frames (extract.py:'cmp_face_aed')."""
    _assert_paired_dirs(path_gt, path_generated, "AED")
    e1 = _openface_embed_dir(path_gt)
    e2 = _openface_embed_dir(path_generated)
    return float(np.mean(np.sum((e1 - e2) ** 2, axis=1)))


# ---------------------------------------------------------------------------
# AKD / ID-similarity / pose (gated on third-party face models)
# ---------------------------------------------------------------------------

@METRIC_REGISTRY.register(name="calculate_akd")
def calculate_akd(path_gt, path_generated, **kwargs) -> float:
    """Mean abs diff of 68 face-alignment landmarks
    (extract.py:'cmp_face_akd')."""
    _assert_paired_dirs(path_gt, path_generated, "AKD")
    fa_mod = _require("face_alignment", "akd")
    fa = fa_mod.FaceAlignment(fa_mod.LandmarksType.TWO_D, flip_input=False)

    def _landmarks(d):
        out = {}
        for f in _list_images(d):
            img = (_imread_rgb01(f) * 255).astype(np.uint8)
            kp = fa.get_landmarks(img)
            out[osp.basename(f)] = None if kp is None else kp[0]
        return out

    l1, l2 = _landmarks(path_gt), _landmarks(path_generated)
    scores = []
    for (k1, v1), (k2, v2) in zip(sorted(l1.items()), sorted(l2.items())):
        if v1 is not None and v2 is not None:
            scores.append(np.mean(np.abs(v1 - v2)))
    if not scores:
        raise RuntimeError("AKD: no faces detected in either directory")
    return float(np.mean(scores))


@METRIC_REGISTRY.register(name="calculate_id_similarity")
def calculate_id_similarity(path_gt, path_generated,
                            cross_id: bool = False, **kwargs) -> float:
    """Cosine similarity of insightface antelopev2 embeddings
    (cmp_id_similarity.py:43-64)."""
    # both modes are frame-paired: cross-id passes the per-frame source
    # dir (animate.py writes one source frame per driving frame)
    _assert_paired_dirs(path_gt, path_generated, "ID-similarity")
    insightface = _require("insightface", "id_similarity")
    app = insightface.app.FaceAnalysis(name="antelopev2")
    app.prepare(ctx_id=-1)

    def _embed(d):
        out = []
        for f in _list_images(d):
            img = (_imread_rgb01(f)[..., ::-1] * 255).astype(np.uint8)
            faces = app.get(img)
            out.append(None if not faces else faces[0].normed_embedding)
        return out

    e1, e2 = _embed(path_gt), _embed(path_generated)
    sims = [float(np.dot(a, b)) for a, b in zip(e1, e2)
            if a is not None and b is not None]
    if not sims:
        raise RuntimeError("ID-similarity: no faces detected")
    return float(np.mean(sims))


def _pose_angles_dir(d: str, landmarker) -> List[Optional[np.ndarray]]:
    """Per-image euler angles from mediapipe facial transformation
    matrices (mp_utils_refine.py:40-95 -> pose_util euler decompose)."""
    import mediapipe as mp

    from .pose_util import matrix_to_euler_and_translation

    out: List[Optional[np.ndarray]] = []
    for f in _list_images(d):
        rgb = (_imread_rgb01(f) * 255).astype(np.uint8)
        res = landmarker.detect(
            mp.Image(image_format=mp.ImageFormat.SRGB, data=rgb))
        if len(res.facial_transformation_matrixes) != 1:
            out.append(None)
            continue
        euler, _ = matrix_to_euler_and_translation(
            np.asarray(res.facial_transformation_matrixes[0]))
        out.append(euler)
    return out


@METRIC_REGISTRY.register(name="calculate_pose_accuracy")
@METRIC_REGISTRY.register(name="calculate_pose_distance")
def calculate_pose_accuracy(path_gt, path_generated, **kwargs) -> float:
    """L1 distance of mediapipe face-landmarker euler angles
    (norm_pose/cmp_pose_accuracy.py:40-61).

    Uses the stock mediapipe FaceLandmarker with
    output_facial_transformation_matrixes (the reference vendors a
    patched copy only to also expose the 3D mesh, which this metric
    never reads). The .task model blob is discovered like every other
    metric backbone weight."""
    _require("mediapipe", "pose_accuracy")
    from mediapipe.tasks import python as mp_python
    from mediapipe.tasks.python import vision

    task = _find_weights(
        "SAMT_FACE_LANDMARKER_TASK",
        ["face_landmarker_v2_with_blendshapes.task", "face_landmarker.task"],
        "pose_accuracy")
    if task is None:
        raise _missing(
            "pose_accuracy", "SAMT_FACE_LANDMARKER_TASK",
            ["face_landmarker_v2_with_blendshapes.task"],
            " (mediapipe face-landmarker task blob; the reference ships "
            "it in .MISSING_LARGE_BLOBS)")
    landmarker = vision.FaceLandmarker.create_from_options(
        vision.FaceLandmarkerOptions(
            base_options=mp_python.BaseOptions(model_asset_path=task),
            output_facial_transformation_matrixes=True, num_faces=1))
    a1 = _pose_angles_dir(path_gt, landmarker)
    a2 = _pose_angles_dir(path_generated, landmarker)
    scores = [float(np.mean(np.abs(x - y)))
              for x, y in zip(a1, a2) if x is not None and y is not None]
    if not scores:
        raise RuntimeError("pose_accuracy: no faces detected")
    return float(np.mean(scores))
