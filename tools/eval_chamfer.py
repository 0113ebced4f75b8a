"""Chamfer-distance evaluation between predicted and GT voxel grids.

The reference defers CD evaluation to the external Pix3D repository
(README.md:117); this tool implements the standard protocol in-repo:
voxel grids -> iso-surface meshes (native extractor) -> area-weighted
surface point samples -> bidirectional Chamfer score on TPU
(ops.nndistance_score, the rebuild of toolbox/nndistance).

Usage:
  python tools/eval_chamfer.py --pred out/batch0000.npz --key pred_voxel \
      --gt gt.npz --gt_key voxel [--n_points 1024] [--th 0.25] [--sigmoid]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def sample_surface(vol: np.ndarray, th: float, n_points: int,
                   rng: np.random.Generator) -> np.ndarray:
    """Area-weighted point samples of the iso-surface of a voxel grid,
    normalized to the unit cube centred at the origin."""
    from genre_shapehd_tpu.viz.mcubes import marching_cubes

    vol = np.asarray(vol, np.float32)
    res = max(vol.shape)
    verts, faces = marching_cubes(vol, th, spacing=(1 / res,) * 3)
    if len(faces) == 0:
        return np.zeros((n_points, 3), np.float32)
    verts = verts - 0.5
    tris = verts[faces]                                   # (F, 3, 3)
    a = tris[:, 1] - tris[:, 0]
    b = tris[:, 2] - tris[:, 0]
    areas = 0.5 * np.linalg.norm(np.cross(a, b), axis=1)
    probs = areas / max(areas.sum(), 1e-12)
    idx = rng.choice(len(faces), size=n_points, p=probs)
    u = rng.random((n_points, 1))
    v = rng.random((n_points, 1))
    flip = (u + v) > 1.0
    u = np.where(flip, 1.0 - u, u)
    v = np.where(flip, 1.0 - v, v)
    return (tris[idx, 0] + u * a[idx] + v * b[idx]).astype(np.float32)


def chamfer_between_voxels(pred: np.ndarray, gt: np.ndarray,
                           th: float = 0.25, use_sigmoid: bool = True,
                           n_points: int = 1024, seed: int = 0) -> float:
    """Standard GenRe/ShapeHD protocol: CD between surface samples of the
    (sigmoid'ed) prediction at iso 0.25 and the GT at iso 0.5."""
    import jax.numpy as jnp
    from genre_shapehd_tpu.ops import nndistance_score

    rng = np.random.default_rng(seed)
    if use_sigmoid:
        pred = 1.0 / (1.0 + np.exp(-pred))
    p1 = sample_surface(pred, th, n_points, rng)
    p2 = sample_surface(gt, 0.5, n_points, rng)
    score = nndistance_score(jnp.asarray(p1)[None], jnp.asarray(p2)[None])
    return float(np.asarray(score)[0])


def eval_directory(pred_dir: str, gt_dir: str, key: str, gt_key: str,
                   th: float, use_sigmoid: bool, n_points: int):
    """Batch protocol: pair every <name>.npz in pred_dir with gt_dir/<name>.npz,
    report per-item CDs and the mean (the per-class aggregation of the
    Pix3D protocol is a groupby over item names)."""
    import glob as globlib
    results = {}
    for pred_path in sorted(globlib.glob(os.path.join(pred_dir, "*.npz"))):
        name = os.path.basename(pred_path)
        gt_path = os.path.join(gt_dir, name)
        if not os.path.isfile(gt_path):
            continue
        pred = np.load(pred_path)[key]
        gt = np.load(gt_path)[gt_key]
        if pred.ndim == 4:
            pred = pred[0]
        if gt.ndim == 4:
            gt = gt[0]
        results[name] = chamfer_between_voxels(
            pred, gt, th=th, use_sigmoid=use_sigmoid, n_points=n_points)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred", default=None)
    ap.add_argument("--key", default="pred_voxel")
    ap.add_argument("--gt", default=None)
    ap.add_argument("--gt_key", default="voxel")
    ap.add_argument("--pred_dir", default=None,
                    help="directory of per-item .npz predictions")
    ap.add_argument("--gt_dir", default=None,
                    help="directory of matching .npz ground truths")
    ap.add_argument("--th", type=float, default=0.25)
    ap.add_argument("--n_points", type=int, default=1024)
    ap.add_argument("--no_sigmoid", action="store_true")
    ap.add_argument("--tpu", action="store_true",
                    help="run the chamfer matmul on the TPU (default CPU: "
                         "point sets are small and CPU avoids compile "
                         "latency)")
    args = ap.parse_args()

    if not args.tpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    if args.pred_dir:
        assert args.gt_dir, "--pred_dir requires --gt_dir"
        results = eval_directory(args.pred_dir, args.gt_dir, args.key,
                                 args.gt_key, args.th, not args.no_sigmoid,
                                 args.n_points)
        mean = float(np.mean(list(results.values()))) if results else None
        print(json.dumps({"mean_chamfer_distance": mean,
                          "n_items": len(results), "per_item": results}))
        return

    assert args.pred and args.gt, "--pred/--gt or --pred_dir/--gt_dir"
    pred = np.load(args.pred)[args.key]
    gt = np.load(args.gt)[args.gt_key]
    if pred.ndim == 4:
        pred = pred[0]
    if gt.ndim == 4:
        gt = gt[0]
    cd = chamfer_between_voxels(pred, gt, th=args.th,
                                use_sigmoid=not args.no_sigmoid,
                                n_points=args.n_points)
    print(json.dumps({"chamfer_distance": cd}))


if __name__ == "__main__":
    main()
