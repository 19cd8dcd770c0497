"""Close the reference's downstream loop, small (VERDICT r4 #7).

The reference's only published success metric is 3DGS reconstruction
quality trained on its captured datasets (README.md:55-63). This drives
the same loop end-to-end INSIDE this framework, at toy scale, on the
TPU:

  1. capture_scene_data on the flagship Cornell-style surface scene
     (tiled primary + grid bounces — the production backend) writes
     dataset/{train/*.jpg, transforms_*.json, points3d.ply};
  2. a FRESH scene is initialized from the captured point cloud (the
     SfM-free 3DGS init the reference exists to enable, README.md:3);
  3. fit_scene_tiled optimizes it against the captured train images;
  4. PSNR/SSIM are reported on the HELD-OUT test poses.

Writes DOWNSTREAM.json; BASELINE.md records the numbers.

Run: python benchmarks/downstream_loop.py  (TPU, ~15 min)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from pathtracer_gaussiansplatting_tpu.core.camera import Camera
    from pathtracer_gaussiansplatting_tpu.core.torus import TorusConfig
    from pathtracer_gaussiansplatting_tpu.core.types import (
        RenderSettings, make_scene,
    )
    from pathtracer_gaussiansplatting_tpu.data.capture import (
        capture_scene_data,
    )
    from pathtracer_gaussiansplatting_tpu.data.images import srgb_to_linear
    from pathtracer_gaussiansplatting_tpu.data.ply import (
        load_point_cloud_ply,
    )
    from pathtracer_gaussiansplatting_tpu.data.transforms import (
        load_transforms_json,
    )
    from pathtracer_gaussiansplatting_tpu.models.scene import surface_scene
    from pathtracer_gaussiansplatting_tpu.ops.binning import BinningConfig
    from pathtracer_gaussiansplatting_tpu.parallel.train import (
        fit_scene_tiled,
    )
    from pathtracer_gaussiansplatting_tpu.render.tiled import (
        render_tiled_pallas,
    )
    from pathtracer_gaussiansplatting_tpu.utils import metrics as mx

    out_dir = os.environ.get("GSPT_DS_DIR", "/tmp/gspt_downstream")
    n_gt = int(os.environ.get("GSPT_DS_N", 50_000))
    poses = int(os.environ.get("GSPT_DS_POSES", 8))
    spp = int(os.environ.get("GSPT_DS_SPP", 32))
    res = int(os.environ.get("GSPT_DS_RES", 200))
    n_pc_rays = int(os.environ.get("GSPT_DS_PC_RAYS", 40_000))
    fit_steps = int(os.environ.get("GSPT_DS_STEPS", 600))

    scene_gt = surface_scene(n_gt, seed=13)
    settings = RenderSettings(max_depth=4, ambient=(0.05, 0.05, 0.06, 1.0))
    torus = TorusConfig(major_radius=1.2, minor_radius=0.4, height=0.2,
                        num_rays=n_pc_rays)  # INSIDE the room (half 2,1.5,2)

    t0 = time.time()
    res_cap = capture_scene_data(
        scene_gt, out_dir, settings, torus=torus,
        accumulation_steps=spp, total_positions=poses,
        image_divisor=1, width=res, height=res, fov_y_deg=50.0,
        backend="tiled+grid", num_rays=n_pc_rays,
        progress=lambda m: print(f"[capture] {m}", flush=True))
    t_capture = time.time() - t0
    print(f"capture done in {t_capture:.0f}s", flush=True)

    def load_split(name):
        meta = load_transforms_json(
            os.path.join(out_dir, f"transforms_{name}.json"))
        cams, imgs = [], []
        fov_x = meta["camera_angle_x"]
        for fr in meta["frames"]:
            img_path = os.path.join(out_dir,
                                    fr["file_path"].lstrip("./") + ".jpg")
            img = srgb_to_linear(
                np.asarray(Image.open(img_path), np.float32) / 255.0)
            h, w = img.shape[:2]
            fov_y = 2.0 * np.arctan(np.tan(fov_x / 2.0) * h / w)
            cams.append(Camera(c2w=jnp.asarray(fr["transform_matrix"]),
                               fov_y_deg=float(np.degrees(fov_y)),
                               width=w, height=h))
            imgs.append(img.astype(np.float32))
        return cams, imgs

    train_cams, train_imgs = load_split("train")
    test_cams, test_imgs = load_split("test")
    print(f"loaded {len(train_cams)} train / {len(test_cams)} test poses",
          flush=True)

    # --- fresh scene from the captured point cloud (SfM-free init) ---
    pc = load_point_cloud_ply(os.path.join(out_dir, "points3d.ply"))
    pos = np.asarray(pc["positions"], np.float32)
    col = np.asarray(pc["colors"], np.float32)
    m = pos.shape[0]
    print(f"point cloud: {m} points", flush=True)
    # isotropic splats at ~the mean nearest-sample spacing
    bbox = pos.max(0) - pos.min(0)
    area = 2.0 * (bbox[0] * bbox[1] + bbox[1] * bbox[2]
                  + bbox[0] * bbox[2])
    spacing = float(np.sqrt(area / max(m, 1)))
    init = make_scene(
        means=pos,
        log_scales=np.full((m, 3), np.log(spacing), np.float32),
        quats=np.tile(np.asarray([1.0, 0.0, 0.0, 0.0], np.float32),
                      (m, 1)),
        opacity_logits=np.full((m,), -1.0, np.float32),
        colors=np.clip(col, 0.0, 1.0), sh_degree=1)

    fit_settings = RenderSettings(background=(0.1, 0.1, 0.12),
                                  sh_degree=1)
    cfg = BinningConfig()
    t0 = time.time()
    fitted, losses, final = fit_scene_tiled(
        init, train_cams, train_imgs, fit_settings, steps=fit_steps,
        lr=5e-3, config=cfg,
        progress=lambda i, l: (i % 100 == 0) and print(
            f"[fit] step {i}: loss {l:.5f}", flush=True))
    t_fit = time.time() - t0

    # held-out metrics (the reference's README table definition)
    test_metrics = []
    for cam, img in zip(test_cams, test_imgs):
        out = render_tiled_pallas(fitted, cam, fit_settings, cfg)
        test_metrics.append((float(mx.psnr(out["color"], img)),
                            float(mx.ssim(out["color"], img))))
    psnrs = [p for p, _ in test_metrics]
    ssims = [s for _, s in test_metrics]
    result = dict(
        config=dict(gt_gaussians=n_gt, poses=poses, spp=spp, res=res,
                    pc_rays=n_pc_rays, fit_steps=fit_steps,
                    fitted_gaussians=int(m),
                    backend="tiled+grid capture -> tiled fwd+bwd fit"),
        capture_s=round(t_capture, 1),
        fit_s=round(t_fit, 1),
        train_loss_first=losses[0], train_loss_last=losses[-1],
        train_pose0_psnr=final["psnr"], train_pose0_ssim=final["ssim"],
        test_psnr_mean=float(np.mean(psnrs)),
        test_ssim_mean=float(np.mean(ssims)),
        test_psnr=psnrs, test_ssim=ssims,
        device=str(jax.devices()[0]),
    )
    print(json.dumps(result, indent=1), flush=True)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "DOWNSTREAM.json"), "w") as f:
        json.dump(result, f, indent=1)
    print("wrote DOWNSTREAM.json", flush=True)


if __name__ == "__main__":
    main()
