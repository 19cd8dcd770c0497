"""Command-line entry points (the reference's main.cpp + hotkey actions).

Subcommands:
  render            one converged frame from a scene config -> PNG
                    (the interactive view, engine.cpp:run, headless)
  capture-dataset   full dataset capture: images + transforms + point cloud
                    (the V hotkey -> captureSceneData, engine.cpp:2658)
  panorama          360-degree toroidal sweep (G hotkey, engine.cpp:2898)
  fit               optimize a Gaussian scene against a rendered target
                    (the downstream 3DGS training the reference feeds)
  bench             run the benchmark harness

Usage:
  python -m pathtracer_gaussiansplatting_tpu.cli render --scene main_scene.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def _load(args):
    import jax.numpy as jnp

    from pathtracer_gaussiansplatting_tpu.core.types import RenderSettings
    from pathtracer_gaussiansplatting_tpu.models.scene import load_scene_from_config
    from pathtracer_gaussiansplatting_tpu.utils.config import load_scene_config

    cfg = load_scene_config(args.scene)
    base = os.path.dirname(os.path.abspath(args.scene))
    scene, punctual = load_scene_from_config(cfg, base)
    settings = RenderSettings(
        max_depth=args.max_depth or cfg.max_depth,
        ambient=tuple(cfg.ambient_light),
        max_contribs=args.max_contribs,
    )
    return cfg, scene, punctual, settings


def cmd_render(args):
    import jax
    import numpy as np

    from pathtracer_gaussiansplatting_tpu.core.camera import Camera, toroidal_c2w
    from pathtracer_gaussiansplatting_tpu.data.capture import (
        make_accumulating_renderer, render_pose,
    )
    from pathtracer_gaussiansplatting_tpu.data.images import save_png

    from pathtracer_gaussiansplatting_tpu.data.capture import (
        make_tiled_pose_renderer, resolve_backend,
    )

    cfg, scene, punctual, settings = _load(args)
    backend = resolve_backend(args.backend or cfg.backend,
                              scene.num_gaussians)
    c2w = toroidal_c2w(args.alpha, args.beta, cfg.torus.major_radius,
                       cfg.torus.height)
    if backend.startswith("tiled"):
        bounce = backend.split("+", 1)[1] if "+" in backend else "auto"
        pose_render = make_tiled_pose_renderer(
            scene, settings, punctual, args.spp, bounce_backend=bounce)
        img = pose_render(c2w, args.width or cfg.width,
                          args.height or cfg.height, cfg.fov_y_deg)
    else:
        render_fn = make_accumulating_renderer(scene, settings, punctual,
                                               spp=args.spp,
                                               backend=backend)
        img = render_pose(render_fn, c2w, args.width or cfg.width,
                          args.height or cfg.height, cfg.fov_y_deg,
                          chunk=args.chunk)
    save_png(args.output, np.clip(img, 0.0, 1.0))
    print(f"wrote {args.output} ({img.shape[1]}x{img.shape[0]}, "
          f"{args.spp} spp)")


def cmd_capture(args):
    from pathtracer_gaussiansplatting_tpu.data.capture import capture_scene_data

    cfg, scene, punctual, settings = _load(args)
    cap = cfg.capture
    out = capture_scene_data(
        scene, args.output, settings, torus=cfg.torus, punctual=punctual,
        accumulation_steps=args.spp or cap.accumulation_steps,
        total_positions=args.positions or cap.total_positions,
        min_beta=cap.min_beta, max_beta=cap.max_beta,
        image_divisor=cap.image_divisor,
        width=args.width or cfg.width, height=args.height or cfg.height,
        fov_y_deg=cfg.fov_y_deg,
        capture_images=cap.capture_images,
        capture_pointcloud=cap.capture_pointcloud,
        sampling_method=cfg.sampling_method,
        num_rays=args.num_rays, chunk=args.chunk,
        backend=args.backend or cfg.backend)
    print(json.dumps(dict(points=out["num_points"],
                          train=len(out["train_frames"]),
                          test=len(out["test_frames"]))))


def cmd_panorama(args):
    from pathtracer_gaussiansplatting_tpu.data.capture import capture_panorama

    cfg, scene, punctual, settings = _load(args)
    capture_panorama(scene, args.output, settings, torus=cfg.torus,
                     punctual=punctual, beta=args.beta, steps=args.steps,
                     accumulation_steps=args.spp,
                     width=args.width or cfg.width,
                     height=args.height or cfg.height,
                     fov_y_deg=cfg.fov_y_deg, chunk=args.chunk,
                     backend=args.backend or cfg.backend)


def cmd_fit(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pathtracer_gaussiansplatting_tpu.core.camera import (
        Camera, generate_rays, look_at,
    )
    from pathtracer_gaussiansplatting_tpu.data.ply import save_3dgs_ply
    from pathtracer_gaussiansplatting_tpu.models.scene import random_cloud
    from pathtracer_gaussiansplatting_tpu.parallel.train import fit_scene

    cfg, scene, punctual, settings = _load(args)
    cam = Camera(c2w=look_at((0, 0.5, 4.0), (0, 0, 0)), fov_y_deg=cfg.fov_y_deg,
                 width=args.width or 64, height=args.height or 64)
    rays = generate_rays(cam)
    from pathtracer_gaussiansplatting_tpu.render.reference import (
        render_radiance_dense,
    )

    target = render_radiance_dense(scene, rays, settings)
    init = random_cloud(args.init_gaussians, seed=7,
                        spread=float(np.abs(np.asarray(scene.means)).max()))
    fitted, losses = fit_scene(init, rays, target, settings,
                               steps=args.steps, lr=args.lr)
    print(f"loss {losses[0]:.5f} -> {losses[-1]:.5f} over {args.steps} steps")
    if args.output:
        save_3dgs_ply(args.output, fitted)
        print(f"wrote {args.output}")


def cmd_view_pointcloud(args):
    """Point-cloud overlay view (the P/O/T hotkeys, pointcloud.vert modes)."""
    import numpy as np

    from pathtracer_gaussiansplatting_tpu.core.camera import Camera, toroidal_c2w
    from pathtracer_gaussiansplatting_tpu.data.images import save_png
    from pathtracer_gaussiansplatting_tpu.data.ply import load_point_cloud_ply
    from pathtracer_gaussiansplatting_tpu.render.points import render_point_cloud
    from pathtracer_gaussiansplatting_tpu.utils.config import load_scene_config

    cfg = load_scene_config(args.scene)
    pc = load_point_cloud_ply(args.ply)
    n = len(pc["positions"])
    cam = Camera(c2w=toroidal_c2w(args.alpha, args.beta,
                                  cfg.torus.major_radius, cfg.torus.height),
                 fov_y_deg=cfg.fov_y_deg,
                 width=args.width or cfg.width,
                 height=args.height or cfg.height)
    uv = None
    if args.mode == "torus":
        # Regenerate the capture's (u, v) stream (fixed seed, like the
        # sampling pipeline) for sensor-surface reprojection.
        from pathtracer_gaussiansplatting_tpu.sampling.strategies import (
            generate_samples,
        )

        uv = np.asarray(generate_samples(args.sampling, n, seed=13))
    img = render_point_cloud(pc["positions"], pc["colors"],
                             pc.get("flags", np.ones(n)), cam,
                             mode=args.mode, uv=uv, torus=cfg.torus,
                             point_size=args.point_size)
    save_png(args.output, np.clip(np.asarray(img), 0.0, 1.0))
    print(f"wrote {args.output}")


def cmd_interact(args):
    """Headless interactive session (the reference's GLFW loop, scripted).

    Reads commands from stdin, one per line:
      w/a/s/d/c/r/p/z/x/m/n/u/j/1..7   hotkeys (see render/session.py)
      look DX DY                        cursor deltas
      step [N]                          accumulate N samples (default 1)
      save PATH.png                     write the current image
      quit
    """
    from pathtracer_gaussiansplatting_tpu.data.images import save_png
    from pathtracer_gaussiansplatting_tpu.render.session import (
        InteractiveSession,
    )

    _, scene, punctual, settings = _load(args)
    sess = InteractiveSession(scene, settings, width=args.width or 320,
                              height=args.height or 240, punctual=punctual)
    img = None
    stream = open(args.commands) if args.commands else sys.stdin
    for line in stream:
        parts = line.split()
        if not parts:
            continue
        cmd = parts[0].lower()
        if cmd == "quit":
            break
        elif cmd == "look":
            sess.look(float(parts[1]), float(parts[2]))
        elif cmd == "step":
            for _ in range(int(parts[1]) if len(parts) > 1 else 1):
                img = sess.step()
            print(f"frame {sess.frame} mode={sess.render_mode} "
                  f"cam={sess.camera_mode}")
        elif cmd == "save":
            if img is None:
                img = sess.step()
            save_png(parts[1], img)
            print(f"saved {parts[1]}")
        else:
            sess.key(cmd)
    if args.output and img is not None:
        save_png(args.output, img)


def cmd_bench(args):
    import bench

    bench.main()


def main(argv=None):
    p = argparse.ArgumentParser(prog="pathtracer_gaussiansplatting_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, output_default):
        sp.add_argument("--scene", required=True, help="scene config JSON")
        sp.add_argument("--output", default=output_default)
        sp.add_argument("--spp", type=int, default=32)
        sp.add_argument("--width", type=int, default=0)
        sp.add_argument("--height", type=int, default=0)
        sp.add_argument("--max-depth", type=int, default=0)
        sp.add_argument("--max-contribs", type=int, default=64)
        sp.add_argument("--chunk", type=int, default=65536)
        sp.add_argument(
            "--backend", default=None,
            choices=("auto", "dense", "grid", "tiled+grid", "tiled+dense"),
            help="traversal backend (default: scene config value, then "
                 "'auto' = tiled+grid above the dense-scene threshold)")

    sp = sub.add_parser("render", help="render one frame")
    common(sp, "render.png")
    sp.add_argument("--alpha", type=float, default=0.0)
    sp.add_argument("--beta", type=float, default=15.0)
    sp.set_defaults(fn=cmd_render)

    sp = sub.add_parser("capture-dataset", help="full dataset capture")
    common(sp, "dataset")
    sp.add_argument("--positions", type=int, default=0)
    sp.add_argument("--num-rays", type=int, default=None)
    sp.set_defaults(fn=cmd_capture)

    sp = sub.add_parser("panorama", help="360-degree sweep")
    common(sp, "dataset")
    sp.add_argument("--beta", type=float, default=0.0)
    sp.add_argument("--steps", type=int, default=360)
    sp.set_defaults(fn=cmd_panorama)

    sp = sub.add_parser("fit", help="fit a scene to rendered targets")
    common(sp, "fitted.ply")
    sp.add_argument("--steps", type=int, default=200)
    sp.add_argument("--lr", type=float, default=5e-3)
    sp.add_argument("--init-gaussians", type=int, default=500)
    sp.set_defaults(fn=cmd_fit)

    sp = sub.add_parser("view-pointcloud",
                        help="rasterize a captured point cloud (P/O/T view)")
    sp.add_argument("--scene", required=True)
    sp.add_argument("--ply", required=True, help="points3d.ply from capture")
    sp.add_argument("--output", default="pointcloud.png")
    sp.add_argument("--mode", choices=("world", "torus"), default="world")
    sp.add_argument("--sampling", default="halton",
                    help="uv stream to reproject with in torus mode")
    sp.add_argument("--alpha", type=float, default=0.0)
    sp.add_argument("--beta", type=float, default=15.0)
    sp.add_argument("--width", type=int, default=0)
    sp.add_argument("--height", type=int, default=0)
    sp.add_argument("--point-size", type=int, default=2)
    sp.set_defaults(fn=cmd_view_pointcloud)

    sp = sub.add_parser(
        "interact", help="headless interactive session (scripted hotkeys)")
    common(sp, "")
    sp.add_argument("--commands", default=None,
                    help="command file (default: stdin)")
    sp.set_defaults(fn=cmd_interact)

    sp = sub.add_parser("bench", help="benchmark harness")
    sp.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
