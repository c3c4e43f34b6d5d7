"""CLI inverse-rendering driver (BASELINE config #5).

Renders a ground-truth target with one scene, perturbs chosen parameters,
and recovers them by pixel-loss gradient descent — optionally with the film
sharded over a device mesh (tile data parallelism + psum'd gradients) and
periodic orbax checkpoints:

    python -m physically_based_renderer_tpu.apps.inverse \
        --params base_color,emissive --steps 200 --tiles 8 \
        --checkpoint-dir /tmp/ckpt --report report.json
"""

from __future__ import annotations

import argparse
import json
import time


def build_parser():
    p = argparse.ArgumentParser(prog="pbr-inverse")
    p.add_argument("--scene", default="cornell",
                   help="builtin config name or .glb path")
    p.add_argument("--params", default="base_color,emissive",
                   help="comma list: base_color,roughness,metallic,"
                        "emissive,textures,env,vertices")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--lr", type=float, default=5e-2)
    p.add_argument("--spp", type=int, default=2)
    p.add_argument("--target-spp", type=int, default=None,
                   help="spp for the ground-truth target (default 8x spp)")
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--bounces", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tiles", type=int, default=0,
                   help="shard rows over N devices (0 = single)")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-every", type=int, default=50)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--report", default=None, help="write JSON report")
    p.add_argument("--perturb-scale", type=float, default=0.5)
    p.add_argument("--edge-gradients", action="store_true",
                   help="add the primary-visibility boundary term via "
                        "silhouette edge sampling (grad/edge.py) — "
                        "required for pure-translation vertex recovery")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ..grad.inverse import TrainableParams, apply_params, make_train_step
    from ..integrator.path import RenderConfig, render
    from ..parallel import distributed
    from ..scene.types import upload_scene
    from ..utils import checkpoint as ckpt_mod
    from ..utils import config as config_mod
    from ..utils.profiling import logger

    # Multi-host bootstrap (no-op single-process; see parallel/distributed).
    distributed.ensure_initialized()

    if args.scene in config_mod.CONFIGS:
        scene, camera = config_mod.build_scene(
            config_mod.get(args.scene).scene)
    else:
        from ..scene import gltf as gltf_mod
        scene, _, camera = gltf_mod.load(args.scene)

    cfg = RenderConfig(width=args.size, height=args.size, spp=args.spp,
                       max_bounces=args.bounces)
    mesh = None
    if args.tiles:
        from ..parallel.sharding import make_mesh, replicate_scene
        mesh = make_mesh(jax.devices()[:args.tiles])
        scene = replicate_scene(scene, mesh)
    else:
        scene = upload_scene(scene)

    # Ground truth from the unperturbed scene (higher spp: at 1-2 spp the
    # pixel loss is dominated by Monte-Carlo noise and carries no signal).
    import dataclasses as _dc
    tspp = args.target_spp or max(8, args.spp * 8)
    tcfg = _dc.replace(cfg, spp=tspp)
    target = render(scene, camera, jax.random.key(9999), tcfg).mean()
    target.block_until_ready()
    logger.info("target rendered (%dx%d @ %d spp)", args.size, args.size,
                tspp)

    sel = {k.strip() for k in args.params.split(",") if k.strip()}
    true_params = TrainableParams.from_scene(
        scene,
        base_color="base_color" in sel, roughness="roughness" in sel,
        metallic="metallic" in sel, emissive="emissive" in sel,
        textures="textures" in sel, env="env" in sel,
        vertices="vertices" in sel)

    # Perturb the initial guess.
    k = jax.random.key(args.seed + 1)

    def perturb(x):
        nonlocal k
        k, sub = jax.random.split(k)
        noise = jax.random.uniform(sub, jnp.asarray(x).shape,
                                   minval=-args.perturb_scale,
                                   maxval=args.perturb_scale)
        return jnp.clip(jnp.asarray(x) * (1.0 + noise) + 0.1 * noise,
                        0.0, None)

    params = jax.tree.map(perturb, true_params)
    if params.base_color_factor is not None:
        # alpha is unused by the opaque BSDF: keep it fixed (no gradient
        # would ever correct a perturbation there)
        params = params.replace(base_color_factor=params.base_color_factor
                                .at[..., 3].set(
                                    true_params.base_color_factor[..., 3]))
    init_params = params

    opt = optax.adam(args.lr)
    opt_state = opt.init(params)
    edges = None
    if args.edge_gradients:
        from ..grad.edge import build_edge_table
        edges = build_edge_table(scene.geometry.indices)
        logger.info("edge gradients on: %d mesh edges", edges.num_edges)
    step_fn = make_train_step(scene, camera, cfg, opt, mesh=mesh,
                              edges=edges)

    start = 0
    if args.resume and args.checkpoint_dir:
        try:
            start, payload = ckpt_mod.restore(
                args.checkpoint_dir,
                {"params": params, "opt_state": opt_state, "extra": {}})
            params, opt_state = payload["params"], payload["opt_state"]
            logger.info("resumed from step %d", start)
        except FileNotFoundError:
            pass

    key = jax.random.key(args.seed)
    losses = []
    t0 = time.perf_counter()
    for i in range(start, args.steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step_fn(params, opt_state, sub, target)
        losses.append(float(loss))
        if i % 10 == 0 or i == args.steps - 1:
            logger.info("step %d loss %.6f", i, losses[-1])
        if (args.checkpoint_dir and args.checkpoint_every
                and (i + 1) % args.checkpoint_every == 0):
            ckpt_mod.save(args.checkpoint_dir, i + 1, params, opt_state)
    dt = time.perf_counter() - t0

    # Recovery error vs ground truth (mean abs, relative to field scale).
    # Mean, not max: components the image does not constrain (e.g. unused
    # alpha channels, invisible materials) receive no gradient and would pin
    # a max metric at the initial perturbation.
    def field_errors(p):
        errs = {}
        for field in ("base_color_factor", "roughness_factor",
                      "metallic_factor", "emissive_factor", "texture_data",
                      "env_data", "vertex_positions"):
            t = getattr(true_params, field)
            r = getattr(p, field)
            if t is not None and r is not None:
                t = np.asarray(t)
                r = np.asarray(r)
                if field == "base_color_factor":
                    t, r = t[..., :3], r[..., :3]  # alpha is unused
                denom = float(np.abs(t).mean()) or 1.0
                errs[field] = float(np.abs(r - t).mean()) / denom
        return errs

    report = {"steps": args.steps, "seconds": dt,
              "final_loss": losses[-1] if losses else None,
              "initial_loss": losses[0] if losses else None,
              "initial_error": field_errors(init_params),
              "final_error": field_errors(params)}
    print(json.dumps(report, indent=2))
    if args.report:
        with open(args.report, "w") as f:
            json.dump({**report, "losses": losses}, f)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
