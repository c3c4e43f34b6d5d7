"""Config system: named benchmark configs + CLI arg plumbing.

The reference's "config system" is argv position 1 + one flag
(`src/gltf_viewer/Main.cpp:15-27`) with everything else compile-time
constants (SURVEY.md section 5).  The TPU build needs the BASELINE.json
configs selectable by name, so this is a real (dataclass) config layer.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

from ..integrator.path import RenderConfig


@dataclasses.dataclass(frozen=True)
class SceneSpec:
    """How to obtain the scene + camera for a named config."""

    builder: str               # 'triangle' | 'cornell' | 'cornell_ggx' |
    #                            'helmet' | 'gltf'
    camera_position: tuple = (0.0, 1.0, 3.9)
    camera_target: tuple = (0.0, 1.0, 0.0)
    fov_y: float = 0.95
    cluster_k: int | None = None   # None = accel/clusters.CLUSTER_K
    extra: dict = dataclasses.field(default_factory=dict)


@dataclasses.dataclass(frozen=True)
class BenchConfig:
    """A named, fully-specified render setup (BASELINE.json configs)."""

    name: str
    render: RenderConfig
    scene: SceneSpec
    description: str = ""


# BASELINE.json "configs", one for one.
CONFIGS: dict[str, BenchConfig] = {}


def _register(cfg: BenchConfig) -> BenchConfig:
    CONFIGS[cfg.name] = cfg
    return cfg


_register(BenchConfig(
    name="triangle",
    description="config #1: single glTF triangle + directional light, "
                "Lambertian, 1 bounce, 256x256 (CPU-runnable ref)",
    render=RenderConfig(width=256, height=256, spp=4, max_bounces=1),
    scene=SceneSpec(builder="triangle", camera_position=(0.0, 0.0, 3.0),
                    camera_target=(0.0, 0.0, 0.0), fov_y=1.2),
))
_register(BenchConfig(
    name="cornell",
    description="config #2: Cornell box, diffuse-only path tracing, "
                "4 bounces, NEE, 512x512",
    render=RenderConfig(width=512, height=512, spp=4, max_bounces=4),
    scene=SceneSpec(builder="cornell"),
))
_register(BenchConfig(
    name="cornell_ggx",
    description="config #3: metallic-roughness GGX materials + textures, "
                "MIS, 4 spp",
    render=RenderConfig(width=512, height=512, spp=4, max_bounces=4),
    scene=SceneSpec(builder="cornell_ggx", extra={"roughness": 0.25}),
))
_register(BenchConfig(
    name="helmet",
    description="config #4: DamagedHelmet-class .glb asset (~100k tris, 3 "
                "materials, 4 mixed-size textures incl. normal + emissive "
                "maps) with HDR environment map, authored+ingested through "
                "the full glTF pipeline (scene/helmet_asset.py)",
    # block_size=512 measured best on v5e (269 vs 277 ms/spp at 256);
    # k=128 clusters beat k=32 wide-chunks here (PERF.md r5 study).
    render=RenderConfig(width=512, height=512, spp=4, max_bounces=3,
                        block_size=512),
    scene=SceneSpec(builder="helmet_glb", camera_position=(0.0, 0.1, 3.0),
                    camera_target=(0.0, 0.0, 0.0), fov_y=1.0),
))
_register(BenchConfig(
    name="helmet_proc",
    description="round-4 helmet stand-in (procedurally displaced textured "
                "sphere + HDR env), kept for perf A/B against BENCH_r04",
    # Measured on v5e (tools/prof_k32.py): k=128 clusters edge out the
    # k=32 lane-group variant here (9.0 vs 11.9 ms/closest pass) — the
    # kernel is chunk-iteration-bound and finer candidates double the
    # chunk count; the k=32 path stays available via SceneSpec.cluster_k.
    render=RenderConfig(width=512, height=512, spp=4, max_bounces=3),
    scene=SceneSpec(builder="helmet", camera_position=(0.0, 0.0, 3.0),
                    camera_target=(0.0, 0.0, 0.0), fov_y=1.0),
))
_register(BenchConfig(
    name="cornell_tex256",
    description="realistic-texture tier (VERDICT r4 #2): cornell_ggx with "
                "256x256 albedo + metallic-roughness maps — too big for "
                "SMEM select-loops, exercises indexed texel fetches",
    render=RenderConfig(width=512, height=512, spp=4, max_bounces=4),
    scene=SceneSpec(builder="cornell_ggx",
                    extra={"roughness": 0.25, "tex_size": 256}),
))
_register(BenchConfig(
    name="inverse",
    description="config #5: recover albedo/roughness + emitter radiance "
                "via pixel-loss gradients, sharded tiles",
    render=RenderConfig(width=64, height=64, spp=2, max_bounces=2),
    scene=SceneSpec(builder="cornell"),
))


def build_scene(spec: SceneSpec):
    """Materialize (scene, camera) for a SceneSpec."""
    from ..core.camera import Camera
    from ..scene import procedural
    from ..scene.types import EnvMap, with_bvh, with_clusters

    b = spec.builder
    if b == "triangle":
        scene = procedural.make_triangle_scene()
    elif b == "cornell":
        scene = procedural.make_cornell_box()
    elif b == "cornell_ggx":
        # BASELINE config #3 as specified: GGX metallic block AND
        # albedo/roughness textures (VERDICT r3 missing #2) — the bench
        # number now includes real texture fetches.
        scene = procedural.make_cornell_box(
            metallic_tall_block=True,
            roughness=spec.extra.get("roughness", 0.25),
            textured=True,
            tex_size=spec.extra.get("tex_size", 8))
    elif b == "helmet":
        scene = procedural.make_helmet_class_scene(**spec.extra)
    elif b == "helmet_glb":
        # The real binary-asset path: author (cached) -> export_glb ->
        # full scene/gltf.py ingest -> env attach (scene/helmet_asset.py).
        from ..scene.helmet_asset import load_helmet_scene
        scene = load_helmet_scene(**spec.extra)
    elif b == "gltf":
        from ..scene import gltf as gltf_mod
        scene, _, camera = gltf_mod.load(spec.extra["path"])
        return with_clusters(scene, k=spec.cluster_k), camera
    else:
        raise ValueError(f"unknown scene builder {b!r}")
    # Always attach the cluster grid: tiny scenes become a single padded
    # cluster and the Pallas tracer degenerates to VMEM-resident brute
    # force, which is exactly right for them.
    scene = with_clusters(scene, k=spec.cluster_k)
    camera = Camera.make(position=spec.camera_position,
                         target=spec.camera_target, fov_y=spec.fov_y)
    return scene, camera


def get(name: str) -> BenchConfig:
    if name not in CONFIGS:
        raise KeyError(f"unknown config {name!r}; available: "
                       f"{sorted(CONFIGS)}")
    return CONFIGS[name]
