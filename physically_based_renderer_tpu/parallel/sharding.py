"""Multi-device sharding: image-tile data parallelism over a TPU mesh.

The reference is strictly single-device (one Vulkan queue,
`src/pbr_engine/core/pbr/core/GpuHandle.cpp:76-80`; SURVEY.md section 2.10).
This module is the new distributed backend the north star requires:

  * a `jax.sharding.Mesh` over (tiles,) — or (hosts, chips) reshaped flat —
    with IMAGE ROWS (tiles) and the per-sample ray batch sharded across it;
  * scene/BVH/material arrays REPLICATED per device (they are small relative
    to ray state; BASELINE.json: "replicating the BVH and scene buffers per
    host");
  * film assembly = out_specs row-sharding (an all_gather only materializes
    if a consumer needs the full image);
  * gradient all-reduce = psum over the mesh inside the backward of
    shard_map, riding ICI (grad/ wires this into inverse rendering).

Shard-invariance: per-ray RNG keys derive from GLOBAL pixel ids
(core/rng.py), so an N-device render is bitwise the single-device render.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.camera import Camera
from ..core.film import Film
from ..integrator.path import RenderConfig, render_sample
from ..scene.types import Scene

TILE_AXIS = "tiles"


def make_mesh(devices=None, axis_name: str = TILE_AXIS) -> Mesh:
    """1-D device mesh over which image tiles are sharded."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def replicate_scene(scene: Scene, mesh: Mesh) -> Scene:
    """Explicitly place every scene array replicated on the mesh (the
    TransferStager analog: one host->HBM staging of the whole arena,
    SURVEY.md section 3.4)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), scene)


def _check_divisible(height: int, n: int):
    if height % n:
        raise ValueError(
            f"image height {height} must divide by mesh size {n} "
            f"(pad the film or change the tile split)")


def render_sample_sharded(scene: Scene, camera: Camera, key: jax.Array,
                          cfg: RenderConfig, mesh: Mesh) -> jnp.ndarray:
    """One spp over the mesh: each device renders height/n_devices rows.

    Returns the full [H, W, 3] radiance (row-sharded across devices).
    """
    n = mesh.devices.size
    _check_divisible(cfg.height, n)
    rows = cfg.height // n

    def tile_fn(scene, camera, key):
        i = jax.lax.axis_index(TILE_AXIS)
        return render_sample(scene, camera, key, cfg,
                             row_start=i * rows, n_rows=rows)

    # check_vma=False: replicated inputs feed scan carries inside the tile
    # function (intersection chunking); the varying-axis check would demand
    # pvary annotations inside generic integrator code.
    fn = shard_map(tile_fn, mesh=mesh,
                   in_specs=(P(), P(), P()),
                   out_specs=P(TILE_AXIS, None, None),
                   check_vma=False)
    return fn(scene, camera, key)


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def render_sharded(scene: Scene, camera: Camera, key: jax.Array,
                   cfg: RenderConfig, mesh: Mesh) -> Film:
    """Full sharded render: scan over spp, tiles over the mesh."""
    film = Film.zeros(cfg.height, cfg.width)
    keys = jax.random.split(key, cfg.spp)

    def body(f, k):
        return f.add_samples(render_sample_sharded(scene, camera, k, cfg,
                                                   mesh)), None

    film, _ = jax.lax.scan(body, film, keys)
    return film
