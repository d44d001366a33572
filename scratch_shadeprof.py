"""Break down Cornell PT frame: per-piece costs inside jit chains."""
import time
import functools
import jax
import jax.numpy as jnp
print = functools.partial(__builtins__.print, flush=True)

from steeljax.core import camera as camera_lib
from steeljax.core.config import RenderConfig
from steeljax.env.cubemap import sample_cube_quads
from steeljax.render.pt import brdf as brdf_lib
from steeljax.render.pt import integrator as I
from steeljax.render.pt.renderer import prepare_scene
from steeljax.scene.builtin import make_cornell_scene
from steeljax.core import rng

W, H = 1280, 720
scene = make_cornell_scene(sphere_detail=12)
frame = camera_lib.make_frame(scene.camera_location, scene.camera_projection)
px, py, _ = I.tiled_order(W, H)
flat, tables = prepare_scene(scene, env_resolution=64)
print("shade_mode:", tables.shade_mode, "lights:", int(flat.light_count),
      "textures:", bool(flat.has_textures))
iv = jnp.asarray(frame.inverse_view)
ip = jnp.asarray(frame.inverse_proj)

seed0 = rng.make_seed(px.astype(jnp.uint32), py.astype(jnp.uint32),
                      jnp.uint32(0), jnp.uint32(0))
o, d, seed0 = jax.jit(I.primary_rays, static_argnums=(2, 3, 7))(
    iv, ip, W, H, px, py, seed0, False)
N = o.shape[0]
tmin = jnp.full((N,), 0.001, jnp.float32)
tmax = jnp.full((N,), 1e30, jnp.float32)


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms")
    return out


@jax.jit
def trace(o, d):
    return I.trace_material_ray(flat, tables, o, d, tmin, tmax,
                                cull_backface=True, max_alpha_retrace=0)


rec = timeit("trace coherent", trace, o, d)


@jax.jit
def unpack(rec):
    return I.unpack_material_fused(flat, rec)


surface, tbn = timeit("unpack_material_fused", unpack, rec)


@jax.jit
def brdf_sample(surface, tbn, seed):
    wo = brdf_lib.world_to_tangent(-d, tbn)
    wo = I._normalize(wo)
    f, wi, pdf, seed = brdf_lib.sample_brdf(surface, wo, seed)
    return f, wi, pdf, seed


f, wi, pdf, seed1 = timeit("brdf world_to_tangent+sample", brdf_sample,
                           surface, tbn, seed0)


@jax.jit
def env_lookup(d):
    return sample_cube_quads(flat.env_quads, d)


timeit("env sample_cube_quads (0.92M)", env_lookup, d)


@jax.jit
def tangent_back(wi, tbn):
    return brdf_lib.tangent_to_world(wi, tbn)


timeit("tangent_to_world", tangent_back, wi, tbn)


# whole-frame reference point
config = RenderConfig(width=W, height=H)


@functools.partial(jax.jit, static_argnames=())
def whole(i):
    return I.render_pixels(flat, tables, iv, ip, frame.camera_near,
                           frame.camera_far, W, H, px, py, i, 0, config,
                           return_stats=True)


r, s = whole(0)
jax.block_until_ready(r)
t0 = time.perf_counter()
for i in range(4):
    r, s = whole(i + 1)
jax.block_until_ready(r)
el = (time.perf_counter() - t0) / 4
print(f"full frame: {el*1e3:.1f} ms -> "
      f"{float(s['rays_traced'])/el/1e6:.1f} Mray/s")
